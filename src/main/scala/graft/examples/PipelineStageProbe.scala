package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{GraftIO, SparkIO}

/** Round-19 measurement harness: where does `pipeline_e2e`'s wall time go?
  *
  * `runPipeline` triggers its Spark actions exclusively through the IO
  * seam (describe-pre write, transformed-data write, error write,
  * describe-post write) plus one `invalid.isEmpty` probe, so a timing
  * decorator around [[SparkIO]] splits the end-to-end number into
  * per-sink compute+write costs without touching the pipeline itself.
  * Run: `runMain graft.examples.PipelineStageProbe [sfDir] [reps]`. */
object PipelineStageProbe {

  final class TimedIO extends GraftIO {
    private val inner = new SparkIO()
    private def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def read(spark: SparkSession, path: String, fileType: String,
        options: Map[String, String]): DataFrame =
      inner.read(spark, path, fileType, options)
    def write(df: DataFrame, path: String, fileType: String, targetSizeGb: Double,
        options: Map[String, String]): Unit =
      timed(s"write ${path.split('/').takeRight(2).mkString("/")}") {
        inner.write(df, path, fileType, targetSizeGb, options)
      }
    def writeText(text: String, path: String): Unit =
      timed(s"writeText ${path.split('/').last}")(inner.writeText(text, path))
    def newGuid(): String = inner.newGuid()
    def now(): java.time.Instant = inner.now()
    def listFiles(spark: SparkSession, path: String, fileType: String,
        options: Map[String, String]): Seq[String] =
      inner.listFiles(spark, path, fileType, options)
    def readFiles(spark: SparkSession, files: Seq[String], fileType: String,
        options: Map[String, String],
        schema: Option[org.apache.spark.sql.types.StructType]): DataFrame =
      inner.readFiles(spark, files, fileType, options, schema)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the same YAML chain Bench.pipelineE2E times, through the TimedIO
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val evalPath = s"target/pipeline_e2e/eval_$key"
    if (!new java.io.File(s"$evalPath/_SUCCESS").exists()) {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(997)) === 0)
        .select(col("doc_id"), col("text"))
        .coalesce(1).write.mode("overwrite").parquet(evalPath)
    }
    val yaml =
      s"""process_name: probe_e2e
         |src_path: $sfDir/documents.parquet
         |dst_root: target/pipeline_e2e/probe_$key
         |validation:
         |  text_not_null:
         |    - text
         |    - is_not_null
         |custom_transformations:
         |  quality_filter:
         |    text_col: text
         |    min_tokens: 10
         |    max_punct_ratio: 0.3
         |  clean_text:
         |    text_col: text
         |  fuzzy_dedup:
         |    id_col: doc_id
         |    text_col: text
         |    shingle_k: 3
         |    num_hashes: 64
         |    bands: 16
         |  decontaminate:
         |    id_col: doc_id
         |    text_col: text
         |    eval_path: $evalPath
         |    threshold: 0.8
         |  lang_id:
         |    text_col: text
         |  text_stats:
         |    text_col: text
         |  pack_sequences:
         |    id_col: doc_id
         |    token_col: n_tokens
         |    partition_col: lang_pred
         |    budget: 4096
         |select_cols: "*"
         |""".stripMargin
    val cfg = graft.config.ConfigLoader.fromYaml(yaml)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.service.Pipeline.runPipeline(spark, cfg, new TimedIO())
      println(f"[probe] rep$r TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
