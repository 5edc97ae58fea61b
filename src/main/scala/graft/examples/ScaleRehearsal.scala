package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the dedup path: synthesize an `M`x corpus from the
  * sf0.1 documents fixture, run the heavy dedup queries at 1x and Mx, and
  * report observed scaling exponents — empirical evidence for the O(n)
  * claims the operator docs make from plan shapes alone.
  *
  * Corpus synthesis preserves the duplicate STRUCTURE without creating
  * cross-copy near-dups: copy `i` suffixes every token with `_i`, so every
  * shingle/fingerprint of copy i is distinct from every other copy's, while
  * the near-dup pairs WITHIN copy i mirror the originals exactly. Pair
  * count, cluster count, and survivor count therefore all scale by exactly
  * M — the workload grows linearly, so a linear-time operator shows
  * exponent ~1.0 (t ∝ n^e; e = log(tM/t1)/log(M)) and any quadratic cliff
  * shows e ~2. Naive duplication (same text, new ids) would instead fuse
  * all M copies into giant cross-copy clusters — a different, superlinear
  * workload that measures the mass-duplicate cliff, not scaling.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=10 \
  *   sbt "runMain graft.examples.ScaleRehearsal"
  * Prints one JSON line per query: {"query":…,"t_base":…,"t_scaled":…,
  * "mult":M,"exponent":…}.
  */
object ScaleRehearsal {

  private val RehearsalQueries =
    Seq("q24_dedup_minhash_lsh", "q26_dedup_ngram_jaccard",
      "q77_dedup_clusters", "q88_fuzzy_dedup")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scaledDir = s"target/scale_rehearsal/x$mult"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    synthesize(spark, baseDir, scaledDir, mult)

    val results = RehearsalQueries.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def time(dir: String): Double = {
        fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
        spark.catalog.clearCache()
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      val tBase = time(baseDir)
      val tScaled = time(scaledDir)
      val exponent = math.log(tScaled / tBase) / math.log(mult.toDouble)
      val line =
        f"""{"query":"$name","t_base":$tBase%.2f,"t_scaled":$tScaled%.2f,"mult":$mult,"exponent":$exponent%.2f}"""
      println(line)
      (name, tBase, tScaled, exponent)
    }
    val worst = results.maxBy(_._4)
    println(f"""{"metric":"max_exponent","query":"${worst._1}","value":${worst._4}%.2f}""")
    spark.stop()
  }

  /** Write the Mx documents corpus: copy 0 is the original; copy i>0 gets
    * ids shifted by i*(maxId+1) and every token suffixed `_i`. */
  def synthesize(spark: SparkSession, baseDir: String, outDir: String, mult: Int): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies = (0 until mult).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * maxId))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_$i"))), " "))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }
}
