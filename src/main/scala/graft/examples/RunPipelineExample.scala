package graft.examples

import org.apache.spark.sql.SparkSession

import graft.config._
import graft.io.SparkIO
import graft.service.Pipeline

/** End-to-end example: run the full pipeline service against a real parquet
  * source with the real filesystem IO adapter.
  *
  *   sbt "runMain graft.examples.RunPipelineExample [srcParquet] [dstRoot]"
  *
  * Defaults: sf0.001 lineitem -> target/pipeline_out. Prints the artifact
  * tree and row counts.
  */
object RunPipelineExample {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.001/lineitem.parquet")
    val dst = args.lift(1).getOrElse("target/pipeline_out")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-example")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = GeneralConfig(
      processName = "example_ingest",
      srcPath = src,
      dstRoot = dst,
      validation = Seq(
        RuleSpec("qty_positive", "l_quantity", "gt", Some(0)),
        RuleSpec("qty_le_30", "l_quantity", "le", Some(30))),
      transformations = TransformConfig(
        clipMap = Seq("l_extendedprice" -> (1000.0, 50000.0)),
        newColMap = Seq(
          "revenue" -> DeriveSpec("mul_cols", Map("cols" -> Seq("l_quantity", "l_extendedprice"))),
          "mean_qty" -> DeriveSpec("mean", Map("col" -> "l_quantity")),
          "ship_quarter" -> DeriveSpec("dt_quarter", Map("col" -> "l_shipdate")),
          "capped_tax" -> DeriveSpec("min_cols", Map("cols" -> Seq("l_tax", "l_discount")))),
        renameMap = Seq("l_returnflag" -> "return_flag")))

    val res = Pipeline.runPipeline(spark, cfg, new SparkIO)
    println(s"guid=${res.guid}")
    println(s"transformed rows=${res.transformed.count()} cols=${res.transformed.columns.length}")
    println(s"invalid rows=${res.invalid.count()}")
    println(s"artifacts under ${res.outputRoot}:")
    def walk(p: java.io.File, indent: String = "  "): Unit =
      if (p.isDirectory) {
        println(s"$indent${p.getName}/")
        p.listFiles().sortBy(_.getName).take(4).foreach(walk(_, indent + "  "))
      } else println(s"$indent${p.getName} (${p.length()} bytes)")
    walk(new java.io.File(res.outputRoot))
    spark.stop()
  }
}
