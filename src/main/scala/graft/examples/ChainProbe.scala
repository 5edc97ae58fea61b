package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.DeriveSpec
import graft.stages.Transforms

/** Diagnoses the plan-growth wall of CHAINED GlobalOrdered decompositions
  * (round 16): each derive entry rebuilds on the previous entry's joined
  * output, so optimizer cost compounds with depth. Prints seconds per
  * chain length. */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000).select(
      col("id").as("t"), (col("id") % 13).as("v"))
    for (k <- Seq(1, 2, 3, 4, 5, 6)) {
      val specs = (1 to k).map(i =>
        s"c$i" -> DeriveSpec("cum_sum", Map("col" -> "v", "order_by" -> Seq("t"))))
      val t0 = System.nanoTime()
      Transforms.deriveNewCols(specs)(df).write.format("noop").mode("overwrite").save()
      println(f"chain=$k ${(System.nanoTime() - t0) / 1e9}%.1f s (batched: 1 decomposition)")
    }
    // alternating orders defeat batching — every entry is its own
    // decomposition level; the plan barrier must keep this linear
    for (k <- Seq(2, 4, 6, 8, 12)) {
      val specs = (1 to k).map { i =>
        val ord = if (i % 2 == 0) Seq("t") else Seq("v", "t")
        s"a$i" -> DeriveSpec("cum_sum", Map("col" -> "v", "order_by" -> ord))
      }
      val t0 = System.nanoTime()
      Transforms.deriveNewCols(specs)(df).write.format("noop").mode("overwrite").save()
      println(f"alt=$k ${(System.nanoTime() - t0) / 1e9}%.1f s ($k barrier-separated levels)")
    }
    spark.stop()
  }
}
