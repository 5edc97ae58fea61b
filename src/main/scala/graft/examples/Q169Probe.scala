package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.DeriveSpec
import graft.stages.Transforms

/** The numbers behind [[graft.expr.FrameStats.bind]] (round 16): q169's
  * first bench row read 142 s at sf0.1 — per-family timing here isolated
  * `rolling_std_by` at 49.3 s ALONE, because Catalyst has no let-binding
  * and every `getField` on the unnamed (fold → Chan-merge → extract)
  * struct chain duplicated the whole O(frame) fold subtree (~24 copies
  * per row). After binding each stage through a higher-order-function
  * lambda variable: one_by_std 49.3 → 3.7 s, by4_batch 57.7 → 6.8 s,
  * full q169 132.6 → 14.2 s. Re-run with the usual plain-java launch
  * (classes + the Spark jars dir on the classpath). */
object Q169Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val ord = Map("order_by" -> Seq("doc_id"))
    def run(name: String, specs: (String, DeriveSpec)*): Unit = time(name) {
      Transforms.deriveNewCols(specs)(docs).write.format("noop").mode("overwrite").save()
    }

    run("warmup_cum_sum", "w0" -> DeriveSpec("cum_sum", Map("col" -> "n_chars") ++ ord))
    run("one_rolling_std", "g_std" -> DeriveSpec("rolling_std",
      Map("col" -> "n_chars", "window_size" -> 20) ++ ord))
    run("one_rolling_median", "g_med" -> DeriveSpec("rolling_median",
      Map("col" -> "n_chars", "window_size" -> 20) ++ ord))
    run("one_rolling_skew", "g_skw" -> DeriveSpec("rolling_skew",
      Map("col" -> "n_chars", "window_size" -> 20) ++ ord))
    run("batch6_rolling",
      "g_std" -> DeriveSpec("rolling_std", Map("col" -> "n_chars", "window_size" -> 20) ++ ord),
      "g_var" -> DeriveSpec("rolling_var", Map("col" -> "n_chars", "window_size" -> 20) ++ ord),
      "g_med" -> DeriveSpec("rolling_median", Map("col" -> "n_chars", "window_size" -> 20) ++ ord),
      "g_q" -> DeriveSpec("rolling_quantile",
        Map("col" -> "n_chars", "window_size" -> 20, "quantile" -> 0.75) ++ ord),
      "g_skw" -> DeriveSpec("rolling_skew", Map("col" -> "n_chars", "window_size" -> 20) ++ ord),
      "g_krt" -> DeriveSpec("rolling_kurtosis",
        Map("col" -> "n_chars", "window_size" -> 20) ++ ord))
    run("by4_batch",
      "b_sum" -> DeriveSpec("rolling_sum_by",
        Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)),
      "b_mean" -> DeriveSpec("rolling_mean_by",
        Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)),
      "b_std" -> DeriveSpec("rolling_std_by",
        Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)),
      "b_med" -> DeriveSpec("rolling_median_by",
        Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)))
    run("one_by_sum", "b_sum" -> DeriveSpec("rolling_sum_by",
      Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)))
    run("one_by_mean", "b_mean" -> DeriveSpec("rolling_mean_by",
      Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)))
    run("one_by_std", "b_std" -> DeriveSpec("rolling_std_by",
      Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)))
    run("one_by_med", "b_med" -> DeriveSpec("rolling_median_by",
      Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)))
    run("by2_sum_mean",
      "b_sum" -> DeriveSpec("rolling_sum_by",
        Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)),
      "b_mean" -> DeriveSpec("rolling_mean_by",
        Map("col" -> "n_chars", "by" -> "doc_id", "window_size" -> 500)))
    run("cum_std_var",
      "c_std" -> DeriveSpec("cumulative_eval", Map("col" -> "n_chars", "agg" -> "std") ++ ord),
      "c_var" -> DeriveSpec("cumulative_eval", Map("col" -> "n_chars", "agg" -> "var") ++ ord))
    time("full_q169") {
      graft.queries.Queries.q169(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
