package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.YamlEmit
import graft.stages.Inspect

class InspectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("describe: one row per stat, all columns stringly, correct values") {
    val df = Seq((1.0, "a"), (3.0, "b"), (Double.NaN, "b")).toDF("v", "s")
      .select(org.apache.spark.sql.functions.nanvl($"v", org.apache.spark.sql.functions.lit(null)).as("v"), $"s")
    // exactQuantiles: interpolated 50% of {1.0, 3.0} is 2.0
    val stats = Inspect.describe(df, exactQuantiles = true).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(stats.keySet == Set("count", "null_count", "mean", "std", "min", "25%", "50%",
      "75%", "max", "null_proportion", "n_unique"))
    assert(stats("count")._1.contains("2") && stats("count")._2.contains("3"))
    assert(stats("null_count")._1.contains("1") && stats("null_count")._2.contains("0"))
    assert(stats("mean")._1.contains("2.0") && stats("mean")._2.isEmpty)
    assert(stats("min")._2.contains("a") && stats("max")._2.contains("b"))
    assert(stats("n_unique")._2.contains("2"))
    assert(stats("50%")._1.contains("2.0"))
  }

  test("describe DEFAULTS to the approx_percentile sketch (100 TB memory shape)") {
    // the sketch returns a REAL data value, never the exact interpolation —
    // observable difference that proves the default is the approx path
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val approx = Inspect.describe(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val p50 = approx("50%").toDouble
    assert(p50 >= 490.0 && p50 <= 510.0, s"sketch p50 near the median: $p50")
    assert(p50 == math.rint(p50), "approx_percentile returns an actual data value")
    // exact interpolated median of 1..1000 is 500.5 — not a data value
    val exact = Inspect.describe(df, exactQuantiles = true).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(exact("50%").toDouble == 500.5)
  }

  test("describe DEFAULTS to approx n_unique: single-agg plan has NO Expand (round 16)") {
    val df = Seq((1, "a"), (2, "b"), (3, "b")).toDF("x", "s")
    // describe materializes eagerly (the returned stats frame is
    // driver-built), so the Expand property is pinned on the agg the stat
    // fns produce: one n_unique per column in ONE pass. Expand duplicates
    // every scan row once per exact-distinct column — the default
    // (approx_count_distinct sketch) must not pay it.
    def aggPlan(stats: Seq[(String, Inspect.StatFn)]): String = {
      val exprs = df.columns.toSeq.flatMap(c => stats.map(_._2(c)))
      df.agg(exprs.head, exprs.tail: _*).queryExecution.executedPlan.toString
    }
    assert(!aggPlan(Inspect.defaultCustomStats).contains("Expand"),
      "default stat set must not Expand the scan")
    assert(aggPlan(Inspect.exactCustomStats).contains("Expand"),
      "exact stat set is the countDistinct path")
    // values: the sketch is exact at this cardinality; both paths agree
    val d = Inspect.describe(df).collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(d("n_unique") == "2")
    val e = Inspect.describe(df, exactQuantiles = true)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(e("n_unique") == "2")
  }

  test("yaml emit: scalars, nesting, quoting") {
    val yaml = YamlEmit.emit(scala.collection.immutable.ListMap(
      "plain" -> "x", "quoted" -> "a: b", "n" -> 3, "seq" -> Seq("a", "b"),
      "nested" -> scala.collection.immutable.ListMap("k" -> "v"), "empty" -> Nil))
    assert(yaml.contains("plain: x"))
    assert(yaml.contains("quoted: \"a: b\""))
    assert(yaml.contains("- a\n  - b") || yaml.contains("- a"))
    assert(yaml.contains("nested:\n  k: v"))
    assert(yaml.contains("empty: []"))
  }
}
