package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TypedAggregators

class TypedAggregatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted mean aggregates with map-side merge across partitions") {
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0), ("b", 0.0, 0.0))
      .toDF("g", "x", "w").repartition(4)
    val out = df.groupBy($"g")
      .agg(TypedAggregators.weightedMeanCol($"x", $"w").as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == (10.0 * 1 + 20.0 * 3) / 4)
    assert(out("b") == 5.0)
  }

  test("weighted mean of zero total weight is null") {
    val df = Seq(("a", 1.0, 0.0)).toDF("g", "x", "w")
    val row = df.groupBy($"g")
      .agg(TypedAggregators.weightedMeanCol($"x", $"w").as("wm")).head()
    assert(row.isNullAt(1))
  }

  test("null inputs are skipped like built-in aggregates, not crashed on") {
    val df = Seq(
      ("a", Some(10.0), Some(1.0)), ("a", None, Some(9.0)), ("a", Some(30.0), None))
      .toDF("g", "x", "w")
    val wm = df.groupBy($"g")
      .agg(TypedAggregators.weightedMeanCol($"x", $"w").as("wm")).head().getDouble(1)
    assert(wm == 10.0, "only the fully non-null pair counts")
    val gm = Seq(Some(4.0), None).toDF("x")
      .agg(TypedAggregators.geometricMeanCol($"x")).head().getDouble(0)
    assert(gm == 4.0)
  }

  test("geometric mean skips non-positive values") {
    val df = Seq(2.0, 8.0, -1.0, 0.0).toDF("x").repartition(3)
    val gm = df.agg(TypedAggregators.geometricMeanCol($"x").as("gm"))
      .head().getDouble(0)
    assert(math.abs(gm - 4.0) < 1e-12)
  }
}
