package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sparkext.DoubleToScaled

class DoubleToScaledSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(x: Double, scale: Int): Long =
    // exact binary expansion of the double, decimal-rounded HALF_UP
    new JBigDecimal(x).setScale(scale, RoundingMode.HALF_UP).unscaledValue().longValueExact()

  test("scaleRound matches exact BigDecimal HALF_UP on adversarial + random values") {
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 0.05, 1234.56, -1234.56,
      0.0078125, -0.0078125, // exact binary ties at scale 6 (x*1e6 = 7812.5)
      5e-7, -5e-7, 1.5e-6, 4.999999e-1, 123456789.123456,
      9.007199254740992e9, // 2^53 / 1e6 territory
      1e-12, -1e-12, 0.9999995, -0.9999995)
    for (x <- adversarial)
      assert(DoubleToScaled.scaleRound(x, 1e6) == reference(x, 6), s"x=$x")
    val rng = new scala.util.Random(7)
    var i = 0
    while (i < 200000) {
      val x = (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(9) - 2)
      assert(DoubleToScaled.scaleRound(x, 1e6) == reference(x, 6), s"x=$x")
      i += 1
    }
  }

  test("scaleRound stays exact above 2^53 where the residual carries whole units") {
    // regression: values with |x * 1e6| > 2^53 put the entire fractional
    // part (up to +-512 whole units near 2^63) into the FMA residual;
    // an adjust-by-at-most-1 implementation was off by up to hundreds
    val adversarial = Seq(1217934554570.487, -1217934554570.487,
      9.0e12, -9.0e12, 9007199254.740993, 1.23456789012e12,
      9.21e12, -9.21e12, 9.223372036854774e12) // near the 2^63 edge
    for (x <- adversarial)
      assert(DoubleToScaled.scaleRound(x, 1e6) == reference(x, 6), s"x=$x")
    // at/beyond 2^63 -> null, like a value that cannot fit the long
    assert(DoubleToScaled.scaleRound(9.3e12, 1e6) == DoubleToScaled.NullSentinel)
    val rng = new scala.util.Random(13)
    var i = 0
    while (i < 200000) {
      // |x| up to the 2^63/1e6 edge: straddles the 2^53-scaled boundary
      val x = (rng.nextDouble() - 0.5) * 2 * math.pow(10, 9 + rng.nextInt(4)) *
        (1 + rng.nextDouble())
      if (math.abs(x) * 1e6 < 9.223372036854775e18)
        assert(DoubleToScaled.scaleRound(x, 1e6) == reference(x, 6), s"x=$x")
      i += 1
    }
  }

  test("non-finite and out-of-range inputs yield null (like cast-to-decimal)") {
    val df = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1e290, 1.5).toDF("x")
    val out = df.select(DoubleToScaled.scaled($"x", 6).as("v")).collect()
    assert(out.count(_.isNullAt(0)) == 4)
    assert(out.exists(r => !r.isNullAt(0) && r.getLong(0) == 1500000L))
  }

  test("exactSum is value-identical to the decimal-cast sum, grouped and global") {
    val rng = new scala.util.Random(11)
    val df = (1 to 50000)
      .map(i => (i % 7, (rng.nextDouble() - 0.3) * 1e5))
      .toDF("g", "x")
      .persist()
    val viaDecimal = df.groupBy($"g")
      .agg(sum($"x".cast(DecimalType(28, 6))).cast(DoubleType).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val viaScaled = df.groupBy($"g")
      .agg(DoubleToScaled.exactSum($"x").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(viaDecimal == viaScaled)
    df.unpersist()
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.range(1000).select(($"id" * 1.5).as("x"))
      .select(DoubleToScaled.scaled($"x", 6).as("v"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "custom expression must not break codegen")
    assert(df.selectExpr("sum(v)").head().getLong(0) == 1500000L * (999L * 1000 / 2))
  }
}
