package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.DeriveSpec
import graft.expr.ExprRegistry
import graft.stages.Transforms

class ExprRegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def derive(specs: (String, DeriveSpec)*)(df: org.apache.spark.sql.DataFrame) =
    Transforms.deriveNewCols(specs)(df)

  test("horizontal folds: add/sub/mul/div; empty cols throws") {
    val df = Seq((10.0, 4.0)).toDF("a", "b")
    val out = derive(
      "s" -> DeriveSpec("add_cols", Map("cols" -> Seq("a", "b"))),
      "d" -> DeriveSpec("sub_cols", Map("cols" -> Seq("a", "b"))),
      "m" -> DeriveSpec("mul_cols", Map("cols" -> Seq("a", "b"))),
      "q" -> DeriveSpec("div_cols", Map("cols" -> Seq("a", "b"))))(df).head()
    assert(out.getDouble(2) == 14.0 && out.getDouble(3) == 6.0 &&
      out.getDouble(4) == 40.0 && out.getDouble(5) == 2.5)
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("add_cols")(Map("cols" -> Nil))
    }
  }

  test("cumulative/ranking fns demand order_by") {
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("cum_sum")(Map("col" -> "v"))
    }
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("t", "v")
    val out = derive("cs" -> DeriveSpec("cum_sum",
      Map("col" -> "v", "order_by" -> Seq("t"))))(df)
    assert(out.orderBy("t").select("cs").as[Long].collect().toSeq == Seq(10, 30, 60))
  }

  test("shift/diff/pct_change over explicit windows") {
    val df = Seq((1, 10.0), (2, 15.0), (3, 30.0)).toDF("t", "v")
    val out = derive(
      "prev" -> DeriveSpec("shift", Map("col" -> "v", "order_by" -> Seq("t"))),
      "d" -> DeriveSpec("diff", Map("col" -> "v", "order_by" -> Seq("t"))),
      "pc" -> DeriveSpec("pct_change", Map("col" -> "v", "order_by" -> Seq("t"))))(df)
      .orderBy("t").collect()
    assert(out(1).getDouble(2) == 10.0 && out(1).getDouble(3) == 5.0 && out(1).getDouble(4) == 0.5)
    assert(out(0).isNullAt(2))
  }

  test("rolling windows bound frames to window_size") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)).toDF("t", "v")
    val out = derive("rm" -> DeriveSpec("rolling_sum",
      Map("col" -> "v", "order_by" -> Seq("t"), "window_size" -> 2)))(df)
    assert(out.orderBy("t").select("rm").as[Double].collect().toSeq == Seq(1.0, 3.0, 5.0, 7.0))
  }

  test("comparison, null, cast, clip families") {
    val df = Seq((Some(5.0), "x"), (None, "y")).toDF("v", "s")
    val out = derive(
      "isnull" -> DeriveSpec("is_null", Map("col" -> "v")),
      "filled" -> DeriveSpec("fill_null", Map("col" -> "v", "value" -> 0.0)),
      "gt3" -> DeriveSpec("gt", Map("col" -> "v", "value" -> 3.0)),
      "asint" -> DeriveSpec("cast", Map("col" -> "v", "dtype" -> "Int32")),
      "clipped" -> DeriveSpec("clip",
        Map("col" -> "v", "lower_bound" -> 0.0, "upper_bound" -> 4.0)))(df)
      .orderBy("s").collect()
    assert(!out(0).getBoolean(2) && out(0).getDouble(3) == 5.0 && out(0).getBoolean(4))
    assert(out(0).getInt(5) == 5 && out(0).getDouble(6) == 4.0)
    assert(out(1).getBoolean(2) && out(1).getDouble(3) == 0.0)
  }

  test("is_duplicated / is_first_distinct / n_unique") {
    val df = Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "g")
    val out = derive(
      "dup" -> DeriveSpec("is_duplicated", Map("col" -> "g")),
      "first" -> DeriveSpec("is_first_distinct", Map("col" -> "g", "order_by" -> Seq("id"))),
      "nu" -> DeriveSpec("n_unique", Map("col" -> "g")))(df).orderBy("id").collect()
    assert(out(0).getBoolean(2) && out(1).getBoolean(2) && !out(2).getBoolean(2))
    assert(out(0).getBoolean(3) && !out(1).getBoolean(3) && out(2).getBoolean(3))
    assert(out.forall(_.getLong(4) == 2L))
  }

  test("unknown fn name lists alternatives") {
    val e = intercept[IllegalArgumentException](ExprRegistry.resolve("no_such_fn"))
    assert(e.getMessage.contains("unknown derive fn"))
  }

  test("registry covers every family promised in SURVEY §2.2") {
    val promised = Seq(
      "add_cols", "sub_cols", "mul_cols", "div_cols", // horizontal
      "abs", "log", "log10", "exp", "sqrt", "pow", "round", "floor", "ceil", "mod", "sign",
      "mean", "sum", "min", "max", "median", "std", "var", "n_unique", "count", "null_count",
      "cum_sum", "cum_min", "cum_max", "cum_prod", "cum_count",
      "rank", "shift", "diff", "pct_change", "is_first_distinct",
      "fill_null", "fill_nan", "is_null", "is_not_null",
      "gt", "ge", "lt", "le", "eq", "ne", "is_in", "is_between", "not_", "and_", "or_", "xor",
      "cast", "clip", "clip_min", "clip_max", "hash",
      "is_duplicated", "is_unique", "rolling_mean")
    val missing = promised.filterNot(ExprRegistry.fns.contains)
    assert(missing.isEmpty, s"missing registry fns: $missing")
  }
}
