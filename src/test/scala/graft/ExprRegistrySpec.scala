package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
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

  test("positional window fns: lead/first_value/last_value/ntile") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)).toDF("t", "v")
    val out = derive(
      "nxt" -> DeriveSpec("lead", Map("col" -> "v", "order_by" -> Seq("t"))),
      "fv" -> DeriveSpec("first_value", Map("col" -> "v", "order_by" -> Seq("t"))),
      "lv" -> DeriveSpec("last_value", Map("col" -> "v", "order_by" -> Seq("t"))),
      "q2" -> DeriveSpec("ntile", Map("n" -> 2, "order_by" -> Seq("t"))))(df)
      .orderBy("t").collect()
    assert(out(0).getDouble(2) == 20.0 && out(3).isNullAt(2))
    assert(out.forall(r => r.getDouble(3) == 10.0 && r.getDouble(4) == 40.0))
    // global (no partition_by) ntile takes the two-level decomposition and
    // returns LONG (round 16); per-key windowed ntile stays int
    assert(out.map(_.getLong(5)).toSeq == Seq(1L, 1L, 2L, 2L))
  }

  test("forward_fill / backward_fill along explicit order") {
    val df = Seq((1, Some(1.0)), (2, None), (3, None), (4, Some(4.0)))
      .toDF("t", "v")
    val out = derive(
      "ff" -> DeriveSpec("forward_fill", Map("col" -> "v", "order_by" -> Seq("t"))),
      "bf" -> DeriveSpec("backward_fill", Map("col" -> "v", "order_by" -> Seq("t"))))(df)
      .orderBy("t").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 1.0, 1.0, 4.0))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 4.0, 4.0, 4.0))
  }

  test("string part-2 family: find/strip_prefix/titlecase/base64 round-trip") {
    val df = Seq(("hello world", "pre_fix")).toDF("s", "p")
    val out = derive(
      "f" -> DeriveSpec("str_find", Map("col" -> "s", "substring" -> "world")),
      "missing" -> DeriveSpec("str_find", Map("col" -> "s", "substring" -> "zzz")),
      "np" -> DeriveSpec("str_strip_prefix", Map("col" -> "p", "prefix" -> "pre_")),
      "tc" -> DeriveSpec("str_to_titlecase", Map("col" -> "s")),
      "b64" -> DeriveSpec("str_encode_base64", Map("col" -> "s")),
      "rt" -> DeriveSpec("str_decode_base64", Map("col" -> "b64")))(df).head()
    assert(out.getInt(2) == 6 && out.isNullAt(3))
    assert(out.getString(4) == "fix" && out.getString(5) == "Hello World")
    assert(out.getString(7) == "hello world") // decode(encode(s)) == s
  }

  test("list part-2 family: sum/mean/tail/index_of/any") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(true, false))).toDF("xs", "bs")
    val out = derive(
      "s" -> DeriveSpec("list_sum", Map("col" -> "xs")),
      "m" -> DeriveSpec("list_mean", Map("col" -> "xs")),
      "t2" -> DeriveSpec("list_tail", Map("col" -> "xs", "n" -> 2)),
      "i" -> DeriveSpec("list_index_of", Map("col" -> "xs", "value" -> 3.0)),
      "a" -> DeriveSpec("list_any", Map("col" -> "bs")))(df).head()
    assert(out.getDouble(2) == 6.0 && out.getDouble(3) == 2.0)
    assert(out.getSeq[Double](4) == Seq(2.0, 3.0))
    assert(out.getLong(5) == 2L && out.getBoolean(6))
  }

  test("whole-frame first/last/any/all + implode") {
    val df = Seq((1, 10.0, false), (2, 20.0, true), (3, 5.0, false)).toDF("t", "v", "b")
    val out = derive(
      "fst" -> DeriveSpec("first", Map("col" -> "v", "order_by_col" -> "t")),
      "lst" -> DeriveSpec("last", Map("col" -> "v", "order_by_col" -> "t")),
      "anyb" -> DeriveSpec("any", Map("col" -> "b")),
      "allb" -> DeriveSpec("all", Map("col" -> "b")),
      "arr" -> DeriveSpec("implode", Map("col" -> "v")))(df).head()
    assert(out.getDouble(3) == 10.0 && out.getDouble(4) == 5.0)
    assert(out.getBoolean(5) && !out.getBoolean(6))
    assert(out.getSeq[Double](7) == Seq(5.0, 10.0, 20.0))
  }

  test("bitwise + if_else + coalesce_cols") {
    val df = Seq((12, 10, true, Option.empty[Int], Some(7))).toDF("a", "b", "p", "x", "y")
    val out = derive(
      "andv" -> DeriveSpec("bitwise_and", Map("col" -> "a", "other_col" -> "b")),
      "sl" -> DeriveSpec("shift_left", Map("col" -> "a", "n" -> 2)),
      "ie" -> DeriveSpec("if_else",
        Map("predicate_col" -> "p", "then_col" -> "a", "else_col" -> "b")),
      "co" -> DeriveSpec("coalesce_cols", Map("cols" -> Seq("x", "y"))))(df).head()
    assert(out.getInt(5) == 8 && out.getInt(6) == 48)
    assert(out.getInt(7) == 12 && out.getInt(8) == 7)
  }

  test("review-pass semantics: slice default, null masks, ignore-null folds") {
    val df = Seq((
      Seq(1.0, 2.0, 3.0, 4.0),          // xs
      Seq(Option(false), None),          // any_bs: polars any -> false
      Seq(Option(true), None),           // all_bs: polars all -> true
      Option.empty[Boolean],             // p: null predicate
      Option.empty[Double], Some(4.0)    // a (null), b
    )).toDF("xs", "any_bs", "all_bs", "p", "a", "b")
    val out = derive(
      "rest" -> DeriveSpec("list_slice", Map("col" -> "xs", "offset" -> 1)),
      "anyv" -> DeriveSpec("list_any", Map("col" -> "any_bs")),
      "allv" -> DeriveSpec("list_all", Map("col" -> "all_bs")),
      "ie" -> DeriveSpec("if_else",
        Map("predicate_col" -> "p", "then_value" -> 1, "else_value" -> 0)),
      "mh" -> DeriveSpec("mean_cols", Map("cols" -> Seq("a", "b"))))(df).head()
    assert(out.getSeq[Double](6) == Seq(2.0, 3.0, 4.0), "offset-only slice = rest of list")
    assert(!out.getBoolean(7), "list_any ignores nulls")
    assert(out.getBoolean(8), "list_all ignores nulls")
    assert(out.isNullAt(9), "null mask yields null, not else-branch")
    assert(out.getDouble(10) == 4.0, "mean_cols ignores nulls")
  }

  test("interpolate_by survives equal x around a null (no ANSI divide-by-zero)") {
    val df = Seq((1L, 10.0, Some(1.0)), (2L, 10.0, Option.empty[Double]),
      (3L, 10.0, Some(3.0))).toDF("id", "x", "v")
    val out = Transforms.deriveNewCols(Seq(
      "vi" -> DeriveSpec("interpolate_by", Map("col" -> "v", "by" -> "x",
        "order_by" -> Seq("x", "id")))))(df)
      .orderBy("id").select("vi").collect()
    assert(out(1).getDouble(0) == 1.0, "zero x-gap takes the previous value")
  }

  test("cut / rolling_median / avg_rank") {
    val df = Seq((1, 5.0), (2, 15.0), (3, 15.0), (4, 40.0)).toDF("t", "v")
    val out = derive(
      "bin" -> DeriveSpec("cut", Map("col" -> "v", "breaks" -> Seq(10.0, 30.0),
        "labels" -> Seq("low", "mid", "high"))),
      "rm" -> DeriveSpec("rolling_median",
        Map("col" -> "v", "order_by" -> Seq("t"), "window_size" -> 3)),
      "ar" -> DeriveSpec("avg_rank", Map("order_by" -> Seq("v"))))(df)
      .orderBy("t").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("low", "mid", "mid", "high"))
    assert(out(2).getDouble(3) == 15.0, "median of (5, 15, 15)")
    val q = derive("rq" -> DeriveSpec("rolling_quantile",
      Map("col" -> "v", "order_by" -> Seq("t"), "window_size" -> 3, "quantile" -> 1.0)))(df)
      .orderBy("t").collect()
    assert(q(3).getDouble(2) == 40.0, "rolling q=1.0 == rolling max")
    // ranks of v=(5,15,15,40): ties at positions 2,3 share 2.5
    assert(out.map(_.getDouble(4)).toSeq == Seq(1.0, 2.5, 2.5, 4.0))
  }

  test("aggregates with partition_by broadcast per key (polars over)") {
    val df = Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)).toDF("id", "g", "v")
    val out = derive(
      "grp_mean" -> DeriveSpec("mean", Map("col" -> "v", "partition_by" -> Seq("g"))),
      "grp_nu" -> DeriveSpec("n_unique", Map("col" -> "v", "partition_by" -> Seq("g"))),
      "all_mean" -> DeriveSpec("mean", Map("col" -> "v")))(df)
      .orderBy("id").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(15.0, 15.0, 30.0))
    // long on BOTH n_unique paths (whole-frame countDistinct and per-key)
    assert(out.map(_.getLong(4)).toSeq == Seq(2L, 2L, 1L))
    assert(out.forall(_.getDouble(5) == 20.0), "no partition_by = whole frame")
  }

  test("list set algebra + str_splitn") {
    val df = Seq((Seq(1, 2, 3), Seq(2, 3, 4), "a,b,c,d")).toDF("xs", "ys", "s")
    val out = derive(
      "u" -> DeriveSpec("list_set_union", Map("col" -> "xs", "other_col" -> "ys")),
      "i" -> DeriveSpec("list_set_intersection", Map("col" -> "xs", "other_col" -> "ys")),
      "d" -> DeriveSpec("list_set_difference", Map("col" -> "xs", "other_col" -> "ys")),
      "sp" -> DeriveSpec("str_splitn", Map("col" -> "s", "by" -> ",", "n" -> 3)),
      "sp5" -> DeriveSpec("str_splitn", Map("col" -> "s", "by" -> ",", "n" -> 5)))(df).head()
    assert(out.getSeq[Int](3) == Seq(1, 2, 3, 4))
    assert(out.getSeq[Int](4) == Seq(2, 3))
    assert(out.getSeq[Int](5) == Seq(1))
    // polars splitn shape: EXACTLY n struct fields, remainder in the last
    val sp = out.getStruct(6)
    assert(sp.schema.fieldNames.toSeq == Seq("field_0", "field_1", "field_2"))
    assert((0 until 3).map(sp.getString) == Seq("a", "b", "c,d"))
    // short input null-pads to exactly n
    val sp5 = out.getStruct(7)
    assert(sp5.schema.fieldNames.toSeq == (0 until 5).map(i => s"field_$i"))
    assert((0 until 5).map(sp5.getString) == Seq("a", "b", "c", "d", null))
  }

  test("rolling_*_by: RANGE frames over the by axis, closed variants") {
    // by gaps: 1,2,10 — a row-count window would always see 2 rows; the
    // time window must shrink across the 10-gap
    val df = Seq((1L, 1.0), (2L, 2.0), (4L, 4.0), (14L, 8.0)).toDF("t", "v")
    val out = derive(
      "s_right" -> DeriveSpec("rolling_sum_by",
        Map("col" -> "v", "by" -> "t", "window_size" -> 3)),
      "s_both" -> DeriveSpec("rolling_sum_by",
        Map("col" -> "v", "by" -> "t", "window_size" -> 3, "closed" -> "both")),
      "s_left" -> DeriveSpec("rolling_sum_by",
        Map("col" -> "v", "by" -> "t", "window_size" -> 3, "closed" -> "left")),
      "s_none" -> DeriveSpec("rolling_sum_by",
        Map("col" -> "v", "by" -> "t", "window_size" -> 3, "closed" -> "none")))(df)
      .orderBy("t").collect()
    // right (t-3, t]: t=4 sees {2,4}; both [t-3, t]: t=4 also sees t=1
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 3.0, 6.0, 8.0))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 3.0, 7.0, 8.0))
    // left [t-3, t): t=4 sees {1,2}; none (t-3, t): t=4 sees {2}
    assert(out(2).getDouble(4) == 3.0 && out(2).getDouble(5) == 2.0)
    assert(out(3).isNullAt(4) && out(3).isNullAt(5), "empty frame -> null sum")
    // duration strings parse against an epoch-seconds axis
    val dur = derive("m" -> DeriveSpec("rolling_mean_by",
      Map("col" -> "v", "by" -> "t", "window_size" -> "1m")))(
      Seq((0L, 2.0), (59L, 4.0), (61L, 6.0)).toDF("t", "v"))
      .orderBy("t").select("m").as[Double].collect()
    assert(dur.toSeq == Seq(2.0, 3.0, 5.0))
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("rolling_sum_by")(
        Map("col" -> "v", "by" -> "t", "window_size" -> 3, "closed" -> "sideways"))
    }
  }

  test("qcut: quantile bins with labels, integer form, null passthrough") {
    val df = (1 to 8).map(i => (i, i.toDouble)).toDF("id", "v")
      .union(Seq((9, Option.empty[Double])).toDF("id", "v"))
    val out = derive(
      "quart" -> DeriveSpec("qcut", Map("col" -> "v",
        "quantiles" -> Seq(0.25, 0.5, 0.75),
        "labels" -> Seq("a", "b", "c", "d"))),
      "half" -> DeriveSpec("qcut", Map("col" -> "v", "quantiles" -> 2)))(df)
      .orderBy("id").collect()
    // exact quantiles of 1..8: q25=2.75, q50=4.5, q75=6.25
    assert(out.take(8).map(_.getString(2)).toSeq ==
      Seq("a", "a", "b", "b", "c", "c", "d", "d"))
    assert(out.take(8).map(_.getString(3)).toSeq ==
      Seq("0", "0", "0", "0", "1", "1", "1", "1"))
    assert(out(8).isNullAt(2) && out(8).isNullAt(3), "null value -> null bin")
    intercept[IllegalArgumentException] { // labels arity
      ExprRegistry.resolve("qcut")(Map("col" -> "v",
        "quantiles" -> Seq(0.5), "labels" -> Seq("only_one")))
    }
    intercept[IllegalArgumentException] { // probabilities outside (0,1)
      ExprRegistry.resolve("qcut")(Map("col" -> "v", "quantiles" -> Seq(0.0, 0.5)))
    }
  }

  test("winsorize: caps at the column's own quantiles, nulls pass through, approx agrees") {
    val df = (1 to 20).map(i => (i, i.toDouble)).toDF("id", "v")
      .union(Seq((21, Option.empty[Double])).toDF("id", "v"))
    val out = derive(
      "w" -> DeriveSpec("winsorize", Map("col" -> "v",
        "lower" -> 0.1, "upper" -> 0.9)))(df)
      .orderBy("id").collect()
    // exact quantiles of 1..20: q10 = 2.9, q90 = 18.1
    val vals = out.take(20).map(_.getDouble(2))
    assert(vals.head == 2.9 && vals(1) == 2.9, s"low tail capped at q10: ${vals.take(3).toSeq}")
    assert(vals(19) == 18.1 && vals(18) == 18.1, s"high tail capped at q90: ${vals.drop(17).toSeq}")
    assert(vals(9) == 10.0, "interior values untouched")
    assert(out(20).isNullAt(2), "null passes through, not resurrected as the lower bound")
    // approx mode reproduces exact at this cardinality (same rationale as qcut's)
    val ap = derive("w" -> DeriveSpec("winsorize", Map("col" -> "v",
      "lower" -> 0.1, "upper" -> 0.9, "method" -> "approx")))(df)
      .orderBy("id").collect().take(20).map(_.getDouble(2))
    assert(!ap.exists(v => v < 2.0 || v > 19.0), s"approx caps the tails: ${ap.toSeq}")
    intercept[IllegalArgumentException] { // lower must be below upper
      ExprRegistry.resolve("winsorize")(Map("col" -> "v", "lower" -> 0.9, "upper" -> 0.1))
    }
  }

  test("qcut method=approx: sketch breakpoints bin identically at default accuracy") {
    // at accuracy 10000 over 1k distinct values the KLL-style sketch is
    // exact, so approx must reproduce the exact path bin-for-bin; the
    // switch exists for the 100 TB path where exact percentile's
    // per-partition value->count map is the memory hazard
    val df = (1 to 1000).map(i => (i, i.toDouble)).toDF("id", "v")
    val out = derive(
      "ex" -> DeriveSpec("qcut", Map("col" -> "v", "quantiles" -> 4)),
      "ap" -> DeriveSpec("qcut", Map("col" -> "v", "quantiles" -> 4,
        "method" -> "approx")),
      "ap_acc" -> DeriveSpec("qcut", Map("col" -> "v", "quantiles" -> 4,
        "method" -> "approx", "accuracy" -> 100)))(df).collect()
    assert(out.forall(r => r.getString(2) == r.getString(3)),
      "approx must agree with exact here")
    assert(out.forall(r => !r.isNullAt(4)), "low-accuracy path still bins")
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("qcut")(Map("col" -> "v", "quantiles" -> 2,
        "method" -> "guess"))
    }
  }

  test("qcut left_closed flips the boundary bin") {
    // breakpoint q50 of 1..4 = 2.5 is not a data point, so make one:
    // values {1,2,2,3}: q50 = 2.0 exactly — left_closed decides bin of 2.0
    val df = Seq((1, 1.0), (2, 2.0), (3, 2.0), (4, 3.0)).toDF("id", "v")
    val out = derive(
      "rc" -> DeriveSpec("qcut", Map("col" -> "v", "quantiles" -> Seq(0.5))),
      "lc" -> DeriveSpec("qcut", Map("col" -> "v", "quantiles" -> Seq(0.5),
        "left_closed" -> true)))(df).orderBy("id").collect()
    assert(out(1).getString(2) == "0", "(−inf, 2] keeps 2.0 in bin 0")
    assert(out(1).getString(3) == "1", "[2, +inf) pushes 2.0 to bin 1")
  }

  test("search_sorted: sides, null-first convention, whole-frame broadcast") {
    val df = Seq(Some(1.0), Some(3.0), Some(3.0), Some(7.0), None).toDF("v")
    val out = derive(
      "l" -> DeriveSpec("search_sorted", Map("col" -> "v", "element" -> 3, "side" -> "left")),
      "r" -> DeriveSpec("search_sorted", Map("col" -> "v", "element" -> 3, "side" -> "right")),
      "a" -> DeriveSpec("search_sorted", Map("col" -> "v", "element" -> 3)))(df)
    val row = out.select("l", "r", "a").distinct().head()
    // sorted nulls-first: [null, 1, 3, 3, 7] — left inserts 3 at idx 2,
    // right after the ties at idx 4, any == left
    assert(row.getLong(0) == 2L && row.getLong(1) == 4L && row.getLong(2) == 2L)
    assert(out.count() == 5, "scalar broadcasts to every row")
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("search_sorted")(
        Map("col" -> "v", "element" -> 3, "side" -> "middle"))
    }
  }

  test("replace: mapping + old/new lists remap, unmapped and null pass through") {
    val df = Seq((1, Some("a")), (2, Some("b")), (3, Some("z")), (4, None))
      .toDF("id", "v")
    val out = derive(
      "m" -> DeriveSpec("replace", Map("col" -> "v",
        "mapping" -> Map("a" -> "alpha", "b" -> "beta"))),
      "l" -> DeriveSpec("replace", Map("col" -> "v",
        "old" -> Seq("a", "z"), "new" -> Seq("A", "Z"))))(df)
      .orderBy("id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("alpha", "beta", "z", null))
    assert(out.map(_.getString(3)).toSeq == Seq("A", "b", "Z", null))
    // null-safe matching: a null KEY in the mapping rewrites null rows
    val nulled = derive("n" -> DeriveSpec("replace", Map("col" -> "v",
      "old" -> Seq(null), "new" -> Seq("was_null"))))(df).orderBy("id").collect()
    assert(nulled.map(_.getString(2)).toSeq == Seq("a", "b", "z", "was_null"))
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("replace")(Map("col" -> "v", "old" -> Seq("a"), "new" -> Nil))
    }
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("replace")(Map("col" -> "v"))
    }
  }

  test("replace_strict: total mapping maps, unmapped raises, default rescues") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val ok = derive("r" -> DeriveSpec("replace_strict", Map("col" -> "v",
      "mapping" -> Map("a" -> 10, "b" -> 20))))(df).orderBy("id").collect()
    assert(ok.map(_.getInt(2)).toSeq == Seq(10, 20))
    val withDefault = derive("r" -> DeriveSpec("replace_strict", Map("col" -> "v",
      "mapping" -> Map("a" -> 10), "default" -> -1)))(df).orderBy("id").collect()
    assert(withDefault.map(_.getInt(2)).toSeq == Seq(10, -1))
    val e = intercept[Exception] {
      derive("r" -> DeriveSpec("replace_strict", Map("col" -> "v",
        "mapping" -> Map("a" -> 10))))(df).collect()
    }
    assert(e.getMessage.contains("unmapped value"), s"got: ${e.getMessage}")
  }

  test("arg_max/arg_min: idx at the extreme, ties to smallest idx, nulls never win") {
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(9.0)), (3L, Some(9.0)),
      (4L, Some(1.0)), (5L, Some(1.0)), (6L, None)
    ).toDF("idx", "v")
    val out = derive(
      "amax" -> DeriveSpec("arg_max", Map("col" -> "v", "idx_col" -> "idx")),
      "amin" -> DeriveSpec("arg_min", Map("col" -> "v", "idx_col" -> "idx")))(df)
    val row = out.select("amax", "amin").distinct().head()
    assert(row.getLong(0) == 2L, "max 9.0 first seen at idx 2")
    assert(row.getLong(1) == 4L, "min 1.0 first seen at idx 4")
    assert(out.count() == 6, "whole-frame scalar broadcasts to every row")
  }

  test("round_sig_figs: dynamic per-value scale; zero/null pass through") {
    val df = Seq((1, Some(1234.567)), (2, Some(0.0012345)), (3, Some(-98765.0)),
      (4, Some(0.0)), (5, None)).toDF("id", "v")
    val out = derive("s" -> DeriveSpec("round_sig_figs",
      Map("col" -> "v", "digits" -> 3)))(df).orderBy("id").collect()
    assert(math.abs(out(0).getDouble(2) - 1230.0) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - 0.00123) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - -98800.0) < 1e-7)
    assert(out(3).getDouble(2) == 0.0)
    assert(out(4).isNullAt(2))
    intercept[IllegalArgumentException] {
      ExprRegistry.resolve("round_sig_figs")(Map("col" -> "v"))
    }
  }

  test("flatten: one nesting level of list<list<T>>") {
    val df = Seq((1, Seq(Seq(1, 2), Seq(3)))).toDF("id", "v")
    val out = derive("f" -> DeriveSpec("flatten", Map("col" -> "v")))(df).head()
    assert(out.getSeq[Int](2) == Seq(1, 2, 3))
  }

  test("unknown fn name lists alternatives") {
    val e = intercept[IllegalArgumentException](ExprRegistry.resolve("no_such_fn"))
    assert(e.getMessage.contains("unknown derive fn"))
  }

  test("registry tail: dot / rolling_skew / rolling_kurtosis / cumulative_eval") {
    // dot: Σ a·b = 1*4 + 2*5 + 3*6 = 32, whole-frame broadcast onto rows
    val df = Seq((1, 1.0, 4.0), (2, 2.0, 5.0), (3, 3.0, 6.0)).toDF("t", "a", "b")
    val dot = derive("d" -> DeriveSpec("dot",
      Map("col" -> "a", "other_col" -> "b")))(df)
    assert(dot.select("d").as[Double].collect().toSeq == Seq(32.0, 32.0, 32.0))
    // rolling_skew over a symmetric 3-row window is 0; rolling_kurtosis of
    // {1,2,3} is Spark's excess form m4/m2² - 3 = (2/3)/(2/3)² - 3 = -1.5
    val rk = derive(
      "sk" -> DeriveSpec("rolling_skew",
        Map("col" -> "a", "order_by" -> Seq("t"), "window_size" -> 3)),
      "ku" -> DeriveSpec("rolling_kurtosis",
        Map("col" -> "a", "order_by" -> Seq("t"), "window_size" -> 3)))(df)
      .orderBy("t").collect()
    assert(math.abs(rk(2).getDouble(3)) < 1e-12, s"skew of {1,2,3}: ${rk(2).getDouble(3)}")
    assert(math.abs(rk(2).getDouble(4) - (-1.5)) < 1e-12, s"kurtosis of {1,2,3}: ${rk(2).getDouble(4)}")
    // cumulative_eval generalizes cum_*: expanding mean here
    val ce = derive("m" -> DeriveSpec("cumulative_eval",
      Map("col" -> "a", "agg" -> "mean", "order_by" -> Seq("t"))))(df)
    assert(ce.orderBy("t").select("m").as[Double].collect().toSeq == Seq(1.0, 1.5, 2.0))
    // unknown agg name fails with the supported set listed
    val err = intercept[IllegalArgumentException] {
      ExprRegistry.resolve("cumulative_eval")(
        Map("col" -> "a", "agg" -> "median", "order_by" -> Seq("t")))
    }
    assert(err.getMessage.contains("supports agg in"))
  }

  test("registry breadth floor: a refactor must not silently drop fns") {
    assert(ExprRegistry.fns.size >= 180,
      s"registry shrank to ${ExprRegistry.fns.size} fns (round-2 floor: 180)")
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
      "is_duplicated", "is_unique", "rolling_mean",
      // round-10 tail: the last config-addressable pl.Expr stragglers
      "rle_id", "qcut", "search_sorted",
      "rolling_mean_by", "rolling_sum_by", "rolling_min_by", "rolling_max_by")
    val missing = promised.filterNot(ExprRegistry.fns.contains)
    assert(missing.isEmpty, s"missing registry fns: $missing")
  }

  test("unknown-fn errors are actionable: builtin spelling + nearest-match hints") {
    // frame-level builtin spelled as a derive fn -> told the right stage
    val ewm = intercept[IllegalArgumentException](ExprRegistry.resolve("ewm_mean"))
    assert(ewm.getMessage.contains("custom_transformations") &&
      ewm.getMessage.contains("frame-level builtin"),
      s"ewm_mean error must name the builtin spelling, got: ${ewm.getMessage}")
    val rle = intercept[IllegalArgumentException](ExprRegistry.resolve("rle"))
    assert(rle.getMessage.contains("custom_transformations"))
    // typo -> nearest-match candidates before the 241-name wall
    val typo = intercept[IllegalArgumentException](ExprRegistry.resolve("cum_summ"))
    assert(typo.getMessage.contains("did you mean") && typo.getMessage.contains("cum_sum"),
      s"typo error must suggest cum_sum, got: ${typo.getMessage.take(200)}")
    // far-off garbage still lists the catalog
    val far = intercept[IllegalArgumentException](ExprRegistry.resolve("zzzzzzzzzzz"))
    assert(far.getMessage.contains("known:"))
  }

  test("wrapped-aggregate fns work WINDOWED (the aggOrOverEach regression) + NaN semantics") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, Double.NaN), ("a", 3L, 3.0),
      ("b", 4L, 5.0), ("b", 5L, 2.0)).toDF("g", "id", "x")
      .withColumn("xn", when(col("id") === 4L, lit(null).cast("double")).otherwise(col("x")))
    // top_k / top_k_by / null_count / has_nulls / nan_min with
    // partition_by used to raise MISSING_GROUP_BY (.over on the outer
    // expression instead of the aggregate) — pin the windowed forms
    val out = derive(
      "tk" -> DeriveSpec("top_k", Map("col" -> "id", "k" -> 2, "partition_by" -> Seq("g"))),
      "tkb" -> DeriveSpec("top_k_by", Map("col" -> "x", "by" -> "id", "k" -> 1,
        "partition_by" -> Seq("g"))),
      "nc" -> DeriveSpec("null_count", Map("col" -> "xn", "partition_by" -> Seq("g"))),
      "hn" -> DeriveSpec("has_nulls", Map("col" -> "xn", "partition_by" -> Seq("g"))),
      "nmin" -> DeriveSpec("nan_min", Map("col" -> "x", "partition_by" -> Seq("g"))),
      "nmax" -> DeriveSpec("nan_max", Map("col" -> "x", "partition_by" -> Seq("g"))))(df)
      .collect().map(r => (r.getLong(1),
        (r.getSeq[Long](4), r.getSeq[Double](5), r.getLong(6), r.getBoolean(7),
          r.getDouble(8), r.getDouble(9)))).toMap
    val (tkA, tkbA, ncA, hnA, nminA, nmaxA) = out(1L)
    assert(tkA == Seq(3L, 2L) && tkbA == Seq(3.0))
    assert(ncA == 0L && !hnA)
    // NaN PROPAGATES (polars nan_min/nan_max), in the windowed form too
    assert(nminA.isNaN && nmaxA.isNaN)
    val (tkB, tkbB, ncB, hnB, nminB, nmaxB) = out(4L)
    assert(tkB == Seq(5L, 4L) && tkbB == Seq(2.0))
    assert(ncB == 1L && hnB)
    assert(nminB == 2.0 && nmaxB == 5.0)
    // whole-frame forms of the same fns (one agg pass + broadcast)
    val whole = derive(
      "nc" -> DeriveSpec("null_count", Map("col" -> "xn")),
      "hn" -> DeriveSpec("has_nulls", Map("col" -> "xn")),
      "nmin" -> DeriveSpec("nan_min", Map("col" -> "x")))(df).head()
    assert(whole.getLong(4) == 1L && whole.getBoolean(5) && whole.getDouble(6).isNaN)
    // is_close: rel/abs tolerance + nans_equal
    val cl = derive(
      "c1" -> DeriveSpec("is_close", Map("col" -> "x", "other_col" -> "x",
        "nans_equal" -> true)))(df)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(cl.values.forall(identity)) // x ~ x everywhere, NaN==NaN allowed
    val cl2 = derive(
      "c2" -> DeriveSpec("is_close", Map("col" -> "x", "other_col" -> "x")))(df)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(!cl2(2L)) // NaN != NaN by default
  }

  test("excluded pl.Expr names resolve to their documented reason, not a fuzzy match") {
    val e = intercept[IllegalArgumentException](ExprRegistry.resolve("sample"))
    assert(e.getMessage.contains("deliberately-excluded") &&
      e.getMessage.contains("stratified_sample"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](ExprRegistry.resolve("explode"))
    assert(e2.getMessage.contains("unnest") || e2.getMessage.contains("S11"), e2.getMessage)
  }

  test("builtinSpellings stays in sync with BuiltinTransformations.registry") {
    assert(ExprRegistry.builtinSpellings == graft.service.BuiltinTransformations.registry.keySet,
      "update ExprRegistry.builtinSpellings when adding/removing a builtin")
  }
}
