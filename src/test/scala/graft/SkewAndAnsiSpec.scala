package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.stages.Transforms

class SkewAndAnsiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals plain aggregation on a skewed key distribution") {
    // 90% of rows share one key — the shape salting exists for
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 17}", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), 16)(
        partialAggs = Seq(count(lit(1)).as("c"), sum($"v").as("s")),
        finalAggs = Seq(sum($"c").as("n"), sum($"s").as("total")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain inner join, including duplicate keys") {
    val big = ((1 to 5000).map(i => ("hot", i)) ++ Seq(("cold", 1), ("cold", 2)))
      .toDF("k", "v").repartition(8)
    val dim = Seq(("hot", "H"), ("cold", "C"), ("absent", "X")).toDF("k", "label")
    val plain = big.join(dim, Seq("k")).groupBy($"k", $"label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"), 8).groupBy($"k", $"label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(plain == Set(("hot", "H", 5000L), ("cold", "C", 2L)))
  }

  test("salt expressions are deterministic (SPARK-23207: no re-salt drift on retry)") {
    // A nondeterministic salt (rand, monotonically_increasing_id) re-salts
    // rows differently when a shuffle stage is partially recomputed —
    // duplicating/losing rows across reducers. Assert NO nondeterministic
    // expression anywhere in either salted plan.
    val big = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val dim = Seq(("a", "A"), ("b", "B")).toDF("k", "label")
    val plans = Seq(
      Skew.saltedJoin(big, dim, Seq("k"), 4).queryExecution.analyzed,
      Skew.saltedAgg(big, Seq("k"), 4)(
        Seq(count(lit(1)).as("c")), Seq(sum($"c").as("n"))).queryExecution.analyzed)
    plans.foreach { plan =>
      val nondet = plan.collect { case node => node.expressions }.flatten
        .flatMap(_.collect { case e if !e.deterministic => e })
      assert(nondet.isEmpty, s"nondeterministic salt expressions: $nondet")
    }
  }

  test("recast under ANSI mode is strict (errors) like Polars strict_cast; lax otherwise") {
    val df = Seq("12", "not-a-number").toDF("s")
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val lax = Transforms.recastCols(Seq("s" -> "Int64"))(df).collect()
      assert(lax.count(_.isNullAt(0)) == 1, "non-ANSI: bad cast -> null")
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val e = intercept[Exception] {
        Transforms.recastCols(Seq("s" -> "Int64"))(df).collect()
      }
      assert(e.getMessage.contains("CAST_INVALID_INPUT") || e.getCause != null,
        s"ANSI: bad cast must error (SURVEY §7.4-6), got: ${e.getMessage.take(200)}")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("new registry families resolve and evaluate") {
    import graft.config.DeriveSpec
    val df = Seq((" ab ", Seq(3.0, 1.0, 2.0), 16.0)).toDF("s", "arr", "x")
    val out = Transforms.deriveNewCols(Seq(
      "mn" -> DeriveSpec("min_cols", Map("cols" -> Seq("x", "x"))),
      "llen" -> DeriveSpec("list_len", Map("col" -> "arr")),
      "lmax" -> DeriveSpec("list_max", Map("col" -> "arr")),
      "lsort" -> DeriveSpec("list_sort", Map("col" -> "arr")),
      "lget" -> DeriveSpec("list_get", Map("col" -> "arr", "index" -> 1)),
      "padded" -> DeriveSpec("str_zfill", Map("col" -> "s", "length" -> 6)),
      "fin" -> DeriveSpec("is_finite", Map("col" -> "x")),
      "q50" -> DeriveSpec("quantile", Map("col" -> "x", "quantile" -> 0.5)))) (df)
      .head()
    assert(out.getAs[Double]("mn") == 16.0)
    assert(out.getAs[Int]("llen") == 3)
    assert(out.getAs[Double]("lmax") == 3.0)
    assert(out.getAs[scala.collection.Seq[Double]]("lsort").toSeq == Seq(1.0, 2.0, 3.0))
    assert(out.getAs[Double]("lget") == 1.0)
    assert(out.getAs[String]("padded").length == 6 &&
      out.getAs[String]("padded").startsWith("0"))
    assert(out.getAs[Boolean]("fin"))
    assert(out.getAs[Double]("q50") == 16.0)
  }
}
