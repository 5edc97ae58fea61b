package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{DeriveSpec, GeneralConfig, RuleSpec, TransformConfig}
import graft.expr.RuleParser
import graft.stages.Validation

class ValidationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extractExpectedCols is rename-aware and excludes derived cols") {
    val cfg = GeneralConfig(
      processName = "t", srcPath = "/s", dstRoot = "/d",
      validation = Seq(RuleSpec("r1", "name", "is_not_null")),
      transformations = TransformConfig(
        renameMap = Seq("division" -> "dept"),
        dropCols = Seq("dept"), // post-rename name -> must map back to 'division'
        fillMap = Seq("bonus" -> 0),
        newColMap = Seq(
          "total" -> DeriveSpec("add_cols", Map("cols" -> Seq("salary", "bonus"))),
          "total2x" -> DeriveSpec("mul", Map("col" -> "total", "value" -> 2)))))
    val expected = Validation.extractExpectedCols(cfg)
    assert(expected == Set("name", "division", "bonus", "salary"))
  }

  test("checkExpectedCols throws listing missing columns") {
    val df = Seq((1, "x")).toDF("a", "b")
    Validation.checkExpectedCols(Set("a", "b"))(df) // ok
    val e = intercept[IllegalArgumentException] {
      Validation.checkExpectedCols(Set("a", "zz", "yy"))(df)
    }
    assert(e.getMessage.contains("yy, zz"))
  }

  test("null rule results do not flag rows (reference §2.3-6 semantics)") {
    val df = Seq(("a", Some(10.0)), ("b", Some(-1.0)), ("c", None)).toDF("name", "bonus")
    val rules = RuleParser.compile(Seq(RuleSpec("bonus_pos", "bonus", "gt", Some(0))))
    val annotated = Validation.withErrorReason(rules)(df)
    val reasons = annotated.select("name", "error_reason").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons("a") == "")
    assert(reasons("b") == "bonus_pos")
    assert(reasons("c") == "", "null predicate must not flag the row")
    val (valid, invalid) = Validation.split(annotated)
    assert(valid.count() == 2 && invalid.count() == 1)
    assert(!valid.columns.contains("error_reason") && invalid.columns.contains("error_reason"))
  }

  test("multiple failed rules comma-join in rule order") {
    val df = Seq((-5, "zz")).toDF("v", "s")
    val rules = RuleParser.compile(Seq(
      RuleSpec("v_pos", "v", "gt", Some(0)),
      RuleSpec("s_known", "s", "is_in", Some(Seq("a", "b")))))
    val reason = Validation.withErrorReason(rules)(df).select("error_reason").head().getString(0)
    assert(reason == "v_pos,s_known")
  }

  test("unknown rule op throws") {
    intercept[IllegalArgumentException] {
      RuleParser.compileOne(RuleSpec("x", "c", "frobnicate", Some(1)))
    }
  }
}
