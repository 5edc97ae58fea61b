package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.io.FakeIO
import graft.service.Pipeline

/** Config-from-data loader spec: YAML -> GeneralConfig -> pipeline, the
  * reference's primary user surface (reference: core/config.py:65-68
  * from_dict; tests/services/test_basic_pipeline.py:172-287 drive the whole
  * pipeline from a config dict). */
class ConfigLoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fullCfg = GeneralConfig(
    processName = "ingest",
    srcPath = "/src/raw.parquet",
    dstRoot = "/out",
    validation = Seq(
      RuleSpec("name_not_null", "name", "is_not_null"),
      RuleSpec("bonus_non_neg", "bonus", "ge", Some(0.0))),
    transformations = TransformConfig(
      dedupeCols = Seq("*"),
      unnestCols = Seq("projects"),
      filterRules = Seq(RuleSpec("not_div_d", "division", "ne", Some("D"))),
      fillMap = Seq("bonus" -> 0.0),
      recastMap = Seq("salary" -> "Int64"),
      clipMap = Seq("salary" -> (10000, 60000)),
      newColMap = Seq(
        "mean_salary" -> DeriveSpec("mean", Map("col" -> "salary")),
        "total_comp" -> DeriveSpec("add_cols", Map("cols" -> Seq("salary", "bonus")))),
      renameMap = Seq("division" -> "dept")),
    selectCols = Seq("*"))

  test("YamlEmit -> YamlParse -> ConfigLoader is a fixed point") {
    val yaml = YamlEmit.emit(YamlEmit.configToMap(fullCfg))
    val reloaded = ConfigLoader.fromYaml(yaml)
    // compare via re-emission: numeric widening (Int -> Long) through the
    // parser is invisible in the canonical emitted form
    assert(YamlEmit.emit(YamlEmit.configToMap(reloaded)) == yaml)
    // and the semantically-typed pieces survived exactly
    assert(reloaded.validation == fullCfg.validation)
    assert(reloaded.transformations.filterRules == fullCfg.transformations.filterRules)
    assert(reloaded.transformations.recastMap == fullCfg.transformations.recastMap)
    assert(reloaded.transformations.newColMap == fullCfg.transformations.newColMap)
    assert(reloaded.selectCols == Seq("*"))
  }

  test("custom transformations and duplicate-named filter rules survive the round trip") {
    val cfg = fullCfg.copy(
      customTransformations = Seq(
        "cap_rows" -> Map("n" -> 100),
        "tag" -> Map.empty[String, Any]),
      transformations = fullCfg.transformations.copy(filterRules = Seq(
        RuleSpec("range_check", "salary", "gt", Some(0L)),
        RuleSpec("range_check", "bonus", "ge", Some(0.0))))) // same name, both must survive
    val reloaded = ConfigLoader.fromYaml(YamlEmit.emit(YamlEmit.configToMap(cfg)))
    assert(reloaded.customTransformations.map(_._1) == Seq("cap_rows", "tag"))
    assert(reloaded.customTransformations.head._2 == Map("n" -> 100L))
    assert(reloaded.transformations.filterRules.size == 2,
      "duplicate rule names must not collapse in the emit")
    assert(reloaded.transformations.filterRules.map(_.col) == Seq("salary", "bonus"))
  }

  test("src/dst IO options parse from YAML, round-trip, and reject structures") {
    val yaml =
      """process_name: p
        |src_path: /src/data.tsv
        |dst_root: /out
        |src_file_type: CSV
        |src_options:
        |  sep: "\t"
        |  header: true
        |dst_options:
        |  compression: zstd
        |""".stripMargin
    val cfg = ConfigLoader.fromYaml(yaml)
    // YAML-typed values stringify for Spark's stringly option API; the
    // \t escape must land as a real tab (the TSV spelling)
    assert(cfg.srcOptions == Seq("sep" -> "\t", "header" -> "true"))
    assert(cfg.dstOptions == Seq("compression" -> "zstd"))
    // emit -> reload fixed point holds with options present
    val reloaded = ConfigLoader.fromYaml(YamlEmit.emit(YamlEmit.configToMap(cfg)))
    assert(reloaded.srcOptions == cfg.srcOptions && reloaded.dstOptions == cfg.dstOptions)
    // a nested structure is a config bug, not an option value
    val bad = intercept[IllegalArgumentException] {
      ConfigLoader.fromYaml(
        "process_name: p\nsrc_path: /s\ndst_root: /o\nsrc_options:\n  sep:\n    nested: x\n")
    }
    assert(bad.getMessage.contains("src_options.sep"))
  }

  test("golden E2E: a tab-separated CSV source reads through src_options (real SparkIO)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tsv")
    val src = tmp.resolve("people.tsv")
    java.nio.file.Files.writeString(src,
      "name\tsalary\nalice\t30000\nben\t28000\n")
    val yaml =
      s"""process_name: tsv_ingest
         |src_path: $src
         |dst_root: $tmp/out
         |src_file_type: CSV
         |src_options:
         |  sep: "\\t"
         |""".stripMargin
    val cfg = ConfigLoader.fromYaml(yaml)
    val res = Pipeline.runPipeline(spark, cfg, new graft.io.SparkIO)
    val out = res.transformed
    // without the sep option this parses as ONE comma-split column;
    // with it the schema is (name, salary) + sys cols and both rows load
    assert(out.columns.take(2).toSeq == Seq("name", "salary"))
    assert(out.count() == 2)
    assert(out.select("salary").collect().map(_.getInt(0)).sorted.toSeq == Seq(28000, 30000))
  }

  test("builtin-registry kwargs parse from YAML with the types the fns expect") {
    val yaml =
      """process_name: p
        |src_path: /s
        |dst_root: /d
        |custom_transformations:
        |  fuzzy_dedup:
        |    id_col: doc_id
        |    text_col: text
        |    shingle_k: 2
        |    max_bucket: 5000
        |  quality_filter:
        |    text_col: text
        |    max_punct_ratio: 0.35
        |    action: flag
        |  stratified_sample:
        |    id_col: doc_id
        |    strata_col: lang
        |    fractions:
        |      en: 0.5
        |      de: 1.0
        |  pack_sequences:
        |    id_col: doc_id
        |    token_col: n_tokens
        |    partition_col: lang
        |    budget: 2048
        |""".stripMargin
    val cfg = ConfigLoader.fromYaml(yaml)
    val ct = cfg.customTransformations.toMap
    assert(cfg.customTransformations.map(_._1) ==
      Seq("fuzzy_dedup", "quality_filter", "stratified_sample", "pack_sequences"))
    // ints arrive as Long (YamlParse), doubles as Double, strings as String
    assert(ct("fuzzy_dedup")("shingle_k") == 2L && ct("fuzzy_dedup")("max_bucket") == 5000L)
    assert(ct("quality_filter")("max_punct_ratio") == 0.35)
    assert(ct("quality_filter")("action") == "flag")
    assert(ct("pack_sequences")("budget") == 2048L)
    val fr = ct("stratified_sample")("fractions").asInstanceOf[collection.Map[String, Any]]
    assert(fr("en") == 0.5 && fr("de") == 1.0)
    // every name resolves in the default registry
    cfg.customTransformations.map(_._1).foreach { n =>
      assert(graft.service.BuiltinTransformations.registry.contains(n), s"missing builtin: $n")
    }
  }

  test("inline comments are stripped outside quotes, kept inside them") {
    val parsed = YamlParse.parse(
      """a: 1          # trailing comment
        |b: "kept # not a comment"
        |c: plain#glued   # YAML: '#' without preceding space is scalar text
        |""".stripMargin)
    assert(parsed == scala.collection.immutable.ListMap(
      "a" -> 1L, "b" -> "kept # not a comment", "c" -> "plain#glued"))
  }

  test("mis-indented YAML errors instead of silently dropping trailing keys") {
    val bad =
      """process_name: p
        |src_path: /s
        |dst_root: /d
        |transformations:
        |    drop_cols:
        |      - x
        |  rename_map:
        |    a: b
        |""".stripMargin
    val e = intercept[IllegalArgumentException](ConfigLoader.fromYaml(bad))
    assert(e.getMessage.contains("rename_map") || e.getMessage.contains("unreachable"),
      s"silent truncation would skip the rename stage: ${e.getMessage}")
  }

  test("unknown keys are dropped, like the reference's from_dict") {
    val cfg = ConfigLoader.generalFromMap(Map(
      "process_name" -> "p", "src_path" -> "/s", "dst_root" -> "/d",
      "mystery_key" -> "ignored", "another" -> Map("nested" -> 1)))
    assert(cfg.processName == "p" && cfg.srcPath == "/s")
    val t = ConfigLoader.transformFromMap(Map(
      "drop_cols" -> Seq("x"), "not_a_stage" -> "ignored"))
    assert(t.dropCols == Seq("x") && t == TransformConfig(dropCols = Seq("x")))
  }

  test("bad recast dtype names fail at config-build time, not first use") {
    val e = intercept[IllegalArgumentException] {
      ConfigLoader.transformFromMap(Map("recast_map" -> Map("c" -> "NotAType")))
    }
    assert(e.getMessage.contains("NotAType"))
  }

  test("YAML string drives the full pipeline end-to-end (golden case)") {
    val yaml =
      """# full-config pipeline, hand-written YAML (reference golden case 1)
        |process_name: ingest
        |src_path: /src/raw.parquet
        |dst_root: /out
        |src_file_type: parquet
        |dst_file_type: parquet
        |validation:
        |  name_not_null:
        |    - name
        |    - is_not_null
        |  bonus_non_neg:
        |    - bonus
        |    - ge
        |    - 0.0
        |transformations:
        |  dedupe_cols:
        |    - "*"
        |  unnest_cols:
        |    - projects
        |  filter_exprs:
        |    not_div_d:
        |      - division
        |      - ne
        |      - D
        |  fill_map:
        |    bonus: 0.0
        |  recast_map:
        |    salary: Int64
        |  clip_map:
        |    salary:
        |      - 10000
        |      - 60000
        |  new_col_map:
        |    mean_salary:
        |      fn_name: mean
        |      fn_kwargs:
        |        col: salary
        |    total_comp:
        |      fn_name: add_cols
        |      fn_kwargs:
        |        cols:
        |          - salary
        |          - bonus
        |  rename_map:
        |    division: dept
        |select_cols: "*"
        |some_unknown_key: silently dropped
        |""".stripMargin
    val cfg = ConfigLoader.fromYaml(yaml)

    val projSchema = StructType(Seq(
      StructField("project a", DoubleType), StructField("project b", DoubleType),
      StructField("project c", DoubleType), StructField("project d", DoubleType)))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("salary", LongType),
      StructField("division", StringType), StructField("bonus", DoubleType),
      StructField("projects", projSchema)))
    def proj(a: Any, b: Any, c: Any, d: Any) = Row(a, b, c, d)
    val employees = Seq(
      Row("alice ", 30000L, " B", 10000.0, proj(0.5, 0.5, null, null)),
      Row("ben", 28000L, "C", 15000.0, proj(null, null, 1.0, 0.0)),
      Row("charlie", 75000L, "A", null, proj(0.65, 0.35, null, null)),
      Row(null, 0L, "", 0.0, proj(null, null, 0.45, 0.55)),
      Row("dani", 50000L, "D", 70000.0, proj(0.95, 0.05, null, null)),
      Row("dani", 50000L, "D", 70000.0, proj(0.95, 0.05, null, null)),
      Row("emily", 80000L, "A", -5000.0, proj(null, null, 0.5, 0.5)))
    val io = new FakeIO()
    io.frames.put("/src/raw.parquet",
      spark.createDataFrame(spark.sparkContext.parallelize(employees, 2), schema))

    val res = Pipeline.runPipeline(spark, cfg, io)

    // identical outcomes to the Scala-constructed golden case in
    // PipelineE2ESpec — the YAML surface adds no behavior drift
    assert(res.invalid.count() == 2)
    assert(res.transformed.count() == 4)
    val rows = res.transformed.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(rows.keySet == Set("alice", "ben", "charlie", "dani"))
    assert(rows("charlie").getAs[Long]("salary") == 60000L, "clip via YAML-typed [lo, hi]")
    assert(rows("charlie").getAs[Double]("bonus") == 0.0, "fill via YAML double")
    assert(rows("dani").getAs[String]("dept") == "d", "rename via YAML map")
    val means = res.transformed.select("mean_salary").collect().map(_.getDouble(0)).distinct
    assert(means.toSeq == Seq(42000.0))
    // the emitted config artifact can itself be re-loaded (config closes
    // the loop: run -> emit -> load -> run)
    val emitted = io.texts.values.head
    val reloaded = ConfigLoader.fromYaml(emitted)
    assert(reloaded.processName == "ingest" && reloaded.guid == "abc-123")
    assert(reloaded.transformations.newColMap.map(_._1) == Seq("mean_salary", "total_comp"))
  }
}
