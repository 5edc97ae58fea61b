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

  test("audio_features appends decoded WAV features; junk payloads mark, not drop") {
    val wavs = graft.operators.Multimodal.synthesizeWavs(
      Seq(0L, 1L, 5L).toDF("doc_id"), "doc_id") // id 0 carries non-audio bytes
    val out = registry("audio_features")(wavs,
      Map("id_col" -> "doc_id", "content_col" -> "content"))
    assert(out.count() == 3, "mark-not-drop: every input row survives")
    assert(out.filter(col("audio_decoded")).count() == 2)
    val r1 = out.filter(col("doc_id") === 1L)
      .select("n_frames", "duration_us", "sample_rate").head
    assert(r1.getLong(0) == 320L && r1.getLong(1) == 40000L && r1.getInt(2) == 8000)
    assert(out.filter(col("doc_id") === 0L && col("rms").isNull).count() == 1)
  }

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

  test("lang_id_supervised fits on labeled rows and predicts every row (builtin == direct)") {
    import graft.operators.TextAnalysis
    val words = Map("aa" -> Seq("alpha", "apple", "amara"), "zz" -> Seq("zigzag", "puzzle", "fuzzy"))
    val rows = (0 until 120).map { i =>
      val lang = Seq("aa", "zz")(i % 2)
      val w = words(lang)
      // every 5th row is UNLABELED — the builtin must still predict it
      (i.toLong, s"${w(i % 3)} ${w((i + 1) % 3)}", if (i % 5 == 0) null else lang)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val out = registry("lang_id_supervised")(df,
      Map("id_col" -> "doc_id", "text_col" -> "text", "label_col" -> "lang"))
    assert(out.columns.toSeq == df.columns.toSeq :+ "pred_lang")
    assert(out.count() == 120)
    // labeled rows recovered; unlabeled rows got a prediction
    val acc = out.filter(col("lang").isNotNull)
      .agg(avg(when(col("pred_lang") === col("lang"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"labeled accuracy $acc")
    assert(out.filter(col("lang").isNull && col("pred_lang").isNull).count() == 0)
    // builtin == direct operator composition
    val models = TextAnalysis.langIdFit(
      df.filter(col("lang").isNotNull), "doc_id", "text", "lang")
    val direct = TextAnalysis.langIdPredict(df, "doc_id", "text", models)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaB = out.select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaB == direct)
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

  test("withPersisted: dedup builtins leave ZERO new cached RDDs; pre-existing survive") {
    import graft.util.CacheScope
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val keepMe = docs.persist() // a frame the session cached ON PURPOSE
    keepMe.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before >= 1)
    val emb = Seq((1L, Array(1.0f, 0.01f)), (2L, Array(1.0f, 0.02f)),
      (3L, Array(0.1f, 1.0f))).toDF("doc_id", "emb")
    val (fuzzy, sem) = CacheScope.withPersisted(spark) {
      val f = registry("fuzzy_dedup")(docs,
        Map("id_col" -> "doc_id", "text_col" -> "text")).collect()
      val s = registry("semantic_dedup")(emb,
        Map("id_col" -> "doc_id", "vec_col" -> "emb", "k" -> 2, "threshold" -> 0.99))
        .collect()
      assert(spark.sparkContext.getPersistentRDDs.size > before,
        "fixture must actually exercise the operators' internal persists")
      (f, s)
    }
    assert(fuzzy.nonEmpty && sem.nonEmpty)
    // non-blocking unpersist: the entries leave the persistent-RDD map
    // immediately even though block eviction is async
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "scope exit must drop exactly the caches the body created")
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty, "pre-existing cache untouched")
    keepMe.unpersist(blocking = true)
  }

  test("semantic_dedup is deterministic: same frame, same YAML, identical survivors") {
    // the reproducibility property curation users rely on: re-running the
    // same config over the same corpus must keep exactly the same rows.
    // Holds by construction — the k-means fit seeds with the k lowest-id
    // vectors and every Lloyd mean routes through the exact decimal sum
    // (Similarity.kmeansFit), the cosine pair-drop keys on ids — but a
    // seeded-RNG regression anywhere in that chain would break it silently,
    // so it is pinned here by invoking the builtin twice
    val emb = (1L to 40L).map { i =>
      (i, Array((math.sin(i * 7.0) * 100).toFloat, (math.cos(i * 3.0) * 100).toFloat,
        ((i % 5) * 10).toFloat))
    }.toDF("doc_id", "emb")
    val kwargs = Map[String, Any]("id_col" -> "doc_id", "vec_col" -> "emb",
      "k" -> 4L, "iters" -> 2L, "threshold" -> 0.9)
    def run() = registry("semantic_dedup")(emb, kwargs)
      .select("doc_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val first = run()
    assert(first.nonEmpty && first.size < 40, "fixture must actually drop some rows")
    assert(run() == first, "second invocation diverged — determinism contract broken")
  }

  test("ewm_mean/ewm_var/ewm_std builtins: YAML-typed kwargs, list order_by, exact values") {
    // alpha 0.5 on the en series (10, 10, 9 ordered by doc_id) has a hand-
    // checkable closed form; order_by arrives as a YAML list (Seq) here and
    // as a plain string in the ewm_std case — both shapes must work
    val meanOut = registry("ewm_mean")(docs,
      Map("key_col" -> "lang", "order_by" -> Seq("doc_id"), "val_col" -> "n_tokens",
        "alpha" -> 0.5))
    assert(meanOut.columns.last == "ewm_mean" &&
      !meanOut.columns.contains("__ewm_v"), "shadow cast column must not leak")
    val means = meanOut.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ewm_mean")).toMap
    assert(math.abs(means(1L) - 10.0) < 1e-9)
    assert(math.abs(means(2L) - 10.0) < 1e-9)
    assert(math.abs(means(4L) - 16.5 / 1.75) < 1e-9) // (9 + .5*10 + .25*10)/1.75
    assert(math.abs(means(3L) - 10.0) < 1e-9) // de series resets state

    val varOut = registry("ewm_var")(docs,
      Map("key_col" -> "lang", "order_by" -> Seq("doc_id"), "val_col" -> "n_tokens",
        "alpha" -> 0.5, "out_col" -> "v"))
    val vars = varOut.collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[Any]("v"))).toMap
    assert(vars(1L).isEmpty && vars(3L).isEmpty, "first obs per key: null var")
    assert(math.abs(vars(2L).get.asInstanceOf[Double] - 0.0) < 1e-9)
    // s1=1.75 s2=1.3125 s1x=16.5 s1x2=156: biased = 156/1.75 - (66/7)^2 =
    // 12/49, debias factor s1^2/(s1^2-s2) = 1.75 -> var = 3/7
    assert(math.abs(vars(4L).get.asInstanceOf[Double] - 3.0 / 7.0) < 1e-9)

    val stdOut = registry("ewm_std")(docs,
      Map("key_col" -> "lang", "order_by" -> "doc_id", "val_col" -> "n_tokens",
        "alpha" -> 0.5))
    val stds = stdOut.collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[Any]("ewm_std"))).toMap
    assert(stds(1L).isEmpty)
    assert(math.abs(stds(4L).get.asInstanceOf[Double] - math.sqrt(3.0 / 7.0)) < 1e-9)

    // an out_col colliding with an existing column must die at build with
    // a clear message, not produce a duplicate-name schema
    val collide = intercept[IllegalArgumentException] {
      registry("ewm_mean")(docs,
        Map("key_col" -> "lang", "order_by" -> "doc_id", "val_col" -> "n_tokens",
          "alpha" -> 0.5, "out_col" -> "text"))
    }
    assert(collide.getMessage.contains("already exists"))
  }

  test("ewm_mean_by builtin: time-gap decay, YAML-typed kwargs") {
    // time = doc_id, half_life = 1.0 -> weight halves per id step; en
    // series (t=1,2,4; v=10,10,9), polars unadjusted recurrence: at t=4
    // the gap of 2 gives a=0.25, so y = 0.25*10 + 0.75*9 = 9.25
    val out = registry("ewm_mean_by")(docs,
      Map("key_col" -> "lang", "time_col" -> "doc_id", "val_col" -> "n_tokens",
        "half_life" -> 1.0, "order_by" -> Seq("doc_id")))
    assert(!out.columns.exists(_.startsWith("__ewm")), "shadow columns must not leak")
    val means = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ewm_mean_by")).toMap
    assert(math.abs(means(1L) - 10.0) < 1e-9)
    assert(math.abs(means(2L) - 10.0) < 1e-9)
    assert(math.abs(means(4L) - 9.25) < 1e-9)
    assert(math.abs(means(3L) - 10.0) < 1e-9) // de key resets
  }

  test("rle compresses runs per key: 0-based ids, null runs, guards") {
    val df = Seq(
      (1L, 1L, Some("a")), (1L, 2L, Some("a")), (1L, 3L, Some("b")),
      (1L, 4L, None), (1L, 5L, None), (1L, 6L, Some("a")),
      (2L, 1L, Some("z"))).toDF("k", "ord", "v")
    val out = registry("rle")(df,
      Map("col" -> "v", "order_by" -> Seq("ord"), "partition_by" -> Seq("k")))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("rle_id")) ->
        (r.getAs[Long]("len"), r.getAs[String]("value"))).toMap
    assert(out((1L, 0L)) == (2L, "a"), "first run: aa")
    assert(out((1L, 1L)) == (1L, "b"))
    assert(out((1L, 2L)) == (2L, null), "nulls form a run (null-safe compare)")
    assert(out((1L, 3L)) == (1L, "a"), "re-appearing value = NEW run")
    assert(out((2L, 0L)) == (1L, "z"), "fresh key restarts at run 0")
    assert(out.size == 5)
    intercept[IllegalArgumentException] { // output-name collision
      registry("rle")(df.withColumnRenamed("k", "len"),
        Map("col" -> "v", "order_by" -> Seq("ord"), "partition_by" -> Seq("len")))
    }
    intercept[IllegalArgumentException] { // shadow-name collision
      registry("rle")(df.withColumn("__rle_id", lit(1)),
        Map("col" -> "v", "order_by" -> Seq("ord"), "partition_by" -> Seq("k")))
    }
  }

  test("value_counts / unique_counts: group counts, explicit first-appearance rank") {
    val df = Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, null.asInstanceOf[String]),
      (5L, "c"), (6L, "b")).toDF("id", "v")
    val vc = registry("value_counts")(df, Map("col" -> "v"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(vc == Map(Some("b") -> 3L, Some("a") -> 1L, Some("c") -> 1L, None -> 1L),
      "nulls count as a group, like polars")
    val uc = registry("unique_counts")(df, Map("col" -> "v", "order_by" -> List("id")))
      .collect().map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(uc == Map(Some("b") -> ((3L, 1L)), Some("a") -> ((1L, 2L)),
      None -> ((1L, 3L)), Some("c") -> ((1L, 4L))),
      "first_seen ordinal follows first appearance along order_by")
    intercept[IllegalArgumentException] {
      registry("unique_counts")(df, Map("col" -> "v"))
    }
  }

  test("sort_by orders the frame; desc flips; bad desc dies with the kwarg name") {
    val df = Seq((2L, "b"), (1L, "a"), (3L, "c")).toDF("id", "v")
    val asc = registry("sort_by")(df, Map("by" -> "id"))
      .collect().map(_.getLong(0)).toSeq
    assert(asc == Seq(1L, 2L, 3L))
    val desc = registry("sort_by")(df, Map("by" -> List("id"), "desc" -> true))
      .collect().map(_.getLong(0)).toSeq
    assert(desc == Seq(3L, 2L, 1L))
    val e = intercept[IllegalArgumentException] {
      registry("sort_by")(df, Map("by" -> "id", "desc" -> 42L))
    }
    assert(e.getMessage.contains("desc"))
  }

  test("runPipeline leaves ZERO new persistent RDDs, dedup builtins included") {
    // the long-lived-session contract (round-10 review #8): the whole run
    // executes inside CacheScope.withPersisted, so the pipeline's own two
    // persists AND fuzzy_dedup's internal pair-generator persists all
    // drop at exit — repeated runPipeline calls accumulate nothing, while
    // caches the session made beforehand survive. No post-scope actions
    // on the result frames here: an action would legitimately re-populate
    // the (still-registered) cache and fog the leak signal.
    import graft.config.ConfigLoader
    import graft.io.FakeIO
    import graft.service.Pipeline
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val keepMe = docs.persist()
    keepMe.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(before.nonEmpty)
    val io = new FakeIO()
    io.frames.put("/src/docs.parquet", docs)
    val yaml =
      """process_name: cachescope
        |src_path: /src/docs.parquet
        |dst_root: /out
        |custom_transformations:
        |  fuzzy_dedup:
        |    id_col: doc_id
        |    text_col: text
        |    shingle_k: 2
        |    num_hashes: 8
        |    bands: 4
        |""".stripMargin
    val res = Pipeline.runPipeline(spark, ConfigLoader.fromYaml(yaml), io)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before,
      s"pipeline must not leak caches; leaked RDD ids: ${after -- before}")
    // the sinks were materialized INSIDE the scope (FakeIO collects)
    assert(io.frames.keys.exists(_.contains("transformed")), "sink written")
    assert(res.guid.nonEmpty)
    keepMe.unpersist(blocking = true)
  }

  test("ewm builtins reject frames that already carry a __ewm_* shadow name") {
    // the builtins stage casts on __ewm_v/__ewm_t and drop them afterwards
    // — a user column by that name would be silently destroyed
    val poisoned = docs.withColumn("__ewm_v", org.apache.spark.sql.functions.lit(1.0))
    val e = intercept[IllegalArgumentException] {
      registry("ewm_mean")(poisoned,
        Map("key_col" -> "lang", "order_by" -> "doc_id",
          "val_col" -> "n_tokens", "alpha" -> 0.5))
    }
    assert(e.getMessage.contains("__ewm_v"))
    val poisonedT = docs.withColumn("__ewm_t", org.apache.spark.sql.functions.lit(1.0))
    val e2 = intercept[IllegalArgumentException] {
      registry("ewm_mean_by")(poisonedT,
        Map("key_col" -> "lang", "time_col" -> "doc_id",
          "val_col" -> "n_tokens", "half_life" -> 1.0))
    }
    assert(e2.getMessage.contains("__ewm_t"))
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

  test("incremental_fuzzy_dedup probes the LSH digest store through the IO seam (FakeIO)") {
    // store holds the band digests of a prior doc; the batch's near-dup of
    // it collides on a band and drops, the in-batch near-dup pair keeps
    // its min id, the fresh singleton survives untouched
    val io = new graft.io.FakeIO()
    val prior = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    io.frames.put("/state/lsh_bands.parquet",
      graft.operators.Dedup.lshBuckets(prior, "doc_id", "text", 3, 8, 4)
        .select($"band", $"digest"))
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // store hit
      (2L, "pack my box with five dozen brown liquor jugs right now"),
      (3L, "pack my box with five dozen brown liquor jugs right here"), // in-batch dup of 2
      (4L, "genuinely new content never seen before")
    ).toDF("doc_id", "text")
    val out = graft.service.BuiltinTransformations.registryWith(io)("incremental_fuzzy_dedup")(
      batch, Map("id_col" -> "doc_id", "text_col" -> "text",
        "seen_path" -> "/state/lsh_bands.parquet"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("incremental_media_dedup probes the fingerprint store through the IO seam (FakeIO)") {
    import graft.operators.{Multimodal, Curation}
    // store = fingerprints of patterns 0..12 (ids 0..12); batch ids 5..29:
    // 5..12 are store-hits, 13..24 survive as pattern exemplars, 25..29
    // repeat patterns 0..4 (store-hits again)
    val storeImgs = Multimodal.synthesizePatternPngs(
      (0L until 13L).toDF("doc_id"), "doc_id")
    val storeFps = Multimodal.imageHashes(storeImgs, "doc_id", "content").toDF()
      .select(col("dhash").as("fp"))
    val io = new graft.io.FakeIO()
    io.frames.put("/state/media_fp.parquet", storeFps)
    val batch = Multimodal.synthesizePatternPngs(
      (5L until 30L).toDF("doc_id"), "doc_id")
      .withColumn("src", lit("crawl"))
    val out = graft.service.BuiltinTransformations.registryWith(io)(
      "incremental_media_dedup")(batch,
      Map("id_col" -> "doc_id", "content_col" -> "content", "media" -> "image",
        "seen_path" -> "/state/media_fp.parquet", "max_hamming" -> 2L))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == (13L to 24L))
    // survivors keep input columns and carry their fingerprint for the
    // next increment's store append
    assert(out.columns.toSet == Set("doc_id", "content", "src", "fp"))
    assert(out.filter(col("fp").isNull).count() == 0)
    // an undecodable payload survives with a NULL fingerprint (mark-not-drop)
    val withJunk = batch.unionByName(
      Seq((99L, "not a png".getBytes, "crawl")).toDF("doc_id", "content", "src"))
    val out2 = graft.service.BuiltinTransformations.registryWith(io)(
      "incremental_media_dedup")(withJunk,
      Map("id_col" -> "doc_id", "content_col" -> "content", "media" -> "image",
        "seen_path" -> "/state/media_fp.parquet", "max_hamming" -> 2L))
    assert(out2.filter(col("doc_id") === 99L).count() == 1)
    assert(out2.filter(col("doc_id") === 99L).head.isNullAt(out2.columns.indexOf("fp")))
    // operator-level: the cross-batch probe equals the in-batch predicate
    // (a store fp at hamming exactly maxHamming+1 does NOT fire)
    val farStore = Seq(0L).toDF("fp") // hamming(0L, 7L) = 3 > 2
    val probe = Curation.novelAgainstHamming(
      Seq((1L, 7L)).toDF("id", "fp"), farStore, "id", "fp", maxHamming = 2)
    assert(probe.count() == 1, "fp at hamming 3 must NOT count as seen at maxHamming 2")
    val nearStore = Seq(3L).toDF("fp") // hamming(3L, 7L) = 1 <= 2
    val probe2 = Curation.novelAgainstHamming(
      Seq((1L, 7L)).toDF("id", "fp"), nearStore, "id", "fp", maxHamming = 2)
    assert(probe2.count() == 0, "fp at hamming 1 must count as seen")
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

  test("pack_sequences tokenizer kwarg: real token counts through the IO-seam artifact") {
    import graft.operators.{Bpe, WordPiece, Curation}
    // whitespace mode needs no artifact and equals the legacy column path
    val ws = graft.service.BuiltinTransformations.registryWith(new graft.io.FakeIO())(
      "pack_sequences")(docs.drop("n_tokens"),
      Map("id_col" -> "doc_id", "partition_col" -> "lang", "budget" -> 16L,
        "tokenizer" -> "whitespace", "text_col" -> "text"))
    val legacy = Curation.packSequences(
      docs.withColumn("n_tokens",
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long")),
      "doc_id", "n_tokens", "lang", 16L)
    assert(ws.collect().map(_.toString).sorted.toSeq ==
      legacy.collect().map(_.toString).sorted.toSeq)
    // wordpiece: train, persist the vocab frame through the seam, pack by
    // greedy longest-match counts — equal to counting with the live model
    val io = new graft.io.FakeIO()
    val wpModel = WordPiece.trainFromCorpus(docs, "text", 4)
    io.frames.put("/tok/wp_vocab.parquet", WordPiece.vocabToFrame(spark, wpModel))
    val wp = graft.service.BuiltinTransformations.registryWith(io)("pack_sequences")(
      docs.drop("n_tokens"),
      Map("id_col" -> "doc_id", "partition_col" -> "lang", "budget" -> 64L,
        "tokenizer" -> "wordpiece", "text_col" -> "text",
        "artifact_path" -> "/tok/wp_vocab.parquet"))
    val wpDirect = Curation.packSequences(
      docs.withColumn("n_tokens", WordPiece.tokenCount(col("text"), wpModel).cast("long")),
      "doc_id", "n_tokens", "lang", 64L)
    assert(wp.collect().map(_.toString).sorted.toSeq ==
      wpDirect.collect().map(_.toString).sorted.toSeq)
    // bpe: merge table through the seam, char level
    val merges = Bpe.trainFromCorpusLocal(docs, "text", 4)
    io.frames.put("/tok/bpe_merges.parquet",
      Bpe.mergesToFrame(spark, merges))
    val bp = graft.service.BuiltinTransformations.registryWith(io)("pack_sequences")(
      docs.drop("n_tokens"),
      Map("id_col" -> "doc_id", "partition_col" -> "lang", "budget" -> 64L,
        "tokenizer" -> "bpe", "text_col" -> "text",
        "artifact_path" -> "/tok/bpe_merges.parquet"))
    val pairs = merges.map(m => (m._1, m._2))
    val bpDirect = Curation.packSequences(
      docs.withColumn("n_tokens", Bpe.tokenCount(col("text"), pairs).cast("long")),
      "doc_id", "n_tokens", "lang", 64L)
    assert(bp.collect().map(_.toString).sorted.toSeq ==
      bpDirect.collect().map(_.toString).sorted.toSeq)
    // unknown tokenizer refused loudly
    intercept[IllegalArgumentException] {
      graft.service.BuiltinTransformations.registryWith(io)("pack_sequences")(
        docs, Map("id_col" -> "doc_id", "partition_col" -> "lang",
          "budget" -> 64L, "tokenizer" -> "tiktoken", "text_col" -> "text"))
    }
  }

  test("chunk_token_ids / pad_truncate / pack_token_ids builtins delegate correctly") {
    val ids = Seq((1L, "g", (1 to 10).toArray), (2L, "g", Array(11, 12)))
      .toDF("doc_id", "grp", "ids")
    val chunks = registry("chunk_token_ids")(ids,
      Map("id_col" -> "doc_id", "ids_col" -> "ids", "max_tokens" -> 4L))
    assert(chunks.filter(col("doc_id") === 1L).count() == 3) // 10 ids / window 4
    val padded = registry("pad_truncate")(ids,
      Map("ids_col" -> "ids", "max_seq_len" -> 6L, "pad_id" -> 0L))
    val p2 = padded.filter(col("doc_id") === 2L)
      .select("input_ids", "attention_mask").head
    assert(p2.getSeq[Int](0) == Seq(11, 12, 0, 0, 0, 0))
    assert(p2.getSeq[Int](1) == Seq(1, 1, 0, 0, 0, 0))
    val packed = registry("pack_token_ids")(ids,
      Map("id_col" -> "doc_id", "ids_col" -> "ids",
        "partition_col" -> "grp", "budget" -> 8L))
    assert(packed.agg(sum(size(col("input_ids")))).head.getLong(0) == 12L,
      "every id lands in exactly one window")
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

  test("incremental_ann_index encodes a batch against a persisted index through the IO seam") {
    import graft.operators.Similarity
    val rng = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(8)(rng.nextGaussian())))
    val store = vecs.filter(_._1 < 30).toDF("vec_id", "v")
    val batch = vecs.filter(_._1 >= 30).toDF("vec_id", "v")
    val cents = Similarity.kmeansFit(store, "vec_id", "v", k = 4, iters = 1)
    val cb = Similarity.pqTrain(store, "vec_id", "v", m = 4, ksub = 4, iters = 1)
    val (centDf, cbDf) = Similarity.indexToFrames(spark, cents, cb)
    val io = new graft.io.FakeIO()
    io.frames.put("/index/centroids.parquet", centDf)
    io.frames.put("/index/codebook.parquet", cbDf)
    val out = graft.service.BuiltinTransformations.registryWith(io)("incremental_ann_index")(
      batch,
      Map("vec_col" -> "v", "centroids_path" -> "/index/centroids.parquet",
        "codebook_path" -> "/index/codebook.parquet"))
    assert(out.columns.toSeq.contains("cell") && out.columns.toSeq.contains("pq_codes"))
    // the builtin's output must be row-identical to encoding directly
    // against the in-memory index (persist -> restore is lossless)
    val direct = Similarity.encodeWithIndex(batch, "v", cents, cb)
    val key = Seq("vec_id", "cell", "pq_codes").map(col)
    assert(out.select(key: _*).except(direct.select(key: _*)).isEmpty &&
      direct.select(key: _*).except(out.select(key: _*)).isEmpty)
    // shadow-name guard: a batch already carrying `cell` must fail loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.encodeWithIndex(batch.withColumn("cell", lit(1)), "v", cents, cb)
    }
    assert(e.getMessage.contains("cell"))
    // restore validation: non-dense codebook codes are rejected
    val holey = cbDf.filter(!(col("sub") === 0 && col("code") === 0))
    val bad = intercept[IllegalArgumentException](Similarity.codebookFromFrame(holey))
    assert(bad.getMessage.contains("dense"))
  }

  test("quality_quantile_gate builtin equals the direct operator call") {
    import graft.operators.Curation
    val scored = docs.withColumn("score", col("doc_id").cast("double"))
    val out = registry("quality_quantile_gate")(scored,
      Map("group_col" -> "lang", "score_col" -> "score", "p" -> 0.5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val direct = Curation.quantileFilterPerGroup(scored, "lang", "score", 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == direct && out.nonEmpty, s"$out vs $direct")
  }

  test("gopher_rules builtin equals the direct operator; filter keeps original schema") {
    import graft.operators.TextAnalysis
    val flagged = registry("gopher_rules")(docs,
      Map("text_col" -> "text", "min_words" -> 5L))
    val direct = TextAnalysis.withGopherSignals(docs, "text",
      TextAnalysis.GopherThresholds(minWords = 5))
    assert(flagged.collect().toSeq == direct.collect().toSeq)
    assert(flagged.columns.contains("gopher_keep"))
    val filtered = registry("gopher_rules")(docs,
      Map("text_col" -> "text", "min_words" -> 5L, "action" -> "filter"))
    assert(filtered.columns.toSeq == docs.columns.toSeq,
      "filter action restores the original schema")
    val keepIds = direct.filter(col("gopher_keep")).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(filtered.select("doc_id").as[Long].collect().sorted.toSeq == keepIds)
    // the shadow guard surfaces through the registry path
    val e = intercept[IllegalArgumentException] {
      registry("gopher_rules")(docs.withColumn("n_words", lit(1)),
        Map("text_col" -> "text"))
    }
    assert(e.getMessage.contains("n_words"), e.getMessage)
  }

  test("bpe_tokenize builtin: count and segments modes match the direct train+apply") {
    import graft.operators.Bpe
    val merges = Bpe.trainFromCorpus(docs, "text", 3).map(m => (m._1, m._2))
    val counted = registry("bpe_tokenize")(docs,
      Map("text_col" -> "text", "num_merges" -> 3L))
    assert(counted.columns.contains("bpe_tokens"))
    val direct = docs.select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    counted.select("doc_id", "bpe_tokens").collect()
      .foreach(r => assert(r.getInt(1) == direct(r.getLong(0))))
    val seg = registry("bpe_tokenize")(docs,
      Map("text_col" -> "text", "num_merges" -> 3L, "mode" -> "segments",
        "out_col" -> "subwords"))
    assert(seg.select(size(col("subwords"))).as[Int].collect().toSeq ==
      counted.select("bpe_tokens").as[Int].collect().toSeq,
      "segments length == count mode")
    val e = intercept[IllegalArgumentException] {
      registry("bpe_tokenize")(docs.withColumn("bpe_tokens", lit(1)),
        Map("text_col" -> "text", "num_merges" -> 1L))
    }
    assert(e.getMessage.contains("bpe_tokens"))
  }

  test("bpe_tokenize level=byte and unigram_tokenize byte_fallback route to the byte paths") {
    import graft.operators.{Bpe, Unigram}
    val byteSeg = registry("bpe_tokenize")(docs,
      Map("text_col" -> "text", "num_merges" -> 4L, "mode" -> "segments",
        "level" -> "byte", "out_col" -> "bsub"))
    val merges = Bpe.trainFromCorpusLocal(docs, "text", 4, byteLevel = true)
      .map(m => (m._1, m._2))
    val direct = docs.select(col("doc_id"), Bpe.segmentBytes(col("text"), merges).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    byteSeg.select("doc_id", "bsub").collect()
      .foreach(r => assert(r.getSeq[String](1) == direct(r.getLong(0))))
    val bad = intercept[IllegalArgumentException] {
      registry("bpe_tokenize")(docs, Map("text_col" -> "text", "level" -> "word"))
    }
    assert(bad.getMessage.contains("level"))
    // unigram byte_fallback: the builtin trains on the input frame, so
    // every corpus char is in-vocab and fallback cannot FIRE here (the
    // OOV firing path is pinned in UnigramSpec with a reloaded vocab);
    // this pins that the flag ROUTES into the byte-fallback apply
    val applied = registry("unigram_tokenize")(docs,
      Map("text_col" -> "text", "mode" -> "segments", "byte_fallback" -> true,
        "vocab_size" -> 32L, "out_col" -> "us"))
    val vocab = Unigram.trainFromCorpusLocal(docs, "text", vocabSize = 32)
    val directU = docs
      .select(col("doc_id"), Unigram.segment(col("text"), vocab, byteFallback = true).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    applied.select("doc_id", "us").collect()
      .foreach(r => assert(r.getSeq[String](1) == directU(r.getLong(0))))
  }

  test("video_near_dup builtin: drop keeps one exemplar per pattern, pairs lists them") {
    import graft.operators.Multimodal
    // 4 videos: ids 0 and 25 share pattern 0 (different jitter + frame
    // count), 1 and 2 are singletons
    val base = Seq(0L, 1L, 2L, 25L).toDF("doc_id")
    val avis = Multimodal.synthesizeMjpegAvis(base, "doc_id")
    val kept = registry("video_near_dup")(avis,
      Map("id_col" -> "doc_id", "content_col" -> "content", "max_hamming" -> 2L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L), s"expected the duplicate 25 dropped: $kept")
    val pairs = registry("video_near_dup")(avis,
      Map("id_col" -> "doc_id", "content_col" -> "content", "max_hamming" -> 2L,
        "action" -> "pairs")).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 0L && pairs.head.getLong(1) == 25L)
    val bad = intercept[IllegalArgumentException] {
      registry("video_near_dup")(avis,
        Map("id_col" -> "doc_id", "content_col" -> "content", "hash" -> "md5"))
    }
    assert(bad.getMessage.contains("hash"))
  }

  test("sq8_encode and training_shard_assign builtins equal their operators") {
    import graft.operators.Similarity
    import graft.sources.TrainingShards
    val emb = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.5, 0.5)))
      .toDF("vec_id", "emb")
    val out = registry("sq8_encode")(emb, Map("vec_col" -> "emb"))
    val ranges = Similarity.sqTrain(emb.withColumn("emb", col("emb").cast("array<double>")), "emb")
    val direct = Similarity.sqEncode(
        emb.withColumn("emb", col("emb").cast("array<double>")), "emb", ranges)
      .select("vec_id", "sq_codes").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    out.select("vec_id", "sq_codes").collect()
      .foreach(r => assert(r.getSeq[Int](1) == direct(r.getLong(0))))
    val sharded = registry("training_shard_assign")(docs,
      Map("id_col" -> "doc_id", "num_shards" -> 2L))
    assert(sharded.columns.takeRight(2).toSeq == Seq("shard", "ord"))
    sharded.select("doc_id", "shard", "ord").collect().foreach { r =>
      val expectShard = docs.select(TrainingShards.shardId(lit(r.getLong(0)), 2)).head().getInt(0)
      assert(r.getInt(1) == expectShard && r.getString(2).length == 32)
    }
  }

  test("dsir_select reads the target through the IO seam; flag/filter/m=0 modes") {
    import graft.operators.Curation
    val io = new graft.io.FakeIO()
    val target = Seq((10L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text")
    io.frames.put("/state/target.parquet", target)
    val raw = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "delta epsilon zeta delta epsilon"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val reg = graft.service.BuiltinTransformations.registryWith(io)
    val base = Map[String, Any]("id_col" -> "doc_id", "text_col" -> "text",
      "target_path" -> "/state/target.parquet")
    // m=0: weights only, equal to the direct operator call
    val w = reg("dsir_select")(raw, base)
    val direct = Curation.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    w.collect().foreach(r =>
      assert(r.getAs[Double]("log_weight") == direct(r.getAs[Long]("doc_id"))))
    // flag keeps all rows with 2 selected; filter keeps the 2 and the input schema
    val flagged = reg("dsir_select")(raw, base + ("m" -> 2L))
    assert(flagged.count() == 3 && flagged.filter($"selected").count() == 2)
    val filtered = reg("dsir_select")(raw, base ++ Map("m" -> 2L, "action" -> "filter"))
    assert(filtered.columns.toSeq == raw.columns.toSeq && filtered.count() == 2)
    assert(filtered.select("doc_id").as[Long].collect().toSet ==
      flagged.filter($"selected").select("doc_id").as[Long].collect().toSet)
  }

  test("remove_dup_spans, density_prune, hard_negatives builtins equal their operators") {
    import graft.operators.{Curation, Dedup, Similarity}
    // span excision: docs 1 and 2 share a 3-token window; doc 1 keeps it
    val cleaned = registry("remove_dup_spans")(docs,
      Map("id_col" -> "doc_id", "text_col" -> "text", "k" -> 3L))
    val direct = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    cleaned.collect().foreach(r => assert(r.getString(3) == direct(r.getLong(0))))
    assert(cleaned.filter(col("doc_id") === 2L).head().getAs[Int]("n_removed") > 0)
    // density_prune / hard_negatives: float input normalized, inline k-means
    // quantizer (k lowest ids seed) == the direct two-step call
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.05f), "a"),
      (3L, Array(0.0f, 1.0f), "b"), (4L, Array(0.1f, 1.0f), "b"))
      .toDF("vec_id", "emb", "label")
    val typed = emb.withColumn("emb", col("emb").cast("array<double>"))
    val cents = Similarity.kmeansFit(typed, "vec_id", "emb", k = 2, iters = 1)
    val dpB = registry("density_prune")(emb,
      Map("id_col" -> "vec_id", "vec_col" -> "emb", "k" -> 1L,
        "n_centroids" -> 2L, "threshold" -> 0.9)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    val dpD = Curation.densityPrune(typed, "vec_id", "emb", 1, cents, 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(dpB == dpD && dpB.size == 4)
    val hnB = registry("hard_negatives")(emb,
      Map("id_col" -> "vec_id", "vec_col" -> "emb", "label_col" -> "label",
        "n_centroids" -> 2L, "n_probe" -> 2L)).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[java.lang.Long]("pos_id"), r.getAs[java.lang.Long]("neg_id"))).toMap
    val hnD = Similarity.hardNegatives(typed, "vec_id", "emb", "label", cents, nProbe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[java.lang.Long]("pos_id"), r.getAs[java.lang.Long]("neg_id"))).toMap
    assert(hnB == hnD && hnB.size == 4)
  }

  test("label_propagate, pagerank_centrality, budget_select builtins equal their operators") {
    import graft.operators.{Curation, Graph, Similarity}
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 1.0), (2L, Array(1.0f, 0.05f), 0.0),
      (3L, Array(0.0f, 1.0f), 0.0), (4L, Array(0.1f, 1.0f), 1.0))
      .toDF("vec_id", "emb", "seed")
    val typed = emb.withColumn("emb", col("emb").cast("array<double>"))
    val cents = Similarity.kmeansFit(typed, "vec_id", "emb", k = 2, iters = 1)
    val edges = Similarity.knnGraph(typed, "vec_id", "emb", k = 1, cents, nProbe = 2)
    val lpB = registry("label_propagate")(emb,
      Map("id_col" -> "vec_id", "vec_col" -> "emb", "seed_col" -> "seed",
        "k" -> 1L, "n_centroids" -> 2L, "n_probe" -> 2L)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    val lpD = Graph.labelPropagate(edges, typed, "vec_id", "seed", iters = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    assert(lpB == lpD && lpB.size == 4, s"$lpB vs $lpD")
    // every builtin output row keeps its input columns (pipeline contract)
    val prB = registry("pagerank_centrality")(emb,
      Map("id_col" -> "vec_id", "vec_col" -> "emb", "k" -> 1L,
        "n_centroids" -> 2L, "n_probe" -> 2L))
    assert(prB.columns.toSeq == emb.columns.toSeq :+ "rank")
    val prD = Graph.pagerankCentrality(edges)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("rank")).toMap
    assert(prB.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Double]("rank")).toMap == prD)
    val docs = Seq((1L, 10L, 0.9), (2L, 5L, 0.9), (3L, 4L, 0.5), (4L, 7L, 0.2))
      .toDF("doc_id", "n_tok", "q")
    val bsB = registry("budget_select")(docs,
      Map("id_col" -> "doc_id", "token_col" -> "n_tok", "quality_col" -> "q",
        "budget" -> 16L)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("start_toks")).toMap
    val bsD = Curation.budgetSelect(docs, "doc_id", "n_tok", "q", 16L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("start_toks")).toMap
    assert(bsB == bsD && bsB == Map(1L -> 0L, 2L -> 10L, 3L -> 15L))
  }

  test("quantile_buckets and domain_cap builtins equal their operators") {
    import graft.operators.Curation
    val df = (1 to 8).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "grp", "s")
    val qbB = registry("quantile_buckets")(df,
      Map("group_col" -> "grp", "score_col" -> "s")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    val qbD = Curation.quantileBucketsPerGroup(df, "grp", "s")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket")).toMap
    assert(qbB == qbD && qbB(1L) == "head" && qbB(8L) == "tail")
    // custom single cut: default labels fall back to b0/b1
    val one = registry("quantile_buckets")(df,
      Map("group_col" -> "grp", "score_col" -> "s", "cuts" -> List(0.5),
        "out_col" -> "half")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("half")).toMap
    assert(one(1L) == "b0" && one(8L) == "b1")
    val dcB = registry("domain_cap")(df,
      Map("id_col" -> "id", "domain_col" -> "grp", "score_col" -> "s",
        "cap" -> 3L, "salt" -> 2L)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("rank_in_domain")).toMap
    val dcD = Curation.domainCap(df, "id", "grp", "s", cap = 3, salt = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("rank_in_domain")).toMap
    assert(dcB == dcD && dcB == Map(8L -> 1, 7L -> 2, 6L -> 3))
  }
}
