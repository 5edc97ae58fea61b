package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WordPiece
import graft.operators.WordPiece.{WordPieceModel, WpMerge}
import graft.sparkext.WordPieceApply

/** WordPiece training and application, pinned against an in-memory
  * reference implementation of the published algorithm (Schuster &
  * Nakajima 2012; the documented trainer rule: merge the pair maximizing
  * `count(pair) / (count(left) · count(right))`; inference is BERT's
  * greedy longest-match-first `WordpieceTokenizer`). */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def syms(w: String): Vector[String] =
    w.toVector.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c
    }

  /** Reference trainer: single-threaded, recomputes ALL counts from
    * scratch every merge, exact BigInt rational comparison. */
  private def refTrain(vocab: Map[String, Long], numMerges: Int): Vector[WpMerge] = {
    var words: Vector[(Vector[String], Long)] =
      vocab.toVector.map { case (w, c) => syms(w) -> c }
    var out = Vector.empty[WpMerge]
    for (_ <- 1 to numMerges if words.exists(_._1.size > 1)) {
      val pc = collection.mutable.Map.empty[(String, String), Long]
      val sc = collection.mutable.Map.empty[String, Long]
      for ((ss, c) <- words) {
        for (s <- ss) sc(s) = sc.getOrElse(s, 0L) + c
        for (i <- 0 until ss.size - 1)
          pc((ss(i), ss(i + 1))) = pc.getOrElse((ss(i), ss(i + 1)), 0L) + c
      }
      // exact rational argmax with (score DESC, l ASC, r ASC) tie-break
      val best = pc.toSeq.reduceLeft { (a, b) =>
        val ((al, ar), ac) = a; val ((bl, br), bc) = b
        val sa = (BigInt(ac), BigInt(sc(al)) * BigInt(sc(ar)))
        val sb = (BigInt(bc), BigInt(sc(bl)) * BigInt(sc(br)))
        val cmp = (sa._1 * sb._2).compare(sb._1 * sa._2)
        if (cmp > 0) a
        else if (cmp < 0) b
        else if (Ordering.Tuple2[String, String].lteq((al, ar), (bl, br))) a
        else b
      }
      val ((l, r), c) = best
      val merged = l + r.stripPrefix("##")
      out :+= WpMerge(l, r, merged, c, sc(l), sc(r))
      words = words.map { case (ss, n) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < ss.size) {
          if (i + 1 < ss.size && ss(i) == l && ss(i + 1) == r) { buf += merged; i += 2 }
          else { buf += ss(i); i += 1 }
        }
        buf.result() -> n
      }
    }
    out
  }

  /** Reference greedy longest-match (BERT WordpieceTokenizer). */
  private def refSegment(word: String, vocab: Set[String], unk: String,
      maxChars: Int = 100): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    if (word.length > maxChars) return Vector(unk)
    var start = 0
    var out = Vector.empty[String]
    while (start < word.length) {
      var end = word.length
      var hit: Option[String] = None
      while (hit.isEmpty && end > start) {
        val cand = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab(cand)) hit = Some(cand) else end -= 1
      }
      hit match {
        case None => return Vector(unk)
        case Some(t) => out :+= t; start = end
      }
    }
    out
  }

  private def vocabDf(m: Map[String, Long]) =
    m.toSeq.toDF("word", "wcount")

  test("trainLocal matches the reference on a hand fixture (likelihood, not frequency)") {
    // "un" appears in many words but u and n are common too; a rare pair
    // of rare symbols must beat a frequent pair of frequent symbols —
    // the defining difference from BPE's raw-count argmax
    val vocab = Map("unable" -> 10L, "unfit" -> 10L, "united" -> 10L,
      "quiz" -> 3L, "quay" -> 2L, "nun" -> 5L, "noon" -> 4L)
    val ref = refTrain(vocab, 6)
    val got = WordPiece.trainLocal(vocabDf(vocab), 6).merges
    assert(got == ref, s"\ngot: $got\nref: $ref")
    // and it genuinely differs from the BPE (raw count) pick at merge 1:
    // sanity that the fixture exercises the likelihood rule
    val pcTop = {
      val pc = collection.mutable.Map.empty[(String, String), Long]
      for ((w, c) <- vocab) { val s = syms(w)
        for (i <- 0 until s.size - 1) pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + c }
      pc.maxBy { case ((l, r), n) => (n, l, r) }._1
    }
    assert((got.head.left, got.head.right) != pcTop,
      "fixture must make likelihood and frequency argmax disagree")
  }

  test("trainLocal matches the reference on real corpus words (16 merges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = refTrain(words, 16)
    val got = WordPiece.trainLocal(
      vocabDf(words).toDF("word", "wcount"), 16).merges
    assert(got == ref)
  }

  test("incremental count maintenance survives overlapping/self-pair words") {
    // self-pairs ("aa" in "aaaa") and chained rewrites are where
    // incremental maintenance diverges from recompute-from-scratch
    val vocab = Map("aaaa" -> 7L, "aaab" -> 3L, "baaa" -> 2L, "abab" -> 5L)
    val ref = refTrain(vocab, 5)
    val got = WordPiece.trainLocal(vocabDf(vocab), 5).merges
    assert(got == ref, s"\ngot: $got\nref: $ref")
  }

  test("apply: greedy longest match, continuation prefix, UNK, maxInputChars") {
    val vocab = Seq("un", "##able", "u", "##n", "##a", "##b", "##l", "##e", "x")
    val words = Seq("unable", "un", "xux", "zzz",
      "u" * 101) // over maxInputChars -> UNK wholesale
    val got = words.toDF("w")
      .select(WordPieceApply(col("w"), vocab, "[UNK]", 100).as("t"))
      .collect().map(_.getSeq[String](0).toVector)
    val refv = words.map(w => refSegment(w, vocab.toSet, "[UNK]"))
    assert(got.toVector == refv.toVector)
    // the defining greedy case: "unable" = [un, ##able], not char-by-char
    assert(got(0) == Vector("un", "##able"))
    // "xux": x in vocab, ##u NOT in vocab -> whole word UNK
    assert(got(2) == Vector("[UNK]"))
  }

  test("greedy longest-match is NOT monotone in vocab size (documented)") {
    // vocab {a,##b,##c,##d,##bcd}: abcd -> [a, ##bcd] (2 tokens);
    // adding "ab" makes greedy take it and strand the tail: 3 tokens
    val base = Seq("a", "##b", "##c", "##d", "##bcd")
    def n(v: Seq[String]) = refSegment("abcd", v.toSet, "[UNK]").size
    assert(n(base) == 2 && n(base :+ "ab") == 3)
  }

  test("segment flattens per-word pieces; tokenCount agrees") {
    val model = WordPiece.trainFromCorpus(
      Seq("aa ab aa ba", "ab aa").toDF("text"), "text", 2)
    val df = Seq("aa ab", "", "ba").toDF("text")
      .select(WordPiece.segment(col("text"), model).as("t"),
        WordPiece.tokenCount(col("text"), model).as("n"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getSeq[String](0).size == r.getInt(1)))
    // every emitted token is in the model vocabulary (or unk)
    val okSet = model.vocab.toSet + model.unk
    rows.foreach(_.getSeq[String](0).foreach(t => assert(okSet(t), t)))
  }

  test("vocabToFrame/vocabFromFrame round-trip is a fixed point") {
    val model = WordPiece.trainFromCorpus(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50), "text", 8)
    val back = WordPiece.vocabFromFrame(WordPiece.vocabToFrame(spark, model))
    assert(back.merges == model.merges)
    assert(back.baseSymbols == model.baseSymbols)
    assert(back.unk == model.unk)
    assert(back.vocab == model.vocab)
  }

  test("wordpiece_tokenize builtin: count and segments modes") {
    val df = Seq((1L, "the cat sat"), (2L, "the mat")).toDF("id", "text")
    val fns = graft.service.BuiltinTransformations.registryWith(new graft.io.SparkIO())
    val out = fns("wordpiece_tokenize")(df,
      Map("text_col" -> "text", "num_merges" -> 4))
    assert(out.columns.contains("wp_tokens"))
    val seg = fns("wordpiece_tokenize")(df,
      Map("text_col" -> "text", "num_merges" -> 4, "mode" -> "segments",
        "out_col" -> "pieces"))
    val n = out.select(sum("wp_tokens")).collect()(0).getLong(0)
    val m = seg.select(sum(size(col("pieces")))).collect()(0).getLong(0)
    assert(n == m && n > 0)
  }

  test("tokenIds: BERT vocab.txt id contract; vocab.txt export round-trips") {
    val model = WordPiece.trainFromCorpus(
      Seq("aa ab aa ba", "ab aa").toDF("text"), "text", 2)
    val idv = WordPiece.idVocab(model)
    assert(idv.head == model.unk && idv.drop(1) == model.vocab,
      "[UNK] at 0, then base sorted, then merges in training order")
    val df = Seq("aa ab", "zz").toDF("text").select(
      WordPiece.segment(col("text"), model).as("segs"),
      WordPiece.tokenIds(col("text"), model).as("ids"))
    for (r <- df.collect()) {
      val segs = r.getSeq[String](0)
      val ids = r.getSeq[Int](1)
      assert(ids == segs.map(s => idv.indexOf(s) max 0),
        s"ids must be idVocab positions (UNK->0): $segs -> $ids")
    }
    // 'zz' is out-of-corpus: z not in base -> whole word UNK -> id 0
    assert(df.collect()(1).getSeq[Int](1) == Seq(0))
    // vocab.txt round-trip: restored apply-only model segments and
    // id-encodes identically (merge provenance lives in vocabToFrame)
    val back = WordPiece.vocabFromTxt(WordPiece.exportVocabTxt(model))
    assert(WordPiece.idVocab(back) == idv)
    val a = Seq("aa ab ba zz").toDF("text")
    val x = a.select(WordPiece.tokenIds(col("text"), model)).collect()(0).getSeq[Int](0)
    val y = a.select(WordPiece.tokenIds(col("text"), back)).collect()(0).getSeq[Int](0)
    assert(x == y)
  }

  test("trainLocal: loud maxVocab cap, minFrequency cutoff") {
    val vocab = Map("aa" -> 5L, "bb" -> 1L)
    intercept[IllegalArgumentException] {
      WordPiece.trainLocal(vocabDf(vocab), 1, maxVocab = 1)
    }
    // minFrequency 2 drops "bb": its pair can never be selected
    val m = WordPiece.trainLocal(vocabDf(vocab), 2, minFrequency = 2L).merges
    assert(m.map(x => (x.left, x.right)) == Vector(("a", "##a")))
  }

  test("non-BMP code points stay whole on both trainer and apply sides (r18 advice)") {
    val emoji = "😀" // 😀 U+1F600, a surrogate pair in UTF-16
    val cjkB = new String(Character.toChars(0x20010)) // CJK ext-B
    // trainer symbols: one symbol per CODE POINT, never lone surrogates
    val syms = WordPiece.wordSymbolsLocal(s"a$emoji$cjkB")
    assert(syms.toSeq == Seq("a", "##" + emoji, "##" + cjkB))
    assert(syms.forall(s => !s.exists(Character.isSurrogate)
      || s.codePoints().toArray.forall(Character.isValidCodePoint)))
    // train on an emoji-bearing corpus: base symbols are whole code points
    val corpus = Seq((1L, s"$emoji$emoji $emoji$emoji ${emoji}x"))
      .toDF("id", "text")
    val model = WordPiece.trainFromCorpus(corpus, "text", 2)
    assert(model.baseSymbols.contains(emoji))
    assert(model.baseSymbols.forall(s =>
      !s.stripPrefix("##").exists(c => Character.isSurrogate(c) &&
        s.stripPrefix("##").length == 1)))
    // apply: greedy match lands on code-point boundaries — the emoji pair
    // merges whole; every emitted token is valid Unicode
    val got = Seq((1L, s"$emoji$emoji")).toDF("id", "text")
      .select(WordPiece.segment(col("text"), model).as("t"))
      .head.getSeq[String](0)
    assert(got.nonEmpty && got.forall { t =>
      val body = t.stripPrefix("##")
      body.codePoints().toArray.forall(Character.isValidCodePoint) &&
        !(body.length == 1 && Character.isSurrogate(body.charAt(0)))
    }, s"tokens must be valid Unicode, got $got")
    assert(got.mkString.replace("##", "") == s"$emoji$emoji")
    // a word whose emoji is NOT coverable maps to UNK wholesale, never to
    // mangled surrogate fragments
    val unkModel = WordPiece.WordPieceModel(Nil, Vector("a", "##a"))
    val u = Seq((1L, s"a$emoji")).toDF("id", "text")
      .select(WordPiece.segment(col("text"), unkModel).as("t"))
      .head.getSeq[String](0)
    assert(u == Seq(WordPiece.DefaultUnk))
    // maxInputChars counts code points: 3 emoji pass a cap of 3
    val capModel = WordPiece.WordPieceModel(Nil,
      Vector(emoji, "##" + emoji))
    val capped = Seq((1L, emoji * 3)).toDF("id", "text")
      .select(WordPiece.segment(col("text"), capModel, maxInputChars = 3).as("t"))
      .head.getSeq[String](0)
    assert(capped == Seq(emoji, "##" + emoji, "##" + emoji))
  }
}
