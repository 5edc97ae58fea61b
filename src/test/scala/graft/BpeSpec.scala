package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe
import graft.sparkext.BpeApply

/** BPE training and application, pinned against an in-memory reference
  * implementation of the published algorithm (Sennrich et al. 2016,
  * algorithm 1 — overlapping position counts, greedy non-overlapping
  * replacement, (count DESC, pair ASC) selection). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference BPE: single-threaded, obviously-correct. */
  private def refTrain(vocab: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      vocab.map { case (w, c) => w.toVector.map(_.toString) -> c }
    var out = Vector.empty[(String, String, Long)]
    for (_ <- 1 to numMerges if words.keys.exists(_.size > 1)) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
      out :+= ((a, b, c))
      words = words.map { case (syms, n) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) { buf += a + b; i += 2 }
          else { buf += syms(i); i += 1 }
        }
        buf.result() -> n
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    out
  }

  private def refApply(syms: Vector[String], merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(syms) { case (s, (a, b)) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < s.size) {
        if (i + 1 < s.size && s(i) == a && s(i + 1) == b) { buf += a + b; i += 2 }
        else { buf += s(i); i += 1 }
      }
      buf.result()
    }

  test("distributed BPE training matches the reference implementation merge-for-merge") {
    // the Sennrich paper's worked vocabulary
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val corpus = vocab.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val expected = refTrain(vocab, 6)
    val got = Bpe.trainFromCorpus(df, "text", 6)
    assert(got == expected, s"\nexpected $expected\ngot      $got")
    // first merge of this vocab is famously (e, s) with count 9
    assert(got.head == (("e", "s", 9L)), s"got ${got.head}")
    // repartitioning changes nothing — counts are exact aggregations
    assert(Bpe.trainFromCorpus(df.repartition(7), "text", 6) == expected)
  }

  test("BpeApply: greedy leftmost non-overlapping replacement, rank order, nulls pass through") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("a", "b", "a", "b")),
      (3L, Seq[String]()),
      (4L, Seq("x"))
    ).toDF("id", "syms")
    val merged = df.select(col("id"), BpeApply(col("syms"), Seq(("a", "a"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(merged(1L) == List("aa", "a"), s"overlap is non-overlapping greedy: ${merged(1L)}")
    assert(merged(2L) == List("a", "b", "a", "b"), "no (a,a) pair present")
    assert(merged(3L) == Nil && merged(4L) == List("x"))
    // rank order matters: (a,b) then (ab,c) fuses abc; reversed cannot
    val s2 = Seq((1L, Seq("a", "b", "c"))).toDF("id", "syms")
    val fused = s2.select(BpeApply(col("syms"), Seq(("a", "b"), ("ab", "c"))).as("m"))
      .head().getSeq[String](0).toList
    assert(fused == List("abc"), s"$fused")
    val notFused = s2.select(BpeApply(col("syms"), Seq(("ab", "c"), ("a", "b"))).as("m"))
      .head().getSeq[String](0).toList
    assert(notFused == List("ab", "c"), s"$notFused")
    // null element never matches, null array stays null
    val withNulls = Seq((1L, Seq("a", null, "a"))).toDF("id", "syms")
    assert(withNulls.select(BpeApply(col("syms"), Seq(("a", "a"))).as("m"))
      .head().getSeq[String](0).toList == List("a", null, "a"))
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS syms")
    assert(nullRow.select(BpeApply(col("syms"), Seq(("a", "a"))).as("m")).head().isNullAt(0))
  }

  test("segment + tokenCount: per-word merge replay matches the reference, empty text is 0") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val df = Seq((1L, "lowest lo"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val got = df.select(col("id"), Bpe.segment(col("text"), merges).as("s"),
        Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList, r.getInt(2)))
    val expect1 = (refApply("lowest".toVector.map(_.toString), merges) ++
      refApply("lo".toVector.map(_.toString), merges)).toList
    assert(got.find(_._1 == 1L).get._2 == expect1, s"${got.toList}")
    assert(got.find(_._1 == 2L).get._3 == 0 && got.find(_._1 == 3L).get._3 == 0)
  }

  test("trainLocal matches the distributed trainer and the reference bit-for-bit") {
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val corpus = vocab.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val expected = refTrain(vocab, 6)
    assert(Bpe.trainFromCorpusLocal(df, "text", 6) == expected)
    assert(Bpe.trainFromCorpusLocal(df, "text", 6) == Bpe.trainFromCorpus(df, "text", 6))
    // overlap quirk: self-pairs count per position but replace non-overlapping
    val aaa = Seq((1L, "aaa aaa aa b")).toDF("id", "text")
    assert(Bpe.trainFromCorpusLocal(aaa, "text", 4) == Bpe.trainFromCorpus(aaa, "text", 4))
    // early stop: local and distributed agree on when pairs run out
    val tiny = Seq((1L, "ab ab cd")).toDF("id", "text")
    assert(Bpe.trainFromCorpusLocal(tiny, "text", 10) == Bpe.trainFromCorpus(tiny, "text", 10))
  }

  test("trainLocal at depth on the documents fixture equals the distributed trainer") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val local = Bpe.trainFromCorpusLocal(docs, "text", 24)
    val dist = Bpe.trainFromCorpus(docs, "text", 24)
    assert(local == dist,
      s"\nlocal ${local.take(5)}...\ndist  ${dist.take(5)}...")
    assert(local.size == 24)
    // selection counts never increase (the q137 invariant, here at depth)
    assert(local.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  test("byte level: pre-tokenization tiles the text losslessly, plan-side symbols == JVM twin") {
    val texts = Seq(
      "Hello world!  It's 42 degrees.",
      "tab\tand\nnewline  trailing ",
      "café naïve über",        // 2-byte UTF-8
      "你好世界",              // CJK, 3-byte UTF-8
      "emoji 😀 pair",               // supplementary plane, 4-byte UTF-8
      "", "   ", "a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // regex match list concatenates back to the exact input (lossless tiling)
    val tiled = df.select(col("id"),
      concat_ws("", Bpe.bytePretokens(col("text"))).as("back"), col("text"))
    assert(tiled.filter(col("back") =!= col("text")).count() == 0)
    // plan-side byteSymbols == the driver-side twin, byte count == octet count
    val rows = df
      .select(col("id"), col("text"),
        flatten(transform(Bpe.bytePretokens(col("text")),
          t => Bpe.byteSymbols(t))).as("syms"))
      .collect()
    for (r <- rows) {
      val txt = r.getString(1)
      val got = r.getSeq[String](2)
      val want = txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => Bpe.byteToUnicode(b & 0xFF)).toSeq
      assert(got == want, s"byte symbols differ for '$txt'")
    }
    // the (?!\S) lookahead branch: a multi-space run before a word
    // yields (run minus last space) + (space-prefixed word) — the GPT-2
    // attachment rule the q174 oracle sidesteps by normalizing spaces
    val multi = Seq((1L, "a   b c")).toDF("id", "text")
      .select(Bpe.bytePretokens(col("text")).as("p")).head.getSeq[String](0)
    assert(multi == Seq("a", "  ", " b", " c"), multi.mkString("[", "|", "]"))
    // bytes_to_unicode is the published mapping: a bijection over 256
    // bytes, printables to themselves, others to U+0100.. in byte order
    assert(Bpe.byteToUnicode.distinct.length == 256)
    assert(Bpe.byteToUnicode('A'.toInt) == "A" && Bpe.byteToUnicode(' '.toInt) == "Ġ" &&
      Bpe.byteToUnicode('\n'.toInt) == "Ċ" && Bpe.byteToUnicode(0) == "Ā")
  }

  test("byte level: local == distributed trainer; whitespace-free ASCII parity with char level") {
    val docs = Seq("tokenizer", "tokens", "tokenize", "token", "izer", "low", "lower")
    val df = docs.flatMap(w => Seq.fill(3)(w)).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val local = Bpe.trainFromCorpusLocal(df, "text", 8, byteLevel = true)
    val dist = Bpe.trainFromCorpus(df, "text", 8, byteLevel = true)
    assert(local == dist, s"\nlocal $local\ndist  $dist")
    // single-word printable-ASCII docs: the GPT-2 regex yields the word
    // itself, bytes == chars, byte symbols == char symbols — the byte
    // trainer must agree with the word-level trainer merge-for-merge
    val charSide = Bpe.trainFromCorpusLocal(df, "text", 8)
    assert(local == charSide, s"\nbyte $local\nchar $charSide")
    // and with real spaces they DIVERGE by design (leading-space tokens)
    val spaced = Seq((1L, "the cat the cat the"), (2L, "the cat")).toDF("id", "text")
    val byteM = Bpe.trainFromCorpusLocal(spaced, "text", 6, byteLevel = true)
    assert(byteM.exists(m => m._1.startsWith("Ġ") || m._2.startsWith("Ġ")),
      s"expected a space-prefixed merge in $byteM")
  }

  test("byte level: segmentBytes round-trips any text byte-for-byte (inherent byte fallback)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val merges = Bpe.trainFromCorpusLocal(docs, "text", 16, byteLevel = true)
      .map(m => (m._1, m._2))
    val tricky = Seq((9001L, "café 😀 你好, it's 3.14!"),
      (9002L, ""), (9003L, "  leading and trailing  ")).toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"), col("text")).unionByName(tricky)
      .select(col("text"), Bpe.segmentBytes(col("text"), merges).as("toks"))
      .collect()
    for (r <- rows) {
      val txt = r.getString(0)
      val back = Bpe.decodeBytesLocal(r.getSeq[String](1))
      assert(back == txt, s"round-trip failed for '${txt.take(60)}'")
    }
    // token count == segment size, and merged tables shrink counts
    val c0 = docs.select(sum(size(Bpe.segmentBytes(col("text"), Nil)))).head.getLong(0)
    val c1 = docs.select(sum(Bpe.tokenCountBytes(col("text"), merges))).head.getLong(0)
    assert(c1 < c0, s"merges must shrink the byte-token count ($c1 !< $c0)")
  }

  test("byte level: special tokens are atomic (tiktoken contract), round trip stays lossless") {
    val specials = Seq("<|endoftext|>", "<|pad|>")
    val corpus = Seq((1L, "hello world hello world hello")).toDF("id", "text")
    val merges = Bpe.trainFromCorpusLocal(corpus, "text", 6, byteLevel = true)
      .map(m => (m._1, m._2))
    val df = Seq(
      (1L, "hello<|endoftext|>world"),
      (2L, "<|endoftext|>leading and trailing<|pad|>"),
      (3L, "<|endoftext|><|pad|>adjacent"),
      (4L, "no specials here"),
      (5L, "incomplete <|endoftext| stays plain")
    ).toDF("id", "text")
    val out = df.select(col("id"), col("text"),
      Bpe.segmentBytes(col("text"), merges, specials).as("toks")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2))).toMap
    // specials appear as single tokens, never merged across
    assert(out(1L)._2.count(_ == "<|endoftext|>") == 1)
    assert(out(2L)._2.head == "<|endoftext|>" && out(2L)._2.last == "<|pad|>")
    assert(out(3L)._2.take(2) == Seq("<|endoftext|>", "<|pad|>"))
    assert(!out(4L)._2.exists(specials.contains), "no phantom specials")
    assert(!out(5L)._2.exists(specials.contains), "partial marker must stay plain text")
    // surrounding text tokenizes exactly as it would alone, and the
    // byte-decode round trip still reconstructs every input
    for ((_, (txt, toks)) <- out) {
      assert(Bpe.decodeBytesLocal(toks) == txt, s"round trip failed for '$txt'")
      assert(!toks.exists(t => !specials.contains(t) && specials.exists(s => t.contains(s))),
        s"a merge crossed a special boundary in $toks")
    }
    // plain segmentation of the text around a special == segmenting the
    // parts independently
    val around = df.filter(col("id") === 1L)
      .select(Bpe.segmentBytes(col("text"), merges, specials).as("t")).head.getSeq[String](0)
    val partA = Seq((1L, "hello")).toDF("id", "text")
      .select(Bpe.segmentBytes(col("text"), merges).as("t")).head.getSeq[String](0)
    val partB = Seq((1L, "world")).toDF("id", "text")
      .select(Bpe.segmentBytes(col("text"), merges).as("t")).head.getSeq[String](0)
    assert(around == partA ++ Seq("<|endoftext|>") ++ partB)
    // non-ASCII specials are refused loudly
    val bad = intercept[IllegalArgumentException] {
      df.select(Bpe.segmentBytes(col("text"), merges, Seq("Ġbad")))
    }
    assert(bad.getMessage.contains("printable ASCII"))
    // cross-token border overlap is refused too (r18 advice): with
    // specials {"ab","ba"}, input "aba" would be dissected by the
    // independent boundary splits and silently tokenize as plain bytes
    val border = intercept[IllegalArgumentException] {
      df.select(Bpe.segmentBytes(col("text"), merges, Seq("ab", "ba")))
    }
    assert(border.getMessage.contains("border"))
    // standard delimited-marker sets still pass all three overlap checks
    df.select(Bpe.segmentBytes(col("text"), merges,
      Seq("<|endoftext|>", "<|pad|>", "<|im_start|>"))).collect()
  }

  test("trainLocal guards: loud maxVocab cap, minFrequency cutoff changes low ranks only") {
    val df = Seq((1L, "low lower newest widest")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainFromCorpusLocal(df, "text", 2, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
    // minFrequency=2 empties this all-unique vocab: no pairs -> empty table
    assert(Bpe.trainFromCorpusLocal(df, "text", 2, minFrequency = 2L).isEmpty)
  }

  test("training stops early when every word is a single symbol") {
    val df = Seq((1L, "ab ab cd")).toDF("id", "text")
    // only 2 distinct pairs exist; asking for 10 merges returns <= 4
    val merges = Bpe.trainFromCorpus(df, "text", 10)
    assert(merges.size <= 4 && merges.nonEmpty, s"$merges")
    assert(merges.head == (("a", "b", 2L)), s"(a,b) count 2 beats (c,d) count 1: $merges")
  }

  test("merge table persists through the IO seam and segments identically (FakeIO)") {
    val df = Seq((1L, "low lower lowest"), (2L, "newest widest")).toDF("id", "text")
    val merges = Bpe.trainFromCorpus(df, "text", 6)
    // round-trip through a GraftIO sink+source, the way a real deployment
    // persists a tokenizer next to its corpus
    val io = new graft.io.FakeIO()
    io.write(Bpe.mergesToFrame(spark, merges), "store/bpe_merges", "parquet")
    val reloaded = Bpe.mergesFromFrame(io.read(spark, "store/bpe_merges", "parquet"))
    assert(reloaded == merges, s"\n$merges\n$reloaded")
    // rank column, not row order, is the contract: a shuffled frame
    // restores the same table
    val shuffled = Bpe.mergesFromFrame(
      Bpe.mergesToFrame(spark, merges).orderBy(col("left").desc).repartition(5))
    assert(shuffled == merges)
    val segA = df.select(Bpe.segment(col("text"), merges.map(m => (m._1, m._2))).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    val segB = df.select(Bpe.segment(col("text"), reloaded.map(m => (m._1, m._2))).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(segA == segB)
    // a partial table (missing rank) fails loudly, never mis-segments
    val partial = Bpe.mergesToFrame(spark, merges).filter(col("rank") =!= 2)
    val e = intercept[IllegalArgumentException] { Bpe.mergesFromFrame(partial) }
    assert(e.getMessage.contains("dense"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Bpe.mergesFromFrame(Bpe.mergesToFrame(spark, merges), maxMerges = 2)
    }
    assert(e2.getMessage.contains("exceeds"), e2.getMessage)
  }

  test("byte ids: GPT-2 scheme (byte value 0-255, merges 256+rank, specials after)") {
    val df = Seq((1L, "aa ab aa"), (2L, "ba ab<|eot|>aa")).toDF("id", "text")
    val merges = Bpe.trainFromCorpusLocal(df, "text", 2, byteLevel = true)
      .map(m => (m._1, m._2))
    val specials = Seq("<|eot|>")
    val idv = Bpe.byteIdVocab(merges, specials)
    assert(idv.size == 256 + merges.size + 1)
    // base symbol ids ARE byte values: 'a' = 97, ' ' maps through
    // bytes_to_unicode but keeps id 32 (the encoder.json construction)
    assert(idv(97) == "a" && idv(32) == Bpe.byteSymbolsLocal(" ").head)
    val out = df.select(
      Bpe.segmentBytes(col("text"), merges, specials).as("segs"),
      Bpe.tokenIdsBytes(col("text"), merges, specials).as("ids"))
      .collect()
    for (r <- out) {
      val segs = r.getSeq[String](0); val ids = r.getSeq[Int](1)
      assert(ids == segs.map(idv.indexOf), s"$segs -> $ids")
      assert(ids.forall(_ >= 0), "byte-level encoding is total; -1 unreachable")
    }
    // the special token got the LAST id (tiktoken appends specials)
    assert(out(1).getSeq[Int](1).contains(256 + merges.size))
    // merges.txt round trip: same table, same segmentation
    val back = Bpe.mergesFromTxt(Bpe.exportMergesTxt(merges))
    assert(back == merges)
    val e = intercept[IllegalArgumentException](Bpe.mergesFromTxt("#v\nbroken_line\n"))
    assert(e.getMessage.contains("malformed"))
  }
}
