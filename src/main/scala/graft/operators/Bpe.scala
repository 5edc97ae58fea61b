package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sparkext.BpeApply

/** Distributed BPE (byte-pair-encoding) tokenizer training and
  * application — the tokenizer-fitting step of a pretraining data
  * pipeline (Sennrich, Haddow, Birch 2016, algorithm 1; the GPT-2 /
  * sentencepiece training core).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - The corpus is scanned ONCE, into a word-frequency VOCAB
  *    (`groupBy(word)` — the standard trick every BPE trainer uses:
  *    training cost depends on |vocab|, not corpus size).
  *  - Each merge iteration is ONE aggregation over the vocab (adjacent
  *    symbol pairs weighted by word count; shuffle = distinct pair
  *    count, map-side combined) plus a 1-ROW `limit(1).collect()` —
  *    the driver never holds more than the argmax pair.
  *  - The learned table applies as a PURE PROJECTION
  *    ([[graft.sparkext.BpeApply]] — merge table as one reference
  *    object, no literal-AST cliff at production table sizes).
  *
  * Determinism: pair selection orders by (count DESC, left ASC,
  * right ASC) — ties cannot flip between runs, partitionings, or
  * engines. Pair counts are POSITION counts (overlapping occurrences
  * of a self-pair all count: "aaa" -> (a,a) twice), matching the
  * published reference implementation's `get_stats`; replacement is
  * greedy left-to-right non-overlapping, so a merge may apply fewer
  * times than its recorded count (the classic overlap quirk — q137
  * pins `after >= before - sum(counts)` rather than equality).
  *
  * Character splitting is per UTF-16 code unit (Spark `split("")`),
  * which equals per-code-point for BMP text; supplementary-plane
  * symbols (emoji) would split into surrogate halves — acceptable for
  * the byte/char-level variants this models, noted for parity with the
  * oracle's code-point `substr`.
  *
  * Round 17 adds the BYTE-LEVEL mode (the production GPT-2 / tiktoken
  * shape): [[Gpt2Pattern]] regex pre-tokenization with leading-space
  * attachment, a 256-symbol byte base alphabet via GPT-2's
  * `bytes_to_unicode` so nothing is ever out-of-vocabulary, and the
  * SAME trainers/appliers over those symbols (`byteLevel = true`) —
  * surrogate halves cannot occur (bytes, not UTF-16 units), closing
  * the char-mode caveat above for byte-mode users.
  */
object Bpe {

  /** Character symbols of a token (empty strings dropped). */
  def charSymbols(tok: Column): Column =
    filter(split(tok, ""), s => length(s) > 0)

  // ---- byte-level (GPT-2 / tiktoken shape) ------------------------------

  /** GPT-2's pre-tokenization regex (Radford et al. 2019; the published
    * openai/gpt-2 `encoder.py` pattern, tiktoken's r50k/p50k base):
    * contractions, space-prefixed letter runs, space-prefixed digit
    * runs, space-prefixed punctuation runs, then whitespace — the
    * leading-space attachment is what makes " the" one token. Java
    * regex: `\p{L}`/`\p{N}` are Unicode classes by default, the
    * `(?!\S)` lookahead is supported as written, and the `(?U)` prefix
    * (UNICODE_CHARACTER_CLASS) lifts `\s`/`\S` from Java's ASCII-only
    * default to the Unicode White_Space property — the published
    * pattern runs under Python `regex` where `\s` is Unicode, so
    * without the flag NBSP/U+2028-style whitespace would mis-route
    * into the punctuation branch (round 17 advice; byte parity with
    * real GPT-2/tiktoken on such inputs needs the flag). */
  val Gpt2Pattern: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** GPT-2's `bytes_to_unicode`: the 188 printable single-byte chars
    * (33–126, 161–172, 174–255) map to themselves; the other 68 bytes
    * map to U+0100.. in increasing byte order. Every byte becomes a
    * VISIBLE unicode char, so the BPE symbol machinery ([[BpeApply]],
    * the merge-table relations, the DuckDB oracle) runs unchanged on
    * byte-level symbols — and no input can ever be out-of-alphabet
    * (byte fallback is inherent: the 256-symbol base covers anything
    * UTF-8 can encode). */
  private[graft] val byteToUnicode: Array[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (printable(b)) b.toChar.toString
      else { val s = (256 + n).toChar.toString; n += 1; s }
    }.toArray
  }

  /** Inverse of [[byteToUnicode]] — decode a byte-level symbol string
    * back to raw bytes (the GPT-2 decoder side; pinned lossless by the
    * round-trip spec). */
  private[graft] lazy val unicodeToByte: Map[Char, Byte] =
    byteToUnicode.zipWithIndex.map { case (s, b) => (s.charAt(0), b.toByte) }.toMap

  /** The 256 latin-1 chars in byte order — `decode(bytes, 'ISO-8859-1')`
    * maps bytes to exactly these chars 1:1, which turns the whole
    * bytes→symbols mapping into ONE `translate`. */
  private lazy val latin1Alphabet: String =
    (0 until 256).map(_.toChar).mkString

  private lazy val symbolAlphabet: String = byteToUnicode.mkString

  /** Pre-tokens of a document under [[Gpt2Pattern]] (codegen'd
    * `regexp_extract_all` — the pattern tiles the string, so the match
    * list IS the lossless partition of the text). */
  def bytePretokens(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2Pattern), lit(0))

  /** Byte-level symbols of ONE pre-token: UTF-8 bytes through
    * [[byteToUnicode]]. `decode(encode(tok,'UTF-8'), 'ISO-8859-1')`
    * reinterprets each byte as its latin-1 char (a 1:1 view of the
    * bytes), ONE `translate` maps all 256 chars to their byte symbols
    * (dictionary lookup per char — the round-17 fix for the first cut's
    * per-byte linear scan over a 256-entry map literal, which made q174
    * the heaviest new bench row), and a char split yields the symbol
    * array. All codegen'd builtins, no UDF. */
  def byteSymbols(tok: Column): Column =
    filter(
      split(translate(
        decode(encode(tok, "UTF-8"), "ISO-8859-1"),
        latin1Alphabet, symbolAlphabet), ""),
      s => length(s) > 0)

  /** JVM-side twin of [[byteSymbols]] — the driver-side split
    * [[trainLocal]] uses in byte mode (must agree exactly with the
    * plan-side form; pinned by BpeSpec). */
  private[graft] def byteSymbolsLocal(w: String): Array[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(b => byteToUnicode(b & 0xFF))

  /** Decode a segmented byte-level token sequence back to text —
    * concatenate symbols, map chars back to bytes, UTF-8 decode. Total
    * on any trained table's output (merged symbols are concatenations
    * of base symbols). */
  private[graft] def decodeBytesLocal(syms: Seq[String]): String = {
    val bytes = syms.flatMap(_.iterator.map(unicodeToByte)).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Pre-token frequency vocab for byte-level training — the byte-mode
    * twin of [[wordVocab]] (same ONE corpus-sized pass; the vocab keys
    * keep their leading spaces, exactly the GPT-2 vocab shape). */
  def bytePretokenVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(bytePretokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wcount"))

  /** Word-frequency vocab of a corpus: one row per distinct whitespace
    * token with its occurrence count — the ONE corpus-sized pass of BPE
    * training. */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wcount"))

  /** Adjacent-pair counts of the vocab under the current merge table:
    * one aggregation, vocab-bounded. */
  private[operators] def pairCounts(
      vocab: DataFrame, merges: Seq[(String, String)],
      byteLevel: Boolean = false): DataFrame = {
    val base = if (byteLevel) byteSymbols(col("word")) else charSymbols(col("word"))
    val syms = BpeApply(base, merges)
    vocab
      .select(col("wcount"), syms.as("s"))
      .select(col("wcount"), explode(arrays_zip(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1))).as("p"))
      .select(col("p.0").as("l"), col("p.1").as("r"), col("wcount"))
      .groupBy(col("l"), col("r"))
      .agg(sum(col("wcount")).as("c"))
  }

  /** Learn `numMerges` merges from a word-frequency vocab. Returns the
    * table in rank order with each pair's count AT SELECTION TIME.
    * Stops early when no adjacent pair remains (every word fused to a
    * single symbol). The caller should persist `vocab` — every
    * iteration re-derives symbols from characters through the
    * merges-so-far (stateless replay: no mutable distributed state, at
    * the cost of one [[graft.sparkext.BpeApply]] pass per iteration —
    * the table is rank-prefix-consistent, so replay is exact). */
  def train(vocab: DataFrame, numMerges: Int,
      byteLevel: Boolean = false): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var merges = Vector.empty[(String, String, Long)]
    var t = 0
    var done = false
    while (t < numMerges && !done) {
      // DRIVER-BOUNDED collect: limit(1) — exactly the argmax pair
      val top = pairCounts(vocab, merges.map(m => (m._1, m._2)), byteLevel)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else merges :+= ((top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
      t += 1
    }
    merges
  }

  /** One-call convenience: vocab build (persisted for the iteration
    * loop, released on exit) + [[train]]. `byteLevel` switches both the
    * vocab (regex pre-tokens) and the symbol base (bytes). */
  def trainFromCorpus(df: DataFrame, textCol: String, numMerges: Int,
      byteLevel: Boolean = false): Seq[(String, String, Long)] =
    graft.util.CacheScope.withPersisted(df.sparkSession) {
      val vocab =
        (if (byteLevel) bytePretokenVocab(df, textCol) else wordVocab(df, textCol)).persist()
      try train(vocab, numMerges, byteLevel)
      finally vocab.unpersist(blocking = false)
    }

  /** Production-shape trainer: collect the word-frequency vocab ONCE
    * (driver-bounded, loud cap) and run the merge loop driver-side with
    * incremental pair-count maintenance — the shape every real tokenizer
    * trainer uses (HF tokenizers, sentencepiece, subword-nmt's
    * `learn_bpe` with pair index).
    *
    * WHY: [[train]] is one Spark job per merge. At spec-scale merge
    * counts (8–64) that is fine and fully distributed; at PRODUCTION
    * counts (GPT-2: 50k merges) it is 50k driver-sequential jobs — the
    * same parameter-size cliff class as the pre-round-14
    * literal-centroid quantizer. BPE training cost depends on |vocab|,
    * not corpus size, so after the one corpus-sized `groupBy(word)`
    * pass the remaining work FITS the driver by construction: the vocab
    * cap is explicit and loud, and the production knob (`minFrequency`,
    * the standard trainer cutoff) bounds it further without touching
    * the corpus scan.
    *
    * Exactness: at `minFrequency = 1` and an uncapped vocab this is
    * BIT-IDENTICAL to [[train]] — same position-count semantics
    * (overlapping self-pairs all count), same (count DESC, left ASC,
    * right ASC) argmax, same greedy leftmost non-overlapping
    * replacement, same early stop — pinned by BpeSpec on fixtures
    * including the "aaa" overlap quirk. Per-merge work touches only
    * words that CONTAIN the merged pair (pair→words index); the argmax
    * is a lazy-invalidation heap (stale entries discarded on pop), so
    * total cost is O(updates · log updates), not O(merges · |pairs|). */
  def trainLocal(
      vocab: DataFrame,
      numMerges: Int,
      maxVocab: Int = 1 << 22,
      minFrequency: Long = 1L,
      byteLevel: Boolean = false
  ): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minFrequency >= 1L, s"minFrequency must be >= 1, got $minFrequency")
    // DRIVER-BOUNDED collect: limit(maxVocab + 1) makes an over-cap vocab a
    // loud failure (house rule), never a silent driver OOM
    val rows = vocab.filter(col("wcount") >= minFrequency)
      .select(col("word").cast("string"), col("wcount").cast("long"))
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"trainLocal vocab exceeds maxVocab=$maxVocab distinct words — raise maxVocab " +
        "deliberately or raise minFrequency (the standard trainer cutoff)")
    val words = rows.map(r =>
      if (byteLevel) byteSymbolsLocal(r.getString(0))
      else r.getString(0).split("").filter(_.nonEmpty))
    val freqs = rows.map(_.getLong(1))

    import scala.collection.mutable
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // heap of (count, l, r) snapshots: count DESC, then l ASC, r ASC —
    // the [[train]] tie-break exactly
    val ord = Ordering.by[(Long, String, String), Long](_._1).orElse(
      Ordering.by[(Long, String, String), String](_._2).reverse).orElse(
      Ordering.by[(Long, String, String), String](_._3).reverse)
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val c = pairCount.getOrElse(p, 0L) + delta
      if (c <= 0L) { pairCount.remove(p); () }
      else {
        pairCount(p) = c
        if (delta > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        heap.enqueue((c, p._1, p._2)) // lazy invalidation: stale entries skipped on pop
      }
    }

    var wi = 0
    while (wi < words.length) {
      val w = words(wi); var i = 0
      while (i < w.length - 1) { bump((w(i), w(i + 1)), freqs(wi), wi); i += 1 }
      wi += 1
    }

    var merges = Vector.empty[(String, String, Long)]
    var t = 0
    var done = false
    while (t < numMerges && !done) {
      // pop to the first non-stale entry (its count matches the live map)
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCount.get((e._2, e._3)).contains(e._1)) top = Some(e)
      }
      top match {
        case None => done = true
        case Some((c, l, r)) =>
          merges :+= ((l, r, c))
          val members = pairWords.remove((l, r)).getOrElse(mutable.Set.empty)
          for (mi <- members) {
            val old = words(mi)
            // the index can hold stale members (pair destroyed by a later
            // merge in this word) — verify adjacency before rewriting
            var has = false; var i = 0
            while (!has && i < old.length - 1) {
              if (old(i) == l && old(i + 1) == r) has = true; i += 1
            }
            if (has) {
              i = 0
              while (i < old.length - 1) { bump((old(i), old(i + 1)), -freqs(mi), mi); i += 1 }
              // greedy leftmost non-overlapping replacement — BpeMergeTable.apply
              val nw = mutable.ArrayBuffer.empty[String]
              i = 0
              while (i < old.length) {
                if (i + 1 < old.length && old(i) == l && old(i + 1) == r) {
                  nw += (l + r); i += 2
                } else { nw += old(i); i += 1 }
              }
              val arr = nw.toArray
              words(mi) = arr
              i = 0
              while (i < arr.length - 1) { bump((arr(i), arr(i + 1)), freqs(mi), mi); i += 1 }
            }
          }
      }
      t += 1
    }
    merges
  }

  /** One-call production-shape convenience: one corpus scan to the vocab,
    * then [[trainLocal]]. */
  def trainFromCorpusLocal(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 1 << 22,
      minFrequency: Long = 1L,
      byteLevel: Boolean = false
  ): Seq[(String, String, Long)] =
    trainLocal(
      if (byteLevel) bytePretokenVocab(df, textCol) else wordVocab(df, textCol),
      numMerges, maxVocab, minFrequency, byteLevel)

  /** Tokenize text under a learned table: whitespace pre-tokenization,
    * per-word character split, merge replay — flattened to one
    * `array<string>` of subword units per document. Pure projection
    * (no shuffle; the table rides the plan as one reference object). */
  def segment(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(TextAnalysis.tokens(text), t =>
      BpeApply(charSymbols(t), merges)))

  /** Byte-level tokenize (the GPT-2 inference path): [[Gpt2Pattern]]
    * pre-tokens, [[byteSymbols]] byte alphabet, merge replay. LOSSLESS —
    * concatenating the output symbols and inverting [[byteToUnicode]]
    * reconstructs the input text byte-for-byte (round-trip spec), so no
    * text is ever out-of-vocabulary. Pure projection like [[segment]].
    *
    * `specialTokens` (the tiktoken contract): reserved markers like
    * `<|endoftext|>` are ATOMIC — emitted as single tokens wherever they
    * occur, never pre-tokenized, byte-split, or merged across. The text
    * splits at every special-token boundary via zero-width lookarounds
    * (Java regex; the literals are quoted), so surrounding text
    * tokenizes exactly as it would alone. Specials are printable-ASCII
    * by convention, which keeps the byte-decode round trip lossless for
    * free (printable ASCII symbols are their own bytes). */
  def segmentBytes(text: Column, merges: Seq[(String, String)],
      specialTokens: Seq[String] = Nil): Column = {
    val plain = (t: Column) => flatten(transform(bytePretokens(t), tok =>
      BpeApply(byteSymbols(tok), merges)))
    if (specialTokens.isEmpty) plain(text)
    else {
      require(specialTokens.forall(s => s.nonEmpty && s.forall(c => c >= 0x21 && c <= 0x7e)),
        "special tokens must be non-empty printable ASCII (no whitespace) — " +
          "the tiktoken convention, and what keeps byte decode lossless")
      // the zero-width-lookaround split cuts at EVERY occurrence boundary
      // independently, so a special that overlaps another (substring, or a
      // self-overlap like "aa" inside "aaa") would be dissected into
      // segments that equal NO special and silently tokenize as plain
      // bytes; tiktoken resolves such input leftmost-longest. Refuse the
      // ambiguous vocabulary loudly instead (round 17 advice) — real
      // special sets (<|endoftext|>-style delimited markers) never overlap.
      for (s <- specialTokens; t <- specialTokens if s != t)
        require(!t.contains(s),
          s"special token '$s' is a substring of '$t' — overlapping specials " +
            "would be dissected by the boundary split; use delimited markers")
      for (s <- specialTokens; p <- 1 until s.length)
        require(s.substring(0, p) != s.substring(s.length - p),
          s"special token '$s' self-overlaps (border of length $p) — adjacent " +
            "occurrences would be dissected by the boundary split")
      // cross-token borders too: a suffix of one special equal to a prefix
      // of another (e.g. {"ab","ba"} on "aba") is dissected the same way
      for (s <- specialTokens; t <- specialTokens if s != t;
           p <- 1 until math.min(s.length, t.length))
        require(s.substring(s.length - p) != t.substring(0, p),
          s"special tokens '$s' and '$t' share a border of length $p — " +
            "adjacent occurrences would be dissected by the boundary split")
      val alts = specialTokens.map(java.util.regex.Pattern.quote).mkString("|")
      val segs = split(text, s"(?=(?:$alts))|(?<=(?:$alts))")
      flatten(transform(segs, seg =>
        when(seg.isin(specialTokens: _*), array(seg)).otherwise(plain(seg))))
    }
  }

  /** Subword count under a learned table — the REAL token budget the
    * `subword_count_approx` heuristic stands in for when no tokenizer
    * is available. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(segment(text, merges))

  /** Byte-level subword count (tokens of [[segmentBytes]]). */
  def tokenCountBytes(text: Column, merges: Seq[(String, String)],
      specialTokens: Seq[String] = Nil): Column =
    size(segmentBytes(text, merges, specialTokens))

  /** GPT-2's id assignment (the published `encoder.json` construction):
    * the 256 base byte symbols at ids 0–255 — [[byteToUnicode]] order,
    * so a base symbol's id IS its byte value — then merged tokens at
    * 256 + rank, then special tokens (tiktoken appends them after the
    * ordinary vocabulary: r50k's `<|endoftext|>` = 50256). */
  def byteIdVocab(merges: Seq[(String, String)],
      specialTokens: Seq[String] = Nil): Seq[String] =
    byteToUnicode.toSeq ++ merges.map { case (l, r) => l + r } ++ specialTokens

  /** Byte-level tokenize to INTEGER ids (round 18 — the deployment
    * tensor shape). Total by construction twice over: the 256-byte base
    * covers any input, and the id table maps every producible symbol
    * (missingId −1 is unreachable; it would mean a [[segmentBytes]]
    * output outside its own alphabet — spec-pinned). */
  def tokenIdsBytes(text: Column, merges: Seq[(String, String)],
      specialTokens: Seq[String] = Nil): Column =
    graft.sparkext.VocabIdLookup(
      segmentBytes(text, merges, specialTokens),
      byteIdVocab(merges, specialTokens), missingId = -1)

  /** The merge table as a GPT-2-style `merges.txt` (`#version` header,
    * one `left right` pair per line IN RANK ORDER — rank is the
    * application order, the contract [[mergesToFrame]] documents).
    * Write through any [[graft.io.GraftIO]] `writeText`;
    * [[mergesFromTxt]] inverts. */
  def exportMergesTxt(merges: Seq[(String, String)]): String =
    "#version: 0.2\n" + merges.map { case (l, r) => s"$l $r" }.mkString("\n") + "\n"

  def mergesFromTxt(txt: String): Seq[(String, String)] =
    txt.split("\n").iterator
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merges.txt line '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }
      .toVector

  /** Serialize a learned merge table to a frame-shaped relation
    * `(rank int, left string, right string, cnt long)` — writable through
    * any [[graft.io.GraftIO]] sink and restorable with
    * [[mergesFromFrame]] (the q130 index-persistence pattern: train once,
    * persist as a plain table, reload everywhere — a tokenizer outlives
    * the job that fitted it). `rank` is the APPLICATION order: BPE merges
    * replay in training order, so the rank column, not file order, is the
    * contract. */
  def mergesToFrame(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String, Long)]
  ): DataFrame = {
    import spark.implicits._
    require(merges.nonEmpty, "mergesToFrame: empty merge table")
    merges.zipWithIndex
      .map { case ((l, r, c), rank) => (rank, l, r, c) }
      .toDF("rank", "left", "right", "cnt")
  }

  /** Restore a merge table from a persisted `(rank, left, right, cnt)`
    * frame, in application order. DRIVER-BOUNDED collect: a merge table
    * is vocab-sized by construction (50k-100k rows for production
    * tokenizers) — the cap turns a mistaken data-sized frame into a loud
    * failure instead of a silent driver OOM (house rule). Requires dense
    * ranks 0..n-1 so a partially-written table cannot silently segment
    * differently from the one that was trained. */
  def mergesFromFrame(df: DataFrame, maxMerges: Int = 1 << 20): Seq[(String, String, Long)] = {
    val rows = df.select(col("rank").cast("int"), col("left").cast("string"),
        col("right").cast("string"), col("cnt").cast("long"))
      .limit(maxMerges + 1).collect()
    require(rows.length <= maxMerges,
      s"merge-table frame exceeds $maxMerges rows — not a BPE merge table; " +
        "raise maxMerges deliberately if the vocabulary really is this large")
    require(rows.nonEmpty, "merge-table frame is empty")
    val byRank = rows.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    require(byRank.map(_._1).toSeq == byRank.indices.toSeq,
      s"merge ranks must be dense 0..${byRank.length - 1} (partial or corrupted table)")
    byRank.map(t => (t._2, t._3, t._4)).toSeq
  }
}
