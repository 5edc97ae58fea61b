package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sparkext.WordPieceApply

/** WordPiece tokenizer — the BERT-family subword model (Schuster &
  * Nakajima 2012 "Japanese and Korean voice search"; Devlin et al. 2018;
  * the merge-selection rule below is the one documented for the
  * published WordPiece trainer: maximize pair likelihood
  * `count(l,r) / (count(l) · count(r))`, i.e. the bigram's pointwise
  * score, where BPE would maximize raw `count(l,r)`).
  *
  * Completes the mainstream tokenizer-family triple next to
  * [[Bpe]] (char + byte level, frequency-argmax merges) and
  * [[Unigram]] (SentencePiece likelihood pruning):
  *
  *   - TRAIN: one corpus-sized `groupBy(word)` pass ([[Bpe.wordVocab]],
  *     reused verbatim), then a driver-side merge loop over the
  *     collected vocab — the [[Bpe.trainLocal]] collect-once shape,
  *     loud `maxVocab` cap, `minFrequency` production cutoff. Training
  *     cost depends on |vocab|, never corpus size.
  *   - APPLY: greedy longest-match-first per word
  *     ([[graft.sparkext.WordPieceApply]], a codegen'd expression
  *     carrying the vocab as ONE reference object) — a pure projection,
  *     no shuffle, no UDF.
  *
  * Symbol convention (BERT): a word's first character is a plain
  * symbol, every later character carries the `##` continuation prefix;
  * merging `(l, r)` concatenates `l` with `r` minus its `##`. A word
  * containing a literal `#` is ambiguous under this convention — same
  * caveat as the published implementation, accepted as-is.
  *
  * Unlike BPE (rank-ordered merge REPLAY at apply time), WordPiece
  * inference needs only the final token SET: greedy longest-match is
  * the published inference algorithm, so the model's portable artifact
  * is the vocabulary, persisted via [[vocabToFrame]]/[[vocabFromFrame]]
  * (the q130 train-once-reload-everywhere pattern). */
object WordPiece {

  val ContinuationPrefix = "##"
  val DefaultUnk = "[UNK]"

  /** One merge step's full selection evidence: the pair, its merged
    * token, and the three counts the likelihood score was computed from
    * AT SELECTION TIME — enough for an external replay (the q181 oracle
    * re-derives merge #1's argmax from these exact semantics). */
  final case class WpMerge(left: String, right: String, merged: String,
      pairCount: Long, leftCount: Long, rightCount: Long)

  /** A trained model: merges in selection order, the base symbols
    * (sorted; every word-initial char and `##`-continuation seen in
    * training), and the unknown-token literal. `vocab` is derived —
    * distinct, since two different merges can produce the same TEXT
    * (e.g. (a,##bc) and (ab,##c) both yield "abc"). */
  final case class WordPieceModel(merges: Seq[WpMerge], baseSymbols: Seq[String],
      unk: String = DefaultUnk) {
    def vocab: Seq[String] = (baseSymbols ++ merges.map(_.merged)).distinct
  }

  /** Word -> BERT symbol sequence: first char plain, rest `##`-prefixed
    * (driver-side twin of the apply expression's position rule).
    * Iterates by CODE POINT, not UTF-16 unit, so non-BMP characters
    * (emoji, CJK ext-B — surrogate pairs in Java strings) stay whole
    * symbols instead of lone surrogates (r18 advice; matches the
    * published code-point-based BERT WordpieceTokenizer). */
  private[graft] def wordSymbolsLocal(w: String): Array[String] = {
    val cps = w.codePoints().toArray
    cps.zipWithIndex.map { case (cp, i) =>
      val c = new String(Character.toChars(cp))
      if (i == 0) c else ContinuationPrefix + c
    }
  }

  /** Exact likelihood-score comparison: is `a = ca/(la·ra)` strictly
    * greater than `b = cb/(lb·rb)`? Cross-multiplied in BigInt — counts
    * are corpus-sized longs, so the three-way product overflows Long;
    * float scores would tie-break wrongly on near-equal rationals
    * (house rule: exact arithmetic wherever an oracle must agree). */
  private def scoreGt(ca: Long, la: Long, ra: Long,
      cb: Long, lb: Long, rb: Long): Boolean =
    BigInt(ca) * BigInt(lb) * BigInt(rb) > BigInt(cb) * BigInt(la) * BigInt(ra)

  private def scoreEq(ca: Long, la: Long, ra: Long,
      cb: Long, lb: Long, rb: Long): Boolean =
    BigInt(ca) * BigInt(lb) * BigInt(rb) == BigInt(cb) * BigInt(la) * BigInt(ra)

  /** Learn `numMerges` WordPiece merges from a word-frequency vocab
    * (the [[Bpe.wordVocab]] shape: `word`, `wcount`).
    *
    * Driver-side after ONE bounded collect (the [[Bpe.trainLocal]]
    * shape; loud `maxVocab` cap, `minFrequency` cutoff). Pair and
    * single-symbol counts are maintained incrementally per merge; the
    * argmax is a full scan of the live pair map per merge — O(|pairs|)
    * with a double-score prefilter and exact BigInt resolution among
    * near-ties. A heap does not fit here the way it fits BPE: the score
    * depends on BOTH single counts, so one merge invalidates every pair
    * sharing a symbol with it, and lazy invalidation would re-enqueue
    * whole neighborhoods per step — the scan is simpler and costs the
    * same asymptotics at BERT-scale merge counts (~30k).
    *
    * Tie-break: exact score DESC, then (left, right) lexicographic ASC
    * — the [[Bpe.train]] convention, replayed by the q181 oracle.
    * Stops early when no adjacent pair remains. */
  def trainLocal(
      vocab: DataFrame,
      numMerges: Int,
      maxVocab: Int = 1 << 22,
      minFrequency: Long = 1L,
      unk: String = DefaultUnk
  ): WordPieceModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minFrequency >= 1L, s"minFrequency must be >= 1, got $minFrequency")
    // DRIVER-BOUNDED collect: limit(maxVocab + 1) makes an over-cap vocab
    // a loud failure (house rule), never a silent driver OOM
    val rows = vocab.filter(col("wcount") >= minFrequency)
      .select(col("word").cast("string"), col("wcount").cast("long"))
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"wordpiece trainLocal vocab exceeds maxVocab=$maxVocab distinct words — raise " +
        "maxVocab deliberately or raise minFrequency (the standard trainer cutoff)")
    val words = rows.map(r => wordSymbolsLocal(r.getString(0)))
    val freqs = rows.map(_.getLong(1))

    import scala.collection.mutable
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val singleCount = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def add(m: mutable.HashMap[String, Long], k: String, d: Long): Unit = {
      val c = m.getOrElse(k, 0L) + d
      if (c <= 0L) { m.remove(k); () } else m(k) = c
    }
    def addPair(p: (String, String), d: Long, wi: Int): Unit = {
      val c = pairCount.getOrElse(p, 0L) + d
      if (c <= 0L) { pairCount.remove(p); () }
      else {
        pairCount(p) = c
        if (d > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
    }
    def account(wi: Int, sign: Long): Unit = {
      val w = words(wi); val d = sign * freqs(wi)
      var i = 0
      while (i < w.length) {
        add(singleCount, w(i), d)
        if (i < w.length - 1) addPair((w(i), w(i + 1)), d, wi)
        i += 1
      }
    }
    var wi = 0
    while (wi < words.length) { account(wi, 1L); wi += 1 }
    // base vocabulary: every symbol seen in the corpus, sorted (stable
    // across partitioning by construction — counts are exact)
    val baseSymbols = singleCount.keys.toArray.sorted.toVector

    var merges = Vector.empty[WpMerge]
    var t = 0
    var done = false
    while (t < numMerges && !done) {
      if (pairCount.isEmpty) done = true
      else {
        // pass 1: double-score prefilter (exact comparison is BigInt-
        // expensive; the double max is within 1 ulp-noise of the exact
        // max, so candidates within a 1e-9 relative band provably
        // contain the exact argmax)
        var best = -1.0
        for (((l, r), c) <- pairCount) {
          val s = c.toDouble / (singleCount(l).toDouble * singleCount(r).toDouble)
          if (s > best) best = s
        }
        val band = best * (1.0 - 1e-9)
        var cand: List[((String, String), Long)] = Nil
        for (((l, r), c) <- pairCount) {
          val s = c.toDouble / (singleCount(l).toDouble * singleCount(r).toDouble)
          if (s >= band) cand = ((l, r), c) :: cand
        }
        // pass 2: exact resolution among the (typically 1-2) candidates
        var top: ((String, String), Long) = cand.head
        for (e <- cand.tail) {
          val ((al, ar), ac) = top; val ((bl, br), bc) = e
          val (ala, ara) = (singleCount(al), singleCount(ar))
          val (bla, bra) = (singleCount(bl), singleCount(br))
          if (scoreGt(bc, bla, bra, ac, ala, ara) ||
            (scoreEq(bc, bla, bra, ac, ala, ara) &&
              (bl < al || (bl == al && br < ar)))) top = e
        }
        val ((l, r), c) = top
        val merged = l + r.stripPrefix(ContinuationPrefix)
        merges :+= WpMerge(l, r, merged, c, singleCount(l), singleCount(r))
        // rewrite every word containing the pair: retract its counts,
        // apply greedy leftmost non-overlapping replacement, re-add
        val members = pairWords.remove((l, r)).getOrElse(mutable.Set.empty)
        for (mi <- members) {
          val old = words(mi)
          var has = false; var i = 0
          while (!has && i < old.length - 1) {
            if (old(i) == l && old(i + 1) == r) has = true; i += 1
          }
          if (has) {
            account(mi, -1L)
            val nw = mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < old.length) {
              if (i + 1 < old.length && old(i) == l && old(i + 1) == r) {
                nw += merged; i += 2
              } else { nw += old(i); i += 1 }
            }
            words(mi) = nw.toArray
            account(mi, 1L)
          }
        }
      }
      t += 1
    }
    WordPieceModel(merges, baseSymbols, unk)
  }

  /** One-call convenience: one corpus scan to the word vocab
    * ([[Bpe.wordVocab]] — whitespace tokens, lowercased), then
    * [[trainLocal]]. */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 1 << 22,
      minFrequency: Long = 1L,
      unk: String = DefaultUnk
  ): WordPieceModel =
    trainLocal(Bpe.wordVocab(df, textCol), numMerges, maxVocab, minFrequency, unk)

  /** Segment ONE pre-tokenized word — greedy longest-match under the
    * model's vocabulary (pure projection; vocab rides as one reference
    * object). */
  def segmentWord(word: Column, model: WordPieceModel,
      maxInputChars: Int = 100): Column =
    WordPieceApply(word, model.vocab, model.unk, maxInputChars)

  /** Tokenize text: whitespace pre-tokenization ([[TextAnalysis.tokens]]
    * — the trainer's exact pre-tokenizer), then per-word greedy longest
    * match, flattened to one `array<string>` per document. */
  def segment(text: Column, model: WordPieceModel,
      maxInputChars: Int = 100): Column =
    flatten(transform(
      filter(TextAnalysis.tokens(text), w => length(w) > 0),
      w => WordPieceApply(w, model.vocab, model.unk, maxInputChars)))

  /** Subword count under a trained model. */
  def tokenCount(text: Column, model: WordPieceModel): Column =
    size(segment(text, model))

  /** Integer-id vocabulary order — the BERT `vocab.txt` contract (id =
    * line number): `[UNK]` at 0, then base symbols (sorted, as trained),
    * then merged tokens in training order. */
  def idVocab(model: WordPieceModel): Seq[String] = model.unk +: model.vocab

  /** Tokenize to INTEGER ids (round 18 — the deployment tensor shape: a
    * training pipeline consumes ids, not subword strings). Pure
    * projection; the id table rides as one reference object
    * ([[graft.sparkext.VocabIdLookup]]); any token outside the
    * vocabulary — only possible if the model and text diverge — takes
    * the UNK id 0, so the encoding is total. */
  def tokenIds(text: Column, model: WordPieceModel,
      maxInputChars: Int = 100): Column =
    graft.sparkext.VocabIdLookup(
      segment(text, model, maxInputChars), idVocab(model), missingId = 0)

  /** The model as a BERT-style `vocab.txt` (one token per line, id =
    * line number, `[UNK]` first — [[idVocab]] order). Write through any
    * [[graft.io.GraftIO]] `writeText`; [[vocabFromTxt]] restores the
    * APPLY side (greedy longest-match needs only the token set — merge
    * provenance stays with [[vocabToFrame]]). */
  def exportVocabTxt(model: WordPieceModel): String =
    idVocab(model).mkString("\n") + "\n"

  /** Rebuild an apply-only model from a `vocab.txt` (line 0 = UNK; base
    * symbols vs merged tokens are distinguished by length/`##` shape not
    * being needed — greedy matching uses the whole set). */
  def vocabFromTxt(txt: String): WordPieceModel = {
    val lines = txt.split("\n").filter(_.nonEmpty).toVector
    require(lines.nonEmpty, "empty vocab.txt")
    WordPieceModel(Nil, lines.drop(1), unk = lines.head)
  }

  /** Serialize a model to a frame `(ord int, token string, kind string,
    * left string, right string, pair_count long, left_count long,
    * right_count long)` — writable through any [[graft.io.GraftIO]] sink
    * and restorable with [[vocabFromFrame]] (the [[Bpe.mergesToFrame]]
    * persistence pattern: a tokenizer outlives the job that fitted it).
    * `kind` rows: 'unk' (ord -1), 'base' (sorted order), 'merge'
    * (training order, selection counts preserved). */
  def vocabToFrame(spark: org.apache.spark.sql.SparkSession,
      model: WordPieceModel): DataFrame = {
    import spark.implicits._
    val nBase = model.baseSymbols.size
    val unkRow = Seq((-1, model.unk, "unk", "", "", 0L, 0L, 0L))
    val baseRows = model.baseSymbols.zipWithIndex.map { case (s, i) =>
      (i, s, "base", "", "", 0L, 0L, 0L)
    }
    val mergeRows = model.merges.zipWithIndex.map { case (m, i) =>
      (nBase + i, m.merged, "merge", m.left, m.right,
        m.pairCount, m.leftCount, m.rightCount)
    }
    (unkRow ++ baseRows ++ mergeRows)
      .toDF("ord", "token", "kind", "left", "right",
        "pair_count", "left_count", "right_count")
  }

  /** Restore a model from a [[vocabToFrame]] relation. DRIVER-BOUNDED
    * collect with a loud cap — a vocabulary is driver-scale by
    * construction (BERT: 30k tokens). */
  def vocabFromFrame(df: DataFrame, maxTokens: Int = 1 << 22): WordPieceModel = {
    val rows = df.select(col("ord").cast("int"), col("token").cast("string"),
        col("kind").cast("string"), col("left").cast("string"),
        col("right").cast("string"), col("pair_count").cast("long"),
        col("left_count").cast("long"), col("right_count").cast("long"))
      .limit(maxTokens + 1).collect()
    require(rows.length <= maxTokens,
      s"wordpiece vocab frame exceeds $maxTokens rows — not a vocabulary")
    val sorted = rows.sortBy(_.getInt(0))
    val unk = sorted.find(_.getString(2) == "unk").map(_.getString(1))
      .getOrElse(DefaultUnk)
    val base = sorted.filter(_.getString(2) == "base").map(_.getString(1)).toVector
    val merges = sorted.filter(_.getString(2) == "merge").map { r =>
      WpMerge(r.getString(3), r.getString(4), r.getString(1),
        r.getLong(5), r.getLong(6), r.getLong(7))
    }.toVector
    WordPieceModel(merges, base, unk)
  }
}
