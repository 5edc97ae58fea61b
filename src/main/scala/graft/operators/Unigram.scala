package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sparkext.{UnigramApply, UnigramTable}

/** Unigram-LM (SentencePiece-style) tokenizer training and application —
  * the second production tokenizer family beside [[Bpe]] (Kudo 2018,
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates", §3.2's iterative EM + prune).
  *
  * This is the VITERBI-EM (hard-EM) variant: the E-step assigns each
  * word its single best segmentation under the current piece scores
  * (instead of forward–backward expected counts), which keeps every step
  * exactly reproducible — integer usage counts, deterministic argmax
  * with documented tie-breaks — so results are partition-independent and
  * oracle-pinnable. The pruning criterion is usage (expected count), the
  * standard shrink-by-factor loop.
  *
  * Scale shape — the [[Bpe.trainLocal]] production contract:
  *  - ONE corpus-sized pass builds the word-frequency vocab
  *    ([[Bpe.wordVocab]] — training cost depends on |vocab|, not corpus
  *    size);
  *  - the vocab is collected ONCE (driver-bounded, loud `maxVocab` cap,
  *    `minFrequency` cutoff — the standard trainer knobs);
  *  - seeding, EM, and pruning run driver-side over the vocab;
  *  - the learned vocabulary applies as a PURE PROJECTION
  *    ([[graft.sparkext.UnigramApply]] — the table rides the plan as one
  *    reference object; the SAME [[UnigramTable]] Viterbi runs in the EM
  *    loop and at apply time, so train and apply cannot drift).
  */
object Unigram {

  /** Train a unigram vocabulary from a `(word, wcount)` frequency frame.
    *
    * Algorithm: seed with all word substrings up to `maxPieceLen`
    * (position-counted, weighted by word frequency; every single
    * character always kept, top `seedSize` multi-char pieces by
    * (count DESC, piece ASC)); then loop { `emIters` hard-EM rounds
    * (Viterbi usage counts → log-prob scores), prune multi-char pieces to
    * `max(target, floor(multis × shrink))` by (usage DESC, piece ASC) }
    * until the vocabulary fits `vocabSize`; finish with one more EM round
    * so the returned scores reflect the final inventory.
    *
    * Returns (piece, logProb) sorted by (score DESC, piece ASC). Single
    * characters are never pruned, so the result can exceed `vocabSize`
    * when the corpus has more distinct characters than that — loudly. */
  def trainLocal(
      vocab: DataFrame,
      vocabSize: Int,
      maxPieceLen: Int = 6,
      seedSize: Int = 1 << 18,
      shrink: Double = 0.75,
      emIters: Int = 2,
      maxVocab: Int = 1 << 22,
      minFrequency: Long = 1L
  ): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(shrink > 0 && shrink < 1, s"shrink must be in (0,1), got $shrink")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    // DRIVER-BOUNDED collect (the Bpe.trainLocal house rule): a loud cap,
    // never a silent driver OOM
    val rows = vocab.filter(col("wcount") >= minFrequency)
      .select(col("word").cast("string"), col("wcount").cast("long"))
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"Unigram.trainLocal vocab exceeds maxVocab=$maxVocab distinct words — raise " +
        "maxVocab deliberately or raise minFrequency (the standard trainer cutoff)")
    require(rows.nonEmpty, "Unigram.trainLocal: empty vocabulary")
    val words = rows.map(_.getString(0))
    val freqs = rows.map(_.getLong(1))

    import scala.collection.mutable
    // ---- seed: substring position counts --------------------------------
    val seedCount = mutable.HashMap.empty[String, Long]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi)
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val jMax = math.min(w.length, i + maxPieceLen)
        while (j <= jMax) {
          val sub = w.substring(i, j)
          seedCount(sub) = seedCount.getOrElse(sub, 0L) + f
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    val singles = seedCount.keysIterator.filter(_.length == 1).toArray.sorted
    val multisSeed = seedCount.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(seedSize).map(_._1).toArray
    var current: Array[String] = singles ++ multisSeed
    // initial scores from raw substring counts
    var scores: Array[Double] = {
      val total = current.iterator.map(seedCount).sum.toDouble
      current.map(p => math.log(seedCount(p) / total))
    }

    // ---- hard-EM round: Viterbi usage → log-prob scores ------------------
    // zero-usage pieces score an effective -inf stand-in (they can never
    // win a decode again) and sort to the prune front
    def emRound(): Array[Long] = {
      val table = new UnigramTable(current, scores)
      val idx = current.zipWithIndex.toMap
      val usage = new Array[Long](current.length)
      var k = 0
      while (k < words.length) {
        val segs = table.segmentString(words(k))
        var s = 0
        while (s < segs.length) {
          idx.get(segs(s)).foreach(usage(_) += freqs(k))
          s += 1
        }
        k += 1
      }
      val total = math.max(1L, usage.sum).toDouble
      scores = usage.map(u => if (u == 0L) -1e9 else math.log(u / total))
      usage
    }

    // ---- prune loop ------------------------------------------------------
    val targetMultis = math.max(0, vocabSize - singles.length)
    var done = false
    var lastUsage: Array[Long] = null
    while (!done) {
      (1 to emIters).foreach(_ => lastUsage = emRound())
      val multiIdx = current.indices.filter(current(_).length > 1)
      if (multiIdx.size <= targetMultis) done = true
      else {
        val keepN = math.max(targetMultis, (multiIdx.size * shrink).toInt)
        val keepMultis = multiIdx
          .sortBy(i => (-lastUsage(i), current(i)))
          .take(keepN) // keepN < multis strictly, so the loop always converges
        val keep = (current.indices.filter(current(_).length == 1) ++ keepMultis).sorted
        current = keep.map(current).toArray
        scores = keep.map(scores).toArray
      }
    }
    emRound() // final scores over the final inventory
    current.zip(scores).sortBy { case (p, s) => (-s, p) }.toSeq
  }

  /** One-call production-shape convenience: one corpus scan to the vocab
    * ([[Bpe.wordVocab]] — same whitespace pre-tokenization as BPE), then
    * [[trainLocal]]. */
  def trainFromCorpusLocal(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 6,
      maxVocab: Int = 1 << 22,
      minFrequency: Long = 1L
  ): Seq[(String, Double)] =
    trainLocal(Bpe.wordVocab(df, textCol), vocabSize, maxPieceLen,
      maxVocab = maxVocab, minFrequency = minFrequency)

  /** Tokenize text under a learned vocabulary: whitespace
    * pre-tokenization, per-word Viterbi decode — one `array<string>` of
    * subword units per document. Pure projection (no shuffle; the
    * vocabulary rides the plan as one reference object). */
  def segment(text: Column, vocab: Seq[(String, Double)],
      byteFallback: Boolean = false): Column =
    flatten(transform(TextAnalysis.tokens(text), t =>
      UnigramApply(t, vocab, byteFallback)))

  /** Subword count under a learned vocabulary. */
  def tokenCount(text: Column, vocab: Seq[(String, Double)],
      byteFallback: Boolean = false): Column =
    size(segment(text, vocab, byteFallback))

  /** Serialize a learned vocabulary to a frame-shaped relation
    * `(rank int, piece string, score double)` — the [[Bpe.mergesToFrame]]
    * persistence pattern (train once, persist as a plain table, reload
    * everywhere). `rank` is the (score DESC, piece ASC) order purely for
    * inspectability; scores, not ranks, drive the decode. */
  def piecesToFrame(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[(String, Double)]
  ): DataFrame = {
    import spark.implicits._
    require(vocab.nonEmpty, "piecesToFrame: empty vocabulary")
    vocab.zipWithIndex
      .map { case ((p, s), rank) => (rank, p, s) }
      .toDF("rank", "piece", "score")
  }

  /** Restore a vocabulary from a persisted `(rank, piece, score)` frame.
    * DRIVER-BOUNDED collect with a loud cap; requires dense ranks 0..n-1
    * (a partially-written table must not silently decode differently). */
  def piecesFromFrame(df: DataFrame, maxPieces: Int = 1 << 20): Seq[(String, Double)] = {
    val rows = df.select(col("rank").cast("int"), col("piece").cast("string"),
        col("score").cast("double"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"piece-table frame exceeds $maxPieces rows — not a unigram vocabulary; " +
        "raise maxPieces deliberately if it really is this large")
    require(rows.nonEmpty, "piece-table frame is empty")
    val byRank = rows.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    require(byRank.map(_._1).toSeq == byRank.indices.toSeq,
      s"piece ranks must be dense 0..${byRank.length - 1} (partial or corrupted table)")
    byRank.map(t => (t._2, t._3)).toSeq
  }
}
