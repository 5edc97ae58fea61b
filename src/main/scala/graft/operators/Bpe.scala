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
  */
object Bpe {

  /** Character symbols of a token (empty strings dropped). */
  def charSymbols(tok: Column): Column =
    filter(split(tok, ""), s => length(s) > 0)

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
      vocab: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val syms = BpeApply(charSymbols(col("word")), merges)
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
  def train(vocab: DataFrame, numMerges: Int): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var merges = Vector.empty[(String, String, Long)]
    var t = 0
    var done = false
    while (t < numMerges && !done) {
      // DRIVER-BOUNDED collect: limit(1) — exactly the argmax pair
      val top = pairCounts(vocab, merges.map(m => (m._1, m._2)))
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
    * loop, released on exit) + [[train]]. */
  def trainFromCorpus(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String, Long)] =
    graft.util.CacheScope.withPersisted(df.sparkSession) {
      val vocab = wordVocab(df, textCol).persist()
      try train(vocab, numMerges)
      finally vocab.unpersist(blocking = false)
    }

  /** Tokenize text under a learned table: whitespace pre-tokenization,
    * per-word character split, merge replay — flattened to one
    * `array<string>` of subword units per document. Pure projection
    * (no shuffle; the table rides the plan as one reference object). */
  def segment(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(TextAnalysis.tokens(text), t =>
      BpeApply(charSymbols(t), merges)))

  /** Subword count under a learned table — the REAL token budget the
    * `subword_count_approx` heuristic stands in for when no tokenizer
    * is available. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(segment(text, merges))
}
