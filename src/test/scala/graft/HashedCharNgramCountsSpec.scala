package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sparkext.HashedCharNgramCounts

/** Round 19: [[HashedCharNgramCounts]] replaced the explode → pivot-count
  * → join-back histogram AND the O(d²) `substr`-per-gram enumeration
  * inside [[TextAnalysis.hashedCharNgramFeatures]]. The optimization
  * contract is BIT-PARITY: same gram set, same xxhash64 buckets, same
  * counts — pinned here against the old plan's own building blocks
  * (explode(charNgrams) + pmod(xxhash64)), so any drift in the fused
  * byte-slice walk (code-point boundaries, hash seed, pmod sign) fails
  * loudly rather than silently shifting every downstream model weight. */
class HashedCharNgramCountsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val tricky = Seq(
    "the quick brown fox jumps over the lazy dog",
    "ASCII and   collapsed    whitespace",
    "", "ab", "abc", "abcd", // below/at/above n=3
    "naïve café über señor", // 2-byte UTF-8
    "日本語のテキストと漢字", // 3-byte UTF-8
    "mixed 日本 ascii ü text", // mixed widths
    "emoji 😀 surrogate pairs 🎉 inside", // 4-byte UTF-8
    "a", " leading and trailing  ",
    "UPPER lower MiXeD 42 numbers !@# punct"
  )

  private def oldCounts(texts: Seq[String], n: Int, buckets: Int): Map[String, Seq[Long]] = {
    // the round-14 shape: explode(charNgrams) -> pmod(xxhash64(gram), buckets)
    val df = texts.zipWithIndex.toDF("text", "id")
    val grams = df
      .select(col("id"), explode(TextAnalysis.charNgrams(col("text"), n)).as("g"))
      .select(col("id"), pmod(xxhash64(col("g")), lit(buckets.toLong)).as("b"))
      .groupBy("id", "b").count()
      .collect()
      .groupBy(_.getInt(0))
    texts.indices.map { i =>
      val byBucket = grams.getOrElse(i, Array.empty)
        .map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
      texts(i) -> (0 until buckets).map(b => byBucket.getOrElse(b, 0L))
    }.toMap
  }

  private def newCounts(texts: Seq[String], n: Int, buckets: Int): Map[String, Seq[Long]] = {
    val df = texts.zipWithIndex.toDF("text", "id")
    df.select(col("text"),
        HashedCharNgramCounts(TextAnalysis.normalize(col("text"))
          .as("norm"), n, buckets).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
  }

  test("PARITY: fused histogram == explode/pivot histogram, gram-for-gram") {
    for (n <- Seq(1, 2, 3, 5); buckets <- Seq(2, 32, 64)) {
      // the old path fed NORMALIZED text into charNgrams — normalize both
      val norm = tricky // charNgrams normalizes internally; newCounts normalizes too
      val old = oldCounts(norm, n, buckets)
      val neu = newCounts(norm, n, buckets)
      for (t <- tricky)
        assert(neu(t) == old(t), s"n=$n buckets=$buckets text='$t'")
    }
  }

  test("null text yields null histogram (the exploded form dropped the row)") {
    val df = Seq((1, Option.empty[String]), (2, Some("abcdef"))).toDF("id", "text")
    val out = df.select(col("id"),
      HashedCharNgramCounts(TextAnalysis.normalize(col("text")), 3, 8).as("c"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out(1) && !out(2))
  }

  test("feature wrapper: null docs zero; short docs keep the legacy double-gram") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "ab"), (4L, "hello world"))
      .toDF("doc_id", "text")
    val feats = TextAnalysis.hashedCharNgramFeatures(df, "doc_id", "text", 3, 8)
    val rows = feats.collect().map(r => r.getLong(0) ->
      (0 until 8).map(b => r.getDouble(r.fieldIndex(s"f$b")))).toMap
    assert(rows(1L).forall(_ == 0.0)) // null text: the old left join filled 0.0
    // the short-string quirk: '' and 'ab' emit TWO whole-string grams, so
    // exactly one slot reads 1.0 (2/2) — the behavior every trained model
    // already priced in
    assert(rows(2L).count(_ == 1.0) == 1 && rows(2L).sum == 1.0)
    assert(rows(3L).count(_ == 1.0) == 1 && rows(3L).sum == 1.0)
    assert(rows(4L).sum > 0.0)
    // fractions sum to ~1 for a real doc (round-6 per-slot)
    assert(math.abs(rows(4L).sum - 1.0) < 1e-4)
  }
}
