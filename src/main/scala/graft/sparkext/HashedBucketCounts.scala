package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row hashed-bucket histogram of a string's character n-grams — the
  * single-pass, shuffle-free core of [[graft.operators.TextAnalysis
  * .hashedCharNgramFeatures]] (round 19).
  *
  * Replaces TWO quadratic-or-distributed costs at once:
  *
  *  1. The gram ARRAY (`charNgrams`: `transform(sequence(...),
  *     i => text.substr(i, n))`) re-scans the string from byte 0 for every
  *     gram — `substr` is O(position) on UTF-8 — so a d-char document
  *     paid O(d²) character decoding just to ENUMERATE its grams
  *     (measured: the dominant term of q162's predict pass at sf0.1).
  *     This eval walks the code-point boundaries ONCE and hashes each
  *     n-gram as a byte SLICE of the original string — a gram's UTF-8
  *     bytes are contiguous in the parent — so enumeration is O(d) with
  *     zero per-gram allocation.
  *  2. The round-14 histogram shape (explode every gram to a row →
  *     pivot-count aggregation → join features back) moved corpus ×
  *     grams-per-doc rows through a shuffle to count what each row
  *     already knew. The histogram is a pure function of one row: this
  *     expression returns `array<long>` of length `buckets` and
  *     featurization becomes a projection (zero exchanges, no join,
  *     column pruning survives).
  *
  * BIT-PARITY with the old plan is structural (spec-pinned): the gram set
  * is exactly `substr(i, n)` for i = 1..len−n+1 over the same normalized
  * string, the bucket is `pmod(xxhash64(gram), buckets)` where
  * [[XXH64.hashUnsafeBytes]] over the gram's byte slice equals
  * `xxhash64`'s [[XXH64.hashUTF8String]] over the materialized substring
  * (same algorithm, same bytes, same seed 42), and integer counts are
  * order-independent — so every feature, model weight, and prediction
  * downstream is unchanged.
  *
  * A null input string yields null (the exploded form dropped such rows;
  * callers coalesce to the all-zero feature row exactly as the old
  * left-join + fill did).
  *
  * SHORT-STRING QUIRK, replicated deliberately: `charNgrams`' scaladoc
  * claims strings shorter than `n` yield an empty array, but its
  * `sequence(1, greatest(len-(n-1), 0))` actually yields `[1, 0]` when
  * the bound is 0 (Spark's `sequence(1, 0)` defaults to step −1), so the
  * old plan emitted TWO grams — `substr(1, n)` and `substr(0, n)`, both
  * the whole (truncated) string. Those two hashes fed every trained
  * model's feature statistics; "fixing" the quirk here would shift
  * weights and predictions for the entire corpus, so the fused eval
  * reproduces it bit-for-bit (the parity spec pins it).
  *
  * CodegenFallback: evaluation is a tight per-row byte walk — the
  * surrounding projection stays in whole-stage codegen and calls this
  * node as a black box (the [[NearestCentroidId]] pattern).
  */
case class HashedCharNgramCounts(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")
  require(buckets >= 2 && buckets <= (1 << 20),
    s"buckets must be in [2, 2^20], got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"HashedCharNgramCounts needs string, got ${other.simpleString(5)}")
    }

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) return null
    val counts = new Array[Long](buckets)
    val bytes = s.getBytes // may copy when offset/region-backed; one copy per row
    val nBytes = bytes.length
    // code-point start offsets (one linear walk; offs(i) = byte start of
    // code point i, offs(numCp) = nBytes)
    val offs = new Array[Int](nBytes + 1)
    var numCp = 0
    var i = 0
    while (i < nBytes) {
      offs(numCp) = i
      numCp += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(numCp) = nBytes
    if (numCp < n) {
      // the short-string quirk (see class doc): two grams, both the whole
      // truncated string
      val h = XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, nBytes, 42L)
      val m = h % buckets
      counts(if (m < 0) (m + buckets).toInt else m.toInt) += 2L
    } else {
      var g = 0
      val last = numCp - n
      while (g <= last) {
        val start = offs(g)
        val h = XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          offs(g + n) - start, 42L)
        val m = h % buckets
        counts(if (m < 0) (m + buckets).toInt else m.toInt) += 1L
        g += 1
      }
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedCharNgramCounts {
  def apply(text: Column, n: Int, buckets: Int): Column =
    ColumnBridge.column(
      HashedCharNgramCounts(ColumnBridge.expression(text), n, buckets))
}
