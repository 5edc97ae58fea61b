package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A learned unigram-LM tokenizer vocabulary (Kudo 2018, "Subword
  * Regularization" §3 — the SentencePiece unigram model), held as ONE
  * reference object like [[BpeMergeTable]]: plan size independent of the
  * piece count.
  *
  * [[UnigramTable.segmentString]] is the Viterbi decode: the segmentation
  * of a word maximizing the sum of piece log-probabilities. Exact ties
  * prefer the LONGER last piece (deterministic; biases toward fewer
  * pieces). A character absent from the vocabulary scores [[UnigramTable
  * .UnkScore]] so decoding is total on unseen text. The SAME object runs
  * inside the trainer's EM loop and inside this expression — one Viterbi
  * implementation, no drift.
  *
  * Complexity per word: O(len × maxPieceLen) map probes. Pieces are
  * keyed by Java String (UTF-16 code units — the same convention
  * [[BpeApply]]'s char split uses; supplementary-plane symbols decompose
  * into surrogate halves, acceptable for the char-level variants this
  * models). */
final class UnigramTable(
    val pieces: Array[String],
    val scores: Array[Double],
    val byteFallback: Boolean = false
) extends Serializable {
  require(pieces.length == scores.length, "piece/score arrays must align")
  require(pieces.nonEmpty, "empty unigram vocabulary")

  val maxPieceLen: Int = pieces.iterator.map(_.length).max

  @transient private lazy val map: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
    m
  }

  def score(piece: String): Option[Double] = Option(map.get(piece)).map(_.doubleValue)

  /** Viterbi segmentation of one word (non-null, possibly empty). */
  def segmentString(s: String): Array[String] = {
    val n = s.length
    if (n == 0) return Array.empty
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Double.NegativeInfinity
      var bestLen = 0
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val sc0 = map.get(s.substring(i - l, i))
        val sc =
          if (sc0 != null) sc0.doubleValue
          else if (l == 1) UnigramTable.UnkScore
          else Double.NaN
        if (!sc.isNaN) {
          val cand = dp(i - l) + sc
          // strict > keeps the SMALLEST l on ties scanned so far; we want
          // the longest, so scan l ascending and take >=
          if (cand >= best) { best = cand; bestLen = l }
        }
        l += 1
      }
      dp(i) = best; back(i) = bestLen
      i += 1
    }
    var cnt = 0
    i = n
    while (i > 0) { cnt += 1; i -= back(i) }
    val out = new Array[String](cnt)
    i = n
    var j = cnt - 1
    while (i > 0) { out(j) = s.substring(i - back(i), i); j -= 1; i -= back(i) }
    if (!byteFallback) out else expandOov(out)
  }

  /** SentencePiece `--byte_fallback`: out-of-vocabulary characters emit
    * their UTF-8 bytes as `<0xNN>` pieces instead of raw unknown chars —
    * decoding stays total AND lossless. RUNS of adjacent OOV units are
    * encoded together so supplementary-plane characters (surrogate
    * pairs, each half OOV on its own) byte-encode correctly. */
  private def expandOov(out: Array[String]): Array[String] = {
    var any = false
    var i = 0
    while (!any && i < out.length) {
      if (out(i).length == 1 && map.get(out(i)) == null) any = true
      i += 1
    }
    if (!any) return out
    val res = scala.collection.mutable.ArrayBuffer.empty[String]
    val pend = new java.lang.StringBuilder
    def flush(): Unit = if (pend.length > 0) {
      pend.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => res += f"<0x${b & 0xFF}%02X>")
      pend.setLength(0)
    }
    i = 0
    while (i < out.length) {
      val p = out(i)
      if (p.length == 1 && map.get(p) == null) pend.append(p)
      else { flush(); res += p }
      i += 1
    }
    flush()
    res.toArray
  }

  def segment(word: UTF8String): ArrayData = {
    val parts = segmentString(word.toString)
    val arr = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { arr(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(arr)
  }
}

object UnigramTable {
  /** Per-character penalty for out-of-vocabulary characters — far below
    * any trained piece score, so unknowns never beat known pieces, but
    * finite, so decoding stays total. */
  val UnkScore: Double = -100.0
}

/** Viterbi-segment a word under a unigram vocabulary (`string` ->
  * `array<string>`). Null words stay null. Codegen ships the table as a
  * reference object — containing trees stay inside whole-stage codegen
  * (the BpeApply rule). */
case class UnigramApply(
    child: Expression,
    pieces: Seq[String],
    scores: Seq[Double],
    byteFallback: Boolean = false
) extends UnaryExpression {
  require(pieces.size == scores.size, s"pieces/scores must align: ${pieces.size} vs ${scores.size}")

  @transient private lazy val table =
    new UnigramTable(pieces.toArray, scores.toArray, byteFallback)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_apply expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = table.segment(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val t = ctx.addReferenceObj("unigramTable", table, classOf[UnigramTable].getName)
      s"${ev.value} = $t.segment($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramApply =
    copy(child = newChild)
  // keep the table out of plan strings — production vocabularies are 32k+
  override def simpleString(maxFields: Int): String =
    s"unigram_apply(pieces=${pieces.size})"
  override def prettyName: String = "unigram_apply"
}

object UnigramApply {
  def apply(word: Column, vocab: Seq[(String, Double)]): Column =
    ColumnBridge.column(UnigramApply(
      ColumnBridge.expression(word), vocab.map(_._1), vocab.map(_._2)))

  def apply(word: Column, vocab: Seq[(String, Double)], byteFallback: Boolean): Column =
    ColumnBridge.column(UnigramApply(
      ColumnBridge.expression(word), vocab.map(_._1), vocab.map(_._2), byteFallback))
}
