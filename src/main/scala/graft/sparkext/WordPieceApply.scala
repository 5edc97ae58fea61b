package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The learned vocabulary of a WordPiece tokenizer, held as ONE reference
  * object (the [[BpeMergeTable]] rule: plan-node count independent of
  * vocabulary size — a BERT-scale 30k-token vocab would otherwise be 30k
  * literal AST nodes and blow the codegen method-size cliff).
  *
  * `apply` is the published greedy longest-match-first algorithm
  * (Schuster & Nakajima 2012; the BERT reference `WordpieceTokenizer`,
  * google-research/bert `tokenization.py`): per word, repeatedly take the
  * LONGEST substring of the remaining suffix that is in the vocabulary —
  * continuation positions looked up under the `##` prefix — and emit it;
  * if no prefix of the suffix is in the vocabulary the ENTIRE word maps
  * to `unk`; words longer than `maxInputChars` (BERT: 200, default 100 in
  * the reference tokenizer) map to `unk` wholesale (pathological-token
  * guard, same spirit as the house valve rule).
  *
  * The match scan caps candidate length at the vocabulary's longest
  * token, so per-word cost is O(len · maxTokenLen) substring probes
  * against a hash set — short words, tiny constants, no distributed
  * state: the vocab ships once per executor inside the codegen'd
  * expression. */
final class WordPieceVocab(
    tokens: Array[String],
    val unk: String,
    val maxInputChars: Int
) extends Serializable {
  private val set = new java.util.HashSet[String](math.max(16, tokens.length * 2))
  tokens.foreach(set.add)
  private val maxTokenLen: Int =
    if (tokens.isEmpty) 0 else tokens.iterator.map(_.length).max
  private val unkUtf8 = UTF8String.fromString(unk)

  def contains(tok: String): Boolean = set.contains(tok)

  /** Greedy longest-match segmentation of ONE word (already
    * pre-tokenized — no whitespace inside). Returns the `##`-prefixed
    * symbol forms, or `[unk]` when the word cannot be covered.
    * Candidate boundaries are CODE-POINT boundaries, never inside a
    * surrogate pair, so non-BMP characters stay whole and every emitted
    * token is valid Unicode (r18 advice; `maxInputChars` counts code
    * points — the published tokenizer's Python-`len` semantics). */
  def segmentWord(word: UTF8String): ArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = w.length
    val nCp = w.codePointCount(0, n)
    if (nCp > maxInputChars)
      return new GenericArrayData(Array[Any](unkUtf8))
    val bounds = new Array[Int](nCp + 1)
    var bi = 0; var boff = 0
    while (boff < n) {
      bounds(bi) = boff; bi += 1
      boff += Character.charCount(w.codePointAt(boff))
    }
    bounds(nCp) = n
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var s = 0 // code-point index
    while (s < nCp) {
      // longest candidate first; continuation positions carry "##";
      // candidate length (UTF-16 units, matching maxTokenLen's measure)
      // capped at the longest vocab token — but always ≥ 1 code point
      val allowed = math.max(1, if (s == 0) maxTokenLen else maxTokenLen - 2)
      var e = nCp
      while (e > s + 1 && bounds(e) - bounds(s) > allowed) e -= 1
      var hit: String = null
      while (hit == null && e > s) {
        val cand =
          if (s == 0) w.substring(bounds(s), bounds(e))
          else "##" + w.substring(bounds(s), bounds(e))
        if (set.contains(cand)) hit = cand else e -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](unkUtf8))
      out += UTF8String.fromString(hit)
      s = e
    }
    new GenericArrayData(out.toArray)
  }
}

/** Segment one word (`string` -> `array<string>`) under a WordPiece
  * vocabulary. Null word stays null. Codegen ships the vocab as a
  * reference object and emits one call — containing trees stay inside
  * whole-stage codegen (no CodegenFallback in hot paths). */
case class WordPieceApply(
    child: Expression,
    vocab: Seq[String],
    unk: String,
    maxInputChars: Int
) extends UnaryExpression {

  @transient private lazy val table =
    new WordPieceVocab(vocab.toArray, unk, maxInputChars)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_apply expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    table.segmentWord(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val t = ctx.addReferenceObj("wpVocab", table, classOf[WordPieceVocab].getName)
      s"${ev.value} = $t.segmentWord($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordPieceApply =
    copy(child = newChild)
  // keep the vocab out of plan strings — production vocabularies are 30k tokens
  override def simpleString(maxFields: Int): String =
    s"wordpiece_apply(vocab=${vocab.size})"
  override def prettyName: String = "wordpiece_apply"
}

object WordPieceApply {
  def apply(word: Column, vocab: Seq[String], unk: String,
      maxInputChars: Int = 100): Column =
    ColumnBridge.column(WordPieceApply(
      ColumnBridge.expression(word), vocab, unk, maxInputChars))
}
