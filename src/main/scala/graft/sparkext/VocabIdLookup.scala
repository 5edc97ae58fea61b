package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-string → integer-id mapping, held as ONE reference object (the
  * [[BpeMergeTable]] rule) — the LAST step of tokenizer deployment: a
  * training pipeline consumes integer ids, not subword strings, and the
  * id assignment is part of the published model contract (GPT-2: byte
  * ids 0–255 then merges by rank; BERT: vocab.txt line numbers). One
  * hash lookup per token, `missingId` (the UNK id) for anything not in
  * the vocabulary — total by construction. */
final class VocabIdTable(tokens: Array[String], val missingId: Int)
    extends Serializable {
  private val ids = new java.util.HashMap[String, Integer](
    math.max(16, tokens.length * 2))
  tokens.zipWithIndex.foreach { case (t, i) =>
    // first occurrence wins — duplicate TEXT (two merges producing the
    // same string) keeps the earlier id, matching vocab-file semantics
    ids.putIfAbsent(t, i)
  }

  def lookup(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = in.getUTF8String(i)
      val id = if (s == null) null else ids.get(s.toString)
      out(i) = if (id == null) missingId else id.intValue()
      i += 1
    }
    new GenericArrayData(out) // the Array[Int] primitive overload
  }
}

/** `array<string> -> array<int>` under a fixed vocabulary; null array
  * stays null; unknown/null elements map to `missingId`. Codegen ships
  * the table as a reference object and emits one call. */
case class VocabIdLookup(
    child: Expression,
    vocab: Seq[String],
    missingId: Int
) extends UnaryExpression {

  @transient private lazy val table = new VocabIdTable(vocab.toArray, missingId)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_id_lookup expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = table.lookup(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val t = ctx.addReferenceObj("vocabIds", table, classOf[VocabIdTable].getName)
      s"${ev.value} = $t.lookup($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): VocabIdLookup =
    copy(child = newChild)
  override def simpleString(maxFields: Int): String =
    s"vocab_id_lookup(vocab=${vocab.size})"
  override def prettyName: String = "vocab_id_lookup"
}

object VocabIdLookup {
  def apply(tokens: Column, vocab: Seq[String], missingId: Int): Column =
    ColumnBridge.column(VocabIdLookup(
      ColumnBridge.expression(tokens), vocab, missingId))
}
