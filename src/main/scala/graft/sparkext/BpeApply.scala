package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The learned merge table of a BPE tokenizer, held as ONE reference
  * object (the [[NearestCentroidId]] matrix-reference rule — a plan node
  * count independent of the number of merges; a 50k-merge production
  * table would otherwise be 100k literal AST nodes).
  *
  * `apply` replays the merges IN RANK ORDER over a symbol sequence; each
  * merge replaces its pair left-to-right, greedily and non-overlapping
  * ("aaa" + (a,a) -> [aa, a]) — the replacement semantics of the
  * published algorithm (Sennrich, Haddow, Birch 2016 "Neural Machine
  * Translation of Rare Words with Subword Units", algorithm 1). The
  * scan is in-place on a reusable buffer: write index never passes the
  * read index, so one allocation per row covers all merges.
  */
final class BpeMergeTable(
    val left: Array[UTF8String],
    val right: Array[UTF8String],
    val merged: Array[UTF8String]
) extends Serializable {
  require(left.length == right.length && left.length == merged.length,
    "merge table arrays must align")

  def apply(in: ArrayData): ArrayData = {
    var n = in.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) { buf(i) = in.getUTF8String(i); i += 1 }
    var m = 0
    while (m < left.length) {
      val a = left(m); val b = right(m); val ab = merged(m)
      var out = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && a.equals(buf(i)) && b.equals(buf(i + 1))) {
          buf(out) = ab
          i += 2
        } else {
          buf(out) = buf(i)
          i += 1
        }
        out += 1
      }
      n = out
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, n).asInstanceOf[Array[Any]])
  }
}

/** Apply a BPE merge table to a symbol sequence (`array<string>` ->
  * `array<string>`). Null elements never match a merge side and pass
  * through; a null array stays null. Codegen ships the table as a
  * reference object and emits one call — containing trees stay inside
  * whole-stage codegen (the post-round-14 DotProduct rule: no
  * CodegenFallback in hot paths). */
case class BpeApply(
    child: Expression,
    mergesLeft: Seq[String],
    mergesRight: Seq[String]
) extends UnaryExpression {
  require(mergesLeft.size == mergesRight.size,
    s"merge sides must align: ${mergesLeft.size} vs ${mergesRight.size}")

  @transient private lazy val table = new BpeMergeTable(
    mergesLeft.map(UTF8String.fromString).toArray,
    mergesRight.map(UTF8String.fromString).toArray,
    mergesLeft.zip(mergesRight).map { case (a, b) => UTF8String.fromString(a + b) }.toArray)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = table.apply(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val t = ctx.addReferenceObj("bpeMerges", table, classOf[BpeMergeTable].getName)
      s"${ev.value} = $t.apply($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
  // keep the table out of plan strings — production tables are 10k+ merges
  override def simpleString(maxFields: Int): String =
    s"bpe_apply(merges=${mergesLeft.size})"
  override def prettyName: String = "bpe_apply"
}

object BpeApply {
  def apply(symbols: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeApply(
      ColumnBridge.expression(symbols), merges.map(_._1), merges.map(_._2)))
}
