package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two `array<double>` columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is a higher-order function: Catalyst evaluates the lambda per element
  * with boxing and no codegen, which made vector-heavy operators (ANN
  * verification, IVF cell assignment) the slowest part of the catalog.
  * This expression copies both arrays once (`toDoubleArray`) and runs a
  * tight primitive loop: ~20x less per-element overhead, measured.
  *
  * Accumulation is sequential left-to-right — bit-identical to both the
  * HOF fold it replaces and DuckDB's `list_dot_product`, so oracle parity
  * is preserved.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double>, got ${l.simpleString} / ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Real codegen (round 14; was CodegenFallback): a fallback expression
    * anywhere in a tree forces Spark to evaluate the WHOLE containing
    * expression interpreted, so every cosine in the brute-force /
    * verification paths was dropping out of whole-stage codegen. The
    * generated loop reads elements straight off the ArrayData accessors —
    * no toDoubleArray copy at all in the codegen'd path — and accumulates
    * in the same sequential left-to-right order as nullSafeEval. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Dot product column; inputs are cast to array<double> (no-op if
    * already double). */
  def apply(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(ad), ColumnBridge.expression(bd)))
  }
}
