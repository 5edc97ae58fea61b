package graft.sparkext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension entry point: registers the engine's custom Catalyst
  * expressions as SQL functions, so the SQL surface (spark.sql / JDBC)
  * reaches them exactly like built-ins — the idiomatic Spark way to ship
  * engine extensions without forking the parser.
  *
  * Activate per session:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.sparkext.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * Registered functions:
  *  - `dot_product(array<double>, array<double>) -> double` ([[DotProduct]])
  *  - `double_to_scaled(double, scale) -> long` ([[DoubleToScaled]]) —
  *    scale must be an integer literal in [0, 12]
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product expects exactly 2 arguments: (a, b)")
        DotProduct(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("double_to_scaled"),
      new ExpressionInfo(classOf[DoubleToScaled].getName, "double_to_scaled"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "double_to_scaled expects exactly 2 arguments: (value, scale)")
        val scale = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"double_to_scaled scale must be an INT literal, got $other")
        }
        DoubleToScaled(args(0), scale)
      }))
  }
}
