package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.config.RuleSpec

/** Compiles `[col, op, value]` rule triples into `Column` predicates.
  *
  * The reference does this via reflective dispatch on `pl.Expr`
  * (`getattr(pl.col(c), op)(v)`, reference: src/polars_pipe/core/
  * validation.py:89-116). Scala has no safe reflection over `Column`, so we
  * use an explicit op table — which also gives a checkable, documented
  * operator surface.
  *
  * Null semantics match the reference by construction: a predicate
  * evaluating to NULL (e.g. `bonus > 0` on a null bonus) is neither true nor
  * false; downstream `when(!expr, ...)` treats NULL conditions as
  * not-matched in both engines (SURVEY.md §2.3-6).
  */
object RuleParser {

  /** A compiled, named predicate. */
  final case class NamedRule(name: String, predicate: Column)

  def compile(rules: Seq[RuleSpec]): Seq[NamedRule] =
    rules.map(r => NamedRule(r.name, compileOne(r)))

  def compileOne(r: RuleSpec): Column = {
    val c = col(r.col)
    (r.op, r.value) match {
      // comparisons
      case ("gt", Some(v))  => c > lit(v)
      case ("ge", Some(v))  => c >= lit(v)
      case ("lt", Some(v))  => c < lit(v)
      case ("le", Some(v))  => c <= lit(v)
      case ("eq", Some(v))  => c === lit(v)
      case ("ne", Some(v))  => c =!= lit(v)
      // membership / range
      case ("is_in", Some(vs: Seq[_]))     => c.isin(vs.map(_.asInstanceOf[AnyRef]): _*)
      case ("is_between", Some((lo, hi)))  => c.between(lit(lo), lit(hi))
      case ("is_between", Some(vs: Seq[_])) if vs.size == 2 =>
        c.between(lit(vs.head), lit(vs(1)))
      // null checks (nullary)
      case ("is_not_null", None) => c.isNotNull
      case ("is_null", None)     => c.isNull
      case ("is_not_nan", None)  => !isnan(c)
      case ("is_nan", None)      => isnan(c)
      // boolean passthroughs
      case ("not_", None) => !c
      // string predicates (additive beyond the reference's exercised set)
      case ("str_contains", Some(v: String))    => c.contains(v)
      case ("str_starts_with", Some(v: String)) => c.startsWith(v)
      case ("str_ends_with", Some(v: String))   => c.endsWith(v)
      case ("rlike", Some(v: String))           => c.rlike(v)
      case (op, v) =>
        throw new IllegalArgumentException(s"unknown rule op '$op' (value=$v) for column '${r.col}'")
    }
  }

  /** AND-fold of compiled predicates — the filter stage semantics
    * (reference: core/transform.py:219-229 uses `pl.all_horizontal`). */
  def andAll(rules: Seq[RuleSpec]): Column =
    rules.map(compileOne).reduceOption(_ && _).getOrElse(lit(true))
}
