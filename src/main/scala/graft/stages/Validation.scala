package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.config.GeneralConfig
import graft.expr.RuleParser

/** Schema expectation analysis + the valid/invalid row split
  * (SURVEY.md §2.1, S2/S3/S6/S7).
  */
object Validation {

  val ErrorReasonCol = "error_reason"

  // S2 -------------------------------------------------------------------
  /** Static config analysis -> the set of columns the INPUT must already
    * have (reference: core/validation.py:12-72). Collects every column the
    * config touches, reverse-applies the rename map (a post-rename name in a
    * later stage maps back to its pre-rename source, validation.py:52-54)
    * and excludes to-be-derived columns (validation.py:57). Pure function
    * over the config — no Spark involved.
    */
  def extractExpectedCols(cfg: GeneralConfig): Set[String] = {
    val t = cfg.transformations
    val derived = t.newColMap.map(_._1).toSet
    val reverseRename = t.renameMap.map { case (from, to) => to -> from }.toMap

    val mentioned: Seq[String] =
      cfg.validation.map(_.col) ++
        t.filterRules.map(_.col) ++
        t.fillMap.map(_._1) ++
        t.recastMap.map(_._1) ++
        t.clipMap.map(_._1) ++
        t.renameMap.map(_._1) ++
        t.dedupeCols.filterNot(_ == "*") ++
        t.unnestCols ++
        t.nestCols.flatMap(_._2) ++
        t.dropCols ++
        t.newColMap.flatMap { case (_, spec) =>
          spec.kwargs.get("col").map(_.toString).toSeq ++
            (spec.kwargs.get("cols") match {
              case Some(s: Seq[_]) => s.map(_.toString)
              case _ => Nil
            })
        } ++
        (cfg.selectCols match {
          case Seq("*") => Nil
          case cols => cols
        })

    mentioned
      .map(n => reverseRename.getOrElse(n, n))
      .filterNot(derived.contains)
      .filterNot(_.startsWith(Transforms.SysColPrefix))
      .toSet
  }

  // S3 -------------------------------------------------------------------
  /** Assert required columns present (reference: core/validation.py:75-86).
    * Only probes `df.columns` — Catalyst analysis, no data read. */
  def checkExpectedCols(expected: Set[String])(df: DataFrame): DataFrame = {
    val missing = (expected -- df.columns.toSet).toSeq.sorted
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"input is missing expected columns: ${missing.mkString(", ")}")
    df
  }

  // S6 + S7 --------------------------------------------------------------
  /** Valid/invalid split.
    *
    * `error_reason` = comma-joined names of failed rules. The reference
    * builds it via `when(~expr, name).otherwise("")` concat + strip
    * (core/validation.py:119-148); we get identical semantics from
    * `concat_ws(",", when(!expr, name)...)` — `concat_ws` skips NULLs, and a
    * rule evaluating to NULL (e.g. `bonus > 0` on null bonus) yields a NULL
    * `when` branch, i.e. the row is NOT flagged — matching the reference's
    * null behavior by construction (SURVEY.md §2.3-6).
    *
    * Spark has no multi-output operator, so the split is two filters over
    * one frame; the caller should `persist()` the annotated frame before
    * consuming both branches (the pipeline does — SURVEY.md §2.3-5 names
    * this an intentional improvement over the reference's recomputation).
    */
  def withErrorReason(rules: Seq[RuleParser.NamedRule])(df: DataFrame): DataFrame = {
    val reason =
      if (rules.isEmpty) lit("")
      else concat_ws(",", rules.map(r => when(!r.predicate, lit(r.name))): _*)
    df.withColumn(ErrorReasonCol, reason)
  }

  /** (valid — `error_reason` dropped, invalid — `error_reason` kept). */
  def split(annotated: DataFrame): (DataFrame, DataFrame) = {
    val valid = annotated.filter(col(ErrorReasonCol) === "").drop(ErrorReasonCol)
    val invalid = annotated.filter(col(ErrorReasonCol) =!= "")
    (valid, invalid)
  }
}
