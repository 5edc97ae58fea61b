package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and band (range) joins — operators Spark lacks natively,
  * re-expressed as scalable compositions (preference (a) of the build
  * brief: compose existing ops before writing a custom SparkPlan).
  *
  * - [[asOfJoin]]: union-merge + running `last(ignoreNulls)` window. ONE
  *   shuffle, keyed on the join keys; no inequality sort-merge join, no
  *   broadcast of either side. The classic distributed as-of formulation.
  * - [[bandJoin]]: |l - r| <= band via bucket replication: each right row
  *   lands in its bucket plus the two adjacent ones, the join is a plain
  *   hash equi-join on the bucket id, and an exact residual filter prunes
  *   false candidates. Each true pair matches in exactly one replica (the
  *   left row's bucket), so no dedup pass is needed; shuffle volume is
  *   3x right + 1x left, independent of output pair count — the
  *   scale-safe alternative to a theta join.
  */
object TemporalJoins {

  /** For every left row: attach the right row with the greatest
    * `rightTime <= leftTime` (backward, inclusive — DuckDB ASOF JOIN
    * semantics) within the same `keys` group. Right payload columns come
    * back prefixed with `rightPrefix`. Inner semantics: left rows with no
    * prior right row are dropped.
    *
    * Among right rows sharing the exact same (keys, time), the greatest
    * `tieBreak` value wins — deterministic by construction.
    *
    * `tolerance` (polars `join_asof(tolerance=)`): when set, a backward
    * match further than `leftTime - rightTime > tolerance` is rejected —
    * the row is dropped (inner semantics), exactly as if no right row
    * preceded it. Requires numeric time columns (the subtraction); applied
    * as a post-filter on the merged match, so the plan shape is unchanged
    * (one shuffle, one window pass).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Double] = None
  ): DataFrame = {
    val rightPayCols = right.columns.toSeq.filterNot(keys.contains)
    val leftCols = left.columns.toSeq
    val rightPayType =
      right.select(struct(rightPayCols.map(col): _*)).schema.head.dataType
    val leftPayType =
      left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val tieBreakType = right.select(col(tieBreak)).schema.head.dataType

    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        col(tieBreak).as("__tb"),
        lit(0).as("__side"),
        struct(rightPayCols.map(col): _*).as("__p"),
        lit(null).cast(leftPayType).as("__l")): _*)

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(null).cast(tieBreakType).as("__tb"),
        lit(1).as("__side"),
        lit(null).cast(rightPayType).as("__p"),
        struct(leftCols.map(col): _*).as("__l")): _*)

    // right rows order before left rows at equal time (inclusive <=);
    // among equal right times the greatest tieBreak is carried last
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withinTol = tolerance match {
      case None => lit(true)
      // the matched right time rides inside the payload struct; the
      // subtraction is non-negative by construction (rt <= lt in-merge)
      case Some(tol) => col("__t") - col("__m").getField(rightTime) <= lit(tol)
    }
    r2.unionByName(l2)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull && withinTol)
      .select(
        leftCols.map(c => col(s"__l.`$c`").as(c)) ++
          rightPayCols.map(c => col(s"__m.`$c`").as(s"$rightPrefix$c")): _*)
  }

  /** Forward as-of: for every left row, the right row with the SMALLEST
    * `rightTime >= leftTime` (inclusive) in the same key group — the
    * backward merge run on the negated time axis. Time columns must be
    * numeric (negation-ordered); among equal right times the greatest
    * `tieBreak` wins. */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Double] = None
  ): DataFrame = {
    val l2 = left.withColumn(leftTime, -col(leftTime))
    val r2 = right.withColumn(rightTime, -col(rightTime))
    // tolerance passes through unchanged: on the negated axis the merge's
    // (-lt) - (-rt) = rt - lt is exactly the forward distance
    asOfJoin(l2, r2, keys, leftTime, rightTime, tieBreak, rightPrefix, tolerance)
      .withColumn(leftTime, -col(leftTime))
      .withColumn(s"$rightPrefix$rightTime", -col(s"$rightPrefix$rightTime"))
  }

  /** Nearest as-of (polars `join_asof(strategy="nearest")`): for every
    * left row, the right row minimizing |rightTime − leftTime| within the
    * key group; an exact distance TIE prefers the BACKWARD (earlier) row.
    * Optional `tolerance` rejects matches farther than it on either side.
    * Inner semantics: left rows with no in-tolerance right row drop.
    *
    * Shape: the same union-merge as [[asOfJoin]] — ONE shuffle on the
    * keys, then TWO running-window passes (a running `last` looking back
    * on the ascending sort, a running `min(struct)` on the DESCENDING
    * sort standing in for the forward look — both
    * UnboundedPreceding..CurrentRow frames Spark maintains incrementally,
    * O(n log n) total; never an UnboundedFollowing frame, which WindowExec
    * re-aggregates per row, O(n²)/key), a per-row distance comparison,
    * zero joins. Equal-time rights sort BEFORE left rows, so the backward
    * leg owns time ties (distance 0 — nearest by definition); the forward
    * leg is strictly-greater times only.
    *
    * Both time columns AND `tieBreak` must be numeric: the forward leg
    * picks its candidate with a lexicographic `min(struct(t, -tb, p))`,
    * so the greatest-tieBreak-wins convention of [[asOfJoin]] holds on
    * both legs. */
  def asOfJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Double] = None
  ): DataFrame = {
    val rightPayCols = right.columns.toSeq.filterNot(keys.contains)
    val leftCols = left.columns.toSeq
    val rightPayType =
      right.select(struct(rightPayCols.map(col): _*)).schema.head.dataType
    val leftPayType =
      left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val tieBreakType = right.select(col(tieBreak)).schema.head.dataType

    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("double").as("__t"),
        col(tieBreak).as("__tb"),
        lit(0).as("__side"),
        struct(rightPayCols.map(col): _*).as("__p"),
        lit(null).cast(leftPayType).as("__l")): _*)
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("double").as("__t"),
        lit(null).cast(tieBreakType).as("__tb"),
        lit(1).as("__side"),
        lit(null).cast(rightPayType).as("__p"),
        struct(leftCols.map(col): _*).as("__l")): _*)

    val ord = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_last)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward leg on the REVERSED sort: a running min over
    // UnboundedPreceding..CurrentRow, which Spark maintains incrementally
    // (O(n) per key group). The naive formulation — min over
    // rowsBetween(1, unboundedFollowing) on the ascending sort — is an
    // UnboundedFollowing frame that WindowExec re-aggregates from scratch
    // for EVERY row: O(n²) on a hot key, a 100 TB scale-killer
    // (PlanQualitySpec pins the q105 plan frame-shape). Membership is
    // identical: descending by (t, side), a left row's preceding rows are
    // exactly the strictly-greater (t, side) rows — equal-time rights
    // sort side-desc AFTER the left row, so they stay with the backward
    // leg (time ties are distance 0 there by definition). The current
    // (left) row itself contributes null through the side guard.
    val fwd = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").desc, col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // forward candidate: lexicographic min over (t, -tb, payload) of the
    // strictly-later right rows = smallest time, then greatest tieBreak —
    // the aggregate min skips the nulls left rows contribute (frame
    // membership is order-reversed but min() is order-insensitive)
    val fwdCand = min(when(col("__side") === 0,
      struct(col("__t").as("t"), (-col("__tb").cast("double")).as("ntb"), col("__p").as("p"))))

    // backward candidate must be NULL on left rows (a struct of null
    // fields is still non-null, so wrap in a side guard before last())
    val backCand = last(when(col("__side") === 0,
      struct(col("__t").as("t"), col("__p").as("p"))), ignoreNulls = true)

    val merged = r2.unionByName(l2)
      .withColumn("__mb", backCand.over(back))
      .withColumn("__mf", fwdCand.over(fwd))
      .filter(col("__side") === 1)

    val bDist = col("__t") - col("__mb").getField("t")
    val fDist = col("__mf").getField("t") - col("__t")
    val tol = tolerance.map(lit).getOrElse(lit(Double.MaxValue))
    val bOk = col("__mb").isNotNull && bDist <= tol
    val fOk = col("__mf").isNotNull && fDist <= tol
    // exact-distance tie -> backward
    val chosen = when(bOk && (!fOk || bDist <= fDist), col("__mb").getField("p"))
      .when(fOk, col("__mf").getField("p"))

    merged
      .withColumn("__m", chosen)
      .filter(col("__m").isNotNull)
      .select(
        leftCols.map(c => col(s"__l.`$c`").as(c)) ++
          rightPayCols.map(c => col(s"__m.`$c`").as(s"$rightPrefix$c")): _*)
  }

  /** Pairs with |leftVal - rightVal| <= band (numeric columns, band > 0):
    * bucketed candidate generation + exact residual filter. Right columns
    * come back prefixed. */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftVal: String,
      rightVal: String,
      band: Long,
      rightPrefix: String = "r_"
  ): DataFrame = {
    require(band > 0, "band must be positive")
    val lb = left.withColumn("__bucket", floor(col(leftVal) / band.toDouble).cast("long"))
    val rb = right
      .withColumn("__shift", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket",
        floor(col(rightVal) / band.toDouble).cast("long") + col("__shift"))
      .drop("__shift")
    val renamed = right.columns.foldLeft(rb) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    lb.join(renamed, Seq("__bucket"))
      .filter(abs(col(leftVal) - col(s"$rightPrefix$rightVal")) <= band)
      .drop("__bucket")
  }
}
