package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Ordered per-key time-series operators that need a running SCAN rather
  * than a window: Spark window frames re-aggregate the frame per row, so
  * an unbounded exponential decay through them is O(n²) per key — the
  * 100 TB anti-pattern. These run as ONE hash shuffle on the key plus an
  * in-partition sort, then a single O(n) pass with three scalars of state;
  * keys are contiguous after the sort so state resets at each key change.
  * (Reference scope: the `ewm_*` family of the polars Expr surface the
  * derive registry mirrors — frame-level here because a running recurrence
  * is imperative by nature; no Column composition expresses it in O(n).)
  */
object TimeSeries {

  /** Exponentially-weighted moving mean per key (polars `ewm_mean` with
    * `adjust=true`): m_i = Σ_{j<=i} (1-α)^(i-j) x_j / Σ_{j<=i} (1-α)^(i-j),
    * computed by the O(n) recurrence num_i = x_i + (1-α)·num_{i-1},
    * den_i = 1 + (1-α)·den_{i-1} over rows ordered by `ordCols` within
    * `keyCol` (make the ordering unique — include a tie-break id — or the
    * result is nondeterministic, like any ordered window).
    *
    * Null values yield a null output and do NOT advance the decay (the
    * series behaves as if the null row were absent — polars
    * `ignore_nulls=true` semantics). `valCol` must already be DoubleType;
    * cast at the call site so the output schema is explicit.
    *
    * This is a justified `mapPartitions` (same class as the multimodal
    * codec seam): partition-preserving after its single shuffle, per-key
    * state is three scalars, no driver involvement, no window
    * re-aggregation. */
  def ewmMean(
      df: DataFrame,
      keyCol: String,
      ordCols: Seq[String],
      valCol: String,
      alpha: Double,
      outCol: String = "ewm_mean"
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(df.schema(valCol).dataType == DoubleType,
      s"ewmMean: '$valCol' must be DoubleType (cast at the call site), " +
        s"got ${df.schema(valCol).dataType.simpleString}")
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val valIdx = df.schema.fieldIndex(valCol)
    val decay = 1.0 - alpha
    df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: ordCols).map(col): _*)
      .mapPartitions { rows =>
        // contiguous-key scan: state lives across rows of one key only
        var started = false
        var curKey: Any = null
        var num = 0.0
        var den = 0.0
        rows.map { r =>
          val k = r.get(keyIdx)
          if (!started || k != curKey) {
            started = true; curKey = k; num = 0.0; den = 0.0
          }
          val out: Any =
            if (r.isNullAt(valIdx)) null
            else {
              num = r.getDouble(valIdx) + decay * num
              den = 1.0 + decay * den
              num / den
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }(Encoders.row(outSchema))
  }
}
