package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-facing typed aggregators (`Aggregator[IN, BUF, OUT]`) — the
  * Spark-native UDAF surface the reference's capability model maps onto
  * (SURVEY.md §2.4: the reference's analogue is frame-level custom
  * transformations; these are the row-level aggregation counterpart).
  *
  * Aggregators merge partial buffers map-side like any built-in aggregate,
  * so they scale identically to `sum`/`avg` — no per-group row collection.
  */
object TypedAggregators {

  /** Weighted mean: sum(w*x)/sum(w); null inputs are skipped (matching
    * built-in sum/avg) and a zero total weight yields null. */
  val weightedMean: Aggregator[(java.lang.Double, java.lang.Double), (Double, Double), java.lang.Double] =
    new Aggregator[(java.lang.Double, java.lang.Double), (Double, Double), java.lang.Double] {
      def zero: (Double, Double) = (0.0, 0.0)
      def reduce(b: (Double, Double), in: (java.lang.Double, java.lang.Double)): (Double, Double) =
        if (in._1 == null || in._2 == null) b
        else (b._1 + in._1 * in._2, b._2 + in._2)
      def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Double)): java.lang.Double =
        if (b._2 == 0.0) null else java.lang.Double.valueOf(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Double)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  private val boxedPairEncoder: Encoder[(java.lang.Double, java.lang.Double)] =
    Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE)

  /** Column form for DataFrame use: weighted_mean(value, weight). */
  def weightedMeanCol(value: Column, weight: Column): Column =
    udaf(weightedMean, boxedPairEncoder).apply(value, weight)

  /** Geometric mean via log-sum — numerically stable for large groups;
    * null and non-positive inputs are skipped. */
  val geometricMean: Aggregator[java.lang.Double, (Double, Long), java.lang.Double] =
    new Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
        if (x != null && x > 0) (b._1 + math.log(x), b._2 + 1) else b
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): java.lang.Double =
        if (b._2 == 0) null else java.lang.Double.valueOf(math.exp(b._1 / b._2))
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  def geometricMeanCol(value: Column): Column =
    udaf(geometricMean, Encoders.DOUBLE).apply(value)
}
