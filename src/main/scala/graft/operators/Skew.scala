package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join handling (on by default) rebalances SORT-MERGE join
  * partitions at runtime, but two shapes still need explicit salting:
  *
  *  - aggregation skew: one giant group funnels into a single reducer —
  *    [[saltedAgg]] splits each group into `saltBuckets` subgroups
  *    (phase 1) and merges the partials (phase 2), bounding any single
  *    task's input at 1/saltBuckets of the hottest key;
  *  - replicated ("salted") joins where the dimension is too big to
  *    broadcast and the fact side has hot keys — [[saltedJoin]] spreads
  *    each hot fact key over `saltBuckets` partitions and replicates the
  *    dimension rows to every bucket.
  *
  * Results are identical to the unsalted equivalents (verified by spec);
  * salt assignment is `pmod(xxhash64(all columns), saltBuckets)` — a pure
  * function of row CONTENT. A positional or random salt
  * (`monotonically_increasing_id`, `rand`) is the classic SPARK-23207
  * hazard: it is nondeterministic across partial shuffle-stage retries, so
  * on task recomputation rows re-salt differently and get duplicated or
  * lost across reducers. Content-derived salt re-hashes identically on
  * retry. Identical rows share a bucket, which only narrows the spread
  * when one (key, exact-row) pair dominates — acceptable for correctness
  * under retry, which a salt must guarantee first.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): content hash of every
    * HASHABLE column. Spark's hash expressions reject MapType (element
    * order is undefined), so map columns — including maps nested in
    * structs/arrays — are excluded; if literally every column contains a
    * map, their deterministic json encoding is hashed instead. */
  private def contentSalt(df: DataFrame, buckets: Int): Column = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    require(df.columns.nonEmpty, "cannot salt a zero-column frame")
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val inputs: Seq[Column] =
      if (cols.nonEmpty) cols.toSeq
      else df.schema.fields.map(f => to_json(struct(col(f.name)))).toSeq
    pmod(xxhash64(inputs: _*), lit(buckets.toLong))
  }

  /** Two-phase (salted) aggregation. `partialAggs` run per
    * (keys, salt) subgroup; `finalAggs` merge the aliased partials per key.
    *
    * {{{
    * Skew.saltedAgg(df, Seq("k"), 16)(
    *   partialAggs = Seq(count(lit(1)).as("c"), sum($"v").as("s")),
    *   finalAggs   = Seq(sum($"c").as("n"), sum($"s").as("total")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]
  ): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    df.withColumn("__salt", contentSalt(df, saltBuckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-safe equi-join: the (big, possibly hot-keyed) left side gets a
    * random-ish salt; the right side is replicated across all salt values.
    * Inner join on keys + salt; output == plain inner join on keys. Right
    * side grows saltBuckets-fold — keep it the smaller input. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int
  ): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val bigS = big.withColumn("__salt", contentSalt(big, saltBuckets))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
