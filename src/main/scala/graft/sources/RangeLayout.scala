package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Range-sorted parquet layout: the row-group data-skipping complement to
  * directory partition pruning ([[graft.queries.Queries]] q76) and bucketed
  * co-location ([[Bucketing]]).
  *
  * `repartitionByRange` + `sortWithinPartitions` clusters the layout key so
  * each parquet file (and each row group inside it) covers a NARROW
  * min/max span of the key. A later scan with a predicate on that key then
  * skips whole row groups from footer statistics alone — at 100 TB this is
  * the difference between touching every file of a fact table and touching
  * the ~1/N slice a time-range query actually needs, with zero catalog
  * metadata (the stats live in the parquet footers; any reader benefits).
  * Directory partitioning cannot express this for high-cardinality or
  * continuous keys (one dir per distinct timestamp is a small-files
  * disaster); range-clustering is the standard layout for those.
  *
  * LayoutSpec measures the effect directly: the filtered scan's
  * materialized-row metric on a range-sorted layout is a fraction of the
  * same scan on the identical rows laid out hash-shuffled.
  *
  * The range exchange samples partition bounds (reservoir sample per input
  * partition, fixed seed) — bounds, and therefore FILE boundaries, can
  * shift if the input's partitioning shifts; row CONTENT of the layout is
  * always the full input, so query results over it are layout-independent.
  */
object RangeLayout {

  /** Write `df` range-clustered by `sortCols` into ~`numFiles` files.
    * One file per range partition (each task writes its sorted slice). */
  def writeRangeSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      numFiles: Int
  ): Unit = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Z-order (Morton-curve) layout: multi-column data skipping, where
    * single-key range clustering cannot help the SECOND predicate column.
    *
    * A range layout on `x` gives every file a narrow `x` span but the full
    * `y` span — a `y` predicate materializes everything. Interleaving the
    * bits of rank-quantized `x` and `y` into one z-value and range-sorting
    * on THAT gives every file a narrow span in EVERY interleaved column
    * (a contiguous z interval is a small hyper-rectangle stack), so each
    * column's own parquet min/max footer stats stay tight and predicates
    * on ANY of the z-columns skip row groups. This is the public
    * OPTIMIZE-ZORDER technique (Delta Lake / Databricks docs; Morton 1966);
    * at 100 TB it is the difference between one clustered dimension and
    * 2-3 of them sharing one layout.
    *
    * Rank quantization (quantile breakpoints, not min/max linear scaling)
    * makes the curve skew-proof: each of the `2^bits` buckets per column
    * holds ~equal row counts whatever the value distribution. Breakpoints
    * come from one `percentile_approx` pass (EAGER — building the plan
    * runs that aggregation; the collected breakpoints are `cols × 255`
    * doubles, driver-bounded). Null ranks as bucket 0 (nulls-first).
    *
    * Layout-only, like [[writeRangeSorted]]: row CONTENT is the full
    * input — query results over the layout are layout-independent; the
    * z column itself is dropped before the write. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 8
  ): Unit = {
    require(zCols.size >= 2,
      s"z-ordering needs >= 2 columns (use writeRangeSorted for 1), got $zCols")
    require(bits >= 1 && bits * zCols.size <= 62,
      s"bits * cols must fit a long: $bits x ${zCols.size}")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val zc = "__z"
    require(!df.columns.contains(zc), s"input already has a '$zc' column")
    df.withColumn(zc, zValue(df, zCols, bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** The interleaved z-value as a Column (exposed for LayoutSpec and for
    * callers that want to cluster by z inside a bigger pipeline). EAGER:
    * runs the breakpoint aggregation on `df`. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column = {
    val nBuckets = 1 << bits
    val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val qArr = array(qs.map(lit): _*)
    // rank coordinate per column: timestamps/dates through their epoch-µs
    // line (TIMESTAMP_NTZ wall-clock included — rank only needs a
    // monotonic map, so the tz interpretation is irrelevant), everything
    // else via a plain double cast
    def coord(c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.DateType =>
        unix_micros(col(c).cast("timestamp")).cast("double")
      case _ => col(c).cast("double")
    }
    // one pass computes every column's breakpoints together
    val row = df.agg(
      percentile_approx(coord(zCols.head), qArr, lit(10000)).as(zCols.head),
      zCols.tail.map(c =>
        percentile_approx(coord(c), qArr, lit(10000)).as(c)): _*
    ).head()
    val d = zCols.size
    val terms = zCols.zipWithIndex.flatMap { case (c, j) =>
      val breaks = Option(row.getSeq[Double](row.fieldIndex(c)))
        .getOrElse(Seq.empty).distinct.sorted
      // bucket = #breaks <= v, folded over the literal breakpoint array;
      // null v compares to null -> 0 contribution -> bucket 0
      val bucket = aggregate(
        array(breaks.map(lit): _*), lit(0L),
        (acc, b) => acc + when(coord(c) >= b, 1L).otherwise(0L))
      // bit i of column j lands at z-bit i*d + j (column 0 most significant
      // within each bit plane, so earlier zCols dominate file boundaries)
      (0 until bits).map { i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)), i * d + (d - 1 - j))
      }
    }
    terms.reduce(_ + _).as("__z")
  }
}
