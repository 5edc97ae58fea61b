package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}
