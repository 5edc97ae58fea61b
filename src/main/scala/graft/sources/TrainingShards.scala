package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deterministic shuffle-and-shard writer — the LAST step of a training
  * data pipeline ("global shuffle, then write N shards"), re-expressed
  * so the shuffle is a pure function of the data:
  *
  *  - Order coordinate `ord` = md5(id): a content-derived hex string
  *    whose sort order is the "random" training order — identical on
  *    any engine, cluster size, or partitioning (a seeded
  *    `orderBy(rand())` reshuffles every run and every retry; this
  *    never does).
  *  - Shard membership = first 8 hex digits of `ord` as an integer,
  *    mod `numShards`: uniform and content-derived, so adding or
  *    removing OTHER rows never moves a row between shards (a
  *    `row_number % N` scheme renumbers everything on any upstream
  *    change).
  *  - Layout: one directory per shard (`partitionBy`), rows inside
  *    sorted by `ord` (the key is written with the data, so a trainer —
  *    or an auditor — can verify the order it streams). Each shard is a
  *    uniform sample of the corpus AND a reproducible sequence.
  *
  * Scale shape: ONE hash exchange on the shard id + an in-partition
  * sort — no global sort, no sampled range boundaries, no driver
  * involvement; `numShards` output tasks each stream one shard.
  */
object TrainingShards {

  /** Content-derived shard id in [0, numShards). */
  def shardId(id: Column, numShards: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")

  /** Content-derived global order key (the "shuffle"). */
  def orderKey(id: Column): Column = md5(id.cast("string"))

  /** Write `df` as `numShards` shard directories under `path`, each
    * internally sorted by the order key. Columns `shard` and `ord` are
    * added (and must not pre-exist — house shadow rule). */
  def writeShards(df: DataFrame, idCol: String, numShards: Int, path: String): Unit = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    Seq("shard", "ord").foreach(n =>
      require(!df.columns.contains(n),
        s"writeShards writes column '$n'; input already has one — rename it first"))
    df.withColumn("shard", shardId(col(idCol), numShards))
      .withColumn("ord", orderKey(col(idCol)))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
  }
}
