package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction: rewrite a fragmented directory into ~target-size
  * files WITHOUT a shuffle.
  *
  * The small-files problem is the standing ops hazard of any long-lived
  * 100 TB table: streaming micro-batches, per-partition appends, and
  * over-parallel writers each leave thousands of KB-scale files, and every
  * later scan pays per-file open/footer/seek costs plus scheduler pressure
  * (task-per-file floors). Compaction is the maintenance pass that merges
  * them back to the parquet sweet spot (~128 MB-1 GB).
  *
  * Shape: list the directory's data files (driver-side metadata only —
  * one FileStatus per file, no data reads), size the output as
  * `ceil(totalBytes / targetBytes)`, then `read -> coalesce(n) -> write`.
  * `coalesce` merges scan partitions without an exchange — each output
  * task streams several input files end-to-end — so the job is pure
  * IO: no shuffle, no sort, no wide dependency (CompactionSpec pins the
  * exchange-free plan). Combined with the read side's
  * `spark.sql.files.maxPartitionBytes` split packing, input file count
  * does not affect the plan shape, only the listing.
  *
  * If the table should ALSO be clustered, compact through
  * [[RangeLayout.writeRangeSorted]]/[[RangeLayout.writeZOrdered]] instead —
  * those pay one range exchange to buy data skipping; this operator is the
  * cheap path for already-acceptable layouts.
  *
  * Output size is approximate: parquet re-encodes (dictionary/RLE reset
  * per file), so output bytes can differ from input bytes by the
  * re-compression delta. The target bounds file COUNT from input bytes,
  * which is the metric that hurts.
  */
object Compaction {

  /** What a compaction run did — returned so maintenance jobs can log and
    * alert on fragmentation trends. */
  final case class CompactionReport(
      inputFiles: Int,
      inputBytes: Long,
      outputFiles: Int)

  /** List the directory's visible data files (skips `_SUCCESS`, metadata
    * and dot-files), recursively. Driver-bounded: one FileStatus per file. */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        buf += ((st.getPath.toString, st.getLen))
    }
    buf.toSeq
  }

  /** Compact `inPath`'s parquet files into `outPath` at ~`targetBytes` per
    * file. `inPath` and `outPath` must differ: the read is lazy, so an
    * in-place rewrite would delete its own input mid-scan. */
  def compactParquet(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long
  ): CompactionReport = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(new Path(inPath) != new Path(outPath),
      "in-place compaction would delete its own lazy-scan input; write to a new path")
    val files = dataFiles(spark, inPath)
    require(files.nonEmpty, s"no data files under $inPath")
    val totalBytes = files.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    CompactionReport(files.size, totalBytes, dataFiles(spark, outPath).size)
  }
}
