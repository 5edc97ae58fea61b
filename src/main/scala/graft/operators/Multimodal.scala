package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * `mapPartitions` transform, batch shape — while the actual codec step is
  * STUBBED with a deterministic fake (no image/audio libraries in this
  * container). The stub is clearly marked; swapping in a real decoder means
  * replacing ONE function body, nothing structural.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("content_md5", StringType)
  ))

  /** Wrap a binary column with its metadata struct — the canonical
    * multimodal ingestion shape: (id, content: binary, meta: struct). */
  def attachMeta(df: DataFrame, contentCol: String, mediaType: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mediaType).as("media_type"),
      octet_length(col(contentCol)).cast(LongType).as("n_bytes"),
      md5(col(contentCol)).as("content_md5")))

  /** Decoded-image feature schema produced by [[decodeImages]]. */
  final case class ImageFeatures(
      id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** STUB CODEC — deterministic fake in place of a real image decode
    * (libjpeg/Pillow/javax.imageio are not available in this container).
    * Derives plausible dimensions and a mean intensity from the payload
    * bytes so downstream plumbing (schema, partitioning, aggregation) is
    * fully exercised and testable. Replace this body with the real decoder
    * to go live. */
  private def fakeDecode(id: Long, content: Array[Byte]): ImageFeatures = {
    val n = content.length
    val sum = content.foldLeft(0L)((a, b) => a + (b & 0xff))
    ImageFeatures(
      id = id,
      width = 64 + (n % 576), // 64..639
      height = 64 + ((n * 31) % 576),
      channels = 3,
      mean_intensity = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Per-partition batch decode: the executor-side pattern a real codec
    * needs (codec context initialized once per partition, rows streamed
    * through it — the Scala analogue of `mapInPandas` batch processing).
    * Partition-preserving: no shuffle, scales linearly with executors. */
  def decodeImages(df: DataFrame, idCol: String, contentCol: String): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
      .mapPartitions { rows =>
        // real codec would allocate its context here, once per partition
        rows.map { r =>
          val id = r.getLong(0)
          val content = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          fakeDecode(id, content)
        }
      }
  }

  /** Frame-sampling stub for video-like payloads: cut the byte stream into
    * fixed-size "frames" and keep every `stride`-th — exercises the
    * explode/posexplode shape a real frame sampler produces. Pure column
    * expressions (no UDF). */
  def sampleFrames(df: DataFrame, contentCol: String, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col(contentCol)).cast("double") / frameBytes).cast("int")
    df.withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1)).otherwise(array())))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
      .withColumn("frame",
        col(contentCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
  }
}
