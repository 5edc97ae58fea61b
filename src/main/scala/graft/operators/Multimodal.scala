package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * `mapPartitions` transform, batch shape. TWO codec paths share that seam:
  * [[decodeImagesReal]] is a REAL image decoder built on `javax.imageio`
  * (JDK built-in — PNG/JPEG/BMP/GIF, no external native libs), and
  * [[decodeImages]] keeps the original deterministic STUB for payloads
  * that aren't actual images (the synthetic test corpus) and for hermetic
  * tests that must not depend on codec behavior. Audio/video decode remains
  * stubbed ([[sampleFrames]]) — no codec for those ships with the JDK.
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

  /** STUB CODEC — deterministic fake that accepts ANY payload (the
    * synthetic corpus stores text bytes, not images). Derives plausible
    * dimensions and a mean intensity from the payload bytes so downstream
    * plumbing (schema, partitioning, aggregation) is fully exercised and
    * testable independent of codec behavior. The REAL decoder is
    * [[imageIoDecode]] / [[decodeImagesReal]]. */
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

  /** Decode bomb guard: a malformed-or-hostile header can declare huge
    * dimensions from a tiny payload; `ImageIO.read` would allocate the
    * full raster and OOM the executor. 64 MP (≈256 MB as INT_RGB) is far
    * above any legitimate crawl thumbnail and far below executor heap. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Byte-estimate companion to [[MaxDecodePixels]]: the pixel cap alone
    * assumes ~4 B/pixel, but a hostile header can declare a 16-bit
    * multi-band or float sample model whose raster allocates several times
    * that at the same pixel count — so the estimated raster BYTES
    * (pixels x bits-per-pixel from the header's ImageTypeSpecifier, still
    * no raster allocated) are bounded too. 256 MB = the old implicit
    * ceiling (64 MP x 4 B), now enforced for every sample model. */
  val MaxDecodeBytes: Long = 256L * 1024 * 1024

  /** Pure admission predicate for a declared image header: positive dims,
    * pixel count under `maxPixels`, AND estimated raster bytes (pixels x
    * bits-per-pixel) under [[MaxDecodeBytes]]. Factored out of
    * [[imageIoDecode]] so the byte bound is testable without crafting a
    * 300 MB fixture. */
  private[graft] def headerAdmissible(
      w: Int, h: Int, bitsPerPixel: Int, maxPixels: Long = MaxDecodePixels): Boolean =
    w > 0 && h > 0 && w.toLong * h <= maxPixels &&
      w.toLong * h * math.max(1, bitsPerPixel) / 8 <= MaxDecodeBytes

  /** REAL image decode via `javax.imageio` (JDK built-in): dimensions,
    * raster band count, and mean sample intensity over every (pixel, band).
    * Returns None for payloads no registered reader accepts — callers
    * choose drop vs mark. Pure JVM, no native libs, safe on executors
    * (ImageIO never needs a display).
    *
    * Poisoned-record safety (one bad record must not kill a curation job):
    *   - dimensions are PEEKED from the reader header before any raster
    *     allocation; images over `maxPixels` are rejected un-decoded
    *     (decompression-bomb guard);
    *   - ANY non-fatal throw is treated as undecodable — ImageIO plugin
    *     readers are known to throw RuntimeExceptions (ArrayIndexOutOf-
    *     Bounds, IllegalArgument, NegativeArraySize) on malformed-but-
    *     recognized payloads, not just IOException;
    *   - palette-indexed images (GIF, palette PNG) are converted through
    *     their ColorModel to RGB before sampling — raw raster samples
    *     there are palette INDICES, and a mean index is not an intensity.
    *     Converted images therefore report channels=3. */
  def imageIoDecode(id: Long, content: Array[Byte],
      maxPixels: Long = MaxDecodePixels): Option[ImageFeatures] = {
    if (content.isEmpty) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only peek: no raster exists yet, so a bomb's declared
            // dims cost nothing to inspect
            val (w, h) = (reader.getWidth(0), reader.getHeight(0))
            // bits-per-pixel from the declared sample model (raw type when
            // the plugin exposes it, else the first decode target); 32 is
            // the conservative INT_RGB fallback when neither is available
            val bpp =
              try {
                Option(reader.getRawImageType(0))
                  .orElse {
                    val it = reader.getImageTypes(0)
                    if (it != null && it.hasNext) Option(it.next()) else None
                  }
                  .map(_.getColorModel.getPixelSize)
                  .filter(_ > 0)
                  .getOrElse(32)
              } catch { case scala.util.control.NonFatal(_) => 32 }
            if (!headerAdmissible(w, h, bpp, maxPixels)) None
            else Option(reader.read(0)).map(rasterFeatures(id, _))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mean-intensity features over a decoded image; indexed color models
    * are rerouted through an RGB copy first (see [[imageIoDecode]]). */
  private def rasterFeatures(id: Long, decoded: java.awt.image.BufferedImage): ImageFeatures = {
    val img = decoded.getColorModel match {
      case _: java.awt.image.IndexColorModel =>
        val conv = new java.awt.image.BufferedImage(
          decoded.getWidth, decoded.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = conv.createGraphics()
        try g.drawImage(decoded, 0, 0, null) finally g.dispose()
        conv
      case _ => decoded
    }
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    var sum = 0.0
    var b = 0
    while (b < bands) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSampleDouble(x, y, b); x += 1 }
        y += 1
      }
      b += 1
    }
    ImageFeatures(id, w, h, bands, sum / (w.toLong * h * bands))
  }

  /** [[decodeImages]] with the REAL `javax.imageio` codec: same
    * partition-preserving per-partition batch seam, rows whose payload no
    * reader accepts are DROPPED (undecodable crawl bytes are discard-not-
    * crash at curation scale; count in.count - out.count to observe). */
  def decodeImagesReal(df: DataFrame, idCol: String, contentCol: String): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(contentCol).cast(BinaryType))
      .mapPartitions { rows =>
        // per-partition codec context: no temp-file cache on executors
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          if (r.isNullAt(1)) None
          else imageIoDecode(r.getLong(0), r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Deterministic grayscale-PNG fixture generator: one `w x h` constant-
    * intensity image per input row, with w/h/intensity pure functions of
    * the id — so a SQL oracle can predict every decoded feature without
    * seeing the bytes. Runs on executors through the same per-partition
    * codec seam as decode (encode IS a codec). Fixture math:
    * w = 8 + id%9, h = 8 + (3*id)%9, intensity = (37*id)%256. */
  def synthesizeGrayPngs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val w = 8 + (id % 9).toInt
          val h = 8 + ((3 * id) % 9).toInt
          val g = ((37 * id) % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, g); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }
      .toDF(idCol, "content")
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
