package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal (binary) column processing — the training-data-pipeline
 * stage that treats images/audio/video as opaque `binary` columns
 * with typed metadata. IMAGE decode is REAL (the JDK ships PNG/JPEG
 * codecs via javax.imageio — the same path `RasterIO.readImageRaster`
 * uses): [[decodeImageFeatures]] decodes blobs to pixel statistics,
 * and the `media_image_decode` query round-trips deterministic
 * synthetic PNGs through encode -> binary column -> decode with a
 * DuckDB oracle computing the same statistics from the pixel formula
 * (PNG is lossless, so the oracle verifies the whole codec cycle).
 * AUDIO/VIDEO decoding has no in-container codec, so that step stays
 * a clearly-marked deterministic stub ([[stubDecode]]); everything
 * around it — the batched partition processing, the typed feature
 * schema, the partition-preserving plan shape — is the real engine
 * surface and is tested.
 *
 * At cluster scale this is the Scala analogue of a Pandas-UDF
 * `mapInPandas` stage: one JVM-side batch loop per partition, no
 * per-row UDF dispatch, output schema declared up front.
 */
object Multimodal {

  /** Deterministic W x H grayscale test card: pixel (x, y) of image
    * `id` has gray = (id*31 + x*7 + y*13) mod 256 in all channels —
    * the same closed form the DuckDB oracle evaluates. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded per-image features. */
  case class ImageFeatures(id: Long, width: Int, height: Int,
                           gray_sum: Long)

  /** REAL image decode (JDK PNG/JPEG codec), batched per partition:
    * (id, img: binary) -> (id, width, height, sum of the red channel
    * over all pixels — an exact integer, so the oracle compare is
    * bit-free). Undecodable blobs are dropped (None from ImageIO). */
  def decodeImageFeatures(df: DataFrame): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("img")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val im = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (im == null) None
          else {
            val (w, h) = (im.getWidth, im.getHeight)
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                s += (im.getRGB(x, y) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            Some(ImageFeatures(id, w, h, s))
          }
        }
      }
  }

  /** Typed feature row produced per media blob. */
  case class MediaFeatures(
      url: String,
      n_bytes: Long,
      sha_prefix: Long,       // first 8 bytes of sha-256, big-endian
      byte_entropy: Double,   // Shannon entropy of the byte histogram
      head_hist: Array[Long]) // 16-bucket histogram of the first 4 KiB

  /**
   * STUB DECODER — stands in for image/audio decoding (no codecs in
   * this container). Deterministic pure function of the bytes:
   * byte-level statistics instead of pixels/samples. The real
   * deployment swaps this body for the codec call; the signature and
   * everything downstream stay identical.
   */
  def stubDecode(bytes: Array[Byte]): (Double, Array[Long]) = {
    val hist = new Array[Long](16)
    val n = math.min(bytes.length, 4096)
    var i = 0
    while (i < n) {
      hist((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    var entropy = 0.0
    if (n > 0) {
      var b = 0
      while (b < 16) {
        if (hist(b) > 0) {
          val p = hist(b).toDouble / n
          entropy -= p * (math.log(p) / math.log(2.0))
        }
        b += 1
      }
    }
    (entropy, hist)
  }

  /**
   * Batched feature extraction over (url, blob) rows: one pass per
   * partition, digest reused across rows (the mapInPandas batch
   * shape). Input df needs (url: String, html: binary).
   */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (url, bytes) =>
          md.reset()
          val sha = md.digest(bytes)
          val shaPrefix = java.nio.ByteBuffer.wrap(sha, 0, 8).getLong
          val (entropy, hist) = stubDecode(bytes)
          MediaFeatures(url, bytes.length.toLong, shaPrefix,
            entropy, hist)
        }
      }
  }
}
