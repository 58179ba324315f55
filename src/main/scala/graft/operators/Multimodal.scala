package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal (binary) column processing — the training-data-pipeline
 * stage that treats images/audio/video as opaque `binary` columns
 * with typed metadata. The container ships no image/audio codecs, so
 * the DECODE step is a clearly-marked deterministic stub
 * ([[stubDecode]]); everything around it — the batched partition
 * processing, the typed feature schema, the partition-preserving plan
 * shape — is the real engine surface and is tested.
 *
 * At cluster scale this is the Scala analogue of a Pandas-UDF
 * `mapInPandas` stage: one JVM-side batch loop per partition, no
 * per-row UDF dispatch, output schema declared up front.
 */
object Multimodal {

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
