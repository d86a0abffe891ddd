package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video/html) payloads as opaque `binary` columns
  * with typed metadata, plus the batched decode / feature-extract plumbing.
  *
  * The media codec libraries are not available in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[StubDecoder]]) — the
  * Spark-side contract (schema, partition-level batching, feature shape) is
  * real and tested, and a production decoder drops in by replacing one
  * function.
  *
  * Scale design: decode runs inside `mapPartitions` so per-partition codec
  * state (decoder contexts, model handles) is initialized once per task, not
  * per row — the Scala analogue of `mapInPandas` batch semantics. The binary
  * payload never shuffles: decode is a narrow map, and downstream analytics
  * group only the extracted (small, typed) features.
  */
object Multimodal {

  /** Typed metadata + extracted features for one media payload. */
  case class MediaFeatures(
      url: String,
      media_type: String,
      byte_len: Long,
      sha_hex: String,
      width: Int,        // stub: derived, real decoder would fill from codec
      height: Int,
      n_frames: Int)

  /** STUB decoder — deterministic fake in place of an image/audio codec.
    * Replace the body with a real decode (e.g. javax.imageio / ffmpeg JNI)
    * in production; everything around it stays unchanged.
    */
  object StubDecoder {
    /** "Decode" a payload: dimensions derived deterministically from content
      * bytes. A real implementation returns actual pixel dimensions / frame
      * counts — the call shape (bytes in, small struct out) is identical.
      */
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      val a = if (n > 0) (bytes(0) & 0xff) else 0
      val b = if (n > 1) (bytes(1) & 0xff) else 0
      (64 + a % 64, 64 + b % 64, 1 + n % 8) // (width, height, n_frames)
    }
  }

  /** Batched decode + feature extraction: one decoder init per partition,
    * streaming over rows. Input needs (urlCol: string, binCol: binary).
    */
  def extractFeatures(df: DataFrame, urlCol: String, binCol: String,
                      mediaType: String = "html"): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(urlCol), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder/codec init happens here (once per task)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (url, bytes) =>
          val payload = if (bytes == null) Array.empty[Byte] else bytes
          val (w, h, f) = StubDecoder.decode(payload)
          md.reset()
          val sha = md.digest(payload).map("%02x".format(_)).mkString
          MediaFeatures(url, mediaType, payload.length.toLong, sha, w, h, f)
        }
      }
  }

  /** Column-level metadata (no decode): byte length + md5 of the payload —
    * the cheap pass a pipeline runs before deciding what to decode.
    */
  def payloadMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", length(col(binCol)).cast("long"))
      .withColumn("payload_md5", md5(col(binCol)))
}
