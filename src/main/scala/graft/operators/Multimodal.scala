package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video/html) payloads as opaque `binary` columns
  * with typed metadata, plus the batched decode / feature-extract plumbing.
  *
  * IMAGE decode is REAL — `javax.imageio` ships with the JDK (PNG/JPEG/GIF/
  * BMP), see [[ImageDecoder]] and [[extractImageFeatures]]. Audio/video
  * codecs are not available in this environment, so that decode step is a
  * clearly-marked deterministic STUB ([[StubDecoder]]) — the Spark-side
  * contract (schema, partition-level batching, feature shape) is identical,
  * and a production decoder (ffmpeg JNI) drops in by replacing one function.
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

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP):
    * actual pixel dimensions from the codec; None when the payload is not a
    * decodable image.
    */
  object ImageDecoder {
    def decode(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.isEmpty) None
      else try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map(img => (img.getWidth, img.getHeight))
      } catch { case _: Throwable => None }
    }
  }

  /** Deterministic PNG synthesis (w × h, pixels keyed off `seed`) — the
    * test-data generator for the image pipeline; also a handy fixture for
    * any consumer needing real image bytes without external files.
    */
  val pngEncodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (w: Int, h: Int, seed: Long) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) {
        img.setRGB(i % w, i / w, ((seed * 2654435761L + i).toInt) & 0xffffff)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  /** Batched REAL image decode: one codec init per partition (file-cache off
    * — in-memory decode only), streaming over rows. media_type = "image"
    * with actual codec dimensions when decodable, else "binary" with
    * width/height 0. Same output schema as [[extractFeatures]].
    */
  def extractImageFeatures(df: DataFrame, urlCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(urlCol), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no disk cache in executors
        val md = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (url, bytes) =>
          val payload = if (bytes == null) Array.empty[Byte] else bytes
          md.reset()
          val sha = md.digest(payload).map("%02x".format(_)).mkString
          ImageDecoder.decode(payload) match {
            case Some((w, h)) =>
              MediaFeatures(url, "image", payload.length.toLong, sha, w, h, 1)
            case None =>
              MediaFeatures(url, "binary", payload.length.toLong, sha, 0, 0, 0)
          }
        }
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
