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

  /** dHash perceptual image fingerprint (difference hash — Krawetz 2013,
    * the public "kind of like pHash" gradient hash): decode → integer luma →
    * 9×8 NEAREST-NEIGHBOR downsample → 64 bits of "brighter than my right
    * neighbor". Near-duplicate images (recompression, mild noise, small
    * crops) land within a few Hamming bits; unrelated images differ in ~32.
    * This is the IMAGE analogue of [[graft.operators.Dedup]]'s SimHash for
    * text — the multimodal dedup primitive.
    *
    * Every step is INTEGER math (luma = (299r+587g+114b)/1000, NN sample at
    * srcX = x·w/9) — no float resampling, so the hash is bit-deterministic
    * across JVMs and replayable from the raw pixel function in tests.
    * Null for undecodable payloads.
    */
  object DHash {
    def lumaAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    /** 64-bit dHash of decoded image; grid positions sample NN at
      * (x·w/9, y·h/8).
      */
    def ofImage(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      val g = Array.tabulate(8, 9) { (y, x) =>
        lumaAt(img, math.min(w - 1, x * w / 9), math.min(h - 1, y * h / 8))
      }
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          bits <<= 1
          if (g(y)(x) < g(y)(x + 1)) bits |= 1L
          x += 1
        }
        y += 1
      }
      bits
    }
    def ofBytes(bytes: Array[Byte]): Option[Long] =
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))).map(ofImage)
      } catch { case _: Throwable => None }
  }

  /** Per-row dHash frame: (idCol, dhash: nullable long). Same batched
    * mapPartitions shape as [[extractImageFeatures]].
    */
  def imageDHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          (id, if (bytes == null) None else DHash.ofBytes(bytes))
        }
      }
      .toDF(idCol, "dhash")
  }

  /** Candidate near-duplicate image pairs: band the 64-bit hash into four
    * 16-bit keys (any shared band → candidate, the [[graft.operators.Dedup]]
    * LSH shape — near-dup hashes differ in few bits, so at least one band
    * usually survives intact), then verify candidates by exact Hamming
    * distance ≤ maxHamming. Never all-pairs.
    */
  def nearDupImages(hashes: DataFrame, idCol: String,
                    maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"bad maxHamming $maxHamming")
    val h = hashes.filter(col("dhash").isNotNull)
    val banded = h.select(col(idCol).as("_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("_b"))
      .select(col("_id"), col("dhash"), col("_b.band"), col("_b.key"))
    val a = banded.select(col("band"), col("key"), col("_id").as("id_a"),
      col("dhash").as("h_a"))
    val b = banded.select(col("band"), col("key"), col("_id").as("id_b"),
      col("dhash").as("h_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
  }
}
