package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch — mergeable per-item frequency estimation (Cormode &
  * Muthukrishnan 2005, "An improved data stream summary: the count-min
  * sketch and its applications" — public). The heavy-hitter companion to
  * [[Hll]]: HLL answers "how many distinct", CMS answers "how often does
  * THIS item occur" without materializing a 10^9-key exact count table.
  *
  * Layout: D=4 rows × W=1024 buckets of 64-bit counters (32 KB per group —
  * fixed, independent of item cardinality). Estimate = min over rows of the
  * item's bucket counter; always an OVERESTIMATE (collisions only add), with
  * ε = e/W ≈ 0.27% of the total count at δ = e^-D ≈ 1.8%.
  *
  * Hashes are the engine-wide MD5 convention ([[Hashing.md5LongSeeded]]:
  * row i hashes `"i:" ++ item` and keeps 60 bits), so a DuckDB oracle can
  * replay the ENTIRE sketch from first principles in SQL —
  * `('0x' || substr(md5(i || ':' || item), 1, 15))::BIGINT % 1024` — the
  * same independent-verification standard as q76's HLL.
  *
  * Counters MERGE by elementwise ADD (associative + commutative), so the
  * tier-promotion law holds exactly like HLL's register max:
  * `sketch(1h bucket)` == `merge(sketch(its 1m buckets))` COUNTER-IDENTICAL
  * — a coarse tier's heavy-hitter table never rereads raw rows.
  *
  * State is a primitive byte array (BINARY encoder — no boxing, map-side
  * partial aggregation applies); counters are big-endian longs at slot*8.
  */
object Cms {

  val D: Int = 4
  val W: Int = 1024
  val Bytes: Int = D * W * 8

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit MD5 hash of `"row:item"`, mod W — matches the SQL replay form.
    * Digest instance reused per thread (getInstance allocates per call —
    * the same per-item hot-path fix as [[MinHashHelper]]/[[Hll]]). */
  private[graft] def bucket(row: Int, item: String): Int = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s"$row:$item".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = top 60 bits: bytes 0..6 + high nibble of byte 7
    val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) | ((d(2) & 0xffL) << 36) |
      ((d(3) & 0xffL) << 28) | ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
    (h60 % W).toInt
  }

  @inline private def getCnt(b: Array[Byte], slot: Int): Long = {
    val o = slot << 3
    ((b(o) & 0xffL) << 56) | ((b(o + 1) & 0xffL) << 48) | ((b(o + 2) & 0xffL) << 40) |
      ((b(o + 3) & 0xffL) << 32) | ((b(o + 4) & 0xffL) << 24) | ((b(o + 5) & 0xffL) << 16) |
      ((b(o + 6) & 0xffL) << 8) | (b(o + 7) & 0xffL)
  }

  @inline private def putCnt(b: Array[Byte], slot: Int, v: Long): Unit = {
    val o = slot << 3
    b(o) = (v >>> 56).toByte; b(o + 1) = (v >>> 48).toByte
    b(o + 2) = (v >>> 40).toByte; b(o + 3) = (v >>> 32).toByte
    b(o + 4) = (v >>> 24).toByte; b(o + 5) = (v >>> 16).toByte
    b(o + 6) = (v >>> 8).toByte; b(o + 7) = v.toByte
  }

  private[graft] def update(sk: Array[Byte], item: String, by: Long = 1L): Unit = {
    var i = 0
    while (i < D) {
      val slot = i * W + bucket(i, item)
      putCnt(sk, slot, getCnt(sk, slot) + by)
      i += 1
    }
  }

  private[graft] def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var s = 0
    while (s < D * W) { putCnt(a, s, getCnt(a, s) + getCnt(b, s)); s += 1 }
    a
  }

  /** Point estimate: min over rows of the item's bucket counter. */
  def query(sk: Array[Byte], item: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < D) {
      val c = getCnt(sk, i * W + bucket(i, item))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** strings → sketch (binary). */
  class SketchAgg extends Aggregator[String, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](Bytes)
    def reduce(b: Array[Byte], s: String): Array[Byte] = { if (s != null) update(b, s); b }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** sketches → elementwise-summed sketch — the tier-promotion aggregate. */
  class MergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](Bytes)
    def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] =
      if (s == null) b else mergeInto(b, s)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `cmsSketch(stringCol)` aggregate → binary sketch. */
  def cmsSketch(c: Column): Column = udaf(new SketchAgg).apply(c)

  /** `cmsMerge(sketchCol)` aggregate → summed binary sketch. */
  def cmsMerge(c: Column): Column = udaf(new MergeAgg).apply(c)

  /** Scalar: estimated count of `item` in `sketch`. */
  def cmsQuery(sketch: Column, item: Column): Column = {
    val f = org.apache.spark.sql.functions.udf((sk: Array[Byte], it: String) =>
      if (sk == null || it == null) 0L else query(sk, it))
    f(sketch, item)
  }
}
