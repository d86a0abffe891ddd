package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002
  * "Counting distinct elements in a data stream"; Beyer et al. 2007 for the
  * unbiased (k−1)/U(k) estimator — public papers): keep the k smallest
  * DISTINCT 60-bit hashes of a set; the k-th smallest, scaled to [0,1),
  * estimates the distinct count as (k−1)/U(k).
  *
  * Why this beats HLL here: the sketch IS a deterministic function of the
  * value set under the engine's shared md5 hash contract
  * ([[Hashing.md5Long]] == DuckDB `('0x' || substr(md5(s),1,15))::BIGINT`),
  * so an independent SQL oracle can replay the exact sketch, the exact
  * estimate, and — because bottom-k of a union is the bottom-k of the
  * unioned bottom-ks — the exact MERGED sketch of any group rollup. That
  * mergeability is the tier-promotion contract: per-bucket sketches built
  * once, coarser tiers served by [[kmvMerge]] without touching raw data.
  *
  * Buffer layout (fixed size, mutated in place like [[Hll]]): 4-byte count
  * n, then k little-endian longs of which the first n are the sorted
  * ascending minima. Aggregation state is 4+8k bytes per group with
  * map-side partial combine — at 100 TB each task ships one small binary
  * row per group, never the values.
  */
object Kmv {

  val HashSpan: Double = 1152921504606846976.0 // 2^60, the md5Long domain

  private def cap(k: Int): Int = 4 + 8 * k

  private def count(b: Array[Byte]): Int =
    ByteBuffer.wrap(b, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def setCount(b: Array[Byte], n: Int): Unit =
    ByteBuffer.wrap(b, 0, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(n)

  private def get(b: Array[Byte], i: Int): Long =
    ByteBuffer.wrap(b, 4 + 8 * i, 8).order(ByteOrder.LITTLE_ENDIAN).getLong

  private def put(b: Array[Byte], i: Int, v: Long): Unit =
    ByteBuffer.wrap(b, 4 + 8 * i, 8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)

  /** Insert hash h into sorted-prefix buffer b (capacity k), dropping the
    * current max when full; duplicates are no-ops (KMV is a SET sketch). */
  private[graft] def insert(b: Array[Byte], k: Int, h: Long): Unit = {
    val n = count(b)
    // binary search over the n sorted longs
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = get(b, mid)
      if (v < h) lo = mid + 1
      else if (v > h) hi = mid
      else return // duplicate
    }
    if (lo >= k) return // larger than all k minima
    val keep = math.min(n, k - 1) - lo // elements to shift right
    if (keep > 0) System.arraycopy(b, 4 + 8 * lo, b, 4 + 8 * (lo + 1), 8 * keep)
    put(b, lo, h)
    if (n < k) setCount(b, n + 1)
  }

  private def mergeInto(a: Array[Byte], b: Array[Byte], k: Int): Array[Byte] = {
    val nb = count(b)
    var i = 0
    while (i < nb) { insert(a, k, get(b, i)); i += 1 }
    a
  }

  class SketchAgg(k: Int) extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](cap(k))
    def reduce(b: Array[Byte], h: java.lang.Long): Array[Byte] = {
      if (h != null) insert(b, k, h.longValue()); b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b, k)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class MergeAgg(k: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](cap(k))
    def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] =
      if (s == null) b else mergeInto(b, s, k)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b, k)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate: 60-bit hash column → KMV sketch (binary). */
  def kmvSketch(hash: Column, k: Int): Column = udaf(new SketchAgg(k)).apply(hash)

  /** Aggregate: sketches → merged sketch — the tier-promotion aggregate. */
  def kmvMerge(sk: Column, k: Int): Column = udaf(new MergeAgg(k)).apply(sk)

  /** Scalar: number of minima held (== distinct count while < k). */
  def kmvN(sk: Column): Column = {
    val f = org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      if (b == null) 0 else count(b))
    f(sk)
  }

  /** Scalar: merge TWO sketches pairwise (for sketch set algebra over a
    * pair table — the aggregate [[kmvMerge]] covers group rollups). */
  def kmvMerge2(a: Column, b: Column, k: Int): Column = {
    val f = org.apache.spark.sql.functions.udf { (x: Array[Byte], y: Array[Byte]) =>
      if (x == null) y
      else if (y == null) x
      else {
        val out = new Array[Byte](cap(k))
        System.arraycopy(x, 0, out, 0, math.min(x.length, out.length))
        val ny = count(y)
        var i = 0
        while (i < ny) { insert(out, k, get(y, i)); i += 1 }
        out
      }
    }
    f(a, b)
  }

  /** Scalar: the held minima as a sorted array<long> — for sketch set
    * algebra (KMV intersection: |bottomk(A∪B) ∩ A_sk ∩ B_sk| / k estimates
    * the Jaccard of the underlying sets, Beyer et al. 2007). */
  def kmvValues(sk: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) Array.empty[Long]
      else Array.tabulate(count(b))(i => get(b, i))
    }
    f(sk)
  }

  /** Scalar: distinct-count estimate — exact n while n < k, else the
    * unbiased (k−1)/U(k) with U(k) = kth-min / 2^60. Both branches are a
    * deterministic function of the value set (two IEEE ops on exact
    * integers), so an oracle replays them bit-for-bit.
    */
  def kmvEstimate(sk: Column, k: Int): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) 0.0
      else {
        val n = count(b)
        if (n < k) n.toDouble
        else (k - 1).toDouble * HashSpan / get(b, k - 1).toDouble
      }
    }
    f(sk)
  }
}
