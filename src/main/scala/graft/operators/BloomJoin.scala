package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Bloom-filter pre-filtered semi-join — the runtime-row-filter pattern
  * (Spark's own `InjectRuntimeFilter` applies it automatically only under
  * narrow optimizer conditions; this makes it an explicit operator).
  *
  * `semiJoin(big, small, k)` returns exactly `big LEFT SEMI JOIN small` —
  * the bloom filter is a pre-pass that drops most non-matching `big` rows
  * AT THE SCAN, before they are shuffled for the exact join; false
  * positives (rate `fpp`) survive the pre-pass and are removed by the
  * exact semi-join, so the result is identical, never approximate.
  *
  * When to use at 100 TB: a broadcast hash join already solves the small-
  * dim case. The bloom pre-filter is for the middle regime — the key set
  * is too large to broadcast as a hash relation (say 100M keys ≈ GBs of
  * hash map) but its bloom bitmap is still megabytes. The collect here is
  * the bitmap only (`numBits/8` bytes, bounded by
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` — same licensed
  * driver-side bound as the IVF centroid table in [[Similarity]]).
  *
  * Reuses Spark's own sketch machinery ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]], the expressions `InjectRuntimeFilter`
  * plants) rather than a hand-rolled bitmap — both sides hash with
  * `xxhash64`, as the optimizer rule does.
  */
object BloomJoin {

  /** Aggregate a bloom-filter bitmap (binary) over `xxhash64(c)`. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    Shim.column(new BloomFilterAggregate(
      Shim.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(bloom, xxhash64(c))` — false negatives impossible. */
  def mightContain(bloom: Column, c: Column): Column =
    Shim.column(BloomFilterMightContain(
      Shim.expression(bloom), Shim.expression(xxhash64(c))))

  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
               smallKey: String, expectedItems: Long = 0L,
               numBits: Long = 33554432L): DataFrame = {
    // scale-adaptive sizing (r6): with the default expectedItems = 0 the
    // build side is counted first (one bounded action over the SMALL side,
    // which the operator scans twice anyway) and the bitmap gets ~10
    // bits/key (fpp ≈ 1%), capped at `numBits`. The previous fixed
    // 4M-item/4 MB bitmap was a constant tuned for neither the local bench
    // (15k keys → 224× oversized literal shipped with every stage) nor a
    // cluster (guide §1.2/§3.2: size the filter to the true count). Bloom
    // sizing cannot change the result — false positives are removed by the
    // exact semi-join below.
    val items = if (expectedItems > 0) expectedItems
      else math.max(small.count(), 1L)
    val bits = math.max(1024L, math.min(numBits, items * 10L))
    // one driver-side value: the bitmap (bits/8 bytes), not the keys
    val bf = small.agg(bloomAgg(col(smallKey), items, bits).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val pre =
      if (bf == null) big.filter(lit(false)) // empty build side
      else big.filter(mightContain(lit(bf), col(bigKey)))
    pre.join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }
}
