package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-width histogram per (keys, tumbling bucket): an
  * `array<long>` of `nbins + 2` counters — slot 0 underflow (< lo), slots
  * 1..nbins the equal-width bins of `[lo, hi)`, slot nbins+1 overflow
  * (>= hi). The distribution-shaped companion to the tier store's exact
  * percentile blocks: blocks answer "what IS p99 here", histograms answer
  * "how is the whole distribution shaped" at a fixed 8·(nbins+2)-byte cost
  * per tier row, and — unlike the blocks — stay that size at ANY point
  * count, so they remain cheap on the coarsest tiers of a 10^12-row store.
  *
  * The reference profiles distributions by materializing describe()-style
  * stats per group (/root/reference/forecastframe/utilities.py summary
  * helpers); a fixed-width mergeable histogram is the form of that profile
  * that survives tier promotion without re-reading raw data.
  *
  * Scale: ONE partial-aggregable shuffle — each of the nbins+2 counters is
  * a separate codegen'd `sum(when(bin = i, 1))` aggregate (map-side
  * combined), assembled into the array only in the final projection. No
  * per-group collect of values, no second pass. [[promote]] merges
  * counter-arrays elementwise the same way (sum per slot), so 1m→1h→1d
  * histogram promotion is counter-exact by construction. `nbins` is
  * plan-size-bounded (each bin is an aggregate expression): require ≤ 512.
  */
object Hist {

  /** 0-based slot for a value: 0 underflow, 1..nbins bins, nbins+1 overflow.
    * The float guard (`least` with nbins-1) keeps `lo + k·w` edge values
    * whose division rounds UP from spilling past the last bin.
    */
  private def slot(v: Column, lo: Double, hi: Double, nbins: Int): Column = {
    val width = (hi - lo) / nbins
    when(v.isNull, lit(null).cast("int"))
      .when(v < lo, lit(0))
      .when(v >= hi, lit(nbins + 1))
      .otherwise(least(floor((v - lo) / lit(width)).cast("int"), lit(nbins - 1)) + 1)
  }

  private def slotSums(nbins: Int): Seq[Column] =
    (0 to nbins + 1).map(i =>
      sum(when(col("_slot") === i, 1L).otherwise(0L)).as(s"_h$i"))

  private def assemble(nbins: Int): Column =
    array((0 to nbins + 1).map(i => col(s"_h$i")): _*)

  /** Histogram tier rows from raw points: (keys, bucket_start, hist). Null
    * values land in no slot (they are not "underflow" — a null text length
    * is a missing measurement, not a tiny one).
    */
  def histogram(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                valueCol: String, bucketSeconds: Long,
                lo: Double, hi: Double, nbins: Int): DataFrame = {
    require(nbins >= 1 && nbins <= 512, s"nbins must be in [1, 512], got $nbins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    df.withColumn("_slot", slot(col(valueCol).cast("double"), lo, hi, nbins))
      .groupBy(hierarchy.map(col) :+
        window(col(tsCol), s"$bucketSeconds seconds").as("_w"): _*)
      .agg(slotSums(nbins).head, slotSums(nbins).tail: _*)
      .withColumn("bucket_start", unix_timestamp(col("_w.start")))
      .withColumn("hist", assemble(nbins))
      .select((hierarchy.map(col) ++ Seq(col("bucket_start"), col("hist"))): _*)
  }

  /** Promote histogram tier rows to coarser `tierSeconds` buckets: counters
    * merge by elementwise sum (one partial-aggregable shuffle; each slot is
    * its own `sum(element_at(...))` aggregate). Counter-exact: promoting 1m
    * histograms to 1h equals building the 1h histogram from raw.
    */
  def promote(hist: DataFrame, hierarchy: Seq[String], tierSeconds: Long,
              nbins: Int): DataFrame = {
    require(tierSeconds >= 1, s"tierSeconds must be >= 1, got $tierSeconds")
    val coarse = col("bucket_start") - pmod(col("bucket_start"), lit(tierSeconds))
    val sums = (0 to nbins + 1).map(i =>
      sum(element_at(col("hist"), i + 1)).as(s"_h$i"))
    hist.groupBy(hierarchy.map(col) :+ coarse.as("bucket_start"): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumn("hist", assemble(nbins))
      .select((hierarchy.map(col) ++ Seq(col("bucket_start"), col("hist"))): _*)
  }

  /** Quantile ESTIMATES from histogram tier rows — the approximate
    * companion to the exact block percentiles: rank r = q·n under a
    * uniform-within-bin mass model, linearly interpolated inside the
    * containing bin (max error = one bin width); ranks landing in the
    * underflow/overflow slots clamp to `lo`/`hi`. This is the percentile
    * that still works where even the compressed point blocks are too heavy
    * — a coarse tier row over 10^9 points costs the same 8·(nbins+2) bytes
    * as one over 10^3.
    *
    * Pure relational algebra, no UDF: posexplode to (bin, cnt) rows
    * (bounded: nbins+2 per tier row), one window pass for the cumulative
    * and total counts, and a filter that keeps exactly the bin straddling
    * each requested rank. One shuffle on (keys, bucket).
    *
    * (r6 note: a per-row HOF-fold formulation — no explode, no window —
    * was tried and REVERTED: interpreted `aggregate` lambdas re-evaluate
    * every captured subexpression per STEP, so embedding the rank
    * r = q·Σcnt in the fold's hit condition made the scan quadratic in
    * nbins — measured 1.1 s → 20.5 s on q119. The windowed shape stands.)
    *
    * Output: (keys, bucket_start, q, est).
    */
  def quantileEst(hist: DataFrame, hierarchy: Seq[String], lo: Double, hi: Double,
                  nbins: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      s"quantiles must be in (0, 1), got $qs")
    require(lo < hi && nbins >= 1, s"bad histogram spec [$lo, $hi) x $nbins")
    val width = (hi - lo) / nbins
    val keys = hierarchy.map(col) :+ col("bucket_start")
    val part = Window.partitionBy(keys: _*)
    val cumWin = part.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = col("q") * col("_n")
    hist
      .select((keys :+ posexplode(col("hist")).as(Seq("bin", "cnt"))): _*)
      .withColumn("_cum", sum(col("cnt")).over(cumWin))
      .withColumn("_n", sum(col("cnt")).over(part))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      // the unique slot straddling rank r: cumBefore < r <= cum (non-empty)
      .filter(col("cnt") > 0 && col("_cum") >= r && (col("_cum") - col("cnt")) < r)
      .withColumn("est",
        when(col("bin") === 0, lit(lo))
          .when(col("bin") === nbins + 1, lit(hi))
          .otherwise(lit(lo) + (col("bin") - 1) * lit(width) +
            ((r - (col("_cum") - col("cnt"))) / col("cnt")) * lit(width)))
      .select((keys ++ Seq(col("q"), col("est"))): _*)
  }
}
