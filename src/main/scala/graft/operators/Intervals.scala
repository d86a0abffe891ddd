package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join: attach to every point row the interval rows
  * (same keys) with `start <= ts < end`.
  *
  * The reference's only temporal join is exact (hierarchy, datetime) equality
  * (/root/reference/forecastframe/utilities.py `_join_on_index`); interval
  * containment is the other join a time-series engine needs (events within
  * maintenance windows, trades within auction phases, pages crawled during an
  * incident).
  *
  * Scale design — NOT a theta join. `p JOIN i ON p.k = i.k AND i.s <= p.ts
  * AND p.ts < i.e` runs as a sort-merge join on `k` with the range as a
  * post-join FILTER: every point meets every interval of its key first
  * (|points_k| × |intervals_k| intermediate rows — quadratic on hot keys),
  * and with no key at all Spark falls back to BroadcastNestedLoopJoin.
  * Instead both sides are mapped to coarse time buckets of width `w`:
  * intervals REPLICATE to each bucket they overlap (`explode(sequence(...))`,
  * ⌈len/w⌉+1 ≤ 2 copies when `w` bounds the interval length), points map to
  * their single bucket, and the join becomes a pure EQUI-join on
  * (keys, bucket) with the containment predicate as the join residual. Each
  * (point, interval) match meets in exactly one bucket — the point's — so no
  * dedup pass is needed. Cost: one shuffle of each side on (keys, bucket),
  * fan-out bounded by interval length / w, independent of key skew in time.
  *
  * The bucket width trades replication against candidate density: `w` at
  * roughly the MAXIMUM interval length gives ≤ 2 replicas per interval while
  * keeping each bucket's candidate set to the intervals actually near it.
  * Intervals longer than `w` are still correct — they just replicate
  * proportionally (a 10·w interval lands in ~11 buckets).
  */
object Intervals {

  /** @param points    point side; keeps all its columns
    * @param intervals interval side with `keyCols`, `startCol`, `endCol`
    *                  (half-open `[start, end)`), plus `carryCols` to attach
    * @param keyCols   equi-join keys present on both sides
    * @param tsCol     point timestamp column (TimestampType)
    * @param startCol  interval start (TimestampType, inclusive)
    * @param endCol    interval end (TimestampType, exclusive)
    * @param bucketSeconds coarse bucket width; pick ≈ max interval length
    * @param carryCols interval columns to attach to each matched point
    * @return inner join: one row per (point, containing interval) pair
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                   tsCol: String, startCol: String, endCol: String,
                   bucketSeconds: Long, carryCols: Seq[String]): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = points.withColumn("_pb",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    // end is exclusive: an interval ending exactly on a bucket boundary does
    // not reach into the next bucket, hence the -1 before the floor.
    val i = intervals
      .withColumn("_ib", explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor((unix_timestamp(col(endCol)) - 1) / bucketSeconds))))
      .select((keyCols.map(c => col(c).as(s"_ik_$c")) ++
        Seq(col(startCol).as("_is"), col(endCol).as("_ie"), col("_ib")) ++
        carryCols.map(col)): _*)
    val cond = keyCols.map(c => p(c) === i(s"_ik_$c"))
      .reduce(_ && _) && p("_pb") === i("_ib") &&
      p(tsCol) >= i("_is") && p(tsCol) < i("_ie")
    p.join(i, cond, "inner")
      .select(points.columns.map(col) ++ carryCols.map(col): _*)
  }

  /** Interval × interval OVERLAP join — the incident-correlation
    * primitive ("which activity spans intersect which incident windows")
    * that a point-in-interval join ([[intervalJoin]]) cannot express.
    * Half-open `[start, end)` epoch-second intervals on both sides; emits
    * one row per overlapping pair with the exact overlap duration
    * `least(ends) − greatest(starts)`.
    *
    * Scale plan (the standard bucketized interval join — e.g. the Spark
    * range-join pattern): each side explodes to the coarse time buckets it
    * spans, the join is an EQUI-join on the bucket (never a full
    * cross-with-θ), duplicate pairs from multi-bucket overlaps collapse
    * with one distinct on the pair ids+bounds, and the θ-condition only
    * verifies within buckets. `bucketSeconds` ≈ the typical interval
    * length keeps the per-interval fan-out ~2 buckets; a very long
    * interval degrades gracefully (more bucket rows, same correctness).
    * All arithmetic is integer seconds — cross-engine exact.
    */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  aIdCols: Seq[String], bIdCols: Seq[String],
                  startCol: String, endCol: String,
                  bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    def buckets(df: DataFrame, ids: Seq[String], p: String): DataFrame =
      df.filter(col(endCol) > col(startCol))
        .select((ids.map(c => col(c).as(s"$p$c")) :+
          col(startCol).cast("long").as(s"${p}s") :+
          col(endCol).cast("long").as(s"${p}e")): _*)
        .withColumn("_bk", explode(sequence(
          expr(s"${p}s div ${bucketSeconds}L"),
          expr(s"(${p}e - 1) div ${bucketSeconds}L"))))
    val ab = buckets(a, aIdCols, "_a_")
    val bb = buckets(b, bIdCols, "_b_")
    ab.join(bb, Seq("_bk"))
      .filter(col("_a_s") < col("_b_e") && col("_b_s") < col("_a_e"))
      .drop("_bk").distinct() // multi-bucket overlaps collapse to one pair
      .withColumn("overlap_s",
        least(col("_a_e"), col("_b_e")) - greatest(col("_a_s"), col("_b_s")))
      .select((aIdCols.map(c => col(s"_a_$c").as(s"a_$c")) ++
        bIdCols.map(c => col(s"_b_$c").as(s"b_$c")) :+
        col("overlap_s")): _*)
  }

  /** Coalesce overlapping/touching intervals per key into their union —
    * the coverage-audit primitive: collapse a pile of [start, end)
    * windows (incidents, maintenance, crawl leases, tier-store coverage
    * stamps) into disjoint spans, so "is there a hole?" becomes a gap
    * between consecutive OUTPUT rows. Touching intervals (next.start ==
    * running max end) merge — half-open semantics.
    *
    * The classic single-window-pass plan: order each key's intervals by
    * (start, end, `tieCol`) — a TOTAL order, so run boundaries are
    * reproducible — flag rows whose start exceeds the running max of all
    * PRECEDING ends, running-sum the flags into a run id, and aggregate
    * each run. One shuffle on the key; no self-join, no explode;
    * correct for arbitrarily nested/duplicated intervals because the
    * running max carries the furthest reach seen so far.
    */
  def coalesceIntervals(df: DataFrame, keyCols: Seq[String], startCol: String,
                        endCol: String, tieCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(startCol), col(endCol), col(tieCol))
    val prevMax = max(col(endCol)).over(w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    df
      .withColumn("_new_run",
        when(prevMax.isNull || col(startCol) > prevMax, lit(1L)).otherwise(lit(0L)))
      .withColumn("_run", sum(col("_new_run")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy((keys :+ col("_run")): _*)
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .select((keys :+ col("_run").as("span_seq") :+ col("span_start") :+
        col("span_end") :+ col("n_intervals")): _*)
  }

  /** Coverage / uptime: the total time each key's intervals cover inside
    * the reporting window `[winStartUs, winEndUs)`, overlap-free — the SLA
    * "percent of the month the host was up" readout. Intervals are clipped
    * to the window, merged with [[coalesceIntervals]] (overlaps and
    * touching intervals count once), and summed; zero-length intervals
    * cover nothing and are dropped.
    *
    * All duration arithmetic is exact integer microseconds; `uptime_share`
    * is one deterministic long/long division — no float sums anywhere.
    * Plan: the coalesce window pass + one aggregate on the same key.
    */
  def coverage(df: DataFrame, keyCols: Seq[String], startUsCol: String,
               endUsCol: String, tieCol: String, winStartUs: Long,
               winEndUs: Long): DataFrame = {
    require(winEndUs > winStartUs,
      s"coverage: empty window [$winStartUs, $winEndUs)")
    val keys = keyCols.map(col)
    val clipped = df
      .withColumn("_cs", greatest(col(startUsCol), lit(winStartUs)))
      .withColumn("_ce", least(col(endUsCol), lit(winEndUs)))
      .filter(col("_cs") < col("_ce"))
    coalesceIntervals(clipped, keyCols, "_cs", "_ce", tieCol)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("covered_us"))
      .withColumn("uptime_share",
        col("covered_us") / lit(winEndUs - winStartUs))
  }
}
