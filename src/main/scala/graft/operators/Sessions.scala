package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a keyed event stream into sessions that
  * close after `gapSeconds` of inactivity, and per-session summary stats.
  *
  * The reference's datetime handling stops at calendar features
  * (/root/reference/forecastframe/feature_engineering.py `calc_datetime_features`);
  * sessionization is the standard event-stream extension (web analytics,
  * crawl-visit grouping at Common-Crawl scale).
  *
  * Scale design: two window passes over ONE shuffle — `lag` to flag session
  * starts, then a running `sum` of the flags for the session index; both
  * windows share the same (keys, order) so Catalyst plans a single sort +
  * exchange. No self-join, no explode. Session ids are (key, session_idx)
  * pairs — globally unique without any driver-side counter, stable under
  * re-partitioning. Skewed hot keys: the window is per-key sequential by
  * nature (a session is a per-key order-dependent construct); a key too hot
  * for one task should be chunked on coarse time with flag carry-in, same
  * note as [[AsOf]]. For unbounded streams use the Structured Streaming
  * `session_window` tumbling analogue instead (see graft.streaming).
  */
object Sessions {

  /** Assign `session_idx` (1-based per key) to every event. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    // sub-second-exact gap: compare integer MICROSECONDS (unix_micros here,
    // epoch_us in the DuckDB oracle) — no truncation, no float compare
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    val newSession = when(prev.isNull
        .or(micros(col(tsCol)) - micros(prev) > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: start/end, duration, event count, summed value. */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   gapSeconds: Long, valueCol: String): DataFrame =
    sessionize(df, keyCols, tsCol, gapSeconds)
      .groupBy((keyCols.map(col) :+ col("session_idx")): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))

  /** Cohort retention matrix: users grouped by first-seen day; for each
    * (cohort_day, day-offset) the count of cohort members active on that
    * offset. The web-analytics staple the reference's calendar layer stops
    * short of.
    *
    * Plan: per-user first day and the distinct (user, day) activity set
    * share ONE shuffle key (the user), then a second, result-sized shuffle
    * into (cohort, offset) counts. `count(user)` on the distinct set IS the
    * distinct-user count — no count_distinct state. Output is
    * |days|²-bounded — tiny at any corpus scale.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = date_trunc("day", col(tsCol)).as("day")
    val activity = df.select(col(userCol).as("_u"), day).distinct()
    val firstDay = activity.groupBy("_u").agg(min(col("day")).as("cohort_day"))
    activity.join(firstDay, Seq("_u"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("offset_days"))
      .agg(count(col("_u")).as("n_active"))
  }

  /** Per-key conversion latency: the time from each key's FIRST
    * `fromState` event to its first `toState` event at-or-after it —
    * "signup → first purchase" in seconds, one row per key that started
    * the journey (never-converted keys carry a null latency, so the
    * conversion rate falls out of the same frame). Timestamps compare at
    * exact microsecond precision.
    *
    * Plan: two filtered min-aggregations on the SAME key (AQE reuses the
    * exchange) + one join — the [[windowFunnel]] 2-step shape, kept
    * separate because the latency DISTRIBUTION (not the step count) is
    * the deliverable here.
    */
  def conversionLatency(df: DataFrame, keyCols: Seq[String], tsCol: String,
                        typeCol: String, fromState: String,
                        toState: String): DataFrame = {
    val keys = keyCols.map(col)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val starts = df.filter(col(typeCol) === fromState)
      .groupBy(keys: _*).agg(min(us).as("_from_us"))
    val ends = df.filter(col(typeCol) === toState)
      .select((keys :+ us.as("_to_us")): _*)
    // min(when(...)) keeps never-converted keys as one null-latency row —
    // a post-join filter would drop a key whose only to-events precede from
    starts.join(ends, keyCols, "left")
      .groupBy((keys :+ col("_from_us")): _*)
      .agg(min(when(col("_to_us") >= col("_from_us"), col("_to_us"))).as("_to_us"))
      .select((keys :+ col("_from_us").as("from_us") :+ col("_to_us").as("to_us") :+
        ((col("_to_us") - col("_from_us")) / lit(1000000L)).cast("double")
          .as("latency_s")): _*)
  }

  /** Growth accounting (the "new / retained / resurrected / churned"
    * decomposition popularized by the a16z/Social Capital growth-
    * accounting framework, public blog literature): per period, every
    * active user is exactly one of
    *   new         — first-ever active period,
    *   retained    — also active in the immediately previous period,
    *   resurrected — active before, but not in the previous period;
    * and `churned(p)` counts users active in p−1 but not in p (attributed
    * to p, the period they went silent; the last observed period emits no
    * churn — unknowable yet). Identity: active(p) = new + retained +
    * resurrected, and retained(p) = active(p−1) − churned(p).
    *
    * Plan: ONE distinct (user, period) pass, one per-user window (lag /
    * lead / running-min — all three from the same sort), then a
    * period-sized count. Pure integer counts — cross-engine exact.
    */
  def growthAccounting(df: DataFrame, userCol: String, periodCol: String): DataFrame = {
    val activity = df.select(col(userCol).as("_u"), col(periodCol).cast("long").as("p"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_u").orderBy("p")
    val flagged = activity
      .withColumn("_first", min(col("p")).over(w))
      .withColumn("_prev", lag(col("p"), 1).over(w))
      .withColumn("_next", lead(col("p"), 1).over(w))
    val maxP = flagged.agg(max(col("p")).as("_maxp")) // one bounded scalar row
    val status = flagged.crossJoin(maxP)
      .select(col("p"), col("_next"), col("_maxp"),
        when(col("p") === col("_first"), lit("new"))
          .when(col("_prev") === col("p") - 1, lit("retained"))
          .otherwise(lit("resurrected")).as("status"))
    val active = status.groupBy("p", "status").agg(count(lit(1)).as("n"))
    // churn: active in p, silent in p+1 — attributed to period p+1
    val churned = status
      .filter((col("_next").isNull || col("_next") > col("p") + 1) &&
        col("p") + 1 <= col("_maxp"))
      .select((col("p") + 1).as("p"), lit("churned").as("status"))
      .groupBy("p", "status").agg(count(lit(1)).as("n"))
    active.unionByName(churned)
  }

  /** Windowed funnel (ClickHouse `windowFunnel` semantics, strict order):
    * per key, the earliest chain s_1 < s_2 < … with every step inside
    * `windowSeconds` of the step-1 time; returns each key with the step
    * timestamps reached (`t1..tk`, null once the chain breaks) and
    * `max_step` (0 = never did s_1). Timestamps compare at exact
    * MICROSECOND precision (same contract as [[sessionize]]).
    *
    * Plan: step 1 is a filtered min-agg per key; each later step is a
    * filtered equi-join back on the key + min-agg — k−1 small hash joins
    * against per-key 1-row frames, never a self-join of the full stream.
    * All k aggregations shuffle on the SAME key, so AQE coalesces them
    * onto one exchange footprint. A per-key sorted fold would do it in one
    * pass but needs collect_list state (the Ewma-pattern guard); the join
    * chain is streaming-friendly and spill-safe at any key cardinality.
    */
  def windowFunnel(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val keys = keyCols.map(col)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val ev = df.select((keys :+ col(typeCol).as("_t") :+ us.as("_us")): _*)
    val t1 = ev.filter(col("_t") === steps.head)
      .groupBy(keys: _*).agg(min(col("_us")).as("t1"))
    val chain = steps.zipWithIndex.drop(1).foldLeft(t1) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val hit = ev.filter(col("_t") === step)
        .join(acc.select((keys :+ col(prev) :+ col("t1").as("_t1")): _*), keyCols)
        .filter(col("_us") > col(prev) &&
          col("_us") <= col("_t1") + lit(windowSeconds * 1000000L))
        .groupBy(keys: _*).agg(min(col("_us")).as(cur))
      acc.join(hit.select((keys :+ col(cur)): _*), keyCols, "left")
    }
    val stepCols = (1 to steps.length).map(i => col(s"t$i"))
    val reached = stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val allKeys = df.select(keys: _*).distinct()
    allKeys.join(chain, keyCols, "left")
      .withColumn("max_step", coalesce(reached, lit(0)))
      .select((keys :+ col("max_step")) ++
        (1 to steps.length).map(i => timestamp_micros(col(s"t$i")).as(s"t$i")): _*)
  }

  /** Frequent n-step paths: consecutive state n-grams per key stream
    * (ordered by `tsCol`, `tieCol`), counted over the whole population —
    * the "what do users do in sequence" read behind next-event prediction
    * and UX funnels nobody hand-specified ([[windowFunnel]] needs the
    * steps up front; this discovers them). The sequence-mining restriction
    * to CONSECUTIVE n-grams is deliberate: it needs only n−1 window leads
    * (one shuffle on the key), never PrefixSpan's exponential candidate
    * space.
    *
    * Output: one row per n-gram (step_1..step_n, n_occurrences, n_keys)
    * with occurrences ≥ `minCount`; n-grams never span keys.
    */
  def pathNgrams(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 tieCol: String, stateCol: String, n: Int,
                 minCount: Long = 1L): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val grams = df
      .withColumns(((1 until n).map(i =>
        s"step_${i + 1}" -> lead(col(stateCol), i).over(w)) :+
        ("step_1" -> col(stateCol))).toMap)
    grams.filter(col(s"step_$n").isNotNull)
      .groupBy((1 to n).map(i => col(s"step_$i")): _*)
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(struct(keys: _*)).as("n_keys"))
      .filter(col("n_occurrences") >= minCount)
  }

  /** First/last-touch attribution: for every `targetState` event, the
    * key's FIRST state ever (first touch) and the state immediately
    * BEFORE the conversion (last touch, "(none)" when the conversion
    * opens the stream). Output is the attribution matrix —
    * (first_touch, last_touch, n_conversions) — the report marketing
    * attribution models disagree about, both extremes in one pass.
    *
    * One window pass (two frame variants over the same sort — one
    * exchange), then a count on the tiny touch-pair key.
    */
  def touchAttribution(df: DataFrame, keyCols: Seq[String], tsCol: String,
                       tieCol: String, stateCol: String,
                       targetState: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    df
      .withColumn("_first", first(col(stateCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .filter(col(stateCol) === targetState)
      .select(col("_first").as("first_touch"),
        coalesce(col("_prev"), lit("(none)")).as("last_touch"))
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Engagement stickiness: per active day, the distinct users active THAT
    * day (`dau`) and the distinct users active in the trailing
    * `windowDays`-day window ending that day (`window_active` — DAU/WAU at
    * 7, DAU/MAU at 28/30), plus the ratio. Only days with activity get a
    * row.
    *
    * Scale design: exact sliding distinct WITHOUT a per-day range join —
    * the (user, day) activity pairs are deduped once (one shuffle), then
    * each pair is exploded to the ≤`windowDays` future days it covers and
    * deduped again, so the cost is `windowDays × |active pairs|` narrow
    * rows through two distinct shuffles, independent of raw event volume.
    * (The HLL-register path in [[Sketch]] serves the same query
    * approximately when `windowDays × pairs` is too much; this is the
    * exact small-window form.)
    */
  def stickiness(df: DataFrame, userCol: String, tsCol: String,
                 windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"stickiness: windowDays must be >= 1, got $windowDays")
    val pairs = df
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d")).distinct()
    val dau = pairs.groupBy(col("_d").as("day")).agg(count(lit(1)).as("dau"))
    val winActive = pairs
      .select(col("_u"),
        explode(sequence(col("_d"), date_add(col("_d"), windowDays - 1))).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("window_active"))
    // inner join restricts to days that actually had activity (the explode
    // also fabricates trailing days past each user's last active day)
    dau.join(winActive, Seq("day"))
      .withColumn("stickiness", col("dau") / col("window_active"))
  }
}
