package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.functions.Hier
import graft.operators.{CrossVal, Ewma, Features, GapFill, Metrics, Rollup, Scalers}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry over
  * the driver testdata (`/root/testdata/sf*`) and, where ANSI-SQL
  * expressible, a DuckDB `oracleSql` twin. Column names and ordering are
  * aligned on both sides; float outputs are rounded to 6 dp on both sides so
  * summation-order ulp noise cannot flip the hash compare.
  */
object SparkEntry {

  private def ev(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def li(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  private def r6(c: Column): Column = round(c, 6)

  /** Flagship query: full page pipeline on synthetic pages — synthesize →
    * hierarchy → 1m rollup → promote to 1h → hierarchy rollup. Driver
    * smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = Hier.withHierarchy(Pages.synthesize(spark, 20000L, seed = 42L))
    val t1m = Rollup.tier1m(pages)
    val t1h = Rollup.promote(t1m, 3600L)
    Rollup.rollupHierarchy(t1h, Seq("tld", "registered_domain", "host"))
      .drop("block", "lang_set")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.4 hierarchical agg — TPC-H-style pricing summary (scan+filter+agg)
    "q01_pricing_summary" -> ((s, dir) => {
      li(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r6(sum(col("l_quantity"))).as("sum_qty"),
          r6(sum(col("l_extendedprice"))).as("sum_base_price"),
          r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r6(avg(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.4 tier-1 continuous aggregate: 1-minute tumbling window per user
    "q02_rollup_1m" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("user_id"), window(col("ts"), "1 minute").as("w"))
        .agg(count(lit(1)).as("cnt"), r6(sum(col("value"))).as("sum_value"),
          r6(min(col("value"))).as("min_value"), r6(max(col("value"))).as("max_value"))
        .withColumn("bucket_start", unix_timestamp(col("w.start")))
        .drop("w")
        .select("user_id", "bucket_start", "cnt", "sum_value", "min_value", "max_value")
        .orderBy("user_id", "bucket_start")
    }),

    // §4.3 tier promotion: 1m tier re-aggregated associatively to 1h;
    // oracle computes 1h directly from raw — validates promotion exactness.
    "q03_tier_promote_1h" -> ((s, dir) => {
      val t1m = ev(s, dir)
        .groupBy(col("user_id"), window(col("ts"), "1 minute").as("w"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
        .withColumn("b1m", unix_timestamp(col("w.start")))
      t1m.groupBy(col("user_id"), (col("b1m") - pmod(col("b1m"), lit(3600L))).as("bucket_start"))
        .agg(sum(col("cnt")).as("cnt"), r6(sum(col("sv"))).as("sum_value"),
          r6(min(col("mn"))).as("min_value"), r6(max(col("mx"))).as("max_value"))
        .withColumn("mean_value", r6(col("sum_value") / col("cnt")))
        .orderBy("user_id", "bucket_start")
    }),

    // §2.4 exact percentiles (p50/p95) per group
    "q04_percentiles" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(r6(percentile(col("value"), lit(0.5))).as("p50"),
          r6(percentile(col("value"), lit(0.95))).as("p95"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // §2.4 GROUPING SETS / rollup across a 2-level hierarchy
    "q05_grouping_sets" -> ((s, dir) => {
      ev(s, dir)
        .rollup(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), r6(sum(col("value"))).as("sum_value"),
          grouping_id(col("event_type"), col("user_id")).as("lvl"))
        .orderBy(col("lvl"), col("event_type"), col("user_id"))
    }),

    // §2.4 lang cardinality + text-length measures per source
    "q06_lang_card" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(col("source"))
        .agg(countDistinct(col("lang")).as("lang_card"),
          count(lit(1)).as("cnt"),
          sum(length(col("text")).cast("long")).as("sum_len"),
          r6(avg(col("n_chars"))).as("avg_chars"))
        .orderBy("source")
    }),

    // §2.5 per-group lag (anti-leak k>=1)
    "q07_lag" -> ((s, dir) => {
      Features.lagFeatures(ev(s, dir), Seq("user_id"), "event_id", Seq("value"), Seq(1))
        .select(col("user_id"), col("event_id"), r6(col("value_lag1")).as("value_lag1"))
        .orderBy("user_id", "event_id")
    }),

    // §2.5 per-group difference
    "q08_diff" -> ((s, dir) => {
      Features.differenceFeatures(ev(s, dir), Seq("user_id"), "event_id", Seq("value"), Seq(3))
        .select(col("user_id"), col("event_id"), r6(col("value_diff3")).as("value_diff3"))
        .orderBy("user_id", "event_id")
    }),

    // §2.5 percent change of the lagged series, ±inf -> null
    "q09_pct_change" -> ((s, dir) => {
      Features.percentChange(ev(s, dir), Seq("user_id"), "event_id", Seq("value"), Seq(1))
        .select(col("user_id"), col("event_id"), r6(col("value_pct_change1")).as("pct_change1"))
        .orderBy("user_id", "event_id")
    }),

    // §2.4 time-based rolling stats over a 7-day range frame
    "q10_rolling_7d" -> ((s, dir) => {
      val frame = Features.rangeW(Seq("user_id"), "ts").rangeBetween(-604800L, 0L)
      ev(s, dir)
        .withColumn("roll_cnt", count(col("value")).over(frame))
        .withColumn("roll_sum", r6(sum(col("value")).over(frame)))
        .withColumn("roll_min", r6(min(col("value")).over(frame)))
        .withColumn("roll_max", r6(max(col("value")).over(frame)))
        .select("user_id", "event_id", "roll_cnt", "roll_sum", "roll_min", "roll_max")
        .orderBy("user_id", "event_id")
    }),

    // §2.5/§2.9 LOCF forward-fill (nulls injected deterministically)
    "q11_locf" -> ((s, dir) => {
      val withNulls = ev(s, dir)
        .withColumn("v", when(pmod(col("event_id"), lit(7L)) === 0, lit(null)).otherwise(col("value")))
      Features.forwardFill(withNulls, Seq("user_id"), "event_id", Seq("v"))
        .select(col("user_id"), col("event_id"), r6(col("v")).as("v_filled"))
        .orderBy("user_id", "event_id")
    }),

    // §2.9 gap-fill: daily grid per user over the global span
    "q12_gapfill" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("sv"))
      GapFill.fillTimeGaps(daily, Seq("user_id"), "day", 86400L)
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(coalesce(col("sv"), lit(-1.0))).as("sv_filled"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.5 days since first observation per group
    "q13_days_since_first" -> ((s, dir) => {
      Features.daysSinceRelease(ev(s, dir), Seq("user_id"), "ts", "value", skipLeadingZeros = true)
        .select("user_id", "event_id", "days_since_release")
        .orderBy("user_id", "event_id")
    }),

    // §2.8 calendar features, pandas-parity definitions
    "q14_calendar" -> ((s, dir) => {
      Features.calendarFeatures(ev(s, dir).select("event_id", "ts"), "ts")
        .select("event_id", "day", "day_of_week", "weekend_flag", "week", "month",
          "year", "quarter", "month_year", "quarter_year")
        .orderBy("event_id")
    }),

    // §2.8 standardize with fitted global stats (+ inverse round-trips in tests)
    "q15_standardize" -> ((s, dir) => {
      val df = ev(s, dir)
      val p = Scalers.fitStandardize(df, "value")
      df.select(col("event_id"), r6(p(col("value"))).as("value_std"))
        .orderBy("event_id")
    }),

    // §2.2/§2.8 clamp negatives + log1p
    "q16_log1p_clamp" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("shifted", col("value") - 100)
        .transform(d => Features.correctNegatives(d, Seq("shifted")))
        .select(col("event_id"), r6(log1p(col("shifted"))).as("log1p_clamped"))
        .orderBy("event_id")
    }),

    // §2.8 error metrics: lag-1 naive forecast scored per event_type
    "q17_error_metrics" -> ((s, dir) => {
      val withPred = Features.lagFeatures(ev(s, dir), Seq("user_id"), "event_id", Seq("value"), Seq(1))
        .withColumnRenamed("value_lag1", "pred")
      Metrics.summarize(withPred, "value", "pred", Seq("event_type"))
        .select(col("event_type"), r6(col("mape")).as("mape"), r6(col("mae")).as("mae"),
          r6(col("rmse")).as("rmse"), r6(col("smape")).as("smape"), col("n"))
        .orderBy("event_type")
    }),

    // §2.4 share-over-threshold per group
    "q18_threshold_share" -> ((s, dir) => {
      ev(s, dir).groupBy(col("user_id"))
        .agg(r6(avg((col("value") > 50).cast("double"))).as("share_gt50"),
          count(lit(1)).as("cnt"))
        .orderBy("user_id")
    }),

    // §2.6 top-k by aggregate
    "q19_topk_users" -> ((s, dir) => {
      ev(s, dir).groupBy(col("user_id"))
        .agg(r6(sum(col("value"))).as("total"))
        .orderBy(col("total").desc, col("user_id"))
        .limit(10)
    }),

    // §2.3 semi-join (EXISTS)
    "q20_semi_join" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      o.join(li(s, dir), o("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    }),

    // §2.3 anti-join (NOT EXISTS)
    "q21_anti_join" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    }),

    // §2.3 broadcast dimension join chain (customer -> nation hierarchy)
    "q22_dim_join" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("n_name")
    }),

    // §2.3 full outer join of two daily series
    "q23_outer_join" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day")).agg(count(lit(1)).as("order_cnt"))
      val l = li(s, dir)
        .groupBy(date_trunc("day", col("l_shipdate")).as("day")).agg(count(lit(1)).as("ship_cnt"))
      o.join(l, Seq("day"), "full_outer")
        .select(unix_timestamp(col("day")).as("day_sec"),
          coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
          coalesce(col("ship_cnt"), lit(0L)).as("ship_cnt"))
        .orderBy("day_sec")
    }),

    // §2.7 union with sample tag (train/test concat pattern, model.py:682-699)
    "q24_union_tag" -> ((s, dir) => {
      val df = ev(s, dir)
      val cut = lit("2024-01-15").cast("timestamp")
      val train = df.filter(col("ts") < cut).withColumn("tag", lit("train"))
      val test = df.filter(col("ts") >= cut).withColumn("tag", lit("test"))
      train.unionByName(test)
        .groupBy(col("tag"), col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy("tag", "event_type")
    }),

    // §2.3 future frame: distinct hierarchy × future dates (model.py:759-777)
    "q25_future_frame" -> ((s, dir) => {
      val df = ev(s, dir)
      val maxDay = df.agg(unix_timestamp(date_trunc("day", max(col("ts")))).as("mx"))
      df.select(col("user_id")).distinct()
        .crossJoin(broadcast(maxDay))
        .select(col("user_id"),
          explode(sequence(col("mx") + 86400L, col("mx") + 3 * 86400L, lit(86400L))).as("day_sec"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.4 EWMA (pandas ewm(span=5, adjust=True) parity) on daily series
    "q26_ewma" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Ewma.ewma(daily, Seq("user_id"), "day", "v", span = 5.0, lagRows = 1, minPeriods = 1)
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v_ewma5")).as("ewma5"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.8 min-max normalize within group (window-fitted params)
    "q27_minmax" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
      ev(s, dir)
        .withColumn("mn", min(col("value")).over(w))
        .withColumn("mx", max(col("value")).over(w))
        .select(col("event_id"),
          r6((col("value") - col("mn")) / (col("mx") - col("mn"))).as("value_norm"))
        .orderBy("event_id")
    }),

    // §2.4 null-masked weighted average (utilities.py:478-481)
    "q28_weighted_avg" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("wt", (pmod(col("user_id"), lit(5L)) + 1).cast("double"))
        .groupBy(col("event_type"))
        .agg(r6(sum(col("value") * col("wt")) / sum(col("wt"))).as("wavg"))
        .orderBy("event_type")
    }),

    // §2.4 missing-percentage profile (utilities.py:511-515)
    "q29_missing_profile" -> ((s, dir) => {
      val withNulls = ev(s, dir)
        .withColumn("v", when(pmod(col("event_id"), lit(7L)) === 0, lit(null)).otherwise(col("value")))
      withNulls.agg(
        r6(avg(when(col("v").isNull, 1.0).otherwise(0.0))).as("pct_null_v"),
        r6(avg(when(col("props").isNull, 1.0).otherwise(0.0))).as("pct_null_props"),
        count(lit(1)).as("n"))
    }),

    // §3 rolling-origin CV fold boundaries (sklearn TimeSeriesSplit parity)
    "q30_cv_folds" -> ((s, dir) => {
      import s.implicits._
      val daily = ev(s, dir).select(date_trunc("day", col("ts")).as("day")).distinct()
      val folds = CrossVal.timeSeriesSplits(daily, "day", nSplits = 4, gap = 0)
      folds.zipWithIndex.map { case (f, i) =>
        (i, f.trainEnd.getTime / 1000, f.testStart.getTime / 1000, f.testEnd.getTime / 1000)
      }.toDF("fold", "train_end", "test_start", "test_end").orderBy("fold")
    })
  )

  /** DuckDB twins of `queries` (ANSI SQL over the same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),6) AS sum_qty,
        |round(sum(l_extendedprice),6) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),6) AS sum_disc_price,
        |round(avg(l_quantity),6) AS avg_qty,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q02_rollup_1m" ->
      """SELECT user_id, epoch(date_trunc('minute', ts))::BIGINT AS bucket_start,
        |count(*) AS cnt, round(sum(value),6) AS sum_value,
        |round(min(value),6) AS min_value, round(max(value),6) AS max_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q03_tier_promote_1h" ->
      """SELECT user_id, epoch(date_trunc('hour', ts))::BIGINT AS bucket_start,
        |count(*) AS cnt, round(sum(value),6) AS sum_value,
        |round(min(value),6) AS min_value, round(max(value),6) AS max_value,
        |round(sum(value)/count(*),6) AS mean_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q04_percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5),6) AS p50,
        |round(quantile_cont(value, 0.95),6) AS p95, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_grouping_sets" ->
      """SELECT event_type, user_id, count(*) AS cnt, round(sum(value),6) AS sum_value,
        |CASE WHEN event_type IS NULL AND user_id IS NULL THEN 3
        |     WHEN user_id IS NULL THEN 1 ELSE 0 END AS lvl
        |FROM events GROUP BY ROLLUP(event_type, user_id)
        |ORDER BY lvl, event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin,

    "q06_lang_card" ->
      """SELECT source, count(DISTINCT lang) AS lang_card, count(*) AS cnt,
        |sum(length(text)) AS sum_len, round(avg(n_chars),6) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_lag" ->
      """SELECT user_id, event_id,
        |round(lag(value,1) OVER (PARTITION BY user_id ORDER BY event_id),6) AS value_lag1
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q08_diff" ->
      """SELECT user_id, event_id,
        |round(value - lag(value,3) OVER (PARTITION BY user_id ORDER BY event_id),6) AS value_diff3
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q09_pct_change" ->
      """WITH t AS (SELECT user_id, event_id,
        |  lag(value,1) OVER (PARTITION BY user_id ORDER BY event_id) AS l1,
        |  lag(value,2) OVER (PARTITION BY user_id ORDER BY event_id) AS l2
        |FROM events)
        |SELECT user_id, event_id,
        |round(CASE WHEN l2 IS NULL OR l2 = 0 THEN NULL ELSE (l1-l2)/l2 END,6) AS pct_change1
        |FROM t ORDER BY user_id, event_id""".stripMargin,

    "q10_rolling_7d" ->
      """SELECT user_id, event_id,
        |count(value) OVER w AS roll_cnt,
        |round(sum(value) OVER w,6) AS roll_sum,
        |round(min(value) OVER w,6) AS roll_min,
        |round(max(value) OVER w,6) AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
        |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q11_locf" ->
      """WITH t AS (SELECT user_id, event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v FROM events)
        |SELECT user_id, event_id,
        |round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),6) AS v_filled
        |FROM t ORDER BY user_id, event_id""".stripMargin,

    "q12_gapfill" ->
      """WITH b AS (SELECT date_trunc('day', min(ts)) AS mn, date_trunc('day', max(ts)) AS mx FROM events),
        |g AS (SELECT unnest(generate_series((SELECT mn FROM b), (SELECT mx FROM b), INTERVAL 1 DAY)) AS day),
        |u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS sv FROM events GROUP BY 1,2)
        |SELECT u.user_id, epoch(g.day)::BIGINT AS day_sec,
        |round(coalesce(a.sv, -1.0),6) AS sv_filled
        |FROM u CROSS JOIN g LEFT JOIN a ON a.user_id = u.user_id AND a.day = g.day
        |ORDER BY u.user_id, day_sec""".stripMargin,

    "q13_days_since_first" ->
      """SELECT user_id, event_id,
        |greatest(coalesce(ts::DATE - (min(CASE WHEN value > 0 THEN ts END)
        |  OVER (PARTITION BY user_id))::DATE, 0), 0) AS days_since_release
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q14_calendar" ->
      """SELECT event_id,
        |dayofmonth(ts) AS day,
        |(dayofweek(ts) + 6) % 7 AS day_of_week,
        |CASE WHEN (dayofweek(ts) + 6) % 7 >= 5 THEN 1 ELSE 0 END AS weekend_flag,
        |((dayofyear(ts) - 1 + 7 - dayofweek(ts)) // 7 + 1)::INT AS week,
        |month(ts) AS month, year(ts) % 100 AS year, quarter(ts) AS quarter,
        |printf('%02dM%02d', year(ts) % 100, month(ts)) AS month_year,
        |printf('%02dQ%d', year(ts) % 100, quarter(ts)) AS quarter_year
        |FROM events ORDER BY event_id""".stripMargin,

    "q15_standardize" ->
      """SELECT event_id,
        |round((value - (SELECT avg(value) FROM events)) / (SELECT stddev_samp(value) FROM events),6) AS value_std
        |FROM events ORDER BY event_id""".stripMargin,

    "q16_log1p_clamp" ->
      """SELECT event_id, round(ln(1 + greatest(value - 100, 0)),6) AS log1p_clamped
        |FROM events ORDER BY event_id""".stripMargin,

    "q17_error_metrics" ->
      """WITH t AS (SELECT event_type, value AS a,
        |  lag(value,1) OVER (PARTITION BY user_id ORDER BY event_id) AS p FROM events)
        |SELECT event_type,
        |round(avg(abs((a-p)/a)),6) AS mape,
        |round(avg(abs(a-p)),6) AS mae,
        |round(sqrt(avg((a-p)*(a-p))),6) AS rmse,
        |round(avg(abs(a-p)*2/(abs(a)+abs(p))),6) AS smape,
        |count(*) AS n
        |FROM t WHERE a IS NOT NULL AND p IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_threshold_share" ->
      """SELECT user_id, round(avg(CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END),6) AS share_gt50,
        |count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_topk_users" ->
      """SELECT user_id, round(sum(value),6) AS total FROM events
        |GROUP BY 1 ORDER BY total DESC, user_id LIMIT 10""".stripMargin,

    "q20_semi_join" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_anti_join" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_dim_join" ->
      """SELECT n_name, count(*) AS cnt, round(sum(o_totalprice),2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_outer_join" ->
      """WITH o AS (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS order_cnt
        |  FROM orders GROUP BY 1),
        |l AS (SELECT date_trunc('day', l_shipdate) AS day, count(*) AS ship_cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT epoch(coalesce(o.day, l.day))::BIGINT AS day_sec,
        |coalesce(o.order_cnt, 0) AS order_cnt, coalesce(l.ship_cnt, 0) AS ship_cnt
        |FROM o FULL OUTER JOIN l ON o.day = l.day ORDER BY day_sec""".stripMargin,

    "q24_union_tag" ->
      """SELECT tag, event_type, count(*) AS cnt FROM (
        |  SELECT 'train' AS tag, event_type FROM events WHERE ts < TIMESTAMP '2024-01-15'
        |  UNION ALL
        |  SELECT 'test' AS tag, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-15')
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q25_future_frame" ->
      """WITH mx AS (SELECT epoch(date_trunc('day', max(ts)))::BIGINT AS m FROM events)
        |SELECT u.user_id, d.day_sec FROM (SELECT DISTINCT user_id FROM events) u
        |CROSS JOIN (SELECT unnest(generate_series((SELECT m+86400 FROM mx),
        |  (SELECT m+3*86400 FROM mx), 86400)) AS day_sec) d
        |ORDER BY u.user_id, d.day_sec""".stripMargin,

    "q26_ewma" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, day, v,
        |  row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
        |s AS (SELECT a.user_id, a.day, a.rn, b.v AS x
        |  FROM r a LEFT JOIN r b ON a.user_id = b.user_id AND b.rn = a.rn - 1)
        |SELECT s1.user_id, epoch(s1.day)::BIGINT AS day_sec,
        |round(sum(power(2.0/3.0, s1.rn - s2.rn) * s2.x) / sum(power(2.0/3.0, s1.rn - s2.rn)),6) AS ewma5
        |FROM s s1 LEFT JOIN s s2 ON s1.user_id = s2.user_id AND s2.rn <= s1.rn AND s2.x IS NOT NULL
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q27_minmax" ->
      """SELECT event_id,
        |round((value - min(value) OVER (PARTITION BY event_type)) /
        |  (max(value) OVER (PARTITION BY event_type) - min(value) OVER (PARTITION BY event_type)),6) AS value_norm
        |FROM events ORDER BY event_id""".stripMargin,

    "q28_weighted_avg" ->
      """SELECT event_type,
        |round(sum(value * (user_id % 5 + 1)) / sum(user_id % 5 + 1),6) AS wavg
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q29_missing_profile" ->
      """SELECT round(avg(CASE WHEN event_id % 7 = 0 THEN 1.0 ELSE 0.0 END),6) AS pct_null_v,
        |round(avg(CASE WHEN props IS NULL THEN 1.0 ELSE 0.0 END),6) AS pct_null_props,
        |count(*) AS n FROM events""".stripMargin,

    "q30_cv_folds" ->
      """WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        |n AS (SELECT count(*) AS c FROM d),
        |r AS (SELECT day, row_number() OVER (ORDER BY day) - 1 AS rn FROM d),
        |f AS (SELECT unnest(generate_series(0, 3)) AS fold)
        |SELECT f.fold,
        |epoch(tr.day)::BIGINT AS train_end,
        |epoch(s.day)::BIGINT AS test_start,
        |epoch(e.day)::BIGINT AS test_end
        |FROM f CROSS JOIN n
        |JOIN r tr ON tr.rn = n.c - (4 - f.fold) * (n.c // 5) - 1
        |JOIN r s ON s.rn = n.c - (4 - f.fold) * (n.c // 5)
        |JOIN r e ON e.rn = n.c - (4 - f.fold) * (n.c // 5) + (n.c // 5) - 1
        |ORDER BY f.fold""".stripMargin
  )
}
