package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.functions.Hier
import graft.operators.Rollup

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
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
