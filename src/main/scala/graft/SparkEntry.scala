package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.functions.Hier
import graft.operators.{Conformal, CrossVal, Dedup, Encoding, Ewma, Features, GapFill, Hist, Intervals, Metrics, Multimodal, Profile, Rollup, Sax, Scalers, Similarity, TextAnalysis}

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

  /** Round to 6 dp, binary-faithfully (matches DuckDB's round-of-the-actual-
    * double). Spark's `round` goes through BigDecimal.valueOf(double) — the
    * SHORTEST decimal repr — so a value whose true binary form is
    * 8.00468749999… but prints as "8.0046875" rounds UP in Spark and DOWN in
    * DuckDB (observed at sf0.1). Multiply/floor on the double itself keeps
    * both engines identical; sign-split mirrors round-half-away-from-zero.
    */
  private def r6(c: Column): Column =
    when(c.isNull, lit(null).cast("double"))
      .otherwise(signum(c) * floor(abs(c) * 1e6 + 0.5) / 1e6)

  private def r2(c: Column): Column =
    when(c.isNull, lit(null).cast("double"))
      .otherwise(signum(c) * floor(abs(c) * 1e2 + 0.5) / 1e2)

  /** Deterministic non-regular link graph on the doc_id domain (q199–q205):
    * a cycle edge (bijective for every n → indegree ≥ 1 everywhere) plus a
    * quadratic and a halving map that skew in-degree. Outdegree exactly 3.
    */
  private def docEdges(s: SparkSession, dir: String): (DataFrame, Long) = {
    val d = docs(s, dir).select(col("doc_id"))
    val n = d.count()
    val src = col("doc_id").cast("long").as("src")
    val edges = Seq(
      d.select(src, pmod(col("doc_id") + 1L, lit(n)).as("dst")),
      d.select(src, pmod(col("doc_id") * col("doc_id") + 3L, lit(n)).as("dst")),
      d.select(src, floor(col("doc_id") / 2L).cast("long").as("dst"))
    ).reduce(_.unionByName(_))
    (edges, n)
  }

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
      // customer is dim-sized at every TPC-H sf (|customer| = |orders|/10);
      // broadcast it explicitly rather than hoping AQE converts the SMJ
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("o_totalprice"))).as("revenue"))
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
      Ewma.ewmaSeriesFrame(daily, Seq("user_id"), "day", "v", spans = Seq(5.0),
          lagRows = 1, minPeriods = 1)
        .select(col("user_id"), col("ts_sec").as("day_sec"),
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
    }),

    // ---- training-data pipeline ops (dedup / similarity / text analysis) ----

    // exact dedup on content digest; duplicates constructed by unioning a
    // shifted-id copy of the corpus
    "q31_exact_dedup" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val uni = base.unionByName(base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exactDedup(uni, "text", "doc_id")
        .select("content_md5", "keep_id", "dup_cnt")
        .orderBy("keep_id")
    }),

    // MinHash signatures (k=4) over word 3-gram shingles
    "q32_minhash_sig" -> ((s, dir) => {
      Dedup.minhashSignature(
          docs(s, dir).filter(col("doc_id") < 200)
            .filter(size(graft.functions.Hashing.words(col("text"))) >= 3)
            .select("doc_id", "text"),
          "text", k = 4)
        .select("doc_id", "mh0", "mh1", "mh2", "mh3")
        .orderBy("doc_id")
    }),

    // MinHash + LSH near-duplicate pairs (8 hashes, 4 bands), Jaccard-verified
    "q33_lsh_near_dup" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id").as("id"), col("text"))
      val uni = base.unionByName(base.select((col("id") + 1000000L).as("id"), col("text")))
      Dedup.lshNearDupPairs(uni, "text", "id", k = 8, bands = 4, threshold = 0.9)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // SimHash 16-bit fingerprints over distinct words
    "q34_simhash" -> ((s, dir) => {
      Dedup.withSimhash(
          docs(s, dir).filter(col("doc_id") < 200)
            .filter(size(graft.functions.Hashing.words(col("text"))) > 0),
          "text", bits = 16)
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    }),

    // n-gram Jaccard similarity pairs within language
    "q35_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(
          docs(s, dir).filter(col("doc_id") < 60), "text", "doc_id",
          groupCols = Seq("lang"), shingleN = 3, minJaccard = 0.0)
        .select(col("lang"), col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy("lang", "id_a", "id_b")
    }),

    // brute-force cosine top-k neighbors (exact ANN baseline)
    "q36_cosine_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 3)
        .select(col("query_id"), col("neighbor_id"), r6(col("sim")).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // hyperplane-LSH bucketed ANN with Hamming-1 multi-probe (the sublinear
    // scale path; recall measured >= 0.9 vs brute force in DedupSimilaritySpec)
    "q37_ann_bucketed" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bucketedTopK(emb.filter(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 3, bits = 8, dim = 64, probeHamming = 1)
        .select(col("query_id"), col("neighbor_id"), r6(col("sim")).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // embedding-cosine near-duplicates, LSH-bucket-pruned; dups constructed
    // by unioning an id-shifted copy
    "q38_embed_near_dup" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 500).select("vec_id", "embedding")
      val uni = emb.unionByName(
        emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      Similarity.nearDupPairs(uni, "vec_id", "embedding", threshold = 0.999,
          bits = 8, dim = 64, tables = 2)
        .select(col("id_a"), col("id_b"), r6(col("cos_sim")).as("cos_sim"))
        .orderBy("id_a", "id_b")
    }),

    // character-trigram language ID: profiles from a DETERMINISTIC hash-
    // sample of the train split (md5(doc_id) % 3 == 0, the scale path — the
    // full-corpus explode was the round-1 scale-killer), argmax
    // profile-overlap prediction on the test split
    "q39_lang_id" -> ((s, dir) => {
      val d = docs(s, dir)
      val train = d.filter(pmod(col("doc_id"), lit(5L)) < 4 && col("lang").isNotNull)
      val profiles = TextAnalysis.langProfiles(train, "text", "lang", topN = 50,
        sampleIdCol = Some("doc_id"), sampleMod = 3)
      val test = d.filter(pmod(col("doc_id"), lit(5L)) === 4)
      TextAnalysis.langId(test, "doc_id", "text", profiles)
        .select(col("id").as("doc_id"), col("pred_lang"), col("score"))
        .orderBy("doc_id")
    }),

    // heuristic quality scoring (length / stopword / punctuation / TTR)
    "q40_quality_score" -> ((s, dir) => {
      TextAnalysis.qualityScore(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"),
          r6(col("mean_token_len")).as("mean_token_len"),
          r6(col("stopword_ratio")).as("stopword_ratio"),
          r6(col("punct_ratio")).as("punct_ratio"),
          r6(col("type_token_ratio")).as("type_token_ratio"),
          r6(col("quality_score")).as("quality_score"))
        .orderBy("doc_id")
    }),

    // token counting: whitespace + BPE-ish regex + distinct
    "q41_token_counts" -> ((s, dir) => {
      TextAnalysis.tokenCounts(docs(s, dir), "text")
        .select("doc_id", "ws_tokens", "regex_tokens", "distinct_tokens")
        .orderBy("doc_id")
    }),

    // bottom-k document fingerprint over 8-char rolling shingle hashes
    "q42_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .filter(length(col("text")) >= 8) // cheap pre-filter == fp.isNotNull
        .withColumn("fp", TextAnalysis.fingerprint(col("text"), k = 4, n = 8))
        .select(col("doc_id"),
          try_element_at(col("fp"), lit(1)).as("fp0"),
          try_element_at(col("fp"), lit(2)).as("fp1"),
          try_element_at(col("fp"), lit(3)).as("fp2"),
          try_element_at(col("fp"), lit(4)).as("fp3"))
        .orderBy("doc_id")
    }),

    // multimodal payload plumbing: binary column metadata + batched
    // (mapPartitions) stub decode — features are deterministic so the oracle
    // replays them. Stub-derived dims are surfaced as stub_* so no consumer
    // mistakes them for codec output (the REAL decode path is q60).
    "q43_media_features" -> ((s, dir) => {
      val withBin = docs(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("url", col("doc_id").cast("string"))
      Multimodal.extractFeatures(withBin, "url", "payload")
        .toDF()
        .select(col("url").cast("long").as("doc_id"), col("byte_len"),
          col("sha_hex"), col("width").as("stub_width"),
          col("height").as("stub_height"), col("n_frames").as("stub_n_frames"))
        .orderBy("doc_id")
    }),

    // §2.5 backward fill (transform.py bfill branch)
    "q44_bfill" -> ((s, dir) => {
      val withNulls = ev(s, dir)
        .withColumn("v", when(pmod(col("event_id"), lit(7L)) === 0, lit(null)).otherwise(col("value")))
      Features.backwardFill(withNulls, Seq("user_id"), "event_id", Seq("v"))
        .select(col("user_id"), col("event_id"), r6(col("v")).as("v_bfilled"))
        .orderBy("user_id", "event_id")
    }),

    // §2.9 linear interpolation between nearest non-null neighbors (north rule)
    "q45_linear_interp" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
        .withColumn("v", when(pmod(unix_timestamp(col("day")) / 86400, lit(4L)) === 1, lit(null))
          .otherwise(col("v")))
      GapFill.linearInterpolate(daily, Seq("user_id"), "day", Seq("v"))
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"), r6(col("v")).as("v_interp"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.4 momentum: lagged value / rolling mean (group-correct; the
    // reference's global-shift numerator is a documented leakage bug)
    "q46_momentum" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.momentum(daily, Seq("user_id"), "day", "v", windowDays = 7, lagDays = 1)
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v_momentum7d")).as("momentum7d"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.4 rolling stats with the reference min_periods gate (ceil(7^0.8)=5)
    "q47_rolling_gated" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.rollingStats(daily, Seq("user_id"), "day", "v",
          windowDays = 7, lagDays = 1, ops = Seq("std", "mean", "sum"))
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v_roll7d_lag1_std")).as("roll_std"),
          r6(col("v_roll7d_lag1_mean")).as("roll_mean"),
          r6(col("v_roll7d_lag1_sum")).as("roll_sum"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.3 keyed update: non-null overwrite via join + coalesce (utilities.py:189-211)
    "q48_keyed_update" -> ((s, dir) => {
      val base = ev(s, dir).select(col("event_id"), col("user_id"), col("value"))
      val updates = base.filter(pmod(col("user_id"), lit(3L)) === 0)
        .select(col("event_id"), (col("value") * 2).as("new_value"))
      base.join(updates, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          r6(coalesce(col("new_value"), col("value"))).as("value_updated"))
        .orderBy("event_id")
    }),

    // §1.1 PK-uniqueness check (main.py:58-69): duplicate-key groups
    "q49_pk_check" -> ((s, dir) => {
      ev(s, dir).groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(count(lit(1)).as("violation_groups"),
          coalesce(sum(col("cnt")), lit(0L)).as("violation_rows"))
    }),

    // §2.4 EWMA crossover: ratio of span-3 to span-5 EWMA (feature_engineering.py:674-693)
    "q50_ewma_crossover" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Ewma.crossovers(daily, Seq("user_id"), "day", "v", spans = Seq(3.0, 5.0),
          lagRows = 1, minPeriods = 1)
        .select(col("user_id"), col("ts_sec").as("day_sec"),
          r6(col("v_ewma_cross_3_5")).as("cross_3_5"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.4 rolling percent-over-threshold with min_periods gate (ref :813-940)
    "q51_threshold_roll" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.percentOverThreshold(daily, Seq("user_id"), "day", "v",
          threshold = 500.0, op = "gt", windowDays = 7, lagDays = 1)
        .withColumnRenamed("v_pct_gt_500.0_7d", "thr_share")
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("thr_share")).as("thr_share"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.4 rolling-percent: lagged value / rolling sum (feature_engineering.py:412-422)
    "q52_rolling_percent" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.rollingPercent(daily, Seq("user_id"), "day", "v", windowDays = 7, lagDays = 1)
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v_rollpct7d")).as("rollpct7d"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.8 ordinal categorical encode + decode round-trip (transform.py:367-428):
    // dictionary = distinct values ordered ascending; code = dense position.
    // Encoding.fitOrdinal builds the dictionary WITHOUT a single-task global
    // window (range-partitioned sort + zipWithIndex).
    "q53_categorical_encode" -> ((s, dir) => {
      val dict = Encoding.fitOrdinal(ev(s, dir), "event_type")
      ev(s, dir).join(broadcast(dict), Seq("event_type"))
        .groupBy(col("event_type"), col("code"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("code")
    }),

    // per-row invariant audit (input_hint: byte-identical derived values per
    // row): recomputed text length must equal the stored n_chars metadata
    "q54_row_invariant" -> ((s, dir) => {
      docs(s, dir).agg(
        count(lit(1)).as("n"),
        sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L)).as("violations"))
    }),

    // §3 the reference's semantic heart composed end-to-end (model.py:654-714):
    // last rolling-origin fold -> train-only standardize -> mask test target
    // -> lag feature over the combined frame (test rows see only train-visible
    // history) -> restore actuals + train/test tag
    "q55_leakfree_cv" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      val days = daily.select(col("day")).distinct()
      val fold = CrossVal.timeSeriesSplits(days, "day", nSplits = 4, gap = 0).last
      CrossVal.leakFreeFold(daily, "day", "v", fold, scalerCols = Seq("v"),
          featureFn = d => Features.lagFeatures(d, Seq("user_id"), "day", Seq("v"), Seq(1)))
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v")).as("v_scaled"), r6(col("v_lag1")).as("v_lag1"),
          col("_sample").as("sample"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.4 rolling median/skew/kurt with the pandas G1/G2 corrections —
    // DuckDB skewness/kurtosis ARE the sample-adjusted G1/G2 (verified), so
    // the oracle reconciles directly; Spark needs the adjustment from its
    // population g1/g2 (Features.rollingStats:94-101)
    "q56_rolling_shape" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.rollingStats(daily, Seq("user_id"), "day", "v",
          windowDays = 7, lagDays = 1, ops = Seq("median", "kurt", "skew"))
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v_roll7d_lag1_median")).as("roll_median"),
          r6(col("v_roll7d_lag1_skew")).as("roll_skew"),
          r6(col("v_roll7d_lag1_kurt")).as("roll_kurt"))
        .orderBy("user_id", "day_sec")
    }),

    // §2.8 categorical encode -> DECODE round trip (transform.py:399-428:
    // codes map back through the saved dictionary); mismatches must be 0
    "q57_categorical_decode" -> ((s, dir) => {
      val dict = Encoding.fitOrdinal(ev(s, dir), "event_type")
      val enc = Encoding
        .encodeOrdinal(ev(s, dir), "event_type", broadcast(dict))
        .select(col("event_id"), col("event_type").as("orig"),
          col("event_type_code").as("code"))
      val dec = Encoding
        .decodeOrdinal(enc, "code", "event_type", broadcast(dict))
        .withColumnRenamed("code_decoded", "decoded")
      dec.groupBy(col("code"), col("decoded"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("decoded") =!= col("orig"), 1L).otherwise(0L)).as("mismatches"))
        .orderBy("code")
    }),

    // §2.4 describe() profile (interpret.py:172-177): 8 exact stats per
    // column, one aggregation pass, exploded to the pandas layout
    "q58_describe_profile" -> ((s, dir) => {
      Profile.describe(
          ev(s, dir).withColumn("user_id_d", col("user_id").cast("double")),
          Seq("value", "user_id_d"))
        .select(col("column"), col("count"), r6(col("mean")).as("mean"),
          r6(col("std")).as("std"), r6(col("min")).as("min"),
          r6(col("p25")).as("p25"), r6(col("p50")).as("p50"),
          r6(col("p75")).as("p75"), r6(col("max")).as("max"))
        .orderBy("column")
    }),

    // the reference's predict() pipeline shape composed end-to-end
    // (model.py:717-791 + 170-199): fit scaler -> scale history -> future
    // frame -> concat -> LOCF-naive forecast replayed over the combined
    // frame -> inverse-scale predictions for the future rows
    "q59_future_e2e" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      val p = Scalers.fitStandardize(daily, "v")
      val scaled = daily.withColumn("v", p(col("v")))
      val mx = daily.agg(unix_timestamp(date_trunc("day", max(col("day")))).as("mx"))
      val future = daily.select(col("user_id")).distinct()
        .crossJoin(broadcast(mx))
        .select(col("user_id"),
          explode(sequence(col("mx") + 86400L, col("mx") + 3 * 86400L, lit(86400L))).as("_ds"))
        .select(col("user_id"), timestamp_seconds(col("_ds")).as("day"))
        .withColumn("v", lit(null).cast("double"))
      val all = scaled.select("user_id", "day", "v")
        .unionByName(future)
        .withColumn("is_future", col("v").isNull)
      val filled = Features.forwardFill(all, Seq("user_id"), "day", Seq("v"))
      filled.filter(col("is_future"))
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(p.inverse(col("v"))).as("pred"))
        .orderBy("user_id", "day_sec")
    }),

    // REAL image pipeline end-to-end: synthesize PNG bytes (dims derived
    // arithmetically from doc_id), decode with the actual javax.imageio
    // codec in batched mapPartitions — decoded dims must round-trip to the
    // arithmetic oracle, proving the decode is real, not derived
    "q60_image_decode" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 200)
        .withColumn("w", (pmod(col("doc_id"), lit(8L)) + 1).cast("int"))
        .withColumn("h", (pmod(col("doc_id"), lit(5L)) + 1).cast("int"))
        .withColumn("payload", Multimodal.pngEncodeUdf(col("w"), col("h"), col("doc_id")))
        .withColumn("url", col("doc_id").cast("string"))
      Multimodal.extractImageFeatures(d, "url", "payload")
        .toDF()
        .select(col("url").cast("long").as("doc_id"), col("media_type"),
          col("width"), col("height"))
        .orderBy("doc_id")
    }),

    // IVF ANN: deterministic coarse quantizer (8 md5-seeded centroids),
    // nProbe=2 inverted-list probing — the learned-quantizer alternative to
    // the q37 hyperplane path
    "q61_ivf_ann" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 3, nlist = 8, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), r6(col("sim")).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // the engine's SIGNATURE path against the independent oracle: 1m blocks
    // (BlockAggregator) -> promote to 1h where p50/p95 are recomputed from
    // the DECODED, k-way-merged Gorilla blocks (Rollup.mergeBlocksUdf) —
    // the oracle computes quantile_cont directly from raw at 1h grain, so a
    // green row proves block encode/merge/percentile exactness end-to-end
    "q62_block_pctl_promote" -> ((s, dir) => {
      val t1m = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(60L)))
        .groupBy(col("user_id"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_len"),
          min(col("value")).as("min_len"), max(col("value")).as("max_len"),
          collect_set(col("event_type")).as("lang_set"),
          graft.functions.codec.BlockAggregator(col("ts_sec"), col("value")).as("m"))
        .withColumn("block", col("m.block")).drop("m")
      Rollup.promote(t1m, 3600L, groupCols = Seq("user_id"))
        .select(col("user_id"), col("bucket_start"), col("cnt"),
          r6(col("sum_len")).as("sum_value"), r6(col("min_len")).as("min_value"),
          r6(col("max_len")).as("max_value"),
          r6(col("p50_len")).as("p50"), r6(col("p95_len")).as("p95"))
        .orderBy("user_id", "bucket_start")
    }),

    // Rollup.rollupHierarchy (stepwise GROUPING-SETS levels with exact
    // block-merged percentiles at EVERY level) vs a DuckDB GROUPING SETS
    // twin — closes the round-2 gap where this ran only inside entry()
    "q63_hier_rollup" -> ((s, dir) => {
      val t1h = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .withColumn("user_id_s", col("user_id").cast("string"))
        .groupBy(col("event_type"), col("user_id_s"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_len"),
          min(col("value")).as("min_len"), max(col("value")).as("max_len"),
          collect_set(col("event_type")).as("lang_set"),
          graft.functions.codec.BlockAggregator(col("ts_sec"), col("value")).as("m"))
        .withColumn("mean_len", col("sum_len") / col("cnt"))
        .withColumn("lang_card", size(col("lang_set")).cast("long"))
        .withColumn("p50_len", col("m.p50")).withColumn("p95_len", col("m.p95"))
        .withColumn("block", col("m.block")).drop("m")
      // mean derived from the ROUNDED sum on both engines: the raw sums
      // differ by summation order below 1e-6 (they round equal), but the
      // raw quotient can straddle a rounding boundary (seen at sf0.1)
      Rollup.rollupHierarchy(t1h, Seq("event_type", "user_id_s"))
        .select(col("event_type"), col("user_id_s"), col("grouping_level"),
          col("bucket_start"), col("cnt"), r6(col("sum_len")).as("sum_value"),
          r6(r6(col("sum_len")) / col("cnt")).as("mean_value"),
          r6(col("p50_len")).as("p50"), r6(col("p95_len")).as("p95"),
          col("lang_card").as("type_card"))
        .orderBy("grouping_level", "event_type", "user_id_s", "bucket_start")
    }),

    // n-gram Jaccard with a BINDING document-frequency cap (maxDf=2): the
    // scale-safe mode (bounds per-shingle join fan-out by min(df, τ)²) under
    // oracle — jaccard is over the df≤τ shingle universe on both engines
    "q64_jaccard_capped" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(
          docs(s, dir).filter(col("doc_id") < 60), "text", "doc_id",
          groupCols = Seq("lang"), shingleN = 3, minJaccard = 0.0,
          maxDf = Some(2L))
        .select(col("lang"), col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy("lang", "id_a", "id_b")
    }),

    // the SQL surface end-to-end: a pure spark.sql query through the
    // FunctionRegistry-registered native expression (GraftExtensions —
    // utf8_char_count == length for valid UTF-8), oracled by DuckDB length()
    "q65_sql_surface" -> ((s, dir) => {
      // the driver's Verify session is NOT built by GraftSession.builder, so
      // register on the live session (idempotent) — also exactly what a user
      // attaching to a foreign session does
      GraftFunctions.register(s)
      docs(s, dir).createOrReplaceTempView("docs_q65")
      s.sql("""SELECT lang, count(*) AS n_docs,
              |  sum(utf8_char_count(text)) AS sum_chars,
              |  max(utf8_char_count(text)) AS max_chars
              |FROM docs_q65 GROUP BY lang ORDER BY lang""".stripMargin)
    }),

    // Gopher-style repetition ratios (duplicate word/2-gram/3-gram fraction)
    // — boilerplate/spam gate; pure projection, no shuffle
    "q66_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionRatios(docs(s, dir), "text")
        .select(col("doc_id"), r6(col("rep_word")).as("rep_word"),
          r6(col("rep_2gram")).as("rep_2gram"), r6(col("rep_3gram")).as("rep_3gram"))
        .orderBy("doc_id")
    }),

    // PII scrubbing with audit counts; emails/IPs are synthesized
    // deterministically from doc_id (the corpus has none) so both engines
    // redact the identical augmented text
    "q67_redact" -> ((s, dir) => {
      val aug = docs(s, dir).withColumn("text2", concat(
        col("text"),
        when(pmod(col("doc_id"), lit(3)) =!= 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string")))
          .otherwise(lit(""))))
      TextAnalysis.redactPii(aug, "text2")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_ips").cast("long").as("n_ips"), col("redacted"))
        .orderBy("doc_id")
    }),

    // the canonical corpus-cleaning pass, composed end-to-end: quality +
    // repetition + token gates -> keep/drop + audit reason, one projection
    // pipeline (thresholds tuned to split this corpus meaningfully)
    "q68_corpus_filter" -> ((s, dir) => {
      TextAnalysis.corpusFilter(docs(s, dir), "text",
          minQuality = 0.4, maxRep3gram = 0.2, minTokens = 25L, maxTokens = 90L)
        .select(col("doc_id"), col("n_tokens"),
          r6(col("quality_score")).as("quality_score"),
          r6(col("rep_3gram")).as("rep_3gram"),
          col("drop_reason"), col("keep"))
        .orderBy("doc_id")
    }),

    // incremental batch-vs-history dedup: Bloom prune + exact anti-join verify
    "q69_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val history = d.filter(col("doc_id") >= 100)
      val batch = d.filter(col("doc_id") < 200)
        .withColumn("text",
          when(col("doc_id") < 100, concat(col("text"), lit(" NOVEL")))
            .otherwise(col("text")))
      Dedup.incrementalDedup(batch, history, "text",
          expectedHistoryItems = 1000L, fpp = 0.01)
        .select(col("doc_id"), md5(col("text")).as("content_md5"))
        .orderBy("doc_id")
    }),

    // gap-based sessionization (30-minute inactivity) + per-session stats
    "q70_sessionize" -> ((s, dir) => {
      graft.operators.Sessions.sessionStats(
          ev(s, dir), Seq("user_id"), "ts", gapSeconds = 1800L, valueCol = "value")
        .select(col("user_id"), col("session_idx"),
          unix_timestamp(col("session_start")).as("start_s"),
          unix_timestamp(col("session_end")).as("end_s"),
          col("duration_sec"), col("n_events"), r6(col("sum_value")).as("sum_value"))
        .orderBy("user_id", "session_idx")
    }),

    // as-of join: attach the most recent purchase at-or-before each click
    "q71_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max(col("value")).as("purchase_value"))
      graft.operators.AsOf.asofJoin(clicks, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", valueCols = Seq("purchase_value"))
        .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
          unix_timestamp(col("matched_ts")).as("matched_s"),
          r6(col("purchase_value")).as("purchase_value"))
        .orderBy("event_id")
    }),

    // deterministic stratified sample: bottom-5 by content hash per language
    "q72_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedBottomK(
          docs(s, dir).select("doc_id", "lang"), Seq("lang"), "doc_id", k = 5)
        .select(col("lang"), col("doc_id"), col("sample_rank").cast("long").as("sample_rank"))
        .orderBy("lang", "sample_rank")
    }),

    // seasonal-naive forecast (m=7 days, h=7) with residual-σ bands
    "q73_snaive_forecast" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.seasonalNaive(daily, Seq("user_id"), "d", "v",
          period = 7, horizon = 7, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"),
          r6(col("lo")).as("lo"), r6(col("hi")).as("hi"))
        .orderBy("user_id", "step")
    }),

    // drift forecast: line through first/last daily observation, h=5
    "q74_drift_forecast" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.drift(daily, Seq("user_id"), "d", "v",
          horizon = 5, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // quantile binning (pandas-qcut shape): value quartile within event type
    "q75_qcut" -> ((s, dir) => {
      Scalers.quantileBin(ev(s, dir).select("event_id", "event_type", "value"),
          Seq("event_type"), "value", "event_id", n = 4)
        .select(col("event_type"), col("event_id"), col("bin").cast("long").as("bin"))
        .orderBy("event_type", "event_id")
    }),

    // HLL lang cardinality per source — estimate vs exact, oracle replays the
    // sketch from first principles in SQL (registers + linear counting)
    "q76_hll_langcard" -> ((s, dir) => {
      import graft.functions.Hll
      docs(s, dir).filter(col("lang").isNotNull)
        .groupBy(col("source"))
        .agg(countDistinct(col("lang")).as("n_langs_exact"),
          Hll.hllSketch(col("lang")).as("_sk"))
        .select(col("source"), col("n_langs_exact"),
          r6(Hll.hllEstimate(col("_sk"))).as("hll_est"))
        .orderBy("source")
    }),

    // connected-components clustering over LSH near-dup pairs (q33's corpus):
    // pairwise similarity → canonical cluster ids + keep-list decision
    "q77_dedup_clusters" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id").as("id"), col("text"))
      val uni = base.unionByName(base.select((col("id") + 1000000L).as("id"), col("text")))
      val pairs = Dedup.lshNearDupPairs(uni, "text", "id", k = 8, bands = 4, threshold = 0.9)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id"), col("component"), col("cluster_size"), col("is_canonical"))
        .orderBy("id")
    }),

    // autocorrelation at lags 1/2/7 over each user's daily series
    "q78_acf" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Features.acf(daily, Seq("user_id"), "d", "v", lags = Seq(1, 2, 7))
        .select(col("user_id"), col("lag").cast("long").as("lag"), r6(col("acf")).as("acf"))
        .orderBy("user_id", "lag")
    }),

    // simple-exponential-smoothing flat forecast (α=0.3, h=5) per user
    "q79_ses_forecast" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.ses(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, horizon = 5, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // count-min-sketch heavy hitters: top-10 exact words vs CMS estimates
    // (oracle replays the whole sketch — buckets, sums, min — in SQL)
    "q80_cms_heavy" -> ((s, dir) => {
      import graft.functions.Cms
      val wordsDf = docs(s, dir)
        .select(explode(graft.functions.Hashing.words(col("text"))).as("word"))
      val sk = wordsDf.agg(Cms.cmsSketch(col("word")).as("_sk"))
      val top = wordsDf.groupBy("word").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("word")).limit(10)
      top.crossJoin(broadcast(sk))
        .select(col("word"), col("exact_cnt"),
          Cms.cmsQuery(col("_sk"), col("word")).as("cms_est"))
        .orderBy(col("exact_cnt").desc, col("word"))
    }),

    // benchmark decontamination: 3-gram containment of candidates vs an
    // eval set (docs 0-19), broadcast benchmark shingle set
    "q81_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") < 20)
      val cands = d.filter(col("doc_id") >= 20 && col("doc_id") < 220)
      graft.operators.TextAnalysis.decontaminate(cands, bench, "text", "doc_id")
        .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
          r6(col("contamination")).as("contamination"))
        .orderBy("doc_id")
    }),

    // MASE: last-5-days test vs train-mean prediction, lag-1 naive scale
    "q82_mase" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val ranked = daily.withColumn("_rd", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("d").desc)))
      val train = ranked.filter(col("_rd") > 5).drop("_rd")
      val pred = train.groupBy("user_id").agg(avg(col("v")).as("p"))
      val test = ranked.filter(col("_rd") <= 5).drop("_rd").join(pred, "user_id")
      Metrics.mase(train, test, Seq("user_id"), "d", "v", "p", m = 1)
        .select(col("user_id"), r6(col("mase")).as("mase"), col("n"))
        .orderBy("user_id")
    }),

    // Croston's intermittent-demand forecast (α=0.3, h=3) on a sparsified
    // daily series (demand only every third day)
    "q83_croston" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
        .withColumn("v",
          when(pmod(unix_timestamp(col("d")) / 86400, lit(3L)) === 0, col("v"))
            .otherwise(lit(0.0)))
      graft.operators.Forecast.croston(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, horizon = 3, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // Theta method (M3 winner): OLS trend line + SES of the theta-2 line,
    // all closed-form — one shuffle on the keys
    "q84_theta" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.theta(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, horizon = 4, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // Holt linear trend (the one fold-based forecaster; oracle replays the
    // coupled (level, trend) recursion with a recursive CTE)
    "q85_holt" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.holt(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, beta = 0.2, horizon = 3, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // robust outlier flags: modified z-score from per-key exact median + MAD
    "q86_mad_outliers" -> ((s, dir) => {
      graft.operators.Anomaly.madOutliers(ev(s, dir), Seq("user_id"), "value")
        .select(col("user_id"), col("event_id"), r6(col("med")).as("med"),
          r6(col("mad")).as("mad"), r6(col("robust_z")).as("robust_z"),
          col("is_outlier"))
        .orderBy("user_id", "event_id")
    }),

    // two-window mean-shift changepoint score on the daily series
    "q87_changepoint" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Anomaly.meanShiftScore(daily, Seq("user_id"), "d", "v", w = 5)
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("mean_l")).as("mean_l"), r6(col("mean_r")).as("mean_r"),
          r6(col("shift_score")).as("shift_score"))
        .orderBy("user_id", "d_s")
    }),

    // Fourier weekly seasonality pair (k=2 harmonics, period 7 days) —
    // pure projection
    "q88_fourier" -> ((s, dir) => {
      Features.fourierTerms(ev(s, dir), "ts", period = 7, k = 2)
        .select(col("event_id"),
          r6(col("fourier_sin_1")).as("fourier_sin_1"),
          r6(col("fourier_cos_1")).as("fourier_cos_1"),
          r6(col("fourier_sin_2")).as("fourier_sin_2"),
          r6(col("fourier_cos_2")).as("fourier_cos_2"))
        .orderBy("event_id")
    }),

    // Box-Cox (λ=0.5) + inverse round-trip: transformed value and the
    // replayed inverse (null for non-positive inputs)
    "q89_boxcox" -> ((s, dir) => {
      val p = Scalers.BoxCoxParams("value", 0.5)
      ev(s, dir)
        .withColumn("bc", p(col("value")))
        .withColumn("back", p.inverse(col("bc")))
        .select(col("event_id"), r6(col("bc")).as("bc"), r6(col("back")).as("back"))
        .orderBy("event_id")
    }),

    // winsorize per user at the exact [p05, p95] band
    "q90_winsorize" -> ((s, dir) => {
      Scalers.winsorize(ev(s, dir), Seq("user_id"), "value")
        .select(col("user_id"), col("event_id"),
          r6(col("value_wins")).as("value_wins"))
        .orderBy("user_id", "event_id")
    }),

    // URL canonicalization: messy urls synthesized from doc_id (cases,
    // default/odd ports, empty paths, unsorted+empty query params,
    // fragments), normalized by the regex-only rule both engines replay
    "q91_url_canon" -> ((s, dir) => {
      val id = col("doc_id")
      val messy = concat(
        when(pmod(id, lit(3)) === 0, lit("HTTPS")).when(pmod(id, lit(3)) === 1, lit("https"))
          .otherwise(lit("HTTP")),
        lit("://W"), pmod(id, lit(50)).cast("string"), lit(".Example.COM"),
        when(pmod(id, lit(4)) === 0, lit(":443")).when(pmod(id, lit(4)) === 1, lit(":8080"))
          .otherwise(lit("")),
        when(pmod(id, lit(5)) === 0, lit("")).otherwise(concat(lit("/p/"), id.cast("string"))),
        when(pmod(id, lit(2)) === 0, lit("?b=2&a=1&")).otherwise(lit("")),
        when(pmod(id, lit(7)) === 0, lit("#frag")).otherwise(lit("")))
      docs(s, dir)
        .select(id, messy.as("url"), Hier.canonicalizeUrl(messy).as("canon"))
        .orderBy("doc_id")
    }),

    // chunk-level (boilerplate) dedup: 8-word chunks, first corpus-wide
    // occurrence wins, docs reassembled from kept chunks
    "q92_chunk_dedup" -> ((s, dir) => {
      Dedup.chunkDedup(docs(s, dir).filter(col("doc_id") < 300), "doc_id", "text")
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("kept_text")).as("kept_md5"))
        .orderBy("doc_id")
    }),

    // classical additive seasonal decomposition, weekly period on the daily
    // series (trend = centered 7-MA, seasonal = centered per-position means).
    // Daily sums run in integer cents (q148's determinism discipline): raw
    // double sums are shuffle-order-dependent in the last ulps, and this
    // chain rounds them through window means + per-phase means at 6 dp
    "q93_seasonal_decomp" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
      Features.seasonalDecompose(daily, Seq("user_id"), "d", "v", period = 7)
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("trend")).as("trend"), r6(col("seasonal")).as("seasonal"),
          r6(col("remainder")).as("remainder"))
        .orderBy("user_id", "d_s")
    }),

    // rolling 7-day Pearson correlation between daily volume and daily count
    "q94_rolling_corr" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"), count(lit(1)).cast("double").as("c"))
      Features.rollingCorr(daily, Seq("user_id"), "d", "v", "c", winRows = 7)
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("rolling_corr")).as("rolling_corr"))
        .orderBy("user_id", "d_s")
    }),

    // pivot (builtin groupBy.pivot with an EXPLICIT value list — no extra
    // distinct pass): event_type → columns of summed value
    "q95_pivot" -> ((s, dir) => {
      ev(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(sum(col("value")))
        .select(col("user_id"), r6(col("click")).as("click"), r6(col("view")).as("view"),
          r6(col("purchase")).as("purchase"), r6(col("signup")).as("signup"),
          r6(col("error")).as("error"))
        .orderBy("user_id")
    }),

    // unpivot/melt (builtin): two measures stacked to (event_id, measure, val)
    "q96_melt" -> ((s, dir) => {
      ev(s, dir)
        .filter(col("event_id") < 1000)
        .select(col("event_id"), col("value").as("v_raw"),
          (col("value") * 2.0).as("v_double"))
        .unpivot(Array(col("event_id")), Array(col("v_raw"), col("v_double")),
          "measure", "val")
        .select(col("event_id"), col("measure"), r6(col("val")).as("val"))
        .orderBy("event_id", "measure")
    }),

    // grouped top-k: top-3 events by value per user, deterministic ties
    "q97_topk_group" -> ((s, dir) => {
      graft.operators.Sampling.topKBy(ev(s, dir), Seq("user_id"), "value",
          "event_id", k = 3)
        .select(col("user_id"), col("rnk"), col("event_id"),
          r6(col("value")).as("value"))
        .orderBy("user_id", "rnk")
    }),

    // data-quality expectations report: one aggregate pass for row checks +
    // one groupBy for the PK uniqueness check
    "q98_expectations" -> ((s, dir) => {
      Profile.expectations(ev(s, dir),
          notNull = Seq("user_id", "ts", "value"),
          unique = Seq(Seq("event_id")),
          ranges = Seq(("value", 0.0, 400.0)),
          accepted = Seq(("event_type", Seq("click", "view", "purchase"))))
        .orderBy("check", "target")
    }),

    // Holt-Winters additive seasonal forecast (period=7 on the daily series;
    // oracle replays the coupled (l, b, s-ring) recursion with a recursive
    // CTE carrying the 7-slot seasonal list)
    "q99_holt_winters" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.holtWinters(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, beta = 0.1, gamma = 0.2, period = 7, horizon = 7,
          stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // rolling exact p25/p75 (arbitrary-q generalization of q56's median)
    "q100_rolling_quantile" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      val p25 = Features.rollingQuantile(daily, Seq("user_id"), "day", "v",
        q = 0.25, windowDays = 7, lagDays = 1)
      Features.rollingQuantile(p25, Seq("user_id"), "day", "v",
          q = 0.75, windowDays = 7, lagDays = 1)
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("v_roll7d_lag1_p25")).as("roll_p25"),
          r6(col("v_roll7d_lag1_p75")).as("roll_p75"))
        .orderBy("user_id", "day_sec")
    }),

    // TF-IDF (sklearn smooth-idf) over the document corpus
    "q101_tfidf" -> ((s, dir) => {
      graft.operators.TextAnalysis.tfidf(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
          r6(col("tfidf")).as("tfidf"))
        .orderBy("doc_id", "term")
    }),

    // BM25 keyword relevance against a literal query term set
    "q102_bm25" -> ((s, dir) => {
      graft.operators.TextAnalysis.bm25(docs(s, dir), "doc_id", "text",
          query = Seq("join", "hash", "scan"))
        .select(col("id").as("doc_id"), r6(col("score")).as("score"),
          col("n_terms_hit"))
        .orderBy("doc_id")
    }),

    // cohort retention matrix (first-seen day × day offset × active users)
    "q103_cohort_retention" -> ((s, dir) => {
      graft.operators.Sessions.cohortRetention(ev(s, dir), "user_id", "ts")
        .select(unix_timestamp(col("cohort_day")).as("cohort_s"),
          col("offset_days").cast("long").as("offset_days"), col("n_active"))
        .orderBy("cohort_s", "offset_days")
    }),

    // 3-step windowed funnel (click → view → purchase within 7 days)
    "q104_window_funnel" -> ((s, dir) => {
      graft.operators.Sessions.windowFunnel(ev(s, dir), Seq("user_id"), "ts",
          "event_type", Seq("click", "view", "purchase"), windowSeconds = 7L * 86400)
        .select(col("user_id"), col("max_step").cast("long").as("max_step"),
          unix_micros(col("t1")).as("t1_us"), unix_micros(col("t2")).as("t2_us"),
          unix_micros(col("t3")).as("t3_us"))
        .orderBy("user_id")
    }),

    // frequency encoding (category -> share of fit rows)
    "q105_freq_encode" -> ((s, dir) => {
      val e = ev(s, dir)
      val dict = Encoding.fitFrequency(e, "event_type")
      Encoding.encodeFrequency(e, "event_type", broadcast(dict))
        .groupBy(col("event_type"))
        .agg(r6(first(col("event_type_freq"))).as("freq"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // smoothed target encoding fit on the train split only (leak-free)
    "q106_target_encode" -> ((s, dir) => {
      val e = ev(s, dir)
      val train = e.filter(col("ts") < lit("2024-01-20").cast("timestamp"))
      val prior = Encoding.fitTargetPrior(train, "value")
      val dict = Encoding.fitTarget(train, "event_type", "value", m = 10.0, prior = prior)
      Encoding.encodeTarget(e, "event_type", broadcast(dict), prior)
        .groupBy(col("event_type"))
        .agg(r6(first(col("event_type_target"))).as("code"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // robust scaler: (x - median) / IQR through the scaler-replay pipeline
    "q107_robust_scale" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = Scalers.fitRobust(e, "value")
      Scalers.applyAll(e, Seq(p))
        .select(col("event_id"), r6(col("value")).as("value_scaled"))
        .orderBy("event_id")
    }),

    // OHLC tick->bar downsample (5m buckets, deterministic tie-break)
    "q108_ohlc" -> ((s, dir) => {
      Features.ohlc(ev(s, dir), Seq("user_id"), "ts", "event_id", "value",
          bucketSeconds = 300L)
        .select(col("user_id"), col("bucket_start"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), col("cnt"))
        .orderBy("user_id", "bucket_start")
    }),

    // time-weighted average over irregular points (1h buckets)
    "q109_twap" -> ((s, dir) => {
      Features.timeWeightedAvg(ev(s, dir), Seq("user_id"), "ts", "event_id",
          "value", bucketSeconds = 3600L)
        .select(col("user_id"), col("bucket_start"), r6(col("twap")).as("twap"),
          col("cnt"))
        .orderBy("user_id", "bucket_start")
    }),

    // retention-tier RANGE READ (the store's serving path): an arbitrary
    // minute-aligned window answered by STITCHING the coarsest tiers that
    // fit (1m edges → 1h edges → 1d interior, Rollup.coverage), p50/p95
    // EXACT via k-way Gorilla-block merge across tiers; the oracle computes
    // straight from raw points over the same window
    "q110_range_read" -> ((s, dir) => {
      val t1m = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(60L)))
        .groupBy(col("user_id"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_len"),
          min(col("value")).as("min_len"), max(col("value")).as("max_len"),
          collect_set(col("event_type")).as("lang_set"),
          graft.functions.codec.BlockAggregator(col("ts_sec"), col("value")).as("m"))
        .withColumn("block", col("m.block")).drop("m")
      val t1h = Rollup.promote(t1m, 3600L, groupCols = Seq("user_id"))
      val t1d = Rollup.promote(t1h, 86400L, groupCols = Seq("user_id"))
      // [2024-01-03 05:23, 2024-01-27 19:41): misaligned on both ends so the
      // cover uses all three tiers (37 1m + 18 1h + 23 1d + 19 1h + 41 1m)
      Rollup.readRange(Map("1m" -> t1m, "1h" -> t1h, "1d" -> t1d),
          1704259380L, 1706384460L, groupCols = Seq("user_id"))
        .select(col("user_id"), col("cnt"), r6(col("sum_len")).as("sum_value"),
          r6(col("min_len")).as("min_value"), r6(col("max_len")).as("max_value"),
          r6(col("p50_len")).as("p50"), r6(col("p95_len")).as("p95"),
          col("lang_card").as("type_card"))
        .orderBy("user_id")
    }),

    // interval containment join as a coarse-bucket EQUI-join (intervals
    // replicated to overlapped buckets, residual predicate on the match —
    // never a theta/nested-loop join): events inside derived per-user
    // 30-minute windows
    "q111_interval_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val iv = e.filter(pmod(col("event_id"), lit(97L)) === 0)
        .select(col("user_id"), col("event_id").as("window_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      Intervals.intervalJoin(e, iv, Seq("user_id"), "ts", "w_start", "w_end",
          bucketSeconds = 1800L, carryCols = Seq("window_id"))
        .select(col("user_id"), col("window_id"), col("event_id"))
        .orderBy("user_id", "window_id", "event_id")
    }),

    // SAX symbolization (Lin et al. 2003): z-normalize per user, PAA over
    // 2-day frames, equiprobable-Gaussian letters — one indexable word per
    // series
    "q112_sax" -> ((s, dir) => {
      Sax.sax(ev(s, dir), Seq("user_id"), "ts", "value",
          frameSeconds = 172800L, alphabet = 4)
        .select(col("user_id"), col("sax_word"), col("n_frames"))
        .orderBy("user_id")
    }),

    // PromQL-style counter increase/rate with reset handling, over a
    // synthetic wraparound counter (cumsum of 1+event_id%7 mod 1000) so
    // resets genuinely occur; deltas computed on the FULL series order so
    // they cross bucket boundaries correctly
    "q113_counter_rate" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val ctr = ev(s, dir).withColumn("counter",
        pmod(sum(lit(1L) + pmod(col("event_id"), lit(7L))).over(win), lit(1000L)))
      Features.counterRate(ctr, Seq("user_id"), "ts", "event_id", "counter",
          bucketSeconds = 3600L)
        .select(col("user_id"), col("bucket_start"),
          r6(col("increase")).as("increase"), col("n_deltas"), col("n_resets"),
          r6(col("rate")).as("rate"))
        .orderBy("user_id", "bucket_start")
    }),

    // rolling OLS slope of value vs time (local linear trend) over the
    // trailing 7 samples; x re-centered per key before the moment sums
    "q114_rolling_slope" -> ((s, dir) => {
      Features.rollingSlope(ev(s, dir), Seq("user_id"), "ts", "value",
          winRows = 7)
        .select(col("user_id"), col("event_id"),
          r6(col("rolling_slope")).as("rolling_slope"))
        .orderBy("user_id", "event_id")
    }),

    // M4 visualization downsample: ≤4 rows (first/last/min/max points) per
    // 6h bucket, ties resolved to the earliest row
    "q115_m4" -> ((s, dir) => {
      Features.m4Downsample(ev(s, dir), Seq("user_id"), "ts", "event_id",
          "value", bucketSeconds = 21600L)
        .select(col("user_id"), col("bucket_start"), col("event_id"),
          r6(col("value")).as("value"), array_join(col("roles"), ",").as("roles"))
        .orderBy("user_id", "bucket_start", "event_id")
    }),

    // mergeable fixed-width histograms THROUGH promotion: 1m histogram tier
    // rows merged elementwise to 1h, exploded to (bin, cnt) rows; the oracle
    // bins raw points directly at 1h grain — proving counter-exact promotion
    "q116_hist_promote" -> ((s, dir) => {
      val h1m = Hist.histogram(ev(s, dir), Seq("user_id"), "ts", "value",
        bucketSeconds = 60L, lo = 0.0, hi = 100.0, nbins = 10)
      Hist.promote(h1m, Seq("user_id"), tierSeconds = 3600L, nbins = 10)
        .select(col("user_id"), col("bucket_start"),
          posexplode(col("hist")).as(Seq("bin", "cnt")))
        .orderBy("user_id", "bucket_start", "bin")
    }),

    // two-sided tabular CUSUM drift detector (Page 1954): per-key
    // standardize, fold s± = max(0, s± ± z − slack), flag either side > h;
    // the oracle replays the recursion as a recursive CTE in identical
    // float op order
    "q117_cusum" -> ((s, dir) => {
      graft.operators.Anomaly.cusum(ev(s, dir), Seq("user_id"), "ts",
          "event_id", "value", slack = 0.5, h = 5.0)
        .select(col("user_id"), col("ts_sec"), col("tie"), r6(col("z")).as("z"),
          r6(col("cusum_pos")).as("cusum_pos"),
          r6(col("cusum_neg")).as("cusum_neg"), col("is_drift"))
        .orderBy("user_id", "ts_sec", "tie")
    }),

    // unigram-LM fluency gate (CCNet-shaped, unigram table in place of
    // KenLM): model trained on a 1/2 hash-sample, vocabulary capped to the
    // top 500 tokens (tail → OOV mass), per-doc bits/token + perplexity
    "q118_lm_score" -> ((s, dir) => {
      TextAnalysis.lmScore(docs(s, dir), "doc_id", "text",
          sampleMod = 2, maxVocab = Some(500))
        .select(col("doc_id"), col("n_tokens"), r6(col("bits")).as("bits"),
          r6(col("ppl")).as("ppl"))
        .orderBy("doc_id")
    }),

    // quantile ESTIMATES from the promoted 1h histograms (uniform-within-bin
    // interpolation, under/overflow clamp) — the fixed-size approximate
    // percentile for tiers where even compressed blocks are too heavy
    "q119_hist_quantile" -> ((s, dir) => {
      val h1m = Hist.histogram(ev(s, dir), Seq("user_id"), "ts", "value",
        bucketSeconds = 60L, lo = 0.0, hi = 100.0, nbins = 10)
      val h1h = Hist.promote(h1m, Seq("user_id"), tierSeconds = 3600L, nbins = 10)
      Hist.quantileEst(h1h, Seq("user_id"), lo = 0.0, hi = 100.0, nbins = 10,
          qs = Seq(0.5, 0.95))
        .select(col("user_id"), col("bucket_start"), col("q"),
          r6(col("est")).as("est"))
        .orderBy("user_id", "bucket_start", "q")
    }),

    // PCA + whitening over the embeddings table, certified by the ANALYTIC
    // invariant: the whitened projections' population covariance is the k×k
    // identity. DETERMINISM: r3 compared 4-dp-rounded covar_pop against
    // literal 1.0/0.0 — but the true diagonal is λᵢ/(λᵢ+eps), and
    // covar_pop's partial-merge order wobbles the last ulp, so a value
    // sitting on a 0.00005 rounding boundary flipped between runs. Now the
    // compared quantity is a BOOLEAN: |cov − expected| < 5e-4, where
    // expected is the model-derived λᵢ/(λᵢ+eps) plan literal (0 off-diag).
    // The tolerance is ~10^12 ulps wide, so merge-order noise (≤ a few
    // ulps) can never flip the bit; the oracle asserts the invariant holds
    // everywhere.
    "q120_pca_whiten" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val model = graft.operators.Pca.fit(emb, "embedding", k = 8)
      val proj = graft.operators.Pca.transform(emb, "embedding", model,
        whiten = true)
      val pairs = for (i <- 0 until 8; j <- 0 until 8) yield (i, j)
      val aggs = pairs.map { case (i, j) =>
        covar_pop(element_at(col("pca"), i + 1),
          element_at(col("pca"), j + 1)).as(s"c_${i}_$j") }
      val eps = 1e-9
      proj.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(pairs.map { case (i, j) =>
          val expected =
            if (i == j) model.eigenvalues(i) / (model.eigenvalues(i) + eps)
            else 0.0
          struct(lit(i).as("i"), lit(j).as("j"),
            (abs(col(s"c_${i}_$j") - lit(expected)) < lit(5e-4))
              .as("identity_ok")) }: _*)).as("e"))
        .select(col("e.i"), col("e.j"), col("e.identity_ok"))
        .orderBy("i", "j")
    }),

    // dashboard SERIES read off the tier store: 90-min resample of a
    // 15.9-day window served from the 5m tier (coarsest divisor of the
    // step), DENSE grid with explicit empty buckets, p50/p95 exact from
    // merged blocks; the oracle re-aggregates raw points per step bucket
    "q121_range_series" -> ((s, dir) => {
      val t1m = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(60L)))
        .groupBy(col("user_id"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_len"),
          min(col("value")).as("min_len"), max(col("value")).as("max_len"),
          collect_set(col("event_type")).as("lang_set"),
          graft.functions.codec.BlockAggregator(col("ts_sec"), col("value")).as("m"))
        .withColumn("block", col("m.block")).drop("m")
      val t5m = Rollup.promote(t1m, 300L, groupCols = Seq("user_id"))
      Rollup.readSeries(Map("1m" -> t1m, "5m" -> t5m),
          1704412800L, 1705789800L, stepSeconds = 5400L,
          groupCols = Seq("user_id"))
        .select(col("user_id"), col("bucket_start"), col("cnt"),
          r6(col("sum_len")).as("sum_value"), r6(col("p50_len")).as("p50"),
          r6(col("p95_len")).as("p95"), col("lang_card").as("type_card"))
        .orderBy("user_id", "bucket_start")
    }),

    // damped-trend Holt (φ = 0.875, exactly representable so the closed-form
    // horizon multiplier replays bit-equal); same daily series as q85
    "q122_holt_damped" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.holtDamped(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, beta = 0.2, phi = 0.875, horizon = 3, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // rolling percent-rank: share of the trailing 10 samples at or below
    // the current value ("how unusual is now")
    "q123_rolling_rank" -> ((s, dir) => {
      Features.rollingPercentRank(ev(s, dir), Seq("user_id"), "ts", "value",
          winRows = 10)
        .select(col("user_id"), col("event_id"),
          r6(col("rolling_pct_rank")).as("pct_rank"))
        .orderBy("user_id", "event_id")
    }),

    // the dedup ENDGAME on q77's cluster graph: per near-dup cluster the
    // highest-score (longest) copy survives, ties to the smallest id,
    // singletons keep themselves
    "q124_dedup_keep" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id").as("id"), col("text"), col("n_chars"))
      val uni = base.unionByName(base.select((col("id") + 1000000L).as("id"),
        col("text"), col("n_chars")))
      val pairs = Dedup.lshNearDupPairs(uni, "text", "id", k = 8, bands = 4,
        threshold = 0.9)
      Dedup.keepBest(uni, "id", "n_chars", pairs)
        .orderBy("id")
    }),

    // per-series trend/seasonal strength (FPP3 §4.3) from the q93
    // decomposition — the triage scalars for million-series populations
    "q125_decomp_strength" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        // integer-cents head: same determinism argument as q93/q148
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
      Features.decompStrength(daily, Seq("user_id"), "d", "v", period = 7)
        .select(col("user_id"), col("n"),
          r6(col("trend_strength")).as("trend_strength"),
          r6(col("seasonal_strength")).as("seasonal_strength"))
        .orderBy("user_id")
    }),

    // Hampel despiking: centered 7-sample window, exact median/MAD via
    // sorted-array HOFs, spikes replaced by the window median
    "q126_hampel" -> ((s, dir) => {
      graft.operators.Anomaly.hampel(ev(s, dir), Seq("user_id"), "ts",
          "value", half = 3, k = 3.0)
        .select(col("user_id"), col("event_id"),
          r6(col("hampel_med")).as("hampel_med"), col("hampel_flag"),
          r6(col("v_filtered")).as("v_filtered"))
        .orderBy("user_id", "event_id")
    }),

    // exponentially-weighted mean + debiased variance (pandas ewm.var
    // semantics); span 3 makes the decay exactly 0.5, so the four running
    // sums replay bit-equal in the recursive-CTE twin
    "q127_ewm_var" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Ewma.ewmVarFrame(daily, Seq("user_id"), "day", "v", span = 3.0)
        .select(col("user_id"), col("ts_sec").as("day_sec"),
          r6(col("ewm_mean")).as("ewm_mean"), r6(col("ewm_var")).as("ewm_var"),
          r6(col("ewm_std")).as("ewm_std"))
        .orderBy("user_id", "day_sec")
    }),

    // C4-style line filtering over a deterministically constructed 4-line
    // page (kept prose line / no-punct line / javascript boilerplate /
    // short-or-kept tail) — line rules catch what page-level scores average
    // away
    "q128_line_filter" -> ((s, dir) => {
      val multi = docs(s, dir).select(col("doc_id"),
        concat(substring(col("text"), 1, 50), lit(".\n"),
          substring(col("text"), 51, 40), lit("\n"),
          lit("Please enable javascript to continue."), lit("\n"),
          substring(col("text"), 91, 60), lit("!")).as("page"))
      TextAnalysis.lineFilter(multi, "doc_id", "page")
        .select(col("doc_id"), col("n_lines"), col("n_kept"), col("clean_text"))
        .orderBy("doc_id")
    }),

    // Schuster periodogram at candidate periods over the daily series —
    // seasonality DETECTION (argmax feeds decompose/fourier)
    "q129_periodogram" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      Features.periodogram(daily, Seq("user_id"), "d", "v",
          periods = Seq(2, 3, 7, 14))
        .select(col("user_id"), col("period"), r6(col("power")).as("power"),
          col("n"))
        .orderBy("user_id", "period")
    }),

    // multiplicative Holt-Winters on the same daily series as q99 — ratio
    // seasonals, swing scales with level
    "q130_holt_winters_mul" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.holtWintersMul(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, beta = 0.1, gamma = 0.2, period = 7, horizon = 7,
          stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // lead-lag detection: y is x delayed by 2 events, so the CCF must peak
    // (exactly 1) at lag −2 under ccf(l) = corr(x_t, y_{t−l})
    "q131_cross_corr" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val xy = ev(s, dir).withColumn("y", lag(col("value"), 2).over(win))
      Features.crossCorrelation(xy, Seq("user_id"), "ts", "value", "y",
          lags = Seq(-2, -1, 0, 1, 2))
        .select(col("user_id"), col("lag"), r6(col("ccf")).as("ccf"))
        .orderBy("user_id", "lag")
    }),

    // categorical concentration per user: entropy + HHI of the event_type
    // distribution — skew, where lang_card only counts
    "q132_concentration" -> ((s, dir) => {
      Profile.concentration(ev(s, dir), Seq("user_id"), "event_type")
        .select(col("user_id"), col("n"), col("n_categories"),
          r6(col("entropy")).as("entropy"), r6(col("hhi")).as("hhi"))
        .orderBy("user_id")
    }),

    // Yeo-Johnson power transform on a SIGNED measure (value - 50, both
    // branches exercised) with the exact piecewise inverse round-tripped
    // inside the oracle row, like q89's Box-Cox
    "q133_yeo_johnson" -> ((s, dir) => {
      val p = Scalers.YeoJohnsonParams("centered", 0.5)
      ev(s, dir)
        .withColumn("centered", col("value") - 50.0)
        .withColumn("yj", p(col("centered")))
        .withColumn("back", p.inverse(col("yj")))
        .select(col("event_id"), r6(col("yj")).as("yj"), r6(col("back")).as("back"))
        .orderBy("event_id")
    }),

    // gaps-and-islands streaks of above-threshold events per user: run id
    // (rn − cond-rn) and running length inside each run
    "q134_streaks" -> ((s, dir) => {
      Features.streaks(ev(s, dir), Seq("user_id"), "ts", col("value") > 60.0)
        .select(col("user_id"), col("event_id"), col("streak_id"),
          col("streak_len"))
        .orderBy("user_id", "event_id")
    }),

    // seasonal fill on an hourly-gridded series: nulls take the most recent
    // value at the SAME hour-of-day (period = 86400 s) — not the previous
    // hour (LOCF) and not a blend (interpolation)
    "q135_seasonal_fill" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("h", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("user_id"), col("h")).agg(sum(col("value")).as("v"))
        .withColumn("ts", timestamp_seconds(col("h")))
        .withColumn("v", when(pmod(col("h") / 3600L, lit(5L)) === 0,
          lit(null)).otherwise(col("v")))
      graft.operators.GapFill.seasonalFill(hourly, Seq("user_id"), "ts",
          Seq("v"), periodSeconds = 86400L)
        .select(col("user_id"), col("h"), r6(col("v")).as("v_filled"))
        .orderBy("user_id", "h")
    }),

    // Winkler interval score + empirical coverage of naive ±15 bands built
    // from each event's predecessor — band quality, which point metrics
    // cannot rank
    "q136_interval_score" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val banded = ev(s, dir)
        .withColumn("lo", lag(col("value"), 1).over(win) - 15.0)
        .withColumn("hi", lag(col("value"), 1).over(win) + 15.0)
      Metrics.intervalScore(banded, Seq("user_id"), "value", "lo", "hi",
          alpha = 0.2)
        .select(col("user_id"), r6(col("interval_score")).as("interval_score"),
          r6(col("coverage")).as("coverage"), col("n"))
        .orderBy("user_id")
    }),

    // split-conformal bands around a persistence forecast, calibrated on the
    // first 24 days and Winkler-scored on the last 6 — the full
    // distribution-free interval pipeline (fit → apply → score) in one plan
    "q137_conformal" -> ((s, dir) => {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val split = lit(java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))
      val withPred = ev(s, dir)
        .withColumn("pred", lag(col("value"), 1).over(win))
        .filter(col("pred").isNotNull && col("value").isNotNull)
      val fitted = Conformal.fitSplitConformal(
        withPred.filter(col("ts") < split), Seq("user_id"), "value", "pred",
        alpha = 0.2)
      val banded = Conformal.applyBands(
        withPred.filter(col("ts") >= split), fitted, Seq("user_id"), "pred")
      Metrics.intervalScore(banded, Seq("user_id"), "value", "lo", "hi",
          alpha = 0.2)
        .join(fitted, "user_id")
        .select(col("user_id"), r6(col("qhat")).as("qhat"), col("n_calib"),
          r6(col("interval_score")).as("interval_score"),
          r6(col("coverage")).as("coverage"), col("n"))
        .orderBy("user_id")
    }),

    // purged K-fold with embargo at day grain: every (fold, role) census —
    // proves the leakage guard rows land exactly where the index math says
    "q138_purged_cv" -> ((s, dir) => {
      val daily = ev(s, dir)
        .select(date_trunc("day", col("ts")).as("d"), col("event_id"))
      CrossVal.purgedFoldAssign(daily, "d", nFolds = 5, purge = 2, embargo = 2)
        .groupBy(col("fold"), col("role"))
        .agg(count(lit(1)).as("n"), min(col("d")).as("d_min"),
          max(col("d")).as("d_max"))
        .orderBy("fold", "role")
    }),

    // Kalman local-level filter over daily sums (q=4, r=16): filtered level,
    // gain, standardized innovation — the sequential gap-aware anomaly score
    "q139_kalman" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Kalman.kalmanLevelFrame(daily, Seq("user_id"), "day", "v",
          q = 4.0, r = 16.0)
        .select(col("user_id"), col("ts_sec").as("day_sec"),
          r6(col("level")).as("level"), r6(col("gain")).as("gain"),
          r6(col("z")).as("z"))
        .orderBy("user_id", "day_sec")
    }),

    // hybrid retrieval: BM25 lexical ranking fused with a dense cosine
    // ranking (query = embedding 1) by reciprocal-rank fusion over the
    // shared integer id space; both systems rank on ROUNDED scores so an
    // independent engine reproduces the exact rank order
    "q140_rrf_hybrid" -> ((s, dir) => {
      val wAll = org.apache.spark.sql.expressions.Window
      // each system cuts its candidate list with a DISTRIBUTED TakeOrdered
      // (orderBy+limit); only the 50 survivors see a rank window
      val bmRank = TextAnalysis.bm25(docs(s, dir), "doc_id", "text",
          query = Seq("join", "hash", "scan"))
        .filter(col("score").isNotNull)
        .withColumn("_r", r6(col("score")))
        .orderBy(col("_r").desc, col("id")).limit(50)
        .withColumn("rank", row_number().over(
          wAll.orderBy(col("_r").desc, col("id"))))
        .select(col("id"), col("rank"))
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val dnRank = emb.filter(col("vec_id") === 1)
        .select(col("embedding").as("qv"))
        .crossJoin(emb.select(col("vec_id").as("id"), col("embedding").as("cv")))
        .filter(col("id") =!= 1)
        .withColumn("sim", graft.operators.Similarity.cosine(col("qv"), col("cv")))
        .filter(col("sim").isNotNull)
        .withColumn("_r", r6(col("sim")))
        .orderBy(col("_r").desc, col("id")).limit(50)
        .withColumn("rank", row_number().over(
          wAll.orderBy(col("_r").desc, col("id"))))
        .select(col("id"), col("rank"))
      graft.operators.Fusion.rrf(Seq(bmRank, dnRank), queryCols = Nil,
          idCols = Seq("id"), rankCol = "rank", kRrf = 60)
        .filter(col("fused_rank") <= 20)
        .select(col("id"), r6(col("rrf_score")).as("rrf_score"),
          col("n_systems"), col("fused_rank"))
        .orderBy("fused_rank")
    }),

    // population stability index per user between the first and second half
    // of the month — the industry drift score, Laplace-smoothed fixed bins
    "q141_psi" -> ((s, dir) => {
      val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val e = ev(s, dir)
      graft.operators.Drift.psi(e.filter(col("ts") < split),
          e.filter(col("ts") >= split), Seq("user_id"), "value", bins = 10)
        .select(col("user_id"), r6(col("psi")).as("psi"), col("n_ref"),
          col("n_cur"))
        .orderBy("user_id")
    }),

    // exact two-sample Kolmogorov-Smirnov statistic per user on the same
    // split — distribution-free, integer cumulative counts divided once
    "q142_ks" -> ((s, dir) => {
      val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val e = ev(s, dir)
      graft.operators.Drift.ks(e.filter(col("ts") < split),
          e.filter(col("ts") >= split), Seq("user_id"), "value")
        .select(col("user_id"), r6(col("ks")).as("ks"), col("n_ref"),
          col("n_cur"))
        .orderBy("user_id")
    }),

    // Theil-Sen robust trend per user over the daily series — median of all
    // pairwise slopes, immune to the outliers that bend an OLS slope
    "q143_theil_sen" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.theilSen(daily, Seq("user_id"), "day", "v", unitSeconds = 86400L)
        .select(col("user_id"), r6(col("ts_slope")).as("ts_slope"),
          r6(col("ts_intercept")).as("ts_intercept"), col("n_pairs"))
        .orderBy("user_id")
    }),

    // lexical diversity per document: type-token ratio + hapax share — the
    // C4/Gopher-class quality gates the surface ratios of q40 can't see
    "q144_vocab" -> ((s, dir) => {
      TextAnalysis.vocabulary(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
          r6(col("ttr")).as("ttr"), r6(col("hapax_ratio")).as("hapax_ratio"))
        .orderBy("doc_id")
    }),

    // corpus Zipf fit over the top-100 terms: distributed TakeOrdered cut,
    // closed-form OLS of ln(freq) on ln(rank)
    "q145_zipf" -> ((s, dir) => {
      TextAnalysis.zipfSlope(docs(s, dir), "text", topK = 100)
        .select(r6(col("zipf_slope")).as("zipf_slope"), col("n_terms"),
          col("max_freq"))
    }),

    // Kaplan-Meier churn curves per event_type: subject = (user, type),
    // duration = active span in days, right-censored if still active in the
    // last 3 days of the month — censoring is what the naive cohort table
    // cannot express
    "q146_km" -> ((s, dir) => {
      val subj = ev(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(date_trunc("day", col("ts"))).as("fd"),
          max(date_trunc("day", col("ts"))).as("ld"))
        .select(col("event_type"),
          datediff(col("ld").cast("date"), col("fd").cast("date")).as("dur"),
          when(col("ld") < lit(java.sql.Timestamp.valueOf("2024-01-28 00:00:00")),
            lit(1)).otherwise(lit(0)).as("churned"))
      graft.operators.Survival.kaplanMeier(subj, Seq("event_type"), "dur",
          "churned")
        .select(col("event_type"), col("t"), col("n_risk"),
          col("n_event").as("d"), r6(col("survival")).as("survival"))
        .orderBy("event_type", "t")
    }),

    // robust centers per event_type: 5-95 trimmed and winsorized means
    // beside the plain mean — the tier-store robust aggregates
    "q147_trimmed_mean" -> ((s, dir) => {
      Profile.trimmedMean(ev(s, dir), Seq("event_type"), "value",
          loQ = 0.05, hiQ = 0.95)
        .select(col("event_type"), r6(col("mean")).as("mean"),
          r6(col("trimmed_mean")).as("trimmed_mean"),
          r6(col("winsor_mean")).as("winsor_mean"), col("n"), col("n_kept"))
        .orderBy("event_type")
    }),

    // seasonal-aware anomaly detection COMPOSED: classical decomposition
    // strips weekly structure, then robust MAD z-scores run on the
    // REMAINDER — a raw-value MAD would flag every seasonal peak; this
    // flags only what the seasonality cannot explain.
    // DETERMINISM: the head quantizes value to integer CENTS before the
    // daily sum (the q152 wasserstein1Quantized discipline) — r3 summed
    // raw doubles, whose shuffle-order-dependent accumulation error
    // (~1e-10 relative over thousands of addends) made one of 3,106
    // 6-dp-rounded rows straddle a 0.0000005 boundary between runs. With
    // exact integer daily sums, every downstream op (7-wide window means,
    // per-phase means, MAD medians) starts from bit-identical inputs and
    // runs in deterministic frame order, so 6-dp rounding is stable.
    "q148_seasonal_esd" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
      val dec = Features.seasonalDecompose(daily, Seq("user_id"), "d", "v",
          period = 7)
        .filter(col("remainder").isNotNull)
      graft.operators.Anomaly.madOutliers(dec, Seq("user_id"), "remainder",
          threshold = 3.0)
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("remainder")).as("remainder"), r6(col("med")).as("med"),
          r6(col("mad")).as("mad"), r6(col("robust_z")).as("robust_z"),
          col("is_outlier"))
        .orderBy("user_id", "d_s")
    }),

    // activity-weighted median of each user's daily mean value — the
    // typical day, with busy days counting proportionally
    "q149_weighted_median" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(avg(col("value")).as("m"), count(lit(1)).as("c"))
      Profile.weightedMedian(daily, Seq("user_id"), "m", "c")
        .select(col("user_id"),
          r6(col("weighted_median")).as("weighted_median"),
          r6(col("total_w")).as("total_w"))
        .orderBy("user_id")
    }),

    // Gini inequality of each user's non-negative event values — the
    // numeric-mass companion of q132's categorical concentration
    "q150_gini" -> ((s, dir) => {
      Profile.gini(ev(s, dir).filter(col("value") >= 0), Seq("user_id"),
          "value")
        .select(col("user_id"), r6(col("gini")).as("gini"), col("n"))
        .orderBy("user_id")
    }),

    // Mann-Kendall monotone-trend test per user on the daily series — the
    // significance companion of q143's Theil-Sen slope; S is an exact
    // integer in both engines
    "q151_mann_kendall" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.mannKendall(daily, Seq("user_id"), "day", "v")
        .select(col("user_id"), col("s"), r6(col("z")).as("z"), col("n"))
        .orderBy("user_id")
    }),

    // 1-Wasserstein drift magnitude per user on the month-half split —
    // PSI/KS say WHETHER the distribution moved; W1 says BY HOW MUCH, in
    // the value's own units. The measure is 2-decimal quantized, so the
    // integer-exact variant runs (bit-exact cross-engine; the generic
    // double path's last ulp is engine-order-dependent)
    "q152_wasserstein" -> ((s, dir) => {
      val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val e = ev(s, dir)
      graft.operators.Drift.wasserstein1Quantized(e.filter(col("ts") < split),
          e.filter(col("ts") >= split), Seq("user_id"), "value", scale = 100L)
        .select(col("user_id"), r6(col("w1")).as("w1"), col("n_ref"),
          col("n_cur"))
        .orderBy("user_id")
    }),

    // Spearman rank correlation per user between daily volume and daily
    // activity — monotone association with average-rank ties (the counts
    // tie constantly, exercising the convention)
    "q153_spearman" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("x"), count(lit(1)).as("y"))
      Features.spearman(daily, Seq("user_id"), "x", "y")
        .select(col("user_id"), r6(col("spearman_rho")).as("spearman_rho"),
          col("n"))
        .orderBy("user_id")
    }),

    // mutual information between event type and weekday — does the MIX of
    // event types depend on the day of week, in one exact-count statistic
    "q154_mutual_info" -> ((s, dir) => {
      val tagged = ev(s, dir)
        .withColumn("dow", dayofweek(col("ts")))
      Profile.mutualInfo(tagged, "event_type", "dow")
        .select(r6(col("mi")).as("mi"), r6(col("h_a")).as("h_a"),
          r6(col("h_b")).as("h_b"), r6(col("mi_norm")).as("mi_norm"),
          col("n_cells"), col("n"))
    }),

    // EWMA control chart COMPOSED: one-step-ahead EWM mean/std (span 3 —
    // alpha exactly 0.5, binary-exact recursion) become ±3σ limits for the
    // NEXT observation; breaches are the classic SPC alert
    "q155_control_chart" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        // integer-cents head: same determinism argument as q93/q148
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
        .withColumn("ts_sec", unix_timestamp(col("day")))
      val stats = Ewma.ewmVarFrame(daily, Seq("user_id"), "day", "v",
        span = 3.0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_sec"))
      daily.join(stats, Seq("user_id", "ts_sec"))
        .withColumn("center", lag(col("ewm_mean"), 1).over(w))
        .withColumn("half", lit(3.0) * lag(col("ewm_std"), 1).over(w))
        .select(col("user_id"), col("ts_sec").as("day_sec"),
          r6(col("v")).as("v"), r6(col("center")).as("center"),
          r6(col("half")).as("half"),
          coalesce(abs(col("v") - col("center")) > col("half"), lit(false))
            .as("breach"))
        .orderBy("user_id", "day_sec")
    }),

    // expected calibration error + Brier of "min-max-scaled value predicts
    // a purchase" — honest answer: barely better than base rate, and ECE
    // quantifies exactly how miscalibrated the scaled score is
    "q156_ece" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull &&
        col("event_type").isNotNull)
      val st = e.agg(min(col("value")).as("_lo"), max(col("value")).as("_hi"))
      val scored = e.crossJoin(broadcast(st))
        .withColumn("p", when(col("_hi") === col("_lo"), lit(0.0))
          .otherwise((col("value") - col("_lo")) / (col("_hi") - col("_lo"))))
        .withColumn("y", when(col("event_type") === "purchase", lit(1.0))
          .otherwise(lit(0.0)))
      graft.operators.Calibration.ece(scored, "p", "y", bins = 10)
        .select(r6(col("ece")).as("ece"), r6(col("brier")).as("brier"),
          r6(col("base_rate")).as("base_rate"), col("n"))
    }),

    // cumulative gains by descending-score decile — does ranking by value
    // concentrate the purchases in the top buckets
    "q157_gain_table" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull &&
          col("event_type").isNotNull)
        .withColumn("y", when(col("event_type") === "purchase", 1L)
          .otherwise(0L))
      graft.operators.Calibration.gainTable(e, "value", "y", "event_id",
          buckets = 10)
        .select(col("bucket"), col("n"), col("positives"),
          col("cum_positives"), r6(col("cum_capture")).as("cum_capture"))
        .orderBy("bucket")
    }),

    // pairwise association rules over (user, day) baskets of event types —
    // support/confidence/lift from exact integer counts
    "q158_assoc_rules" -> ((s, dir) => {
      val baskets = ev(s, dir)
        .withColumn("d", date_trunc("day", col("ts")))
      graft.operators.Assoc.pairRules(baskets, Seq("user_id", "d"),
          "event_type")
        .select(col("item_a"), col("item_b"), col("c_a"), col("c_b"),
          col("c_ab"), col("n_baskets"), r6(col("support")).as("support"),
          r6(col("conf_ab")).as("conf_ab"), r6(col("conf_ba")).as("conf_ba"),
          r6(col("lift")).as("lift"))
        .orderBy("item_a", "item_b")
    }),

    // keyword extraction COMPOSED: top-3 TF-IDF terms per document (ranks
    // on rounded scores so an independent engine reproduces the cut)
    "q159_keywords" -> ((s, dir) => {
      val t = TextAnalysis.tfidf(docs(s, dir), "doc_id", "text")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(r6(col("tfidf")).desc, col("term"))
      t.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
          r6(col("tfidf")).as("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
    }),

    // nDCG@10 per user of the value-ranking against purchase relevance —
    // position-discounted ranking quality, the precise complement of
    // q157's bucket-level gains
    "q160_ndcg" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull &&
          col("event_type").isNotNull)
        .withColumn("rel", when(col("event_type") === "purchase", 1.0)
          .otherwise(0.0))
      graft.operators.Calibration.ndcg(e, Seq("user_id"), "value", "rel",
          "event_id", k = 10)
        .select(col("user_id"), r6(col("dcg")).as("dcg"),
          r6(col("idcg")).as("idcg"), r6(col("ndcg")).as("ndcg"), col("n"))
        .orderBy("user_id")
    }),

    // mean reciprocal rank of the first purchase under each user's
    // value-ranking — the single-number "how early does the ranker find it"
    "q161_mrr" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull &&
          col("event_type").isNotNull)
        .withColumn("rel", when(col("event_type") === "purchase", 1.0)
          .otherwise(0.0))
      graft.operators.Calibration.mrr(e, Seq("user_id"), "value", "rel",
          "event_id")
        .select(r6(col("mrr")).as("mrr"), col("n_queries"), col("n_hit"))
    }),

    // two-proportion z-test per event_type: did each type's share of
    // positive-value events move between the month halves — the RATE drift
    // test beside q141/q142/q152's distribution tests
    "q162_proportion_z" -> ((s, dir) => {
      val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val e = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("pos", when(col("value") > 100.0, 1L).otherwise(0L))
      graft.operators.Drift.proportionZ(e.filter(col("ts") < split),
          e.filter(col("ts") >= split), Seq("event_type"), "pos")
        .select(col("event_type"), r6(col("rate_ref")).as("rate_ref"),
          r6(col("rate_cur")).as("rate_cur"), r6(col("z")).as("z"),
          col("n_ref"), col("n_cur"))
        .orderBy("event_type")
    }),

    // precision/recall@10 per user for the same value-vs-purchase ranking
    // as q160 — set overlap where nDCG grades positions
    "q163_precision_recall" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull &&
          col("event_type").isNotNull)
        .withColumn("rel", when(col("event_type") === "purchase", 1L)
          .otherwise(0L))
      graft.operators.Calibration.precisionRecallAtK(e, Seq("user_id"),
          "value", "rel", "event_id", k = 10)
        .select(col("user_id"), col("hits"), col("n_rel"),
          r6(col("precision_k")).as("precision_k"),
          r6(col("recall_k")).as("recall_k"))
        .orderBy("user_id")
    }),

    // vocabulary drift between the document-corpus halves: share of
    // second-half token OCCURRENCES whose type never appears in the first
    // half — the text analogue of the value-drift family
    "q164_vocab_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      val half = d.agg(percentile(col("doc_id"), lit(0.5)).as("_m"))
      val toks = d.crossJoin(broadcast(half))
        .withColumn("_is_ref", col("doc_id") <= col("_m"))
        .select(col("_is_ref"),
          explode(graft.functions.Hashing.words(lower(col("text")))).as("term"))
      val refVocab = toks.filter(col("_is_ref")).select("term").distinct()
      val cur = toks.filter(!col("_is_ref"))
      cur.join(refVocab.withColumn("_seen", lit(1)), Seq("term"), "left")
        .agg(count(lit(1)).as("n_cur_tokens"),
          sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_oov_tokens"))
        .withColumn("oov_rate", r6(col("n_oov_tokens") / col("n_cur_tokens")))
    }),

    // semi-structured extraction: pull the JSON property out of the props
    // payload (get_json_object — codegen'd, no UDF) and aggregate it per
    // event_type; the projection/predicate surface for nested event payloads
    "q165_json_extract" -> ((s, dir) => {
      ev(s, dir).filter(col("props").isNotNull)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          r6(avg(col("k"))).as("k_avg"), min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))
        .orderBy("event_type")
    }),

    // trapezoidal integral of each user's daily series in value-days —
    // linear interpolation between samples where q109's TWAP holds (LOCF)
    "q166_trapz" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      Features.trapezoidIntegral(daily, Seq("user_id"), "day", "v",
          unitSeconds = 86400L)
        .select(col("user_id"), r6(col("integral")).as("integral"),
          col("n_points"))
        .orderBy("user_id")
    }),

    // exact distinct event types in each user's trailing 7-row window —
    // Spark has no windowed DISTINCT agg, so array_distinct over the frame
    // list expresses it (DuckDB replays with count(DISTINCT) OVER)
    "q167_rolling_distinct" -> ((s, dir) => {
      val w7 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, 0)
      ev(s, dir).filter(col("event_type").isNotNull)
        .withColumn("distinct_types_7",
          size(array_distinct(collect_list(col("event_type")).over(w7))))
        .select(col("user_id"), col("event_id"), col("distinct_types_7"))
        .orderBy("user_id", "event_id")
    }),

    // is each user's arrival process Poisson: exponential MLE over
    // inter-event gaps + one-sample KS against the fitted CDF
    "q168_exp_fit" -> ((s, dir) => {
      graft.operators.Drift.expFitKs(ev(s, dir), Seq("user_id"), "ts")
        .select(col("user_id"), r6(col("lambda")).as("lambda"),
          r6(col("ks_stat")).as("ks_stat"), col("n_gaps"))
        .orderBy("user_id")
    }),

    // Welch's unequal-variance t between the month halves per user, with
    // the Welch-Satterthwaite df — the MEAN-drift test beside q162's rates
    "q169_welch_t" -> ((s, dir) => {
      val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val e = ev(s, dir).filter(col("value").isNotNull)
      def stats(d: DataFrame, m: String, v: String, n: String) =
        d.groupBy(col("user_id")).agg(avg(col("value")).as(m),
          var_samp(col("value")).as(v), count(lit(1)).as(n))
      val j = stats(e.filter(col("ts") < split), "m1", "v1", "n1")
        .join(stats(e.filter(col("ts") >= split), "m2", "v2", "n2"), "user_id")
        .filter(col("n1") >= 2 && col("n2") >= 2)
      val se1 = col("v1") / col("n1"); val se2 = col("v2") / col("n2")
      j.withColumn("t", (col("m1") - col("m2")) / sqrt(se1 + se2))
        .withColumn("df", (se1 + se2) * (se1 + se2) /
          (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)))
        .select(col("user_id"), r6(col("t")).as("t"), r6(col("df")).as("df"),
          col("n1"), col("n2"))
        .orderBy("user_id")
    }),

    // Ljung-Box portmanteau COMPOSED over q78's acf definition (lags 1..5):
    // Q = n(n+2) sum rho_k^2/(n-k) — "is there ANY autocorrelation left"
    "q170_ljung_box" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val nPer = daily.groupBy("user_id").agg(count(lit(1)).as("n"))
      val rho = Features.acf(daily, Seq("user_id"), "d", "v",
        lags = Seq(1, 2, 3, 4, 5))
      rho.join(nPer, "user_id")
        .groupBy(col("user_id"), col("n"))
        .agg(sum(col("acf") * col("acf") / (col("n") - col("lag"))).as("_s"),
          count(col("acf")).as("n_lags"))
        .withColumn("q_stat", col("n") * (col("n") + 2) * col("_s"))
        .select(col("user_id"), r6(col("q_stat")).as("q_stat"), col("n"),
          col("n_lags"))
        .orderBy("user_id")
    }),

    // AR(2) fit per user on the centered daily series — phi2 IS the lag-2
    // partial autocorrelation; rmse is the one-step baseline error
    "q171_ar2" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.arFit2(daily, Seq("user_id"), "day", "v")
        .select(col("user_id"), r6(col("phi1")).as("phi1"),
          r6(col("phi2")).as("phi2"), r6(col("rmse")).as("rmse"),
          col("n_obs"))
        .orderBy("user_id")
    }),

    // seasonal Mann-Kendall (Hirsch & Slack) COMPOSED: the MK test runs
    // WITHIN each weekday season, S and Var pool across seasons — trend
    // detection that weekly cycles cannot fake
    "q172_seasonal_mk" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
        .withColumn("dow", dayofweek(col("day")))
      val mk = Features.mannKendall(daily, Seq("user_id", "dow"), "day", "v")
      mk.groupBy(col("user_id"))
        .agg(sum(col("s")).as("s_total"),
          sum(col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) / lit(18.0))
            .as("_var"),
          count(lit(1)).as("n_seasons"))
        .withColumn("z", when(col("_var") > 0,
          (col("s_total") - signum(col("s_total").cast("double"))) /
            sqrt(col("_var"))))
        .select(col("user_id"), col("s_total"), r6(col("z")).as("z"),
          col("n_seasons"))
        .orderBy("user_id")
    }),

    // rolling 14-day beta of daily volume on daily activity per user —
    // "units of value per extra event, lately"
    "q173_rolling_beta" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("x"), sum(col("value")).as("y"))
      Features.rollingBeta(daily, Seq("user_id"), "day", "x", "y",
          winRows = 14)
        .select(col("user_id"), unix_timestamp(col("day")).as("day_sec"),
          r6(col("rolling_beta")).as("rolling_beta"))
        .orderBy("user_id", "day_sec")
    }),

    // first-order Markov transition matrix over each user's event-type
    // sequence, pooled corpus-wide: P(next | current) from exact counts —
    // the sequence-structure profile beside funnels and sessions
    "q174_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev(s, dir).filter(col("event_type").isNotNull)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = pairs.groupBy("from_type").agg(sum(col("n")).as("n_from"))
      pairs.join(broadcast(fromTot), "from_type")
        .withColumn("p", r6(col("n") / col("n_from")))
        .select(col("from_type"), col("next_type"), col("n"), col("n_from"),
          col("p"))
        .orderBy("from_type", "next_type")
    }),

    // pairwise correlation matrix of the five event types' daily totals —
    // which series co-move (q94's rolling pair generalized to the matrix)
    "q175_corr_matrix" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type").isNotNull)
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(sum(col("value")).as("v"))
      val a = daily.select(col("d"), col("event_type").as("type_a"),
        col("v").as("va"))
      val b = daily.select(col("d"), col("event_type").as("type_b"),
        col("v").as("vb"))
      a.join(b, Seq("d"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(r6(corr(col("va"), col("vb"))).as("corr"),
          count(lit(1)).as("n_days"))
        .orderBy("type_a", "type_b")
    }),

    // entropy rate of the q174 transition chain (joint-weighted conditional
    // entropy, nats): how predictable is the next event given the current —
    // 0 = deterministic sequences, ln(5) = uniform chaos
    "q176_seq_entropy" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev(s, dir).filter(col("event_type").isNotNull)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("f"), col("next_type").as("t"))
        .agg(count(lit(1)).as("n"))
      val fromTot = pairs.groupBy("f").agg(sum(col("n")).as("nf"))
      val tot = pairs.agg(sum(col("n")).as("nt"))
      pairs.join(broadcast(fromTot), "f").join(broadcast(tot))
        .agg(sum((col("n") / col("nt")) *
          (-log(col("n") / col("nf")))).as("entropy_rate"),
          count(lit(1)).as("n_cells"), max(col("nt")).as("n_transitions"))
        .select(r6(col("entropy_rate")).as("entropy_rate"), col("n_cells"),
          col("n_transitions"))
    }),

    // Goh-Barabasi burstiness of inter-event gaps per user:
    // B = (sigma - mu)/(sigma + mu) in [-1, 1] — -1 periodic, 0 Poisson,
    // ->1 bursty; the single-number companion of q168's KS test
    "q177_burstiness" -> ((s, dir) => {
      val tUs = unix_micros(col("ts").cast("timestamp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(tUs)
      val gaps = ev(s, dir)
        .withColumn("_gap", (tUs - lag(tUs, 1).over(w)).cast("double") / lit(1e6))
        .filter(col("_gap").isNotNull && col("_gap") > 0)
      gaps.groupBy(col("user_id"))
        .agg(avg(col("_gap")).as("_mu"), stddev_pop(col("_gap")).as("_sd"),
          count(lit(1)).as("n_gaps"))
        .withColumn("burstiness", when(col("_sd") + col("_mu") > 0,
          (col("_sd") - col("_mu")) / (col("_sd") + col("_mu"))))
        .select(col("user_id"), r6(col("burstiness")).as("burstiness"),
          r6(col("_mu")).as("mean_gap"), col("n_gaps"))
        .orderBy("user_id")
    }),

    // daily quantile fan per event_type (p10/p25/p50/p75/p90) — the
    // dashboard fan-chart read, exact percentiles per bucket
    "q178_fan_chart" -> ((s, dir) => {
      ev(s, dir).filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(r6(percentile(col("value"), lit(0.1))).as("p10"),
          r6(percentile(col("value"), lit(0.25))).as("p25"),
          r6(percentile(col("value"), lit(0.5))).as("p50"),
          r6(percentile(col("value"), lit(0.75))).as("p75"),
          r6(percentile(col("value"), lit(0.9))).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "d")
    }),

    // Mann-Whitney U between the month halves per user over average ranks
    // (no tie correction, pinned) — the NONPARAMETRIC mean-drift test
    // beside q169's Welch t
    "q179_mann_whitney" -> ((s, dir) => {
      val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
      val e = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("_g", when(col("ts") < split, 1L).otherwise(0L))
      val ranked = e
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("value"))).cast("double"))
        .withColumn("_rk", avg(col("_rn")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("value"))))
      ranked.groupBy(col("user_id"))
        .agg(sum(when(col("_g") === 1, col("_rk"))).as("_r1"),
          sum(col("_g")).as("n1"),
          sum(lit(1L) - col("_g")).as("n2"))
        .withColumn("u", col("_r1") - col("n1") * (col("n1") + 1) / lit(2.0))
        .withColumn("z", when(col("n1") > 0 && col("n2") > 0,
          (col("u") - col("n1") * col("n2") / lit(2.0)) /
            sqrt(col("n1") * col("n2") * (col("n1") + col("n2") + 1) / lit(12.0))))
        .select(col("user_id"), r6(col("u")).as("u"), r6(col("z")).as("z"),
          col("n1"), col("n2"))
        .orderBy("user_id")
    }),

    // running-record tracking per user: how many times the daily total set
    // a new all-time high, and when the standing record was set
    "q180_records" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      daily
        .withColumn("_is_rec",
          when(col("v") >= max(col("v")).over(w), 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("_is_rec")).as("n_records"),
          max(when(col("_is_rec") === 1, col("d"))).as("last_record_day"),
          r6(max(col("v"))).as("record_value"),
          count(lit(1)).as("n_days"))
        .orderBy("user_id")
    }),

    // content novelty per document: tf-weighted mean IDF of its tokens
    // (sum(tfidf)/sum(tf) over the q101 frame) — high = niche content worth
    // keeping, low = boilerplate-adjacent
    "q181_idf_novelty" -> ((s, dir) => {
      TextAnalysis.tfidf(docs(s, dir), "doc_id", "text")
        .groupBy(col("id").as("doc_id"))
        .agg((sum(col("tfidf")) / sum(col("tf"))).as("_nov"),
          sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_types"))
        .select(col("doc_id"), r6(col("_nov")).as("novelty"), col("n_tokens"),
          col("n_types"))
        .orderBy("doc_id")
    }),

    // hour-of-day load profile per event_type — the daily-cycle heatmap
    // behind capacity planning (q14's calendar features aggregated)
    "q182_hour_profile" -> ((s, dir) => {
      ev(s, dir).filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("v_avg"))
        .orderBy("event_type", "hr")
    }),

    // changepoint LOCALIZATION composed over q87's shift scores: the single
    // most likely break day per user (rounded-score argmax, earliest tie)
    "q183_changepoint_loc" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val scored = graft.operators.Anomaly.meanShiftScore(daily,
          Seq("user_id"), "d", "v", w = 5)
        .filter(col("shift_score").isNotNull)
        .withColumn("_r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(r6(col("shift_score")).desc, col("d"))))
      scored.filter(col("_r") === 1)
        .select(col("user_id"), unix_timestamp(col("d")).as("break_day_sec"),
          r6(col("shift_score")).as("shift_score"))
        .orderBy("user_id")
    }),

    // maximum drawdown of each user's daily series: the deepest drop from
    // a running peak — pure max/min/subtraction window algebra, no float
    // accumulation anywhere
    "q184_drawdown" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      daily
        .withColumn("_dd", max(col("v")).over(w) - col("v"))
        .groupBy(col("user_id"))
        .agg(r6(max(col("_dd"))).as("max_drawdown"),
          r6(max(col("v"))).as("peak"), count(lit(1)).as("n_days"))
        .orderBy("user_id")
    }),

    // the longest silence per user (max inter-event gap) and when it ended
    // — the availability/liveness read; again pure lag/max algebra
    "q185_max_silence" -> ((s, dir) => {
      val tUs = unix_micros(col("ts").cast("timestamp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(tUs, col("event_id"))
      ev(s, dir)
        .withColumn("_gap", tUs - lag(tUs, 1).over(w))
        .filter(col("_gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(col("_gap")).as("max_gap_us"), count(lit(1)).as("n_gaps"))
        .withColumn("max_gap_hours", r6(col("max_gap_us").cast("double") /
          lit(3600e6)))
        .select(col("user_id"), col("max_gap_us"), col("max_gap_hours"),
          col("n_gaps"))
        .orderBy("user_id")
    }),

    // per-source corpus governance: volume, size, language diversity — the
    // source-mix report every training-data pipeline publishes
    "q186_source_mix" -> ((s, dir) => {
      docs(s, dir).filter(col("source").isNotNull)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          r6(avg(col("n_chars"))).as("mean_chars"),
          count_distinct(col("lang")).as("n_langs"))
        .orderBy("source")
    }),

    // language-by-source chi-square independence from exact counts — is
    // the language mix uniform across sources, or do sources specialize
    "q187_lang_source_chi2" -> ((s, dir) => {
      val cells = docs(s, dir)
        .filter(col("source").isNotNull && col("lang").isNotNull)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy("source").agg(sum(col("o")).as("nr"))
      val colT = cells.groupBy("lang").agg(sum(col("o")).as("nc"))
      val tot = cells.agg(sum(col("o")).as("n"))
      cells.join(broadcast(rowT), "source").join(broadcast(colT), "lang")
        .join(broadcast(tot))
        .withColumn("_e", col("nr").cast("double") * col("nc") / col("n"))
        .agg(r6(sum((col("o") - col("_e")) * (col("o") - col("_e")) /
          col("_e"))).as("chi2"),
          count(lit(1)).as("n_cells"), max(col("n")).as("n"))
    }),

    // exact-duplicate rate per source — which ingest feeds are dirty
    "q188_dup_rate" -> ((s, dir) => {
      docs(s, dir).filter(col("source").isNotNull)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(md5(col("text"))).as("n_distinct"))
        .withColumn("dup_rate", r6((col("n_docs") - col("n_distinct")) /
          col("n_docs")))
        .orderBy("source")
    }),

    // TPC-H Q5-shaped five-table chain: revenue by nation within one
    // region — dimension tables broadcast, only the two fact tables shuffle
    "q189_revenue_by_nation" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val nat = s.read.parquet(s"$dir/nation.parquet")
      val reg = s.read.parquet(s"$dir/region.parquet")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // order-priority mix by month — pure integer counts, the order-book
    // seasonality read
    "q190_priority_mix" -> ((s, dir) => {
      val ord = s.read.parquet(s"$dir/orders.parquet")
      ord.filter(col("o_orderpriority").isNotNull)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          r6(avg(col("o_totalprice"))).as("avg_price"))
        .orderBy("mon", "o_orderpriority")
    }),

    // Exact heavy hitters via two-pass Misra–Gries (k=64 counters per
    // group, candidates re-counted exactly): the scale-right way to find
    // frequent items without shuffling the long tail. The item domain is
    // constructed skewed (70% of rows carry a unique tail item, 30%
    // concentrate on 3 hot items) so the MG eviction path is genuinely
    // exercised — the tail domain (~1400 distinct per group at sf0.01) is
    // 20× the counter budget. The threshold max(minCount, floor(N_g/k)+1)
    // makes the MG pass lossless, so the output equals the oracle's full
    // groupBy-count HAVING answer exactly.
    "q191_heavy_hitters" -> ((s, dir) => {
      val items = ev(s, dir).select(col("event_type"),
        when(pmod(col("event_id"), lit(10)) < 7,
          concat(lit("u"), col("event_id")))
          .otherwise(concat(lit("hot_"), pmod(col("event_id"), lit(3))))
          .as("item0"))
      graft.operators.HeavyHitters.frequentItems(
          items, Seq("event_type"), "item0", k = 64, minCount = 1L)
        .select(col("event_type"), col("item"), col("cnt"), col("n_group"),
          col("threshold").cast("long").as("threshold"))
        .orderBy("event_type", "item")
    }),

    // DDSketch relative-error quantile sketch (α=2%) on cents-quantized
    // event values: per-user sketches MERGED to event_type (tests full
    // mergeability), then p50/p95 bucket lookup. Output compares the
    // bucket INDEXES — integers, so the oracle twin (same log-bucket
    // formula, verified ulp-identical across engines for the whole
    // integer domain 1..10⁶) matches exactly.
    "q192_ddsketch" -> ((s, dir) => {
      val cents = ev(s, dir)
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      val perUser = graft.operators.Sketch.build(
        cents, Seq("event_type", "user_id"), "cents", alpha = 0.02)
      val merged = graft.operators.Sketch.merge(perUser, Seq("event_type"))
      graft.operators.Sketch.quantiles(merged, Seq("event_type"),
          qs = Seq(0.5, 0.95), alpha = 0.02)
        .select(col("event_type"), col("q"), col("n"), col("bucket"))
        .orderBy("event_type", "q")
    }),

    // Spectral entropy of the Schuster periodogram (q129's spectrum):
    // how concentrated is the series' energy across candidate periods —
    // ≈0 for a pure seasonal signal, ≈1 for white noise. Dominant period
    // chosen on the 6-dp-rounded power with a smallest-period tie-break
    // (cross-engine-safe ranking).
    "q193_spectral_entropy" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val per = Features.periodogram(daily, Seq("user_id"), "d", "v",
        periods = Seq(2, 3, 7, 14))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      val p = per
        .withColumn("p_share", col("power") / sum(col("power")).over(w))
        .withColumn("dom_rn", row_number().over(
          w.orderBy(r6(col("power")).desc, col("period").asc)))
      p.groupBy(col("user_id"))
        .agg(
          r6(-sum(when(col("p_share") > 0,
            col("p_share") * log(col("p_share"))).otherwise(lit(0.0))) /
            log(count(lit(1)).cast("double"))).as("spectral_entropy"),
          max(when(col("dom_rn") === 1, col("period"))).as("dominant_period"))
        .orderBy("user_id")
    }),

    // Tracking-param scrub (Hier.stripTracking: utm_*/gclid/fbclid removal
    // with separator repair) COMPOSED with the q91 canonicalizer — the full
    // normalize-before-dedup chain of a crawl pipeline, mapping every
    // tracking-decorated variant of a page to one dedup key. URLs are
    // constructed deterministically from doc_id in BOTH engines; the
    // oracle replays strip + canonicalize regex-for-regex.
    "q194_url_scrub" -> ((s, dir) => {
      val id = col("doc_id")
      val messy = concat(lit("https://Tr."), col("source"),
        lit(".Example.COM:443/p/"), id.cast("string"),
        lit("?utm_source=feed&b="), id.cast("string"), lit("&utm_campaign=x&a=1"),
        when(pmod(id, lit(7)) === 0, lit("#sec")).otherwise(lit("")))
      docs(s, dir)
        .select(id, Hier.stripTracking(messy).as("scrubbed"))
        .withColumn("canon", Hier.canonicalizeUrl(col("scrubbed")))
        .orderBy("doc_id")
    }),

    // LTTB chart downsampling (Steinarsson 2013) of each user's daily
    // integer-cents series to 20 points: shape-preserving companion to M4
    // (q115). Integer-valued x (day index) and y (cents) make every
    // triangle-area term float-exact, so the per-bucket argmax — the
    // whole algorithm — is engine-independent; the oracle replays the
    // sequential pick with a recursive CTE over the same list state.
    "q195_lttb" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"),
          (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
            .cast("long").as("d"))
        .agg(sum(floor(col("value") * 100 + 0.5)).cast("long").as("cents"))
      graft.operators.Lttb.downsample(daily, Seq("user_id"), "d", "cents",
          threshold = 20)
        .select(col("user_id"), col("x").as("d"), col("y").cast("long").as("cents"))
        .orderBy("user_id", "d")
    }),

    // Sketch-tier cascade: 1m DDSketch tier rows (fixed-size map column +
    // associative measures) PROMOTED to 1h — the q62/q03 consistency
    // contract for the sketch fallback path. Oracle computes the 1h grain
    // directly from raw: measures must re-aggregate exactly and the
    // promoted sketch must answer p50/p95 with the same bucket the direct
    // build would (all-integer output).
    "q196_sketch_promote" -> ((s, dir) => {
      import graft.operators.Sketch
      val cents = ev(s, dir)
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      val t1m = Sketch.tierSketch(cents, Seq("event_type"), "ts", "cents",
        bucketSeconds = 60L, alpha = 0.02)
      val t1h = Sketch.promoteSketch(t1m, Seq("event_type"), tierSeconds = 3600L)
      t1h.select(col("event_type"), col("bucket_start"), col("cnt"),
          col("sum_v").as("sum_cents"), col("min_v").as("min_cents"),
          col("max_v").as("max_cents"),
          Sketch.quantileFromMap(col("dd_sketch"), 0.5).as("p50_b"),
          Sketch.quantileFromMap(col("dd_sketch"), 0.95).as("p95_b"))
        .orderBy("event_type", "bucket_start")
    }),

    // Z-order (Morton) clustering key over (user_id, minute-of-day) — the
    // write-time layout primitive that gives parquet row groups bounded
    // min/max ranges on BOTH dimensions (functions.ZOrder scaladoc). Pure
    // 64-bit shift/or/mask arithmetic, replayed step-for-step by the
    // oracle — integer-exact across engines.
    "q197_zorder" -> ((s, dir) => {
      val base = ev(s, dir).select(col("event_id"),
        col("user_id").as("a"),
        floor(pmod(unix_timestamp(col("ts")), lit(86400L)) / lit(60L))
          .cast("long").as("b"))
      base
        .withColumn("zkey", graft.functions.ZOrder.interleave(col("a"), col("b")))
        .orderBy("event_id")
    }),

    // Sliding-window distinct from per-bucket HLL registers: trailing-3
    // 10-minute buckets per event_type (range frame — gaps contribute
    // nothing). The oracle replays registers + linear counting from first
    // principles (q76's machinery) over the same trailing range, plus the
    // exact per-bucket and windowed distinct counts.
    "q198_sliding_distinct" -> ((s, dir) => {
      val items = ev(s, dir).select(col("event_type"), col("ts"),
        concat(lit("u"), pmod(col("event_id"), lit(97))).as("item"))
      graft.functions.Hll.slidingDistinct(items, Seq("event_type"), "ts",
          "item", bucketSeconds = 600L, k = 3)
        .select(col("event_type"), col("bucket_start"), col("bucket_distinct"),
          r6(col("window_distinct_est")).as("window_distinct_est"))
        .orderBy("event_type", "bucket_start")
    }),

    // PageRank over a deterministic, non-regular link graph on the doc_id
    // domain: a cycle edge (i+1 mod n — a bijection for every n, so
    // indegree >= 1 everywhere and the oracle's inner-join recursion keeps
    // all nodes) plus a quadratic and a halving map that skew indegree
    // (ranks span ~0.2x..6x uniform). Outdegree is exactly 3 by
    // construction. Ranks reported n-normalized (uniform = 1.0) so the 6-dp
    // round keeps full precision at any sf.
    "q199_pagerank" -> ((s, dir) => {
      val (edges, n) = docEdges(s, dir)
      graft.operators.Graph.pageRank(edges, iterations = 10)
        .select(col("id"), r6(col("rank") * n).as("rank_norm"))
        .orderBy("id")
    }),

    // multi-source BFS crawl depth over the same deterministic link graph:
    // min link hops from seed docs 0..4, capped at 8 levels. Frontier-only
    // expansion (each level joins just the newly discovered nodes); the
    // oracle replays it with a deduplicating recursive CTE + min(hop).
    // All-integer output — no float rounding concerns.
    "q200_crawl_depth" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      val seeds = docs(s, dir).filter(col("doc_id") < 5).select(col("doc_id").as("id"))
      graft.operators.Graph.hopDistance(edges, seeds, maxHops = 8)
        .orderBy("id")
    }),

    // per-node triangle count + local clustering coefficient on the
    // undirected simple projection of the link graph (compact-forward,
    // degree-ordered enumeration — Graph.triangles scaladoc). The oracle
    // counts each triangle once via the value-ordered x<y<z join and fans
    // it to its three vertices; counts are integer-exact, the coefficient
    // is one double division.
    "q201_triangles" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.triangles(edges)
        .select(col("id"), col("degree"), col("tri_cnt"),
          r6(col("clustering_coeff")).as("clustering_coeff"))
        .orderBy("id")
    }),

    // transparent continuous-aggregate routing (plans.TierRoute): a 1m tier
    // is materialized once, a Route registered, and the HOURLY aggregate
    // below is phrased AGAINST THE RAW events table — the optimizer rule
    // rewrites it onto the tier (count->sum(cnt), sum->sum(sum),
    // avg->sum/sum, min/max of partials) and the require() proves the
    // rewrite actually fired (the optimized plan must scan the tier
    // parquet, not events). The oracle aggregates raw directly — parity IS
    // the routing contract.
    "q202_tier_route" -> ((s, dir) => {
      import graft.plans.TierRoute
      val tierPath = s"${System.getProperty("java.io.tmpdir")}/graft_route_tier_${Integer.toHexString(dir.hashCode)}"
      val raw = ev(s, dir)
      val u = unix_timestamp(col("ts"))
      raw.groupBy(col("user_id"), (u - pmod(u, lit(60L))).as("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
          min("value").as("min_value"), max("value").as("max_value"))
        .write.mode("overwrite").parquet(tierPath)
      TierRoute.install(s)
      TierRoute.register(TierRoute.Route(
        name = s"events_1m_$dir", raw = raw, tierSeconds = 60L,
        tier = () => s.read.parquet(tierPath),
        groupCols = Seq("user_id"), tsCol = "ts",
        measure = TierRoute.AttrMeasure("value"), measureNonNull = true))
      val cut = 1704240000L // 2024-01-03T00:00:00Z, hour-aligned
      val routed = raw
        .filter(u >= lit(cut))
        .groupBy(col("user_id"), (u - pmod(u, lit(3600L))).as("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
          avg("value").as("avg_value"), min("value").as("min_value"),
          max("value").as("max_value"))
        .select(col("user_id"), col("bucket_start"), col("cnt"),
          r6(col("sum_value")).as("sum_value"), r6(col("avg_value")).as("avg_value"),
          r6(col("min_value")).as("min_value"), r6(col("max_value")).as("max_value"))
        .orderBy("user_id", "bucket_start")
      val scanned = TierRoute.relationPaths(routed.queryExecution.optimizedPlan)
      require(scanned.exists(_.contains(tierPath)),
        s"tier route did not fire — scanned $scanned")
      routed
    }),

    // percentile routing: the tier additionally carries Gorilla point
    // blocks (BlockAggregator), and the raw-phrased HOURLY
    // percentile(value, .5/.95) is rewritten onto the k-way block merge
    // (collect_list(block) -> mergeBlocksUdf -> struct fields) — the
    // optimizer meeting the engine's signature exact-percentile promotion.
    // Oracle: quantile_cont on raw at the same grain; parity is exact, 6-dp
    // rounded on both sides.
    "q203_route_pctl" -> ((s, dir) => {
      import graft.plans.TierRoute
      val tierPath = s"${System.getProperty("java.io.tmpdir")}/graft_route_blk_${Integer.toHexString(dir.hashCode)}"
      val raw = ev(s, dir)
      val u = unix_timestamp(col("ts"))
      raw.groupBy(col("user_id"), (u - pmod(u, lit(60L))).as("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
          min("value").as("min_value"), max("value").as("max_value"),
          graft.functions.codec.BlockAggregator(u, col("value")).as("m"))
        .withColumn("block", col("m.block")).drop("m")
        .write.mode("overwrite").parquet(tierPath)
      TierRoute.install(s)
      TierRoute.register(TierRoute.Route(
        name = s"events_1m_blocks_$dir", raw = raw, tierSeconds = 60L,
        tier = () => s.read.parquet(tierPath),
        groupCols = Seq("user_id"), tsCol = "ts",
        measure = TierRoute.AttrMeasure("value"), measureNonNull = true,
        blockCol = Some("block")))
      val routed = raw
        .groupBy(col("user_id"), (u - pmod(u, lit(3600L))).as("bucket_start"))
        .agg(percentile(col("value"), lit(0.5)).as("p50_v"),
          percentile(col("value"), lit(0.95)).as("p95_v"),
          count(lit(1)).as("cnt"))
        .select(col("user_id"), col("bucket_start"),
          r6(col("p50_v")).as("p50_v"), r6(col("p95_v")).as("p95_v"), col("cnt"))
        .orderBy("user_id", "bucket_start")
      val scanned = TierRoute.relationPaths(routed.queryExecution.optimizedPlan)
      require(scanned.exists(_.contains(tierPath)),
        s"percentile tier route did not fire — scanned $scanned")
      routed
    }),

    // crawl-frontier prioritization: the canonical composition of link
    // analysis with the corpus quality pipeline — priority = n-normalized
    // PageRank x heuristic quality score (q40's formula). Null quality
    // (empty docs) propagates to null priority on both sides.
    "q204_crawl_priority" -> ((s, dir) => {
      val (edges, n) = docEdges(s, dir)
      val pr = graft.operators.Graph.pageRank(edges, iterations = 10)
        .select(col("id").as("doc_id"), (col("rank") * n).as("rank_norm"))
      val q = TextAnalysis.qualityScore(docs(s, dir), "text")
        .select(col("doc_id"), col("quality_score"))
      pr.join(q, "doc_id")
        .select(col("doc_id"), r6(col("rank_norm")).as("rank_norm"),
          r6(col("quality_score")).as("quality_score"),
          r6(col("rank_norm") * col("quality_score")).as("priority"))
        .orderBy("doc_id")
    }),

    // HITS hubs & authorities: un-normalized alternating power iteration is
    // integer-EXACT in doubles (all-ones start, integer sums throughout —
    // Graph.hits scaladoc), so Spark and the oracle recursion agree
    // bit-for-bit until the single final normalization division.
    "q205_hits" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      // 6 iterations: the deepest whose score totals stay inside 2^53 at
      // sf0.1 (probed: sum_auth ~4.9e14 at T=6, ~5e16 at T=7)
      graft.operators.Graph.hits(edges, iterations = 6)
        .select(col("id"), r6(col("hub_norm")).as("hub_norm"),
          r6(col("auth_norm")).as("auth_norm"))
        .orderBy("id")
    }),

    // distinct-count routing: the tier carries per-bucket value SETS
    // (collect_set — the lang_set pattern at page scale), and the
    // raw-phrased hourly count(DISTINCT event_type) is rewritten onto the
    // exact set re-merge (size(array_distinct(flatten(collect_list(set))))).
    "q206_route_distinct" -> ((s, dir) => {
      import graft.plans.TierRoute
      val tierPath = s"${System.getProperty("java.io.tmpdir")}/graft_route_set_${Integer.toHexString(dir.hashCode)}"
      val raw = ev(s, dir)
      val u = unix_timestamp(col("ts"))
      raw.groupBy(col("user_id"), (u - pmod(u, lit(60L))).as("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
          min("value").as("min_value"), max("value").as("max_value"),
          collect_set(col("event_type")).as("type_set"))
        .write.mode("overwrite").parquet(tierPath)
      TierRoute.install(s)
      TierRoute.register(TierRoute.Route(
        name = s"events_1m_sets_$dir", raw = raw, tierSeconds = 60L,
        tier = () => s.read.parquet(tierPath),
        groupCols = Seq("user_id"), tsCol = "ts",
        measure = TierRoute.AttrMeasure("value"), measureNonNull = true,
        distinctCol = Some(("event_type", "type_set"))))
      val routed = raw
        .groupBy(col("user_id"), (u - pmod(u, lit(3600L))).as("bucket_start"))
        .agg(countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("cnt"), sum("value").as("sum_value"))
        .select(col("user_id"), col("bucket_start"), col("n_types"), col("cnt"),
          r6(col("sum_value")).as("sum_value"))
        .orderBy("user_id", "bucket_start")
      val scanned = TierRoute.relationPaths(routed.queryExecution.optimizedPlan)
      require(scanned.exists(_.contains(tierPath)),
        s"distinct tier route did not fire — scanned $scanned")
      routed
    }),

    // week-over-week on the daily tier: calendar-exact via a self-join on
    // date - 7 (NOT lag(7) — a missing day would silently shift the
    // comparison), delta integer-exact on the count measure.
    "q207_wow" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Features.periodOverPeriod(
          daily, Seq("event_type"), "day", "cnt", periodDays = 7)
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("cnt"), col("prev_value").as("prev_cnt"), col("delta"),
          r6(col("ratio")).as("ratio"))
        .orderBy("event_type", "day")
    }),

    // inverted-index term statistics: df / cf / impact-ordered postings
    // head per term, min-df pruned. The argmax is packed into one max()
    // struct aggregate — no window, two map-side-combined shuffles total.
    "q208_postings" -> ((s, dir) => {
      graft.operators.Search.termStats(docs(s, dir), "doc_id", "text", minDf = 5L)
        .orderBy("term")
    }),

    // positional phrase search: postings equi-joined on (doc, pos+1) —
    // co-partitioned after one shuffle on the doc id.
    "q209_phrase" -> ((s, dir) => {
      graft.operators.Search.phraseSearch(docs(s, dir), "doc_id", "text",
          Seq("table", "hash"))
        .select(col("doc"), col("n_matches"), col("first_pos").cast("long").as("first_pos"))
        .orderBy("doc")
    }),

    // common-neighbors link prediction on the doc link graph: non-adjacent
    // pairs sharing >= 3 neighbors, neighborhood Jaccard as the score.
    // Counts integer-exact; the one division is 6-dp rounded both sides.
    "q210_common_neighbors" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.commonNeighbors(edges, minCommon = 3L)
        .select(col("a"), col("b"), col("common"),
          r6(col("nbr_jaccard")).as("nbr_jaccard"))
        .orderBy("a", "b")
    }),

    // automatic seasonality detection: dominant ACF lag per event_type over
    // hourly counts (argmax on 6-dp-rounded acf, smaller lag wins ties —
    // the verify-skill cross-engine rank-cut rule).
    "q211_season_detect" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.Features.dominantPeriod(
          hourly, Seq("event_type"), "bucket", "cnt", lags = (1 to 36))
        .orderBy("event_type")
    }),

    // replayable bootstrap CI for the mean text length: 200 hash-seeded
    // resamples (m = n here; m-out-of-n is the scale knob), exact interior
    // means (int64 sums / one division), percentile CI over the replicate
    // means. Every draw is auditor-replayable from md5 — no RNG state.
    "q212_bootstrap_ci" -> ((s, dir) => {
      val d = docs(s, dir)
      val n = d.count() // bounded scalar: corpus row count
      val means = graft.operators.Sampling.bootstrapMeans(
        d, "doc_id", "n_chars", n = n, b = 200, m = n, seed = "bs1")
      // full-sample mean instead of avg-of-replicates: int64 sum / one
      // division stays bit-identical cross-engine; a double avg would
      // depend on summation order
      val meanFull = d.agg(
        r6(sum(col("n_chars")).cast("double") / n).as("mean_full"))
      means.agg(
        count(lit(1)).as("b"),
        r6(percentile(col("boot_mean"), lit(0.025))).as("ci_lo"),
        r6(percentile(col("boot_mean"), lit(0.975))).as("ci_hi"))
        .crossJoin(meanFull)
    }),

    // governed release of per-(lang, source) counts: k-anonymity
    // suppression (< 10 withheld) + hash-seeded bounded integer noise,
    // clamped at the floor — integer-exact, bit-replayable by the oracle.
    "q213_dp_release" -> ((s, dir) => {
      graft.operators.Governance.noisyCountRelease(
          docs(s, dir), Seq("lang", "source"),
          minGroupSize = 10L, noiseBound = 5L, seed = "dp1")
        .orderBy("lang", "source")
    }),

    // asymmetric shingle containment (quote/subset detection): ordered
    // pairs whose trigram-set overlap covers >= 8% of the FIRST doc's
    // shingles — the relation Jaccard misses when sizes differ. Trigrams,
    // not bigrams: this corpus's 31-word vocabulary makes bigram df huge
    // (~2 docs in 5 share any given bigram) and the shared-shingle join
    // quadratic — the q35 hot-shingle lesson applied at query-design time.
    "q214_containment" -> ((s, dir) => {
      graft.operators.Dedup.containmentPairs(docs(s, dir), "text", "doc_id",
          shingleN = 3, minContainment = 0.08)
        .select(col("id_a"), col("id_b"), col("inter"), col("n_a"),
          r6(col("containment")).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    // bigram collocation lift p(ab)/(p(a)p(b)): exp(PMI) kept un-logged so
    // the score is three fixed-order IEEE divisions on exact counts —
    // bit-identical cross-engine, no transcendental.
    "q215_collocations" -> ((s, dir) => {
      graft.operators.TextAnalysis.collocations(docs(s, dir), "text",
          minPairCount = 20L)
        .orderBy("term_a", "term_b")
    }),

    // SCD type-2 from the event change log: runs of consecutive equal
    // event_type per user become validity intervals (half-open, null-open
    // tail), versioned in time order. Epoch seconds via truncation both
    // sides (floor(epoch) in the oracle — the recipe's sub-second rule).
    "q216_scd2" -> ((s, dir) => {
      graft.operators.Scd.scd2(ev(s, dir), Seq("user_id"), "ts",
          "event_type", "event_id")
        .select(col("user_id"), col("state"), col("version"),
          unix_timestamp(col("valid_from").cast("timestamp")).as("valid_from"),
          unix_timestamp(col("valid_to").cast("timestamp")).as("valid_to"),
          col("n_obs"))
        .orderBy("user_id", "version")
    }),

    // Benford first-digit audit of n_chars: digit from the decimal
    // rendering (no log10), expected shares are fixed 12-dp literals shared
    // with the oracle, chi-square terms on exact counts.
    "q217_benford" -> ((s, dir) => {
      graft.operators.Governance.benfordDigits(docs(s, dir), "n_chars")
        .orderBy("digit")
    }),

    // priority sampling (Duffield-Lund-Thorup): top-100 by w/u with
    // hash-replayable u — every priority two IEEE ops on exact integers,
    // so the cut is bit-deterministic; distributed TakeOrdered, no window.
    "q218_weighted_sample" -> ((s, dir) => {
      graft.operators.Sampling.prioritySample(docs(s, dir), "doc_id",
          "n_chars", k = 100, seed = "ps1")
        .orderBy("doc_id")
    }),

    // SAX motif classes: 5-day sign-pattern words (alphabet 2) over each
    // user's value series; identical words = a motif class. Class summary
    // is min/max member, never a collected list.
    "q219_sax_motifs" -> ((s, dir) => {
      graft.operators.Sax.motifs(ev(s, dir), "user_id", "ts", "value",
          frameSeconds = 432000L, alphabet = 2, minSize = 2L)
        .orderBy("sax_word")
    }),

    // tail attribution: which event_type owns the top-500 values — rank
    // cut (integer-exact membership), lift = tail share / overall share.
    "q220_tail_lift" -> ((s, dir) => {
      graft.operators.Profile.tailLift(ev(s, dir), "event_type", "value",
          "event_id", tailK = 500)
        .orderBy("event_type")
    }),

    // k-core peel on the doc link graph: 3 synchronous peel rounds at
    // k=4 — bounded-round semantics IS the oracle contract (the SQL twin
    // unrolls the same rounds); per round one degree count + two
    // endpoint semi-joins, all on the vertex id.
    "q221_kcore" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.kCore(edges, k = 4L, rounds = 3)
        .orderBy("v")
    }),

    // frequent 3-step event paths per user stream: two window leads, one
    // count — discovers the funnels windowFunnel needs hand-specified.
    "q222_path_trigrams" -> ((s, dir) => {
      graft.operators.Sessions.pathNgrams(ev(s, dir), Seq("user_id"), "ts",
          "event_id", "event_type", n = 3, minCount = 5L)
        .orderBy("step_1", "step_2", "step_3")
    }),

    // first/last-touch attribution matrix for purchase conversions: both
    // attribution extremes from one window pass.
    "q223_attribution" -> ((s, dir) => {
      graft.operators.Sessions.touchAttribution(ev(s, dir), Seq("user_id"),
          "ts", "event_id", "event_type", targetState = "purchase")
        .orderBy("first_touch", "last_touch")
    }),

    // hour-of-day profile cosine between event types: integer dot/norms
    // on raw counts, one correctly-rounded sqrt pair at the end.
    "q224_profile_sim" -> ((s, dir) => {
      graft.operators.Profile.profileCosine(
          ev(s, dir).withColumn("hod", hour(col("ts"))), "event_type", "hod")
        .orderBy("seg_a", "seg_b")
    }),

    // coalesce per-user activity intervals [ts, ts + (event_id%7+1) min):
    // single window pass (running-max-end run detection), epoch-second
    // domain so the arithmetic is integer both sides.
    "q225_interval_coalesce" -> ((s, dir) => {
      val iv = ev(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("start_s"))
        .withColumn("end_s", col("start_s") + (pmod(col("event_id"), lit(7L)) + 1L) * 60L)
      graft.operators.Intervals.coalesceIntervals(iv, Seq("user_id"),
          "start_s", "end_s", "event_id")
        .orderBy("user_id", "span_seq")
    }),

    // Adamic-Adar link prediction: non-adjacent pairs scored by
    // Σ 1/ln(deg) over common neighbors — each term the exact integer
    // floor(1e12/ln(deg)+0.5) (ln is ulp-identical cross-engine on the
    // integer domain), so the pair score is an order-independent BIGINT sum.
    "q226_adamic_adar" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.adamicAdar(edges, minCommon = 2L)
        .select(col("a"), col("b"), col("common"), col("aa_pico"),
          r6(col("aa_score")).as("aa_score"))
        .orderBy("a", "b")
    }),

    // personalized PageRank from seed set {doc_id < 5}: q199's power
    // iteration with restart mass concentrated on the seeds — the
    // "crawl more pages like these" scorer.
    "q227_ppr" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      val seeds = docs(s, dir).select(col("doc_id")).filter(col("doc_id") < 5)
      graft.operators.Graph.personalizedPageRank(edges, seeds, iterations = 10)
        .select(col("id"), r6(col("ppr") * 100).as("ppr_pct"))
        .orderBy("id")
    }),

    // PPJoin-style prefix-filtered EXACT Jaccard join at τ=0.5 over the
    // whole corpus (no group restriction): candidates only from the
    // rarest-first shingle prefixes, then exact array_intersect verify.
    // The oracle computes the same pairs by the naive all-shared-shingle
    // join — exactness of the filter IS the contract.
    "q228_ppjoin" -> ((s, dir) => {
      graft.operators.Dedup.prefixJaccardJoin(docs(s, dir), "text", "doc_id",
          shingleN = 3, tau = 0.5)
        .select(col("id_a"), col("id_b"), col("inter"),
          r6(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // path-prefix tree rollup: pages + chars under every /source, /source/
    // lang, /source/lang/dNN prefix — one explode(literal seq) + one agg.
    "q229_path_tree" -> ((s, dir) => {
      val p = docs(s, dir).select(
        concat(lit("/"), col("source"), lit("/"), col("lang"), lit("/d"),
          pmod(col("doc_id"), lit(20L))).as("path"),
        col("n_chars"))
      graft.operators.PathTree.prefixRollup(p, "path", maxDepth = 3,
          weightCol = "n_chars")
        .orderBy("depth", "prefix")
    }),

    // Merkle-style snapshot diff: B = events minus id%97==13, value+1 where
    // id%101==7, plus re-keyed copies of id%103==11 — the engine finds the
    // exact deleted/changed/added set via bucket XOR digests + drill-down;
    // the oracle computes the same set by a direct full outer join.
    "q230_table_diff" -> ((s, dir) => {
      val a = ev(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      val b = a.filter(pmod(col("event_id"), lit(97L)) =!= 13L)
        .withColumn("value",
          when(pmod(col("event_id"), lit(101L)) === 7L, col("value") + lit(1.0))
            .otherwise(col("value")))
        .unionByName(a.filter(pmod(col("event_id"), lit(103L)) === 11L)
          .withColumn("event_id", col("event_id") + lit(10000000L)))
      graft.operators.Reconcile.merkleDiff(a, b, "event_id",
          Seq("user_id", "event_type", "value"), buckets = 64)
        .withColumnRenamed("pk", "event_id")
        .orderBy("event_id", "status")
    }),

    // KMV bottom-k distinct sketch per source + a '_ALL_' row served by
    // MERGING the per-source sketches (bottom-k of a union == bottom-k of
    // unioned bottom-ks — the tier-promotion property, proven against the
    // oracle's direct global bottom-k). Estimator branches (exact under k,
    // (k−1)/U(k) at k) are both hash-replayable.
    "q231_kmv" -> ((s, dir) => {
      import graft.functions.{Hashing, Kmv}
      val k = 16
      val h = docs(s, dir).select(col("source"), Hashing.md5Long(col("text")).as("h"))
      val per = h.groupBy("source").agg(
        Kmv.kmvSketch(col("h"), k).as("sk"),
        count_distinct(col("h")).as("n_distinct"))
      val glob = per.agg(Kmv.kmvMerge(col("sk"), k).as("sk"))
        .withColumn("source", lit("_ALL_"))
        .crossJoin(h.agg(count_distinct(col("h")).as("n_distinct")))
      per.select(col("source"), col("n_distinct"), col("sk"))
        .unionByName(glob.select(col("source"), col("n_distinct"), col("sk")))
        .select(col("source"), Kmv.kmvN(col("sk")).cast("long").as("sketch_n"),
          col("n_distinct"), r6(Kmv.kmvEstimate(col("sk"), k)).as("est_distinct"))
        .orderBy("source")
    }),

    // deterministic synchronous label propagation (mode label, min tie-
    // break), 3 bounded rounds — the oracle unrolls the identical rounds.
    "q232_label_prop" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.labelPropagation(edges, rounds = 3)
        .orderBy("id")
    }),

    // Theil-Sen robust activity trend per user over daily event counts:
    // every pairwise slope is one IEEE division of exact integers, the
    // median interpolates two of them — no float summation anywhere.
    "q233_theil_sen" -> ((s, dir) => {
      val daily = ev(s, dir).select(col("user_id"),
          floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L).as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
      graft.operators.Robust.theilSenSlope(daily, Seq("user_id"), "day", "cnt")
        .select(col("user_id"), col("n_points"), r6(col("ts_slope")).as("ts_slope"))
        .orderBy("user_id")
    }),

    // Ed-Join prefix-filtered exact Levenshtein join over ASCII-normalized
    // 48-char prefixes (DuckDB levenshtein counts BYTES, Spark counts code
    // points — ASCII normalization makes them the same function). Corpus =
    // docs < 150 plus 1-substitution mutated copies (the q31 union
    // pattern), so true near pairs exist by construction at every sf; the
    // bound keeps the all-pairs oracle honest. NOTE the synthetic corpus
    // is gram-poor (rarest-gram df ≈ 90 at sf0.1 — measured), so prefix
    // filtering is data-defeated on FULL-corpus runs; on real web text the
    // Zipfian gram tail is what makes Ed-Join sub-quadratic.
    "q234_edit_join" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 150).select(col("doc_id"),
        substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 48).as("s"))
      val corpus = base.unionByName(base.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("s"), 1, 5), lit("X"), substring(col("s"), 7, 42)).as("s")))
        .filter(length(col("s")) >= 40)
      graft.operators.Dedup.editDistanceJoin(corpus, "doc_id", "s", maxDist = 8, q = 3)
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        .orderBy("id_a", "id_b")
    }),

    // KMV set algebra: audience overlap between event types on the
    // (user, day) activity grain — per-type sketches, pairwise merged
    // sketch (scalar merge), Jaccard/union/intersection estimates all
    // hash-replayable; exact intersection carried for reference.
    "q235_kmv_overlap" -> ((s, dir) => {
      import graft.functions.{Hashing, Kmv}
      val k = 64
      val h = ev(s, dir).select(col("event_type"),
          Hashing.md5Long(concat(col("user_id").cast("string"), lit(":"),
            floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
              .cast("long").cast("string"))).as("h"))
        .distinct()
      val sk = h.groupBy("event_type").agg(
        Kmv.kmvSketch(col("h"), k).as("sk"), count_distinct(col("h")).as("nd"))
      val ex = h.toDF("type_a", "h").join(h.toDF("type_b", "h"), "h")
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact_inter"))
      sk.toDF("type_a", "sk_a", "nd_a")
        .crossJoin(sk.toDF("type_b", "sk_b", "nd_b"))
        .filter(col("type_a") < col("type_b"))
        .withColumn("mk", Kmv.kmvMerge2(col("sk_a"), col("sk_b"), k))
        .withColumn("inter_k", size(array_intersect(
          array_intersect(Kmv.kmvValues(col("mk")), Kmv.kmvValues(col("sk_a"))),
          Kmv.kmvValues(col("sk_b")))).cast("long"))
        .withColumn("m_n", Kmv.kmvN(col("mk")).cast("long"))
        .withColumn("union_est", Kmv.kmvEstimate(col("mk"), k))
        .withColumn("jaccard_est",
          col("inter_k").cast("double") / col("m_n").cast("double"))
        .join(ex, Seq("type_a", "type_b"), "left")
        .na.fill(0L, Seq("exact_inter"))
        .select(col("type_a"), col("type_b"), col("nd_a"), col("nd_b"),
          col("exact_inter"), col("m_n"), col("inter_k"),
          r6(col("jaccard_est")).as("jaccard_est"),
          r6(col("union_est")).as("union_est"),
          r6(col("jaccard_est") * col("union_est")).as("inter_est"))
        .orderBy("type_a", "type_b")
    }),

    // weekly growth accounting: every active user classed new/retained/
    // resurrected, churn attributed to the period a user went silent —
    // pure integer counts from one distinct pass + one per-user window.
    "q236_growth" -> ((s, dir) => {
      val weekly = ev(s, dir).select(col("user_id"),
        (floor(floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L) / 7L))
          .cast("long").as("week"))
      graft.operators.Sessions.growthAccounting(weekly, "user_id", "week")
        .select(col("p").as("week"), col("status"), col("n"))
        .orderBy("week", "status")
    }),

    // ABC / Pareto classification of sources by corpus chars: integer
    // cumulative sums, one division per row, deterministic class cuts.
    "q237_abc" -> ((s, dir) => {
      graft.operators.Profile.abcClass(docs(s, dir), "source", "n_chars")
        .select(col("cat").as("source"), col("w_sum"),
          r6(col("cum_share")).as("cum_share"), col("abc_class"))
        .orderBy("source")
    }),

    // signup → first-purchase latency per user at exact microsecond
    // precision; never-converted users keep a null-latency row so the
    // conversion rate falls out of the same frame.
    "q238_conversion_latency" -> ((s, dir) => {
      graft.operators.Sessions.conversionLatency(ev(s, dir), Seq("user_id"),
          "ts", "event_type", fromState = "signup", toState = "purchase")
        .select(col("user_id"), col("from_us"), col("to_us"),
          r6(col("latency_s")).as("latency_s"))
        .orderBy("user_id")
    }),

    // reciprocal best match over embeddings: mutual top-1 cosine pairs —
    // the bitext/near-dup mining criterion that kills hub false positives.
    "q239_rbm" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Similarity.reciprocalBestMatch(emb, "vec_id", "embedding")
        .select(col("id_a"), col("id_b"), r6(col("sim")).as("sim"))
        .orderBy("id_a", "id_b")
    }),

    // largest-remainder crawl-budget apportionment across sources by
    // corpus chars — pure integer arithmetic, Σ alloc == budget exactly.
    "q240_crawl_budget" -> ((s, dir) => {
      graft.operators.Alloc.largestRemainder(docs(s, dir), "source", "n_chars",
          budget = 10000L)
        .orderBy("key")
    }),

    // rendezvous-hashing shard movement audit: assignment under 3 workers
    // vs 4 — every moved key lands on the NEW worker (minimal disruption,
    // visible in the from→to matrix).
    "q241_rendezvous" -> ((s, dir) => {
      val keys = docs(s, dir).select(col("doc_id"))
      val before = graft.operators.Alloc.rendezvousAssign(keys, "doc_id",
        Seq("w1", "w2", "w3"))
      val after = graft.operators.Alloc.rendezvousAssign(keys, "doc_id",
        Seq("w1", "w2", "w3", "w4"))
      before.toDF("key", "node_before").join(after.toDF("key", "node_after"), "key")
        .groupBy("node_before", "node_after").agg(count(lit(1)).as("n"))
        .orderBy("node_before", "node_after")
    }),

    // share-of-parent over the q229 path tree: each prefix's chars as a
    // fraction of its parent subtree (depth-1 against the global total) —
    // one division of the rollup's exact integer sums per row.
    "q242_tree_share" -> ((s, dir) => {
      val p = docs(s, dir).select(
        concat(lit("/"), col("source"), lit("/"), col("lang"), lit("/d"),
          pmod(col("doc_id"), lit(20L))).as("path"),
        col("n_chars"))
      val roll = graft.operators.PathTree.prefixRollup(p, "path", maxDepth = 3,
        weightCol = "n_chars")
      graft.operators.PathTree.shareOfParent(roll)
        .select(col("depth"), col("prefix"), col("w_sum"), col("parent_w"),
          r6(col("parent_share")).as("parent_share"))
        .orderBy("depth", "prefix")
    }),

    // weekly trending leaderboard: per-week event-type ranks with the
    // previous week's rank and the delta — integer counts, total order,
    // cross-engine exact.
    "q243_trending" -> ((s, dir) => {
      val weekly = ev(s, dir).select(col("event_type"),
        (floor(floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L) / 7L))
          .cast("long").as("week"))
      graft.operators.Profile.trendingRanks(weekly, "event_type", "week")
        .select(col("p").as("week"), col("key").as("event_type"), col("cnt"),
          col("rank"), col("prev_rank"), col("rank_delta"))
        .orderBy("week", "rank")
    }),

    // stratified sample: exactly 100 docs, source mix preserved via
    // Hamilton quotas, members picked by seeded-hash rank — replayable
    // end-to-end (no Bernoulli draws).
    "q244_stratified" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedSample(
          docs(s, dir).select(col("doc_id"), col("source")),
          "source", "doc_id", total = 100L, seed = "ss1")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // distinctive terms between even/odd doc slices by add-1 odds ratio —
    // ratio space on exact integer counts (a log would lean on libm
    // agreement; the ratio is fixed-order IEEE both engines).
    "q245_distinctive" -> ((s, dir) => {
      graft.operators.TextAnalysis.distinctiveTerms(
          docs(s, dir).withColumn("is_even", pmod(col("doc_id"), lit(2L)) === 0L),
          "text", "is_even", minCount = 50L)
        .select(col("word"), col("y_a"), col("y_b"),
          r6(col("odds_ratio")).as("odds_ratio"))
        .orderBy("word")
    }),

    // symmetric int8 quantization of embeddings + reconstruction cosine —
    // elementwise IEEE on exact inputs (round-half-up via floor(x+0.5)),
    // codes replayed array-for-array by the oracle.
    "q246_quantize" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Similarity.quantizeInt8(emb, "vec_id", "embedding")
        .select(col("id").as("vec_id"), r6(col("scale")).as("scale"),
          array_join(col("codes"), ",").as("codes_csv"),
          r6(col("recon_cos")).as("recon_cos"))
        .orderBy("vec_id")
    }),

    // skip-gram (center, context) counts within a 2-token window — the
    // word2vec/GloVe training-pair table; symmetric, integer counts.
    "q247_skipgrams" -> ((s, dir) => {
      graft.operators.TextAnalysis.skipGrams(docs(s, dir), "text",
          window = 2, minCount = 5L)
        .orderBy("center", "context")
    }),

    // Tukey boxplot fences per event type: exact quartiles, fixed-order
    // fence arithmetic, integer outlier counts.
    "q248_tukey" -> ((s, dir) => {
      graft.operators.Anomaly.tukeyFences(ev(s, dir), Seq("event_type"), "value")
        .select(col("event_type"), r6(col("q1")).as("q1"), r6(col("q3")).as("q3"),
          r6(col("lo_fence")).as("lo_fence"), r6(col("hi_fence")).as("hi_fence"),
          col("n_below"), col("n_above"), col("n"))
        .orderBy("event_type")
    }),

    // event_type × weekday contingency cells with expected-under-
    // independence and standardized residuals — per cell (never a summed
    // χ², which would hang on float summation order).
    "q249_contingency" -> ((s, dir) => {
      val d = ev(s, dir).withColumn("dow", dayofweek(col("ts").cast("timestamp")))
      graft.operators.Anomaly.contingency(d, "event_type", "dow")
        .select(col("a").as("event_type"), col("b").as("dow"), col("o"),
          col("row_tot"), col("col_tot"),
          r6(col("expected")).as("expected"), r6(col("residual")).as("residual"))
        .orderBy("event_type", "dow")
    }),

    // interval × interval overlap join: activity spans of users < 30 vs
    // 30-minute incident windows around error events — bucketized equi-
    // join inside the engine, direct θ-join in the oracle; integer
    // second overlap durations.
    "q250_overlap_join" -> ((s, dir) => {
      val base = ev(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"),
        unix_timestamp(col("ts").cast("timestamp")).as("start_s"))
      val acts = base.filter(col("user_id") < 30)
        .withColumn("end_s",
          col("start_s") + (pmod(col("event_id"), lit(7L)) + 1L) * 60L)
        .select(col("event_id"), col("user_id"), col("start_s"), col("end_s"))
      val incidents = base.filter(col("event_type") === "error")
        .withColumn("end_s", col("start_s") + 1800L)
        .select(col("event_id").as("incident_id"), col("start_s"), col("end_s"))
      graft.operators.Intervals.overlapJoin(acts, incidents,
          Seq("event_id", "user_id"), Seq("incident_id"),
          "start_s", "end_s", bucketSeconds = 1800L)
        .orderBy("a_event_id", "b_incident_id")
    }),

    // Kendall tau-b between daily event volume and daily active users per
    // type: S is a pure integer pair statistic; only the final
    // normalization touches floats (one sqrt of exact longs).
    "q251_kendall" -> ((s, dir) => {
      val daily = ev(s, dir).groupBy(col("event_type"),
          floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L).as("day"))
        .agg(count(lit(1)).as("x"), count_distinct(col("user_id")).as("y"))
      graft.operators.Robust.kendallTau(daily, Seq("event_type"), "day", "x", "y")
        .select(col("event_type"), col("s"), col("n"), r6(col("tau_b")).as("tau_b"))
        .orderBy("event_type")
    }),

    // cohorted conversion: signup-week cohorts, conversion = a purchase
    // at-or-after the first signup (q238's operator), rate = one division
    // of exact counts.
    "q252_cohort_conversion" -> ((s, dir) => {
      val lat = graft.operators.Sessions.conversionLatency(ev(s, dir),
        Seq("user_id"), "ts", "event_type", "signup", "purchase")
      lat.withColumn("cohort_week",
          expr("(from_us div 1000000L div 86400L) div 7L"))
        .groupBy("cohort_week")
        .agg(count(lit(1)).as("n_started"),
          sum(when(col("to_us").isNotNull, 1L).otherwise(0L)).as("n_converted"))
        .withColumn("conv_rate",
          r6(col("n_converted").cast("double") / col("n_started").cast("double")))
        .orderBy("cohort_week")
    }),

    // Flesch reading ease per doc: sentence/word/vowel-group counts are
    // exact integers, the formula is three fixed-order IEEE ops.
    "q253_readability" -> ((s, dir) => {
      graft.operators.TextAnalysis.readability(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_sent"), col("n_words"),
          col("n_syll"), r6(col("flesch")).as("flesch"))
        .orderBy("doc_id")
    }),

    // inter-event gap regularity (bot heuristic): integer power sums of
    // second-grain gaps, cv = sqrt(n·Σg² − (Σg)²)/Σg — one sqrt + one
    // division.
    "q254_gap_regularity" -> ((s, dir) => {
      graft.operators.Anomaly.gapRegularity(ev(s, dir), Seq("user_id"),
          "ts", "event_id")
        .select(col("user_id"), col("n_gaps"), col("sum_gap_s"),
          r6(col("mean_gap_s")).as("mean_gap_s"), r6(col("gap_cv")).as("gap_cv"))
        .orderBy("user_id")
    }),

    // syndication matrix over the corpus plus a 'mirror' aggregator (the
    // q31 union pattern — the raw corpus has no cross-source exact dups):
    // who shares distinct content digests with whom.
    "q255_syndication" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
      val corpus = base.select(col("source"), col("text")).unionByName(
        base.filter(pmod(col("doc_id"), lit(4L)) === 0L)
          .select(lit("mirror").as("source"), col("text")))
      graft.operators.Governance.syndicationMatrix(corpus, "source", "text")
        .orderBy("src_a", "src_b")
    }),

    // behavioral Shannon entropy per user over the bounded event-type
    // domain — the term sum is a FIXED-ORDER literal chain (alphabetical
    // categories), replayed term-for-term by the oracle.
    "q256_entropy" -> ((s, dir) => {
      graft.operators.Profile.behaviorEntropy(ev(s, dir), Seq("user_id"),
          "event_type")
        .select(col("user_id"), col("n"), col("n_cats"),
          r6(col("entropy")).as("entropy"))
        .orderBy("user_id")
    }),

    // top-2 sources per language with the tail folded into 'OTHER' — the
    // reporting shape a bare top-k misrepresents; integer counts.
    "q257_topk_other" -> ((s, dir) => {
      graft.operators.Profile.topKWithOther(docs(s, dir), Seq("lang"),
          "source", k = 2)
        .orderBy("lang", "category")
    }),

    // funnel drop-off: q104's click→view→purchase funnel aggregated to
    // reached-counts and step conversion shares (exact counts, guarded
    // divisions).
    "q258_funnel_dropoff" -> ((s, dir) => {
      val f = graft.operators.Sessions.windowFunnel(ev(s, dir), Seq("user_id"),
        "ts", "event_type", Seq("click", "view", "purchase"),
        windowSeconds = 7L * 86400)
      f.agg(count(lit(1)).as("n_users"),
          sum(when(col("max_step") >= 1, 1L).otherwise(0L)).as("reached_1"),
          sum(when(col("max_step") >= 2, 1L).otherwise(0L)).as("reached_2"),
          sum(when(col("max_step") >= 3, 1L).otherwise(0L)).as("reached_3"))
        .select(col("n_users"), col("reached_1"), col("reached_2"), col("reached_3"),
          r6(col("reached_1").cast("double") / col("n_users").cast("double")).as("conv_0_1"),
          r6(when(col("reached_1") > 0,
            col("reached_2").cast("double") / col("reached_1").cast("double"))).as("conv_1_2"),
          r6(when(col("reached_2") > 0,
            col("reached_3").cast("double") / col("reached_2").cast("double"))).as("conv_2_3"))
    }),

    // 3-truss peel on the doc link graph: 2 bounded synchronous rounds of
    // drop-edges-with-support-below-1, then surviving edges with their
    // final in-subgraph support — the edge-level sibling of q221's k-core.
    "q259_ktruss" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.kTruss(edges, k = 3L, rounds = 2)
        .orderBy("x", "y")
    }),

    // RFM segmentation: rank-arithmetic quintile scores per customer —
    // integer-exact cross-engine (rank cut on the r6-rounded monetary sum)
    "q260_rfm" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      graft.operators.Segment.rfm(o, "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // time-weighted average of the per-user gauge (LOCF integral over
    // irregular event timestamps — plain avg over-weights dense bursts)
    "q261_twa" -> ((s, dir) => {
      graft.operators.Features.timeWeightedAvg(ev(s, dir), Seq("user_id"),
          "ts", "event_id", "value")
        .select(col("user_id"), col("n_points"),
          r6(col("duration_s")).as("duration_s"), r6(col("twa")).as("twa"))
        .orderBy("user_id")
    }),

    // DAU / trailing-7-day distinct actives (stickiness) — exact sliding
    // distinct via cover-explode, no per-day range join
    "q262_stickiness" -> ((s, dir) => {
      graft.operators.Sessions.stickiness(ev(s, dir), "user_id", "ts",
          windowDays = 7)
        .select(unix_timestamp(col("day").cast("timestamp")).as("day_s"),
          col("dau"), col("window_active"), r6(col("stickiness")).as("stickiness"))
        .orderBy("day_s")
    }),

    // cohort LTV curve: first-order-month cohorts, cumulative revenue per
    // cohort customer by month offset (integer month indexing, never
    // months_between floats). Revenue flows through as EXACT integer cents
    // (long sums); the /100 descale and the cum/n division are
    // deterministic double ops — a cumulated float revenue at 1e9 magnitude
    // has ulps bigger than 6-dp rounding absorbs
    "q263_ltv_curve" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
        .withColumn("amt_c", floor(col("o_totalprice") * 100 + 0.5))
      graft.operators.Segment.ltvCurve(o, "o_custkey", "o_orderdate", "amt_c")
        .select(col("cohort_ym"), col("offset_m"), col("n_customers"),
          (col("revenue") / 100).as("revenue"),
          (col("cum_revenue") / 100).as("cum_revenue"),
          (col("ltv") / 100).as("ltv"))
        .orderBy("cohort_ym", "offset_m")
    }),

    // bloom-pre-filtered semi-join: exact left-semi result (oracle = IN
    // subquery); the bloom pass drops non-matching rows at the scan
    "q264_bloom_semi" -> ((s, dir) => {
      val urgent = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      graft.operators.BloomJoin.semiJoin(li(s, dir), urgent,
          "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), r6(sum(col("l_quantity"))).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // rank-biased overlap: year-over-year stability of the per-returnflag
    // top-10 SUPPLIER-NATION ranking (25 nations — a domain whose top-10 is
    // volume-driven, not noise-driven, at any SF; broadcast dim join feeds
    // the rank; integer counts, id tie-break)
    "q265_rbo" -> ((s, dir) => {
      val sup = broadcast(s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey")))
      def yearCnt(y: Int) = li(s, dir)
        .filter(year(col("l_shipdate")) === y)
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_returnflag"), col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Robust.rankBiasedOverlap(yearCnt(1995), yearCnt(1996),
          Seq("l_returnflag"), "s_nationkey", "cnt", depth = 10, p = 0.9)
        .select(col("l_returnflag"), col("n_common"), r6(col("rbo")).as("rbo"))
        .orderBy("l_returnflag")
    }),

    // uptime coverage: each event keeps its user "up" for 1h; per-user
    // merged coverage of January (exact µs arithmetic end to end)
    "q266_uptime" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val iv = ev(s, dir).select(col("user_id"), us.as("s_us"),
        (us + lit(3600000000L)).as("e_us"), col("event_id"))
      graft.operators.Intervals.coverage(iv, Seq("user_id"), "s_us", "e_us",
          "event_id", 1704067200000000L, 1706745600000000L)
        .select(col("user_id"), col("n_spans"), col("covered_us"),
          r6(col("uptime_share")).as("uptime_share"))
        .orderBy("user_id")
    }),

    // quantile normalization: every event_type's value distribution mapped
    // to the cross-type rank-mean reference (ranks on stored doubles with
    // id tie-break — bit-identical ordering across engines)
    "q267_qnorm" -> ((s, dir) => {
      graft.operators.Scalers.quantileNormalize(ev(s, dir), "event_type",
          "event_id", "value")
        .select(col("event_type"), col("event_id"), col("rank"),
          col("n_groups_at_rank"), r6(col("qnorm")).as("qnorm"))
        .orderBy("event_type", "rank")
    }),

    // top-k set churn: week-over-week Jaccard of the per-type top-5 user
    // leaderboard (integer week index, integer counts, id tie-break)
    "q268_topk_churn" -> ((s, dir) => {
      val wk = ev(s, dir).withColumn("_us",
          unix_micros(col("ts").cast("timestamp")))
        .withColumn("week", expr("(_us - 1704067200000000L) div 604800000000L"))
        .groupBy(col("event_type"), col("week"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Profile.topKChurn(wk, Seq("event_type"), "week",
          "user_id", "cnt", k = 5)
        .select(col("event_type"), col("week"), col("n_prev"), col("n_cur"),
          col("n_common"), r6(col("jaccard")).as("jaccard"))
        .orderBy("event_type", "week")
    }),

    // Haar multi-resolution downsample: per-type event counts in 6h base
    // buckets, 3 halving levels — every approx/detail an exact dyadic
    // rational (integer sums over powers of two)
    "q269_haar" -> ((s, dir) => {
      graft.operators.Features.haarDownsample(ev(s, dir), Seq("event_type"),
          "ts", epochUs = 1704067200000000L, baseUs = 21600000000L, levels = 3)
        .select(col("event_type"), col("level"), col("idx"),
          col("approx"), col("detail"))
        .orderBy("event_type", "level", "idx")
    }),

    // Markov removal-effect attribution: purchase = conversion, the other
    // four event types = channels; 6 propagation steps from START
    "q270_markov_attr" -> ((s, dir) => {
      graft.operators.Attribution.removalEffects(ev(s, dir), "user_id", "ts",
          "event_id", "event_type", convType = "purchase",
          channels = Seq("click", "error", "signup", "view"), steps = 6)
        .select(col("removed_channel"), r6(col("p_conv")).as("p_conv"),
          r6(col("removal_effect")).as("removal_effect"))
        .orderBy("removed_channel")
    }),

    // Kaplan-Meier retention: per type, user engagement span in whole days,
    // churned if the last event predates Jan 24 (else right-censored)
    "q271_km" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val subj = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(us).as("_f"), max(us).as("_l"))
        .withColumn("dur", expr("(_l - _f) div 86400000000L"))
        .withColumn("e",
          when(col("_l") < lit(1706054400000000L), lit(1)).otherwise(lit(0)))
      graft.operators.Survival.kaplanMeier(subj, Seq("event_type"), "dur", "e")
        .select(col("event_type"), col("t"), col("n_risk"), col("n_event"),
          col("n_censored"), r6(col("survival")).as("survival"))
        .orderBy("event_type", "t")
    }),

    // Mann-Whitney U: click-vs-view value distributions per day of month
    // (midranks exact half-integers; tie-corrected normal z)
    "q272_mwu" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("day", dayofmonth(col("ts").cast("timestamp")))
      graft.operators.Robust.mannWhitney(d, Seq("day"), "event_type",
          "click", "view", "value")
        .select(col("day"), col("n_a"), col("n_b"), r6(col("u_a")).as("u_a"),
          r6(col("z")).as("z"))
        .orderBy("day")
    }),

    // Cohen's kappa: agreement between a char-count quality rule and a
    // word-count quality rule, per source (integer-exact up to one division)
    "q273_kappa" -> ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("a", (col("n_chars") > 600).cast("string"))
        .withColumn("b", (length(col("text")) -
          length(translate(col("text"), " ", "")) > 80).cast("string"))
      graft.operators.Robust.cohenKappa(d, Seq("source"), "a", "b")
        .select(col("source"), col("n"), col("n_agree"),
          r6(col("kappa")).as("kappa"))
        .orderBy("source")
    }),

    // Jensen-Shannon divergence: weekly event-type mix vs the global mix
    // (bounded 5-category domain, literal-order term fold)
    "q274_jsd" -> ((s, dir) => {
      val wk = ev(s, dir)
        .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("week", expr("(_us - 1704067200000000L) div 604800000000L"))
      graft.operators.Profile.jsDivergence(wk, Seq("week"), "event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .select(col("week"), col("n"), r6(col("jsd")).as("jsd"))
        .orderBy("week")
    }),

    // CUPED: per-user post-period value adjusted by the pre-period
    // covariate (pooled theta; Jan 16 split; arm = user parity)
    "q275_cuped" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val unit = ev(s, dir).groupBy(col("user_id"))
        .agg(sum(when(us < lit(1705363200000000L), col("value"))
            .otherwise(lit(0.0))).as("x"),
          sum(when(us >= lit(1705363200000000L), col("value"))
            .otherwise(lit(0.0))).as("y"))
        .withColumn("seg", (col("user_id") % 2).cast("string"))
      graft.operators.Experiment.cuped(unit, "seg", "y", "x")
        .select(col("seg"), col("n"), r6(col("y_mean")).as("y_mean"),
          r6(col("y_adj_mean")).as("y_adj_mean"), r6(col("theta")).as("theta"),
          r6(col("var_reduction")).as("var_reduction"))
        .orderBy("seg")
    }),

    // difference-in-differences: 2x2 (user parity x Jan-16 split) cell
    // means per event_type, fixed-order estimate from pivoted cells
    "q276_did" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val d = ev(s, dir)
        .withColumn("treat", (col("user_id") % 2).cast("int"))
        .withColumn("post",
          (us >= lit(1705363200000000L)).cast("int"))
      graft.operators.Experiment.diffInDiff(d, Seq("event_type"), "treat",
          "post", "value")
        .select(col("event_type"), col("n"), r6(col("m_t0")).as("m_t0"),
          r6(col("m_t1")).as("m_t1"), r6(col("m_c0")).as("m_c0"),
          r6(col("m_c1")).as("m_c1"), r6(col("did")).as("did"))
        .orderBy("event_type")
    }),

    // sample-ratio mismatch: Pearson chi-square of user-parity arm counts
    // against the designed 50/50 split, per event_type
    "q277_srm" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("arm", (col("user_id") % 2).cast("string"))
      graft.operators.Experiment.srmCheck(d, Seq("event_type"), "arm",
          Seq("0" -> 0.5, "1" -> 0.5))
        .select(col("event_type"), col("n"), r6(col("chi2")).as("chi2"))
        .orderBy("event_type")
    }),

    // empirical-Bayes shrinkage: per-user purchase rate pulled toward the
    // method-of-moments beta prior
    "q278_eb_rates" -> ((s, dir) => {
      val item = ev(s, dir).groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"),
          count(lit(1)).as("cnt"))
      graft.operators.Experiment.ebShrinkRates(item, Seq("user_id"), "x", "cnt")
        .select(col("user_id"), col("x"), col("n"),
          r6(col("raw_rate")).as("raw_rate"),
          r6(col("prior_strength")).as("prior_strength"),
          r6(col("shrunk")).as("shrunk"))
        .orderBy("user_id")
    }),

    // tail-conditional mean (CVaR / expected shortfall): top-decile tail by
    // INTEGER rank cut with id tie-break — never an interpolated threshold
    "q279_cvar" -> ((s, dir) => {
      graft.operators.Profile.tailMean(ev(s, dir), Seq("event_type"),
          "value", "event_id", tailNum = 1, tailDen = 10)
        .select(col("event_type"), col("n"), col("k_tail"),
          r6(col("var_threshold")).as("var_threshold"),
          r6(col("tail_mean")).as("tail_mean"))
        .orderBy("event_type")
    }),

    // local-maxima peaks on the hourly per-user count series (strict > over
    // ±2 neighbors; integer counts so the flag is deterministic)
    "q280_peaks" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("user_id"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Anomaly.peaks(hourly, Seq("user_id"), "bucket_start",
          "cnt", radius = 2)
        .filter(col("is_peak"))
        .select(col("user_id"), col("bucket_start"), col("cnt"))
        .orderBy("user_id", "bucket_start")
    }),

    // closed-form multivariate OLS (value ~ hour-of-day + day-of-month):
    // one moment-sum pass + literal Cramer solve, replayed token-for-token
    "q281_ols" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("x1", hour(col("ts").cast("timestamp")).cast("double"))
        .withColumn("x2", dayofmonth(col("ts").cast("timestamp")).cast("double"))
      graft.operators.Features.olsFit(d, Seq("event_type"), "value", "x1", "x2")
        .select(col("event_type"), col("n"), r6(col("b0")).as("b0"),
          r6(col("b1")).as("b1"), r6(col("b2")).as("b2"), r6(col("r2")).as("r2"))
        .orderBy("event_type")
    }),

    // Hurst exponent (aggregated-variance method) of the daily count
    // series per type; dyadic blocks 1/2/4, whole blocks only (daily grain
    // keeps the series dense enough for complete blocks at every sf)
    "q282_hurst" -> ((s, dir) => {
      val daily = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("idx", expr("ts_sec div 86400L"))
        .groupBy(col("event_type"), col("idx"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.operators.Features.hurst(daily, Seq("event_type"), "idx", "v",
          ms = Seq(1, 2, 4))
        .select(col("event_type"), col("n_blocks"), r6(col("slope")).as("slope"),
          r6(col("hurst")).as("hurst"))
        .orderBy("event_type")
    }),

    // mSPRT always-valid p-value sequence: user-parity arms, daily
    // checkpoints, tau^2 = 1 — the peeking-safe A/B readout
    "q283_msprt" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("day", expr("(_us - 1704067200000000L) div 86400000000L"))
        .withColumn("arm", (col("user_id") % 2).cast("string"))
      graft.operators.Experiment.msprt(d, Seq("event_type"), "day", "arm",
          "0", "1", "value", tauSq = 1.0)
        .select(col("event_type"), col("day"), col("n_a"), col("n_b"),
          r6(col("delta")).as("delta"), r6(col("lambda")).as("lambda"),
          r6(col("p_always_valid")).as("p_always_valid"))
        .orderBy("event_type", "day")
    }),

    // late-data tier upsert: 1m tier from on-time events, the late 20%
    // merged in by Rollup.upsertPoints (only touched buckets re-merge; the
    // oracle recomputes the 1m grain from ALL events incl. exact p50/p95 —
    // proving upsert(tier(base), late) == tier(base ∪ late) through the
    // Gorilla block path)
    "q284_late_upsert" -> ((s, dir) => {
      def t1m(d: DataFrame): DataFrame = d
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(60L)))
        .groupBy(col("user_id"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_len"),
          min(col("value")).as("min_len"), max(col("value")).as("max_len"),
          collect_set(col("event_type")).as("lang_set"),
          graft.functions.codec.BlockAggregator(col("ts_sec"), col("value")).as("m"))
        .withColumn("mean_len", col("sum_len") / col("cnt"))
        .withColumn("lang_card", size(col("lang_set")).cast("long"))
        .withColumn("p50_len", col("m.p50")).withColumn("p95_len", col("m.p95"))
        .withColumn("block", col("m.block")).drop("m")
      val all = ev(s, dir)
      val tier = t1m(all.filter(pmod(col("event_id"), lit(5L)) =!= 0L))
      val late = t1m(all.filter(pmod(col("event_id"), lit(5L)) === 0L))
      Rollup.upsertPoints(tier, late, groupCols = Seq("user_id"))
        .select(col("user_id"), col("bucket_start"), col("cnt"),
          r6(col("sum_len")).as("sum_value"), r6(col("min_len")).as("min_value"),
          r6(col("max_len")).as("max_value"), r6(col("p50_len")).as("p50"),
          r6(col("p95_len")).as("p95"))
        .orderBy("user_id", "bucket_start")
    }),

    // multi-window SLO burn rate: hourly error share per user-shard, 6h
    // fast / 24h slow windows against a 0.2 budget — alert when both burn
    "q285_burn_rate" -> ((s, dir) => {
      val d = ev(s, dir).withColumn("shard", (col("user_id") % 4).cast("string"))
      graft.operators.Anomaly.burnRate(d, Seq("shard"), "ts",
          col("event_type") === "error", bucketSeconds = 3600L,
          shortBuckets = 6, longBuckets = 24, budget = 0.2, threshold = 1.05)
        .select(col("shard"), col("bucket_start"), col("total"), col("errors"),
          r6(col("rate_short")).as("rate_short"),
          r6(col("rate_long")).as("rate_long"),
          col("alert").cast("int").as("alert"))
        .orderBy("shard", "bucket_start")
    }),

    // Tukey median polish of the (weekday × week) count matrix per type —
    // integer cells make every sweep median an exact dyadic rational
    "q286_median_polish" -> ((s, dir) => {
      val cells = ev(s, dir)
        .withColumn("dow", dayofweek(col("ts").cast("timestamp")))
        .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("wk", expr("(_us - 1704067200000000L) div 604800000000L"))
        .groupBy(col("event_type"), col("dow"), col("wk"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.operators.Robust.medianPolish(cells, Seq("event_type"), "dow",
          "wk", "v", iterations = 2)
        .select(col("event_type"), col("dow"), col("wk"),
          r6(col("row_eff")).as("row_eff"), r6(col("col_eff")).as("col_eff"),
          r6(col("residual")).as("residual"))
        .orderBy("event_type", "dow", "wk")
    }),

    // two-state Viterbi burst segmentation (Kleinberg-shaped) on hourly
    // counts; INTEGER L1 emission costs and integer gamma = per-key base
    // rate, so the optimal path is bit-exact cross-engine
    "q287_bursts" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("event_type"), col("bucket_start"))
        .agg(count(lit(1)).as("n"))
      val base = hourly.groupBy(col("event_type"))
        .agg(expr("sum(n) div count(1)").as("mu"))
      val costed = hourly.join(base, Seq("event_type"))
        .withColumn("e0", abs(col("n") - col("mu")).cast("double"))
        .withColumn("e1", abs(col("n") - lit(2L) * col("mu")).cast("double"))
      graft.operators.Anomaly.burstSegments(costed, Seq("event_type"),
          "bucket_start", "e0", "e1", col("mu"))
        .select(col("event_type"), col("ts_sec").as("bucket_start"),
          r6(col("cost_base")).as("cost_base"),
          r6(col("cost_burst")).as("cost_burst"),
          col("burst").cast("int").as("burst"))
        .orderBy("event_type", "bucket_start")
    }),

    // rate/mix decomposition of the mean-value change across the Jan-16
    // split: which types moved the topline by rate vs by traffic mix
    "q288_rate_mix" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      graft.operators.Experiment.rateMix(ev(s, dir), Seq("event_type"),
          us >= lit(1705363200000000L), "value")
        .select(col("event_type"), col("n1"), col("n2"), r6(col("w1")).as("w1"),
          r6(col("w2")).as("w2"), r6(col("r1")).as("r1"), r6(col("r2")).as("r2"),
          r6(col("rate_effect")).as("rate_effect"),
          r6(col("mix_effect")).as("mix_effect"),
          r6(col("total_effect")).as("total_effect"))
        .orderBy("event_type")
    }),

    // UCB1 allocation scores per shard×arm: deterministic bandit readout,
    // ln over INTEGER pull counts (cross-engine-safe ln domain)
    "q289_ucb1" -> ((s, dir) => {
      val shards = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
      graft.operators.Experiment.ucb1(shards, Seq("shard"), "event_type",
          "value", c = 1.0)
        .select(col("shard"), col("event_type"), col("n"), col("n_total"),
          r6(col("mean")).as("mean"), r6(col("ucb")).as("ucb"))
        .orderBy("shard", "event_type")
    }),

    // one-way ANOVA omnibus F per shard over the literal 5-arm event-type
    // list — per-arm moment sums pivoted to columns, literal-order folds
    "q290_anova" -> ((s, dir) => {
      val shards = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
      graft.operators.Experiment.anovaF(shards, Seq("shard"), "event_type",
          Seq("click", "view", "purchase", "error", "signup"), "value")
        .select(col("shard"), col("n"), r6(col("ssb")).as("ssb"),
          r6(col("ssw")).as("ssw"), r6(col("f_stat")).as("f_stat"))
        .orderBy("shard")
    }),

    // BH-FDR + Holm adjustment within each lang family; hypothesis p-values
    // derived from INTEGER char sums so the p ordering is cross-engine-exact
    "q291_fdr" -> ((s, dir) => {
      val hyp = docs(s, dir).groupBy(col("lang"), col("source"))
        .agg(sum(col("n_chars")).as("_sc"))
        .withColumn("p",
          (pmod(col("_sc"), lit(997L)) + 1).cast("double") / lit(997.0))
      graft.operators.Experiment.fdrAdjust(hyp, Seq("lang"), "p", "source")
        .select(col("lang"), col("source"), r6(col("p")).as("p"),
          col("m"), col("p_rank").cast("long").as("p_rank"),
          r6(col("p_bh")).as("p_bh"), r6(col("p_holm")).as("p_holm"))
        .orderBy("lang", "source")
    }),

    // PACF at lags 1..3 over each event type's daily count series
    // (Durbin–Levinson unrolled — closed-form rationals in the ACF values)
    "q292_pacf" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.operators.Features.pacf(daily, Seq("event_type"), "d", "v", maxLag = 3)
        .select(col("event_type"), col("lag").cast("long").as("lag"),
          r6(col("pacf")).as("pacf"))
        .orderBy("event_type", "lag")
    }),

    // Chao1 unseen-vocabulary richness per language over document terms
    "q293_chao1" -> ((s, dir) => {
      val terms = docs(s, dir).select(col("lang"),
        explode(graft.functions.Hashing.words(lower(col("text")))).as("term"))
      graft.operators.Profile.chao1(terms, Seq("lang"), "term")
        .select(col("lang"), col("d_observed"), col("f1"), col("f2"),
          r6(col("chao1")).as("chao1"))
        .orderBy("lang")
    }),

    // best single mean-shift changepoint per shard on the hourly count
    // series (binary segmentation top split; integer sums, rank on the
    // 6-dp-rounded gain with a timestamp tie-break)
    "q294_cpt" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("shard"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Anomaly.binarySegment(hourly, Seq("shard"),
          "bucket_start", "cnt")
        .select(col("shard"), col("n"), col("split_ts"), col("n_left"),
          col("n_right"), r6(col("mean_left")).as("mean_left"),
          r6(col("mean_right")).as("mean_right"), col("gain"))
        .orderBy("shard")
    }),

    // D'Hondt highest-averages apportionment of 10 budget units across the
    // event types by event count (divisor-method sibling of q190's Hamilton)
    "q295_dhondt" -> ((s, dir) => {
      graft.operators.Alloc.dhondt(
          ev(s, dir).withColumn("one", lit(1L)), "event_type", "one", seats = 10)
        .select(col("key"), col("score"), col("alloc"))
        .orderBy("key")
    }),

    // Hodges–Lehmann robust center (median of Walsh averages) of the hourly
    // count series per shard
    "q296_hl" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("shard"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Robust.hodgesLehmann(hourly, Seq("shard"),
          "bucket_start", "cnt")
        .select(col("shard"), col("n_points"), r6(col("hl_center")).as("hl_center"))
        .orderBy("shard")
    }),

    // Nelson–Aalen cumulative hazard on q271's right-censored churn frame
    "q297_nelson_aalen" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val subj = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(us).as("_f"), max(us).as("_l"))
        .withColumn("dur", expr("(_l - _f) div 86400000000L"))
        .withColumn("e",
          when(col("_l") < lit(1706054400000000L), lit(1)).otherwise(lit(0)))
      graft.operators.Survival.nelsonAalen(subj, Seq("event_type"), "dur", "e")
        .select(col("event_type"), col("t"), col("n_risk"), col("n_event"),
          col("n_censored"), r6(col("cum_hazard")).as("cum_hazard"),
          r6(col("survival_fh")).as("survival_fh"))
        .orderBy("event_type", "t")
    }),

    // Syntetos–Boylan debiased Croston on q83's intermittent daily series
    "q298_sba" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
        .withColumn("v",
          when(pmod(unix_timestamp(col("d")) / 86400, lit(3L)) === 0, col("v"))
            .otherwise(lit(0.0)))
      graft.operators.Forecast.sba(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, horizon = 3, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // Lorenz curve of hourly event counts per shard (the curve under q120's
    // Gini); ascending (cnt, bucket) rank, exact integer cumulative sums
    "q299_lorenz" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("shard"), col("bucket_start"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Profile.lorenz(hourly, Seq("shard"), "cnt", "bucket_start")
        .select(col("shard"), col("i").cast("long").as("i"), col("bucket_start"),
          col("cnt"), r6(col("p_pop")).as("p_pop"), r6(col("p_val")).as("p_val"))
        .orderBy("shard", "i")
    }),

    // MinHash estimate vs exact Jaccard on the bounded q35 corpus slice —
    // the k-calibration readout (k = 8 signature components)
    "q300_mh_est" -> ((s, dir) => {
      val bounded = docs(s, dir).filter(col("doc_id") < 60)
      graft.operators.Dedup.minhashJaccardEst(bounded, "text", "doc_id",
          Seq("lang"), k = 8)
        .select(col("lang"), col("id_a"), col("id_b"),
          r6(col("jaccard")).as("jaccard"), r6(col("est")).as("est"),
          r6(col("err")).as("err"))
        .orderBy("lang", "id_a", "id_b")
    }),

    // Diebold–Mariano on q82's split: does the train-mean forecast beat the
    // last-train-value naive over the 5-day test window (squared loss, h=1)
    "q301_dm" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val ranked = daily.withColumn("_rd", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("d").desc)))
      val p1 = ranked.filter(col("_rd") > 5)
        .groupBy("user_id").agg(avg(col("v")).as("p1"))
      val p2 = ranked.filter(col("_rd") === 6)
        .select(col("user_id"), col("v").as("p2"))
      val test = ranked.filter(col("_rd") <= 5)
        .join(p1, "user_id").join(p2, "user_id")
      Metrics.dieboldMariano(test, Seq("user_id"), "v", "p1", "p2")
        .select(col("user_id"), col("n"), r6(col("mean_d")).as("mean_d"),
          r6(col("dm_stat")).as("dm_stat"))
        .orderBy("user_id")
    }),

    // experiment sizing readout per event type: arms by event-id parity,
    // deterministic conversion flag; MDE at current traffic + per-arm N
    // required to detect a 10% relative lift
    "q302_mde" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("conv",
          when(pmod(col("event_id"), lit(5L)) === 0, 1L).otherwise(0L))
      graft.operators.Experiment.mdePower(e, Seq("event_type"),
          isControl = pmod(col("event_id"), lit(2L)) === 0,
          convCol = "conv", targetRel = 0.10)
        .select(col("event_type"), col("n_a"), col("n_b"),
          r6(col("p_control")).as("p_control"), r6(col("p_pool")).as("p_pool"),
          r6(col("mde_abs")).as("mde_abs"), r6(col("mde_rel")).as("mde_rel"),
          r6(col("n_required")).as("n_required"))
        .orderBy("event_type")
    }),

    // Burrows' Delta stylistic distance between language slices over the
    // corpus-wide top-20 words — the provenance/style companion to content
    // dedup (same fingerprint ⇒ same template farm)
    "q303_burrows" -> ((s, dir) => {
      TextAnalysis.burrowsDelta(docs(s, dir), "lang", "text", topM = 20)
        .select(col("group_a").as("lang_a"), col("group_b").as("lang_b"),
          col("m_used"), r6(col("delta")).as("delta"))
        .orderBy("lang_a", "lang_b")
    }),

    // Murphy decomposition of q156's Brier score: reliability / resolution /
    // uncertainty over the same 10 fixed bins and scored construction
    "q304_brier_decomp" -> ((s, dir) => {
      val e = ev(s, dir).filter(col("value").isNotNull &&
        col("event_type").isNotNull)
      val st = e.agg(min(col("value")).as("_lo"), max(col("value")).as("_hi"))
      val scored = e.crossJoin(broadcast(st))
        .withColumn("p", when(col("_hi") === col("_lo"), lit(0.0))
          .otherwise((col("value") - col("_lo")) / (col("_hi") - col("_lo"))))
        .withColumn("y", when(col("event_type") === "purchase", lit(1.0))
          .otherwise(lit(0.0)))
      graft.operators.Calibration.brierDecomposition(scored, "p", "y", bins = 10)
        .select(col("n"), r6(col("brier")).as("brier"),
          r6(col("reliability")).as("reliability"),
          r6(col("resolution")).as("resolution"),
          r6(col("uncertainty")).as("uncertainty"))
    }),

    // Theil's U2 on q82's split: train-mean forecast vs the lag-1 naive on
    // the same test rows — the scale-free "does it beat persistence" number
    "q305_theil_u" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val ranked = daily
        .withColumn("nv", lag(col("v"), 1).over(wAsc))
        .withColumn("_rd", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("d").desc)))
      val p = ranked.filter(col("_rd") > 5)
        .groupBy("user_id").agg(avg(col("v")).as("p"))
      val test = ranked.filter(col("_rd") <= 5).join(p, "user_id")
      Metrics.theilU(test, Seq("user_id"), "v", "p", "nv")
        .select(col("user_id"), r6(col("theil_u")).as("theil_u"), col("n"))
        .orderBy("user_id")
    }),

    // hierarchical forecast reconciliation (top-down by historical
    // proportions + the bottom-up coherence column): per-user mean-daily
    // base forecasts disaggregated from the shard-level forecast
    "q306_reconcile" -> ((s, dir) => {
      val daily = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .groupBy(col("shard"), col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val childFc = daily.groupBy("shard", "user_id").agg(avg(col("v")).as("yhat"))
      val parentFc = daily.groupBy(col("shard"), col("d"))
        .agg(sum(col("v")).as("pv"))
        .groupBy("shard").agg(avg(col("pv")).as("yhat"))
      graft.operators.Forecast.reconcileTopDown(daily, childFc, parentFc,
          Seq("shard"), Seq("shard", "user_id"), "v", "yhat")
        .select(col("shard"), col("user_id"), r6(col("yhat")).as("yhat_base"),
          r6(col("prop")).as("prop"), r6(col("yhat_td")).as("yhat_td"),
          r6(col("yhat_bu")).as("yhat_bu"))
        .orderBy("shard", "user_id")
    }),

    // TSB intermittent-demand forecast on q298's every-3rd-day demand mask —
    // the probability level (updated EVERY period) is what distinguishes it
    // from Croston/SBA
    "q307_tsb" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
        .withColumn("v",
          when(pmod(unix_timestamp(col("d")) / 86400, lit(3L)) === 0, col("v"))
            .otherwise(lit(0.0)))
      graft.operators.Forecast.tsb(daily, Seq("user_id"), "d", "v",
          alpha = 0.3, beta = 0.2, horizon = 3, stepSeconds = 86400L)
        .select(col("user_id"), unix_timestamp(col("forecast_ts")).as("forecast_s"),
          col("step").cast("long").as("step"), r6(col("yhat")).as("yhat"))
        .orderBy("user_id", "step")
    }),

    // Trigg tracking signal over the expanding-mean one-step forecast:
    // cumulative error / cumulative MAD, |TS| > 4 alarms
    "q308_tracking_signal" -> ((s, dir) => {
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val withFc = daily.withColumn("fc", avg(col("v")).over(wPrev))
        .filter(col("fc").isNotNull)
      Metrics.trackingSignal(withFc, Seq("user_id"), "d", "v", "fc")
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("cum_err")).as("cum_err"), r6(col("mad")).as("mad"),
          r6(col("tsig")).as("tsig"), col("alarm"))
        .orderBy("user_id", "d_s")
    }),

    // forecast value added: does the expanding-mean model beat the lag-1
    // naive per user? FVA = (MAE_naive - MAE_model) / MAE_naive
    "q309_fva" -> ((s, dir) => {
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val staged = daily
        .withColumn("naive", lag(col("v"), 1).over(wAsc))
        .withColumn("fc", avg(col("v")).over(wPrev))
        .filter(col("naive").isNotNull && col("fc").isNotNull)
      staged.groupBy("user_id")
        .agg(avg(abs(col("v") - col("naive"))).as("mae_naive"),
          avg(abs(col("v") - col("fc"))).as("mae_model"),
          count(lit(1)).as("n"))
        .withColumn("fva", when(col("mae_naive") > 0,
          (col("mae_naive") - col("mae_model")) / col("mae_naive")))
        .select(col("user_id"), r6(col("mae_naive")).as("mae_naive"),
          r6(col("mae_model")).as("mae_model"), r6(col("fva")).as("fva"),
          col("n"))
        .orderBy("user_id")
    }),

    // inverse-MAE weighted combination of the naive and train-mean
    // forecasts, weights fit on the train window, scored on the 5-day test
    "q310_combo" -> ((s, dir) => {
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d").desc)
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val ranked = daily
        .withColumn("naive", lag(col("v"), 1).over(wAsc))
        .withColumn("_rd", row_number().over(wDesc))
      val train = ranked.filter(col("_rd") > 5 && col("naive").isNotNull)
      val stats = train.groupBy("user_id")
        .agg(avg(abs(col("v") - col("naive"))).as("mae1"), avg(col("v")).as("m"))
      val mae2 = train.join(stats, "user_id").groupBy("user_id")
        .agg(avg(abs(col("v") - col("m"))).as("mae2"))
      val test = ranked.filter(col("_rd") <= 5)
        .join(stats, "user_id").join(mae2, "user_id")
        .withColumn("w1", when(col("mae1") > 0 && col("mae2") > 0,
          (lit(1.0) / col("mae1")) /
            (lit(1.0) / col("mae1") + lit(1.0) / col("mae2"))))
        .withColumn("fc",
          col("w1") * col("naive") + (lit(1.0) - col("w1")) * col("m"))
      test.groupBy("user_id")
        .agg(max(col("w1")).as("w_naive"),
          avg(abs(col("v") - col("fc"))).as("mae_combo"),
          count(lit(1)).as("n_test"))
        .select(col("user_id"), r6(col("w_naive")).as("w_naive"),
          r6(col("mae_combo")).as("mae_combo"), col("n_test"))
        .orderBy("user_id")
    }),

    // Cliff's delta effect size between even/odd-user value distributions
    // per event type — the nonparametric effect size next to q272's U test
    "q311_cliffs_delta" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(2L)).cast("string"))
      graft.operators.Robust.cliffsDelta(d, Seq("event_type"), "shard",
          "0", "1", "value")
        .select(col("event_type"), col("n_a"), col("n_b"),
          r6(col("delta")).as("delta"))
        .orderBy("event_type")
    }),

    // two-sample energy distance (Székely–Rizzo) between the same shards —
    // pair-count×gap closed form, no pair join
    "q312_energy_dist" -> ((s, dir) => {
      val d = ev(s, dir).withColumn("shard", pmod(col("user_id"), lit(2L)))
      graft.operators.Drift.energyDistance(
          d.filter(col("shard") === 0), d.filter(col("shard") === 1),
          Seq("event_type"), "value")
        .select(col("event_type"), r6(col("energy_dist")).as("energy_dist"),
          r6(col("d2")).as("d2"), col("n_ref"), col("n_cur"))
        .orderBy("event_type")
    }),

    // two-sample Cramér–von Mises (ECDF form, pooled-multiplicity weights)
    "q313_cvm" -> ((s, dir) => {
      val d = ev(s, dir).withColumn("shard", pmod(col("user_id"), lit(2L)))
      graft.operators.Drift.cvm2(
          d.filter(col("shard") === 0), d.filter(col("shard") === 1),
          Seq("event_type"), "value")
        .select(col("event_type"), r6(col("cvm")).as("cvm"),
          col("n_ref"), col("n_cur"))
        .orderBy("event_type")
    }),

    // directed degree assortativity of the q199 link graph (out-degree of
    // src vs in-degree of dst, Pearson over edges)
    "q314_assortativity" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.degreeAssortativity(edges)
        .select(r6(col("assortativity")).as("assortativity"), col("n_edges"))
    }),

    // edge reciprocity of the same graph (share of distinct non-self edges
    // with a reverse edge)
    "q315_reciprocity" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.reciprocity(edges)
        .select(col("n_edges"), col("n_reciprocal"),
          r6(col("reciprocity")).as("reciprocity"))
    }),

    // Page–Hinkley drift detector over hourly event-type counts
    // (δ=0.5 tolerated drift, λ=10 alarm threshold)
    "q316_page_hinkley" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("bucket_start", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("event_type"), col("bucket_start"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.Anomaly.pageHinkley(hourly, Seq("event_type"),
          "bucket_start", "cnt", delta = 0.5, lambda = 10.0)
        .select(col("event_type"), col("bucket_start"),
          r6(col("run_mean")).as("run_mean"), r6(col("ph")).as("ph"),
          col("alarm"))
        .orderBy("event_type", "bucket_start")
    }),

    // Theil's MSE decomposition (bias/variance/covariance) of the naive
    // forecast on q305's 5-day test split — WHERE the naive's error lives
    "q317_mse_decomp" -> ((s, dir) => {
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d").desc)
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val ranked = daily
        .withColumn("nv", lag(col("v"), 1).over(wAsc))
        .withColumn("_rd", row_number().over(wDesc))
      val test = ranked.filter(col("_rd") <= 5 && col("nv").isNotNull)
      Metrics.mseDecomposition(test, Seq("user_id"), "v", "nv")
        .select(col("user_id"), col("n"), r6(col("mse")).as("mse"),
          r6(col("bias_part")).as("bias_part"),
          r6(col("var_part")).as("var_part"),
          r6(col("cov_part")).as("cov_part"),
          r6(col("um")).as("um"), r6(col("us")).as("us"),
          r6(col("uc")).as("uc"))
        .orderBy("user_id")
    }),

    // Granger F at lag 1 per shard: does yesterday's click total improve
    // the view-total prediction beyond its own lag?
    "q318_granger" -> ((s, dir) => {
      val daily = ev(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .groupBy(col("shard"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", col("value"))
            .otherwise(lit(0.0))).as("x"),
          sum(when(col("event_type") === "view", col("value"))
            .otherwise(lit(0.0))).as("y"))
      graft.operators.Forecast.grangerF(daily, Seq("shard"), "d", "y", "x")
        .select(col("shard"), col("n"), r6(col("rss_r")).as("rss_r"),
          r6(col("rss_u")).as("rss_u"), r6(col("f_stat")).as("f_stat"))
        .orderBy("shard")
    }),

    // Pettitt rank changepoint per user daily series — exact half-integer
    // U_t, argmax on (|U| desc, ts asc)
    "q319_pettitt" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Anomaly.pettitt(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"), r6(col("u_max")).as("u_max"),
          unix_timestamp(col("split_ts")).as("split_s"),
          r6(col("p_approx")).as("p_approx"))
        .orderBy("user_id")
    }),

    // Hedges' g standardized mean difference between even/odd users
    "q320_hedges" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(2L)).cast("string"))
      graft.operators.Experiment.hedgesG(d, Seq("event_type"), "shard",
          "0", "1", "value")
        .select(col("event_type"), col("n_a"), col("n_b"),
          r6(col("cohen_d")).as("cohen_d"), r6(col("hedges_g")).as("hedges_g"))
        .orderBy("event_type")
    }),

    // Brown–Forsythe variance-equality F across three event types per day
    // (ANOVA on |value − per-arm median|)
    "q321_brown_forsythe" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("day", dayofmonth(col("ts").cast("timestamp")))
      graft.operators.Robust.brownForsythe(d, Seq("day"), "event_type",
          Seq("click", "view", "purchase"), "value")
        .select(col("day"), col("n"), r6(col("ssb")).as("ssb"),
          r6(col("ssw")).as("ssw"), r6(col("f_stat")).as("f_stat"))
        .orderBy("day")
    }),

    // Grubbs' most-extreme-point statistic per user daily series
    "q322_grubbs" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Anomaly.grubbs(daily, Seq("user_id"), "v")
        .select(col("user_id"), col("n"), r6(col("g_stat")).as("g_stat"),
          r6(col("outlier_value")).as("outlier_value"))
        .orderBy("user_id")
    }),

    // Wald–Wolfowitz runs test on the above/below-median sign sequence
    "q323_runs" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Robust.runsTest(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n_above"), col("n_below"), col("runs"),
          r6(col("z")).as("z"))
        .orderBy("user_id")
    }),

    // partial correlation of daily click vs view totals with purchase held
    // fixed, per shard — the deconfounded association readout
    "q324_partial_corr" -> ((s, dir) => {
      val daily = ev(s, dir)
        .filter(col("event_type").isin("click", "view", "purchase"))
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .groupBy(col("shard"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", col("value"))
            .otherwise(lit(0.0))).as("x"),
          sum(when(col("event_type") === "view", col("value"))
            .otherwise(lit(0.0))).as("y"),
          sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0))).as("z"))
      graft.operators.Profile.partialCorr(daily, Seq("shard"), "x", "y", "z")
        .select(col("shard"), col("n"), r6(col("r_xy")).as("r_xy"),
          r6(col("r_xz")).as("r_xz"), r6(col("r_yz")).as("r_yz"),
          r6(col("r_xy_z")).as("r_xy_z"))
        .orderBy("shard")
    }),

    // Kruskal–Wallis H across all five event types per day-of-month
    "q325_kruskal" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("day", dayofmonth(col("ts").cast("timestamp")))
      graft.operators.Robust.kruskalWallis(d, Seq("day"), "event_type", "value")
        .select(col("day"), col("n"), col("n_arms"),
          r6(col("h_raw")).as("h_raw"), r6(col("h_stat")).as("h_stat"))
        .orderBy("day")
    }),

    // turning-point randomness test per user daily series
    "q326_turning" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Profile.turningPoints(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"), col("turning_points"),
          r6(col("z")).as("z"))
        .orderBy("user_id")
    }),

    // Lo–MacKinlay variance ratio (q=2) per user daily series
    "q327_vr" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.varianceRatio(daily, Seq("user_id"), "d", "v", 2)
        .select(col("user_id"), col("n_diff1"), col("n_diffq"),
          r6(col("vr")).as("vr"))
        .orderBy("user_id")
    }),

    // Durbin–Watson on lag-1-naive residuals of the daily series — ≈2 when
    // the naive's errors are white, → 0 when it underfits persistence
    "q328_dw" -> ((s, dir) => {
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val resid = daily
        .withColumn("e", col("v") - lag(col("v"), 1).over(wAsc))
        .filter(col("e").isNotNull)
      Metrics.durbinWatson(resid, Seq("user_id"), "d", "e")
        .select(col("user_id"), col("n"), r6(col("dw")).as("dw"))
        .orderBy("user_id")
    }),

    // CRPS of the train-window empirical ensemble against each of the 5
    // test days (q305's split), one row per (user, test day). Daily values
    // in INTEGER CENTS (the q152 quantized discipline): every |x−y| sum
    // and the pair sum are exact integers, so each score is a ratio of
    // exact sums — bit-identical across engines, no 6-dp boundary flakes.
    "q329_crps" -> ((s, dir) => {
      val wDesc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d").desc)
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        .withColumn("_rd", row_number().over(wDesc))
      val ens = daily.filter(col("_rd") > 5).select(col("user_id"), col("v"))
      val obs = daily.filter(col("_rd") <= 5)
        .select(col("user_id"), unix_timestamp(col("d")).as("od"), col("v").as("y"))
      Metrics.crpsEmpirical(ens, Seq("user_id"), "v", obs, "od", "y")
        .select(col("user_id"), col("od"), col("n_ens"),
          r6(col("crps") / 100).as("crps"))
        .orderBy("user_id", "od")
    }),

    // Atkinson inequality (ε=0.5) of hourly event counts per shard
    "q330_atkinson" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("b", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("shard"), col("b"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.Profile.atkinson(hourly, Seq("shard"), "cnt", epsilon = 0.5)
        .select(col("shard"), col("n"), r6(col("mean")).as("mean"),
          r6(col("ede")).as("ede"), r6(col("atkinson")).as("atkinson"))
        .orderBy("shard")
    }),

    // Theil T inequality of the same hourly counts — the decomposable index
    "q331_theil_ineq" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("b", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("shard"), col("b"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.Profile.theilT(hourly, Seq("shard"), "cnt")
        .select(col("shard"), col("n"), r6(col("mean")).as("mean"),
          r6(col("theil_t")).as("theil_t"))
        .orderBy("shard")
    }),

    // Palma ratio of hourly counts per shard — integer rank cuts, never a
    // float quantile boundary
    "q332_palma" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .withColumn("shard", pmod(col("user_id"), lit(4L)).cast("string"))
        .withColumn("ts_sec", unix_timestamp(col("ts").cast("timestamp")))
        .withColumn("b", col("ts_sec") - pmod(col("ts_sec"), lit(3600L)))
        .groupBy(col("shard"), col("b"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.Profile.palma(hourly, Seq("shard"), "cnt", "b")
        .select(col("shard"), col("n"), r6(col("top_share")).as("top_share"),
          r6(col("bottom_share")).as("bottom_share"), r6(col("palma")).as("palma"))
        .orderBy("shard")
    }),

    // Newey–West autocorrelation-robust SE of each user's daily mean
    // (Bartlett weights, L=3) next to the i.i.d. SE it corrects
    "q333_newey_west" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Robust.neweyWest(daily, Seq("user_id"), "d", "v", maxLag = 3)
        .select(col("user_id"), col("n"), r6(col("mean")).as("mean"),
          r6(col("se_iid")).as("se_iid"), r6(col("se_nw")).as("se_nw"))
        .orderBy("user_id")
    }),

    // in-degree power-law exponent of the q199 link graph (CSN 2009 MLE)
    "q334_powerlaw" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.powerlawAlpha(edges, kmin = 2L)
        .select(col("kmin"), col("n_nodes"), r6(col("alpha")).as("alpha"))
    }),

    // Newman modularity of the deterministic doc_id%7 partition over the
    // undirected q199 graph
    "q335_modularity" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      val labels = docs(s, dir).select(col("doc_id").cast("long").as("id"),
        pmod(col("doc_id"), lit(7L)).as("community"))
      graft.operators.Graph.modularity(edges, labels)
        .select(col("m"), col("n_communities"),
          r6(col("modularity")).as("modularity"))
    }),

    // restricted mean survival time at τ=25 days over q271's censored frame
    // (τ must exceed the smallest sf's event durations — 19-20 days at sf0.001)
    "q336_rmst" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val subj = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(us).as("_f"), max(us).as("_l"))
        .withColumn("dur", expr("(_l - _f) div 86400000000L"))
        .withColumn("e",
          when(col("_l") < lit(1706054400000000L), lit(1)).otherwise(lit(0)))
      graft.operators.Survival.rmst(subj, Seq("event_type"), "dur", "e", tau = 25L)
        .select(col("event_type"), col("tau"), col("n_times"),
          r6(col("rmst")).as("rmst"))
        .orderBy("event_type")
    }),

    // LB_Keogh lower bound (band 2) from each user's daily series to the
    // cross-user mean daily profile — the DTW pruning pass
    "q337_lb_keogh" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val ref = daily.groupBy(col("d")).agg(avg(col("v")).as("rv"))
      graft.operators.Similarity.lbKeogh(daily, Seq("user_id"), "d", "v",
          ref, "rv", band = 2)
        .select(col("user_id"), r6(col("lb_keogh")).as("lb_keogh"),
          col("n_matched"))
        .orderBy("user_id")
    }),

    // Bandt–Pompe permutation entropy (m=3) of each user's daily series —
    // near 1 (normalized) means order patterns are noise, don't model it
    "q338_perm_entropy" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Profile.permutationEntropy(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n_windows"), r6(col("pe")).as("pe"),
          r6(col("pe_norm")).as("pe_norm"))
        .orderBy("user_id")
    }),

    // Hjorth activity/mobility/complexity of the same daily series
    "q339_hjorth" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Profile.hjorth(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"), r6(col("activity")).as("activity"),
          r6(col("mobility")).as("mobility"),
          r6(col("complexity")).as("complexity"))
        .orderBy("user_id")
    }),

    // Yule's K vocabulary-repetitiveness constant per source
    "q340_yules_k" -> ((s, dir) => {
      graft.operators.TextAnalysis.yulesK(docs(s, dir), Seq("source"), "text")
        .select(col("source"), col("n_tokens"), col("vocab"),
          r6(col("yules_k")).as("yules_k"))
        .orderBy("source")
    }),

    // Heaps'-law vocabulary-growth fit per source (ln V on ln N OLS)
    "q341_heaps" -> ((s, dir) => {
      graft.operators.TextAnalysis.heapsFit(docs(s, dir), Seq("source"),
          "doc_id", "text")
        .select(col("source"), col("n_docs"), r6(col("beta")).as("beta"),
          r6(col("k")).as("k"))
        .orderBy("source")
    }),

    // average-neighbor-degree spectrum knn(k) of the q199 graph — the
    // curve behind q314's assortativity number
    "q342_knn_degree" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.avgNeighborDegree(edges)
        .select(col("degree"), col("n_nodes"),
          r6(col("avg_nbr_degree")).as("avg_nbr_degree"))
        .orderBy("degree")
    }),

    // rich-club coefficient at degree cuts 1/2/3/5 (integer-exact)
    "q343_rich_club" -> ((s, dir) => {
      val (edges, _) = docEdges(s, dir)
      graft.operators.Graph.richClub(edges, Seq(1L, 2L, 3L, 5L))
        .select(col("k"), col("n_nodes"), col("n_edges"),
          r6(col("phi")).as("phi"))
        .orderBy("k")
    }),

    // Dickey–Fuller unit-root regression per user daily series
    "q344_df_test" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.dickeyFuller(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"), r6(col("rho")).as("rho"),
          r6(col("t_stat")).as("t_stat"))
        .orderBy("user_id")
    }),

    // Apdex score per event type treating value as latency (T = 50)
    "q345_apdex" -> ((s, dir) => {
      Metrics.apdex(ev(s, dir), Seq("event_type"), "value", threshold = 50.0)
        .select(col("event_type"), col("n"), col("n_satisfied"),
          col("n_tolerating"), r6(col("apdex")).as("apdex"))
        .orderBy("event_type")
    }),

    // post-stratified arm means (strata = event_type, arms = even/odd
    // users) — composition-noise-free comparison next to the raw means
    "q346_post_strat" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("arm", pmod(col("user_id"), lit(2L)).cast("string"))
      graft.operators.Experiment.postStratify(d, "arm", "event_type", "value")
        .select(col("arm"), col("n"), r6(col("raw_mean")).as("raw_mean"),
          r6(col("post_strat_mean")).as("post_strat_mean"),
          r6(col("coverage")).as("coverage"))
        .orderBy("arm")
    }),

    // hour-of-day + day-of-week seasonal strengths per event type
    // (sequential profile removal — MSTL restricted to calendar means)
    "q347_multi_seasonal" -> ((s, dir) => {
      graft.operators.Features.multiSeasonalStrength(ev(s, dir),
          Seq("event_type"), "ts", "value")
        .select(col("event_type"), col("n"),
          r6(col("strength_hod")).as("strength_hod"),
          r6(col("strength_dow")).as("strength_dow"))
        .orderBy("event_type")
    }),

    // log-rank test between even/odd-user survival curves per event type
    // (dense pooled-time × segment risk grid; censoring-correct)
    "q348_log_rank" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val subj = ev(s, dir)
        .withColumn("seg", pmod(col("user_id"), lit(2L)).cast("string"))
        .groupBy(col("event_type"), col("seg"), col("user_id"))
        .agg(min(us).as("_f"), max(us).as("_l"))
        .withColumn("dur", expr("(_l - _f) div 86400000000L"))
        .withColumn("e",
          when(col("_l") < lit(1706054400000000L), lit(1)).otherwise(lit(0)))
      graft.operators.Survival.logRank(subj, Seq("event_type"), "seg",
          "0", "1", "dur", "e")
        .select(col("event_type"), r6(col("o1")).as("o1"), r6(col("e1")).as("e1"),
          r6(col("var_lr")).as("var_lr"), r6(col("z")).as("z"), col("n_times"))
        .orderBy("event_type")
    }),

    // Cochran–Mantel–Haenszel pooled odds ratio of (even/odd user) vs
    // (value > 50), stratified by event type — Simpson's-paradox-proof
    "q349_cmh" -> ((s, dir) => {
      val d = ev(s, dir)
        .withColumn("arm", pmod(col("user_id"), lit(2L)).cast("string"))
        .withColumn("success", (col("value") > 50.0).cast("int"))
      graft.operators.Experiment.cmhOddsRatio(d, Seq(), "event_type",
          "arm", "0", "1", "success")
        .select(col("n_strata"), col("n"), r6(col("or_mh")).as("or_mh"))
    }),

    // Tweedie deviances: Poisson (p=1) on daily event counts, Gamma (p=2)
    // on daily value sums, each against the user's mean — the demand-
    // appropriate losses squared error gets wrong
    "q350_deviance" -> ((s, dir) => {
      val dailyCnt = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      val muCnt = dailyCnt.groupBy("user_id").agg(avg(col("y")).as("mu"))
      val pois = Metrics.tweedieDeviance(dailyCnt.join(muCnt, "user_id"),
          Seq("user_id"), "y", "mu", power = 1)
        .withColumn("family", lit("poisson"))
      val dailyVal = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("y"))
      val muVal = dailyVal.groupBy("user_id").agg(avg(col("y")).as("mu"))
      val gam = Metrics.tweedieDeviance(dailyVal.join(muVal, "user_id"),
          Seq("user_id"), "y", "mu", power = 2)
        .withColumn("family", lit("gamma"))
      pois.unionByName(gam)
        .select(col("user_id"), col("family"), col("n"), col("n_excluded"),
          r6(col("mean_deviance")).as("mean_deviance"))
        .orderBy("user_id", "family")
    }),

    // ADIDA: aggregate the daily series into complete 3-day buckets, SES
    // at the coarse grain (noise cancels), disaggregate evenly
    "q351_adida" -> ((s, dir) => {
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val bucketed = daily
        .withColumn("_rn", row_number().over(wAsc))
        .withColumn("b", expr("(_rn - 1) div 3"))
        .groupBy(col("user_id"), col("b"))
        .agg(sum(col("v")).as("bv"), count(lit(1)).as("_bc"))
        .filter(col("_bc") === 3)
        .withColumn("bt", timestamp_seconds(col("b") * 259200L))
      graft.operators.Forecast.ses(bucketed, Seq("user_id"), "bt", "bv",
          alpha = 0.3, horizon = 1, stepSeconds = 259200L)
        .select(col("user_id"), r6(col("yhat") / 3).as("yhat_daily"))
        .orderBy("user_id")
    }),

    // Wiener spectral flatness over q193's candidate periods: geometric /
    // arithmetic mean of the periodogram powers (1 = white, → 0 = tonal)
    "q352_spectral_flatness" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val per = Features.periodogram(daily, Seq("user_id"), "d", "v",
        periods = Seq(2, 3, 7, 14))
      val ps = Seq(2, 3, 7, 14)
      val aggs = ps.map(p =>
        sum(when(col("period") === p, col("power"))).as(s"_p$p"))
      val piv = per.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      val allPos = ps.map(p => col(s"_p$p") > 0).reduce(_ && _)
      val lnSum = ps.map(p => log(col(s"_p$p"))).reduce(_ + _)
      val mean = ps.map(p => col(s"_p$p")).reduce(_ + _) / 4
      piv.withColumn("flatness", when(allPos, exp(lnSum / 4) / mean))
        .select(col("user_id"), r6(col("flatness")).as("flatness"))
        .orderBy("user_id")
    }),

    // integrated autocorrelation time τ = 1 + 2Σρ_l (l = 1..5) — how many
    // observations one "effective" sample costs; n_eff = n/τ
    "q353_acf_time" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      val acf = Features.acf(daily, Seq("user_id"), "d", "v",
        lags = Seq(1, 2, 3, 4, 5))
      val aggs = (1 to 5).map(l =>
        sum(when(col("lag") === l, col("acf"))).as(s"_a$l"))
      val piv = acf.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      val chain = (1 to 5).map(l => col(s"_a$l")).reduce(_ + _)
      piv.withColumn("tau_int", lit(1.0) + lit(2.0) * chain)
        .select(col("user_id"), r6(col("tau_int")).as("tau_int"))
        .orderBy("user_id")
    }),

    // AR(1) mean-reversion half-life from the Dickey–Fuller ρ:
    // hl = −ln2 / ln(1 + ρ) when the process reverts (0 < φ < 1)
    "q354_half_life" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Forecast.dickeyFuller(daily, Seq("user_id"), "d", "v")
        .withColumn("_phi", lit(1.0) + col("rho"))
        .withColumn("half_life",
          when(col("_phi") > 0 && col("_phi") < 1,
            lit(-0.6931471805599453) / log(col("_phi"))))
        .select(col("user_id"), col("n"), r6(col("rho")).as("rho"),
          r6(col("half_life")).as("half_life"))
        .orderBy("user_id")
    }),

    // Harrell's C-index per event type: does per-user activity volume
    // predict who churns sooner? (q271's censored frame; integer ties half)
    "q355_cindex" -> ((s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp"))
      val subj = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(us).as("_f"), max(us).as("_l"), count(lit(1)).as("pred"))
        .withColumn("dur", expr("(_l - _f) div 86400000000L"))
        .withColumn("e",
          when(col("_l") < lit(1706054400000000L), lit(1)).otherwise(lit(0)))
      graft.operators.Survival.concordanceIndex(subj, Seq("event_type"),
          "dur", "e", "pred")
        .select(col("event_type"), col("n_pairs"), col("n_concordant"),
          col("n_tied"), r6(col("c_index")).as("c_index"))
        .orderBy("event_type")
    }),

    // Cook's distance of every day against each user's OLS trend — which
    // observation moved the line, not just which residual is big
    "q356_cooks" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Robust.cooksDistance(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("resid")).as("resid"), r6(col("leverage")).as("leverage"),
          r6(col("cooks_d")).as("cooks_d"))
        .orderBy("user_id", "d_s")
    }),

    // Friedman rank test: are the five event types systematically ordered
    // in mean value across day-of-month blocks?
    "q357_friedman" -> ((s, dir) => {
      val mv = ev(s, dir)
        .withColumn("blk", dayofmonth(col("ts").cast("timestamp")))
        .groupBy(col("blk"), col("event_type"))
        .agg(avg(col("value")).as("mv"))
      graft.operators.Robust.friedman(mv, "blk", "event_type", "mv")
        .select(col("n_blocks"), col("k"), r6(col("chi2")).as("chi2"))
    }),

    // Cronbach's alpha of the five per-user event-type value totals —
    // do the "items" measure one underlying engagement trait?
    "q358_cronbach" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val aggsP = types.map(t => sum(when(col("event_type") === t, col("value"))
        .otherwise(lit(0.0))).as(s"_s_$t"))
      val piv = ev(s, dir).groupBy(col("user_id"))
        .agg(aggsP.head, aggsP.tail: _*)
      val total = types.map(t => col(s"_s_$t")).reduce(_ + _)
      val mAggs = Seq(count(lit(1)).cast("double").as("_n"),
        sum(total).as("_st"), sum(total * total).as("_qt")) ++
        types.flatMap(t => Seq(sum(col(s"_s_$t")).as(s"_m_$t"),
          sum(col(s"_s_$t") * col(s"_s_$t")).as(s"_q_$t")))
      val m = piv.agg(mAggs.head, mAggs.tail: _*)
      def popVar(sc: Column, qc: Column) = qc / col("_n") - (sc / col("_n")) * (sc / col("_n"))
      val sumVar = types.map(t => popVar(col(s"_m_$t"), col(s"_q_$t"))).reduce(_ + _)
      val varT = popVar(col("_st"), col("_qt"))
      m.withColumn("alpha", when(varT > 0,
          lit(5.0 / 4.0) * (lit(1.0) - sumVar / varT)))
        .withColumn("k", lit(5L))
        .withColumn("n_users", col("_n").cast("long"))
        .select(col("k"), col("n_users"), r6(col("alpha")).as("alpha"))
    }),

    // van Belle–Hughes trend homogeneity over q172's per-season MK z's:
    // χ²_total = Σz², χ²_trend = m·z̄², χ²_homog = the difference (df m−1)
    "q359_trend_homog" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value")).as("v"))
        .withColumn("dow", dayofweek(col("day")))
      val mk = Features.mannKendall(daily, Seq("user_id", "dow"), "day", "v")
      val aggsZ = (1 to 7).map(d =>
        sum(when(col("dow") === d, col("z"))).as(s"_z$d"))
      val piv = mk.groupBy(col("user_id")).agg(aggsZ.head, aggsZ.tail: _*)
      val mCnt = (1 to 7).map(d =>
        when(col(s"_z$d").isNotNull, 1).otherwise(0)).reduce(_ + _)
      val zSum = (1 to 7).map(d => coalesce(col(s"_z$d"), lit(0.0))).reduce(_ + _)
      val z2Sum = (1 to 7).map(d =>
        coalesce(col(s"_z$d") * col(s"_z$d"), lit(0.0))).reduce(_ + _)
      piv.withColumn("m", mCnt.cast("long"))
        .withColumn("chi2_total", z2Sum)
        .withColumn("chi2_trend", when(col("m") > 0,
          col("m") * (zSum / col("m")) * (zSum / col("m"))))
        .withColumn("chi2_homog", col("chi2_total") - col("chi2_trend"))
        .select(col("user_id"), col("m"), r6(col("chi2_total")).as("chi2_total"),
          r6(col("chi2_trend")).as("chi2_trend"),
          r6(col("chi2_homog")).as("chi2_homog"))
        .orderBy("user_id")
    }),

    // SNHT mean-shift breakpoint on the standardized daily series
    "q360_snht" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.Anomaly.snht(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"),
          unix_timestamp(col("split_ts")).as("split_s"),
          r6(col("t_stat")).as("t_stat"))
        .orderBy("user_id")
    }),

    // MAPA: SES per-day rates from 1/2/3-day aggregation levels combined
    // by a fixed-order mean — temporal-aggregation ensemble forecasting
    "q361_mapa" -> ((s, dir) => {
      val wAsc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      def rate(b: Int): DataFrame = {
        val series = if (b == 1)
          daily.select(col("user_id"), col("d").as("bt"), col("v").as("bv"))
        else daily
          .withColumn("_rn", row_number().over(wAsc))
          .withColumn("bk", expr(s"(_rn - 1) div $b"))
          .groupBy(col("user_id"), col("bk"))
          .agg(sum(col("v")).as("bv"), count(lit(1)).as("_bc"))
          .filter(col("_bc") === b)
          .withColumn("bt", timestamp_seconds(col("bk") * (b * 86400L)))
        graft.operators.Forecast.ses(series, Seq("user_id"), "bt", "bv",
            alpha = 0.3, horizon = 1, stepSeconds = b * 86400L)
          .select(col("user_id"), (col("yhat") / b).as(s"r$b"))
      }
      rate(1).join(rate(2), "user_id").join(rate(3), "user_id")
        .withColumn("yhat_daily", ((col("r1") + col("r2")) + col("r3")) / 3)
        .select(col("user_id"), r6(col("r1")).as("r1"), r6(col("r2")).as("r2"),
          r6(col("r3")).as("r3"), r6(col("yhat_daily")).as("yhat_daily"))
        .orderBy("user_id")
    }),

    // Jarque-Bera normality of the daily event-count series per type —
    // integer counts keep all four moment sums bit-exact cross-engine
    "q362_jarque_bera" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.jarqueBera(daily, Seq("event_type"), "cnt")
        .select(col("event_type"), col("n"), r6(col("skew")).as("skew"),
          r6(col("ex_kurt")).as("ex_kurt"), r6(col("jb")).as("jb"))
        .orderBy("event_type")
    }),

    // McNemar paired flip: per user, "had a purchase" in the first half of
    // the month (day <= 15) vs the second half
    "q363_mcnemar" -> ((s, dir) => {
      val paired = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) <= 15, 1).otherwise(0)).as("pre"),
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts")) >= 16, 1).otherwise(0)).as("post"))
      graft.operators.StatTests.mcnemar(paired, Nil, "pre", "post")
        .select(col("n_pairs"), col("b"), col("c"), r6(col("chi2")).as("chi2"))
    }),

    // Chow midpoint structural-break F on each user's daily-sum trend
    "q364_chow" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.StatTests.chow(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"),
          r6(col("rss_pooled")).as("rss_pooled"),
          r6(col("rss_split")).as("rss_split"), r6(col("f_stat")).as("f_stat"))
        .orderBy("user_id")
    }),

    // KPSS level-stationarity of the daily count series per event type —
    // the dickey-fuller (q344) mirror image
    "q365_kpss" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.StatTests.kpss(daily, Seq("event_type"), "d", "cnt")
        .select(col("event_type"), col("n"), r6(col("eta")).as("eta"))
        .orderBy("event_type")
    }),

    // Cochran's Q over day blocks x event-type treatments; success = the
    // day's count strictly above the type's mean daily count (integer
    // cross-multiplied compare, no float boundary)
    "q366_cochran_q" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val daily = ev(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("blk"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("x",
          (col("cnt") * count(lit(1)).over(wT) >
            sum(col("cnt")).over(wT)).cast("int"))
      graft.operators.StatTests.cochranQ(daily, "blk", "event_type", types, "x")
        .select(col("n_blocks"), col("k"), r6(col("q")).as("q"))
    }),

    // Breusch-Pagan LM: is the variance of each user's daily-sum trend
    // residuals drifting with time?
    "q367_breusch_pagan" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.StatTests.breuschPagan(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"), r6(col("slope")).as("slope"),
          r6(col("r2_aux")).as("r2_aux"), r6(col("lm")).as("lm"))
        .orderBy("user_id")
    }),

    // Engle-Granger cointegration between daily count series of three
    // literal event-type pairs (y regressed on x, then no-intercept DF on
    // the residuals)
    "q368_engle_granger" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c_view"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c_purchase"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("c_error"))
      val pairs = Seq(("click_on_view", "c_click", "c_view"),
        ("view_on_error", "c_view", "c_error"),
        ("click_on_purchase", "c_click", "c_purchase"))
      val stacked = pairs.map { case (name, yc, xc) =>
        daily.select(lit(name).as("pair"), col("d"),
          col(xc).as("x"), col(yc).as("y"))
      }.reduce(_.unionByName(_))
      graft.operators.StatTests.engleGranger(stacked, Seq("pair"), "d", "x", "y")
        .select(col("pair"), col("n"), r6(col("beta")).as("beta"),
          r6(col("rho")).as("rho"), r6(col("t_stat")).as("t_stat"))
        .orderBy("pair")
    }),

    // Bradley-Terry strengths of the five event types from daily count
    // "contests" (higher daily count wins), 5 MM rounds
    "q369_bradley_terry" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val daily = ev(s, dir)
        .groupBy(col("event_type").as("t"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      val a = daily.select(col("t").as("item"), col("d"), col("cnt").as("ca"))
      val b = daily.select(col("t").as("opp"), col("d"), col("cnt").as("cb"))
      val pairCounts = a.join(b, Seq("d")).filter(col("item") =!= col("opp"))
        .groupBy(col("item"), col("opp"))
        .agg(sum(when(col("ca") > col("cb"), 1L).otherwise(0L)).as("wins"))
      val r = graft.operators.StatTests.bradleyTerry(
        pairCounts, "item", "opp", "wins", types, iterations = 5)
      r.select((types.map(t => r6(col(s"p_$t")).as(s"p_$t")) :+
        col("n_comparisons")): _*)
    }),

    // Page's L ordered-trend test: day-of-month blocks, event types scored
    // against the fixed lexicographic arm order on mean value
    "q370_page_l" -> ((s, dir) => {
      val order = Seq("click", "error", "purchase", "signup", "view")
      val mv = ev(s, dir)
        .withColumn("blk", dayofmonth(col("ts").cast("timestamp")))
        .groupBy(col("blk"), col("event_type"))
        .agg(avg(col("value")).as("mv"))
      graft.operators.StatTests.pageL(mv, "blk", "event_type", order, "mv")
        .select(col("n_blocks"), col("k"), r6(col("l_stat")).as("l_stat"),
          r6(col("z")).as("z"))
    }),

    // Simpson / Shannon / Pielou diversity of the language mix per source
    // over the literal 5-language domain (fixed-order entropy folds)
    "q371_diversity" -> ((s, dir) => {
      val langs = Seq("en", "zh", "es", "de", "fr")
      val aggsD = langs.zipWithIndex.map { case (l, i) =>
        sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"_n$i")
      } :+ count(lit(1)).as("n_docs")
      val piv = docs(s, dir).groupBy(col("source"))
        .agg(aggsD.head, aggsD.tail: _*)
      val nTot = col("n_docs").cast("double")
      def p(i: Int) = col(s"_n$i").cast("double") / nTot
      val simpson = lit(1.0) - langs.indices.map(i => p(i) * p(i)).reduce(_ + _)
      val shannon = langs.indices.map(i =>
        when(col(s"_n$i") > 0, -p(i) * log(p(i))).otherwise(lit(0.0)))
        .reduce(_ + _)
      val kPresent = langs.indices.map(i =>
        when(col(s"_n$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
      piv.withColumn("k_langs", kPresent)
        .withColumn("simpson", simpson)
        .withColumn("shannon", shannon)
        .withColumn("evenness",
          when(col("k_langs") > 1, col("shannon") / log(col("k_langs").cast("double"))))
        .select(col("source"), col("n_docs"), col("k_langs"),
          r6(col("simpson")).as("simpson"), r6(col("shannon")).as("shannon"),
          r6(col("evenness")).as("evenness"))
        .orderBy("source")
    }),

    // Fano factor + Poisson overdispersion chi2 of daily counts per type
    // (integer moments, bit-exact cross-engine)
    "q372_fano" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      val agged = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cnt").cast("double")).as("_s"),
          sum(col("cnt").cast("double") * col("cnt").cast("double")).as("_q"))
      val n = col("n").cast("double")
      val m = col("_s") / n
      val popVar = col("_q") / n - m * m
      val sampVar = (col("_q") - col("_s") * col("_s") / n) / (n - lit(1.0))
      agged
        .withColumn("fano", when(m > 0, popVar / m))
        .withColumn("chi2", when(m > 0 && col("n") >= 2,
          (n - lit(1.0)) * sampVar / m))
        .select(col("event_type"), col("n"), r6(col("fano")).as("fano"),
          r6(col("chi2")).as("chi2"))
        .orderBy("event_type")
    }),

    // Gumbel method-of-moments fit on daily maxima of value per type, with
    // the 30-day return level (shared 16-digit sqrt(6)/pi literal)
    "q373_gumbel" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(max(col("value")).as("mx"))
      val agged = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("mx")).as("_s"),
          sum(col("mx") * col("mx")).as("_q"))
      val n = col("n").cast("double")
      val m = col("_s") / n
      val popVar = col("_q") / n - m * m
      val beta = when(popVar > 0, sqrt(popVar) * lit(0.779696801233676))
      agged
        .withColumn("beta", beta)
        .withColumn("mu", m - lit(0.5772156649015329) * col("beta"))
        .withColumn("rl30", col("mu") -
          col("beta") * log(-log(lit(1.0) - lit(1.0) / lit(30.0))))
        .select(col("event_type"), col("n"), r6(col("mu")).as("mu"),
          r6(col("beta")).as("beta"), r6(col("rl30")).as("rl30"))
        .orderBy("event_type")
    }),

    // Jaro-Winkler near-dup pairs over the bounded mutated-copy corpus
    // (q234 scoping) via the native codegen'd expression; threshold on the
    // 6-dp-rounded score (cross-engine rank-cut rule)
    "q374_jw_near_dup" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 150).select(col("doc_id"),
        substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 48).as("t"))
      val corpus = base.unionByName(base.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("t"), 1, 5), lit("X"),
            substring(col("t"), 7, 42)).as("t")))
        .filter(length(col("t")) >= 40)
      val a = corpus.select(col("doc_id").as("id_a"), col("t").as("ta"))
      val b = corpus.select(col("doc_id").as("id_b"), col("t").as("tb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("jw",
          r6(graft.functions.JaroWinklerExpr(col("ta"), col("tb"))))
        .filter(col("jw") >= 0.9)
        .select(col("id_a"), col("id_b"), col("jw"))
        .orderBy("id_a", "id_b")
    }),

    // Jonckheere-Terpstra ordered-alternative test on daily counts across
    // the lexicographic event-type order
    "q375_jonckheere" -> ((s, dir) => {
      val order = Seq("click", "error", "purchase", "signup", "view")
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.jonckheere(daily, "event_type", order, "cnt")
        .select(col("n"), r6(col("j_stat")).as("j_stat"), r6(col("z")).as("z"))
    }),

    // Mood's median test: do the five types share a common daily-count
    // median? (integer counts -> exact order statistic + chi2 cells)
    "q376_mood_median" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.moodMedian(daily, "event_type", types, "cnt")
        .select(col("n"), col("median").cast("double").as("median"),
          r6(col("chi2")).as("chi2"))
    }),

    // entropy rate of the user-level event-type Markov chain (q174's
    // transition grain): how predictable is the next event?
    "q377_markov_entropy" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = ev(s, dir).filter(col("event_type").isNotNull)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      graft.operators.StatTests.markovEntropyRate(tr, "event_type",
          "next_type", types)
        .select(col("n_transitions"),
          r6(col("entropy_rate")).as("entropy_rate"),
          r6(col("perplexity")).as("perplexity"))
    }),

    // Tukey-Kramer HSD pairwise q statistics on daily counts after the
    // q290 omnibus ANOVA
    "q378_tukey_hsd" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.tukeyHsd(daily, "event_type", types, "cnt")
        .select(col("arm_a"), col("arm_b"), r6(col("mean_a")).as("mean_a"),
          r6(col("mean_b")).as("mean_b"), r6(col("q_stat")).as("q_stat"))
        .orderBy("arm_a", "arm_b")
    }),

    // Ansari-Bradley scale test: click vs view daily-count dispersion
    // (tie-averaged end scores, exact finite-population moments)
    "q379_ansari_bradley" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.ansariBradley(daily, "event_type",
          "click", "view", "cnt")
        .select(col("n_a"), col("n_b"), r6(col("ab_stat")).as("ab_stat"),
          r6(col("z")).as("z"))
    }),

    // TextRank keyword scores: PageRank over the adjacent-token graph of
    // the top-40 corpus terms, 4 damped rounds; all nodes emitted (no
    // float rank cut)
    "q380_textrank" -> ((s, dir) => {
      graft.operators.TextAnalysis.textRank(docs(s, dir), "text",
          topN = 40, iterations = 4)
        .select(col("term"), col("freq"), r6(col("score")).as("score"))
        .orderBy("term")
    }),

    // Fisher's exact one-sided p for lang=en x long-doc (n_chars >= 1000):
    // ordered ln-factorial cumsum, ordered tail sum over k
    "q381_fisher_exact" -> ((s, dir) => {
      val flags = docs(s, dir).select(
        (col("lang") === "en").cast("int").as("fa"),
        (col("n_chars") >= 1000L).cast("int").as("fb"))
      graft.operators.StatTests.fisherExact(flags, "fa", "fb")
        .select(col("a"), col("b"), col("c"), col("d"),
          r6(col("p_greater")).as("p_greater"))
    }),

    // Chapman capture-recapture: users active in days 1-15 vs 16-31
    // estimate the total engaged population
    "q382_capture_recapture" -> ((s, dir) => {
      val flags = ev(s, dir).groupBy(col("user_id"))
        .agg(max(when(dayofmonth(col("ts")) <= 15, 1).otherwise(0)).as("f1"),
          max(when(dayofmonth(col("ts")) >= 16, 1).otherwise(0)).as("f2"))
      graft.operators.StatTests.chapman(flags, "f1", "f2")
        .select(col("n1"), col("n2"), col("m"), r6(col("n_hat")).as("n_hat"),
          r6(col("se")).as("se"))
    }),

    // Good-Turing smoothing of the corpus term-frequency table, r = 1..5
    "q383_good_turing" -> ((s, dir) => {
      graft.operators.TextAnalysis.goodTuring(docs(s, dir), "text", maxR = 5)
        .select(col("r"), col("n_r"), col("n_r_next"),
          r6(col("r_star")).as("r_star"), r6(col("p_unseen")).as("p_unseen"))
        .orderBy("r")
    }),

    // Lin's concordance: does the daily view count reproduce the daily
    // click count (agreement, not just correlation)?
    "q384_ccc" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      graft.operators.StatTests.concordance(daily, Nil, "x", "y")
        .select(col("n"), r6(col("pearson")).as("pearson"),
          r6(col("ccc")).as("ccc"))
    }),

    // switchback readout: alternate-day arms (day % 2), Welch t on daily
    // total value via explicit moment sums
    "q385_switchback" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
        .withColumn("arm", pmod(dayofmonth(col("d")), lit(2)))
      val agged = daily.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("v")).otherwise(lit(0.0))).as("_s1"),
        sum(when(col("arm") === 1, col("v") * col("v")).otherwise(lit(0.0))).as("_q1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("v")).otherwise(lit(0.0))).as("_s0"),
        sum(when(col("arm") === 0, col("v") * col("v")).otherwise(lit(0.0))).as("_q0"))
      val n1 = col("n1").cast("double"); val n0 = col("n0").cast("double")
      val m1 = col("_s1") / n1; val m0 = col("_s0") / n0
      val v1 = (col("_q1") - col("_s1") * col("_s1") / n1) / (n1 - lit(1.0))
      val v0 = (col("_q0") - col("_s0") * col("_s0") / n0) / (n0 - lit(1.0))
      val ok = col("n1") >= 2 && col("n0") >= 2
      agged
        .withColumn("effect", when(ok, m1 - m0))
        .withColumn("t_stat", when(ok && (v1 / n1 + v0 / n0) > 0,
          (m1 - m0) / sqrt(v1 / n1 + v0 / n0)))
        .select(col("n1"), col("n0"), r6(col("effect")).as("effect"),
          r6(col("t_stat")).as("t_stat"))
    }),

    // AMS F2 sketch on the corpus term-frequency table: 8 md5-signed
    // counters (exact integers) vs the exact second moment
    "q386_ams_f2" -> ((s, dir) => {
      val tf = docs(s, dir)
        .select(explode(graft.functions.Hashing.words(lower(col("text"))))
          .as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      graft.operators.Sketch.amsF2(tf, "term", "cnt", rows = 8)
        .select(col("n_items"), col("f2_exact"), r6(col("f2_est")).as("f2_est"),
          r6(col("rel_err")).as("rel_err"))
    }),

    // Dunning G2 keyness between even/odd doc halves (q245's split) — the
    // log-likelihood twin of the odds-ratio distinctive terms
    "q387_keyness" -> ((s, dir) => {
      graft.operators.TextAnalysis.keynessG2(
          docs(s, dir).withColumn("is_even", pmod(col("doc_id"), lit(2L)) === 0L),
          "text", "is_even", minCount = 50L)
        .select(col("term"), col("y_a"), col("y_b"), r6(col("g2")).as("g2"),
          col("over"))
        .orderBy("term")
    }),

    // Woolf odds-ratio CI on the q381 2x2 (lang=en x n_chars >= 1000)
    "q388_odds_ci" -> ((s, dir) => {
      val cells = docs(s, dir).agg(
        sum(when(col("lang") === "en" && col("n_chars") >= 1000L, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("lang") === "en" && col("n_chars") < 1000L, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("lang") =!= "en" && col("n_chars") >= 1000L, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("lang") =!= "en" && col("n_chars") < 1000L, 1L)
          .otherwise(0L)).as("d"))
      val ok = col("a") >= 1L && col("b") >= 1L && col("c") >= 1L &&
        col("d") >= 1L
      val or = col("a").cast("double") * col("d").cast("double") /
        (col("b").cast("double") * col("c").cast("double"))
      val se = sqrt(lit(1.0) / col("a").cast("double") +
        lit(1.0) / col("b").cast("double") +
        lit(1.0) / col("c").cast("double") + lit(1.0) / col("d").cast("double"))
      cells
        .withColumn("odds_ratio", when(ok, or))
        .withColumn("ci_lo", when(ok, exp(log(or) - lit(1.96) * se)))
        .withColumn("ci_hi", when(ok, exp(log(or) + lit(1.96) * se)))
        .select(col("a"), col("b"), col("c"), col("d"),
          r6(col("odds_ratio")).as("odds_ratio"), r6(col("ci_lo")).as("ci_lo"),
          r6(col("ci_hi")).as("ci_hi"))
    }),

    // Cox-Stuart paired-halves trend sign test on daily counts per type
    "q389_cox_stuart" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.coxStuart(daily, Seq("event_type"), "d", "cnt")
        .select(col("event_type"), col("n"), col("m"), col("s_plus"),
          r6(col("z")).as("z"))
        .orderBy("event_type")
    }),

    // Wilcoxon signed-rank on the paired daily (click, view) counts —
    // the paired cousin of q179's Mann-Whitney
    "q390_wilcoxon_sr" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      graft.operators.StatTests.wilcoxonSignedRank(daily, "x", "y")
        .select(col("n_pairs"), col("n_nonzero"), r6(col("w_plus")).as("w_plus"),
          r6(col("z")).as("z"))
    }),

    // Bartlett variance-homogeneity across the five types' daily counts —
    // the normal-theory complement of q321's Brown-Forsythe
    "q391_bartlett" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.bartlett(daily, "event_type", types, "cnt")
        .select(col("n"), r6(col("chi2")).as("chi2"))
    }),

    // one-knot hinge trend per user: b2 = midpoint slope change (Cramer
    // 3x3 on integer-exact X'X; det guard bit-exact)
    "q392_hinge_trend" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("v"))
      graft.operators.StatTests.hingeTrend(daily, Seq("user_id"), "d", "v")
        .select(col("user_id"), col("n"), r6(col("b0")).as("b0"),
          r6(col("b1")).as("b1"), r6(col("b2")).as("b2"))
        .orderBy("user_id")
    }),

    // Lepage combined location+scale: MWU z^2 + Ansari-Bradley z^2 on the
    // click-vs-view daily counts
    "q393_lepage" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      val mw = graft.operators.Robust.mannWhitney(daily, Nil, "event_type",
        "click", "view", "cnt").select(col("n_a"), col("n_b"),
        col("z").as("z_loc"))
      val ab = graft.operators.StatTests.ansariBradley(daily, "event_type",
        "click", "view", "cnt").select(col("z").as("z_scale"))
      mw.crossJoin(ab)
        .withColumn("lepage",
          col("z_loc") * col("z_loc") + col("z_scale") * col("z_scale"))
        .select(col("n_a"), col("n_b"), r6(col("z_loc")).as("z_loc"),
          r6(col("z_scale")).as("z_scale"), r6(col("lepage")).as("lepage"))
    }),

    // Byar approximate Poisson-rate CI per event type (events per day)
    "q394_poisson_ci" -> ((s, dir) => {
      val agged = ev(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("x"),
          countDistinct(date_trunc("day", col("ts"))).as("t_days"))
      val xd = col("x").cast("double")
      val td = col("t_days").cast("double")
      val x1 = xd + lit(1.0)
      val cLo = lit(1.0) - lit(1.0) / (lit(9.0) * xd) -
        lit(1.96) / (lit(3.0) * sqrt(xd))
      val cHi = lit(1.0) - lit(1.0) / (lit(9.0) * x1) +
        lit(1.96) / (lit(3.0) * sqrt(x1))
      agged
        .withColumn("rate", xd / td)
        .withColumn("ci_lo", when(col("x") >= 1L,
          xd * (cLo * cLo * cLo) / td))
        .withColumn("ci_hi", x1 * (cHi * cHi * cHi) / td)
        .select(col("event_type"), col("x"), col("t_days"),
          r6(col("rate")).as("rate"), r6(col("ci_lo")).as("ci_lo"),
          r6(col("ci_hi")).as("ci_hi"))
        .orderBy("event_type")
    }),

    // split-half reliability: odd-day vs even-day per-user value totals,
    // population Pearson + Spearman-Brown step-up (the q358 companion)
    "q395_split_half" -> ((s, dir) => {
      val u = ev(s, dir).groupBy(col("user_id"))
        .agg(sum(when(pmod(dayofmonth(col("ts")), lit(2)) === 1, col("value"))
          .otherwise(lit(0.0))).as("o"),
          sum(when(pmod(dayofmonth(col("ts")), lit(2)) === 0, col("value"))
            .otherwise(lit(0.0))).as("e"))
      val r = graft.operators.StatTests.concordance(u, Nil, "o", "e")
        .select(col("n").as("n_users"), col("pearson"))
      r.withColumn("sb", lit(2.0) * col("pearson") /
          (lit(1.0) + col("pearson")))
        .select(col("n_users"), r6(col("pearson")).as("r_half"),
          r6(col("sb")).as("sb"))
    }),

    // Pareto front of documents on (n_chars, n_tokens) — the skyline of
    // "long AND token-dense" corpus members
    "q396_skyline" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"),
        size(graft.functions.Hashing.words(lower(col("text"))))
          .cast("long").as("n_tokens"))
      graft.operators.Skyline.paretoFront(d, "doc_id", "n_chars", "n_tokens")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // Blomqvist quadrant beta of the daily (click, view) pair — O(n)
    // robust association around the medians
    "q397_blomqvist" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      graft.operators.StatTests.blomqvistBeta(daily, "x", "y")
        .select(col("n"), col("n_used"), r6(col("beta")).as("beta"))
    }),

    // Cramér's V (plain + Bergsma bias-corrected) for lang x source
    "q398_cramers_v" -> ((s, dir) => {
      graft.operators.StatTests.cramersV(docs(s, dir), "lang", "source")
        .select(col("n"), col("r_levels"), col("c_levels"),
          r6(col("chi2")).as("chi2"), r6(col("v")).as("v"),
          r6(col("v_corrected")).as("v_corrected"))
    }),

    // Goodman-Kruskal gamma + Somers' D_yx on the daily (click, view)
    // count pairs — ordinal association with tie semantics
    "q399_ordinal_assoc" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      graft.operators.StatTests.ordinalAssociation(daily, "x", "y")
        .select(col("n"), col("n_conc"), col("n_disc"),
          r6(col("gamma")).as("gamma"), r6(col("somers_d")).as("somers_d"))
    }),

    // Theil's U(lang | source): how much of the language mix does the
    // source explain?
    "q400_theil_u_cat" -> ((s, dir) => {
      val langs = Seq("en", "zh", "es", "de", "fr")
      graft.operators.StatTests.theilU(docs(s, dir), "lang", langs, "source")
        .select(col("n"), r6(col("h_x")).as("h_x"),
          r6(col("h_x_given_y")).as("h_x_given_y"), r6(col("u")).as("u"))
    }),

    // D'Agostino K2 omnibus normality on daily counts per type — the
    // small-n-calibrated upgrade of q362's Jarque-Bera
    "q401_dagostino" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.dagostinoK2(daily, Seq("event_type"), "cnt")
        .select(col("event_type"), col("n"), r6(col("z_skew")).as("z_skew"),
          r6(col("z_kurt")).as("z_kurt"), r6(col("k2")).as("k2"))
        .orderBy("event_type")
    }),

    // MWU-derived effect sizes: rank-biserial r and common-language
    // effect size for click vs view daily counts
    "q402_effect_sizes" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      val mw = graft.operators.Robust.mannWhitney(daily, Nil, "event_type",
        "click", "view", "cnt")
      val nn = col("n_a").cast("double") * col("n_b").cast("double")
      mw.withColumn("cles", col("u_a") / nn)
        .withColumn("rank_biserial", lit(2.0) * col("u_a") / nn - lit(1.0))
        .select(col("n_a"), col("n_b"), r6(col("u_a")).as("u_a"),
          r6(col("cles")).as("cles"),
          r6(col("rank_biserial")).as("rank_biserial"))
    }),

    // linear-weighted kappa between the n_chars tercile and the n_tokens
    // tercile of each document (ordinal agreement of two length notions)
    "q403_weighted_kappa" -> ((s, dir) => {
      val w1 = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_chars"), col("doc_id"))
      val w2 = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_tokens"), col("doc_id"))
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"),
          size(graft.functions.Hashing.words(lower(col("text"))))
            .cast("long").as("n_tokens"))
        .withColumn("ta", ntile(3).over(w1).cast("string"))
        .withColumn("tb", ntile(3).over(w2).cast("string"))
      graft.operators.StatTests.weightedKappa(d, "ta", "tb", Seq("1", "2", "3"))
        .select(col("n"), r6(col("kappa_w")).as("kappa_w"))
    }),

    // Sen's slope with the rank-based nonparametric CI on each type's
    // daily count series (the q143 point estimate grown a CI)
    "q404_sen_ci" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.senSlopeCI(daily, Seq("event_type"), "d", "cnt")
        .select(col("event_type"), col("n"), col("n_pairs"),
          r6(col("slope")).as("slope"), r6(col("ci_lo")).as("ci_lo"),
          r6(col("ci_hi")).as("ci_hi"))
        .orderBy("event_type")
    }),

    // Bowley quartile skew + Moors octile kurtosis per type (explicit
    // lower-value order-statistic picks, no interpolating builtins)
    "q405_robust_shape" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.robustShape(daily, Seq("event_type"), "cnt")
        .select(col("event_type"), col("n"), col("q1"), col("median"),
          col("q3"), r6(col("bowley_skew")).as("bowley_skew"),
          r6(col("moors_kurt")).as("moors_kurt"))
        .orderBy("event_type")
    }),

    // ANOVA effect sizes (eta2, epsilon2, omega2) from the q290 omnibus
    // moment pivot on daily counts
    "q406_anova_effects" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      val a = graft.operators.Experiment.anovaF(daily, Nil, "event_type",
        types, "cnt")
      val msw = col("ssw") / (col("n") - lit(5L)).cast("double")
      val sst = col("ssb") + col("ssw")
      val adj = col("ssb") - lit(4.0) * msw
      a.withColumn("eta2", when(sst > 0, col("ssb") / sst))
        .withColumn("epsilon2", when(sst > 0, adj / sst))
        .withColumn("omega2", when(sst + msw > 0, adj / (sst + msw)))
        .select(col("n"), r6(col("eta2")).as("eta2"),
          r6(col("epsilon2")).as("epsilon2"), r6(col("omega2")).as("omega2"))
    }),

    // GPD method-of-moments tail fit on above-mean daily-count excesses
    // (integer cross-multiplied exceedance rule)
    "q407_gpd_tail" -> ((s, dir) => {
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("_tot", sum(col("cnt")).over(wT))
        .withColumn("_nn", count(lit(1)).over(wT))
        .filter(col("cnt") * col("_nn") > col("_tot"))
        .withColumn("excess", col("cnt").cast("double") -
          col("_tot").cast("double") / col("_nn").cast("double"))
      graft.operators.StatTests.gpdFit(daily, Seq("event_type"), "excess")
        .select(col("event_type"), col("n_exceed"), r6(col("xi")).as("xi"),
          r6(col("sigma")).as("sigma"))
        .orderBy("event_type")
    }),

    // Spearman rho with the Fisher-z CI per type: daily count vs daily
    // total value
    "q408_spearman_ci" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("x"), sum(col("value")).as("y"))
      val r = Features.spearman(daily, Seq("event_type"), "x", "y")
      val rho = col("spearman_rho")
      val z = lit(0.5) * log((lit(1.0) + rho) / (lit(1.0) - rho))
      val half = lit(1.96) / sqrt(col("n").cast("double") - lit(3.0))
      def invZ(a: Column) =
        (exp(lit(2.0) * a) - lit(1.0)) / (exp(lit(2.0) * a) + lit(1.0))
      val ok = col("n") > 3 && abs(rho) < 1
      r.withColumn("ci_lo", when(ok, invZ(z - half)))
        .withColumn("ci_hi", when(ok, invZ(z + half)))
        .select(col("event_type"), col("n"), r6(rho).as("rho"),
          r6(col("ci_lo")).as("ci_lo"), r6(col("ci_hi")).as("ci_hi"))
        .orderBy("event_type")
    }),

    // confusion-matrix metrics for "long doc predicts English": precision,
    // recall, F1, specificity, balanced accuracy, Youden J, MCC
    "q409_confusion_metrics" -> ((s, dir) => {
      val cells = docs(s, dir).agg(
        sum(when(col("n_chars") >= 1000L && col("lang") === "en", 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("n_chars") >= 1000L && col("lang") =!= "en", 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("n_chars") < 1000L && col("lang") === "en", 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("n_chars") < 1000L && col("lang") =!= "en", 1L)
          .otherwise(0L)).as("tn"))
      def d(c: String) = col(c).cast("double")
      val prec = when(col("tp") + col("fp") > 0, d("tp") / (d("tp") + d("fp")))
      val rec = when(col("tp") + col("fn") > 0, d("tp") / (d("tp") + d("fn")))
      val spec = when(col("tn") + col("fp") > 0, d("tn") / (d("tn") + d("fp")))
      val mccDen = sqrt((d("tp") + d("fp")) * (d("tp") + d("fn")) *
        (d("tn") + d("fp")) * (d("tn") + d("fn")))
      cells
        .withColumn("precision", prec)
        .withColumn("recall", rec)
        .withColumn("f1", when(prec + rec > 0,
          lit(2.0) * prec * rec / (prec + rec)))
        .withColumn("balanced_acc", (rec + spec) / 2.0)
        .withColumn("youden_j", rec + spec - lit(1.0))
        .withColumn("mcc", when(mccDen > 0,
          (d("tp") * d("tn") - d("fp") * d("fn")) / mccDen))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          r6(col("precision")).as("precision"), r6(col("recall")).as("recall"),
          r6(col("f1")).as("f1"), r6(col("balanced_acc")).as("balanced_acc"),
          r6(col("youden_j")).as("youden_j"), r6(col("mcc")).as("mcc"))
    }),

    // Buishand adjusted-partial-sum range per type — the cumulative
    // mean-shift screen beside q360's SNHT and q319's Pettitt
    "q410_buishand" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.StatTests.buishandRange(daily, Seq("event_type"), "d", "cnt")
        .select(col("event_type"), col("n"), r6(col("r_range")).as("r_range"),
          r6(col("r_scaled")).as("r_scaled"))
        .orderBy("event_type")
    }),

    // von Neumann successive-difference ratio per type (white noise ~ 2)
    "q411_von_neumann" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.StatTests.vonNeumann(daily, Seq("event_type"), "d", "cnt")
        .select(col("event_type"), col("n"), r6(col("vn")).as("vn"))
        .orderBy("event_type")
    }),

    // RMSSE (M5 accuracy metric): naive-1 forecast on the back half,
    // scaled by the front half's naive MSE
    "q412_rmsse" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("d"))
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
        .withColumn("yhat", lag(col("y"), 1).over(w))
        .withColumn("seg", when(dayofmonth(col("d")) <= 15, 1).otherwise(2))
        .filter(col("yhat").isNotNull)
      val agged = daily.groupBy(col("event_type"))
        .agg(
          sum(when(col("seg") === 1, 1L).otherwise(0L)).as("n_train"),
          sum(when(col("seg") === 1,
            (col("y") - col("yhat")) * (col("y") - col("yhat")))
            .otherwise(lit(0.0))).as("_trainSse"),
          sum(when(col("seg") === 2, 1L).otherwise(0L)).as("n_test"),
          sum(when(col("seg") === 2,
            (col("y") - col("yhat")) * (col("y") - col("yhat")))
            .otherwise(lit(0.0))).as("_testSse"))
      val scale = col("_trainSse") / col("n_train").cast("double")
      val mse = col("_testSse") / col("n_test").cast("double")
      agged.withColumn("rmsse",
          when(col("n_train") >= 1 && col("n_test") >= 1 && scale > 0,
            sqrt(mse / scale)))
        .select(col("event_type"), col("n_train"), col("n_test"),
          r6(col("rmsse")).as("rmsse"))
        .orderBy("event_type")
    }),

    // Taylor fluctuation scaling: ln(var) on ln(mean) of per-user daily
    // counts — how does volatility grow with volume?
    "q413_taylor_law" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.taylorLaw(daily, Seq("user_id"), "cnt")
        .select(col("n_units"),
          r6(col("intercept_ln_a")).as("intercept_ln_a"),
          r6(col("slope_b")).as("slope_b"))
    }),

    // Lorenz asymmetry of per-user event counts: are the heavy users or
    // the long tail driving the inequality q150 measures?
    "q414_lorenz_asym" -> ((s, dir) => {
      val perUser = ev(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.lorenzAsymmetry(perUser, "cnt")
        .select(col("n"), r6(col("f_below")).as("f_below"),
          r6(col("l_below")).as("l_below"), r6(col("s_asym")).as("s_asym"))
    }),

    // Kendall's W: do the five event types rank the days of the month the
    // same way? (tie-corrected concordance over complete day blocks)
    "q415_kendall_w" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "error", "signup")
      val daily = ev(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("blk"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.StatTests.kendallW(daily, "blk", "event_type", types, "cnt")
        .select(col("n_items"), col("m"), r6(col("w")).as("w"),
          r6(col("chi2")).as("chi2"))
    }),

    // Fleiss' kappa: 5 type-"raters" vote whether each day beats their own
    // mean daily count (q366's integer rule; absent type-day = 0 vote)
    "q416_fleiss_kappa" -> ((s, dir) => {
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val votes = ev(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("blk"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("x", (col("cnt") * count(lit(1)).over(wT) >
          sum(col("cnt")).over(wT)).cast("long"))
        .groupBy(col("blk")).agg(sum(col("x")).as("pos"))
      graft.operators.StatTests.fleissKappa(votes, "pos", m = 5)
        .select(col("n_items"), col("m"), r6(col("p_bar")).as("p_bar"),
          r6(col("p_e")).as("p_e"), r6(col("kappa")).as("kappa"))
    }),

    // Gwet's AC1 on the same design — the prevalence-stable companion
    "q417_gwets_ac1" -> ((s, dir) => {
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val votes = ev(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("blk"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("x", (col("cnt") * count(lit(1)).over(wT) >
          sum(col("cnt")).over(wT)).cast("long"))
        .groupBy(col("blk")).agg(sum(col("x")).as("pos"))
      graft.operators.StatTests.gwetAc1(votes, "pos", m = 5)
        .select(col("n_items"), col("m"), r6(col("p_bar")).as("p_bar"),
          r6(col("p_e_gwet")).as("p_e_gwet"), r6(col("ac1")).as("ac1"))
    }),

    // SAS bimodality coefficient from sample-corrected skew/kurtosis on
    // daily counts per type (BC > 0.555 hints bimodal)
    "q418_bimodality" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("x"))
      val agged = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("_s1"),
          sum(col("x") * col("x")).as("_s2"),
          sum(col("x") * col("x") * col("x")).as("_s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("_s4"))
      val n = col("n").cast("double")
      val mu = col("_s1") / n
      val m2 = col("_s2") / n - mu * mu
      val m3 = col("_s3") / n - lit(3.0) * mu * (col("_s2") / n) +
        lit(2.0) * mu * mu * mu
      val m4 = col("_s4") / n - lit(4.0) * mu * (col("_s3") / n) +
        lit(6.0) * mu * mu * (col("_s2") / n) - lit(3.0) * mu * mu * mu * mu
      val g1 = m3 / sqrt(m2 * m2 * m2) * sqrt(n * (n - 1)) / (n - 2)
      val g2 = (n - 1) / ((n - 2) * (n - 3)) *
        ((n + 1) * (m4 / (m2 * m2) - lit(3.0)) + lit(6.0))
      val ok = col("n") >= 4 && m2 > 0
      agged
        .withColumn("skew_g1", when(ok, g1))
        .withColumn("kurt_g2", when(ok, g2))
        .withColumn("bc", when(ok, (g1 * g1 + 1) /
          (g2 + lit(3.0) * (n - 1) * (n - 1) / ((n - 2) * (n - 3)))))
        .select(col("event_type"), col("n"), r6(col("skew_g1")).as("skew_g1"),
          r6(col("kurt_g2")).as("kurt_g2"), r6(col("bc")).as("bc"))
        .orderBy("event_type")
    }),

    // CUSUM-of-squares variance-change locator on daily count diffs
    "q419_cusum_squares" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("d"))
      val diffs = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dx", col("cnt") - lag(col("cnt"), 1).over(w))
        .filter(col("dx").isNotNull)
      graft.operators.StatTests.cusumSquares(diffs, Seq("event_type"), "d", "dx")
        .select(col("event_type"), col("n"), r6(col("stat")).as("stat"),
          unix_timestamp(col("split_ts")).as("split_s"))
        .orderBy("event_type")
    }),

    // exact binomial sign test on the paired daily (click, view) counts —
    // the q390 companion via the q381 ln-factorial machinery
    "q420_sign_test" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      graft.operators.StatTests.signTestExact(daily, "x", "y")
        .select(col("n_pairs"), col("b"), col("c"),
          r6(col("p_two_sided")).as("p_two_sided"))
    }),

    // Rousseeuw-Croux Qn robust scale of the click daily counts (pairwise
    // gap order statistic, 50% breakdown)
    "q421_qn_scale" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.qnScale(daily, "cnt")
        .select(col("n"), col("n_pairs"), r6(col("qn_raw")).as("qn_raw"),
          r6(col("qn")).as("qn"))
    }),

    // Hodges-Lehmann two-sample shift (click minus view daily counts)
    // with the Moses rank CI — the magnitude q179's MWU only tests
    "q422_hl_shift" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.hlShift(daily, "event_type", "click", "view",
          "cnt")
        .select(col("n_a"), col("n_b"), r6(col("shift")).as("shift"),
          r6(col("ci_lo")).as("ci_lo"), r6(col("ci_hi")).as("ci_hi"))
    }),

    // one-sample KS of click intra-day second offsets against U(0, 86400)
    "q423_ks_uniform" -> ((s, dir) => {
      val u = ev(s, dir).filter(col("event_type") === "click")
        .select((unix_timestamp(col("ts").cast("timestamp")) % 86400L)
          .cast("double").as("u"))
      graft.operators.StatTests.ksUniform(u, "u", span = 86400.0)
        .select(col("n"), r6(col("d_stat")).as("d_stat"))
    }),

    // circular statistics of the click time-of-day angle: mean direction,
    // resultant, circular variance, Rayleigh uniformity z
    "q424_circular" -> ((s, dir) => {
      val th = ev(s, dir).filter(col("event_type") === "click")
        .select(((unix_timestamp(col("ts").cast("timestamp")) % 86400L)
          .cast("double") * lit(6.283185307179586) / lit(86400.0)).as("theta"))
      graft.operators.StatTests.circularStats(th, "theta")
        .select(col("n"), r6(col("mean_dir")).as("mean_dir"),
          r6(col("resultant")).as("resultant"),
          r6(col("circ_var")).as("circ_var"),
          r6(col("rayleigh_z")).as("rayleigh_z"))
    }),

    // distribution-free order-statistic CI for the median click daily count
    "q425_median_ci" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.medianCI(daily, "cnt")
        .select(col("n"), col("median"), col("ci_lo"), col("ci_hi"))
    }),

    // proportion effect sizes for the purchase share, first vs second half
    // of month: Cohen's h, risk ratio with log CI
    "q426_proportion_effects" -> ((s, dir) => {
      val cells = ev(s, dir).agg(
        sum(when(dayofmonth(col("ts")) <= 15 &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("x1"),
        sum(when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L)).as("n1"),
        sum(when(dayofmonth(col("ts")) >= 16 &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("x2"),
        sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L)).as("n2"))
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val p2 = col("x2").cast("double") / col("n2").cast("double")
      val ok = col("x1") >= 1L && col("x2") >= 1L && col("n1") >= 1L &&
        col("n2") >= 1L
      val rr = p1 / p2
      val se = sqrt((lit(1.0) - p1) / col("x1").cast("double") +
        (lit(1.0) - p2) / col("x2").cast("double"))
      cells
        .withColumn("p1", when(ok, p1))
        .withColumn("p2", when(ok, p2))
        .withColumn("cohens_h", when(ok,
          lit(2.0) * asin(sqrt(p1)) - lit(2.0) * asin(sqrt(p2))))
        .withColumn("risk_ratio", when(ok, rr))
        .withColumn("rr_lo", when(ok, exp(log(rr) - lit(1.96) * se)))
        .withColumn("rr_hi", when(ok, exp(log(rr) + lit(1.96) * se)))
        .select(col("x1"), col("n1"), col("x2"), col("n2"),
          r6(col("p1")).as("p1"), r6(col("p2")).as("p2"),
          r6(col("cohens_h")).as("cohens_h"),
          r6(col("risk_ratio")).as("risk_ratio"), r6(col("rr_lo")).as("rr_lo"),
          r6(col("rr_hi")).as("rr_hi"))
    }),

    // RBF-kernel MMD (median-heuristic bandwidth) between the click and
    // view daily-count distributions — detects ANY shape difference
    "q427_mmd" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.mmdRbf(daily, "event_type", "click", "view",
          "cnt")
        .select(col("n_a"), col("n_b"), r6(col("bandwidth")).as("bandwidth"),
          r6(col("mmd2")).as("mmd2"))
    }),

    // Yuen's 20%-trimmed t on the click-vs-view daily counts — the
    // outlier-robust alternative to q169's Welch
    "q428_yuen_t" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.yuenT(daily, "event_type", "click", "view",
          "cnt")
        .select(col("n_a"), col("n_b"), col("h_a"), col("h_b"),
          r6(col("tmean_a")).as("tmean_a"), r6(col("tmean_b")).as("tmean_b"),
          r6(col("t_stat")).as("t_stat"))
    }),

    // Dixon's Q most-extreme-point screen per type's daily counts
    "q429_dixon_q" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.dixonQ(daily, Seq("event_type"), "cnt")
        .select(col("event_type"), col("n"), r6(col("q_min")).as("q_min"),
          r6(col("q_max")).as("q_max"))
        .orderBy("event_type")
    }),

    // first-harmonic (cosinor) fit of the hour-of-day activity profile:
    // mesor, amplitude, acrophase, variance explained
    "q430_harmonic_fit" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(hour(col("ts")).as("hb"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.StatTests.harmonicFit(hourly, "hb", "cnt", period = 24)
        .select(col("n"), r6(col("mesor")).as("mesor"),
          r6(col("amplitude")).as("amplitude"), r6(col("phase")).as("phase"),
          r6(col("var_explained")).as("var_explained"))
    }),

    // ICC(1) with the unequal-size k0 correction: how much daily-count
    // variance is BETWEEN users vs within?
    "q431_icc" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.icc1(daily, Seq("user_id"), "cnt")
        .select(col("n"), col("n_groups"), r6(col("k0")).as("k0"),
          r6(col("msb")).as("msb"), r6(col("msw")).as("msw"),
          r6(col("icc")).as("icc"))
    }),

    // ROC-AUC of n_chars as a predictor of lang = en (midrank identity)
    "q432_roc_auc" -> ((s, dir) => {
      val d = docs(s, dir).select(
        (col("lang") === "en").cast("long").as("y"),
        col("n_chars").cast("double").as("score"))
      graft.operators.StatTests.rocAuc(d, "y", "score")
        .select(col("n_pos"), col("n_neg"), r6(col("auc")).as("auc"))
    }),

    // Brunner-Munzel nonparametric Behrens-Fisher on click vs view daily
    // counts — MWU without the equal-dispersion assumption
    "q433_brunner_munzel" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.brunnerMunzel(daily, "event_type", "click",
          "view", "cnt")
        .select(col("n_a"), col("n_b"), r6(col("p_hat")).as("p_hat"),
          r6(col("w_stat")).as("w_stat"))
    }),

    // Siegel repeated-medians slope of the click daily trend — the 50%-
    // breakdown upgrade of q143's Theil-Sen (29%)
    "q434_siegel_slope" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy((unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("long").as("day_idx"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.siegelSlope(daily, "day_idx", "cnt")
        .select(col("n"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"))
    }),

    // Rousseeuw-Croux Sn robust scale of the click daily counts — the
    // median-of-high-medians companion of q421's Qn
    "q435_sn_scale" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.snScale(daily, "cnt")
        .select(col("n"), r6(col("sn_raw")).as("sn_raw"), r6(col("sn")).as("sn"))
    }),

    // sample L-moments of the click daily counts: robust l1/l2 + L-CV,
    // L-skew, L-kurtosis by order-statistic weights
    "q436_lmoments" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.lmoments(daily, "cnt")
        .select(col("n"), r6(col("l1")).as("l1"), r6(col("l2")).as("l2"),
          r6(col("t2")).as("t2"), r6(col("t3")).as("t3"),
          r6(col("t4")).as("t4"))
    }),

    // Cucconi joint location-scale test on click vs view daily counts —
    // one statistic for "did the level OR the spread move"
    "q437_cucconi" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.cucconi(daily, "event_type", "click",
          "view", "cnt")
        .select(col("n_a"), col("n_b"), r6(col("u_stat")).as("u_stat"),
          r6(col("v_stat")).as("v_stat"), r6(col("rho")).as("rho"),
          r6(col("c_stat")).as("c_stat"))
    }),

    // Quade blocked rank test: days = blocks, event types = treatments,
    // blocks weighted by their range — the power upgrade of q357 Friedman
    "q438_quade" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.quade(daily, "d", "event_type", "cnt")
        .select(col("n_blocks"), col("k"), r6(col("a_term")).as("a_term"),
          r6(col("b_term")).as("b_term"), r6(col("f_stat")).as("f_stat"))
    }),

    // Spiegelhalter calibration Z of a fixed rational length->is-english
    // score p = n/(n+2000) (transcendental-free: exact cross-engine) —
    // the binning-free companion of q156's ECE
    "q439_spiegelhalter_z" -> ((s, dir) => {
      val scored = docs(s, dir).select(
        (col("lang") === "en").cast("double").as("y"),
        (col("n_chars").cast("double") /
          (col("n_chars").cast("double") + lit(2000.0))).as("p"))
      graft.operators.StatTests.spiegelhalterZ(scored, "y", "p")
        .select(col("n"), r6(col("brier")).as("brier"),
          r6(col("z_stat")).as("z_stat"))
    }),

    // Hosmer-Lemeshow decile calibration chi2 of the same rational
    // length->is-english score q439 tests globally — WHICH bins are off
    "q440_hosmer_lemeshow" -> ((s, dir) => {
      val scored = docs(s, dir).select(col("doc_id"),
        (col("lang") === "en").cast("double").as("y"),
        (col("n_chars").cast("double") /
          (col("n_chars").cast("double") + lit(2000.0))).as("p"))
      graft.operators.StatTests.hosmerLemeshow(scored, "y", "p", "doc_id",
          g = 10)
        .select(col("g"), col("n"), r6(col("hl_chi2")).as("hl_chi2"))
    }),

    // Krippendorff's alpha: days = units, each active user's did-they-
    // purchase as a binary rating — agreement with unequal raters/unit
    "q441_krippendorff" -> ((s, dir) => {
      val ratings = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"), col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("int")).as("rated"))
      graft.operators.StatTests.krippendorffAlpha(ratings, "d", "rated")
        .select(col("n_units"), col("n_ratings"), r6(col("alpha")).as("alpha"))
    }),

    // Kuiper's V of click intra-day offsets vs U(0, 86400) — the
    // wrap-point-fair circular refinement of q423's KS
    "q442_kuiper" -> ((s, dir) => {
      val u = ev(s, dir).filter(col("event_type") === "click")
        .select((unix_timestamp(col("ts").cast("timestamp")) % 86400L)
          .cast("double").as("u"))
      graft.operators.StatTests.kuiperUniform(u, "u", span = 86400.0)
        .select(col("n"), r6(col("d_plus")).as("d_plus"),
          r6(col("d_minus")).as("d_minus"), r6(col("v_stat")).as("v_stat"))
    }),

    // sample entropy (m=2, r = median |successive diff|) of the click
    // daily counts — regularity score of the traffic series
    "q443_sample_entropy" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.sampleEntropy(daily, "d", "cnt")
        .select(col("n"), r6(col("r")).as("r"), col("b_pairs"),
          col("a_pairs"), r6(col("sampen")).as("sampen"))
    }),

    // Higuchi fractal dimension (kMax=5) of the click daily counts —
    // smooth trend ~1, space-filling noise ~2
    "q444_higuchi_fd" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.higuchiFd(daily, "d", "cnt", kMax = 5)
        .select(col("n"), r6(col("fd")).as("fd"))
    }),

    // c3 nonlinearity + time-reversal asymmetry (lag 1) of the click
    // daily counts — sawtooth build/crash shapes ACF can't see
    "q445_c3_trev" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.c3Trev(daily, "d", "cnt", lagStep = 1)
        .select(col("n"), r6(col("c3")).as("c3"), r6(col("trev")).as("trev"))
    }),

    // Chatterjee's xi: is daily purchase count a FUNCTION of daily click
    // count? (beyond-monotone dependence; ties-general, d-tie-broken)
    "q446_chatterjee_xi" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.StatTests.chatterjeeXi(daily, "x", "y", "d")
        .select(col("n"), r6(col("xi")).as("xi"))
    }),

    // Hoeffding's D independence test on the same daily (clicks,
    // purchases) pair — classical null, any-dependence alternative
    "q447_hoeffding_d" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.StatTests.hoeffdingD(daily, "x", "y", "d")
        .select(col("n"), r6(col("d_stat")).as("d_stat"))
    }),

    // distance correlation of the daily pair — energy-statistics
    // complement (dCor = 0 iff independent; exact integer distances)
    "q448_distance_corr" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.StatTests.distanceCorr(daily, "x", "y", "d")
        .select(col("n"), r6(col("dcov2")).as("dcov2"),
          r6(col("dvarx2")).as("dvarx2"), r6(col("dvary2")).as("dvary2"),
          r6(col("dcor")).as("dcor"))
    }),

    // binary transfer entropy clicks->purchases at lag 1 — directed
    // information flow the symmetric measures above can't see
    "q449_transfer_entropy" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.StatTests.transferEntropy(daily, "d", "x", "y")
        .select(col("t"), r6(col("te_nats")).as("te_nats"))
    }),

    // two-sample Anderson-Darling: click vs purchase value
    // distributions, tail-weighted (vs q142 KS / q313 CvM)
    "q450_ad_2sample" -> ((s, dir) => {
      graft.operators.StatTests.adTwoSample(ev(s, dir), "event_type",
          "click", "purchase", "value", "event_id")
        .select(col("n_a"), col("n_b"), r6(col("a2")).as("a2"))
    }),

    // Baumgartner-Weiss-Schindler B on the same two arms — the
    // variance-rescaled ECDF gap that weights both tails fully
    "q451_bws" -> ((s, dir) => {
      graft.operators.StatTests.bws(ev(s, dir), "event_type",
          "click", "purchase", "value", "event_id")
        .select(col("n_a"), col("n_b"), r6(col("b_stat")).as("b_stat"))
    }),

    // Bartels rank von Neumann ratio: serial dependence in the daily
    // event-count series (nonparametric randomness check)
    "q452_bartels_rank" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.bartelsRank(daily, "d", "cnt")
        .select(col("n"), r6(col("rvn")).as("rvn"), r6(col("z")).as("z"))
    }),

    // Nadaraya-Watson Gaussian kernel smoother of the daily click-count
    // series, evaluated at day-index grid points (h = 7 days)
    "q453_nadaraya_watson" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("x", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("double"))
      graft.operators.StatTests.nadarayaWatson(daily, "x", "cnt", 7.0,
          Seq(10.0, 30.0, 60.0))
        .select(col("g"), r6(col("yhat")).as("yhat"), col("n"))
    }),

    // Gumbel PPCC: are the daily maxima of event value Gumbel-distributed?
    // (the pre-check for the q-return-level extrapolation)
    "q454_gumbel_ppcc" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(max(col("value")).as("mx"))
      graft.operators.StatTests.gumbelPpcc(daily, "mx", "d")
        .select(col("n"), r6(col("ppcc")).as("ppcc"))
    }),

    // Lomb-Scargle power at 1d and 7d on the hourly mean-value series —
    // the uneven-sampling periodogram (missing buckets don't smear power)
    "q455_lomb_scargle" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(avg(col("value")).as("m"))
      graft.operators.StatTests.lombScargle(hourly, "h", "m",
          Seq(86400.0, 604800.0))
        .select(col("period_sec"), r6(col("power")).as("power"), col("n"))
    }),

    // DFA scaling exponent of the daily count series (alpha ~ 0.5 white
    // noise, 1.0 1/f, 1.5 Brownian) over box sizes 4/8/16
    "q456_dfa" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.dfa(daily, "d", "cnt", Seq(4, 8, 16))
        .select(col("s"), col("nboxes"), r6(col("f2")).as("f2"),
          r6(col("alpha")).as("alpha"))
    }),

    // Weibull shape/scale of purchase values by median-rank regression
    "q457_weibull_mrr" -> ((s, dir) => {
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
      graft.operators.StatTests.weibullMrr(pur, "value", "event_id")
        .select(col("n"), r6(col("shape")).as("shape"),
          r6(col("scale_")).as("scale_"))
    }),

    // Allan variance ladder of the hourly mean-value stream: which noise
    // regime (white / flicker / random-walk) is the metric in?
    "q458_allan_var" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(avg(col("value")).as("m"))
      graft.operators.StatTests.allanVariance(hourly, "h", "m", Seq(1, 2, 4))
        .select(col("tau"), col("groups"), r6(col("avar")).as("avar"))
    }),

    // temporal semivariogram of daily counts at lags 1/2/7/14 — the
    // drift-robust ACF cousin, pairs matched on actual day offsets
    "q459_variogram" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.variogram(daily, "d", "cnt", Seq(1, 2, 7, 14))
        .select(col("h"), col("n_pairs"), r6(col("gamma")).as("gamma"))
    }),

    // Ripley's K at 1m/10m/1h scales on purchase times: how clustered is
    // the purchase process vs uniform-Poisson at each scale?
    "q460_ripley_k" -> ((s, dir) => {
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
      graft.operators.StatTests.ripleyK(pur, "ts", Seq(60.0, 600.0, 3600.0))
        .select(col("r_sec"), col("n"), col("pairs"),
          r6(col("k_hat")).as("k_hat"), r6(col("ratio")).as("ratio"))
    }),

    // Epanechnikov KDE of event value at a fixed grid — the exact-zero
    // compact-support density readout
    "q461_epanechnikov_kde" -> ((s, dir) => {
      graft.operators.StatTests.epanechnikovKde(ev(s, dir), "value", 5.0,
          Seq(2.0, 5.0, 10.0, 20.0))
        .select(col("g"), r6(col("fhat")).as("fhat"), col("n"))
    }),

    // local-linear kernel regression on the daily click series — the
    // boundary-bias-corrected sibling of q453's NW smoother
    "q462_local_linear" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("event_type") === "click")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("x", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("double"))
      graft.operators.StatTests.localLinear(daily, "x", "cnt", 7.0,
          Seq(10.0, 30.0, 60.0))
        .select(col("g"), r6(col("yhat")).as("yhat"), col("n"))
    }),

    // Hill tail-index of purchase values over the top-100 order stats:
    // how heavy is the value tail really?
    "q463_hill" -> ((s, dir) => {
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
      graft.operators.StatTests.hillEstimator(pur, "value", "event_id", 100)
        .select(col("n_top"), r6(col("threshold")).as("threshold"),
          r6(col("inv_alpha")).as("inv_alpha"), r6(col("alpha")).as("alpha"))
    }),

    // Cornish-Fisher p95 from four moments vs the exact p95 — the
    // "non-Gaussian quantile from power sums only" estimator
    "q464_cornish_fisher" -> ((s, dir) => {
      graft.operators.StatTests.cornishFisher(ev(s, dir), "value", 0.95,
          1.6448536269514722)
        .select(col("n"), r6(col("mean")).as("mu"), r6(col("sd")).as("sd"),
          r6(col("skew")).as("skew"), r6(col("ex_kurt")).as("ex_kurt"),
          r6(col("cf_q")).as("cf_q"), r6(col("exact_q")).as("exact_q"))
    }),

    // Wiener spectral flatness per event type: does ANY candidate period
    // dominate the daily series, or is the spectrum noise-flat?
    "q465_spectral_flatness" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Features.spectralFlatness(daily, Seq("event_type"),
          "d", "cnt", Seq(3, 7, 14, 30))
        .select(col("event_type"), col("n_periods"),
          r6(col("flatness")).as("flatness"))
    }),

    // Baxter-King 6..32-day band-pass cycle of the daily count series
    // (literal demeaned weights, interior rows only)
    "q466_baxter_king" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Features.baxterKing(daily, "d", "cnt", 6, 32, 12)
        .select(col("d"), r6(col("cycle")).as("cycle"))
    }),

    // recurrence quantification (eps = 5 counts, integer-exact cut):
    // recurrence rate + order-2 determinism of the daily count series
    "q467_rqa" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.rqa(daily, "d", "cnt", 5L)
        .select(col("n"), col("rec_pairs"), r6(col("rr")).as("rr"),
          r6(col("det2")).as("det2"))
    }),

    // Poincare SD1/SD2 of the hourly mean-value stream: short-term
    // jitter vs long-term level spread in two numbers
    "q468_poincare" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(avg(col("value")).as("m"))
      graft.operators.StatTests.poincareSd(hourly, "h", "m")
        .select(col("n_pairs"), r6(col("sd1")).as("sd1"),
          r6(col("sd2")).as("sd2"), r6(col("sd_ratio")).as("sd_ratio"))
    }),

    // mean Teager-Kaiser energy of daily counts — transient-burst energy
    // that plain variance smears out
    "q469_tkeo" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.tkeo(daily, "d", "cnt")
        .select(col("n_interior"), r6(col("mean_tkeo")).as("mean_tkeo"))
    }),

    // Engle ARCH(1) LM on daily counts: does today's variance predict
    // tomorrow's (volatility clustering)?
    "q470_arch_lm" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.archLm(daily, "d", "cnt")
        .select(col("n_pairs"), r6(col("r2")).as("r2"), r6(col("lm")).as("lm"))
    }),

    // Ferro-Segers extremal index of hourly max-value exceedances over
    // the exact p90: do extremes arrive alone or in clusters?
    "q471_extremal_index" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(max(col("value")).as("mx"))
      graft.operators.StatTests.extremalIndex(hourly, "h", "mx", 0.9)
        .select(col("n_exceed"), r6(col("threshold")).as("threshold"),
          r6(col("theta")).as("theta"))
    }),

    // mean-excess curve at literal thresholds — the graphical GPD
    // threshold diagnostic (linear rise = heavy tail)
    "q472_mean_excess" -> ((s, dir) => {
      graft.operators.StatTests.meanExcess(ev(s, dir), "value",
          Seq(10.0, 20.0, 40.0))
        .select(col("u"), col("n_exceed"),
          r6(col("mean_excess")).as("mean_excess"))
    }),

    // QQ location-scale decomposition click -> purchase: HOW did the
    // value distribution move (scale slope + location intercept)?
    "q473_qq_decomp" -> ((s, dir) => {
      graft.operators.StatTests.qqDecomp(ev(s, dir), "event_type",
          "click", "purchase", "value",
          Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
        .select(col("n_q"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"), r6(col("r2")).as("r2"))
    }),

    // cross-spectrum phase alignment of daily clicks vs purchases at
    // 7/14/30d: in-phase, anti-phase, or lead-lag at each period?
    "q474_cross_spectrum" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.StatTests.crossSpectrum(daily, "d", "x", "y",
          Seq(7, 14, 30))
        .select(col("period"), r6(col("sxx")).as("sxx"),
          r6(col("syy")).as("syy"), r6(col("re_norm")).as("re_norm"),
          r6(col("im_norm")).as("im_norm"))
    }),

    // rho_DCCA of daily clicks vs purchases at box sizes 4/8/16 —
    // co-movement of fluctuations, immune to a shared trend
    "q475_dcca" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.StatTests.dcca(daily, "d", "x", "y", Seq(4, 8, 16))
        .select(col("s"), col("nboxes"), r6(col("rho")).as("rho"))
    }),

    // dispersion entropy (3 quantile classes, pairs) of the hourly mean
    // value — amplitude-aware sibling of permutation entropy
    "q476_dispersion_entropy" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(avg(col("value")).as("m"))
      graft.operators.StatTests.dispersionEntropy(hourly, "h", "m", 3, 2)
        .select(col("t"), col("n_distinct"), r6(col("h_norm")).as("h_norm"))
    }),

    // Goh-Barabasi burstiness B and memory M of purchase inter-event
    // times: Poisson (0,0), cron (-1,.), cascading retries (+,+)
    "q477_burstiness" -> ((s, dir) => {
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
      graft.operators.StatTests.burstiness(pur, "ts")
        .select(col("n_gaps"), r6(col("b")).as("b"), r6(col("mem")).as("mem"))
    }),

    // runs-declustered POT cluster census of hourly max-value spikes
    // (p90 threshold, run gap 3) — the operational view of q471's theta
    "q478_pot_clusters" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(max(col("value")).as("mx"))
      graft.operators.StatTests.potClusters(hourly, "h", "mx", 0.9, 3)
        .select(col("n_exceed"), col("n_clusters"),
          r6(col("mean_size")).as("mean_size"), col("max_size"))
    }),

    // seasonal Mann-Kendall by day-of-week: trend with the weekly cycle
    // removed by construction (pairs never straddle seasons)
    "q479_seasonal_mk" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("sea", dayofweek(col("d")))
      graft.operators.StatTests.seasonalMannKendall(daily, "sea", "d", "cnt")
        .select(col("n"), col("n_seasons"), col("s"), r6(col("z")).as("z"))
    }),

    // Fisher's g over candidate-period powers of the daily series: is
    // the dominant period REAL or flat-spectrum luck? (p-value is
    // approximate for this non-Fourier candidate grid — see
    // StatTests.fisherG scaladoc; exact only at orthogonal k/n periods)
    "q480_fisher_g" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.fisherG(daily, "d", "cnt",
          Seq(3, 4, 5, 7, 14, 30))
        .select(col("n"), r6(col("g_stat")).as("g_stat"),
          r6(col("p_value")).as("p_value"))
    }),

    // zero-inflated Poisson moment fit of per-user purchase counts:
    // are the zeros structural or Poisson luck?
    "q481_zip_fit" -> ((s, dir) => {
      val perUser = ev(s, dir).groupBy(col("user_id"))
        .agg(sum((col("event_type") === "purchase").cast("long")).as("pc"))
      graft.operators.StatTests.zipFit(perUser, "pc")
        .select(col("n"), r6(col("mean")).as("mean_"),
          r6(col("var_")).as("var_"), r6(col("lambda_")).as("lambda_"),
          r6(col("pi_")).as("pi_"))
    }),

    // grey GM(1,1) 3-step forecast of daily counts — the small-sample
    // grey-systems trend model, fully closed form
    "q482_grey_gm11" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Forecast.greyGm11(daily, "d", "cnt", 3)
        .select(col("step"), r6(col("yhat")).as("yhat"))
    }),

    // Syntetos-Boylan ADI/CV2 demand classification of daily purchase
    // counts: which forecaster family (SES/Croston/SBA) fits?
    "q483_adi_cv2" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "purchase").cast("long")).as("pc"))
      graft.operators.StatTests.adiCv2(daily, "d", "pc")
        .select(col("n_buckets"), col("n_demand"), col("adi"), col("cv2"),
          col("label"))
    }),

    // generalized Hurst H(1)/H(2) over a lag ladder: is one scaling law
    // enough, or do big jumps scale differently (multifractality)?
    "q484_ghe" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.generalizedHurst(daily, "d", "cnt",
          Seq(1, 2, 4, 8))
        .select(r6(col("h1")).as("h1"), r6(col("h2")).as("h2"),
          r6(col("mf_gap")).as("mf_gap"))
    }),

    // Mardia circular-linear correlation: does event value depend on
    // time-of-day at all (any phase, both harmonics)?
    "q485_circ_linear" -> ((s, dir) => {
      val staged = ev(s, dir).filter(col("ts").isNotNull)
        .withColumn("hr", hour(col("ts")))
      graft.operators.StatTests.circularLinearCorr(staged, "value", "hr", 24)
        .select(col("n"), r6(col("r_xc")).as("r_xc"),
          r6(col("r_xs")).as("r_xs"), r6(col("r_cs")).as("r_cs"),
          r6(col("r2")).as("r2"))
    }),

    // spectral roll-off of the daily series: the first candidate period
    // (fast->slow) where 85% of candidate power is accumulated
    "q486_rolloff" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.spectralRolloff(daily, "d", "cnt",
          Seq(3, 4, 5, 7, 14, 30), 0.85)
        .select(col("rolloff_period"), col("cum_share"), col("n"))
    }),

    // two-scale Grassberger-Procaccia correlation dimension of daily
    // counts at integer radii 2 and 8 (exact pair counts)
    "q487_corr_dim" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.StatTests.corrDim(daily, "d", "cnt", 2L, 8L)
        .select(col("n_pairs"), col("c1_pairs"), col("c2_pairs"),
          r6(col("d2")).as("d2"))
    }),

    // Shewhart I-MR chart of daily counts: classic 2.66*MRbar limits +
    // out-of-control counts on both charts
    "q488_imr_chart" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Spc.imrChart(daily, "d", "cnt")
        .select(col("n"), r6(col("xbar")).as("xbar"),
          r6(col("mrbar")).as("mrbar"), r6(col("ucl_x")).as("ucl_x"),
          r6(col("lcl_x")).as("lcl_x"), col("ooc_x"), col("ooc_mr"))
    }),

    // EWMA control chart (lambda 0.2, L=3) with exact time-varying
    // limits — catches the small sustained shifts Shewhart misses
    "q489_ewma_chart" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Spc.ewmaChart(daily, "d", "cnt", 0.2, 3.0)
        .select(col("n"), r6(col("xbar")).as("xbar"),
          r6(col("sigma")).as("sigma"), col("ooc"))
    }),

    // process capability of event value against literal specs [0, 60]
    "q490_capability" -> ((s, dir) => {
      graft.operators.Spc.capability(ev(s, dir), "value", 0.0, 60.0)
        .select(col("n"), r6(col("mu")).as("mu"), r6(col("sigma")).as("sigma"),
          r6(col("cp")).as("cp"), r6(col("cpk")).as("cpk"))
    }),

    // Western Electric runs rules over the daily count chart: beyond-3
    // sigma, 9-same-side, 6-trending, 14-alternating trigger counts
    "q491_we_rules" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Spc.westernElectric(daily, "d", "cnt")
        .select(col("n"), col("r1"), col("r2"), col("r3"), col("r4"))
    }),

    // max drawdown + ulcer index of the daily mean-value level series
    "q492_drawdown" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(avg(col("value")).as("m"))
      graft.operators.StatTests.drawdown(daily, "d", "m")
        .select(col("n"), r6(col("peak")).as("peak"),
          r6(col("max_dd")).as("max_dd"),
          r6(col("max_dd_pct")).as("max_dd_pct"), r6(col("ulcer")).as("ulcer"))
    }),

    // Sortino + Omega of day-over-day count changes: downside-only
    // volatility and gain/loss mass ratio
    "q493_sortino_omega" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      val diffs = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("r", col("cnt").cast("double") -
          lag(col("cnt").cast("double"), 1).over(w))
        .filter(col("r").isNotNull)
      graft.operators.StatTests.sortinoOmega(diffs, "r")
        .select(col("n"), r6(col("mean_r")).as("mean_r"),
          r6(col("downside_dev")).as("downside_dev"),
          r6(col("sortino")).as("sortino"), r6(col("omega")).as("omega"))
    }),

    // Erlang C staffing per hour-of-day: P(wait) and mean-wait factor
    // from measured per-minute arrival rates (mu=2/min, 5 agents)
    "q494_erlang_c" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"))
      val byHod = hourly.withColumn("hod", hour(col("h")))
        .groupBy(col("hod"))
        .agg(avg(col("c") / lit(60.0)).as("lam"))
      graft.operators.OpsMath.erlangC(byHod, Seq("hod"), "lam", 2.0, 5)
        .select(col("hod"), r6(col("lambda")).as("lambda"),
          r6(col("offered_a")).as("offered_a"),
          r6(col("erlang_b")).as("erlang_b"),
          r6(col("erlang_c")).as("erlang_c"),
          r6(col("mean_wait")).as("mean_wait"))
    }),

    // newsvendor stocking of daily purchase demand at cu=3/co=1
    // (critical ratio 0.75) with expected shortage/leftover
    "q495_newsvendor" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum((col("event_type") === "purchase").cast("long")).as("pc"))
      graft.operators.OpsMath.newsvendor(daily, "pc", 3.0, 1.0)
        .select(col("n"), col("ratio"), r6(col("q_star")).as("q_star"),
          r6(col("exp_short")).as("exp_short"),
          r6(col("exp_left")).as("exp_left"))
    }),

    // capacity runway: buckets until 1M cumulative events at the
    // last-14-day run rate
    "q496_runway" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.OpsMath.capacityRunway(daily, "d", "cnt", 1e6, 14)
        .select(col("n"), r6(col("level")).as("level"),
          r6(col("run_rate")).as("run_rate"),
          r6(col("runway_buckets")).as("runway_buckets"))
    }),

    // Pickands tail index of purchase values (k=25) — consistent for
    // ALL tail regimes, beside q463's heavy-tail-only Hill
    "q497_pickands" -> ((s, dir) => {
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
      graft.operators.StatTests.pickands(pur, "value", "event_id", 25)
        .select(col("k"), r6(col("x_k")).as("x_k"),
          r6(col("x_2k")).as("x_2k"), r6(col("x_4k")).as("x_4k"),
          r6(col("xi")).as("xi"))
    }),

    // Dekkers-Einmahl-de Haan moment estimator over the same top-100
    // order stats as Hill — the all-regime gamma
    "q498_moment_tail" -> ((s, dir) => {
      val pur = ev(s, dir).filter(col("event_type") === "purchase")
      graft.operators.StatTests.momentTailEstimator(pur, "value",
          "event_id", 100)
        .select(col("n_top"), r6(col("threshold")).as("threshold"),
          r6(col("m1")).as("m1"), r6(col("m2")).as("m2"),
          r6(col("gamma_")).as("gamma_"))
    }),

    // GEV fit of daily maxima by L-moments (literal Lanczos gamma,
    // replayed by the oracle) + 20/100-day return levels
    "q499_gev_lmom" -> ((s, dir) => {
      val daily = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(max(col("value")).as("mx"))
      graft.operators.StatTests.gevLmomFit(daily, "mx", Seq(20, 100))
        .select(col("n"), r6(col("kappa")).as("kappa"),
          r6(col("alpha_")).as("alpha_"), r6(col("mu_")).as("mu_"),
          col("ret_t"), r6(col("ret_level")).as("ret_level"))
    }),

    // negative-binomial moment fit of per-user event counts — the
    // gamma-heterogeneity answer to q481's structural-zeros ZIP
    "q500_negbin_fit" -> ((s, dir) => {
      val perUser = ev(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
      graft.operators.StatTests.negBinFit(perUser, "c")
        .select(col("n"), r6(col("mean_")).as("mean_"),
          r6(col("var_")).as("var_"), r6(col("r_")).as("r_"),
          r6(col("p_")).as("p_"))
    }),

    // James-Stein positive-part shrinkage of per-event-type mean values
    // toward the grand mean (k=5 groups)
    "q501_james_stein" -> ((s, dir) => {
      graft.operators.StatTests.jamesStein(
          ev(s, dir).filter(col("value").isNotNull), "event_type", "value")
        .select(col("group"), col("n_g"), r6(col("raw_mean")).as("raw_mean"),
          r6(col("shrunk")).as("shrunk"))
    }),

    // Tukey one-df non-additivity of the dow x 6h-daypart mean-value
    // table: do the factors interact multiplicatively?
    "q502_tukey_additivity" -> ((s, dir) => {
      val staged = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("dow", dayofweek(col("ts")))
        .withColumn("dp", floor(hour(col("ts")) / lit(6)))
      graft.operators.StatTests.tukeyAdditivity(staged, "dow", "dp", "value")
        .select(col("cells_"), r6(col("ss_res")).as("ss_res"),
          r6(col("ss_nonadd")).as("ss_nonadd"), r6(col("f_stat")).as("f_stat"))
    }),

    // decision stump: which literal value cut most separates purchases
    // from the rest? (quantized-gain argmax, threshold tie-break)
    "q503_decision_stump" -> ((s, dir) => {
      val staged = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("y", (col("event_type") === "purchase").cast("long"))
      graft.operators.StatTests.decisionStump(staged, "value", "y",
          Seq(5.0, 10.0, 20.0, 40.0))
        .select(col("thr"), col("n_left"), col("n_right"),
          r6(col("gini_gain")).as("gini_gain"), col("best"))
    }),

    // Bland-Altman agreement of hourly click vs purchase mean values:
    // bias, limits of agreement, and pairs outside them
    "q504_bland_altman" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(avg(when(col("event_type") === "click", col("value"))).as("a"),
          avg(when(col("event_type") === "purchase", col("value"))).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)
      graft.operators.StatTests.blandAltman(hourly, "a", "b")
        .select(col("n"), r6(col("bias")).as("bias"), r6(col("sd_d")).as("sd_d"),
          r6(col("loa_low")).as("loa_low"), r6(col("loa_high")).as("loa_high"),
          col("n_outside"))
    }),

    // Wilson CIs per arm + Newcombe square-and-add difference CI for
    // P(value > 20 | click) vs P(value > 20 | purchase)
    "q505_newcombe" -> ((s, dir) => {
      val staged = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("s", (col("value") > 20).cast("long"))
      graft.operators.StatTests.newcombeCi(staged, "event_type",
          "click", "purchase", "s")
        .select(col("n1"), r6(col("p1")).as("p1"), r6(col("lo1")).as("lo1"),
          r6(col("hi1")).as("hi1"), col("n2"), r6(col("p2")).as("p2"),
          r6(col("lo2")).as("lo2"), r6(col("hi2")).as("hi2"),
          r6(col("diff")).as("diff"), r6(col("d_lo")).as("d_lo"),
          r6(col("d_hi")).as("d_hi"))
    }),

    // Deming errors-in-both regression of the q504 hourly pairs — the
    // method-comparison line OLS attenuates
    "q506_deming" -> ((s, dir) => {
      val hourly = ev(s, dir).filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(avg(when(col("event_type") === "click", col("value"))).as("a"),
          avg(when(col("event_type") === "purchase", col("value"))).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)
      graft.operators.StatTests.deming(hourly, "a", "b", 1.0)
        .select(col("n"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"))
    }),

    // Heidke + Peirce skill of the persistence forecast for
    // above-median daily volume (yesterday high -> today high?)
    "q507_heidke_peirce" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      val staged = ev(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("med", percentile(col("cnt").cast("double"), lit(0.5))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .withColumn("obs", (col("cnt").cast("double") > col("med"))
          .cast("long"))
        .withColumn("fc", lag(col("obs"), 1).over(w))
        .filter(col("fc").isNotNull)
      graft.operators.StatTests.heidkePeirce(staged, "obs", "fc")
        .select(col("n"), col("hits"), col("false_alarms"), col("misses"),
          col("corr_neg"), r6(col("pss")).as("pss"), r6(col("hss")).as("hss"))
    }),

    // power-mean ladder of positive event values (HM <= GM <= AM <= QM)
    "q508_power_means" -> ((s, dir) => {
      graft.operators.StatTests.powerMeans(ev(s, dir), "value")
        .select(col("n"), r6(col("hm")).as("hm"), r6(col("gm")).as("gm"),
          r6(col("am")).as("am"), r6(col("qm")).as("qm"))
    }),

    // Youden J optimal value cut for predicting purchases (quantized-J
    // argmax over the literal grid) — the deployable operating point
    "q509_youden" -> ((s, dir) => {
      val staged = ev(s, dir).filter(col("value").isNotNull)
        .withColumn("y", (col("event_type") === "purchase").cast("long"))
      graft.operators.StatTests.youdenCut(staged, "y", "value",
          Seq(5.0, 10.0, 20.0, 40.0))
        .select(col("thr"), r6(col("sens")).as("sens"),
          r6(col("spec")).as("spec"), r6(col("j")).as("j"), col("best"))
    }),

    // Hill diversity ladder of per-user activity: effective user counts
    // D1/D2 and Pielou evenness beside raw richness
    "q510_hill_diversity" -> ((s, dir) => {
      graft.operators.StatTests.hillDiversity(ev(s, dir), "user_id")
        .select(col("s_"), r6(col("d1")).as("d1"), r6(col("d2")).as("d2"),
          r6(col("evenness")).as("evenness"))
    }),

    // day-over-day active-user turnover: Jaccard overlap of adjacent
    // daily distinct-user sets (flat DAU can hide 50% replacement)
    "q511_user_turnover" -> ((s, dir) => {
      graft.operators.StatTests.turnover(
          ev(s, dir).withColumn("d", date_trunc("day", col("ts"))),
          "d", "user_id")
        .select(col("dd"), col("n_prev"), col("n_curr"), col("n_common"),
          r6(col("jaccard")).as("jaccard"))
    }),

    // containment with a BINDING document-frequency cap (maxDf=2) — the
    // mode containmentPairs' scaladoc calls MANDATORY at web scale (bounds
    // per-shingle join fan-out at min(df, τ)²), now under oracle exactly
    // as q64 covers the capped Jaccard: containment is over the df≤τ
    // shingle universe on both engines (q214 keeps the uncapped twin)
    "q512_containment_capped" -> ((s, dir) => {
      graft.operators.Dedup.containmentPairs(
          docs(s, dir).filter(col("doc_id") < 60), "text", "doc_id",
          shingleN = 3, minContainment = 0.05, maxDf = Some(2L))
        .select(col("id_a"), col("id_b"), col("inter"), col("n_a"),
          r6(col("containment")).as("containment"))
        .orderBy("id_a", "id_b")
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

    // sum(length(..)) is HUGEINT in DuckDB → pandas float64 repr ("7949.0")
    // breaks the driver's exact hash vs Spark's BIGINT; cast to BIGINT.
    "q06_lang_card" ->
      """SELECT source, count(DISTINCT lang) AS lang_card, count(*) AS cnt,
        |sum(length(text))::BIGINT AS sum_len, round(avg(n_chars),6) AS avg_chars
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
        |WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
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
        |ORDER BY f.fold""".stripMargin,

    // Shared hash contract with graft.functions.Hashing: md5int(s) =
    // ('0x' || substr(md5(s),1,15))::BIGINT == Spark conv(substring(md5(s),1,15),16,10).
    "q31_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM corpus GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "q32_minhash_sig" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh FROM w),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s)
        |SELECT doc_id,
        |  min(('0x' || substr(md5('0:' || g),1,15))::BIGINT) AS mh0,
        |  min(('0x' || substr(md5('1:' || g),1,15))::BIGINT) AS mh1,
        |  min(('0x' || substr(md5('2:' || g),1,15))::BIGINT) AS mh2,
        |  min(('0x' || substr(md5('3:' || g),1,15))::BIGINT) AS mh3
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_lsh_near_dup" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 200),
        |w AS (SELECT id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws FROM corpus),
        |s AS (SELECT id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh FROM w),
        |e AS (SELECT id, unnest(sh) AS g FROM s),
        |m AS (SELECT id,
        |  min(('0x' || substr(md5('0:' || g),1,15))::BIGINT) AS mh0,
        |  min(('0x' || substr(md5('1:' || g),1,15))::BIGINT) AS mh1,
        |  min(('0x' || substr(md5('2:' || g),1,15))::BIGINT) AS mh2,
        |  min(('0x' || substr(md5('3:' || g),1,15))::BIGINT) AS mh3,
        |  min(('0x' || substr(md5('4:' || g),1,15))::BIGINT) AS mh4,
        |  min(('0x' || substr(md5('5:' || g),1,15))::BIGINT) AS mh5,
        |  min(('0x' || substr(md5('6:' || g),1,15))::BIGINT) AS mh6,
        |  min(('0x' || substr(md5('7:' || g),1,15))::BIGINT) AS mh7
        |  FROM e GROUP BY 1),
        |bk AS (
        |  SELECT id, 0 AS band, ('0x' || substr(md5('0:' || mh0::VARCHAR || ',' || mh1::VARCHAR),1,15))::BIGINT AS bucket FROM m
        |  UNION ALL SELECT id, 1, ('0x' || substr(md5('1:' || mh2::VARCHAR || ',' || mh3::VARCHAR),1,15))::BIGINT FROM m
        |  UNION ALL SELECT id, 2, ('0x' || substr(md5('2:' || mh4::VARCHAR || ',' || mh5::VARCHAR),1,15))::BIGINT FROM m
        |  UNION ALL SELECT id, 3, ('0x' || substr(md5('3:' || mh6::VARCHAR || ',' || mh7::VARCHAR),1,15))::BIGINT FROM m),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        |shd AS (SELECT id, list_distinct(sh) AS sh FROM s),
        |j AS (SELECT id_a, id_b,
        |  len(list_intersect(x.sh, y.sh))::DOUBLE AS i2,
        |  (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))::DOUBLE AS u2
        |  FROM cand JOIN shd x ON x.id = cand.id_a JOIN shd y ON y.id = cand.id_b)
        |SELECT id_a, id_b, round(i2/u2, 6) AS jaccard FROM j
        |WHERE u2 > 0 AND i2/u2 >= 0.9 ORDER BY 1, 2""".stripMargin,

    "q34_simhash" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 200),
        |d AS (SELECT doc_id, unnest(list_distinct(ws)) AS word FROM w WHERE len(ws) > 0),
        |h AS (SELECT doc_id, ('0x' || substr(md5(word),1,15))::BIGINT AS hv FROM d),
        |b AS (SELECT doc_id, j,
        |    CASE WHEN sum(((hv >> j) & 1) * 2 - 1) >= 0 THEN (1::BIGINT << j) ELSE 0 END AS bit
        |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) GROUP BY doc_id, j)
        |SELECT doc_id, sum(bit)::BIGINT AS simhash FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 60),
        |s AS (SELECT doc_id, lang, list_distinct(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM w),
        |d AS (SELECT doc_id, lang, sh, len(sh) AS n FROM s WHERE len(sh) > 0),
        |e AS (SELECT doc_id, lang, unnest(sh) AS g FROM d),
        |inter AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i2
        |  FROM e a JOIN e b ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3)
        |SELECT inter.lang, id_a, id_b,
        |  round(i2::DOUBLE / (x.n + y.n - i2), 6) AS jaccard
        |FROM inter
        |JOIN d x ON x.doc_id = id_a AND x.lang = inter.lang
        |JOIN d y ON y.doc_id = id_b AND y.lang = inter.lang
        |ORDER BY 1, 2, 3""".stripMargin,

    "q36_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |sc AS (SELECT query_id, neighbor_id,
        |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
        |    AND sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sc)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // seeded Rademacher hyperplanes: sign(j,d) from md5('h:0:j:d') — the
    // identical derivation as Similarity.rademacherSigns; projections are
    // sequential-order dot products on both engines so boundary signs agree
    "q37_ann_bucketed" ->
      """WITH sl AS (SELECT j, list_transform(generate_series(1, 64),
        |    d -> (CASE WHEN ('0x' || substr(md5('h:0:' || j::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |          THEN 1.0 ELSE -1.0 END)::DOUBLE) AS s
        |  FROM generate_series(0, 7) t(j)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |pb AS (SELECT v.vec_id,
        |    sum(CASE WHEN list_dot_product(v.e, sl.s) >= 0 THEN (1::BIGINT << sl.j) ELSE 0 END)::BIGINT AS bucket
        |  FROM v CROSS JOIN sl GROUP BY 1),
        |qp AS (SELECT vec_id AS query_id,
        |    CASE WHEN g.pr = 0 THEN bucket ELSE xor(bucket, (1::BIGINT << (g.pr - 1))) END AS bucket
        |  FROM pb CROSS JOIN generate_series(0, 8) g(pr) WHERE vec_id < 20),
        |sc AS (SELECT qp.query_id, cb.vec_id AS neighbor_id,
        |    list_dot_product(q.e, c.e) / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
        |  FROM qp JOIN pb cb ON cb.bucket = qp.bucket AND cb.vec_id <> qp.query_id
        |  JOIN v q ON q.vec_id = qp.query_id
        |  JOIN v c ON c.vec_id = cb.vec_id
        |  WHERE sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)) > 0),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sc)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // two independent hyperplane tables (seeds h:0:*, h:1:*): a pair is a
    // candidate if it collides in ANY table, then exact-cosine verified
    "q38_embed_near_dup" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
        |corpus AS (SELECT vec_id, embedding FROM base
        |  UNION ALL SELECT vec_id + 1000000, embedding FROM base),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM corpus),
        |sl AS (SELECT t, j, list_transform(generate_series(1, 64),
        |    d -> (CASE WHEN ('0x' || substr(md5('h:' || t::VARCHAR || ':' || j::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |          THEN 1.0 ELSE -1.0 END)::DOUBLE) AS s
        |  FROM generate_series(0, 1) tt(t) CROSS JOIN generate_series(0, 7) jj(j)),
        |pb AS (SELECT v.vec_id, sl.t,
        |    sum(CASE WHEN list_dot_product(v.e, sl.s) >= 0 THEN (1::BIGINT << sl.j) ELSE 0 END)::BIGINT AS bucket
        |  FROM v CROSS JOIN sl GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM pb a JOIN pb b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b,
        |  round(list_dot_product(x.e, y.e) / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6) AS cos_sim
        |FROM cand JOIN v x ON x.vec_id = id_a JOIN v y ON y.vec_id = id_b
        |WHERE sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e)) > 0
        |  AND list_dot_product(x.e, y.e) / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))) >= 0.999
        |ORDER BY 1, 2""".stripMargin,

    "q39_lang_id" ->
      """WITH tri AS (SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, greatest(len(text)-2, 0)), i -> substr(text, i, 3))) AS trigram
        |  FROM documents),
        |prof AS (SELECT lang, trigram FROM (
        |    SELECT lang, trigram, row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, trigram) AS rk
        |    FROM tri WHERE doc_id % 5 < 4 AND lang IS NOT NULL
        |      AND ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 3 = 0
        |    GROUP BY lang, trigram)
        |  WHERE rk <= 50),
        |test AS (SELECT doc_id, trigram FROM tri WHERE doc_id % 5 = 4),
        |sc AS (SELECT t.doc_id, p.lang, count(*) AS score
        |  FROM test t JOIN prof p ON t.trigram = p.trigram GROUP BY 1, 2),
        |r AS (SELECT doc_id, lang, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk FROM sc)
        |SELECT doc_id, lang AS pred_lang, score FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q40_quality_score" ->
      """WITH w AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    len(text) AS n_chars_q, len(ws) AS n_tokens,
        |    CASE WHEN len(ws) > 0 THEN list_sum(list_transform(ws, t -> len(t)))::DOUBLE / len(ws) END AS mean_token_len,
        |    CASE WHEN len(ws) > 0 THEN len(list_filter(ws, t -> list_contains(['the','a','of','and','in','to','is'], t)))::DOUBLE / len(ws) END AS stopword_ratio,
        |    CASE WHEN len(text) > 0 THEN (len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))::DOUBLE / len(text) END AS punct_ratio,
        |    CASE WHEN len(ws) > 0 THEN len(list_distinct(ws))::DOUBLE / len(ws) END AS type_token_ratio
        |  FROM w)
        |SELECT doc_id, n_tokens,
        |  round(mean_token_len, 6) AS mean_token_len,
        |  round(stopword_ratio, 6) AS stopword_ratio,
        |  round(punct_ratio, 6) AS punct_ratio,
        |  round(type_token_ratio, 6) AS type_token_ratio,
        |  round(type_token_ratio * (1 - coalesce(punct_ratio, 0)) * least(n_tokens / 20.0, 1.0), 6) AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "q41_token_counts" ->
      """WITH w AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents)
        |SELECT doc_id, len(ws) AS ws_tokens,
        |  len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]')) AS regex_tokens,
        |  len(list_distinct(ws)) AS distinct_tokens
        |FROM w ORDER BY doc_id""".stripMargin,

    "q42_fingerprint" ->
      """WITH h AS (SELECT doc_id,
        |    list_sort(list_distinct(list_transform(generate_series(1, greatest(len(text)-7, 0)),
        |      i -> ('0x' || substr(md5(substr(text, i, 8)),1,15))::BIGINT))) AS hs
        |  FROM documents)
        |SELECT doc_id, hs[1] AS fp0, hs[2] AS fp1, hs[3] AS fp2, hs[4] AS fp3
        |FROM h WHERE len(hs) > 0 ORDER BY doc_id""".stripMargin,

    // width/height derive from the payload's first two UTF-8 BYTES (hex of
    // the blob), matching StubDecoder exactly — ascii(substr(..)) would be
    // code points, which only agree on pure-ASCII corpora; try_cast guards
    // texts shorter than 2 bytes identically to the stub's 0 default.
    "q43_media_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS sha_hex,
        |  64 + coalesce(try_cast('0x' || substr(hex(encode(text)), 1, 2) AS INT), 0) % 64 AS stub_width,
        |  64 + coalesce(try_cast('0x' || substr(hex(encode(text)), 3, 2) AS INT), 0) % 64 AS stub_height,
        |  1 + octet_length(encode(text)) % 8 AS stub_n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q44_bfill" ->
      """WITH t AS (SELECT user_id, event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v FROM events)
        |SELECT user_id, event_id,
        |round(first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),6) AS v_bfilled
        |FROM t ORDER BY user_id, event_id""".stripMargin,

    "q45_linear_interp" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT user_id, day, epoch(day)::BIGINT AS t,
        |  CASE WHEN (epoch(day)::BIGINT // 86400) % 4 = 1 THEN NULL ELSE v END AS x FROM d),
        |w AS (SELECT user_id, day, t, x,
        |  last_value(x IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  first_value(x IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  last_value(CASE WHEN x IS NOT NULL THEN t END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |  first_value(CASE WHEN x IS NOT NULL THEN t END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM n)
        |SELECT user_id, t AS day_sec,
        |round(CASE WHEN x IS NOT NULL THEN x
        |  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) * (t - pt) / (nt - pt)
        |  END, 6) AS v_interp
        |FROM w ORDER BY user_id, day_sec""".stripMargin,

    "q46_momentum" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, day, epoch(day)::BIGINT AS te, v,
        |  lag(v, 1) OVER (PARTITION BY user_id ORDER BY day) AS lg FROM d),
        |m AS (SELECT user_id, day, te, lg,
        |  avg(v) OVER (PARTITION BY user_id ORDER BY te
        |    RANGE BETWEEN 604800 PRECEDING AND 86400 PRECEDING) AS rm FROM t)
        |SELECT user_id, te AS day_sec,
        |round(CASE WHEN rm IS NULL OR rm = 0 THEN NULL ELSE lg / rm END, 6) AS momentum7d
        |FROM m ORDER BY user_id, day_sec""".stripMargin,

    "q47_rolling_gated" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, epoch(day)::BIGINT AS te, v FROM d),
        |m AS (SELECT user_id, te,
        |  count(v) OVER w AS n,
        |  stddev_samp(v) OVER w AS sd,
        |  avg(v) OVER w AS mn,
        |  sum(v) OVER w AS sm
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY te
        |    RANGE BETWEEN 604800 PRECEDING AND 86400 PRECEDING))
        |SELECT user_id, te AS day_sec,
        |round(CASE WHEN n >= 5 THEN sd END, 6) AS roll_std,
        |round(CASE WHEN n >= 5 THEN mn END, 6) AS roll_mean,
        |round(CASE WHEN n >= 5 THEN sm END, 6) AS roll_sum
        |FROM m ORDER BY user_id, day_sec""".stripMargin,

    "q48_keyed_update" ->
      """SELECT event_id, user_id,
        |round(CASE WHEN user_id % 3 = 0 THEN value * 2 ELSE value END, 6) AS value_updated
        |FROM events ORDER BY event_id""".stripMargin,

    "q49_pk_check" ->
      """WITH g AS (SELECT user_id, ts, count(*) AS cnt FROM events
        |  GROUP BY 1, 2 HAVING count(*) > 1)
        |SELECT count(*) AS violation_groups,
        |coalesce(sum(cnt), 0)::BIGINT AS violation_rows FROM g""".stripMargin,

    // pandas ewm(span, adjust=True) closed form, lag-1 series; decay = 1-α =
    // (span-1)/(span+1): 0.5 for span 3, 2/3 for span 5 (same CTE as q26)
    "q50_ewma_crossover" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, day, v,
        |  row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
        |s AS (SELECT a.user_id, a.day, a.rn, b.v AS x
        |  FROM r a LEFT JOIN r b ON a.user_id = b.user_id AND b.rn = a.rn - 1),
        |e3 AS (SELECT s1.user_id, s1.day,
        |  sum(power(0.5, s1.rn - s2.rn) * s2.x) / sum(power(0.5, s1.rn - s2.rn)) AS v
        |  FROM s s1 LEFT JOIN s s2 ON s1.user_id = s2.user_id AND s2.rn <= s1.rn AND s2.x IS NOT NULL
        |  GROUP BY 1, 2),
        |e5 AS (SELECT s1.user_id, s1.day,
        |  sum(power(2.0/3.0, s1.rn - s2.rn) * s2.x) / sum(power(2.0/3.0, s1.rn - s2.rn)) AS v
        |  FROM s s1 LEFT JOIN s s2 ON s1.user_id = s2.user_id AND s2.rn <= s1.rn AND s2.x IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT e3.user_id, epoch(e3.day)::BIGINT AS day_sec,
        |round(CASE WHEN e5.v IS NULL OR e5.v = 0 THEN NULL ELSE e3.v / e5.v END, 6) AS cross_3_5
        |FROM e3 JOIN e5 ON e3.user_id = e5.user_id AND e3.day = e5.day
        |ORDER BY 1, 2""".stripMargin,

    "q51_threshold_roll" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, epoch(day)::BIGINT AS te, v FROM d),
        |m AS (SELECT user_id, te,
        |  count(v) OVER w AS n,
        |  avg(CASE WHEN v > 500 THEN 1.0 ELSE 0.0 END) OVER w AS sh
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY te
        |    RANGE BETWEEN 604800 PRECEDING AND 86400 PRECEDING))
        |SELECT user_id, te AS day_sec,
        |round(CASE WHEN n >= 5 THEN sh END, 6) AS thr_share
        |FROM m ORDER BY user_id, day_sec""".stripMargin,

    "q52_rolling_percent" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, day, epoch(day)::BIGINT AS te, v,
        |  lag(v, 1) OVER (PARTITION BY user_id ORDER BY day) AS lg FROM d),
        |m AS (SELECT user_id, te, lg,
        |  sum(v) OVER (PARTITION BY user_id ORDER BY te
        |    RANGE BETWEEN 604800 PRECEDING AND 86400 PRECEDING) AS rs FROM t)
        |SELECT user_id, te AS day_sec,
        |round(CASE WHEN rs IS NULL OR rs = 0 THEN NULL ELSE lg / rs END, 6) AS rollpct7d
        |FROM m ORDER BY user_id, day_sec""".stripMargin,

    "q53_categorical_encode" ->
      """WITH dict AS (SELECT event_type,
        |  row_number() OVER (ORDER BY event_type) - 1 AS code
        |  FROM (SELECT DISTINCT event_type FROM events))
        |SELECT e.event_type, d.code, count(*) AS cnt
        |FROM events e JOIN dict d ON e.event_type = d.event_type
        |GROUP BY 1, 2 ORDER BY code""".stripMargin,

    "q54_row_invariant" ->
      """SELECT count(*) AS n,
        |sum(CASE WHEN len(text) <> n_chars THEN 1 ELSE 0 END)::BIGINT AS violations
        |FROM documents""".stripMargin,

    // fold boundaries replicate CrossVal.timeSeriesSplits for fold 3 of 4:
    // testSize = n//5, trainEnd at rn = n - testSize - 1, testEnd at n - 1
    "q55_leakfree_cv" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |dd AS (SELECT DISTINCT day FROM d),
        |n AS (SELECT count(*) AS c FROM dd),
        |r AS (SELECT day, row_number() OVER (ORDER BY day) - 1 AS rn FROM dd),
        |b AS (SELECT
        |  (SELECT r.day FROM r, n WHERE r.rn = n.c - (n.c // 5) - 1) AS train_end,
        |  (SELECT r.day FROM r, n WHERE r.rn = n.c - 1) AS test_end),
        |f AS (SELECT user_id, day, v FROM d, b WHERE day <= b.test_end),
        |p AS (SELECT avg(v) AS m, stddev_samp(v) AS s FROM f, b WHERE day <= b.train_end),
        |sc AS (SELECT user_id, day, (v - p.m) / (CASE WHEN p.s = 0 THEN 1 ELSE p.s END) AS vs
        |  FROM f, p),
        |mk AS (SELECT user_id, day, vs, CASE WHEN day <= b.train_end THEN vs END AS vmask
        |  FROM sc, b),
        |ft AS (SELECT mk.user_id, mk.day, mk.vs,
        |  lag(vmask, 1) OVER (PARTITION BY user_id ORDER BY day) AS l1,
        |  CASE WHEN mk.day <= b.train_end THEN 'train' ELSE 'test' END AS sample
        |  FROM mk, b)
        |SELECT user_id, epoch(day)::BIGINT AS day_sec, round(vs, 6) AS v_scaled,
        |round(l1, 6) AS v_lag1, sample FROM ft ORDER BY user_id, day_sec""".stripMargin,

    // DuckDB skewness/kurtosis are the pandas sample-adjusted G1/G2 directly
    // (empirically verified); Spark's population g1/g2 carry the adjustment
    // in Features.rollingStats
    "q56_rolling_shape" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, epoch(day)::BIGINT AS te, v::DOUBLE AS v FROM d),
        |m AS (SELECT user_id, te,
        |  count(v) OVER w AS n,
        |  median(v) OVER w AS md,
        |  skewness(v) OVER w AS sk,
        |  kurtosis(v) OVER w AS ku
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY te
        |    RANGE BETWEEN 604800 PRECEDING AND 86400 PRECEDING))
        |SELECT user_id, te AS day_sec,
        |round(CASE WHEN n >= 5 THEN md END, 6) AS roll_median,
        |round(CASE WHEN n >= 5 THEN sk END, 6) AS roll_skew,
        |round(CASE WHEN n >= 5 THEN ku END, 6) AS roll_kurt
        |FROM m ORDER BY user_id, day_sec""".stripMargin,

    "q57_categorical_decode" ->
      """WITH dict AS (SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS code
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |enc AS (SELECT e.event_id, e.event_type AS orig, d.code
        |  FROM events e JOIN dict d ON e.event_type = d.event_type),
        |dec AS (SELECT enc.event_id, enc.orig, enc.code, d2.event_type AS decoded
        |  FROM enc JOIN dict d2 ON enc.code = d2.code)
        |SELECT code, decoded, count(*) AS cnt,
        |sum(CASE WHEN decoded <> orig THEN 1 ELSE 0 END)::BIGINT AS mismatches
        |FROM dec GROUP BY 1, 2 ORDER BY code""".stripMargin,

    "q58_describe_profile" ->
      """SELECT 'value' AS "column", count(value) AS count,
        |round(avg(value), 6) AS mean, round(stddev_samp(value), 6) AS std,
        |round(min(value), 6) AS min, round(quantile_cont(value, 0.25), 6) AS p25,
        |round(quantile_cont(value, 0.5), 6) AS p50, round(quantile_cont(value, 0.75), 6) AS p75,
        |round(max(value), 6) AS max FROM events
        |UNION ALL
        |SELECT 'user_id_d', count(user_id),
        |round(avg(user_id::DOUBLE), 6), round(stddev_samp(user_id::DOUBLE), 6),
        |round(min(user_id::DOUBLE), 6), round(quantile_cont(user_id::DOUBLE, 0.25), 6),
        |round(quantile_cont(user_id::DOUBLE, 0.5), 6), round(quantile_cont(user_id::DOUBLE, 0.75), 6),
        |round(max(user_id::DOUBLE), 6) FROM events
        |ORDER BY "column"""".stripMargin,

    // LOCF-naive forecast: future prediction per user = last history value,
    // scale -> inverse round trip replicated arithmetically
    "q59_future_e2e" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT avg(v) AS m, stddev_samp(v) AS s FROM d),
        |mx AS (SELECT epoch(date_trunc('day', max(day)))::BIGINT AS m FROM d),
        |lastv AS (SELECT user_id, arg_max(v, day) AS lv FROM d GROUP BY 1),
        |g AS (SELECT unnest(generate_series((SELECT m + 86400 FROM mx),
        |  (SELECT m + 3 * 86400 FROM mx), 86400)) AS day_sec)
        |SELECT l.user_id, g.day_sec,
        |round(((l.lv - p.m) / (CASE WHEN p.s = 0 THEN 1 ELSE p.s END))
        |  * (CASE WHEN p.s = 0 THEN 1 ELSE p.s END) + p.m, 6) AS pred
        |FROM lastv l CROSS JOIN g, p ORDER BY 1, 2""".stripMargin,

    "q60_image_decode" ->
      """SELECT doc_id, 'image' AS media_type,
        |(doc_id % 8 + 1)::INT AS width, (doc_id % 5 + 1)::INT AS height
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // centroid pick, assignment argmax and probe lists replicate ivfTopK:
    // centroids = 8 smallest md5(vec_id); cosine NULL (zero norm) sorts last
    // like the Scala -inf; ties break on cid asc on both engines
    "q61_ivf_ann" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM v
        |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id LIMIT 8),
        |asgc AS (SELECT v.vec_id, c.cid,
        |    CASE WHEN sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce)) > 0
        |      THEN list_dot_product(v.e, c.ce) /
        |           (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce))) END AS cs
        |  FROM v CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC NULLS LAST, cid) AS rn FROM asgc)
        |  WHERE rn = 1),
        |qprobe AS (SELECT vec_id AS query_id, cid FROM (SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC NULLS LAST, cid) AS rn
        |    FROM asgc WHERE vec_id < 10)
        |  WHERE rn <= 2),
        |sc AS (SELECT qp.query_id, a.vec_id AS neighbor_id,
        |    list_dot_product(q.e, c.e) / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
        |  FROM qprobe qp JOIN asg a ON a.cid = qp.cid AND a.vec_id <> qp.query_id
        |  JOIN v q ON q.vec_id = qp.query_id
        |  JOIN v c ON c.vec_id = a.vec_id
        |  WHERE sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)) > 0),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sc)
        |SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // quantile_cont straight from raw at 1h grain — the Spark side reaches
    // the same numbers only through 1m Gorilla blocks + k-way block merge
    "q62_block_pctl_promote" ->
      """SELECT user_id, epoch(date_trunc('hour', ts))::BIGINT AS bucket_start,
        |count(*) AS cnt, round(sum(value),6) AS sum_value,
        |round(min(value),6) AS min_value, round(max(value),6) AS max_value,
        |round(quantile_cont(value, 0.5),6) AS p50,
        |round(quantile_cont(value, 0.95),6) AS p95
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q63_hier_rollup" ->
      """WITH r AS (SELECT event_type, user_id::VARCHAR AS user_id_s,
        |  epoch(date_trunc('hour', ts))::BIGINT AS bucket_start, value FROM events)
        |SELECT event_type, user_id_s,
        |CASE WHEN event_type IS NULL THEN 0 WHEN user_id_s IS NULL THEN 1 ELSE 2 END AS grouping_level,
        |bucket_start, count(*) AS cnt, round(sum(value),6) AS sum_value,
        |round(round(sum(value),6)/count(*),6) AS mean_value,
        |round(quantile_cont(value, 0.5),6) AS p50,
        |round(quantile_cont(value, 0.95),6) AS p95,
        |count(DISTINCT event_type) AS type_card
        |FROM r GROUP BY GROUPING SETS ((bucket_start), (event_type, bucket_start),
        |  (event_type, user_id_s, bucket_start))
        |ORDER BY grouping_level, event_type NULLS FIRST, user_id_s NULLS FIRST, bucket_start""".stripMargin,

    // q35's twin with the df≤2 shingle filter applied before the pair join;
    // doc sizes n are recomputed over the KEPT shingles (capped semantics)
    "q64_jaccard_capped" ->
      """WITH w AS (SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 60),
        |s AS (SELECT doc_id, lang, list_distinct(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM w),
        |d AS (SELECT doc_id, lang, sh FROM s WHERE len(sh) > 0),
        |e0 AS (SELECT doc_id, lang, unnest(sh) AS g FROM d),
        |rare AS (SELECT lang, g FROM e0 GROUP BY lang, g HAVING count(*) <= 2),
        |e AS (SELECT e0.doc_id, e0.lang, e0.g FROM e0 JOIN rare USING (lang, g)),
        |n2 AS (SELECT doc_id, lang, count(*) AS n FROM e GROUP BY 1, 2),
        |inter AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i2
        |  FROM e a JOIN e b ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3)
        |SELECT inter.lang, id_a, id_b,
        |  round(i2::DOUBLE / (x.n + y.n - i2), 6) AS jaccard
        |FROM inter
        |JOIN n2 x ON x.doc_id = id_a AND x.lang = inter.lang
        |JOIN n2 y ON y.doc_id = id_b AND y.lang = inter.lang
        |ORDER BY 1, 2, 3""".stripMargin,

    // utf8_char_count counts code points == length() on valid UTF-8;
    // sum() is HUGEINT in DuckDB — cast to match Spark's BIGINT (q06 lesson)
    "q65_sql_surface" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(length(text))::BIGINT AS sum_chars,
        |  max(length(text)) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // duplicate-unit fraction = (occurrences - distinct)/occurrences per
    // word/2-gram/3-gram array (same split + shingle rules as q64's twin)
    "q66_repetition" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, ws,
        |  list_transform(generate_series(1, greatest(len(ws)-1, 0)),
        |    i -> ws[i] || ' ' || ws[i+1]) AS g2,
        |  list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3 FROM w)
        |SELECT doc_id,
        |  CASE WHEN len(ws) > 0 THEN round((len(ws) - len(list_distinct(ws)))::DOUBLE / len(ws), 6) END AS rep_word,
        |  CASE WHEN len(g2) > 0 THEN round((len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2), 6) END AS rep_2gram,
        |  CASE WHEN len(g3) > 0 THEN round((len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3), 6) END AS rep_3gram
        |FROM g ORDER BY doc_id""".stripMargin,

    // same deterministic augmentation, then RE2 'g'-flag replace — the
    // patterns avoid lookaround so Java and RE2 agree byte-for-byte
    "q67_redact" ->
      """WITH aug AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.' || ((doc_id*7) % 256) ELSE '' END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text2, '\b\d{1,3}(\.\d{1,3}){3}\b'))::BIGINT AS n_ips,
        |  regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS redacted
        |FROM aug ORDER BY doc_id""".stripMargin,

    // q40's quality + q66's rep_3gram composed into the gate cascade; CASE
    // null-semantics match Spark `when` (a null comparison skips the branch)
    "q68_corpus_filter" ->
      """WITH w AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |f AS (SELECT doc_id, len(ws) AS n_tokens,
        |    CASE WHEN len(text) > 0 THEN (len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))::DOUBLE / len(text) END AS punct_ratio,
        |    CASE WHEN len(ws) > 0 THEN len(list_distinct(ws))::DOUBLE / len(ws) END AS ttr,
        |    list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        |  FROM w),
        |s AS (SELECT doc_id, n_tokens,
        |    ttr * (1 - coalesce(punct_ratio, 0)) * least(n_tokens / 20.0, 1.0) AS quality_score,
        |    CASE WHEN len(g3) > 0 THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3) END AS rep_3gram
        |  FROM f),
        |d AS (SELECT doc_id, n_tokens, quality_score, rep_3gram,
        |    CASE WHEN n_tokens < 25 THEN 'too_short'
        |         WHEN n_tokens > 90 THEN 'too_long'
        |         WHEN quality_score < 0.4 THEN 'low_quality'
        |         WHEN rep_3gram > 0.2 THEN 'repetitive' END AS drop_reason
        |  FROM s)
        |SELECT doc_id, n_tokens, round(quality_score, 6) AS quality_score,
        |  round(rep_3gram, 6) AS rep_3gram, drop_reason,
        |  drop_reason IS NULL AS keep
        |FROM d ORDER BY doc_id""".stripMargin,

    "q69_incremental_dedup" ->
      """WITH history AS (SELECT text FROM documents WHERE doc_id >= 100),
        |batch AS (SELECT doc_id,
        |    CASE WHEN doc_id < 100 THEN text || ' NOVEL' ELSE text END AS text
        |  FROM documents WHERE doc_id < 200)
        |SELECT b.doc_id, md5(b.text) AS content_md5 FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM history h WHERE md5(h.text) = md5(b.text))
        |ORDER BY doc_id""".stripMargin,

    "q70_sessionize" ->
      """WITH f AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS nf
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |    sum(nf) OVER (PARTITION BY user_id ORDER BY ts
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx::BIGINT AS session_idx,
        |  floor(epoch(min(ts)))::BIGINT AS start_s, floor(epoch(max(ts)))::BIGINT AS end_s,
        |  floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT AS duration_sec,
        |  count(*) AS n_events, round(sum(value),6) AS sum_value
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q71_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1,2)
        |SELECT c.event_id, c.user_id, floor(epoch(c.ts))::BIGINT AS ts_s,
        |  floor(epoch(p.ts))::BIGINT AS matched_s, round(p.purchase_value,6) AS purchase_value
        |FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q72_stratified_sample" ->
      """SELECT lang, doc_id, sample_rank FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS sample_rank
        |  FROM documents) t
        |WHERE sample_rank <= 5 ORDER BY lang, sample_rank""".stripMargin,

    "q73_snaive_forecast" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    v - lag(v,7) OVER (PARTITION BY user_id ORDER BY d) AS resid FROM daily),
        |pk AS (SELECT user_id, max(d) AS last_d,
        |    coalesce(stddev_samp(resid), 0.0) AS sigma FROM r GROUP BY 1),
        |f AS (SELECT user_id, sigma, g.s AS step,
        |    epoch(last_d)::BIGINT + g.s*86400 AS forecast_s,
        |    ceil(g.s/7.0)::BIGINT AS k,
        |    epoch(last_d)::BIGINT + (g.s - 7*ceil(g.s/7.0))::BIGINT*86400 AS src_s
        |  FROM pk, generate_series(1,7) g(s))
        |SELECT f.user_id, forecast_s, step, round(d2.v,6) AS yhat,
        |  round(d2.v - 1.96*sigma*sqrt(k),6) AS lo,
        |  round(d2.v + 1.96*sigma*sqrt(k),6) AS hi
        |FROM f LEFT JOIN daily d2
        |  ON f.user_id = d2.user_id AND epoch(d2.d)::BIGINT = f.src_s
        |ORDER BY 1,3""".stripMargin,

    "q74_drift_forecast" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |pk AS (SELECT user_id, min_by(v, d) AS y1, max_by(v, d) AS yT,
        |    max(d) AS last_d, count(*) AS n FROM daily GROUP BY 1)
        |SELECT user_id, epoch(last_d)::BIGINT + g.s*86400 AS forecast_s, g.s AS step,
        |  round(CASE WHEN n > 1 THEN yT + g.s*(yT - y1)/(n - 1) ELSE yT END, 6) AS yhat
        |FROM pk, generate_series(1,5) g(s)
        |ORDER BY 1,3""".stripMargin,

    "q75_qcut" ->
      """SELECT event_type, event_id,
        |  ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
        |FROM events ORDER BY event_type, event_id""".stripMargin,

    // HLL replayed from first principles: 64-bit hash = first 16 md5 hex
    // chars; idx = top 12 bits; rank = leading zeros of the remaining 52
    // bits + 1 (exact integer CASE chain, no float log2); registers = max
    // rank per idx; linear-counting small-range correction — bit-for-bit
    // the algorithm in graft.functions.Hll.
    "q76_hll_langcard" ->
      s"""WITH items AS (SELECT DISTINCT source, lang FROM documents WHERE lang IS NOT NULL),
        |h AS (SELECT source, ('0x' || substr(md5(lang),1,16))::UBIGINT AS u FROM items),
        |b AS (SELECT source, (u // 4503599627370496)::BIGINT AS idx,
        |    (u % 4503599627370496)::BIGINT AS r FROM h),
        |regs AS (SELECT source, idx,
        |    max(CASE WHEN r = 0 THEN 53 ELSE 53 - (CASE $hllBitlenCase END) END) AS reg
        |  FROM b GROUP BY 1,2),
        |agg AS (SELECT source, sum(power(2.0, -reg)) AS sum_present,
        |    count(*) AS n_present FROM regs GROUP BY 1),
        |est AS (SELECT source, (4096 - n_present) AS zeros,
        |    (0.7213/(1.0+1.079/4096)) * 4096.0 * 4096.0
        |      / (sum_present + (4096 - n_present)) AS e FROM agg),
        |fin AS (SELECT source,
        |    CASE WHEN e <= 2.5*4096 AND zeros > 0
        |         THEN 4096.0 * ln(4096.0/zeros) ELSE e END AS hll FROM est),
        |ex AS (SELECT source, count(DISTINCT lang) AS n_langs_exact
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1)
        |SELECT ex.source, n_langs_exact, round(fin.hll, 6) AS hll_est
        |FROM ex JOIN fin USING(source) ORDER BY source""".stripMargin,

    // q33's LSH pair chain verbatim, then transitive closure by a recursive
    // CTE (UNION-distinct terminates) — min reachable id per node = component
    "q77_dedup_clusters" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 200),
        |w AS (SELECT id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws FROM corpus),
        |s AS (SELECT id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh FROM w),
        |e AS (SELECT id, unnest(sh) AS g FROM s),
        |m AS (SELECT id,
        |  min(('0x' || substr(md5('0:' || g),1,15))::BIGINT) AS mh0,
        |  min(('0x' || substr(md5('1:' || g),1,15))::BIGINT) AS mh1,
        |  min(('0x' || substr(md5('2:' || g),1,15))::BIGINT) AS mh2,
        |  min(('0x' || substr(md5('3:' || g),1,15))::BIGINT) AS mh3,
        |  min(('0x' || substr(md5('4:' || g),1,15))::BIGINT) AS mh4,
        |  min(('0x' || substr(md5('5:' || g),1,15))::BIGINT) AS mh5,
        |  min(('0x' || substr(md5('6:' || g),1,15))::BIGINT) AS mh6,
        |  min(('0x' || substr(md5('7:' || g),1,15))::BIGINT) AS mh7
        |  FROM e GROUP BY 1),
        |bk AS (
        |  SELECT id, 0 AS band, ('0x' || substr(md5('0:' || mh0::VARCHAR || ',' || mh1::VARCHAR),1,15))::BIGINT AS bucket FROM m
        |  UNION ALL SELECT id, 1, ('0x' || substr(md5('1:' || mh2::VARCHAR || ',' || mh3::VARCHAR),1,15))::BIGINT FROM m
        |  UNION ALL SELECT id, 2, ('0x' || substr(md5('2:' || mh4::VARCHAR || ',' || mh5::VARCHAR),1,15))::BIGINT FROM m
        |  UNION ALL SELECT id, 3, ('0x' || substr(md5('3:' || mh6::VARCHAR || ',' || mh7::VARCHAR),1,15))::BIGINT FROM m),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        |shd AS (SELECT id, list_distinct(sh) AS sh FROM s),
        |j AS (SELECT id_a, id_b,
        |  len(list_intersect(x.sh, y.sh))::DOUBLE AS i2,
        |  (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))::DOUBLE AS u2
        |  FROM cand JOIN shd x ON x.id = cand.id_a JOIN shd y ON y.id = cand.id_b),
        |pairs AS (SELECT id_a, id_b FROM j WHERE u2 > 0 AND i2/u2 >= 0.9),
        |und AS (SELECT id_a AS s2, id_b AS d2 FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT s2 AS id FROM und),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION SELECT u.s2, reach.r FROM und u JOIN reach ON u.d2 = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
        |sz AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1)
        |SELECT c.id, c.component, sz.cluster_size, c.id = c.component AS is_canonical
        |FROM comp c JOIN sz USING(component) ORDER BY c.id""".stripMargin,

    "q78_acf" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |l AS (SELECT user_id, v,
        |    lag(v,1) OVER w AS l1, lag(v,2) OVER w AS l2, lag(v,7) OVER w AS l7
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, corr(v, l1) AS a1, corr(v, l2) AS a2, corr(v, l7) AS a7
        |  FROM l GROUP BY 1)
        |SELECT user_id, lag, round(acf, 6) AS acf FROM (
        |  SELECT user_id, 1::BIGINT AS lag, a1 AS acf FROM a
        |  UNION ALL SELECT user_id, 2::BIGINT, a2 FROM a
        |  UNION ALL SELECT user_id, 7::BIGINT, a7 FROM a)
        |ORDER BY user_id, lag""".stripMargin,

    // SES closed form replayed: weight = (1−α)^(T−t) for t=1, α(1−α)^(T−t) else
    "q79_ses_forecast" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) - 1 AS back
        |  FROM daily),
        |lvl AS (SELECT user_id,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back) * v
        |             ELSE 0.3 * power(0.7, back) * v END) AS level,
        |    max(d) AS last_d FROM r GROUP BY 1)
        |SELECT user_id, epoch(last_d)::BIGINT + g.s*86400 AS forecast_s, g.s AS step,
        |  round(level, 6) AS yhat
        |FROM lvl, generate_series(1,5) g(s) ORDER BY 1,3""".stripMargin,

    // CMS replayed from first principles: bucket_i(x) = md5-60bit("i:x") mod
    // 1024 (the engine-wide hash convention), row counters = summed bucket
    // counts, estimate = min over the 4 rows — byte-for-byte the algorithm
    // in graft.functions.Cms.
    "q80_cms_heavy" ->
      """WITH it AS (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> '')) AS word FROM documents),
        |cnt AS (SELECT word, count(*) AS exact_cnt FROM it GROUP BY 1),
        |rws AS (SELECT unnest(generate_series(0, 3)) AS i),
        |buck AS (SELECT i,
        |    ('0x' || substr(md5(i::VARCHAR || ':' || word), 1, 15))::BIGINT % 1024 AS b,
        |    sum(exact_cnt) AS c
        |  FROM cnt CROSS JOIN rws GROUP BY 1, 2),
        |top AS (SELECT word, exact_cnt FROM cnt ORDER BY exact_cnt DESC, word LIMIT 10),
        |qb AS (SELECT t.word, t.exact_cnt, r.i,
        |    ('0x' || substr(md5(r.i::VARCHAR || ':' || t.word), 1, 15))::BIGINT % 1024 AS b
        |  FROM top t CROSS JOIN rws r)
        |SELECT qb.word, qb.exact_cnt, min(buck.c)::BIGINT AS cms_est
        |FROM qb JOIN buck USING (i, b) GROUP BY 1, 2
        |ORDER BY exact_cnt DESC, word""".stripMargin,

    "q81_decontaminate" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM w),
        |bs AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id < 20),
        |ds AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id >= 20 AND doc_id < 220),
        |ov AS (SELECT ds.doc_id, count(*) AS n_overlap FROM ds JOIN bs USING (g) GROUP BY 1),
        |tot AS (SELECT doc_id, len(sh)::BIGINT AS n_shingles FROM s
        |  WHERE doc_id >= 20 AND doc_id < 220)
        |SELECT t.doc_id, t.n_shingles, coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
        |  round(CASE WHEN t.n_shingles > 0
        |    THEN coalesce(o.n_overlap, 0) / t.n_shingles::DOUBLE END, 6) AS contamination
        |FROM tot t LEFT JOIN ov o USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    "q82_mase" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rd FROM daily),
        |train AS (SELECT user_id, d, v FROM r WHERE rd > 5),
        |test AS (SELECT user_id, d, v FROM r WHERE rd <= 5),
        |p AS (SELECT user_id, avg(v) AS pred FROM train GROUP BY 1),
        |den AS (SELECT user_id, avg(abs(v - lv)) AS dnm FROM (
        |    SELECT user_id, v, lag(v) OVER (PARTITION BY user_id ORDER BY d) AS lv
        |    FROM train) WHERE lv IS NOT NULL GROUP BY 1),
        |num AS (SELECT t.user_id, avg(abs(t.v - p.pred)) AS nmr, count(*) AS n
        |  FROM test t JOIN p USING (user_id) GROUP BY 1)
        |SELECT user_id, round(CASE WHEN dnm > 0 THEN nmr/dnm END, 6) AS mase, n
        |FROM num JOIN den USING (user_id) ORDER BY user_id""".stripMargin,

    // Croston replayed: SES closed form over the non-zero subsequence for
    // both demand sizes and inter-demand intervals (first interval = 1-based
    // position of the first demand)
    "q83_croston" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |g AS (SELECT user_id, d,
        |    CASE WHEN (epoch(d)::BIGINT // 86400) % 3 = 0 THEN v ELSE 0.0 END AS v
        |  FROM daily),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS idx,
        |    max(d) OVER (PARTITION BY user_id) AS last_d FROM g),
        |nz AS (SELECT user_id, last_d, idx, v,
        |    coalesce(idx - lag(idx) OVER w, idx) AS q,
        |    row_number() OVER w AS rn,
        |    row_number() OVER (PARTITION BY user_id ORDER BY idx DESC) - 1 AS back
        |  FROM r WHERE v <> 0 WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
        |lvl AS (SELECT user_id, max(last_d) AS last_d,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back)*v ELSE 0.3*power(0.7, back)*v END) AS z,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back)*q ELSE 0.3*power(0.7, back)*q END) AS p
        |  FROM nz GROUP BY 1)
        |SELECT user_id, epoch(last_d)::BIGINT + g2.s*86400 AS forecast_s, g2.s AS step,
        |  round(z/p, 6) AS yhat
        |FROM lvl, generate_series(1,3) g2(s) ORDER BY 1,3""".stripMargin,

    // Theta replayed: identical formula shapes (OLS from the five sums, SES
    // closed form on the theta-2 line) so float op order matches the engine
    "q84_theta" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d)::DOUBLE AS t,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) - 1 AS back
        |  FROM daily),
        |o AS (SELECT user_id, d, y, t, back,
        |    (count(*) OVER w)::DOUBLE AS n,
        |    sum(t) OVER w AS st, sum(y) OVER w AS sy,
        |    sum(t*y) OVER w AS sty, sum(t*t) OVER w AS stt
        |  FROM r WINDOW w AS (PARTITION BY user_id)),
        |ab AS (SELECT *,
        |    CASE WHEN n*stt - st*st <> 0
        |      THEN (n*sty - st*sy) / (n*stt - st*st) ELSE 0.0 END AS b
        |  FROM o),
        |ab2 AS (SELECT *, (sy - b*st) / n AS a FROM ab),
        |z AS (SELECT *, 2.0*y - (a + b*t) AS zt,
        |    CASE WHEN t = 1.0 THEN power(0.7, back) ELSE 0.3*power(0.7, back) END AS w
        |  FROM ab2),
        |lvl AS (SELECT user_id, sum(w*zt) AS l, max(d) AS last_d,
        |    max(n) AS bigT, max(a) AS a, max(b) AS b
        |  FROM z GROUP BY 1)
        |SELECT user_id, epoch(last_d)::BIGINT + g.s*86400 AS forecast_s, g.s AS step,
        |  round(((a + b*(bigT + g.s)) + l) / 2.0, 6) AS yhat
        |FROM lvl, generate_series(1,4) g(s) ORDER BY 1,3""".stripMargin,

    // Holt replayed with a recursive CTE: l/b recursion in the exact same
    // float op order as the engine's fold (l' reused textually inside b')
    "q85_holt" ->
      """WITH RECURSIVE daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn FROM daily),
        |n AS (SELECT user_id, max(rn) AS bigT, max(d) AS last_d FROM r GROUP BY 1),
        |rec AS (
        |  SELECT r1.user_id, 1 AS rn, r1.y AS l, r2.y - r1.y AS b
        |  FROM r r1 JOIN r r2 ON r2.user_id = r1.user_id AND r2.rn = 2
        |  WHERE r1.rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |    0.3*s.y + 0.7*(rec.l + rec.b) AS l,
        |    0.2*((0.3*s.y + 0.7*(rec.l + rec.b)) - rec.l) + 0.8*rec.b AS b
        |  FROM rec JOIN r s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1),
        |fin AS (SELECT rec.user_id, rec.l, rec.b
        |  FROM rec JOIN n ON n.user_id = rec.user_id AND rec.rn = n.bigT)
        |SELECT f.user_id, epoch(n.last_d)::BIGINT + g.s*86400 AS forecast_s, g.s AS step,
        |  round(f.l + g.s*f.b, 6) AS yhat
        |FROM fin f JOIN n USING (user_id), generate_series(1,3) g(s)
        |ORDER BY 1,3""".stripMargin,

    // median == quantile_cont(0.5), the interpolating definition both
    // engines share (parity pinned by q56)
    "q86_mad_outliers" ->
      """WITH m AS (SELECT user_id, median(value) AS med FROM events GROUP BY 1),
        |j AS (SELECT e.user_id, e.event_id, e.value, m.med
        |  FROM events e JOIN m USING (user_id)),
        |m2 AS (SELECT user_id, median(abs(value - med)) AS mad FROM j GROUP BY 1)
        |SELECT j.user_id, j.event_id, round(j.med, 6) AS med,
        |  round(m2.mad, 6) AS mad,
        |  round(CASE WHEN m2.mad > 0
        |    THEN 0.6745 * (j.value - j.med) / m2.mad END, 6) AS robust_z,
        |  coalesce(CASE WHEN m2.mad > 0
        |    THEN abs(0.6745 * (j.value - j.med) / m2.mad) > 3.5 END, false) AS is_outlier
        |FROM j JOIN m2 USING (user_id) ORDER BY j.user_id, j.event_id""".stripMargin,

    "q87_changepoint" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |s AS (SELECT user_id, d,
        |    count(v) OVER l AS cl, count(v) OVER r AS cr,
        |    avg(v) OVER l AS ml, avg(v) OVER r AS mr,
        |    var_samp(v) OVER l / 5 + var_samp(v) OVER r / 5 AS pooled
        |  FROM daily
        |  WINDOW l AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
        |         r AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING))
        |SELECT user_id, floor(epoch(d))::BIGINT AS d_s,
        |  round(CASE WHEN cl = 5 AND cr = 5 THEN ml END, 6) AS mean_l,
        |  round(CASE WHEN cl = 5 AND cr = 5 THEN mr END, 6) AS mean_r,
        |  round(CASE WHEN cl = 5 AND cr = 5 AND pooled > 0
        |    THEN abs(mr - ml) / sqrt(pooled) END, 6) AS shift_score
        |FROM s ORDER BY user_id, d_s""".stripMargin,

    // same float op order as the engine: ((2π · t) · j) / period
    "q88_fourier" ->
      """WITH t AS (SELECT event_id,
        |    floor(floor(epoch(ts)) / 86400)::DOUBLE AS d FROM events)
        |SELECT event_id,
        |  round(sin(2*pi() * d * 1 / 7), 6) AS fourier_sin_1,
        |  round(cos(2*pi() * d * 1 / 7), 6) AS fourier_cos_1,
        |  round(sin(2*pi() * d * 2 / 7), 6) AS fourier_sin_2,
        |  round(cos(2*pi() * d * 2 / 7), 6) AS fourier_cos_2
        |FROM t ORDER BY event_id""".stripMargin,

    "q89_boxcox" ->
      """SELECT event_id,
        |  round(CASE WHEN value > 0 THEN (pow(value, 0.5) - 1.0) / 0.5 END, 6) AS bc,
        |  round(CASE WHEN value > 0
        |    THEN pow(((pow(value, 0.5) - 1.0) / 0.5) * 0.5 + 1.0, 1.0 / 0.5) END, 6) AS back
        |FROM events ORDER BY event_id""".stripMargin,

    "q90_winsorize" ->
      """WITH b AS (SELECT user_id,
        |    quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.user_id, e.event_id,
        |  round(least(greatest(e.value, b.lo), b.hi), 6) AS value_wins
        |FROM events e JOIN b USING (user_id) ORDER BY e.user_id, e.event_id""".stripMargin,

    // canonicalization replayed regex-for-regex on identically-built urls
    "q91_url_canon" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1 THEN 'https'
        |        ELSE 'HTTP' END)
        |  || '://W' || (doc_id % 50) || '.Example.COM'
        |  || (CASE WHEN doc_id % 4 = 0 THEN ':443' WHEN doc_id % 4 = 1 THEN ':8080'
        |           ELSE '' END)
        |  || (CASE WHEN doc_id % 5 = 0 THEN '' ELSE '/p/' || doc_id END)
        |  || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&' ELSE '' END)
        |  || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |q AS (SELECT *, regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        |  lower(regexp_replace(auth, ':[0-9]+$', '')) AS hostp,
        |  coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
        |    x -> x <> '')), '&'), '') AS sq
        |  FROM p)
        |SELECT doc_id, url,
        |  CASE WHEN scheme = '' THEN NULL ELSE
        |    scheme || '://' || hostp
        |    || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |             OR (scheme = 'https' AND port = '443') THEN ''
        |        ELSE ':' || port END)
        |    || (CASE WHEN path = '' THEN '/' ELSE path END)
        |    || (CASE WHEN sq = '' THEN '' ELSE '?' || sq END)
        |  END AS canon
        |FROM q ORDER BY doc_id""".stripMargin,

    "q92_chunk_dedup" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 300),
        |c AS (SELECT doc_id, t.g AS pos,
        |    array_to_string(ws[(t.g*8+1):(t.g*8+8)], ' ') AS chunk
        |  FROM w, unnest(generate_series(0, (len(ws)+7)//8 - 1)) AS t(g)),
        |k AS (SELECT doc_id, pos, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) = 1 AS keep
        |  FROM c),
        |agg AS (SELECT doc_id, count(*) AS n_chunks,
        |    count(*) FILTER (keep) AS n_kept,
        |    coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (keep), '') AS kept_text
        |  FROM k GROUP BY 1)
        |SELECT w.doc_id, coalesce(a.n_chunks, 0)::BIGINT AS n_chunks,
        |  coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |  md5(coalesce(a.kept_text, '')) AS kept_md5
        |FROM w LEFT JOIN agg a USING (doc_id) ORDER BY w.doc_id""".stripMargin,

    "q93_seasonal_decomp" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) / 100.0 AS v
        |  FROM events GROUP BY 1,2),
        |i AS (SELECT user_id, d, v::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1) % 7 AS pos,
        |    CASE WHEN count(v) OVER f = 7 THEN avg(v) OVER f END AS trend
        |  FROM daily
        |  WINDOW f AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d2 AS (SELECT *, y - trend AS det FROM i),
        |sr AS (SELECT user_id, pos, avg(det) AS s_raw FROM d2 GROUP BY 1,2),
        |c AS (SELECT user_id, avg(s_raw) AS ctr FROM sr GROUP BY 1)
        |SELECT d2.user_id, floor(epoch(d))::BIGINT AS d_s,
        |  round(trend, 6) AS trend,
        |  round(s_raw - ctr, 6) AS seasonal,
        |  round(y - trend - (s_raw - ctr), 6) AS remainder
        |FROM d2 JOIN sr USING (user_id, pos) JOIN c USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // same moment-sum expression shape as the engine (not DuckDB's corr,
    // whose co-moment algorithm differs in float op order)
    "q94_rolling_corr" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(value) AS v, count(*)::DOUBLE AS c
        |  FROM events GROUP BY 1,2),
        |s AS (SELECT user_id, d, count(v) OVER f AS cnt,
        |    7.0*sum(v*c) OVER f - sum(v) OVER f * sum(c) OVER f AS num,
        |    7.0*sum(v*v) OVER f - sum(v) OVER f * sum(v) OVER f AS denx,
        |    7.0*sum(c*c) OVER f - sum(c) OVER f * sum(c) OVER f AS deny
        |  FROM daily
        |  WINDOW f AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, floor(epoch(d))::BIGINT AS d_s,
        |  round(CASE WHEN cnt = 7 AND denx > 0 AND deny > 0
        |    THEN num / sqrt(denx * deny) END, 6) AS rolling_corr
        |FROM s ORDER BY 1, 2""".stripMargin,

    "q95_pivot" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 6) AS view,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 6) AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q96_melt" ->
      """SELECT event_id, 'v_raw' AS measure, round(value, 6) AS val
        |FROM events WHERE event_id < 1000
        |UNION ALL
        |SELECT event_id, 'v_double' AS measure, round(value * 2.0, 6) AS val
        |FROM events WHERE event_id < 1000
        |ORDER BY event_id, measure""".stripMargin,

    "q97_topk_group" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rnk
        |  FROM events)
        |SELECT user_id, rnk, event_id, round(value, 6) AS value
        |FROM r WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,

    "q98_expectations" ->
      """WITH rowchecks AS (
        |  SELECT 'not_null' AS "check", 'user_id' AS target,
        |    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS violations,
        |    count(*)::BIGINT AS total FROM events
        |  UNION ALL
        |  SELECT 'not_null', 'ts',
        |    sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT, count(*)::BIGINT
        |  FROM events
        |  UNION ALL
        |  SELECT 'not_null', 'value',
        |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT, count(*)::BIGINT
        |  FROM events
        |  UNION ALL
        |  SELECT 'range[0.0,400.0]', 'value',
        |    sum(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 400.0)
        |      THEN 1 ELSE 0 END)::BIGINT, count(*)::BIGINT FROM events
        |  UNION ALL
        |  SELECT 'accepted{click,view,purchase}', 'event_type',
        |    sum(CASE WHEN event_type IS NOT NULL
        |      AND event_type NOT IN ('click','view','purchase')
        |      THEN 1 ELSE 0 END)::BIGINT, count(*)::BIGINT FROM events
        |  UNION ALL
        |  SELECT 'unique', 'event_id',
        |    coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0)::BIGINT,
        |    coalesce(sum(n), 0)::BIGINT
        |  FROM (SELECT event_id, count(*) AS n FROM events GROUP BY 1))
        |SELECT "check", target, violations, total, violations = 0 AS pass
        |FROM rowchecks ORDER BY "check", target""".stripMargin,

    // Holt-Winters additive replayed with a recursive CTE: the 7-slot
    // seasonal ring buffer rides along as a DuckDB LIST, updated by
    // slice-concat in the exact float op order of the engine's fold
    // (l' reused textually inside b'; s' uses the PRE-update l and b)
    "q99_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn FROM daily),
        |n AS (SELECT user_id, max(rn) AS bigT, max(d) AS last_d FROM r GROUP BY 1
        |  HAVING max(rn) >= 14),
        |agg AS (
        |  SELECT user_id,
        |    sum(CASE WHEN rn <= 7 THEN y END) / 7.0 AS l0,
        |    (sum(CASE WHEN rn BETWEEN 8 AND 14 THEN y END)
        |     - sum(CASE WHEN rn <= 7 THEN y END)) / 49.0 AS b0,
        |    list(y ORDER BY rn) FILTER (WHERE rn <= 7) AS first7
        |  FROM r GROUP BY 1),
        |init AS (
        |  SELECT a.user_id, 7 AS rn, l0 AS l, b0 AS b,
        |    list_transform(first7, x -> x - l0) AS s
        |  FROM agg a JOIN n USING (user_id)),
        |rec AS (
        |  SELECT * FROM init
        |  UNION ALL
        |  SELECT rec.user_id, rec.rn + 1,
        |    0.3*(sr.y - rec.s[(rec.rn % 7) + 1]) + 0.7*(rec.l + rec.b) AS l,
        |    0.1*((0.3*(sr.y - rec.s[(rec.rn % 7) + 1]) + 0.7*(rec.l + rec.b)) - rec.l)
        |      + 0.9*rec.b AS b,
        |    rec.s[1:(rec.rn % 7)]
        |      || [0.2*(sr.y - rec.l - rec.b) + 0.8*rec.s[(rec.rn % 7) + 1]]
        |      || rec.s[(rec.rn % 7) + 2:7] AS s
        |  FROM rec JOIN r sr ON sr.user_id = rec.user_id AND sr.rn = rec.rn + 1),
        |fin AS (SELECT rec.user_id, rec.l, rec.b, rec.s
        |  FROM rec JOIN n ON n.user_id = rec.user_id AND rec.rn = n.bigT)
        |SELECT f.user_id, epoch(n.last_d)::BIGINT + g.s*86400 AS forecast_s, g.s AS step,
        |  round(f.l + g.s*f.b + f.s[((n.bigT - 1 + g.s) % 7) + 1], 6) AS yhat
        |FROM fin f JOIN n USING (user_id), generate_series(1,7) g(s)
        |ORDER BY 1,3""".stripMargin,

    "q100_rolling_quantile" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, epoch(day)::BIGINT AS te, v::DOUBLE AS v FROM d),
        |m AS (SELECT user_id, te,
        |  count(v) OVER w AS n,
        |  quantile_cont(v, 0.25) OVER w AS q25,
        |  quantile_cont(v, 0.75) OVER w AS q75
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY te
        |    RANGE BETWEEN 604800 PRECEDING AND 86400 PRECEDING))
        |SELECT user_id, te AS day_sec,
        |round(CASE WHEN n >= 5 THEN q25 END, 6) AS roll_p25,
        |round(CASE WHEN n >= 5 THEN q75 END, 6) AS roll_p75
        |FROM m ORDER BY user_id, day_sec""".stripMargin,

    "q101_tfidf" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1,2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.term, tf.tf, dft.df,
        |  round(tf.tf * (ln((1 + n.n_docs)::DOUBLE / (1 + dft.df)) + 1), 6) AS tfidf
        |FROM tf JOIN dft USING (term), n
        |ORDER BY doc_id, term""".stripMargin,

    // BM25: identical float op order as the engine's contrib expression
    // ((idf·tf)·(k1+1)) / (tf + k1·(1 − b + b·len/avglen)), k1=1.2 b=0.75
    "q102_bm25" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(ws))::DOUBLE AS avg_len FROM w),
        |toks AS (SELECT doc_id, len(ws)::DOUBLE AS len, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, len, term, count(*) AS tf FROM toks
        |  WHERE term IN ('join','hash','scan') GROUP BY 1,2,3),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |    sum(ln(1 + (st.n_docs - dft.df + 0.5)/(dft.df + 0.5))
        |      * tf.tf * 2.2 / (tf.tf + 1.2*(1 - 0.75 + 0.75*tf.len/st.avg_len))) AS score,
        |    count(*) AS n_terms_hit
        |  FROM tf JOIN dft USING (term), st GROUP BY 1)
        |SELECT d.doc_id, round(sc.score, 6) AS score,
        |  coalesce(sc.n_terms_hit, 0)::BIGINT AS n_terms_hit
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q103_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT epoch(f.cohort_day)::BIGINT AS cohort_s,
        |  date_diff('day', f.cohort_day, a.day) AS offset_days,
        |  count(a.user_id) AS n_active
        |FROM a JOIN f USING (user_id) GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // funnel replayed as the same min-timestamp chain, exact microseconds
    "q104_window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type AS t, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM ev WHERE t = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.t = 'view' AND e.us > s1.t1
        |    AND e.us <= s1.t1 + 604800000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.t = 'purchase' AND e.us > s2.t2
        |    AND e.us <= s1.t1 + 604800000000 GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  (CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS max_step,
        |  s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,

    "q105_freq_encode" ->
      """WITH t AS (SELECT count(*)::DOUBLE AS total FROM events
        |  WHERE event_type IS NOT NULL),
        |d AS (SELECT event_type, count(*) AS n FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1)
        |SELECT e.event_type, round(coalesce(d.n / t.total, 0), 6) AS freq,
        |  count(*) AS n
        |FROM events e CROSS JOIN t LEFT JOIN d USING (event_type)
        |GROUP BY 1,2 ORDER BY 1""".stripMargin,

    // identical float op order: (sum + 10·prior) / (count + 10)
    "q106_target_encode" ->
      """WITH tr AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20'),
        |p AS (SELECT avg(value) AS prior FROM tr),
        |d AS (SELECT event_type,
        |    (sum(value) + 10.0*p.prior) / (count(*) + 10.0) AS code
        |  FROM tr CROSS JOIN p
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY event_type, p.prior)
        |SELECT e.event_type, round(coalesce(d.code, p.prior), 6) AS code,
        |  count(*) AS n
        |FROM events e CROSS JOIN p LEFT JOIN d USING (event_type)
        |GROUP BY 1,2 ORDER BY 1""".stripMargin,

    "q107_robust_scale" ->
      """WITH p AS (SELECT quantile_cont(value, 0.5) AS med,
        |    quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        |  FROM events)
        |SELECT event_id,
        |  round((value - p.med)
        |    / (CASE WHEN p.iqr = 0 THEN 1.0 ELSE p.iqr END), 6) AS value_scaled
        |FROM events CROSS JOIN p ORDER BY event_id""".stripMargin,

    // floor(epoch(ts)) not epoch(ts)::BIGINT: the cast ROUNDS sub-second ts
    "q108_ohlc" ->
      """WITH e AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 300) * 300 AS bucket_start,
        |    ts, event_id, value FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT user_id, bucket_start,
        |  round(max(CASE WHEN ra = 1 THEN value END), 6) AS open,
        |  round(max(value), 6) AS high, round(min(value), 6) AS low,
        |  round(max(CASE WHEN rd = 1 THEN value END), 6) AS close,
        |  count(*) AS cnt
        |FROM r GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q109_twap" ->
      """WITH e AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket_start,
        |    epoch_us(ts) AS tus, event_id, value FROM events),
        |d AS (SELECT user_id, bucket_start, value,
        |    (lead(tus) OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY tus, event_id) - tus)::DOUBLE AS dt
        |  FROM e)
        |SELECT user_id, bucket_start,
        |  round(CASE WHEN sum(dt) IS NULL OR sum(dt) = 0
        |    THEN avg(value) ELSE sum(value * dt) / sum(dt) END, 6) AS twap,
        |  count(*) AS cnt
        |FROM d GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // straight off the raw points — the Spark side reaches the same numbers
    // only through the 1m->1h->1d tier store + Rollup.readRange stitching
    "q110_range_read" ->
      """SELECT user_id, count(*) AS cnt, round(sum(value),6) AS sum_value,
        |round(min(value),6) AS min_value, round(max(value),6) AS max_value,
        |round(quantile_cont(value, 0.5),6) AS p50,
        |round(quantile_cont(value, 0.95),6) AS p95,
        |count(DISTINCT event_type) AS type_card
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 05:23:00'
        |  AND ts < TIMESTAMP '2024-01-27 19:41:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q111_interval_join" ->
      """WITH iv AS (SELECT user_id, event_id AS window_id, ts AS w_start,
        |    ts + INTERVAL 30 MINUTE AS w_end FROM events WHERE event_id % 97 = 0)
        |SELECT e.user_id, iv.window_id, e.event_id
        |FROM events e JOIN iv ON e.user_id = iv.user_id
        | AND e.ts >= iv.w_start AND e.ts < iv.w_end
        |ORDER BY 1, 2, 3""".stripMargin,

    // frame base uses minute-truncated epoch (exact BIGINT cast; a raw
    // epoch(ts)::BIGINT would ROUND sub-second timestamps) — 2-day frames
    // are minute multiples so truncation cannot move a point across frames
    "q112_sax" ->
      """WITH m AS (SELECT user_id, avg(value) AS mu, stddev_pop(value) AS sd
        |    FROM events GROUP BY 1),
        |z AS (SELECT e.user_id,
        |    epoch(date_trunc('minute', e.ts))::BIGINT
        |      - epoch(date_trunc('minute', e.ts))::BIGINT % 172800 AS frame_start,
        |    CASE WHEN m.sd > 0 THEN (e.value - m.mu) / m.sd ELSE 0 END AS z
        |  FROM events e JOIN m USING (user_id)),
        |p AS (SELECT user_id, frame_start, round(avg(z),6) AS paa FROM z GROUP BY 1,2),
        |s AS (SELECT user_id, frame_start,
        |    CASE WHEN paa < -0.6744898 THEN 'a' WHEN paa < 0.0 THEN 'b'
        |         WHEN paa < 0.6744898 THEN 'c' ELSE 'd' END AS sym FROM p)
        |SELECT user_id, string_agg(sym, '' ORDER BY frame_start) AS sax_word,
        |count(*) AS n_frames FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // series-head delta is NULL (contributes nothing), negative delta =
    // reset → the restarted counter's absolute value counts as increase
    "q113_counter_rate" ->
      """WITH c AS (SELECT user_id, ts, event_id,
        |    (sum(1 + event_id % 7) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) % 1000 AS counter
        |  FROM events),
        |d AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket_start,
        |    counter::DOUBLE AS v,
        |    counter::DOUBLE - lag(counter::DOUBLE) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dd
        |  FROM c),
        |x AS (SELECT user_id, bucket_start,
        |    CASE WHEN dd IS NULL THEN NULL WHEN dd >= 0 THEN dd ELSE v END AS delta,
        |    CASE WHEN dd < 0 THEN 1 ELSE 0 END AS is_reset
        |  FROM d)
        |SELECT user_id, bucket_start, round(sum(delta),6) AS increase,
        |  count(delta) AS n_deltas, sum(is_reset)::BIGINT AS n_resets,
        |  round(sum(delta) / 3600.0, 6) AS rate
        |FROM x GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // identical float-op order: per-key re-centered x, the same five moment
    // sums over ROWS 6 PRECEDING, the same (n·Σxy−Σx·Σy)/(n·Σxx−Σx²) shape
    "q114_rolling_slope" ->
      """WITH e AS (SELECT user_id, event_id, ts, value,
        |    epoch_us(ts)::DOUBLE / 86400000000.0 AS xa FROM events),
        |c AS (SELECT *, xa - min(xa) OVER (PARTITION BY user_id) AS x FROM e),
        |s AS (SELECT user_id, event_id,
        |    count(value) OVER fr AS n,
        |    sum(x) OVER fr AS sx, sum(value) OVER fr AS sy,
        |    sum(x * value) OVER fr AS sxy, sum(x * x) OVER fr AS sxx
        |  FROM c
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  round(CASE WHEN n = 7 AND 7.0 * sxx - sx * sx > 0
        |    THEN (7.0 * sxy - sx * sy) / (7.0 * sxx - sx * sx) END, 6)
        |    AS rolling_slope
        |FROM s ORDER BY 1,2""".stripMargin,

    // roles resolved by explicit row_number orderings (earliest row wins
    // min/max ties), same fixed first,last,min,max role order
    "q115_m4" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    (floor(epoch(ts))::BIGINT // 21600) * 21600 AS bucket_start,
        |    epoch_us(ts) AS tus FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY tus, event_id) AS rn_f,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY tus DESC, event_id DESC) AS rn_l,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY value, tus, event_id) AS rn_min,
        |    row_number() OVER (PARTITION BY user_id, bucket_start
        |      ORDER BY value DESC, tus, event_id) AS rn_max
        |  FROM e)
        |SELECT user_id, bucket_start, event_id, round(value,6) AS value,
        |  concat_ws(',',
        |    CASE WHEN rn_f = 1 THEN 'first' END,
        |    CASE WHEN rn_l = 1 THEN 'last' END,
        |    CASE WHEN rn_min = 1 THEN 'min' END,
        |    CASE WHEN rn_max = 1 THEN 'max' END) AS roles
        |FROM r WHERE rn_f = 1 OR rn_l = 1 OR rn_min = 1 OR rn_max = 1
        |ORDER BY 1, 2, 3""".stripMargin,

    // bins raw points straight at 1h grain (slot expr float-op-identical to
    // Hist.slot: 12 slots = underflow + 10 bins of [0,100) + overflow);
    // zero slots materialized via the bin spine cross join
    "q116_hist_promote" ->
      """WITH pts AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket_start,
        |    CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 11
        |         ELSE least(floor((value - 0.0) / 10.0)::INT, 9) + 1 END AS bin
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT DISTINCT user_id, bucket_start FROM pts),
        |bins AS (SELECT unnest(generate_series(0, 11)) AS bin),
        |c AS (SELECT user_id, bucket_start, bin, count(*) AS cnt
        |  FROM pts GROUP BY 1,2,3)
        |SELECT g.user_id, g.bucket_start, bins.bin,
        |  coalesce(c.cnt, 0)::BIGINT AS cnt
        |FROM g CROSS JOIN bins
        |LEFT JOIN c ON c.user_id = g.user_id
        |  AND c.bucket_start = g.bucket_start AND c.bin = bins.bin
        |ORDER BY 1, 2, 3""".stripMargin,

    // the fold replayed as a recursive CTE over per-key row_number, same
    // (second-truncated ts, event_id) order and float op order as the Spark
    // fold; is_drift compared on the UNROUNDED sums
    "q117_cusum" ->
      """WITH RECURSIVE m AS (
        |  SELECT user_id, avg(value) AS mu, stddev_pop(value) AS sd
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |z AS (SELECT e.user_id, floor(epoch(e.ts))::BIGINT AS ts_sec,
        |    e.event_id AS tie,
        |    CASE WHEN m.sd > 0 THEN (e.value - m.mu) / m.sd ELSE 0.0 END AS z,
        |    row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY floor(epoch(e.ts))::BIGINT, e.event_id) AS rn
        |  FROM events e JOIN m USING (user_id) WHERE e.value IS NOT NULL),
        |rec AS (
        |  SELECT user_id, rn, ts_sec, tie, z,
        |    greatest(0.0, 0.0 + z - 0.5) AS sp,
        |    greatest(0.0, 0.0 - z - 0.5) AS sn
        |  FROM z WHERE rn = 1
        |  UNION ALL
        |  SELECT z.user_id, z.rn, z.ts_sec, z.tie, z.z,
        |    greatest(0.0, r.sp + z.z - 0.5), greatest(0.0, r.sn - z.z - 0.5)
        |  FROM z JOIN rec r ON z.user_id = r.user_id AND z.rn = r.rn + 1)
        |SELECT user_id, ts_sec, tie, round(z,6) AS z,
        |  round(sp,6) AS cusum_pos, round(sn,6) AS cusum_neg,
        |  (sp > 5.0 OR sn > 5.0) AS is_drift
        |FROM rec ORDER BY 1, 2, 3""".stripMargin,

    // same tokenizer contract as q41, same md5Long sample gate as q39, the
    // identical (c+1)/(N+V) and -ln(p)/ln(2) op shapes; totals from the
    // FULL sampled counts, vocab capped to top-500 (c desc, tok)
    "q118_lm_score" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      w -> w <> '')) AS tok
        |  FROM documents),
        |tr AS (SELECT tok FROM toks
        |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 2 = 0),
        |cnts AS (SELECT tok, count(*) AS c FROM tr GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS N, count(*)::BIGINT AS V FROM cnts),
        |voc AS (SELECT tok, c FROM (SELECT tok, c,
        |    row_number() OVER (ORDER BY c DESC, tok) AS rk FROM cnts)
        |  WHERE rk <= 500),
        |sc AS (SELECT t.doc_id,
        |    -ln((coalesce(v.c, 0) + 1.0) / (tot.N + tot.V)) / ln(2.0) AS b
        |  FROM toks t LEFT JOIN voc v USING (tok) CROSS JOIN tot),
        |agg AS (SELECT doc_id, count(*) AS n_tokens, avg(b) AS bits
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  round(a.bits, 6) AS bits, round(pow(2.0, a.bits), 6) AS ppl
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY 1""".stripMargin,

    // replays the q116 binning at 1h grain, then the identical rank model:
    // r = q·n, containing slot = first non-empty with cumBefore < r <= cum,
    // lo + (bin−1)·w + ((r−cumBefore)/cnt)·w, slots 0/11 clamp to lo/hi
    "q119_hist_quantile" ->
      """WITH pts AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 3600) * 3600 AS bucket_start,
        |    CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 11
        |         ELSE least(floor((value - 0.0) / 10.0)::INT, 9) + 1 END AS bin
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT DISTINCT user_id, bucket_start FROM pts),
        |bins AS (SELECT unnest(generate_series(0, 11)) AS bin),
        |c AS (SELECT user_id, bucket_start, bin, count(*) AS cnt
        |  FROM pts GROUP BY 1,2,3),
        |h AS (SELECT g.user_id, g.bucket_start, bins.bin,
        |    coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM g CROSS JOIN bins
        |  LEFT JOIN c ON c.user_id = g.user_id
        |    AND c.bucket_start = g.bucket_start AND c.bin = bins.bin),
        |w AS (SELECT *,
        |    sum(cnt) OVER (PARTITION BY user_id, bucket_start ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY user_id, bucket_start) AS n FROM h),
        |qq AS (SELECT unnest([0.5, 0.95]) AS q),
        |sel AS (SELECT w.user_id, w.bucket_start, qq.q, w.bin, w.cnt, w.cum,
        |    qq.q * w.n AS r
        |  FROM w CROSS JOIN qq
        |  WHERE w.cnt > 0 AND w.cum >= qq.q * w.n
        |    AND (w.cum - w.cnt) < qq.q * w.n)
        |SELECT user_id, bucket_start, q,
        |  round(CASE WHEN bin = 0 THEN 0.0 WHEN bin = 11 THEN 100.0
        |    ELSE 0.0 + (bin - 1) * 10.0 + ((r - (cum - cnt)) / cnt) * 10.0
        |    END, 6) AS est
        |FROM sel ORDER BY 1, 2, 3""".stripMargin,

    // analytic oracle: whitened-PCA covariance IS the identity — no replay
    // of the eigen solve, the mathematical invariant itself is the check.
    // The Spark side reduces each cell to |cov − λᵢ/(λᵢ+eps)| < 5e-4 (a
    // boolean immune to agg merge-order ulps); the oracle asserts TRUE
    // for all k×k cells.
    "q120_pca_whiten" ->
      """SELECT a.i::INT AS i, b.j::INT AS j, TRUE AS identity_ok
        |FROM (SELECT unnest(generate_series(0, 7)) AS i) a
        |CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) b
        |ORDER BY 1, 2""".stripMargin,

    // raw points re-aggregated per 90-min bucket + the dense zero-fill
    // spine; the Spark side reaches the same numbers only through the
    // 1m→5m tier store and block-merge percentiles
    "q121_range_series" ->
      """WITH agg AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 5400) * 5400 AS bucket_start,
        |    count(*) AS cnt, round(sum(value),6) AS sum_value,
        |    round(quantile_cont(value, 0.5),6) AS p50,
        |    round(quantile_cont(value, 0.95),6) AS p95,
        |    count(DISTINCT event_type) AS type_card
        |  FROM events
        |  WHERE floor(epoch(ts))::BIGINT >= 1704412800
        |    AND floor(epoch(ts))::BIGINT < 1705789800
        |  GROUP BY 1, 2),
        |grid AS (SELECT u.user_id, g.bucket_start
        |  FROM (SELECT DISTINCT user_id FROM agg) u
        |  CROSS JOIN (SELECT unnest(generate_series(1704412800,
        |    1705789800 - 5400, 5400)) AS bucket_start) g)
        |SELECT grid.user_id, grid.bucket_start,
        |  coalesce(agg.cnt, 0)::BIGINT AS cnt, agg.sum_value, agg.p50,
        |  agg.p95, agg.type_card
        |FROM grid LEFT JOIN agg ON agg.user_id = grid.user_id
        |  AND agg.bucket_start = grid.bucket_start
        |ORDER BY 1, 2""".stripMargin,

    // q85's recursion with the φ damping factor threaded through; the
    // horizon multiplier φ(1−φˢ)/(1−φ) uses φ=0.875 (binary-exact, so
    // 1−φ = 0.125 is identical in both engines)
    "q122_holt_damped" ->
      """WITH RECURSIVE daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn FROM daily),
        |n AS (SELECT user_id, max(rn) AS bigT, max(d) AS last_d FROM r GROUP BY 1),
        |rec AS (
        |  SELECT r1.user_id, 1 AS rn, r1.y AS l, r2.y - r1.y AS b
        |  FROM r r1 JOIN r r2 ON r2.user_id = r1.user_id AND r2.rn = 2
        |  WHERE r1.rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |    0.3*s.y + 0.7*(rec.l + 0.875*rec.b) AS l,
        |    0.2*((0.3*s.y + 0.7*(rec.l + 0.875*rec.b)) - rec.l)
        |      + 0.8*(0.875*rec.b) AS b
        |  FROM rec JOIN r s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1),
        |fin AS (SELECT rec.user_id, rec.l, rec.b
        |  FROM rec JOIN n ON n.user_id = rec.user_id AND rec.rn = n.bigT)
        |SELECT f.user_id, epoch(n.last_d)::BIGINT + g.s*86400 AS forecast_s,
        |  g.s AS step,
        |  round(f.l + (0.875 * (1.0 - pow(0.875, g.s)) / 0.125) * f.b, 6) AS yhat
        |FROM fin f JOIN n USING (user_id), generate_series(1,3) g(s)
        |ORDER BY 1,3""".stripMargin,

    // list window + filter — the same materialized-frame construction
    "q123_rolling_rank" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
        |  FROM events)
        |SELECT user_id, event_id,
        |  round(CASE WHEN len(l) = 10 AND value IS NOT NULL
        |    THEN len(list_filter(l, x -> x <= value))::DOUBLE / 10.0 END, 6)
        |    AS pct_rank
        |FROM e ORDER BY 1, 2""".stripMargin,

    // q77's LSH + transitive-closure clustering, then the survivor pick:
    // max n_chars per component (ties -> min id), singletons keep themselves
    "q124_dedup_keep" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id AS id, text, n_chars FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 1000000, text, n_chars FROM documents WHERE doc_id < 200),
        |w AS (SELECT id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws FROM corpus),
        |s AS (SELECT id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh FROM w),
        |e AS (SELECT id, unnest(sh) AS g FROM s),
        |m AS (SELECT id,
        |  min(('0x' || substr(md5('0:' || g),1,15))::BIGINT) AS mh0,
        |  min(('0x' || substr(md5('1:' || g),1,15))::BIGINT) AS mh1,
        |  min(('0x' || substr(md5('2:' || g),1,15))::BIGINT) AS mh2,
        |  min(('0x' || substr(md5('3:' || g),1,15))::BIGINT) AS mh3,
        |  min(('0x' || substr(md5('4:' || g),1,15))::BIGINT) AS mh4,
        |  min(('0x' || substr(md5('5:' || g),1,15))::BIGINT) AS mh5,
        |  min(('0x' || substr(md5('6:' || g),1,15))::BIGINT) AS mh6,
        |  min(('0x' || substr(md5('7:' || g),1,15))::BIGINT) AS mh7
        |  FROM e GROUP BY 1),
        |bk AS (
        |  SELECT id, 0 AS band, ('0x' || substr(md5('0:' || mh0::VARCHAR || ',' || mh1::VARCHAR),1,15))::BIGINT AS bucket FROM m
        |  UNION ALL SELECT id, 1, ('0x' || substr(md5('1:' || mh2::VARCHAR || ',' || mh3::VARCHAR),1,15))::BIGINT FROM m
        |  UNION ALL SELECT id, 2, ('0x' || substr(md5('2:' || mh4::VARCHAR || ',' || mh5::VARCHAR),1,15))::BIGINT FROM m
        |  UNION ALL SELECT id, 3, ('0x' || substr(md5('3:' || mh6::VARCHAR || ',' || mh7::VARCHAR),1,15))::BIGINT FROM m),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        |shd AS (SELECT id, list_distinct(sh) AS sh FROM s),
        |j AS (SELECT id_a, id_b,
        |  len(list_intersect(x.sh, y.sh))::DOUBLE AS i2,
        |  (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))::DOUBLE AS u2
        |  FROM cand JOIN shd x ON x.id = cand.id_a JOIN shd y ON y.id = cand.id_b),
        |pairs AS (SELECT id_a, id_b FROM j WHERE u2 > 0 AND i2/u2 >= 0.9),
        |und AS (SELECT id_a AS s2, id_b AS d2 FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT s2 AS id FROM und),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION SELECT u.s2, reach.r FROM und u JOIN reach ON u.d2 = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
        |lab AS (SELECT c.id, coalesce(comp.component, c.id) AS component,
        |    c.n_chars::DOUBLE AS score
        |  FROM corpus c LEFT JOIN comp ON comp.id = c.id)
        |SELECT id, component,
        |  row_number() OVER (PARTITION BY component ORDER BY score DESC, id) = 1 AS keep
        |FROM lab ORDER BY id""".stripMargin,

    // q93's decomposition aggregated to the FPP3 strength scalars; edge
    // rows (null trend) excluded, zero-variance denominators null
    "q125_decomp_strength" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) / 100.0 AS v
        |  FROM events GROUP BY 1,2),
        |i AS (SELECT user_id, d, v::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1) % 7 AS pos,
        |    CASE WHEN count(v) OVER f = 7 THEN avg(v) OVER f END AS trend
        |  FROM daily
        |  WINDOW f AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d2 AS (SELECT *, y - trend AS det FROM i),
        |sr AS (SELECT user_id, pos, avg(det) AS s_raw FROM d2 GROUP BY 1,2),
        |c AS (SELECT user_id, avg(s_raw) AS ctr FROM sr GROUP BY 1),
        |fin AS (SELECT d2.user_id, trend, s_raw - ctr AS seasonal,
        |    y - trend - (s_raw - ctr) AS remainder
        |  FROM d2 JOIN sr USING (user_id, pos) JOIN c USING (user_id)
        |  WHERE trend IS NOT NULL)
        |SELECT user_id, count(*) AS n,
        |  round(CASE WHEN var_pop(trend + remainder) > 0 THEN
        |    greatest(0.0, 1.0 - var_pop(remainder) / var_pop(trend + remainder))
        |    END, 6) AS trend_strength,
        |  round(CASE WHEN var_pop(seasonal + remainder) > 0 THEN
        |    greatest(0.0, 1.0 - var_pop(remainder) / var_pop(seasonal + remainder))
        |    END, 6) AS seasonal_strength
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    // list-window median/MAD in the same sorted-middle-element form; MAD 0
    // thresholds at zero so any deviation from the window median flags
    "q126_hampel" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS l
        |  FROM events),
        |m AS (SELECT user_id, event_id, value, l,
        |    CASE WHEN len(l) = 7 THEN list_sort(l)[4] END AS med FROM e),
        |d AS (SELECT user_id, event_id, value, med,
        |    CASE WHEN med IS NOT NULL THEN
        |      list_sort(list_transform(l, x -> abs(x - med)))[4] END AS mad
        |  FROM m)
        |SELECT user_id, event_id, round(med, 6) AS hampel_med,
        |  CASE WHEN mad IS NOT NULL
        |    THEN abs(value - med) > 3.0 * 1.4826 * mad ELSE false END AS hampel_flag,
        |  round(CASE WHEN mad IS NOT NULL
        |      AND abs(value - med) > 3.0 * 1.4826 * mad
        |    THEN med ELSE value END, 6) AS v_filtered
        |FROM d ORDER BY 1, 2""".stripMargin,

    // recursive CTE carries the four decayed sums (decay = 0.5 exact);
    // var = (sw²/(sw²−sw2)) · (swx2/sw − m²) in the identical op order,
    // null until two observations
    "q127_ewm_var" ->
      """WITH RECURSIVE daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(value) AS v FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, floor(epoch(day))::BIGINT AS day_sec, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM daily),
        |rec AS (
        |  SELECT user_id, rn, day_sec, 1.0::DOUBLE AS sw, 1.0::DOUBLE AS sw2,
        |    y AS swx, y*y AS swx2, 1 AS nobs
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, s.day_sec,
        |    0.5*rec.sw + 1.0, 0.25*rec.sw2 + 1.0,
        |    0.5*rec.swx + s.y, 0.5*rec.swx2 + s.y*s.y, rec.nobs + 1
        |  FROM rec JOIN r s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1)
        |SELECT user_id, day_sec,
        |  round(swx / sw, 6) AS ewm_mean,
        |  round(CASE WHEN nobs >= 2 AND sw*sw - sw2 > 0 THEN
        |    (sw*sw / (sw*sw - sw2)) * (swx2/sw - (swx/sw)*(swx/sw)) END, 6) AS ewm_var,
        |  round(CASE WHEN nobs >= 2 AND sw*sw - sw2 > 0 THEN
        |    sqrt((sw*sw / (sw*sw - sw2)) * (swx2/sw - (swx/sw)*(swx/sw))) END, 6) AS ewm_std
        |FROM rec ORDER BY 1, 2""".stripMargin,

    // identical page construction, line predicates replayed rule-for-rule,
    // ordered reassembly via string_agg ORDER BY pos
    "q128_line_filter" ->
      """WITH t AS (SELECT doc_id,
        |    substr(text, 1, 50) || '.' || chr(10) || substr(text, 51, 40)
        |      || chr(10) || 'Please enable javascript to continue.'
        |      || chr(10) || substr(text, 91, 60) || '!' AS page
        |  FROM documents),
        |x AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM t),
        |l AS (SELECT doc_id, u.pos, ls[u.pos] AS line
        |  FROM x CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS pos) u),
        |k AS (SELECT doc_id, pos, line,
        |    regexp_matches(trim(line), '[.!?"]$')
        |    AND len(list_filter(regexp_split_to_array(trim(line), '\s+'),
        |      w -> w <> '')) >= 5
        |    AND NOT contains(lower(line), 'javascript')
        |    AND NOT contains(lower(line), 'cookie') AS keep
        |  FROM l)
        |SELECT doc_id, count(*) AS n_lines,
        |  count(CASE WHEN keep THEN 1 END) AS n_kept,
        |  string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos)
        |    AS clean_text
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same direct single-bin sums: z·cos / z·sin against integer row
    // phases, power = sc² + ss², identical 2·π/p constant shape
    "q129_periodogram" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, v::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1)::DOUBLE AS t
        |  FROM daily),
        |c AS (SELECT user_id, avg(y) AS mu FROM r GROUP BY 1),
        |z AS (SELECT r.user_id, r.t, r.y - c.mu AS z
        |  FROM r JOIN c USING (user_id)),
        |p AS (SELECT unnest([2, 3, 7, 14]) AS period),
        |a AS (SELECT z.user_id, p.period,
        |    sum(z.z * cos(z.t * (2.0 * pi() / p.period))) AS sc,
        |    sum(z.z * sin(z.t * (2.0 * pi() / p.period))) AS ss,
        |    count(*) AS n
        |  FROM z CROSS JOIN p GROUP BY 1, 2)
        |SELECT user_id, period::INT AS period,
        |  round(sc*sc + ss*ss, 6) AS power, n
        |FROM a ORDER BY 1, 2""".stripMargin,

    // q99's recursion with ratio seasonals: divide where additive
    // subtracts, multiply the forecast; positive-series guard in `n`
    "q130_holt_winters_mul" ->
      """WITH RECURSIVE daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn FROM daily),
        |n AS (SELECT user_id, max(rn) AS bigT, max(d) AS last_d FROM r GROUP BY 1
        |  HAVING max(rn) >= 14 AND min(y) > 0),
        |agg AS (
        |  SELECT user_id,
        |    sum(CASE WHEN rn <= 7 THEN y END) / 7.0 AS l0,
        |    (sum(CASE WHEN rn BETWEEN 8 AND 14 THEN y END)
        |     - sum(CASE WHEN rn <= 7 THEN y END)) / 49.0 AS b0,
        |    list(y ORDER BY rn) FILTER (WHERE rn <= 7) AS first7
        |  FROM r GROUP BY 1),
        |init AS (
        |  SELECT a.user_id, 7 AS rn, l0 AS l, b0 AS b,
        |    list_transform(first7, x -> x / l0) AS s
        |  FROM agg a JOIN n USING (user_id) WHERE l0 <> 0),
        |rec AS (
        |  SELECT * FROM init
        |  UNION ALL
        |  SELECT rec.user_id, rec.rn + 1,
        |    0.3*(sr.y / rec.s[(rec.rn % 7) + 1]) + 0.7*(rec.l + rec.b) AS l,
        |    0.1*((0.3*(sr.y / rec.s[(rec.rn % 7) + 1]) + 0.7*(rec.l + rec.b)) - rec.l)
        |      + 0.9*rec.b AS b,
        |    rec.s[1:(rec.rn % 7)]
        |      || [0.2*(sr.y / (rec.l + rec.b)) + 0.8*rec.s[(rec.rn % 7) + 1]]
        |      || rec.s[(rec.rn % 7) + 2:7] AS s
        |  FROM rec JOIN r sr ON sr.user_id = rec.user_id AND sr.rn = rec.rn + 1),
        |fin AS (SELECT rec.user_id, rec.l, rec.b, rec.s
        |  FROM rec JOIN n ON n.user_id = rec.user_id AND rec.rn = n.bigT)
        |SELECT f.user_id, epoch(n.last_d)::BIGINT + g.s*86400 AS forecast_s, g.s AS step,
        |  round((f.l + g.s*f.b) * f.s[((n.bigT - 1 + g.s) % 7) + 1], 6) AS yhat
        |FROM fin f JOIN n USING (user_id), generate_series(1,7) g(s)
        |ORDER BY 1,3""".stripMargin,

    // same construction and the same shifted-y correlations via window lag
    "q131_cross_corr" ->
      """WITH xy AS (SELECT user_id, ts, event_id, value,
        |    lag(value, 2) OVER w AS y
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |st AS (SELECT user_id, value,
        |    lead(y, 2) OVER w AS y_m2, lead(y, 1) OVER w AS y_m1, y AS y_0,
        |    lag(y, 1) OVER w AS y_1, lag(y, 2) OVER w AS y_2
        |  FROM xy WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |a AS (SELECT user_id,
        |    corr(value, y_m2) AS c_m2, corr(value, y_m1) AS c_m1,
        |    corr(value, y_0) AS c_0, corr(value, y_1) AS c_1,
        |    corr(value, y_2) AS c_2
        |  FROM st GROUP BY 1)
        |SELECT user_id, l.lag, round(CASE l.lag
        |    WHEN -2 THEN c_m2 WHEN -1 THEN c_m1 WHEN 0 THEN c_0
        |    WHEN 1 THEN c_1 ELSE c_2 END, 6) AS ccf
        |FROM a CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS lag) l
        |ORDER BY 1, 2""".stripMargin,

    // identical share construction; log2 is the only libm call and r6
    // absorbs its ulp
    "q132_concentration" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT user_id, c,
        |    c::DOUBLE / sum(c) OVER (PARTITION BY user_id) AS p FROM c)
        |SELECT user_id, sum(c)::BIGINT AS n, count(*) AS n_categories,
        |  round(-sum(p * log2(p)), 6) AS entropy,
        |  round(sum(c * c)::DOUBLE / (sum(c) * sum(c))::DOUBLE, 6) AS hhi
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // piecewise forms replayed branch-for-branch (lambda = 0.5, 2-lambda =
    // 1.5), inverse applied to the forward result inside the query
    "q133_yeo_johnson" ->
      """WITH c AS (SELECT event_id, value - 50.0 AS x FROM events),
        |f AS (SELECT event_id, x,
        |    CASE WHEN x >= 0 THEN (pow(x + 1.0, 0.5) - 1.0) / 0.5
        |         ELSE -(pow(1.0 - x, 1.5) - 1.0) / 1.5 END AS yj
        |  FROM c)
        |SELECT event_id, round(yj, 6) AS yj,
        |  round(CASE WHEN yj >= 0 THEN pow(yj * 0.5 + 1.0, 1.0 / 0.5) - 1.0
        |    ELSE 1.0 - pow(1.0 - yj * 1.5, 1.0 / 1.5) END, 6) AS back
        |FROM f ORDER BY event_id""".stripMargin,

    // the classic two-row_number difference, replayed key-for-key
    "q134_streaks" ->
      """WITH e AS (SELECT user_id, event_id, ts, value > 60.0 AS cond,
        |    row_number() OVER w AS rn,
        |    count(CASE WHEN value > 60.0 THEN 1 END) OVER
        |      (PARTITION BY user_id ORDER BY ts
        |       ROWS UNBOUNDED PRECEDING) AS crn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |i AS (SELECT user_id, event_id, ts, cond,
        |    CASE WHEN cond THEN rn - crn END AS island FROM e)
        |SELECT user_id, event_id,
        |  CASE WHEN cond THEN island END AS streak_id,
        |  CASE WHEN cond THEN row_number() OVER
        |    (PARTITION BY user_id, island ORDER BY ts) END AS streak_len
        |FROM i ORDER BY 1, 2""".stripMargin,

    // same hourly grid + nulls, fill = last same-phase non-null
    "q135_seasonal_fill" ->
      """WITH hourly AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT // 3600) * 3600 AS h, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |withnulls AS (SELECT user_id, h,
        |    CASE WHEN (h // 3600) % 5 = 0 THEN NULL ELSE v END AS v,
        |    h % 86400 AS phase
        |  FROM hourly)
        |SELECT user_id, h,
        |  round(coalesce(v, last_value(v IGNORE NULLS) OVER
        |    (PARTITION BY user_id, phase ORDER BY h
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS v_filled
        |FROM withnulls ORDER BY 1, 2""".stripMargin,

    // the Winkler form replayed term-for-term (2/alpha = 2.0/0.2)
    "q136_interval_score" ->
      """WITH b AS (SELECT user_id, value,
        |    lag(value, 1) OVER w - 15.0 AS lo,
        |    lag(value, 1) OVER w + 15.0 AS hi
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (SELECT user_id, value, lo, hi,
        |    (hi - lo)
        |    + CASE WHEN value < lo THEN (2.0 / 0.2) * (lo - value) ELSE 0.0 END
        |    + CASE WHEN value > hi THEN (2.0 / 0.2) * (value - hi) ELSE 0.0 END AS w
        |  FROM b WHERE value IS NOT NULL AND lo IS NOT NULL AND hi IS NOT NULL)
        |SELECT user_id, round(avg(w), 6) AS interval_score,
        |  round(avg(CASE WHEN value >= lo AND value <= hi THEN 1.0 ELSE 0.0 END), 6)
        |    AS coverage,
        |  count(*) AS n
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // finite-sample quantile k = ceil((n+1)(1-alpha)) replayed exactly;
    // 2.0/0.2 == 10.0 in IEEE doubles in both engines
    "q137_conformal" ->
      """WITH p AS (SELECT user_id, ts, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pred
        |  FROM events),
        |pp AS (SELECT * FROM p WHERE pred IS NOT NULL AND value IS NOT NULL),
        |rk AS (SELECT user_id, abs(value - pred) AS r,
        |    row_number() OVER (PARTITION BY user_id ORDER BY abs(value - pred)) AS rnk,
        |    count(*) OVER (PARTITION BY user_id) AS nc
        |  FROM pp WHERE ts < TIMESTAMP '2024-01-25 00:00:00'),
        |q AS (SELECT user_id, r AS qhat, nc AS n_calib FROM rk
        |  WHERE rnk = CAST(ceil((nc + 1) * (1.0 - 0.2)) AS BIGINT)),
        |t AS (SELECT pp.user_id, q.qhat, q.n_calib, pp.value,
        |    pp.pred - q.qhat AS lo, pp.pred + q.qhat AS hi
        |  FROM pp JOIN q USING (user_id)
        |  WHERE pp.ts >= TIMESTAMP '2024-01-25 00:00:00'),
        |f AS (SELECT user_id, qhat, n_calib, value, lo, hi,
        |    (hi - lo)
        |    + CASE WHEN value < lo THEN (2.0 / 0.2) * (lo - value) ELSE 0.0 END
        |    + CASE WHEN value > hi THEN (2.0 / 0.2) * (value - hi) ELSE 0.0 END AS w
        |  FROM t)
        |SELECT user_id, round(any_value(qhat), 6) AS qhat,
        |  any_value(n_calib) AS n_calib,
        |  round(avg(w), 6) AS interval_score,
        |  round(avg(CASE WHEN value >= lo AND value <= hi THEN 1.0 ELSE 0.0 END), 6)
        |    AS coverage,
        |  count(*) AS n
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // fold = floor(idx*K/n) over distinct day buckets, purge/embargo in
    // bucket units — the same pure integer forms the operator uses
    "q138_purged_cv" ->
      """WITH dd AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
        |ix AS (SELECT d, row_number() OVER (ORDER BY d) - 1 AS idx,
        |    count(*) OVER () AS n FROM dd),
        |fd AS (SELECT d, idx, CAST(floor(idx * 5.0 / n) AS BIGINT) AS fold FROM ix),
        |fb AS (SELECT fold, min(idx) AS si, max(idx) AS ei FROM fd GROUP BY 1),
        |e AS (SELECT date_trunc('day', ts) AS d FROM events),
        |j AS (SELECT fd.idx, e.d FROM e JOIN fd USING (d)),
        |r AS (SELECT fb.fold, j.d,
        |    CASE WHEN j.idx BETWEEN fb.si AND fb.ei THEN 'test'
        |         WHEN j.idx >= fb.si - 2 AND j.idx < fb.si THEN 'purged'
        |         WHEN j.idx > fb.ei AND j.idx <= fb.ei + 2 THEN 'embargo'
        |         ELSE 'train' END AS role
        |  FROM j CROSS JOIN fb)
        |SELECT fold, role, count(*) AS n, min(d) AS d_min, max(d) AS d_max
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the filter recursion replayed in identical float op order
    // (pPred = p+q; k = pPred/(pPred+r); z = (y-l)/sqrt(pPred+r);
    //  l += k*(y-l); p = (1-k)*pPred), init l=y1 p=r
    "q139_kalman" ->
      """WITH RECURSIVE daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(value) AS v FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, floor(epoch(day))::BIGINT AS day_sec, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM daily),
        |rec AS (
        |  SELECT user_id, rn, day_sec, y AS l, 16.0::DOUBLE AS p,
        |    NULL::DOUBLE AS k, NULL::DOUBLE AS z
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, s.day_sec,
        |    rec.l + ((rec.p + 4.0) / ((rec.p + 4.0) + 16.0)) * (s.y - rec.l),
        |    (1.0 - (rec.p + 4.0) / ((rec.p + 4.0) + 16.0)) * (rec.p + 4.0),
        |    (rec.p + 4.0) / ((rec.p + 4.0) + 16.0),
        |    (s.y - rec.l) / sqrt((rec.p + 4.0) + 16.0)
        |  FROM rec JOIN r s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1)
        |SELECT user_id, day_sec, round(l, 6) AS level, round(k, 6) AS gain,
        |  round(z, 6) AS z
        |FROM rec ORDER BY 1, 2""".stripMargin,

    // both systems replayed (q102's BM25, q36's cosine), ranks on
    // round(score, 6) with id tie-break, RRF k=60
    "q140_rrf_hybrid" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(ws))::DOUBLE AS avg_len FROM w),
        |toks AS (SELECT doc_id, len(ws)::DOUBLE AS len, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, len, term, count(*) AS tf FROM toks
        |  WHERE term IN ('join','hash','scan') GROUP BY 1,2,3),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |    sum(ln(1 + (st.n_docs - dft.df + 0.5)/(dft.df + 0.5))
        |      * tf.tf * 2.2 / (tf.tf + 1.2*(1 - 0.75 + 0.75*tf.len/st.avg_len))) AS score
        |  FROM tf JOIN dft USING (term), st GROUP BY 1),
        |bm AS (SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rnk
        |  FROM sc QUALIFY rnk <= 50),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1),
        |cs AS (SELECT c.vec_id AS id,
        |    list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv))
        |      * sqrt(list_dot_product(c.cv, c.cv))) AS sim
        |  FROM q CROSS JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c
        |  WHERE c.vec_id <> 1
        |    AND sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)) > 0),
        |dn AS (SELECT id, row_number() OVER (ORDER BY round(sim, 6) DESC, id) AS rnk
        |  FROM cs QUALIFY rnk <= 50),
        |u AS (SELECT id, rnk FROM bm UNION ALL SELECT id, rnk FROM dn),
        |f AS (SELECT id, sum(1.0 / (60 + rnk)) AS rrf_score, count(*) AS n_systems
        |  FROM u GROUP BY 1),
        |rr AS (SELECT id, rrf_score, n_systems,
        |    row_number() OVER (ORDER BY rrf_score DESC, id) AS fused_rank FROM f)
        |SELECT id, round(rrf_score, 6) AS rrf_score, n_systems, fused_rank
        |FROM rr WHERE fused_rank <= 20 ORDER BY fused_rank""".stripMargin,

    // fixed-width bins over the reference min/max, Laplace smoothing
    // (c+0.5)/(n+5), every bin slot materialized
    "q141_psi" ->
      """WITH r AS (SELECT user_id, value::DOUBLE AS v FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16 00:00:00'),
        |c AS (SELECT user_id, value::DOUBLE AS v FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |st AS (SELECT user_id, min(v) AS lo, max(v) AS hi, count(*) AS n_ref
        |  FROM r GROUP BY 1),
        |cn AS (SELECT user_id, count(*) AS n_cur FROM c GROUP BY 1),
        |rb AS (SELECT r.user_id,
        |    CASE WHEN st.hi = st.lo THEN 0 ELSE least(9, greatest(0,
        |      CAST(floor((r.v - st.lo) / (st.hi - st.lo) * 10) AS BIGINT))) END AS bin,
        |    count(*) AS cr
        |  FROM r JOIN st USING (user_id) GROUP BY 1, 2),
        |cb AS (SELECT c.user_id,
        |    CASE WHEN st.hi = st.lo THEN 0 ELSE least(9, greatest(0,
        |      CAST(floor((c.v - st.lo) / (st.hi - st.lo) * 10) AS BIGINT))) END AS bin,
        |    count(*) AS cc
        |  FROM c JOIN st USING (user_id) GROUP BY 1, 2),
        |slots AS (SELECT user_id, unnest(range(0, 10)) AS bin FROM st),
        |sh AS (SELECT s.user_id,
        |    (coalesce(rb.cr, 0) + 0.5)::DOUBLE / (st.n_ref + 5.0)::DOUBLE AS pr,
        |    (coalesce(cb.cc, 0) + 0.5)::DOUBLE / (cn.n_cur + 5.0)::DOUBLE AS pc
        |  FROM slots s
        |  LEFT JOIN rb ON rb.user_id = s.user_id AND rb.bin = s.bin
        |  LEFT JOIN cb ON cb.user_id = s.user_id AND cb.bin = s.bin
        |  JOIN st ON st.user_id = s.user_id
        |  JOIN cn ON cn.user_id = s.user_id)
        |SELECT sh.user_id, round(sum((pc - pr) * ln(pc / pr)), 6) AS psi,
        |  max(st.n_ref) AS n_ref, max(cn.n_cur) AS n_cur
        |FROM sh JOIN st ON st.user_id = sh.user_id
        |  JOIN cn ON cn.user_id = sh.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // D = max |F_ref - F_cur| over integer cumulative counts
    "q142_ks" ->
      """WITH t AS (SELECT user_id, value::DOUBLE AS v,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS ir,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS ic
        |  FROM events WHERE value IS NOT NULL),
        |pv AS (SELECT user_id, v, sum(ir) AS cr, sum(ic) AS cc FROM t GROUP BY 1, 2),
        |cum AS (SELECT user_id,
        |    sum(cr) OVER (PARTITION BY user_id ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sr,
        |    sum(cc) OVER (PARTITION BY user_id ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc,
        |    sum(cr) OVER (PARTITION BY user_id) AS nr,
        |    sum(cc) OVER (PARTITION BY user_id) AS nc
        |  FROM pv)
        |SELECT user_id, round(max(abs(sr::DOUBLE / nr - sc::DOUBLE / nc)), 6) AS ks,
        |  max(nr)::BIGINT AS n_ref, max(nc)::BIGINT AS n_cur
        |FROM cum WHERE nr > 0 AND nc > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    // pairwise slopes via self-join, exact interpolated medians; x is
    // epoch-days re-centered per key (identical float ops to the operator)
    "q143_theil_sen" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(value) AS v FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, epoch_us(day)::DOUBLE / 86400000000.0 AS xa,
        |    v::DOUBLE AS y,
        |    min(epoch_us(day)::DOUBLE / 86400000000.0)
        |      OVER (PARTITION BY user_id) AS x0
        |  FROM daily WHERE v IS NOT NULL),
        |bb AS (SELECT user_id, xa - x0 AS x, y FROM b),
        |p AS (SELECT l.user_id, (r.y - l.y) / (r.x - l.x) AS s
        |  FROM bb l JOIN bb r ON l.user_id = r.user_id AND r.x > l.x),
        |f AS (SELECT user_id, quantile_cont(s, 0.5) AS ts_slope,
        |    count(*) AS n_pairs FROM p GROUP BY 1),
        |i AS (SELECT bb.user_id, f.ts_slope, f.n_pairs,
        |    quantile_cont(bb.y - f.ts_slope * bb.x, 0.5) AS ts_intercept
        |  FROM bb JOIN f USING (user_id) GROUP BY 1, 2, 3)
        |SELECT user_id, round(ts_slope, 6) AS ts_slope,
        |  round(ts_intercept, 6) AS ts_intercept, n_pairs
        |FROM i ORDER BY 1""".stripMargin,

    "q144_vocab" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |v AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens, count(*) AS n_types,
        |    sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        |  FROM tf GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |  round(n_types::DOUBLE / n_tokens, 6) AS ttr,
        |  round(n_hapax::DOUBLE / n_types, 6) AS hapax_ratio
        |FROM v ORDER BY 1""".stripMargin,

    // rank ties broken by term asc in BOTH the top-K cut and the ranking
    "q145_zipf" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |t AS (SELECT unnest(ws) AS term FROM w),
        |tf AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
        |top AS (SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT 100),
        |r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rank
        |  FROM top),
        |s AS (SELECT count(*)::DOUBLE AS n,
        |    sum(ln(rank::DOUBLE)) AS sx, sum(ln(freq::DOUBLE)) AS sy,
        |    sum(ln(rank::DOUBLE) * ln(freq::DOUBLE)) AS sxy,
        |    sum(ln(rank::DOUBLE) * ln(rank::DOUBLE)) AS sxx,
        |    max(freq) AS max_freq FROM r)
        |SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
        |  n::BIGINT AS n_terms, max_freq
        |FROM s""".stripMargin,

    // product-limit via exp(sum(ln(1 - d/n))) in identical term order;
    // a d = n time zeroes the curve from there on
    "q146_km" ->
      """WITH s AS (SELECT user_id, event_type,
        |    min(date_trunc('day', ts)) AS fd, max(date_trunc('day', ts)) AS ld
        |  FROM events GROUP BY 1, 2),
        |subj AS (SELECT event_type, datediff('day', fd, ld) AS t,
        |    CASE WHEN ld < TIMESTAMP '2024-01-28 00:00:00' THEN 1 ELSE 0 END AS e
        |  FROM s),
        |pt AS (SELECT event_type, t, sum(e) AS d, count(*) AS c
        |  FROM subj GROUP BY 1, 2),
        |ar AS (SELECT event_type, t, d,
        |    sum(c) OVER (PARTITION BY event_type)
        |      - sum(c) OVER (PARTITION BY event_type ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + c AS n_risk
        |  FROM pt),
        |ev AS (SELECT * FROM ar WHERE d > 0),
        |fin AS (SELECT event_type, t, n_risk, d,
        |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w = 1
        |      THEN 0.0
        |      ELSE exp(sum(CASE WHEN d < n_risk
        |        THEN ln(1.0 - d::DOUBLE / n_risk) END) OVER w) END AS survival
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, t::BIGINT AS t, n_risk::BIGINT AS n_risk,
        |  d::BIGINT AS d, round(survival, 6) AS survival
        |FROM fin ORDER BY 1, 2""".stripMargin,

    // exact interpolated quantile band, inclusive trim, clamped winsor
    "q147_trimmed_mean" ->
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS qlo, quantile_cont(value, 0.95) AS qhi
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT e.event_type, round(avg(e.value), 6) AS mean,
        |  round(avg(CASE WHEN e.value BETWEEN b.qlo AND b.qhi THEN e.value END), 6)
        |    AS trimmed_mean,
        |  round(avg(greatest(b.qlo, least(b.qhi, e.value))), 6) AS winsor_mean,
        |  count(*) AS n,
        |  count(CASE WHEN e.value BETWEEN b.qlo AND b.qhi THEN 1 END) AS n_kept
        |FROM events e JOIN b USING (event_type)
        |WHERE e.value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q93's decomposition replayed, then median/MAD robust z on the
    // remainder (quantile_cont parity), 3.0 cut. Daily sums run in
    // integer cents (matching the Spark head) so both engines start from
    // the identical exact value regardless of accumulation order.
    "q148_seasonal_esd" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) / 100.0 AS v
        |  FROM events GROUP BY 1,2),
        |i AS (SELECT user_id, d, v::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1) % 7 AS pos,
        |    CASE WHEN count(v) OVER f = 7 THEN avg(v) OVER f END AS trend
        |  FROM daily
        |  WINDOW f AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d2 AS (SELECT *, y - trend AS det FROM i),
        |sr AS (SELECT user_id, pos, avg(det) AS s_raw FROM d2 GROUP BY 1,2),
        |c AS (SELECT user_id, avg(s_raw) AS ctr FROM sr GROUP BY 1),
        |rem AS (SELECT d2.user_id, floor(epoch(d))::BIGINT AS d_s,
        |    y - trend - (s_raw - ctr) AS rem
        |  FROM d2 JOIN sr USING (user_id, pos) JOIN c USING (user_id)
        |  WHERE y - trend - (s_raw - ctr) IS NOT NULL),
        |m AS (SELECT user_id, quantile_cont(rem, 0.5) AS med FROM rem GROUP BY 1),
        |md AS (SELECT r.user_id, quantile_cont(abs(r.rem - m.med), 0.5) AS mad
        |  FROM rem r JOIN m USING (user_id) GROUP BY 1)
        |SELECT r.user_id, r.d_s, round(r.rem, 6) AS remainder,
        |  round(m.med, 6) AS med, round(md.mad, 6) AS mad,
        |  round(CASE WHEN md.mad > 0
        |    THEN 0.6745 * (r.rem - m.med) / md.mad END, 6) AS robust_z,
        |  coalesce(abs(CASE WHEN md.mad > 0
        |    THEN 0.6745 * (r.rem - m.med) / md.mad END) > 3.0, false) AS is_outlier
        |FROM rem r JOIN m USING (user_id) JOIN md USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // lower weighted median: first value whose 2*cumw reaches the total
    "q149_weighted_median" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    avg(value) AS m, count(*) AS c FROM events GROUP BY 1, 2),
        |pv AS (SELECT user_id, m::DOUBLE AS v, sum(c::DOUBLE) AS w
        |  FROM daily WHERE m IS NOT NULL GROUP BY 1, 2),
        |cw AS (SELECT user_id, v,
        |    sum(w) OVER (PARTITION BY user_id ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cwv,
        |    sum(w) OVER (PARTITION BY user_id) AS tw
        |  FROM pv)
        |SELECT user_id,
        |  round(min(CASE WHEN cwv * 2 >= tw THEN v END), 6) AS weighted_median,
        |  round(max(tw), 6) AS total_w
        |FROM cw GROUP BY 1 ORDER BY 1""".stripMargin,

    // G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)), i = ascending rank
    "q150_gini" ->
      """WITH s AS (SELECT user_id, value::DOUBLE AS v FROM events
        |  WHERE value IS NOT NULL AND value >= 0),
        |r AS (SELECT user_id, v,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY v))::DOUBLE AS i
        |  FROM s),
        |g AS (SELECT user_id,
        |    (2.0 * sum(i * v) - (count(*) + 1) * sum(v)) / (count(*) * sum(v)) AS gg,
        |    count(*) AS n, sum(v) AS tot
        |  FROM r GROUP BY 1)
        |SELECT user_id, round(CASE WHEN tot > 0 THEN gg END, 6) AS gini, n
        |FROM g ORDER BY 1""".stripMargin,

    // S = sum of pairwise signs (exact integer); Z with the continuity
    // correction, no tie correction (pinned)
    "q151_mann_kendall" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(value) AS v FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, epoch_us(day) AS t, v::DOUBLE AS y
        |  FROM daily WHERE v IS NOT NULL),
        |p AS (SELECT l.user_id, sign(r.y - l.y) AS sg
        |  FROM b l JOIN b r ON l.user_id = r.user_id AND r.t > l.t),
        |sa AS (SELECT user_id, sum(sg)::BIGINT AS s FROM p GROUP BY 1),
        |nn AS (SELECT user_id, count(*) AS n FROM b GROUP BY 1)
        |SELECT sa.user_id, sa.s,
        |  round(CASE WHEN nn.n >= 2 THEN (sa.s - sign(sa.s::DOUBLE))
        |    / sqrt(nn.n * (nn.n - 1) * (2 * nn.n + 5) / 18.0) END, 6) AS z,
        |  nn.n
        |FROM sa JOIN nn USING (user_id) ORDER BY 1""".stripMargin,

    // W1 on integer cents: sum |sr*nc - sc*nr| * gap_cents is EXACT integer
    // arithmetic; floats only in the single final division
    "q152_wasserstein" ->
      """WITH t AS (SELECT user_id,
        |    CAST(round(value::DOUBLE * 100) AS BIGINT) AS v,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS ir,
        |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS ic
        |  FROM events WHERE value IS NOT NULL),
        |pv AS (SELECT user_id, v, sum(ir)::BIGINT AS cr, sum(ic)::BIGINT AS cc
        |  FROM t GROUP BY 1, 2),
        |cum AS (SELECT user_id,
        |    (sum(cr) OVER (PARTITION BY user_id ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sr,
        |    (sum(cc) OVER (PARTITION BY user_id ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sc,
        |    (sum(cr) OVER (PARTITION BY user_id))::BIGINT AS nr,
        |    (sum(cc) OVER (PARTITION BY user_id))::BIGINT AS nc,
        |    lead(v) OVER (PARTITION BY user_id ORDER BY v) - v AS gap
        |  FROM pv)
        |SELECT user_id,
        |  round((sum(CASE WHEN gap IS NOT NULL
        |      THEN abs(sr * nc - sc * nr) * gap ELSE 0 END))::DOUBLE
        |    / (max(nr) * max(nc))::DOUBLE / 100, 6) AS w1,
        |  max(nr)::BIGINT AS n_ref, max(nc)::BIGINT AS n_cur
        |FROM cum WHERE nr > 0 AND nc > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    // average ranks (row_number averaged within the tied value group), then
    // Pearson over ranks in closed form
    "q153_spearman" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(value) AS x, count(*) AS y FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, x::DOUBLE AS x, y::DOUBLE AS y FROM daily
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |r1 AS (SELECT *, (row_number() OVER (PARTITION BY user_id ORDER BY x))::DOUBLE AS rnx
        |  FROM b),
        |r2 AS (SELECT *, avg(rnx) OVER (PARTITION BY user_id, x) AS rxa FROM r1),
        |r3 AS (SELECT *, (row_number() OVER (PARTITION BY user_id ORDER BY y))::DOUBLE AS rny
        |  FROM r2),
        |r4 AS (SELECT *, avg(rny) OVER (PARTITION BY user_id, y) AS rya FROM r3),
        |g AS (SELECT user_id, count(*)::DOUBLE AS n,
        |    sum(rxa) AS sx, sum(rya) AS sy, sum(rxa*rxa) AS sxx,
        |    sum(rya*rya) AS syy, sum(rxa*rya) AS sxy
        |  FROM r4 GROUP BY 1)
        |SELECT user_id,
        |  round(CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0
        |    THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) END, 6)
        |    AS spearman_rho,
        |  n::BIGINT AS n
        |FROM g ORDER BY 1""".stripMargin,

    // MI/entropies from exact integer cell counts; DuckDB dayofweek = Spark
    // dayofweek - 1, so shift to match (Sun=1..Sat=7 in Spark)
    "q154_mutual_info" ->
      """WITH cells AS (SELECT event_type AS a, dayofweek(ts) + 1 AS b,
        |    count(*) AS c
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c)::BIGINT AS ca FROM cells GROUP BY 1),
        |mb AS (SELECT b, sum(c)::BIGINT AS cb FROM cells GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS n FROM cells),
        |mi AS (SELECT sum((c / n::DOUBLE) * ln(c * n::DOUBLE / (ca * cb))) AS mi,
        |    count(*) AS n_cells
        |  FROM cells JOIN ma USING (a) JOIN mb USING (b), tot),
        |ha AS (SELECT -sum((ca / n::DOUBLE) * ln(ca / n::DOUBLE)) AS h_a
        |  FROM ma, tot),
        |hb AS (SELECT -sum((cb / n::DOUBLE) * ln(cb / n::DOUBLE)) AS h_b
        |  FROM mb, tot)
        |SELECT round(mi.mi, 6) AS mi, round(ha.h_a, 6) AS h_a,
        |  round(hb.h_b, 6) AS h_b,
        |  round(CASE WHEN least(ha.h_a, hb.h_b) > 0
        |    THEN mi.mi / least(ha.h_a, hb.h_b) END, 6) AS mi_norm,
        |  mi.n_cells, tot.n
        |FROM mi, ha, hb, tot""".stripMargin,

    // q127's binary-exact decay-0.5 recursion, then one-step-ahead +/-3
    // sigma limits and breach flags
    "q155_control_chart" ->
      """WITH RECURSIVE daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(round(value * 100)::BIGINT) / 100.0 AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, floor(epoch(day))::BIGINT AS day_sec, v::DOUBLE AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM daily),
        |rec AS (
        |  SELECT user_id, rn, day_sec, y, 1.0::DOUBLE AS sw, 1.0::DOUBLE AS sw2,
        |    y AS swx, y*y AS swx2, 1 AS nobs
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, s.day_sec, s.y,
        |    0.5*rec.sw + 1.0, 0.25*rec.sw2 + 1.0,
        |    0.5*rec.swx + s.y, 0.5*rec.swx2 + s.y*s.y, rec.nobs + 1
        |  FROM rec JOIN r s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1),
        |st AS (SELECT user_id, rn, day_sec, y, swx / sw AS m,
        |    CASE WHEN nobs >= 2 AND sw*sw - sw2 > 0 THEN
        |      sqrt((sw*sw / (sw*sw - sw2)) * (swx2/sw - (swx/sw)*(swx/sw))) END AS sd
        |  FROM rec),
        |lg AS (SELECT user_id, day_sec, y,
        |    lag(m) OVER (PARTITION BY user_id ORDER BY rn) AS center,
        |    3.0 * lag(sd) OVER (PARTITION BY user_id ORDER BY rn) AS half
        |  FROM st)
        |SELECT user_id, day_sec, round(y, 6) AS v, round(center, 6) AS center,
        |  round(half, 6) AS half,
        |  coalesce(abs(y - center) > half, false) AS breach
        |FROM lg ORDER BY 1, 2""".stripMargin,

    // fixed confidence bins floor(p*10) clamped; Brier + base rate ride the
    // same pass
    "q156_ece" ->
      """WITH st AS (SELECT min(value) AS lo, max(value) AS hi FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |b AS (SELECT CASE WHEN st.hi = st.lo THEN 0.0
        |      ELSE (value - st.lo) / (st.hi - st.lo) END AS p,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events, st WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |bb AS (SELECT least(9, greatest(0, CAST(floor(p * 10) AS BIGINT))) AS bin,
        |    p, y FROM b),
        |per AS (SELECT bin, count(*) AS nb, avg(y) AS acc, avg(p) AS conf
        |  FROM bb GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg((p - y) * (p - y)) AS brier,
        |    avg(y) AS base_rate FROM bb)
        |SELECT round(sum((per.nb::DOUBLE / tot.n) * abs(per.acc - per.conf)), 6) AS ece,
        |  round(max(tot.brier), 6) AS brier,
        |  round(max(tot.base_rate), 6) AS base_rate, max(tot.n)::BIGINT AS n
        |FROM per, tot""".stripMargin,

    // bucket = floor((rn-1)*10/n), rank by (score desc, event_id)
    "q157_gain_table" ->
      """WITH b AS (SELECT value::DOUBLE AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, event_id
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (ORDER BY s DESC, event_id) AS rn,
        |    count(*) OVER () AS n FROM b),
        |bk AS (SELECT CAST(floor((rn - 1) * 10 / n) AS BIGINT) AS bucket, y FROM r),
        |per AS (SELECT bucket, count(*) AS n, sum(y)::BIGINT AS positives
        |  FROM bk GROUP BY 1),
        |f AS (SELECT bucket, n, positives,
        |    (sum(positives) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_positives,
        |    (sum(positives) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |      / (sum(positives) OVER ())::DOUBLE AS cum_capture
        |  FROM per)
        |SELECT bucket, n, positives, cum_positives,
        |  round(cum_capture, 6) AS cum_capture
        |FROM f ORDER BY bucket""".stripMargin,

    // exact integer counts; lift's products go through doubles like the
    // operator (long*long overflows at corpus scale)
    "q158_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d,
        |    event_type AS it FROM events WHERE event_type IS NOT NULL),
        |nb AS (SELECT count(*) AS n_baskets FROM
        |  (SELECT DISTINCT user_id, d FROM items)),
        |supp AS (SELECT it, count(*) AS c FROM items GROUP BY 1),
        |pairs AS (SELECT a.it AS item_a, b.it AS item_b, count(*) AS c_ab
        |  FROM items a JOIN items b
        |    ON a.user_id = b.user_id AND a.d = b.d AND a.it < b.it
        |  GROUP BY 1, 2)
        |SELECT p.item_a, p.item_b, sa.c AS c_a, sb.c AS c_b, p.c_ab,
        |  nb.n_baskets,
        |  round(p.c_ab::DOUBLE / nb.n_baskets, 6) AS support,
        |  round(p.c_ab::DOUBLE / sa.c, 6) AS conf_ab,
        |  round(p.c_ab::DOUBLE / sb.c, 6) AS conf_ba,
        |  round((nb.n_baskets::DOUBLE * p.c_ab) / (sa.c::DOUBLE * sb.c), 6) AS lift
        |FROM pairs p
        |JOIN supp sa ON sa.it = p.item_a
        |JOIN supp sb ON sb.it = p.item_b, nb
        |ORDER BY 1, 2""".stripMargin,

    // q101's tfidf replayed, ranked per doc on round(tfidf, 6) with term
    // tie-break, top 3
    "q159_keywords" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1,2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
        |    tf.tf * (ln((1 + n.n_docs)::DOUBLE / (1 + dft.df)) + 1) AS tfidf
        |  FROM tf JOIN dft USING (term), n),
        |rk AS (SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(tfidf, 6) DESC, term) AS rank
        |  FROM sc)
        |SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf, rank
        |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // DCG/IDCG at k=10 with (score desc, event_id) and (rel desc, event_id)
    // ranks; idcg=0 -> null ndcg
    "q160_ndcg" ->
      """WITH b AS (SELECT user_id, event_id, value::DOUBLE AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS rel
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY s DESC, event_id) AS rs,
        |    row_number() OVER (PARTITION BY user_id ORDER BY rel DESC, event_id) AS ri
        |  FROM b),
        |g AS (SELECT user_id,
        |    sum(CASE WHEN rs <= 10 THEN rel / log2(rs + 1) ELSE 0.0 END) AS dcg,
        |    sum(CASE WHEN ri <= 10 THEN rel / log2(ri + 1) ELSE 0.0 END) AS idcg,
        |    count(*) AS n
        |  FROM r GROUP BY 1)
        |SELECT user_id, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
        |  round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) AS ndcg, n
        |FROM g ORDER BY 1""".stripMargin,

    // rr = 1/rank of the first relevant row, 0 when none; averaged
    "q161_mrr" ->
      """WITH b AS (SELECT user_id, event_id, value::DOUBLE AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS rel
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY s DESC, event_id) AS rk
        |  FROM b),
        |f AS (SELECT user_id, min(CASE WHEN rel > 0 THEN rk END) AS first
        |  FROM r GROUP BY 1)
        |SELECT round(avg(coalesce(1.0 / first, 0.0)), 6) AS mrr,
        |  count(*) AS n_queries, count(first) AS n_hit
        |FROM f""".stripMargin,

    // pooled-variance z from exact integer counts
    "q162_proportion_z" ->
      """WITH b AS (SELECT event_type, ts,
        |    CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS pos
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, sum(pos)::BIGINT AS sr, count(*) AS nr
        |  FROM b WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |c AS (SELECT event_type, sum(pos)::BIGINT AS sc, count(*) AS nc
        |  FROM b WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |j AS (SELECT r.event_type, sr, nr, sc, nc,
        |    sr / nr AS pr, sc / nc AS pc,
        |    (sr + sc) / (nr + nc) AS pool
        |  FROM r JOIN c USING (event_type))
        |SELECT event_type, round(pr, 6) AS rate_ref, round(pc, 6) AS rate_cur,
        |  round(CASE WHEN pool > 0 AND pool < 1 THEN (pr - pc) /
        |    sqrt(pool * (1.0 - pool) * (1.0 / nr + 1.0 / nc)) END, 6) AS z,
        |  nr AS n_ref, nc AS n_cur
        |FROM j ORDER BY 1""".stripMargin,

    "q163_precision_recall" ->
      """WITH b AS (SELECT user_id, event_id, value::DOUBLE AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY s DESC, event_id) AS rk
        |  FROM b),
        |g AS (SELECT user_id,
        |    sum(CASE WHEN rk <= 10 THEN rel ELSE 0 END)::BIGINT AS hits,
        |    sum(rel)::BIGINT AS n_rel
        |  FROM r GROUP BY 1)
        |SELECT user_id, hits, n_rel,
        |  round(hits::DOUBLE / 10, 6) AS precision_k,
        |  round(CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel END, 6) AS recall_k
        |FROM g ORDER BY 1""".stripMargin,

    // ref vocab = distinct types in the doc_id-median first half; OOV rate
    // counts second-half token OCCURRENCES of unseen types
    "q164_vocab_drift" ->
      """WITH m AS (SELECT quantile_cont(doc_id, 0.5) AS md FROM documents),
        |t AS (SELECT (doc_id <= m.md) AS is_ref,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents, m),
        |rv AS (SELECT DISTINCT term FROM t WHERE is_ref),
        |cur AS (SELECT CASE WHEN rv.term IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM t LEFT JOIN rv USING (term) WHERE NOT is_ref)
        |SELECT count(*) AS n_cur_tokens, sum(oov)::BIGINT AS n_oov_tokens,
        |  round(sum(oov)::DOUBLE / count(*), 6) AS oov_rate
        |FROM cur""".stripMargin,

    "q165_json_extract" ->
      """WITH j AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE props IS NOT NULL)
        |SELECT event_type, count(*) AS n, sum(k)::BIGINT AS k_sum,
        |  round(avg(k), 6) AS k_avg, min(k) AS k_min, max(k) AS k_max
        |FROM j WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    // (v_i + v_{i+1})/2 * dt_days via a lead window
    "q166_trapz" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(value) AS v FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, epoch_us(day) AS t, v::DOUBLE AS v FROM daily
        |  WHERE v IS NOT NULL),
        |l AS (SELECT user_id, v,
        |    lead(v) OVER (PARTITION BY user_id ORDER BY t) AS nv,
        |    (lead(t) OVER (PARTITION BY user_id ORDER BY t) - t)::DOUBLE
        |      / 86400000000.0 AS dt
        |  FROM b)
        |SELECT user_id,
        |  round(sum(CASE WHEN nv IS NOT NULL THEN (v + nv) / 2 * dt END), 6)
        |    AS integral,
        |  count(*) AS n_points
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    "q167_rolling_distinct" ->
      """SELECT user_id, event_id,
        |  count(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |    ::INT AS distinct_types_7
        |FROM events WHERE event_type IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,

    // lambda = 1/mean(gap_seconds); D from exact order statistics
    "q168_exp_fit" ->
      """WITH g AS (SELECT user_id,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts)))::DOUBLE / 1000000.0 AS gap
        |  FROM events),
        |gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL AND gap > 0),
        |lm AS (SELECT user_id, 1.0 / avg(gap) AS lambda, count(*) AS n_gaps
        |  FROM gg GROUP BY 1),
        |r AS (SELECT gg.user_id, lm.lambda, lm.n_gaps, gg.gap,
        |    (row_number() OVER (PARTITION BY gg.user_id ORDER BY gg.gap))::DOUBLE AS i,
        |    1.0 - exp(-lm.lambda * gg.gap) AS f
        |  FROM gg JOIN lm USING (user_id))
        |SELECT user_id, round(max(lambda), 6) AS lambda,
        |  round(max(greatest(i / n_gaps - f, f - (i - 1) / n_gaps)), 6) AS ks_stat,
        |  max(n_gaps) AS n_gaps
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // sample variances, pooled-free SE, Welch-Satterthwaite df
    "q169_welch_t" ->
      """WITH r AS (SELECT user_id, avg(value) AS m1, var_samp(value) AS v1,
        |    count(*) AS n1 FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |c AS (SELECT user_id, avg(value) AS m2, var_samp(value) AS v2,
        |    count(*) AS n2 FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |j AS (SELECT r.user_id, m1, m2, v1 / n1 AS s1, v2 / n2 AS s2, n1, n2
        |  FROM r JOIN c USING (user_id) WHERE n1 >= 2 AND n2 >= 2)
        |SELECT user_id, round((m1 - m2) / sqrt(s1 + s2), 6) AS t,
        |  round((s1 + s2) * (s1 + s2)
        |    / (s1 * s1 / (n1 - 1) + s2 * s2 / (n2 - 1)), 6) AS df,
        |  n1, n2
        |FROM j ORDER BY 1""".stripMargin,

    // q78's corr-based acf at lags 1..5, then the portmanteau sum
    "q170_ljung_box" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |nn AS (SELECT user_id, count(*) AS n FROM daily GROUP BY 1),
        |l AS (SELECT user_id, v,
        |    lag(v,1) OVER w AS l1, lag(v,2) OVER w AS l2, lag(v,3) OVER w AS l3,
        |    lag(v,4) OVER w AS l4, lag(v,5) OVER w AS l5
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, corr(v, l1) AS a1, corr(v, l2) AS a2,
        |    corr(v, l3) AS a3, corr(v, l4) AS a4, corr(v, l5) AS a5
        |  FROM l GROUP BY 1),
        |st AS (SELECT user_id, lag, acf FROM (
        |  SELECT user_id, 1::BIGINT AS lag, a1 AS acf FROM a
        |  UNION ALL SELECT user_id, 2::BIGINT, a2 FROM a
        |  UNION ALL SELECT user_id, 3::BIGINT, a3 FROM a
        |  UNION ALL SELECT user_id, 4::BIGINT, a4 FROM a
        |  UNION ALL SELECT user_id, 5::BIGINT, a5 FROM a)),
        |g AS (SELECT st.user_id, nn.n,
        |    sum(acf * acf / (nn.n - lag)) AS s, count(acf) AS n_lags
        |  FROM st JOIN nn USING (user_id) GROUP BY 1, 2)
        |SELECT user_id, round(n * (n + 2) * s, 6) AS q_stat, n, n_lags
        |FROM g ORDER BY 1""".stripMargin,

    // centered conditional LS via Cramer's rule over five moment sums
    "q171_ar2" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT user_id, d,
        |    v - avg(v) OVER (PARTITION BY user_id) AS y
        |  FROM daily WHERE v IS NOT NULL),
        |l AS (SELECT user_id, y,
        |    lag(y, 1) OVER w AS x1, lag(y, 2) OVER w AS x2
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |ll AS (SELECT * FROM l WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
        |f AS (SELECT user_id,
        |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
        |    sum(y * x1) AS s01, sum(y * x2) AS s02, count(*) AS n_obs
        |  FROM ll GROUP BY 1),
        |ph AS (SELECT user_id, n_obs,
        |    CASE WHEN s11 * s22 - s12 * s12 > 0 THEN
        |      (s01 * s22 - s02 * s12) / (s11 * s22 - s12 * s12) END AS phi1,
        |    CASE WHEN s11 * s22 - s12 * s12 > 0 THEN
        |      (s11 * s02 - s12 * s01) / (s11 * s22 - s12 * s12) END AS phi2
        |  FROM f),
        |e AS (SELECT ll.user_id, ph.phi1, ph.phi2, ph.n_obs,
        |    ll.y - ph.phi1 * ll.x1 - ph.phi2 * ll.x2 AS r
        |  FROM ll JOIN ph USING (user_id))
        |SELECT user_id, round(max(phi1), 6) AS phi1, round(max(phi2), 6) AS phi2,
        |  round(sqrt(avg(r * r)), 6) AS rmse, max(n_obs) AS n_obs
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-weekday sign pairs pooled: S = sum S_g, Var = sum n(n-1)(2n+5)/18
    "q172_seasonal_mk" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(value) AS v FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, dayofweek(day) + 1 AS dow, epoch_us(day) AS t,
        |    v::DOUBLE AS y FROM daily WHERE v IS NOT NULL),
        |p AS (SELECT l.user_id, l.dow, sign(r.y - l.y) AS sg
        |  FROM b l JOIN b r ON l.user_id = r.user_id AND l.dow = r.dow
        |    AND r.t > l.t),
        |sg AS (SELECT user_id, dow, sum(sg)::BIGINT AS s FROM p GROUP BY 1, 2),
        |nn AS (SELECT user_id, dow, count(*) AS n FROM b GROUP BY 1, 2),
        |g AS (SELECT sg.user_id, sum(sg.s)::BIGINT AS s_total,
        |    sum(nn.n * (nn.n - 1) * (2 * nn.n + 5) / 18.0) AS var,
        |    count(*) AS n_seasons
        |  FROM sg JOIN nn USING (user_id, dow) GROUP BY 1)
        |SELECT user_id, s_total,
        |  round(CASE WHEN var > 0 THEN
        |    (s_total - sign(s_total::DOUBLE)) / sqrt(var) END, 6) AS z,
        |  n_seasons
        |FROM g ORDER BY 1""".stripMargin,

    // the q114 moment-sum shape with an arbitrary regressor
    "q173_rolling_beta" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    count(*)::DOUBLE AS x, sum(value) AS y FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, day, x, y::DOUBLE AS yy,
        |    count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) OVER w AS c,
        |    sum(x) OVER w AS sx, sum(y::DOUBLE) OVER w AS sy,
        |    sum(x * y::DOUBLE) OVER w AS sxy, sum(x * x) OVER w AS sxx
        |  FROM daily
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT user_id, floor(epoch(day))::BIGINT AS day_sec,
        |  round(CASE WHEN c = 14 AND 14.0 * sxx - sx * sx > 0 THEN
        |    (14.0 * sxy - sx * sy) / (14.0 * sxx - sx * sx) END, 6) AS rolling_beta
        |FROM m ORDER BY 1, 2""".stripMargin,

    "q174_transitions" ->
      """WITH s AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events WHERE event_type IS NOT NULL),
        |p AS (SELECT event_type AS from_type, next_type, count(*) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, sum(n)::BIGINT AS n_from FROM p GROUP BY 1)
        |SELECT p.from_type, p.next_type, p.n, f.n_from,
        |  round(p.n::DOUBLE / f.n_from, 6) AS p
        |FROM p JOIN f USING (from_type)
        |ORDER BY 1, 2""".stripMargin,

    "q175_corr_matrix" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, event_type,
        |    sum(value) AS v FROM events WHERE event_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  round(corr(a.v, b.v), 6) AS corr, count(*) AS n_days
        |FROM daily a JOIN daily b
        |  ON a.d = b.d AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // H = sum (n/nt) * (-ln(n/nf)) over transition cells
    "q176_seq_entropy" ->
      """WITH s AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events WHERE event_type IS NOT NULL),
        |p AS (SELECT event_type AS f, next_type AS t, count(*) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT f, sum(n)::BIGINT AS nf FROM p GROUP BY 1),
        |tt AS (SELECT sum(n)::BIGINT AS nt FROM p)
        |SELECT round(sum((p.n::DOUBLE / tt.nt) * (-ln(p.n::DOUBLE / ft.nf))), 6)
        |    AS entropy_rate,
        |  count(*) AS n_cells, max(tt.nt) AS n_transitions
        |FROM p JOIN ft USING (f), tt""".stripMargin,

    // B = (sd_pop - mu)/(sd_pop + mu) over positive inter-event gaps
    "q177_burstiness" ->
      """WITH g AS (SELECT user_id,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts)))::DOUBLE / 1000000.0 AS gap
        |  FROM events),
        |gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL AND gap > 0),
        |m AS (SELECT user_id, avg(gap) AS mu, stddev_pop(gap) AS sd,
        |    count(*) AS n_gaps FROM gg GROUP BY 1)
        |SELECT user_id,
        |  round(CASE WHEN sd + mu > 0 THEN (sd - mu) / (sd + mu) END, 6)
        |    AS burstiness,
        |  round(mu, 6) AS mean_gap, n_gaps
        |FROM m ORDER BY 1""".stripMargin,

    "q178_fan_chart" ->
      """SELECT event_type, date_trunc('day', ts) AS d,
        |  round(quantile_cont(value, 0.1), 6) AS p10,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.75), 6) AS p75,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  count(*) AS n
        |FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // average ranks over the pooled sample; U = R1 - n1(n1+1)/2
    "q179_mann_whitney" ->
      """WITH b AS (SELECT user_id, value::DOUBLE AS v,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS g
        |  FROM events WHERE value IS NOT NULL),
        |r1 AS (SELECT *, (row_number() OVER (PARTITION BY user_id ORDER BY v))::DOUBLE AS rn
        |  FROM b),
        |r2 AS (SELECT *, avg(rn) OVER (PARTITION BY user_id, v) AS rk FROM r1),
        |g AS (SELECT user_id, sum(CASE WHEN g = 1 THEN rk END) AS rr1,
        |    sum(g)::BIGINT AS n1, sum(1 - g)::BIGINT AS n2
        |  FROM r2 GROUP BY 1),
        |u AS (SELECT user_id, rr1 - n1 * (n1 + 1) / 2.0 AS u, n1, n2 FROM g)
        |SELECT user_id, round(u, 6) AS u,
        |  round(CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    (u - n1 * n2 / 2.0)
        |    / sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0) END, 6) AS z,
        |  n1, n2
        |FROM u ORDER BY 1""".stripMargin,

    // record iff v >= running max (ties re-count, pinned)
    "q180_records" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(value) AS v FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, d, v,
        |    CASE WHEN v >= max(v) OVER (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    THEN 1 ELSE 0 END AS is_rec
        |  FROM daily)
        |SELECT user_id, sum(is_rec)::BIGINT AS n_records,
        |  max(CASE WHEN is_rec = 1 THEN d END) AS last_record_day,
        |  round(max(v), 6) AS record_value, count(*) AS n_days
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // q101's tfidf summed per doc over tf
    "q181_idf_novelty" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.tf,
        |    tf.tf * (ln((1 + n.n_docs)::DOUBLE / (1 + dft.df)) + 1) AS tfidf
        |  FROM tf JOIN dft USING (term), n)
        |SELECT doc_id, round(sum(tfidf) / sum(tf), 6) AS novelty,
        |  sum(tf)::BIGINT AS n_tokens, count(*) AS n_types
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q182_hour_profile" ->
      """SELECT event_type, extract(hour FROM ts)::INT AS hr,
        |  count(*) AS n, round(avg(value), 6) AS v_avg
        |FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q87's scores, rounded-score argmax with earliest-day tie-break
    "q183_changepoint_loc" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |s AS (SELECT user_id, d,
        |    count(v) OVER l AS cl, count(v) OVER r AS cr,
        |    avg(v) OVER l AS ml, avg(v) OVER r AS mr,
        |    var_samp(v) OVER l / 5 + var_samp(v) OVER r / 5 AS pooled
        |  FROM daily
        |  WINDOW l AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
        |         r AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)),
        |sc AS (SELECT user_id, d,
        |    CASE WHEN cl = 5 AND cr = 5 AND pooled > 0
        |      THEN abs(mr - ml) / sqrt(pooled) END AS score
        |  FROM s),
        |rk AS (SELECT user_id, d, score,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY round(score, 6) DESC, d) AS r
        |  FROM sc WHERE score IS NOT NULL)
        |SELECT user_id, floor(epoch(d))::BIGINT AS break_day_sec,
        |  round(score, 6) AS shift_score
        |FROM rk WHERE r = 1 ORDER BY 1""".stripMargin,

    "q184_drawdown" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(value) AS v FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, v,
        |    max(v) OVER (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v AS dd
        |  FROM daily)
        |SELECT user_id, round(max(dd), 6) AS max_drawdown,
        |  round(max(v), 6) AS peak, count(*) AS n_days
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q185_max_silence" ->
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT user_id, max(gap)::BIGINT AS max_gap_us,
        |  round(max(gap)::DOUBLE / 3600000000.0, 6) AS max_gap_hours,
        |  count(gap) AS n_gaps
        |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "q186_source_mix" ->
      """SELECT source, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS total_chars,
        |  round(avg(n_chars), 6) AS mean_chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM documents WHERE source IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // expected = row_total * col_total / n over exact integer counts
    "q187_lang_source_chi2" ->
      """WITH cells AS (SELECT source, lang, count(*) AS o FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT source, sum(o)::BIGINT AS nr FROM cells GROUP BY 1),
        |ct AS (SELECT lang, sum(o)::BIGINT AS nc FROM cells GROUP BY 1),
        |tt AS (SELECT sum(o)::BIGINT AS n FROM cells),
        |e AS (SELECT cells.o, rt.nr::DOUBLE * ct.nc / tt.n AS ex
        |  FROM cells JOIN rt USING (source) JOIN ct USING (lang), tt)
        |SELECT round(sum((o - ex) * (o - ex) / ex), 6) AS chi2,
        |  count(*) AS n_cells, max(tt.n)::BIGINT AS n
        |FROM e, tt""".stripMargin,

    "q188_dup_rate" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct,
        |  round((count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*), 6)
        |    AS dup_rate
        |FROM documents WHERE source IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q189_revenue_by_nation" ->
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q190_priority_mix" ->
      """SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority,
        |  count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
        |FROM orders WHERE o_orderpriority IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // full count + HAVING over every item: what the engine's two-pass
    // Misra–Gries answers WITHOUT shuffling the tail — exact-equality twin
    "q191_heavy_hitters" ->
      """WITH items AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 10 < 7 THEN 'u' || event_id
        |         ELSE 'hot_' || (event_id % 3) END AS item
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS n_group FROM items GROUP BY 1),
        |c AS (SELECT event_type, item, count(*)::BIGINT AS cnt
        |  FROM items GROUP BY 1, 2)
        |SELECT c.event_type, c.item, c.cnt, g.n_group::BIGINT AS n_group,
        |  greatest(1::BIGINT, CAST(floor(g.n_group / 64.0) AS BIGINT) + 1)
        |    AS threshold
        |FROM c JOIN g USING (event_type)
        |WHERE c.cnt >=
        |  greatest(1::BIGINT, CAST(floor(g.n_group / 64.0) AS BIGINT) + 1)
        |ORDER BY 1, 2""".stripMargin,

    // identical log-bucket formula on the integer cents domain (verified
    // ulp-identical JVM vs DuckDB for all n in [1,10^6], tools/lncheck);
    // rank convention floor(q*(n-1))+1, bucket indexes compared as ints
    "q192_ddsketch" ->
      """WITH c AS (SELECT event_type,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type,
        |    CASE WHEN cents <= 0 THEN -1
        |      ELSE CAST(ceil(ln(cents::DOUBLE) /
        |        ln((1.0+0.02)/(1.0-0.02))) AS BIGINT) END AS bucket
        |  FROM c),
        |g AS (SELECT event_type, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
        |w AS (SELECT event_type, bucket,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM g),
        |q AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q),
        |r AS (SELECT w.event_type, q.q, w.n, w.bucket, w.cum,
        |    CAST(floor(q.q * (w.n - 1)) + 1 AS BIGINT) AS rnk
        |  FROM w CROSS JOIN q)
        |SELECT event_type, q, n::BIGINT AS n,
        |  min(CASE WHEN cum >= rnk THEN bucket END) AS bucket
        |FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    // q129's spectrum + Shannon entropy of the normalized powers; dominant
    // period ranked on the 6-dp-quantized power (same arithmetic rounding
    // as the Spark side) with smallest-period tie-break
    "q193_spectral_entropy" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, v::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1)::DOUBLE AS t
        |  FROM daily),
        |c AS (SELECT user_id, avg(y) AS mu FROM r GROUP BY 1),
        |z AS (SELECT r.user_id, r.t, r.y - c.mu AS z
        |  FROM r JOIN c USING (user_id)),
        |p AS (SELECT unnest([2, 3, 7, 14]) AS period),
        |a AS (SELECT z.user_id, p.period,
        |    sum(z.z * cos(z.t * (2.0 * pi() / p.period))) AS sc,
        |    sum(z.z * sin(z.t * (2.0 * pi() / p.period))) AS ss
        |  FROM z CROSS JOIN p GROUP BY 1, 2),
        |pw AS (SELECT user_id, period, sc*sc + ss*ss AS power FROM a),
        |t AS (SELECT user_id, period, power,
        |    power / sum(power) OVER (PARTITION BY user_id) AS p_share,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY floor(power*1e6 + 0.5) DESC, period ASC) AS dom_rn
        |  FROM pw)
        |SELECT user_id,
        |  round(-sum(CASE WHEN p_share > 0 THEN p_share * ln(p_share)
        |    ELSE 0 END) / ln(count(*)::DOUBLE), 6) AS spectral_entropy,
        |  max(CASE WHEN dom_rn = 1 THEN period END)::INT AS dominant_period
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // strip replayed regex-for-regex (DuckDB needs the 'g' flag where Java
    // replaces all matches by default), then the q91 canonicalizer replay
    "q194_url_scrub" ->
      """WITH u0 AS (SELECT doc_id,
        |  'https://Tr.' || source || '.Example.COM:443/p/' || doc_id ||
        |  '?utm_source=feed&b=' || doc_id || '&utm_campaign=x&a=1' ||
        |  (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM documents),
        |st AS (SELECT doc_id, regexp_replace(regexp_replace(url,
        |  '(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid)=[^&#]*&?', '', 'g'),
        |  '[?&]+(#|$)', '\1') AS scrubbed FROM u0),
        |p AS (SELECT doc_id, scrubbed,
        |  lower(regexp_extract(scrubbed, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(scrubbed, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
        |  regexp_extract(scrubbed, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |  regexp_extract(scrubbed, '\?([^#]*)', 1) AS query
        |  FROM st),
        |q AS (SELECT *, regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        |  lower(regexp_replace(auth, ':[0-9]+$', '')) AS hostp,
        |  coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
        |    x -> x <> '')), '&'), '') AS sq
        |  FROM p)
        |SELECT doc_id, scrubbed,
        |  CASE WHEN scheme = '' THEN NULL ELSE
        |    scheme || '://' || hostp
        |    || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |             OR (scheme = 'https' AND port = '443') THEN ''
        |        ELSE ':' || port END)
        |    || (CASE WHEN path = '' THEN '/' ELSE path END)
        |    || (CASE WHEN sq = '' THEN '' ELSE '?' || sq END)
        |  END AS canon
        |FROM q ORDER BY doc_id""".stripMargin,

    // the sequential LTTB pick replayed with a recursive CTE: same integer
    // bucket boundaries (1-based list indexes = the engine's 0-based + 1),
    // same next-bucket centroid, same abs((px-ax)(y-py)-(px-x)(ay-py))
    // area in the same op order, first-max tie-break via list_position
    "q195_lttb" ->
      """WITH RECURSIVE
        |d AS (SELECT user_id,
        |    CAST(floor(epoch(date_trunc('day', ts))/86400) AS BIGINT) AS d,
        |    CAST(sum(floor(value*100 + 0.5)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, list(d ORDER BY d) AS xs,
        |    list(cents ORDER BY d) AS ys, count(*)::INT AS n
        |  FROM d GROUP BY 1),
        |base AS (SELECT user_id, xs, ys, n, 0 AS k, 1 AS prev,
        |    [1] AS sel FROM s WHERE n > 20),
        |rec AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT user_id, xs, ys, n, k + 1,
        |    ls - 1 + list_position(areas, list_max(areas)),
        |    list_append(sel, ls - 1 + list_position(areas, list_max(areas)))
        |  FROM (
        |    SELECT user_id, xs, ys, n, k, sel, ls,
        |      list_transform(generate_series(ls, le),
        |        i -> abs((px - ax) * (CAST(ys[i] AS DOUBLE) - py)
        |               - (px - CAST(xs[i] AS DOUBLE)) * (ay - py))) AS areas
        |    FROM (
        |      SELECT user_id, xs, ys, n, k, prev, sel,
        |        2 + (k * (n-2)) // 18 AS ls,
        |        1 + ((k+1) * (n-2)) // 18 AS le,
        |        CASE WHEN k = 17 THEN CAST(xs[n] AS DOUBLE)
        |          ELSE CAST(list_sum(xs[(2 + ((k+1)*(n-2)) // 18) :
        |                                (1 + ((k+2)*(n-2)) // 18)]) AS DOUBLE)
        |            / (((k+2)*(n-2)) // 18 - ((k+1)*(n-2)) // 18) END AS ax,
        |        CASE WHEN k = 17 THEN CAST(ys[n] AS DOUBLE)
        |          ELSE CAST(list_sum(ys[(2 + ((k+1)*(n-2)) // 18) :
        |                                (1 + ((k+2)*(n-2)) // 18)]) AS DOUBLE)
        |            / (((k+2)*(n-2)) // 18 - ((k+1)*(n-2)) // 18) END AS ay,
        |        CAST(xs[prev] AS DOUBLE) AS px,
        |        CAST(ys[prev] AS DOUBLE) AS py
        |      FROM rec WHERE k < 18)
        |  )),
        |fin AS (SELECT user_id, xs, ys, list_append(sel, n) AS sel
        |  FROM rec WHERE k = 18),
        |big AS (SELECT user_id, unnest(list_transform(sel, i ->
        |    {'d': xs[i], 'cents': ys[i]}), recursive := true) FROM fin),
        |small AS (SELECT user_id, d, cents FROM d
        |  WHERE user_id IN (SELECT user_id FROM s WHERE n <= 20))
        |SELECT user_id, d, cents FROM big
        |UNION ALL SELECT user_id, d, cents FROM small
        |ORDER BY user_id, d""".stripMargin,

    // the 1h grain computed directly from raw: associative measures +
    // the same log-bucket histogram and rank lookup the promoted sketch
    // must reproduce (epoch floored, not rounded — DuckDB epoch() rounds)
    "q196_sketch_promote" ->
      """WITH c AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS bucket_start,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT event_type, bucket_start, cents,
        |    CASE WHEN cents <= 0 THEN -1
        |      ELSE CAST(ceil(ln(cents::DOUBLE) /
        |        ln((1.0+0.02)/(1.0-0.02))) AS BIGINT) END AS dd
        |  FROM c),
        |g AS (SELECT event_type, bucket_start, dd, count(*) AS cnt
        |  FROM b GROUP BY 1, 2, 3),
        |w AS (SELECT event_type, bucket_start, dd,
        |    sum(cnt) OVER (PARTITION BY event_type, bucket_start ORDER BY dd) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type, bucket_start) AS n
        |  FROM g),
        |p AS (SELECT event_type, bucket_start,
        |    min(CASE WHEN cum >= CAST(floor(0.5*(n-1))+1 AS BIGINT) THEN dd END) AS p50_b,
        |    min(CASE WHEN cum >= CAST(floor(0.95*(n-1))+1 AS BIGINT) THEN dd END) AS p95_b
        |  FROM w GROUP BY 1, 2),
        |m AS (SELECT event_type, bucket_start, count(*) AS cnt,
        |    sum(cents)::BIGINT AS sum_cents, min(cents) AS min_cents,
        |    max(cents) AS max_cents
        |  FROM c GROUP BY 1, 2)
        |SELECT m.event_type, m.bucket_start, m.cnt, m.sum_cents,
        |  m.min_cents, m.max_cents, p.p50_b, p.p95_b
        |FROM m JOIN p USING (event_type, bucket_start)
        |ORDER BY 1, 2""".stripMargin,

    // the identical five magic-mask spreading steps per operand (lateral
    // column aliases), then even|odd<<1 — all 64-bit integer ops
    "q197_zorder" ->
      """WITH base AS (SELECT event_id, user_id::BIGINT AS a,
        |    ((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 60) AS b
        |  FROM events),
        |z AS (SELECT event_id, a, b,
        |  (a & 4294967295) AS a0,
        |  ((a0 | (a0 << 16)) & 281470681808895) AS a1,
        |  ((a1 | (a1 << 8)) & 71777214294589695) AS a2,
        |  ((a2 | (a2 << 4)) & 1085102592571150095) AS a3,
        |  ((a3 | (a3 << 2)) & 3689348814741910323) AS a4,
        |  ((a4 | (a4 << 1)) & 6148914691236517205) AS a5,
        |  (b & 4294967295) AS b0,
        |  ((b0 | (b0 << 16)) & 281470681808895) AS b1,
        |  ((b1 | (b1 << 8)) & 71777214294589695) AS b2,
        |  ((b2 | (b2 << 4)) & 1085102592571150095) AS b3,
        |  ((b3 | (b3 << 2)) & 3689348814741910323) AS b4,
        |  ((b4 | (b4 << 1)) & 6148914691236517205) AS b5
        |  FROM base)
        |SELECT event_id, a, b, (a5 | (b5 << 1)) AS zkey
        |FROM z ORDER BY event_id""".stripMargin,

    // q76's register replay over the trailing range: existing buckets
    // range-join the raw items of their window, then registers + linear
    // counting from first principles; exact distinct rides along
    "q198_sliding_distinct" ->
      s"""WITH raw AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) % 600 AS b,
        |    'u' || (event_id % 97) AS item FROM events),
        |buckets AS (SELECT event_type, b,
        |    count(DISTINCT item) AS bucket_distinct
        |  FROM raw GROUP BY 1, 2),
        |win AS (SELECT bk.event_type, bk.b, r.item
        |  FROM buckets bk JOIN raw r ON r.event_type = bk.event_type
        |    AND r.b BETWEEN bk.b - 1200 AND bk.b),
        |items AS (SELECT DISTINCT event_type, b, item FROM win),
        |h AS (SELECT event_type, b,
        |    ('0x' || substr(md5(item),1,16))::UBIGINT AS u FROM items),
        |bb AS (SELECT event_type, b, (u // 4503599627370496)::BIGINT AS idx,
        |    (u % 4503599627370496)::BIGINT AS r FROM h),
        |regs AS (SELECT event_type, b, idx,
        |    max(CASE WHEN r = 0 THEN 53 ELSE 53 - (CASE $hllBitlenCase END) END) AS reg
        |  FROM bb GROUP BY 1, 2, 3),
        |agg AS (SELECT event_type, b, sum(power(2.0, -reg)) AS sum_present,
        |    count(*) AS n_present FROM regs GROUP BY 1, 2),
        |est AS (SELECT event_type, b, (4096 - n_present) AS zeros,
        |    (0.7213/(1.0+1.079/4096)) * 4096.0 * 4096.0
        |      / (sum_present + (4096 - n_present)) AS e FROM agg),
        |fin AS (SELECT event_type, b,
        |    CASE WHEN e <= 2.5*4096 AND zeros > 0
        |         THEN 4096.0 * ln(4096.0/zeros) ELSE e END AS hll FROM est)
        |SELECT bk.event_type, bk.b AS bucket_start, bk.bucket_distinct,
        |  round(fin.hll, 6) AS window_distinct_est
        |FROM buckets bk JOIN fin ON fin.event_type = bk.event_type AND fin.b = bk.b
        |ORDER BY 1, 2""".stripMargin,

    // power iteration replayed as a recursive CTE: the working table holds
    // iteration it's full rank vector; the recursive term is one join +
    // group-by (aggregation in the recursive term probed OK in DuckDB).
    // Outdegree is exactly 3 by construction, so rank/3.0 is exact.
    "q199_pagerank" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |r AS (
        |  SELECT doc_id AS id, 1.0::DOUBLE/(SELECT count(*) FROM documents) AS pr, 0 AS it FROM documents
        |  UNION ALL
        |  SELECT e.dst, 0.15::DOUBLE/(SELECT count(*) FROM documents) + 0.85*sum(r.pr/3.0), r.it+1
        |  FROM r JOIN e ON e.src = r.id WHERE r.it < 10 GROUP BY e.dst, r.it+1)
        |SELECT id, round(pr * (SELECT count(*) FROM documents), 6) AS rank_norm
        |FROM r WHERE it = 10 ORDER BY id""".stripMargin,

    // deduplicating (UNION, not UNION ALL) recursion keeps the working
    // table bounded by nodes x hops; min(hop) collapses revisits to the
    // BFS distance
    "q200_crawl_depth" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |d AS (
        |  SELECT doc_id AS id, 0 AS hop FROM documents WHERE doc_id < 5
        |  UNION
        |  SELECT e.dst, d.hop + 1 FROM d JOIN e ON e.src = d.id WHERE d.hop < 8)
        |SELECT id, min(hop) AS hop FROM d GROUP BY id ORDER BY id""".stripMargin,

    // each triangle generated once as x<y<z, then fanned to its three
    // vertices; explicit ::DOUBLE so the coefficient never runs through
    // DECIMAL division
    "q201_triangles" ->
      """WITH raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT count(*) FROM documents) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |u AS (SELECT DISTINCT least(s, t) AS x, greatest(s, t) AS y FROM raw WHERE s <> t),
        |deg AS (SELECT id, count(*) AS degree FROM
        |  (SELECT x AS id FROM u UNION ALL SELECT y FROM u) GROUP BY id),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |  FROM u e1 JOIN u e2 ON e2.x = e1.x AND e2.y > e1.y
        |  JOIN u e3 ON e3.x = e1.y AND e3.y = e2.y),
        |pern AS (SELECT id, count(*) AS tri_cnt FROM
        |  (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY id)
        |SELECT deg.id, deg.degree, coalesce(pern.tri_cnt, 0)::BIGINT AS tri_cnt,
        |  round(CASE WHEN deg.degree < 2 THEN 0.0::DOUBLE
        |    ELSE coalesce(pern.tri_cnt, 0)::DOUBLE * 2.0
        |         / (deg.degree * (deg.degree - 1)) END, 6) AS clustering_coeff
        |FROM deg LEFT JOIN pern ON pern.id = deg.id ORDER BY 1""".stripMargin,

    // the routing contract: the tier-served result must equal the raw
    // aggregate — so the oracle IS the raw aggregate
    "q202_tier_route" ->
      """WITH b AS (SELECT user_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS u FROM events
        |  WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704240000)
        |SELECT user_id, (u - u % 3600) AS bucket_start, count(*) AS cnt,
        |  round(sum(value), 6) AS sum_value, round(avg(value), 6) AS avg_value,
        |  round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // quantile_cont == Spark percentile == the engine's block percentile
    // (linear interpolation; exactness through the block path is q62's
    // contract) — so the raw-grain quantile IS the routed-percentile oracle
    "q203_route_pctl" ->
      """WITH b AS (SELECT user_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS u FROM events)
        |SELECT user_id, (u - u % 3600) AS bucket_start,
        |  round(quantile_cont(value, 0.5), 6) AS p50_v,
        |  round(quantile_cont(value, 0.95), 6) AS p95_v,
        |  count(*) AS cnt
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q199's power-iteration CTE x q40's quality formula
    "q204_crawl_priority" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |r AS (
        |  SELECT doc_id AS id, 1.0::DOUBLE/(SELECT count(*) FROM documents) AS pr, 0 AS it FROM documents
        |  UNION ALL
        |  SELECT e.dst, 0.15::DOUBLE/(SELECT count(*) FROM documents) + 0.85*sum(r.pr/3.0), r.it+1
        |  FROM r JOIN e ON e.src = r.id WHERE r.it < 10 GROUP BY e.dst, r.it+1),
        |pr AS (SELECT id, pr * (SELECT count(*) FROM documents) AS rank_norm
        |  FROM r WHERE it = 10),
        |w AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    len(ws) AS n_tokens,
        |    CASE WHEN len(text) > 0 THEN (len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))::DOUBLE / len(text) END AS punct_ratio,
        |    CASE WHEN len(ws) > 0 THEN len(list_distinct(ws))::DOUBLE / len(ws) END AS type_token_ratio
        |  FROM w),
        |q AS (SELECT doc_id,
        |    type_token_ratio * (1 - coalesce(punct_ratio, 0)) * least(n_tokens / 20.0, 1.0) AS quality_score
        |  FROM f)
        |SELECT q.doc_id, round(pr.rank_norm, 6) AS rank_norm,
        |  round(q.quality_score, 6) AS quality_score,
        |  round(pr.rank_norm * q.quality_score, 6) AS priority
        |FROM pr JOIN q ON q.doc_id = pr.id ORDER BY q.doc_id""".stripMargin,

    // un-normalized alternating recursion (integer-exact), one reference to
    // the recursive CTE per term; final authorities = A^T h_10; normalized
    // to mean 1.0 at the very end
    "q205_hits" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |r AS (
        |  SELECT doc_id AS id, 1.0::DOUBLE AS h, 0 AS it FROM documents
        |  UNION ALL
        |  SELECT e2.src, sum(a.a), a.it + 1
        |  FROM (SELECT e.dst AS id, sum(r.h) AS a, r.it AS it
        |        FROM r JOIN e ON e.src = r.id WHERE r.it < 6 GROUP BY 1, 3) a
        |  JOIN e e2 ON e2.dst = a.id GROUP BY 1, a.it + 1),
        |hf AS (SELECT id, h FROM r WHERE it = 6),
        |af AS (SELECT e.dst AS id, sum(hf.h) AS a FROM hf JOIN e ON e.src = hf.id GROUP BY 1),
        |n AS (SELECT count(*) AS cnt FROM documents),
        |s AS (SELECT (SELECT sum(h) FROM hf) AS sh, (SELECT sum(a) FROM af) AS sa)
        |SELECT hf.id, round(hf.h / s.sh * n.cnt, 6) AS hub_norm,
        |  round(coalesce(af.a, 0) / s.sa * n.cnt, 6) AS auth_norm
        |FROM hf LEFT JOIN af ON af.id = hf.id, s, n ORDER BY hf.id""".stripMargin,

    // the routing contract again: tier-set re-merge must equal the raw
    // distinct count
    "q206_route_distinct" ->
      """WITH b AS (SELECT user_id, event_type, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS u FROM events)
        |SELECT user_id, (u - u % 3600) AS bucket_start,
        |  count(DISTINCT event_type) AS n_types, count(*) AS cnt,
        |  round(sum(value), 6) AS sum_value
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // calendar-exact self-join on day - 7, never lag(7) over present rows
    "q207_wow" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |           FROM events GROUP BY 1, 2)
        |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.cnt,
        |  p.cnt AS prev_cnt, d.cnt - p.cnt AS delta,
        |  CASE WHEN p.cnt <> 0 THEN round(d.cnt::DOUBLE / p.cnt, 6) END AS ratio
        |FROM d LEFT JOIN d p
        |  ON p.event_type = d.event_type AND p.day = d.day - 7
        |ORDER BY 1, 2""".stripMargin,

    // impact head replayed with a window argmax (tf desc, doc asc);
    // sum(tf) is HUGEINT -> ::BIGINT
    "q208_postings" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |pd AS (SELECT term, doc_id, count(*) AS tf FROM w GROUP BY 1, 2),
        |rk AS (SELECT term, doc_id, tf, row_number()
        |    OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn FROM pd),
        |st AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
        |       FROM pd GROUP BY 1)
        |SELECT st.term, st.df, st.cf, rk.doc_id AS top_doc, rk.tf AS top_tf
        |FROM st JOIN rk ON rk.term = st.term AND rk.rn = 1
        |WHERE st.df >= 5 ORDER BY st.term""".stripMargin,

    // generate_subscripts is 1-based; Spark posexplode is 0-based
    "q209_phrase" ->
      """WITH w AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(ws) AS term,
        |    generate_subscripts(ws, 1) - 1 AS pos FROM w),
        |m AS (SELECT a.doc_id, a.pos FROM p a
        |      JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |      WHERE a.term = 'table' AND b.term = 'hash')
        |SELECT doc_id AS doc, count(*) AS n_matches,
        |  min(pos)::BIGINT AS first_pos
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // wedge self-join centered on the shared neighbor, NOT EXISTS drops
    // already-adjacent pairs; the one division rounded 6 dp both sides
    "q210_common_neighbors" ->
      """WITH raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT count(*) FROM documents) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |u AS (SELECT DISTINCT least(s, t) AS x, greatest(s, t) AS y FROM raw WHERE s <> t),
        |adj AS (SELECT x AS v, y AS n FROM u UNION ALL SELECT y, x FROM u),
        |deg AS (SELECT v, count(*) AS degree FROM adj GROUP BY 1),
        |pairs AS (SELECT a.v AS a, b.v AS b, count(*) AS common
        |          FROM adj a JOIN adj b ON b.n = a.n AND a.v < b.v GROUP BY 1, 2),
        |cand AS (SELECT p.* FROM pairs p WHERE p.common >= 3
        |         AND NOT EXISTS (SELECT 1 FROM u WHERE u.x = p.a AND u.y = p.b))
        |SELECT c.a, c.b, c.common::BIGINT AS common,
        |  round(c.common::DOUBLE / (da.degree + db.degree - c.common), 6) AS nbr_jaccard
        |FROM cand c JOIN deg da ON da.v = c.a JOIN deg db ON db.v = c.b
        |ORDER BY 1, 2""".stripMargin,

    "q211_season_detect" -> seasonDetectSql,

    // the documents table IS the draw-index domain (doc_id contiguous
    // 0..n-1 at every sf); replicate means are exact (int64 sum / one
    // division), so quantile_cont sees bit-identical inputs
    "q212_bootstrap_ci" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |grid AS (SELECT r.range AS rep, d0.doc_id AS i
        |         FROM range(0, 200) r, documents d0),
        |draws AS (SELECT rep, (('0x' || substr(md5(concat_ws(':', 'bs1', rep, i)), 1, 15))::BIGINT
        |    % (SELECT n FROM n)) AS idx FROM grid),
        |means AS (SELECT rep, sum(d.n_chars)::DOUBLE / (SELECT n FROM n) AS boot_mean
        |          FROM draws JOIN documents d ON d.doc_id = draws.idx GROUP BY 1)
        |SELECT count(*) AS b,
        |  round(quantile_cont(boot_mean, 0.025), 6) AS ci_lo,
        |  round(quantile_cont(boot_mean, 0.975), 6) AS ci_hi,
        |  (SELECT round(sum(n_chars)::DOUBLE / (SELECT n FROM n), 6)
        |   FROM documents) AS mean_full
        |FROM means""".stripMargin,

    // suppression + hash noise + clamp, all integer — bit-replayable
    "q213_dp_release" ->
      """WITH c AS (SELECT lang, source, count(*) AS cnt FROM documents
        |           GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT lang, source,
        |  greatest(cnt + (('0x' || substr(md5(concat_ws(':', 'dp1', lang, source)), 1, 15))::BIGINT
        |    % 11) - 5, 10) AS released_count
        |FROM c ORDER BY 1, 2""".stripMargin,

    // trigram-set containment inter/|A|: same shingle rule as the engine
    // (1-based list slots = element_at), raw-double threshold both sides
    "q214_containment" ->
      """WITH w AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]) AS sh
        |  FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |          FROM ex a JOIN ex b ON b.s = a.s AND a.doc_id <> b.doc_id
        |          GROUP BY 1, 2),
        |sz AS (SELECT doc_id, len(sh)::BIGINT AS n FROM sh)
        |SELECT i.id_a, i.id_b, i.inter::BIGINT AS inter, sz.n AS n_a,
        |  round(i.inter::DOUBLE / sz.n, 6) AS containment
        |FROM inter i JOIN sz ON sz.doc_id = i.id_a
        |WHERE i.inter::DOUBLE / sz.n >= 0.08 ORDER BY 1, 2""".stripMargin,

    // lift = (n_ab/B)/((n_a/T)(n_b/T)) in the engine's exact IEEE op order
    "q215_collocations" ->
      """WITH w AS (SELECT list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |wn AS (SELECT ws FROM w WHERE len(ws) > 0),
        |u2 AS (SELECT term, count(*) AS n FROM (SELECT unnest(ws) AS term FROM wn) GROUP BY 1),
        |bi AS (SELECT ws[i] AS term_a, ws[i+1] AS term_b, count(*) AS n_ab
        |       FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM wn WHERE len(ws) >= 2)
        |       GROUP BY 1, 2 HAVING count(*) >= 20),
        |tot AS (SELECT sum(len(ws))::BIGINT AS t_total,
        |        sum(greatest(len(ws) - 1, 0))::BIGINT AS b_total FROM wn)
        |SELECT bi.term_a, bi.term_b, bi.n_ab::BIGINT AS n_ab,
        |  ua.n::BIGINT AS n_a, ub.n::BIGINT AS n_b,
        |  (bi.n_ab::DOUBLE / tot.b_total::DOUBLE) /
        |    ((ua.n::DOUBLE / tot.t_total::DOUBLE) * (ub.n::DOUBLE / tot.t_total::DOUBLE)) AS lift
        |FROM bi JOIN u2 ua ON ua.term = bi.term_a
        |        JOIN u2 ub ON ub.term = bi.term_b, tot
        |ORDER BY 1, 2""".stripMargin,

    // run collapse via lag-change flag + running sum; null state is a state
    // (IS NOT DISTINCT FROM = Spark's <=>); valid_to = next run's start
    "q216_scd2" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
        |         THEN 0 ELSE 1 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS version FROM f),
        |r AS (SELECT user_id, version::BIGINT AS version, min(event_type) AS state,
        |    min(ts) AS vf, count(*) AS n_obs
        |  FROM v GROUP BY 1, 2)
        |SELECT user_id, state, version,
        |  floor(epoch(vf))::BIGINT AS valid_from,
        |  floor(epoch(lead(vf) OVER (PARTITION BY user_id ORDER BY version)))::BIGINT AS valid_to,
        |  n_obs::BIGINT AS n_obs
        |FROM r ORDER BY user_id, version""".stripMargin,

    "q217_benford" -> benfordSql,

    // priority q = w/u, u = (h+1)/2^60 — the same two IEEE ops; rank cut
    // is (priority DESC, doc_id), bit-deterministic
    "q218_weighted_sample" ->
      """WITH p AS (SELECT doc_id, n_chars AS weight,
        |    n_chars::DOUBLE / ((('0x' || substr(md5(concat_ws(':', 'ps1', doc_id)), 1, 15))::BIGINT + 1)::DOUBLE
        |      / 1152921504606846976.0) AS priority
        |  FROM documents WHERE n_chars > 0),
        |t AS (SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT 100)
        |SELECT doc_id, weight, priority FROM t ORDER BY doc_id""".stripMargin,

    // q112's SAX pipeline at alphabet 2 / 5-day frames, grouped by word
    "q219_sax_motifs" ->
      """WITH m AS (SELECT user_id, avg(value) AS mu, stddev_pop(value) AS sd
        |    FROM events GROUP BY 1),
        |z AS (SELECT e.user_id,
        |    epoch(date_trunc('minute', e.ts))::BIGINT
        |      - epoch(date_trunc('minute', e.ts))::BIGINT % 432000 AS frame_start,
        |    CASE WHEN m.sd > 0 THEN (e.value - m.mu) / m.sd ELSE 0 END AS z
        |  FROM events e JOIN m USING (user_id)),
        |p AS (SELECT user_id, frame_start, round(avg(z),6) AS paa FROM z GROUP BY 1,2),
        |s AS (SELECT user_id, frame_start,
        |    CASE WHEN paa < 0.0 THEN 'a' ELSE 'b' END AS sym FROM p),
        |wd AS (SELECT user_id, string_agg(sym, '' ORDER BY frame_start) AS sax_word,
        |    count(*) AS n_frames FROM s GROUP BY 1)
        |SELECT sax_word, count(*) AS n_series,
        |  min(user_id) AS member_min, max(user_id) AS member_max,
        |  min(n_frames)::BIGINT AS min_frames, max(n_frames)::BIGINT AS max_frames
        |FROM wd GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin,

    // rank-cut tail membership (top-500 by value desc, event_id), then the
    // same fixed-order share/lift arithmetic
    "q220_tail_lift" ->
      """WITH t AS (SELECT event_type FROM events ORDER BY value DESC, event_id LIMIT 500),
        |tc AS (SELECT event_type, count(*) AS tail_cnt FROM t GROUP BY 1),
        |o AS (SELECT event_type, count(*) AS total_cnt FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS n_total FROM events)
        |SELECT o.event_type, o.total_cnt::BIGINT AS total_cnt,
        |  coalesce(tc.tail_cnt, 0)::BIGINT AS tail_cnt,
        |  coalesce(tc.tail_cnt, 0)::DOUBLE / 500.0 AS tail_share,
        |  o.total_cnt::DOUBLE / n.n_total::DOUBLE AS overall_share,
        |  CASE WHEN coalesce(tc.tail_cnt, 0) > 0
        |       THEN (coalesce(tc.tail_cnt, 0)::DOUBLE / 500.0)
        |            / (o.total_cnt::DOUBLE / n.n_total::DOUBLE) END AS lift
        |FROM o LEFT JOIN tc USING (event_type), n ORDER BY 1""".stripMargin,

    "q221_kcore" -> kcoreSql(k = 4, rounds = 3),

    "q222_path_trigrams" ->
      """WITH g AS (SELECT user_id, event_type AS s1,
        |    lead(event_type, 1) OVER w AS s2, lead(event_type, 2) OVER w AS s3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT s1 AS step_1, s2 AS step_2, s3 AS step_3,
        |  count(*) AS n_occurrences, count(DISTINCT user_id)::BIGINT AS n_keys
        |FROM g WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3 HAVING count(*) >= 5 ORDER BY 1, 2, 3""".stripMargin,

    // first touch = running first over the user stream, last touch = lag;
    // '(none)' when the conversion opens the stream
    "q223_attribution" ->
      """WITH t AS (SELECT user_id, event_type,
        |    first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS ft,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        |  FROM events)
        |SELECT ft AS first_touch, coalesce(pv, '(none)') AS last_touch,
        |  count(*) AS n_conversions
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // integer dot/norms on raw counts; cosine = dot / (sqrt(ssa)*sqrt(ssb))
    // in the engine's op order (IEEE sqrt is correctly rounded)
    "q224_profile_sim" ->
      """WITH p AS (SELECT event_type AS seg, EXTRACT(hour FROM ts)::INT AS b,
        |    count(*) AS c FROM events GROUP BY 1, 2),
        |n AS (SELECT seg, sum(c * c)::BIGINT AS ss FROM p GROUP BY 1),
        |d AS (SELECT a.seg AS seg_a, b.seg AS seg_b, sum(a.c * b.c)::BIGINT AS dot
        |      FROM p a JOIN p b ON b.b = a.b AND a.seg < b.seg GROUP BY 1, 2)
        |SELECT d.seg_a, d.seg_b, d.dot,
        |  d.dot::DOUBLE / (sqrt(na.ss::DOUBLE) * sqrt(nb.ss::DOUBLE)) AS cosine
        |FROM d JOIN n na ON na.seg = d.seg_a JOIN n nb ON nb.seg = d.seg_b
        |ORDER BY 1, 2""".stripMargin,

    // running max of PRECEDING ends starts a new span when start exceeds
    // it; run ids by running sum — identical window semantics both sides
    "q225_interval_coalesce" ->
      """WITH iv AS (SELECT user_id, event_id,
        |    floor(epoch(ts))::BIGINT AS start_s,
        |    floor(epoch(ts))::BIGINT + (event_id % 7 + 1) * 60 AS end_s
        |  FROM events),
        |f AS (SELECT *, max(end_s) OVER (PARTITION BY user_id
        |    ORDER BY start_s, end_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv),
        |r AS (SELECT *, CASE WHEN pm IS NULL OR start_s > pm THEN 1 ELSE 0 END AS nr
        |  FROM f),
        |s AS (SELECT *, sum(nr) OVER (PARTITION BY user_id
        |    ORDER BY start_s, end_s, event_id ROWS UNBOUNDED PRECEDING) AS run
        |  FROM r)
        |SELECT user_id, run::BIGINT AS span_seq,
        |  min(start_s)::BIGINT AS span_start, max(end_s)::BIGINT AS span_end,
        |  count(*) AS n_intervals
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // per-term floor(1e12/ln(deg)+0.5) is the same BIGINT both engines
    // (ln ulp-identical on integers); the pair score is an integer sum —
    // order-independent, so no float-summation flake is possible
    "q226_adamic_adar" ->
      """WITH raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT count(*) FROM documents) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |u AS (SELECT DISTINCT least(s, t) AS x, greatest(s, t) AS y FROM raw WHERE s <> t),
        |adj AS (SELECT x AS v, y AS n FROM u UNION ALL SELECT y, x FROM u),
        |deg AS (SELECT v, count(*) AS degree FROM adj GROUP BY v),
        |ctr AS (SELECT adj.n AS c, adj.v AS node, w.term
        |  FROM adj JOIN (SELECT v, floor(1e12 / ln(degree) + 0.5)::BIGINT AS term
        |                 FROM deg WHERE degree >= 2) w ON w.v = adj.n),
        |pairs AS (SELECT p.node AS a, q.node AS b,
        |    count(*) AS common, sum(p.term)::BIGINT AS aa_pico
        |  FROM ctr p JOIN ctr q ON p.c = q.c AND p.node < q.node
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT a, b, common, aa_pico, round(aa_pico::DOUBLE / 1e12, 6) AS aa_score
        |FROM pairs LEFT JOIN u ON u.x = pairs.a AND u.y = pairs.b
        |WHERE u.x IS NULL ORDER BY 1, 2""".stripMargin,

    // q199's recursion with restart mass on the seeds only: every node has
    // indegree >= 1 (cycle edge), so the grouped recursion covers all ids
    "q227_ppr" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |r AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id < 5 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END AS pr,
        |    0 AS it FROM documents
        |  UNION ALL
        |  SELECT e.dst,
        |    0.15::DOUBLE * (CASE WHEN e.dst < 5 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END)
        |      + 0.85::DOUBLE * sum(r.pr / 3.0::DOUBLE),
        |    r.it + 1
        |  FROM r JOIN e ON e.src = r.id WHERE r.it < 10 GROUP BY e.dst, r.it + 1)
        |SELECT id, round(pr * 100, 6) AS ppr_pct
        |FROM r WHERE it = 10 ORDER BY id""".stripMargin,

    // the naive all-shared-shingle join IS the oracle for the prefix-
    // filtered join — exactness (no pair dropped by the filter) is the
    // whole contract
    "q228_ppjoin" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM w),
        |d AS (SELECT doc_id, sh, len(sh) AS n FROM s WHERE len(sh) > 0),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM d),
        |ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i2
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, i2 AS inter,
        |  round(i2::DOUBLE / (x.n + y.n - i2), 6) AS jaccard
        |FROM ix JOIN d x ON x.doc_id = id_a JOIN d y ON y.doc_id = id_b
        |WHERE i2::DOUBLE / (x.n + y.n - i2) >= 0.5
        |ORDER BY 1, 2""".stripMargin,

    "q229_path_tree" ->
      """WITH p AS (SELECT '/' || source || '/' || lang || '/d' || (doc_id % 20) AS path,
        |    n_chars FROM documents),
        |x AS (SELECT t.d::INTEGER AS depth,
        |    '/' || array_to_string((string_split(ltrim(path, '/'), '/'))[1:t.d], '/') AS prefix,
        |    n_chars
        |  FROM p CROSS JOIN generate_series(1, 3) t(d))
        |SELECT depth, prefix, count(*) AS cnt, sum(n_chars)::BIGINT AS w_sum
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the direct full-outer diff IS the oracle; the engine must reach the
    // identical set through bucket digests + drill-down
    "q230_table_diff" ->
      """WITH a AS (SELECT event_id, user_id, event_type, value FROM events),
        |b AS (
        |  SELECT event_id, user_id, event_type,
        |    CASE WHEN event_id % 101 = 7 THEN value + 1.0::DOUBLE ELSE value END AS value
        |  FROM events WHERE event_id % 97 <> 13
        |  UNION ALL
        |  SELECT event_id + 10000000, user_id, event_type, value
        |  FROM events WHERE event_id % 103 = 11),
        |j AS (SELECT coalesce(a.event_id, b.event_id) AS event_id,
        |    CASE WHEN b.event_id IS NULL THEN 'deleted'
        |         WHEN a.event_id IS NULL THEN 'added'
        |         WHEN a.value <> b.value OR a.user_id <> b.user_id
        |           OR a.event_type <> b.event_type THEN 'changed'
        |    END AS status
        |  FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
        |SELECT event_id, status FROM j WHERE status IS NOT NULL
        |ORDER BY 1, 2""".stripMargin,

    // shared md5int hash contract (see q31); the '_ALL_' row is the
    // engine's MERGED sketch — the oracle computes the global bottom-k
    // directly, so equality proves sketch mergeability
    "q231_kmv" ->
      """WITH h AS (SELECT DISTINCT source,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents),
        |r AS (SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
        |per AS (SELECT source, count(*) AS nd,
        |    max(CASE WHEN rn = 16 THEN h END) AS h16,
        |    least(count(*), 16)::BIGINT AS sketch_n
        |  FROM r GROUP BY source),
        |g AS (SELECT '_ALL_' AS source, count(*) AS nd,
        |    max(CASE WHEN rng = 16 THEN h END) AS h16,
        |    least(count(*), 16)::BIGINT AS sketch_n
        |  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rng
        |        FROM (SELECT DISTINCT h FROM h))),
        |u AS (SELECT * FROM per UNION ALL SELECT * FROM g)
        |SELECT source, sketch_n, nd::BIGINT AS n_distinct,
        |  round(CASE WHEN nd < 16 THEN nd::DOUBLE
        |    ELSE 15.0::DOUBLE * 1152921504606846976.0 / h16 END, 6) AS est_distinct
        |FROM u ORDER BY source""".stripMargin,

    // three unrolled synchronous rounds; mode-with-min-tie-break is the
    // deterministic LPA variant the engine runs
    "q232_label_prop" ->
      """WITH raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT count(*) FROM documents) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |u AS (SELECT DISTINCT least(s, t) AS x, greatest(s, t) AS y FROM raw WHERE s <> t),
        |adj AS (SELECT x AS v, y AS n FROM u UNION ALL SELECT y, x FROM u),
        |l0 AS (SELECT DISTINCT v AS id, v AS label FROM adj),
        |l1 AS (SELECT v AS id, label FROM (
        |  SELECT adj.v, l0.label, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY adj.v ORDER BY count(*) DESC, l0.label) AS rn
        |  FROM adj JOIN l0 ON l0.id = adj.n GROUP BY adj.v, l0.label) WHERE rn = 1),
        |l2 AS (SELECT v AS id, label FROM (
        |  SELECT adj.v, l1.label, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY adj.v ORDER BY count(*) DESC, l1.label) AS rn
        |  FROM adj JOIN l1 ON l1.id = adj.n GROUP BY adj.v, l1.label) WHERE rn = 1),
        |l3 AS (SELECT v AS id, label FROM (
        |  SELECT adj.v, l2.label, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY adj.v ORDER BY count(*) DESC, l2.label) AS rn
        |  FROM adj JOIN l2 ON l2.id = adj.n GROUP BY adj.v, l2.label) WHERE rn = 1)
        |SELECT id, label FROM l3 ORDER BY id""".stripMargin,

    // slopes are single divisions of exact integers; quantile_cont(0.5)
    // == Spark percentile — interpolation of two identical doubles
    "q233_theil_sen" ->
      """WITH d AS (SELECT user_id,
        |    floor(epoch(ts))::BIGINT // 86400 AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.user_id,
        |    (b.cnt - a.cnt)::DOUBLE / (b.day - a.day)::DOUBLE AS slope
        |  FROM d a JOIN d b ON a.user_id = b.user_id AND a.day < b.day),
        |m AS (SELECT user_id, quantile_cont(slope, 0.5) AS ts_slope FROM p GROUP BY 1),
        |n AS (SELECT user_id, count(*) AS n_points FROM d GROUP BY 1)
        |SELECT n.user_id, n.n_points, round(m.ts_slope, 6) AS ts_slope
        |FROM n LEFT JOIN m ON m.user_id = n.user_id ORDER BY 1""".stripMargin,

    // naive all-pairs Levenshtein IS the oracle for the q-gram-prefiltered
    // join; ASCII normalization aligns DuckDB's byte DP with Spark's
    // code-point DP
    "q234_edit_join" ->
      """WITH s0 AS (SELECT doc_id,
        |    substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 48) AS s
        |  FROM documents WHERE doc_id < 150),
        |c AS (SELECT doc_id, s FROM s0
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(s, 1, 5) || 'X' || substr(s, 7, 42) FROM s0),
        |f AS (SELECT * FROM c WHERE length(s) >= 40)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.s, b.s)::BIGINT AS dist
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 8
        |ORDER BY 1, 2""".stripMargin,

    // bottom-64 per type replayed from the shared md5int contract; the
    // merged bottom-64 comes from the union of the two bottoms (the KMV
    // merge identity), estimates are fixed-order IEEE on exact integers
    "q235_kmv_overlap" ->
      """WITH ud AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR || ':' ||
        |      ((floor(epoch(ts))::BIGINT // 86400))::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM ud),
        |bot AS (SELECT event_type, h FROM r WHERE rn <= 64),
        |nd AS (SELECT event_type, count(*) AS nd FROM ud GROUP BY 1),
        |types AS (SELECT a.event_type AS ta, a.nd AS nd_a, b.event_type AS tb, b.nd AS nd_b
        |  FROM nd a JOIN nd b ON a.event_type < b.event_type),
        |mb AS (SELECT ta, tb, h,
        |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        |  FROM (SELECT DISTINCT t.ta, t.tb, x.h FROM types t
        |        JOIN bot x ON x.event_type IN (t.ta, t.tb))),
        |mk AS (SELECT ta, tb, h FROM mb WHERE rn <= 64),
        |mstat AS (SELECT ta, tb, count(*) AS m_n, max(h) AS hk FROM mk GROUP BY 1, 2),
        |ik AS (SELECT mk.ta, mk.tb, count(*) AS inter_k
        |  FROM mk JOIN bot p ON p.event_type = mk.ta AND p.h = mk.h
        |          JOIN bot q ON q.event_type = mk.tb AND q.h = mk.h
        |  GROUP BY 1, 2),
        |ex AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS exact_inter
        |  FROM ud a JOIN ud b ON a.h = b.h AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t.ta AS type_a, t.tb AS type_b, t.nd_a, t.nd_b,
        |  coalesce(ex.exact_inter, 0)::BIGINT AS exact_inter,
        |  m.m_n::BIGINT AS m_n, coalesce(ik.inter_k, 0)::BIGINT AS inter_k,
        |  round(coalesce(ik.inter_k, 0)::DOUBLE / m.m_n::DOUBLE, 6) AS jaccard_est,
        |  round(CASE WHEN m.m_n < 64 THEN m.m_n::DOUBLE
        |    ELSE 63.0::DOUBLE * 1152921504606846976.0 / m.hk END, 6) AS union_est,
        |  round((coalesce(ik.inter_k, 0)::DOUBLE / m.m_n::DOUBLE) *
        |    (CASE WHEN m.m_n < 64 THEN m.m_n::DOUBLE
        |     ELSE 63.0::DOUBLE * 1152921504606846976.0 / m.hk END), 6) AS inter_est
        |FROM types t
        |JOIN mstat m ON m.ta = t.ta AND m.tb = t.tb
        |LEFT JOIN ik ON ik.ta = t.ta AND ik.tb = t.tb
        |LEFT JOIN ex ON ex.ta = t.ta AND ex.tb = t.tb
        |ORDER BY 1, 2""".stripMargin,

    // identical window triple (running-min / lag / lead) both sides;
    // churn for period p+1 counted off period p's activity
    "q236_growth" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    (floor(epoch(ts))::BIGINT // 86400) // 7 AS p FROM events),
        |f AS (SELECT user_id, p,
        |    min(p) OVER (PARTITION BY user_id) AS fst,
        |    lag(p) OVER (PARTITION BY user_id ORDER BY p) AS prev,
        |    lead(p) OVER (PARTITION BY user_id ORDER BY p) AS nxt
        |  FROM a),
        |mx AS (SELECT max(p) AS maxp FROM a),
        |st AS (SELECT p,
        |    CASE WHEN p = fst THEN 'new' WHEN prev = p - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS status FROM f),
        |act AS (SELECT p, status, count(*) AS n FROM st GROUP BY 1, 2),
        |ch AS (SELECT f.p + 1 AS p, 'churned' AS status, count(*) AS n
        |  FROM f CROSS JOIN mx
        |  WHERE (nxt IS NULL OR nxt > f.p + 1) AND f.p + 1 <= mx.maxp
        |  GROUP BY 1, 2)
        |SELECT p AS week, status, n
        |FROM (SELECT * FROM act UNION ALL SELECT * FROM ch)
        |ORDER BY 1, 2""".stripMargin,

    // exact integer cumulative sums; the class cut compares the same
    // division both engines
    "q237_abc" ->
      """WITH agg AS (SELECT source AS cat, sum(n_chars)::BIGINT AS w_sum
        |  FROM documents GROUP BY 1),
        |c AS (SELECT cat, w_sum,
        |    sum(w_sum) OVER (ORDER BY w_sum DESC, cat ROWS UNBOUNDED PRECEDING) AS cum_w,
        |    sum(w_sum) OVER () AS w_total FROM agg)
        |SELECT cat AS source, w_sum,
        |  round(cum_w::DOUBLE / w_total::DOUBLE, 6) AS cum_share,
        |  CASE WHEN cum_w::DOUBLE / w_total::DOUBLE <= 0.8 THEN 'A'
        |       WHEN cum_w::DOUBLE / w_total::DOUBLE <= 0.95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c ORDER BY 1""".stripMargin,

    // min(CASE …) keeps never-converted users; epoch_us == Spark
    // unix_micros on the cast timestamp; one exact-integer division
    "q238_conversion_latency" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS from_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |e AS (SELECT user_id, epoch_us(ts) AS to_us
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT s.user_id, s.from_us,
        |    min(CASE WHEN e.to_us >= s.from_us THEN e.to_us END) AS to_us
        |  FROM s LEFT JOIN e ON e.user_id = s.user_id GROUP BY 1, 2)
        |SELECT user_id, from_us, to_us,
        |  round((to_us - from_us)::DOUBLE / 1000000.0::DOUBLE, 6) AS latency_s
        |FROM j ORDER BY user_id""".stripMargin,

    // q36's cosine contract, rank-1 both directions, mutuality by self-join
    "q239_rbm" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
        |    list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM c a CROSS JOIN c b WHERE a.vec_id <> b.vec_id
        |    AND sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) > 0),
        |t AS (SELECT qa, qb, sim,
        |    row_number() OVER (PARTITION BY qa ORDER BY sim DESC, qb) AS rk FROM sc),
        |b1 AS (SELECT qa, qb, sim FROM t WHERE rk = 1)
        |SELECT x.qa AS id_a, x.qb AS id_b, round(x.sim, 6) AS sim
        |FROM b1 x JOIN b1 y ON y.qa = x.qb AND y.qb = x.qa
        |WHERE x.qa < x.qb ORDER BY 1, 2""".stripMargin,

    // pure integer Hamilton apportionment — base = floor division,
    // leftover units to the largest remainders (key tie-break)
    "q240_crawl_budget" ->
      """WITH agg AS (SELECT source AS key, sum(n_chars)::BIGINT AS score
        |  FROM documents GROUP BY 1 HAVING sum(n_chars) > 0),
        |t AS (SELECT sum(score) AS s_total FROM agg),
        |b AS (SELECT key, score, (score * 10000) // s_total AS base,
        |    score * 10000 - ((score * 10000) // s_total) * s_total AS rem
        |  FROM agg CROSS JOIN t),
        |l AS (SELECT 10000 - sum(base) AS leftover FROM b),
        |r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, key) AS rk FROM b)
        |SELECT key, score,
        |  (base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END)::BIGINT AS alloc
        |FROM r CROSS JOIN l ORDER BY key""".stripMargin,

    // per-key argmax of the seeded hash per node set (hash DESC, node DESC
    // matches the engine's struct-max tie semantics); moved keys must all
    // land on w4
    "q241_rendezvous" ->
      """WITH k AS (SELECT doc_id AS key FROM documents),
        |s1 AS (SELECT key, n.node,
        |    ('0x' || substr(md5(n.node || ':' || key::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM k CROSS JOIN (VALUES ('w1'), ('w2'), ('w3')) n(node)),
        |b1 AS (SELECT key, node FROM (SELECT key, node,
        |    row_number() OVER (PARTITION BY key ORDER BY h DESC, node DESC) AS rk
        |  FROM s1) WHERE rk = 1),
        |s2 AS (SELECT key, n.node,
        |    ('0x' || substr(md5(n.node || ':' || key::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM k CROSS JOIN (VALUES ('w1'), ('w2'), ('w3'), ('w4')) n(node)),
        |b2 AS (SELECT key, node FROM (SELECT key, node,
        |    row_number() OVER (PARTITION BY key ORDER BY h DESC, node DESC) AS rk
        |  FROM s2) WHERE rk = 1)
        |SELECT b1.node AS node_before, b2.node AS node_after, count(*) AS n
        |FROM b1 JOIN b2 ON b2.key = b1.key
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q229's rollup + a parent equi-join; every share one division of the
    // exact integer sums
    "q242_tree_share" ->
      """WITH p AS (SELECT '/' || source || '/' || lang || '/d' || (doc_id % 20) AS path,
        |    n_chars FROM documents),
        |x AS (SELECT t.d::INTEGER AS depth,
        |    '/' || array_to_string((string_split(ltrim(path, '/'), '/'))[1:t.d], '/') AS prefix,
        |    n_chars
        |  FROM p CROSS JOIN generate_series(1, 3) t(d)),
        |roll AS (SELECT depth, prefix, sum(n_chars)::BIGINT AS w_sum
        |  FROM x GROUP BY 1, 2),
        |r AS (SELECT depth, prefix, w_sum,
        |    CASE WHEN depth = 1 THEN NULL
        |         ELSE regexp_replace(prefix, '/[^/]+$', '') END AS pp FROM roll),
        |tot AS (SELECT sum(w_sum) AS rw FROM roll WHERE depth = 1)
        |SELECT r.depth, r.prefix, r.w_sum,
        |  coalesce(par.w_sum, tot.rw)::BIGINT AS parent_w,
        |  round(r.w_sum::DOUBLE / coalesce(par.w_sum, tot.rw)::DOUBLE, 6) AS parent_share
        |FROM r LEFT JOIN roll par ON par.depth = r.depth - 1 AND par.prefix = r.pp
        |CROSS JOIN tot
        |ORDER BY 1, 2""".stripMargin,

    // integer leaderboard: identical rank order (cnt DESC, key), previous
    // week via a (period+1, key) self-join
    "q243_trending" ->
      """WITH a AS (SELECT event_type,
        |    (floor(epoch(ts))::BIGINT // 86400) // 7 AS week FROM events),
        |c AS (SELECT week, event_type, count(*) AS cnt FROM a GROUP BY 1, 2),
        |rk AS (SELECT week, event_type, cnt,
        |    row_number() OVER (PARTITION BY week ORDER BY cnt DESC, event_type) AS rank
        |  FROM c)
        |SELECT x.week, x.event_type, x.cnt, x.rank,
        |  y.rank AS prev_rank, y.rank - x.rank AS rank_delta
        |FROM rk x LEFT JOIN rk y
        |  ON y.week = x.week - 1 AND y.event_type = x.event_type
        |ORDER BY x.week, x.rank""".stripMargin,

    // Hamilton quotas on stratum sizes + per-stratum seeded-hash rank —
    // the full sample replayed row-for-row
    "q244_stratified" ->
      """WITH d AS (SELECT doc_id, source FROM documents),
        |sz AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS s_total FROM sz),
        |b AS (SELECT source, n, (n * 100) // s_total AS base,
        |    n * 100 - ((n * 100) // s_total) * s_total AS rem
        |  FROM sz CROSS JOIN t),
        |l AS (SELECT 100 - sum(base) AS leftover FROM b),
        |q AS (SELECT source, base + CASE WHEN
        |    row_number() OVER (ORDER BY rem DESC, source) <= l.leftover
        |    THEN 1 ELSE 0 END AS quota
        |  FROM b CROSS JOIN l),
        |r AS (SELECT d.doc_id, d.source,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY ('0x' || substr(md5('ss1:' || d.doc_id::VARCHAR), 1, 15))::BIGINT,
        |        d.doc_id) AS rk
        |  FROM d)
        |SELECT r.doc_id, r.source FROM r JOIN q ON q.source = r.source
        |WHERE r.rk <= q.quota ORDER BY doc_id""".stripMargin,

    // add-1 odds ratio on exact integer counts, q35's tokenizer
    "q245_distinctive" ->
      """WITH tk AS (SELECT (doc_id % 2 = 0) AS a,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> x <> '')) AS word
        |  FROM documents),
        |pw AS (SELECT word,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS y_a,
        |    sum(CASE WHEN a THEN 0 ELSE 1 END)::BIGINT AS y_b
        |  FROM tk GROUP BY 1),
        |t AS (SELECT sum(y_a) AS n_a, sum(y_b) AS n_b FROM pw)
        |SELECT word, y_a, y_b,
        |  round(((y_a + 1)::DOUBLE / (n_a - y_a + 1)::DOUBLE) /
        |        ((y_b + 1)::DOUBLE / (n_b - y_b + 1)::DOUBLE), 6) AS odds_ratio
        |FROM pw CROSS JOIN t WHERE y_a + y_b >= 50 ORDER BY word""".stripMargin,

    // elementwise replay: same abs-max, same floor(x/scale+0.5) rounding,
    // same clamp, same left-to-right reconstruction cosine
    "q246_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
        |      THEN list_max(list_transform(v, x -> abs(x))) / 127.0::DOUBLE
        |    END AS scale FROM e),
        |c AS (SELECT vec_id, v, scale,
        |    CASE WHEN scale IS NOT NULL THEN
        |      list_transform(v, x -> greatest(-127, least(127,
        |        floor(x / scale + 0.5)::BIGINT)))
        |    END AS codes FROM s),
        |d AS (SELECT vec_id, v, scale, codes,
        |    CASE WHEN scale IS NOT NULL THEN
        |      list_transform(codes, q -> q::DOUBLE * scale)
        |    END AS deq FROM c)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  array_to_string(codes, ',') AS codes_csv,
        |  round(list_dot_product(v, deq) /
        |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(deq, deq))), 6)
        |    AS recon_cos
        |FROM d ORDER BY vec_id""".stripMargin,

    // window-2 skip-grams via zipped parallel unnests (d = 1 and d = 2),
    // both orientations, integer counts
    "q247_skipgrams" ->
      """WITH w AS (SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> '') AS ws FROM documents),
        |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, greatest(len(ws)-1, 0)), i -> ws[i])) AS a,
        |         unnest(list_transform(generate_series(1, greatest(len(ws)-1, 0)), i -> ws[i+1])) AS b
        |  FROM w2
        |  UNION ALL
        |  SELECT unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)), i -> ws[i])),
        |         unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)), i -> ws[i+2]))
        |  FROM w2),
        |u AS (SELECT a AS center, b AS context FROM p
        |      UNION ALL SELECT b, a FROM p)
        |SELECT center, context, count(*) AS n FROM u
        |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY 1, 2""".stripMargin,

    // quantile_cont quartiles, same fence order q1 - 1.5*(q3-q1)
    "q248_tukey" ->
      """WITH q AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q),
        |c AS (SELECT e.event_type,
        |    sum(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END)::BIGINT AS n_below,
        |    sum(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END)::BIGINT AS n_above,
        |    count(*) AS n
        |  FROM events e JOIN f ON f.event_type = e.event_type GROUP BY 1)
        |SELECT c.event_type, round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
        |  round(f.lo, 6) AS lo_fence, round(f.hi, 6) AS hi_fence,
        |  n_below, n_above, n
        |FROM c JOIN f USING (event_type) ORDER BY 1""".stripMargin,

    // DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday -> +1 in the oracle
    "q249_contingency" ->
      """WITH d AS (SELECT event_type AS a, (dayofweek(ts) + 1)::INTEGER AS b
        |  FROM events),
        |cells AS (SELECT a, b, count(*) AS o FROM d GROUP BY 1, 2),
        |rt AS (SELECT a, sum(o)::BIGINT AS row_tot FROM cells GROUP BY 1),
        |ct AS (SELECT b, sum(o)::BIGINT AS col_tot FROM cells GROUP BY 1),
        |n AS (SELECT sum(o)::BIGINT AS n_tot FROM cells)
        |SELECT cells.a AS event_type, cells.b AS dow, cells.o,
        |  rt.row_tot, ct.col_tot,
        |  round((rt.row_tot * ct.col_tot)::DOUBLE / n.n_tot::DOUBLE, 6) AS expected,
        |  round((cells.o::DOUBLE - (rt.row_tot * ct.col_tot)::DOUBLE / n.n_tot::DOUBLE)
        |    / sqrt((rt.row_tot * ct.col_tot)::DOUBLE / n.n_tot::DOUBLE), 6) AS residual
        |FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n
        |ORDER BY 1, 2""".stripMargin,

    // the direct θ-join IS the oracle for the bucketized equi-join plan
    "q250_overlap_join" ->
      """WITH base AS (SELECT event_id, user_id, event_type,
        |    floor(epoch(ts))::BIGINT AS start_s FROM events),
        |a AS (SELECT event_id, user_id, start_s,
        |    start_s + (event_id % 7 + 1) * 60 AS end_s
        |  FROM base WHERE user_id < 30),
        |b AS (SELECT event_id AS incident_id, start_s, start_s + 1800 AS end_s
        |  FROM base WHERE event_type = 'error')
        |SELECT a.event_id AS a_event_id, a.user_id AS a_user_id,
        |  b.incident_id AS b_incident_id,
        |  least(a.end_s, b.end_s) - greatest(a.start_s, b.start_s) AS overlap_s
        |FROM a JOIN b ON a.start_s < b.end_s AND b.start_s < a.end_s
        |ORDER BY 1, 3""".stripMargin,

    // S as an integer sign sum over ordered day pairs; tau-b ties from
    // integer t(t-1)/2 sums; one sqrt at the end
    "q251_kendall" ->
      """WITH d AS (SELECT event_type,
        |    floor(epoch(ts))::BIGINT // 86400 AS day,
        |    count(*) AS x, count(DISTINCT user_id) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1
        |             WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN -1 ELSE 0 END)::BIGINT AS s
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |tx AS (SELECT event_type, sum((t * (t - 1)) // 2)::BIGINT AS n1
        |  FROM (SELECT event_type, x, count(*) AS t FROM d GROUP BY 1, 2)
        |  GROUP BY 1),
        |ty AS (SELECT event_type, sum((t * (t - 1)) // 2)::BIGINT AS n2
        |  FROM (SELECT event_type, y, count(*) AS t FROM d GROUP BY 1, 2)
        |  GROUP BY 1),
        |nn AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1)
        |SELECT p.event_type, p.s, nn.n,
        |  round(CASE WHEN (nn.n * (nn.n - 1)) // 2 - tx.n1 > 0
        |              AND (nn.n * (nn.n - 1)) // 2 - ty.n2 > 0
        |    THEN p.s::DOUBLE / sqrt(((nn.n * (nn.n - 1)) // 2 - tx.n1)::DOUBLE *
        |                            ((nn.n * (nn.n - 1)) // 2 - ty.n2)::DOUBLE)
        |  END, 6) AS tau_b
        |FROM p JOIN tx USING (event_type) JOIN ty USING (event_type)
        |JOIN nn USING (event_type) ORDER BY 1""".stripMargin,

    // q238's latency frame rolled to signup-week cohorts
    "q252_cohort_conversion" ->
      """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS from_us
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |e AS (SELECT user_id, epoch_us(ts) AS to_us
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT s.user_id, s.from_us,
        |    min(CASE WHEN e.to_us >= s.from_us THEN e.to_us END) AS to_us
        |  FROM s LEFT JOIN e ON e.user_id = s.user_id GROUP BY 1, 2)
        |SELECT (from_us // 1000000 // 86400) // 7 AS cohort_week,
        |  count(*) AS n_started,
        |  sum(CASE WHEN to_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_converted,
        |  round(sum(CASE WHEN to_us IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE, 6) AS conv_rate
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // same sentence/word/vowel-group regexes; DuckDB lateral aliases keep
    // the formula readable
    "q253_readability" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |    x -> trim(x) <> ''))::BIGINT AS n_sent,
        |  len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> ''))::BIGINT AS n_words,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syll,
        |  round(CASE WHEN n_sent >= 1 AND n_words >= 1 THEN
        |    206.835::DOUBLE
        |      - 1.015::DOUBLE * (n_words::DOUBLE / n_sent::DOUBLE)
        |      - 84.6::DOUBLE * (n_syll::DOUBLE / n_words::DOUBLE) END, 6) AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,

    // integer gap power sums; identical (t, event_id) window order
    "q254_gap_regularity" ->
      """WITH o AS (SELECT user_id, floor(epoch(ts))::BIGINT AS t, event_id
        |  FROM events),
        |g AS (SELECT user_id,
        |    t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
        |  FROM o),
        |a AS (SELECT user_id, count(*) AS n_gaps, sum(gap)::BIGINT AS sum_gap_s,
        |    sum(gap * gap)::BIGINT AS sum_gap2
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, sum_gap_s,
        |  round(sum_gap_s::DOUBLE / n_gaps::DOUBLE, 6) AS mean_gap_s,
        |  round(CASE WHEN n_gaps >= 2 AND sum_gap_s > 0 THEN
        |    sqrt((n_gaps * sum_gap2 - sum_gap_s * sum_gap_s)::DOUBLE)
        |      / sum_gap_s::DOUBLE END, 6) AS gap_cv
        |FROM a ORDER BY user_id""".stripMargin,

    "q255_syndication" ->
      """WITH corpus AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT 'mirror', text FROM documents WHERE doc_id % 4 = 0),
        |d AS (SELECT DISTINCT source AS src, md5(text) AS dig FROM corpus)
        |SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
        |FROM d a JOIN d b ON a.dig = b.dig AND a.src < b.src
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the engine collects the category domain sorted (click, error,
    // purchase, signup, view) and sums entropy terms in that literal
    // order — the oracle evaluates the identical left-assoc chain
    "q256_entropy" ->
      """WITH c AS (SELECT user_id, count(*) AS n,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS c0,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c2,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS c3,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS c4
        |  FROM events GROUP BY 1)
        |SELECT user_id, n,
        |  ((CASE WHEN c0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN c1 > 0 THEN 1 ELSE 0 END)
        |   + (CASE WHEN c2 > 0 THEN 1 ELSE 0 END) + (CASE WHEN c3 > 0 THEN 1 ELSE 0 END)
        |   + (CASE WHEN c4 > 0 THEN 1 ELSE 0 END))::BIGINT AS n_cats,
        |  round(
        |    (CASE WHEN c0 > 0 THEN -((c0::DOUBLE / n::DOUBLE) * ln(c0::DOUBLE / n::DOUBLE)) ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN c1 > 0 THEN -((c1::DOUBLE / n::DOUBLE) * ln(c1::DOUBLE / n::DOUBLE)) ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN c2 > 0 THEN -((c2::DOUBLE / n::DOUBLE) * ln(c2::DOUBLE / n::DOUBLE)) ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN c3 > 0 THEN -((c3::DOUBLE / n::DOUBLE) * ln(c3::DOUBLE / n::DOUBLE)) ELSE 0.0::DOUBLE END)
        |    + (CASE WHEN c4 > 0 THEN -((c4::DOUBLE / n::DOUBLE) * ln(c4::DOUBLE / n::DOUBLE)) ELSE 0.0::DOUBLE END)
        |  , 6) AS entropy
        |FROM c ORDER BY user_id""".stripMargin,

    "q257_topk_other" ->
      """WITH c AS (SELECT lang, source, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, source, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rk
        |  FROM c)
        |SELECT lang, CASE WHEN rk <= 2 THEN source ELSE 'OTHER' END AS category,
        |  sum(cnt)::BIGINT AS cnt
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q104's funnel CTE aggregated to reached-counts + guarded shares
    "q258_funnel_dropoff" ->
      """WITH ev AS (SELECT user_id, event_type AS t, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM ev WHERE t = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.t = 'view' AND e.us > s1.t1
        |    AND e.us <= s1.t1 + 604800000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.t = 'purchase' AND e.us > s2.t2
        |    AND e.us <= s1.t1 + 604800000000 GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events),
        |m AS (SELECT u.user_id,
        |    (CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS max_step
        |  FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |    LEFT JOIN s3 USING (user_id)),
        |a AS (SELECT count(*) AS n_users,
        |    sum(CASE WHEN max_step >= 1 THEN 1 ELSE 0 END)::BIGINT AS reached_1,
        |    sum(CASE WHEN max_step >= 2 THEN 1 ELSE 0 END)::BIGINT AS reached_2,
        |    sum(CASE WHEN max_step >= 3 THEN 1 ELSE 0 END)::BIGINT AS reached_3
        |  FROM m)
        |SELECT n_users, reached_1, reached_2, reached_3,
        |  round(reached_1::DOUBLE / n_users::DOUBLE, 6) AS conv_0_1,
        |  round(CASE WHEN reached_1 > 0
        |    THEN reached_2::DOUBLE / reached_1::DOUBLE END, 6) AS conv_1_2,
        |  round(CASE WHEN reached_2 > 0
        |    THEN reached_3::DOUBLE / reached_2::DOUBLE END, 6) AS conv_2_3
        |FROM a""".stripMargin,

    // two unrolled support-peel rounds (k-2 = 1), then the final
    // in-subgraph support — identical bounded-round contract to q221
    "q259_ktruss" ->
      """WITH raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT count(*) FROM documents) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |u0 AS (SELECT DISTINCT least(s, t) AS x, greatest(s, t) AS y FROM raw WHERE s <> t),
        |a0 AS (SELECT x AS v, y AS n FROM u0 UNION ALL SELECT y, x FROM u0),
        |s0 AS (SELECT e.x, e.y, count(*) AS sup FROM u0 e
        |  JOIN a0 p ON p.v = e.x JOIN a0 q ON q.v = e.y AND q.n = p.n
        |  GROUP BY 1, 2),
        |u1 AS (SELECT e.x, e.y FROM u0 e
        |  JOIN s0 ON s0.x = e.x AND s0.y = e.y AND s0.sup >= 1),
        |a1 AS (SELECT x AS v, y AS n FROM u1 UNION ALL SELECT y, x FROM u1),
        |s1 AS (SELECT e.x, e.y, count(*) AS sup FROM u1 e
        |  JOIN a1 p ON p.v = e.x JOIN a1 q ON q.v = e.y AND q.n = p.n
        |  GROUP BY 1, 2),
        |u2 AS (SELECT e.x, e.y FROM u1 e
        |  JOIN s1 ON s1.x = e.x AND s1.y = e.y AND s1.sup >= 1),
        |a2 AS (SELECT x AS v, y AS n FROM u2 UNION ALL SELECT y, x FROM u2),
        |s2 AS (SELECT e.x, e.y, count(*) AS sup FROM u2 e
        |  JOIN a2 p ON p.v = e.x JOIN a2 q ON q.v = e.y AND q.n = p.n
        |  GROUP BY 1, 2)
        |SELECT u2.x, u2.y, coalesce(s2.sup, 0)::BIGINT AS support
        |FROM u2 LEFT JOIN s2 ON s2.x = u2.x AND s2.y = u2.y
        |WHERE coalesce(s2.sup, 0) >= 1
        |ORDER BY 1, 2""".stripMargin,

    // rank arithmetic replayed: score = 1 + (0-based rank * 5) // n
    "q260_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey, epoch_us(max(o_orderdate))::BIGINT AS recency_us,
        |    count(*)::BIGINT AS frequency, round(sum(o_totalprice), 6) AS monetary
        |  FROM orders GROUP BY 1),
        |r AS (SELECT *,
        |  row_number() OVER (ORDER BY recency_us, o_custkey) - 1 AS rr,
        |  row_number() OVER (ORDER BY frequency, o_custkey) - 1 AS fr,
        |  row_number() OVER (ORDER BY monetary, o_custkey) - 1 AS mr,
        |  count(*) OVER () AS n FROM base)
        |SELECT o_custkey, recency_us, frequency, monetary,
        |  (1 + (rr * 5) // n)::BIGINT AS r_score,
        |  (1 + (fr * 5) // n)::BIGINT AS f_score,
        |  (1 + (mr * 5) // n)::BIGINT AS m_score
        |FROM r ORDER BY o_custkey""".stripMargin,

    // per-term float order matches the Spark side exactly:
    // value * ((nxt - us) / 1e6), summed then divided by the duration
    "q261_twa" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us, value,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events)
        |SELECT user_id, count(*)::BIGINT AS n_points,
        |  round((max(us) - min(us)) / 1e6, 6) AS duration_s,
        |  round(sum(value * ((nxt - us) / 1e6)) /
        |    (CASE WHEN max(us) > min(us) THEN (max(us) - min(us)) / 1e6 END), 6) AS twa
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "q262_stickiness" ->
      """WITH pairs AS (SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events),
        |days AS (SELECT d, count(*)::BIGINT AS dau FROM pairs GROUP BY 1),
        |w AS (SELECT dd.d, count(DISTINCT p.u)::BIGINT AS window_active
        |  FROM (SELECT DISTINCT d FROM pairs) dd
        |  JOIN pairs p ON dd.d BETWEEN p.d AND p.d + 6
        |  GROUP BY 1)
        |SELECT floor(epoch(days.d::TIMESTAMP))::BIGINT AS day_s, days.dau,
        |  w.window_active, round(days.dau / w.window_active, 6) AS stickiness
        |FROM days JOIN w ON days.d = w.d ORDER BY 1""".stripMargin,

    // exact integer-cents replay: sums are exact BIGINTs, the two divisions
    // (cum/n, then /100) are deterministic double ops in the same order
    "q263_ltv_curve" ->
      """WITH f AS (SELECT o_custkey AS cust,
        |    (year(o_orderdate)*12 + month(o_orderdate))::INT AS ym,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT AS amt FROM orders),
        |fst AS (SELECT cust, min(ym) AS cohort_ym FROM f GROUP BY 1),
        |sizes AS (SELECT cohort_ym, count(*)::BIGINT AS n_customers
        |  FROM fst GROUP BY 1),
        |cells AS (SELECT fst.cohort_ym, f.ym - fst.cohort_ym AS offset_m,
        |    sum(amt)::BIGINT AS rev
        |  FROM f JOIN fst USING (cust) GROUP BY 1, 2),
        |c AS (SELECT cohort_ym, offset_m, rev,
        |  (sum(rev) OVER (PARTITION BY cohort_ym ORDER BY offset_m))::BIGINT AS cum
        |  FROM cells)
        |SELECT c.cohort_ym, c.offset_m, s.n_customers,
        |  rev / 100 AS revenue, cum / 100 AS cum_revenue,
        |  (cum / s.n_customers) / 100 AS ltv
        |FROM c JOIN sizes s USING (cohort_ym)
        |ORDER BY 1, 2""".stripMargin,

    // the bloom pre-filter is result-invisible: exact IN-subquery twin
    "q264_bloom_semi" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n_rows,
        |  round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // truncated-RBO replay: an item in both top-10 prefixes contributes
    // w(m) = Σ_{k=m..10} 0.9^(k-1)/k once, from m = max(rank_a, rank_b) —
    // the weights are the plan-time constants the operator plants
    "q265_rbo" ->
      """WITH a AS (SELECT l_returnflag AS g, s_nationkey AS item, count(*) AS cnt
        |    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    WHERE year(l_shipdate) = 1995 GROUP BY 1, 2),
        |b AS (SELECT l_returnflag AS g, s_nationkey AS item, count(*) AS cnt
        |    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    WHERE year(l_shipdate) = 1996 GROUP BY 1, 2),
        |ra AS (SELECT g, item, row_number() OVER
        |    (PARTITION BY g ORDER BY cnt DESC, item) AS r FROM a),
        |rb AS (SELECT g, item, row_number() OVER
        |    (PARTITION BY g ORDER BY cnt DESC, item) AS r FROM b),
        |j AS (SELECT ra.g, greatest(ra.r, rb.r) AS m
        |  FROM ra JOIN rb ON ra.g = rb.g AND ra.item = rb.item
        |  WHERE ra.r <= 10 AND rb.r <= 10)
        |SELECT g AS l_returnflag, count(*)::BIGINT AS n_common,
        |  round(0.09999999999999998 * sum(CASE m
        |    WHEN 1 THEN 2.354163994257143
        |    WHEN 2 THEN 1.3541639942571426
        |    WHEN 3 THEN 0.904163994257143
        |    WHEN 4 THEN 0.634163994257143
        |    WHEN 5 THEN 0.45191399425714296
        |    WHEN 6 THEN 0.3206939942571429
        |    WHEN 7 THEN 0.22227899425714287
        |    WHEN 8 THEN 0.14635885140000005
        |    WHEN 9 THEN 0.08657173890000001
        |    WHEN 10 THEN 0.038742048900000006 END), 6) AS rbo
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // gaps-and-islands merge replayed: new span when start exceeds the
    // running max of all PRECEDING clipped ends (exact µs integers)
    "q266_uptime" ->
      """WITH iv AS (SELECT user_id, event_id,
        |    greatest(epoch_us(ts), 1704067200000000) AS s,
        |    least(epoch_us(ts) + 3600000000, 1706745600000000) AS e
        |  FROM events),
        |f AS (SELECT user_id, event_id, s, e,
        |    CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
        |         THEN 1 ELSE 0 END AS nf
        |  FROM iv WHERE s < e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |r AS (SELECT user_id, s, e,
        |    sum(nf) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM f),
        |sp AS (SELECT user_id, run, min(s) AS ss, max(e) AS se
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, count(*)::BIGINT AS n_spans,
        |  sum(se - ss)::BIGINT AS covered_us,
        |  round(sum(se - ss)::BIGINT / 2678400000000, 6) AS uptime_share
        |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    "q267_qnorm" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value, event_id) AS rank
        |  FROM events),
        |m AS (SELECT rank, avg(value) AS q, count(*) AS n FROM r GROUP BY 1)
        |SELECT r.event_type, r.event_id, r.rank, m.n::BIGINT AS n_groups_at_rank,
        |  round(m.q, 6) AS qnorm
        |FROM r JOIN m USING (rank) ORDER BY 1, 3""".stripMargin,

    // top-5 leaderboard churn: rank window -> shifted self-join on the
    // following week -> k-sized intersection Jaccard
    "q268_topk_churn" ->
      """WITH wk AS (SELECT event_type, user_id,
        |    (epoch_us(ts) - 1704067200000000) // 604800000000 AS week,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2, 3),
        |top AS (SELECT event_type, week, user_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type, week
        |        ORDER BY cnt DESC, user_id) AS r FROM wk) WHERE r <= 5),
        |sz AS (SELECT event_type, week, count(*) AS n FROM top GROUP BY 1, 2),
        |inter AS (SELECT a.event_type, a.week, count(*) AS n_common
        |  FROM top a JOIN top b ON a.event_type = b.event_type
        |    AND a.week = b.week + 1 AND a.user_id = b.user_id
        |  GROUP BY 1, 2)
        |SELECT c.event_type, c.week, p.n::BIGINT AS n_prev, c.n::BIGINT AS n_cur,
        |  coalesce(i.n_common, 0)::BIGINT AS n_common,
        |  round(coalesce(i.n_common, 0) / (p.n + c.n - coalesce(i.n_common, 0)), 6)
        |    AS jaccard
        |FROM sz c JOIN sz p ON c.event_type = p.event_type AND c.week = p.week + 1
        |LEFT JOIN inter i ON i.event_type = c.event_type AND i.week = c.week
        |ORDER BY 1, 2""".stripMargin,

    // direct per-level replay: approx = span count / 2^l; detail uses the
    // level-(l-1) left-child sum — parity of the level-(l-1) index; all
    // dyadic rationals, exact in doubles in both engines
    "q269_haar" ->
      """WITH base AS (SELECT event_type,
        |    (epoch_us(ts) - 1704067200000000) // 21600000000 AS b,
        |    count(*) AS c
        |  FROM events WHERE epoch_us(ts) >= 1704067200000000 GROUP BY 1, 2),
        |lv AS (
        |  SELECT event_type, 1 AS level, b // 2 AS idx, sum(c) AS s,
        |    sum(CASE WHEN b % 2 = 0 THEN c ELSE 0 END) AS sl
        |  FROM base GROUP BY 1, 3
        |  UNION ALL
        |  SELECT event_type, 2, b // 4, sum(c),
        |    sum(CASE WHEN (b // 2) % 2 = 0 THEN c ELSE 0 END)
        |  FROM base GROUP BY 1, 3
        |  UNION ALL
        |  SELECT event_type, 3, b // 8, sum(c),
        |    sum(CASE WHEN (b // 4) % 2 = 0 THEN c ELSE 0 END)
        |  FROM base GROUP BY 1, 3)
        |SELECT event_type, level, idx,
        |  s / (1 << level)::DOUBLE AS approx,
        |  (2 * sl - s) / (1 << level)::DOUBLE AS detail
        |FROM lv ORDER BY 1, 2, 3""".stripMargin,

    // Markov removal effects replayed: journeys -> transition counts ->
    // row-normalized probabilities -> per-variant redirected matrices ->
    // bounded mass propagation as a recursive CTE (PageRank q199 pattern)
    "q270_markov_attr" ->
      """WITH RECURSIVE
        |kept0 AS (SELECT user_id,
        |    CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS state,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
        |  FROM events),
        |cx AS (SELECT user_id, min(CASE WHEN state = 'CONV' THEN idx END) AS cidx
        |  FROM kept0 GROUP BY 1),
        |kept AS (SELECT kept0.user_id, state, idx FROM kept0 JOIN cx USING (user_id)
        |  WHERE cx.cidx IS NULL OR idx <= cx.cidx),
        |se AS (SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY idx),
        |    'START') AS f, state AS t FROM kept),
        |ee AS (SELECT state AS f, 'NULL' AS t FROM kept
        |  JOIN (SELECT user_id, max(idx) AS mx FROM kept GROUP BY 1) m
        |    ON kept.user_id = m.user_id AND idx = mx WHERE state <> 'CONV'),
        |cnt AS (SELECT f, t, count(*)::DOUBLE AS c
        |  FROM (SELECT * FROM se UNION ALL SELECT * FROM ee) GROUP BY 1, 2),
        |p AS (SELECT f, t, c / sum(c) OVER (PARTITION BY f) AS p FROM cnt),
        |vars AS (SELECT unnest(['base','click','error','signup','view']) AS v),
        |red AS (SELECT v, f,
        |    CASE WHEN v <> 'base' AND t = v THEN 'NULL' ELSE t END AS t,
        |    sum(p) AS p
        |  FROM p CROSS JOIN vars WHERE v = 'base' OR f <> v GROUP BY 1, 2, 3),
        |tr AS (SELECT * FROM red UNION ALL
        |  SELECT v, s, s, 1.0::DOUBLE FROM vars
        |  CROSS JOIN (SELECT unnest(['CONV','NULL']) AS s)),
        |mass AS (
        |  SELECT v, 'START' AS state, 1.0::DOUBLE AS m, 0 AS it FROM vars
        |  UNION ALL
        |  SELECT mass.v, tr.t, sum(mass.m * tr.p), it + 1
        |  FROM mass JOIN tr ON tr.v = mass.v AND tr.f = mass.state
        |  WHERE it < 6 GROUP BY mass.v, tr.t, it + 1),
        |pc AS (SELECT v, m FROM mass WHERE it = 6 AND state = 'CONV'),
        |pb AS (SELECT m AS mb FROM pc WHERE v = 'base')
        |SELECT vars.v AS removed_channel,
        |  round(coalesce(pc.m, 0), 6) AS p_conv,
        |  CASE WHEN vars.v = 'base' THEN NULL
        |       ELSE round(1 - coalesce(pc.m, 0) / pb.mb, 6) END AS removal_effect
        |FROM vars LEFT JOIN pc ON pc.v = vars.v CROSS JOIN pb
        |ORDER BY 1""".stripMargin,

    // KM replay: duration grain -> at-risk = total minus preceding exits ->
    // ordered running sum of ln factors (deterministic cumprod), zero flag
    // instead of ln(0)
    "q271_km" ->
      """WITH subj AS (SELECT event_type,
        |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS t,
        |    CASE WHEN max(epoch_us(ts)) < 1706054400000000 THEN 1 ELSE 0 END AS e
        |  FROM events GROUP BY event_type, user_id),
        |g AS (SELECT event_type, t, sum(e) AS d, sum(1 - e) AS c
        |  FROM subj GROUP BY 1, 2),
        |r AS (SELECT *,
        |    sum(d + c) OVER (PARTITION BY event_type) -
        |    coalesce(sum(d + c) OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM g),
        |s AS (SELECT *,
        |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w = 1
        |         THEN 0.0
        |         ELSE exp(sum(ln(1 - d::DOUBLE / n_risk::DOUBLE)) OVER w)
        |    END AS surv
        |  FROM r WINDOW w AS (PARTITION BY event_type ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, t, n_risk::BIGINT AS n_risk, d::BIGINT AS n_event,
        |  c::BIGINT AS n_censored, round(surv, 6) AS survival
        |FROM s WHERE d > 0 ORDER BY 1, 2""".stripMargin,

    // midranks = rank() + (ties-1)/2 (exact half-integers); per-row tie
    // term t^2-1 sums to the standard per-block t^3-t
    "q272_mwu" ->
      """WITH b AS (SELECT day(ts) AS day, event_type, value FROM events
        |  WHERE event_type IN ('click', 'view')),
        |r AS (SELECT *, rank() OVER (PARTITION BY day ORDER BY value) AS rk,
        |    count(*) OVER (PARTITION BY day, value) AS tc FROM b),
        |a AS (SELECT day,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_b,
        |    sum(CASE WHEN event_type = 'click'
        |        THEN rk + (tc - 1) / 2.0 ELSE 0 END) AS ra,
        |    sum(tc * tc - 1) AS tie
        |  FROM r GROUP BY 1)
        |SELECT day, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
        |  round(ra - n_a * (n_a + 1) / 2.0, 6) AS u_a,
        |  round((ra - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0) /
        |    sqrt(n_a::DOUBLE * n_b / 12.0 * ((n_a + n_b + 1) -
        |      tie::DOUBLE / ((n_a + n_b) * (n_a + n_b - 1.0)))), 6) AS z
        |FROM a ORDER BY 1""".stripMargin,

    // kappa is integer arithmetic up to one division:
    // (n*agree - sum(n1*n2)) / (n^2 - sum(n1*n2))
    "q273_kappa" ->
      """WITH l AS (SELECT source, (n_chars > 600) AS a,
        |    (length(text) - length(replace(text, ' ', '')) > 80) AS b
        |  FROM documents),
        |t AS (SELECT source, count(*) AS n,
        |    sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS na FROM l GROUP BY 1),
        |e AS (SELECT source, sum(n1 * n2) AS e FROM
        |    (SELECT source, a AS k, count(*) AS n1 FROM l GROUP BY 1, 2) x
        |  JOIN (SELECT source, b AS k, count(*) AS n2 FROM l GROUP BY 1, 2) y
        |    USING (source, k)
        |  GROUP BY 1)
        |SELECT t.source, n::BIGINT AS n, na::BIGINT AS n_agree,
        |  round((n * na - e) / (n * n - e)::DOUBLE, 6) AS kappa
        |FROM t JOIN e USING (source) ORDER BY 1""".stripMargin,

    // JSD with the same literal category order and left-assoc term sum as
    // the operator (t_click + t_error + t_purchase + t_signup + t_view)
    "q274_jsd" ->
      """WITH wk AS (SELECT
        |    (epoch_us(ts) - 1704067200000000) // 604800000000 AS week,
        |    event_type FROM events),
        |p AS (SELECT week, count(*) AS n,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c3,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c4
        |  FROM wk GROUP BY 1),
        |g AS (SELECT count(*) AS gn,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS g0,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS g1,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g2,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS g3,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS g4
        |  FROM wk)
        |SELECT week, n::BIGINT AS n, round(
        |    (CASE WHEN c0 > 0 THEN (c0/n::DOUBLE) * (ln(2*(c0/n::DOUBLE)) - ln(c0/n::DOUBLE + g0/gn::DOUBLE)) ELSE 0 END
        |     + CASE WHEN g0 > 0 THEN (g0/gn::DOUBLE) * (ln(2*(g0/gn::DOUBLE)) - ln(c0/n::DOUBLE + g0/gn::DOUBLE)) ELSE 0 END) / 2
        |  + (CASE WHEN c1 > 0 THEN (c1/n::DOUBLE) * (ln(2*(c1/n::DOUBLE)) - ln(c1/n::DOUBLE + g1/gn::DOUBLE)) ELSE 0 END
        |     + CASE WHEN g1 > 0 THEN (g1/gn::DOUBLE) * (ln(2*(g1/gn::DOUBLE)) - ln(c1/n::DOUBLE + g1/gn::DOUBLE)) ELSE 0 END) / 2
        |  + (CASE WHEN c2 > 0 THEN (c2/n::DOUBLE) * (ln(2*(c2/n::DOUBLE)) - ln(c2/n::DOUBLE + g2/gn::DOUBLE)) ELSE 0 END
        |     + CASE WHEN g2 > 0 THEN (g2/gn::DOUBLE) * (ln(2*(g2/gn::DOUBLE)) - ln(c2/n::DOUBLE + g2/gn::DOUBLE)) ELSE 0 END) / 2
        |  + (CASE WHEN c3 > 0 THEN (c3/n::DOUBLE) * (ln(2*(c3/n::DOUBLE)) - ln(c3/n::DOUBLE + g3/gn::DOUBLE)) ELSE 0 END
        |     + CASE WHEN g3 > 0 THEN (g3/gn::DOUBLE) * (ln(2*(g3/gn::DOUBLE)) - ln(c3/n::DOUBLE + g3/gn::DOUBLE)) ELSE 0 END) / 2
        |  + (CASE WHEN c4 > 0 THEN (c4/n::DOUBLE) * (ln(2*(c4/n::DOUBLE)) - ln(c4/n::DOUBLE + g4/gn::DOUBLE)) ELSE 0 END
        |     + CASE WHEN g4 > 0 THEN (g4/gn::DOUBLE) * (ln(2*(g4/gn::DOUBLE)) - ln(c4/n::DOUBLE + g4/gn::DOUBLE)) ELSE 0 END) / 2
        |  , 6) AS jsd
        |FROM p CROSS JOIN g ORDER BY week""".stripMargin,

    // CUPED moment-sum replay: pooled theta = (Sxy - SxSy/n)/(Sxx - Sx^2/n),
    // identical operation order to the operator
    "q275_cuped" ->
      """WITH unit AS (SELECT user_id,
        |    sum(CASE WHEN epoch_us(ts) < 1705363200000000 THEN value ELSE 0 END) AS x,
        |    sum(CASE WHEN epoch_us(ts) >= 1705363200000000 THEN value ELSE 0 END) AS y,
        |    (user_id % 2)::VARCHAR AS seg
        |  FROM events GROUP BY user_id),
        |p AS (SELECT count(*) AS pn, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM unit),
        |g AS (SELECT seg, count(*) AS n, sum(x) AS gx, sum(y) AS gy
        |  FROM unit GROUP BY 1)
        |SELECT seg, n::BIGINT AS n, round(gy/n, 6) AS y_mean,
        |  round(gy/n - ((sxy - sx*sy/pn)/(sxx - sx*sx/pn)) * (gx/n - sx/pn), 6)
        |    AS y_adj_mean,
        |  round((sxy - sx*sy/pn)/(sxx - sx*sx/pn), 6) AS theta,
        |  round(((sxy - sx*sy/pn)/(sxx - sx*sx/pn)) *
        |        ((sxy - sx*sy/pn)/(sxx - sx*sx/pn)) *
        |        (sxx - sx*sx/pn) / (syy - sy*sy/pn), 6) AS var_reduction
        |FROM g CROSS JOIN p ORDER BY 1""".stripMargin,

    // 2x2 cell sums/counts pivoted exactly like the operator; the estimate
    // is (m_t1 - m_t0) - (m_c1 - m_c0)
    "q276_did" ->
      """WITH c AS (SELECT event_type, count(*) AS n,
        |    sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) < 1705363200000000 THEN value ELSE 0 END) AS st0,
        |    sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) AS nt0,
        |    sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) >= 1705363200000000 THEN value ELSE 0 END) AS st1,
        |    sum(CASE WHEN user_id % 2 = 1 AND epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END) AS nt1,
        |    sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) < 1705363200000000 THEN value ELSE 0 END) AS sc0,
        |    sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) AS nc0,
        |    sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) >= 1705363200000000 THEN value ELSE 0 END) AS sc1,
        |    sum(CASE WHEN user_id % 2 = 0 AND epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END) AS nc1
        |  FROM events GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n,
        |  round(st0/nt0, 6) AS m_t0, round(st1/nt1, 6) AS m_t1,
        |  round(sc0/nc0, 6) AS m_c0, round(sc1/nc1, 6) AS m_c1,
        |  round((st1/nt1 - st0/nt0) - (sc1/nc1 - sc0/nc0), 6) AS did
        |FROM c ORDER BY 1""".stripMargin,

    // SRM chi-square on exact integers: ((o0-e)^2/e) + ((o1-e)^2/e) in the
    // operator's literal arm order
    "q277_srm" ->
      """WITH c AS (SELECT event_type, count(*) AS n,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS o0,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS o1
        |  FROM events GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n,
        |  round((o0 - n::DOUBLE * 0.5) * (o0 - n::DOUBLE * 0.5) / (n::DOUBLE * 0.5)
        |      + (o1 - n::DOUBLE * 0.5) * (o1 - n::DOUBLE * 0.5) / (n::DOUBLE * 0.5),
        |    6) AS chi2
        |FROM c ORDER BY 1""".stripMargin,

    // beta-binomial method-of-moments prior replayed with the operator's
    // exact formula order: m = sp/k, v = spp/k - m*m,
    // ab = max(m(1-m)/v - 1, 1), shrunk = (x + m*ab)/(n + ab)
    "q278_eb_rates" ->
      """WITH item AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
        |    count(*) AS n FROM events GROUP BY 1),
        |b AS (SELECT *, x::DOUBLE / n::DOUBLE AS p FROM item),
        |m AS (SELECT count(*) AS k, sum(p) AS sp, sum(p*p) AS spp FROM b),
        |j AS (SELECT b.*, m.sp, m.k,
        |    CASE WHEN (spp/k - (sp/k)*(sp/k)) > 0
        |         THEN greatest((sp/k)*(1 - sp/k)/(spp/k - (sp/k)*(sp/k)) - 1, 1.0)
        |         ELSE 1.0 END AS ab
        |  FROM b CROSS JOIN m)
        |SELECT user_id, x::BIGINT AS x, n::BIGINT AS n, round(p, 6) AS raw_rate,
        |  round(ab, 6) AS prior_strength,
        |  round((x + (sp/k) * ab) / (n + ab), 6) AS shrunk
        |FROM j ORDER BY 1""".stripMargin,

    // integer rank cut k = ceil(n/10) with (value desc, id) tie-break —
    // replays Profile.tailMean's rank-based tail definition
    "q279_cvar" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, max(n)::BIGINT AS n, count(*)::BIGINT AS k_tail,
        |  round(min(value), 6) AS var_threshold, round(avg(value), 6) AS tail_mean
        |FROM r WHERE rn <= (n * 1 + 9) // 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // strict local maxima over ±2 rows; null-side frames pass (endpoints
    // may be peaks) — mirrors Anomaly.peaks
    "q280_peaks" ->
      """WITH h AS (SELECT user_id,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket_start,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, bucket_start, cnt,
        |    max(cnt) OVER (PARTITION BY user_id ORDER BY bucket_start
        |      ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS ml,
        |    max(cnt) OVER (PARTITION BY user_id ORDER BY bucket_start
        |      ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mr
        |  FROM h)
        |SELECT user_id, bucket_start, cnt::BIGINT AS cnt FROM m
        |WHERE (ml IS NULL OR cnt > ml) AND (mr IS NULL OR cnt > mr)
        |ORDER BY 1, 2""".stripMargin,

    // Cramer's-rule 3x3 OLS replayed term for term from the same ten
    // moment sums (Features.olsFit)
    "q281_ols" ->
      """WITH m AS (SELECT event_type, count(*)::DOUBLE AS n,
        |    sum(hour(ts)::DOUBLE) AS s1, sum(date_part('day', ts)::DOUBLE) AS s2,
        |    sum(value) AS sy,
        |    sum(hour(ts)::DOUBLE * hour(ts)::DOUBLE) AS s11,
        |    sum(hour(ts)::DOUBLE * date_part('day', ts)::DOUBLE) AS s12,
        |    sum(date_part('day', ts)::DOUBLE * date_part('day', ts)::DOUBLE) AS s22,
        |    sum(hour(ts)::DOUBLE * value) AS s1y,
        |    sum(date_part('day', ts)::DOUBLE * value) AS s2y,
        |    sum(value * value) AS syy
        |  FROM events GROUP BY 1),
        |d AS (SELECT *,
        |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS d0,
        |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS d1,
        |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS d2
        |  FROM m)
        |SELECT event_type, n::BIGINT AS n,
        |  round(CASE WHEN abs(det) > 1e-9 THEN d0/det END, 6) AS b0,
        |  round(CASE WHEN abs(det) > 1e-9 THEN d1/det END, 6) AS b1,
        |  round(CASE WHEN abs(det) > 1e-9 THEN d2/det END, 6) AS b2,
        |  round(CASE WHEN abs(det) > 1e-9 AND (syy - sy*sy/n) > 0
        |    THEN ((d0/det)*sy + (d1/det)*s1y + (d2/det)*s2y - sy*sy/n) / (syy - sy*sy/n)
        |    END, 6) AS r2
        |FROM d ORDER BY 1""".stripMargin,

    "q282_hurst" -> hurstSql,

    // cumulative two-arm moments -> mixture LR -> running-min always-valid
    // p, replaying Experiment.msprt's literal operation order (tau^2 = 1)
    "q283_msprt" ->
      """WITH per AS (SELECT event_type,
        |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS day,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END) AS sa,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value*value ELSE 0 END) AS qa,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END) AS sb,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value*value ELSE 0 END) AS qb
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, day,
        |    sum(ca) OVER w AS na, sum(cb) OVER w AS nb,
        |    sum(sa) OVER w AS Sa, sum(sb) OVER w AS Sb,
        |    sum(qa) OVER w AS Qa, sum(qb) OVER w AS Qb
        |  FROM per WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |sc AS (SELECT event_type, day, na, nb,
        |    CASE WHEN na >= 1 AND nb >= 1 THEN Sb/nb::DOUBLE - Sa/na::DOUBLE END AS delta,
        |    CASE WHEN na >= 2 AND nb >= 2 AND
        |        (Qa - Sa*Sa/na::DOUBLE + Qb - Sb*Sb/nb::DOUBLE)/(na::DOUBLE + nb::DOUBLE - 2) > 0
        |      THEN (Qa - Sa*Sa/na::DOUBLE + Qb - Sb*Sb/nb::DOUBLE)/(na::DOUBLE + nb::DOUBLE - 2)
        |        * (1.0/na::DOUBLE + 1.0/nb::DOUBLE) END AS vt
        |  FROM cum),
        |lr AS (SELECT event_type, day, na, nb, delta,
        |    CASE WHEN vt IS NOT NULL THEN
        |      sqrt(vt/(vt + 1.0)) * exp(delta*delta*1.0/(2.0*vt*(vt + 1.0))) END AS lambda
        |  FROM sc)
        |SELECT event_type, day, na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  round(delta, 6) AS delta, round(lambda, 6) AS lambda,
        |  round(min(CASE WHEN lambda IS NOT NULL
        |      THEN least(1.0, 1.0/lambda) END)
        |    OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS p_always_valid
        |FROM lr ORDER BY 1, 2""".stripMargin,

    // the upsert identity: tier(base) ⊕ late == tier(all); the oracle IS
    // the direct 1m rollup of all events with exact interpolated quantiles
    "q284_late_upsert" ->
      """SELECT user_id,
        |  floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 60 AS bucket_start,
        |  count(*)::BIGINT AS cnt, round(sum(value), 6) AS sum_value,
        |  round(min(value), 6) AS min_value, round(max(value), 6) AS max_value,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // hourly error share per shard; 6h/24h trailing RANGE frames on the
    // bucket index (gaps shorten the window on both engines)
    "q285_burn_rate" ->
      """WITH b AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket_start,
        |    count(*) AS total,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT shard, bucket_start, total, errors,
        |    (sum(errors) OVER ws)::DOUBLE / (sum(total) OVER ws)::DOUBLE AS rs,
        |    (sum(errors) OVER wl)::DOUBLE / (sum(total) OVER wl)::DOUBLE AS rl
        |  FROM b WINDOW
        |    ws AS (PARTITION BY shard ORDER BY bucket_start // 3600
        |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
        |    wl AS (PARTITION BY shard ORDER BY bucket_start // 3600
        |      RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT shard, bucket_start, total::BIGINT AS total, errors::BIGINT AS errors,
        |  round(rs, 6) AS rate_short, round(rl, 6) AS rate_long,
        |  CASE WHEN rs / 0.2 > 1.05 AND rl / 0.2 > 1.05 THEN 1 ELSE 0 END AS alert
        |FROM w ORDER BY 1, 2""".stripMargin,

    // two alternating (row, col) median sweeps replayed with windowed
    // quantile_cont — integer cells keep every step dyadic-exact
    "q286_median_polish" ->
      """WITH c0 AS (SELECT event_type, dayofweek(ts) + 1 AS dow,
        |    (epoch_us(ts) - 1704067200000000) // 604800000000 AS wk,
        |    count(*)::DOUBLE AS v
        |  FROM events GROUP BY 1, 2, 3),
        |s1 AS (SELECT *, quantile_cont(v, 0.5)
        |    OVER (PARTITION BY event_type, dow) AS rm FROM c0),
        |s2 AS (SELECT event_type, dow, wk, v - rm AS res, rm AS reff FROM s1),
        |s3 AS (SELECT *, quantile_cont(res, 0.5)
        |    OVER (PARTITION BY event_type, wk) AS cm FROM s2),
        |s4 AS (SELECT event_type, dow, wk, res - cm AS res, reff, cm AS ceff FROM s3),
        |s5 AS (SELECT *, quantile_cont(res, 0.5)
        |    OVER (PARTITION BY event_type, dow) AS rm FROM s4),
        |s6 AS (SELECT event_type, dow, wk, res - rm AS res,
        |    reff + rm AS reff, ceff FROM s5),
        |s7 AS (SELECT *, quantile_cont(res, 0.5)
        |    OVER (PARTITION BY event_type, wk) AS cm FROM s6),
        |s8 AS (SELECT event_type, dow, wk, res - cm AS res, reff,
        |    ceff + cm AS ceff FROM s7)
        |SELECT event_type, dow, wk, round(reff, 6) AS row_eff,
        |  round(ceff, 6) AS col_eff, round(res, 6) AS residual
        |FROM s8 ORDER BY 1, 2, 3""".stripMargin,

    // forward Viterbi costs then a BACKWARD recursive walk for the state
    // path, both on integer-exact costs; ties prefer base (<=) exactly as
    // Anomaly.burstSegments pins them
    "q287_bursts" ->
      """WITH RECURSIVE h AS (SELECT event_type,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS b,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, sum(n) // count(*) AS mu FROM h GROUP BY 1),
        |c AS (SELECT h.event_type, b, n, mu,
        |    abs(n - mu)::DOUBLE AS e0, abs(n - 2*mu)::DOUBLE AS e1,
        |    row_number() OVER (PARTITION BY h.event_type ORDER BY b) AS rn,
        |    count(*) OVER (PARTITION BY h.event_type) AS tot
        |  FROM h JOIN m USING (event_type)),
        |fwd AS MATERIALIZED (
        |  SELECT event_type, rn, b, e0 AS c0, mu::DOUBLE + e1 AS c1,
        |    mu::DOUBLE AS g, tot
        |  FROM c WHERE rn = 1
        |  UNION ALL
        |  SELECT c.event_type, c.rn, c.b,
        |    least(f.c0, f.c1) + c.e0,
        |    least(f.c0 + f.g, f.c1) + c.e1, f.g, f.tot
        |  FROM c JOIN fwd f ON c.event_type = f.event_type AND c.rn = f.rn + 1),
        |bwd AS (
        |  SELECT event_type, rn, CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS st
        |  FROM fwd WHERE rn = tot
        |  UNION ALL
        |  SELECT f.event_type, f.rn,
        |    CASE WHEN bk.st = 0 THEN (CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END)
        |      ELSE (CASE WHEN f.c0 + f.g <= f.c1 THEN 0 ELSE 1 END) END
        |  FROM fwd f JOIN bwd bk
        |    ON f.event_type = bk.event_type AND f.rn = bk.rn - 1)
        |SELECT f.event_type, f.b AS bucket_start, round(f.c0, 6) AS cost_base,
        |  round(f.c1, 6) AS cost_burst, bk.st AS burst
        |FROM fwd f JOIN bwd bk ON f.event_type = bk.event_type AND f.rn = bk.rn
        |ORDER BY 1, 2""".stripMargin,

    // exact decomposition: mean2 - mean1 = sum_s [w2(r2-r1) + (w2-w1)r1];
    // missing-side conventions (w=0, r1→0) mirrored from Experiment.rateMix
    "q288_rate_mix" ->
      """WITH per AS (SELECT event_type,
        |    sum(CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN epoch_us(ts) < 1705363200000000 THEN value ELSE 0 END) AS s1,
        |    sum(CASE WHEN epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN epoch_us(ts) >= 1705363200000000 THEN value ELSE 0 END) AS s2
        |  FROM events GROUP BY 1),
        |t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM per),
        |d AS (SELECT event_type, n1, n2,
        |    n1::DOUBLE / t1::DOUBLE AS w1, n2::DOUBLE / t2::DOUBLE AS w2,
        |    CASE WHEN n1 > 0 THEN s1 / n1 ELSE 0.0 END AS r1,
        |    CASE WHEN n2 > 0 THEN s2 / n2 ELSE 0.0 END AS r2
        |  FROM per CROSS JOIN t)
        |SELECT event_type, n1::BIGINT AS n1, n2::BIGINT AS n2,
        |  round(w1, 6) AS w1, round(w2, 6) AS w2,
        |  round(r1, 6) AS r1, round(r2, 6) AS r2,
        |  round(w2 * (r2 - r1), 6) AS rate_effect,
        |  round((w2 - w1) * r1, 6) AS mix_effect,
        |  round(w2 * (r2 - r1) + (w2 - w1) * r1, 6) AS total_effect
        |FROM d ORDER BY 1""".stripMargin,

    // UCB1: mean + 1.0·sqrt(2·ln(N)/n), N = shard total pulls (window sum)
    "q289_ucb1" ->
      """WITH a AS (SELECT (user_id % 4)::VARCHAR AS shard, event_type,
        |    count(*)::BIGINT AS n, sum(value) AS s
        |  FROM events GROUP BY 1, 2)
        |SELECT shard, event_type, n,
        |  (sum(n) OVER (PARTITION BY shard))::BIGINT AS n_total,
        |  round(s / n, 6) AS mean,
        |  round(s / n + 1.0 * sqrt(2.0 *
        |    ln((sum(n) OVER (PARTITION BY shard))::DOUBLE) / n::DOUBLE), 6) AS ucb
        |FROM a ORDER BY 1, 2""".stripMargin,

    // ANOVA F from per-arm moment sums pivoted to columns; every Σ_a folds
    // in the literal arm order click,view,purchase,error,signup
    "q290_anova" ->
      """WITH a AS (SELECT (user_id % 4)::VARCHAR AS shard, count(*)::BIGINT AS n,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END) AS s0,
        |    sum(CASE WHEN event_type = 'click' THEN value*value ELSE 0 END) AS q0,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END) AS s1,
        |    sum(CASE WHEN event_type = 'view' THEN value*value ELSE 0 END) AS q1,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS s2,
        |    sum(CASE WHEN event_type = 'purchase' THEN value*value ELSE 0 END) AS q2,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n3,
        |    sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END) AS s3,
        |    sum(CASE WHEN event_type = 'error' THEN value*value ELSE 0 END) AS q3,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n4,
        |    sum(CASE WHEN event_type = 'signup' THEN value ELSE 0 END) AS s4,
        |    sum(CASE WHEN event_type = 'signup' THEN value*value ELSE 0 END) AS q4
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase','error','signup')
        |  GROUP BY 1),
        |f AS (SELECT shard, n, n0, n1, n2, n3, n4,
        |    ((((s0*s0/n0::DOUBLE + s1*s1/n1::DOUBLE) + s2*s2/n2::DOUBLE)
        |      + s3*s3/n3::DOUBLE) + s4*s4/n4::DOUBLE) AS ssb_part,
        |    ((((s0 + s1) + s2) + s3) + s4) AS s_tot,
        |    ((((q0 + q1) + q2) + q3) + q4) AS q_tot
        |  FROM a)
        |SELECT shard, n,
        |  round(CASE WHEN n0>=1 AND n1>=1 AND n2>=1 AND n3>=1 AND n4>=1 AND n>5
        |    THEN ssb_part - s_tot*s_tot/n::DOUBLE END, 6) AS ssb,
        |  round(CASE WHEN n0>=1 AND n1>=1 AND n2>=1 AND n3>=1 AND n4>=1 AND n>5
        |    THEN q_tot - ssb_part END, 6) AS ssw,
        |  round(CASE WHEN n0>=1 AND n1>=1 AND n2>=1 AND n3>=1 AND n4>=1 AND n>5
        |         AND (q_tot - ssb_part) > 0
        |    THEN ((ssb_part - s_tot*s_tot/n::DOUBLE) / 4.0)
        |       / ((q_tot - ssb_part) / (n::DOUBLE - 5.0)) END, 6) AS f_stat
        |FROM f ORDER BY 1""".stripMargin,

    // BH = reversed running min of p·m/rank; Holm = running max of
    // (m−rank+1)·p; p from integer char sums so the rank order is exact
    "q291_fdr" ->
      """WITH h AS (SELECT lang, source, sum(n_chars)::BIGINT AS sc
        |  FROM documents GROUP BY 1, 2),
        |p AS (SELECT lang, source, ((sc % 997) + 1)::DOUBLE / 997.0 AS p FROM h),
        |r AS (SELECT lang, source, p,
        |    count(*) OVER (PARTITION BY lang) AS m,
        |    row_number() OVER (PARTITION BY lang ORDER BY p, source) AS p_rank
        |  FROM p)
        |SELECT lang, source, round(p, 6) AS p, m::BIGINT AS m,
        |  p_rank::BIGINT AS p_rank,
        |  round(least(1.0, min(p * m::DOUBLE / p_rank::DOUBLE)
        |    OVER (PARTITION BY lang ORDER BY p DESC, source DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS p_bh,
        |  round(least(1.0, max((m - p_rank + 1)::DOUBLE * p)
        |    OVER (PARTITION BY lang ORDER BY p, source
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS p_holm
        |FROM r ORDER BY lang, source""".stripMargin,

    // Durbin–Levinson unrolled to lag 3: phi22/phi21 from rho1..2, pacf3
    // from the same closed-form rationals — token-for-token the Scala unroll
    "q292_pacf" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, v,
        |    lag(v,1) OVER w AS l1, lag(v,2) OVER w AS l2, lag(v,3) OVER w AS l3
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |a AS (SELECT event_type, corr(v, l1) AS r1, corr(v, l2) AS r2,
        |    corr(v, l3) AS r3
        |  FROM l GROUP BY 1),
        |dl AS (SELECT event_type, r1, r2, r3,
        |    (r2 - r1*r1) / (1.0 - r1*r1) AS phi22
        |  FROM a),
        |dl2 AS (SELECT event_type, r1, r2, r3, phi22,
        |    r1 - phi22*r1 AS phi21 FROM dl),
        |f AS (SELECT event_type, 1::BIGINT AS lag, r1 AS pacf FROM dl2
        |  UNION ALL SELECT event_type, 2::BIGINT, phi22 FROM dl2
        |  UNION ALL SELECT event_type, 3::BIGINT,
        |    (r3 - (phi21*r2 + phi22*r1)) / (1.0 - (phi21*r1 + phi22*r2)) FROM dl2)
        |SELECT event_type, lag, round(pacf, 6) AS pacf
        |FROM f ORDER BY event_type, lag""".stripMargin,

    // Chao1 = D + f1(f1−1)/(2(f2+1)) from the (lang, term) count table
    "q293_chao1" ->
      """WITH w AS (SELECT lang,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |t AS (SELECT lang, unnest(ws) AS term FROM w),
        |c AS (SELECT lang, term, count(*) AS c FROM t GROUP BY 1, 2)
        |SELECT lang, count(*)::BIGINT AS d_observed,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
        |  sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2,
        |  round(count(*)::DOUBLE +
        |    (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) *
        |     (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1))::DOUBLE /
        |    (2.0 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)::DOUBLE), 6) AS chao1
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // binary-segmentation top split: gain from exact integer prefix sums,
    // winner ranked on the 6-dp-rounded gain with bucket tie-break
    "q294_cpt" ->
      """WITH h AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket_start,
        |    count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2),
        |s AS (SELECT shard, bucket_start,
        |    row_number() OVER w AS i,
        |    (sum(cnt) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS cs,
        |    count(*) OVER (PARTITION BY shard) AS n,
        |    (sum(cnt) OVER (PARTITION BY shard))::DOUBLE AS stot
        |  FROM h WINDOW w AS (PARTITION BY shard ORDER BY bucket_start)),
        |g AS (SELECT shard, bucket_start, i, n, cs, stot,
        |    round(cs*cs / i::DOUBLE
        |        + (stot-cs)*(stot-cs) / (n-i)::DOUBLE
        |        - stot*stot / n::DOUBLE, 6) AS gain_r
        |  FROM s WHERE i < n),
        |p AS (SELECT *, row_number()
        |    OVER (PARTITION BY shard ORDER BY gain_r DESC, bucket_start) AS rk
        |  FROM g)
        |SELECT shard, n::BIGINT AS n, bucket_start AS split_ts,
        |  i::BIGINT AS n_left, (n - i)::BIGINT AS n_right,
        |  round(cs / i::DOUBLE, 6) AS mean_left,
        |  round((stot - cs) / (n - i)::DOUBLE, 6) AS mean_right,
        |  gain_r AS gain
        |FROM p WHERE rk = 1 ORDER BY shard""".stripMargin,

    // top-10 quotients s/d win; ties pinned by (key, divisor) in the cut
    "q295_dhondt" ->
      """WITH a AS (SELECT event_type AS key, count(*)::BIGINT AS score
        |  FROM events GROUP BY 1),
        |q AS (SELECT key, score, g.d AS divisor,
        |    score::DOUBLE / g.d::DOUBLE AS q
        |  FROM a, generate_series(1, 10) g(d)),
        |w AS (SELECT key FROM q ORDER BY q DESC, key, divisor LIMIT 10),
        |c AS (SELECT key, count(*)::BIGINT AS alloc FROM w GROUP BY 1)
        |SELECT a.key, a.score, coalesce(c.alloc, 0)::BIGINT AS alloc
        |FROM a LEFT JOIN c USING (key) ORDER BY key""".stripMargin,

    // median of Walsh averages (xi+xj)/2 over i <= j pairs (self-pairs in)
    "q296_hl" ->
      """WITH h AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket_start,
        |    count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2),
        |p AS (SELECT x.shard, (x.cnt + y.cnt) / 2.0 AS w
        |  FROM h x JOIN h y ON x.shard = y.shard
        |    AND x.bucket_start <= y.bucket_start),
        |n AS (SELECT shard, count(*)::BIGINT AS n_points FROM h GROUP BY 1)
        |SELECT n.shard, n.n_points,
        |  round(quantile_cont(p.w, 0.5), 6) AS hl_center
        |FROM p JOIN n ON p.shard = n.shard
        |GROUP BY n.shard, n.n_points ORDER BY 1""".stripMargin,

    // running sum of d/n over the ordered duration grain (censor-only rows
    // contribute exactly 0); survival_fh = exp(-H)
    "q297_nelson_aalen" ->
      """WITH subj AS (SELECT event_type,
        |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS t,
        |    CASE WHEN max(epoch_us(ts)) < 1706054400000000 THEN 1 ELSE 0 END AS e
        |  FROM events GROUP BY event_type, user_id),
        |g AS (SELECT event_type, t, sum(e) AS d, sum(1 - e) AS c
        |  FROM subj GROUP BY 1, 2),
        |r AS (SELECT *,
        |    sum(d + c) OVER (PARTITION BY event_type) -
        |    coalesce(sum(d + c) OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM g),
        |h AS (SELECT *,
        |    sum(d::DOUBLE / n_risk::DOUBLE) OVER (PARTITION BY event_type
        |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
        |  FROM r)
        |SELECT event_type, t, n_risk::BIGINT AS n_risk, d::BIGINT AS n_event,
        |  c::BIGINT AS n_censored, round(ch, 6) AS cum_hazard,
        |  round(exp(-ch), 6) AS survival_fh
        |FROM h WHERE d > 0 ORDER BY 1, 2""".stripMargin,

    // q83's Croston replay scaled by the SBA debias factor (1 - alpha/2)
    "q298_sba" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |g AS (SELECT user_id, d,
        |    CASE WHEN (epoch(d)::BIGINT // 86400) % 3 = 0 THEN v ELSE 0.0 END AS v
        |  FROM daily),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS idx,
        |    max(d) OVER (PARTITION BY user_id) AS last_d FROM g),
        |nz AS (SELECT user_id, last_d, idx, v,
        |    coalesce(idx - lag(idx) OVER w, idx) AS q,
        |    row_number() OVER w AS rn,
        |    row_number() OVER (PARTITION BY user_id ORDER BY idx DESC) - 1 AS back
        |  FROM r WHERE v <> 0 WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
        |lvl AS (SELECT user_id, max(last_d) AS last_d,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back)*v ELSE 0.3*power(0.7, back)*v END) AS z,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back)*q ELSE 0.3*power(0.7, back)*q END) AS p
        |  FROM nz GROUP BY 1)
        |SELECT user_id, epoch(last_d)::BIGINT + g2.s*86400 AS forecast_s, g2.s AS step,
        |  round(z/p * 0.85::DOUBLE, 6) AS yhat
        |FROM lvl, generate_series(1,3) g2(s) ORDER BY 1,3""".stripMargin,

    // ascending (cnt, bucket) rank; exact integer cumulative/total sums
    "q299_lorenz" ->
      """WITH h AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket_start,
        |    count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2),
        |l AS (SELECT shard, bucket_start, cnt,
        |    row_number() OVER w AS i,
        |    (sum(cnt) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS cs,
        |    count(*) OVER (PARTITION BY shard) AS n,
        |    (sum(cnt) OVER (PARTITION BY shard))::DOUBLE AS tot
        |  FROM h WINDOW w AS (PARTITION BY shard ORDER BY cnt, bucket_start))
        |SELECT shard, i::BIGINT AS i, bucket_start, cnt,
        |  round(i::DOUBLE / n::DOUBLE, 6) AS p_pop,
        |  round(cs / tot, 6) AS p_val
        |FROM l ORDER BY shard, i""".stripMargin,

    // q35's exact jaccard joined with the q32 md5 signature contract:
    // est = (1/8) sum of per-seed min-hash agreements
    "q300_mh_est" ->
      """WITH w AS (SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 60),
        |s AS (SELECT doc_id, lang, list_distinct(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM w),
        |d AS (SELECT doc_id, lang, sh, len(sh) AS n FROM s WHERE len(sh) > 0),
        |e AS (SELECT doc_id, lang, unnest(sh) AS g FROM d),
        |m AS (SELECT doc_id, lang,
        |    min(('0x' || substr(md5('0:' || g),1,15))::BIGINT) AS mh0,
        |    min(('0x' || substr(md5('1:' || g),1,15))::BIGINT) AS mh1,
        |    min(('0x' || substr(md5('2:' || g),1,15))::BIGINT) AS mh2,
        |    min(('0x' || substr(md5('3:' || g),1,15))::BIGINT) AS mh3,
        |    min(('0x' || substr(md5('4:' || g),1,15))::BIGINT) AS mh4,
        |    min(('0x' || substr(md5('5:' || g),1,15))::BIGINT) AS mh5,
        |    min(('0x' || substr(md5('6:' || g),1,15))::BIGINT) AS mh6,
        |    min(('0x' || substr(md5('7:' || g),1,15))::BIGINT) AS mh7
        |  FROM e GROUP BY 1, 2),
        |inter AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i2
        |  FROM e a JOIN e b ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3),
        |j AS (SELECT inter.lang, id_a, id_b,
        |    i2::DOUBLE / (x.n + y.n - i2) AS jac
        |  FROM inter
        |  JOIN d x ON x.doc_id = id_a AND x.lang = inter.lang
        |  JOIN d y ON y.doc_id = id_b AND y.lang = inter.lang),
        |f AS (SELECT j.lang, id_a, id_b, jac,
        |    ((CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END +
        |      CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END))::DOUBLE / 8.0 AS est
        |  FROM j
        |  JOIN m a ON a.doc_id = id_a AND a.lang = j.lang
        |  JOIN m b ON b.doc_id = id_b AND b.lang = j.lang)
        |SELECT lang, id_a, id_b, round(jac, 6) AS jaccard, round(est, 6) AS est,
        |  round(est - jac, 6) AS err
        |FROM f ORDER BY lang, id_a, id_b""".stripMargin,

    // q82's split replayed; d = squared-loss differential, DM = d̄/√(γ₀/n)
    "q301_dm" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rd FROM daily),
        |p1 AS (SELECT user_id, avg(v) AS p1 FROM r WHERE rd > 5 GROUP BY 1),
        |p2 AS (SELECT user_id, v AS p2 FROM r WHERE rd = 6),
        |t AS (SELECT r.user_id,
        |    (r.v - p1.p1)*(r.v - p1.p1) - (r.v - p2.p2)*(r.v - p2.p2) AS dd
        |  FROM r JOIN p1 USING (user_id) JOIN p2 USING (user_id) WHERE rd <= 5)
        |SELECT user_id, count(*) AS n, round(avg(dd), 6) AS mean_d,
        |  round(CASE WHEN var_pop(dd) > 0 AND count(*) >= 2
        |    THEN avg(dd) / sqrt(var_pop(dd) / count(*)) END, 6) AS dm_stat
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // classical two-proportion sizing; z-quantile literals added in-engine
    "q302_mde" ->
      """WITH e AS (SELECT event_type, event_id % 2 AS arm,
        |    CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS conv FROM events),
        |g AS (SELECT event_type,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS c_a,
        |    sum(conv)::BIGINT AS c, count(*)::BIGINT AS n
        |  FROM e GROUP BY 1),
        |f AS (SELECT event_type, n_a, n_b,
        |    c_a::DOUBLE / n_a::DOUBLE AS p_ctl, c::DOUBLE / n::DOUBLE AS pp,
        |    1.959963984540054::DOUBLE + 0.8416212335729143::DOUBLE AS zs
        |  FROM g),
        |m AS (SELECT event_type, n_a, n_b, p_ctl, pp, zs,
        |    zs * sqrt(pp * (1.0 - pp) * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS mde
        |  FROM f)
        |SELECT event_type, n_a, n_b, round(p_ctl, 6) AS p_control,
        |  round(pp, 6) AS p_pool, round(mde, 6) AS mde_abs,
        |  round(mde / p_ctl, 6) AS mde_rel,
        |  round(2.0 * pp * (1.0 - pp) * (zs * zs) /
        |    ((0.1::DOUBLE * p_ctl) * (0.1::DOUBLE * p_ctl)), 6) AS n_required
        |FROM m ORDER BY 1""".stripMargin,

    // corpus-wide top-20 words (exact-count cut, word tie-break), per-lang
    // relative frequencies densified with zeros, z-scored across langs,
    // Delta = mean |z_a − z_b|; σ=0 words excluded by null z in BOTH engines
    "q303_burrows" ->
      """WITH toks AS (SELECT lang, unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '')) AS word
        |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
        |cnt AS (SELECT lang, word, count(*)::BIGINT AS c FROM toks GROUP BY 1,2),
        |tot AS (SELECT lang, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
        |top AS (SELECT word FROM (SELECT word, sum(c) AS gc FROM cnt GROUP BY 1)
        |  ORDER BY gc DESC, word LIMIT 20),
        |dense AS (SELECT t.lang, p.word,
        |    coalesce(c.c, 0)::DOUBLE / t.n::DOUBLE AS f
        |  FROM tot t CROSS JOIN top p
        |  LEFT JOIN cnt c ON c.lang = t.lang AND c.word = p.word),
        |st AS (SELECT word, avg(f) AS mu, stddev_pop(f) AS sd FROM dense GROUP BY 1),
        |z AS (SELECT d.lang, d.word,
        |    CASE WHEN st.sd > 0 THEN (d.f - st.mu) / st.sd END AS z
        |  FROM dense d JOIN st USING (word))
        |SELECT a.lang AS lang_a, b.lang AS lang_b,
        |  count(abs(a.z - b.z))::BIGINT AS m_used,
        |  round(avg(abs(a.z - b.z)), 6) AS delta
        |FROM z a JOIN z b ON a.word = b.word AND a.lang < b.lang
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q156's bins replayed; REL/RES against the binned means, UNC = ō(1−ō)
    "q304_brier_decomp" ->
      """WITH st AS (SELECT min(value) AS lo, max(value) AS hi FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |b AS (SELECT CASE WHEN st.hi = st.lo THEN 0.0
        |      ELSE (value - st.lo) / (st.hi - st.lo) END AS p,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events, st WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |bb AS (SELECT least(9, greatest(0, CAST(floor(p * 10) AS BIGINT))) AS bin,
        |    p, y FROM b),
        |per AS (SELECT bin, count(*) AS nb, avg(y) AS acc, avg(p) AS conf
        |  FROM bb GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg((p - y) * (p - y)) AS brier,
        |    avg(y) AS ybar FROM bb)
        |SELECT max(tot.n)::BIGINT AS n, round(max(tot.brier), 6) AS brier,
        |  round(sum(per.nb * (per.conf - per.acc) * (per.conf - per.acc)
        |    / tot.n), 6) AS reliability,
        |  round(sum(per.nb * (per.acc - tot.ybar) * (per.acc - tot.ybar)
        |    / tot.n), 6) AS resolution,
        |  round(max(tot.ybar * (1.0 - tot.ybar)), 6) AS uncertainty
        |FROM per, tot""".stripMargin,

    // q82's split with a lag-1 naive: U2 = √(SSE_model / SSE_naive)
    "q305_theil_u" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY d) AS nv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rd FROM daily),
        |p AS (SELECT user_id, avg(v) AS p FROM r WHERE rd > 5 GROUP BY 1),
        |t AS (SELECT r.user_id, v, nv, p.p FROM r JOIN p USING (user_id)
        |  WHERE rd <= 5 AND nv IS NOT NULL)
        |SELECT user_id,
        |  round(CASE WHEN sum((nv - v) * (nv - v)) > 0
        |    THEN sqrt(sum((p - v) * (p - v)) / sum((nv - v) * (nv - v))) END, 6)
        |    AS theil_u,
        |  count(*) AS n
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // top-down = parent forecast × historical proportion; bottom-up = Σ
    // child forecasts per parent (the coherence column)
    "q306_reconcile" ->
      """WITH daily AS (SELECT (user_id % 4)::VARCHAR AS shard, user_id,
        |    date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2,3),
        |cfc AS (SELECT shard, user_id, avg(v) AS yhat FROM daily GROUP BY 1,2),
        |pdaily AS (SELECT shard, d, sum(v) AS pv FROM daily GROUP BY 1,2),
        |pfc AS (SELECT shard, avg(pv) AS pfc FROM pdaily GROUP BY 1),
        |ct AS (SELECT shard, user_id, sum(v) AS child_tot FROM daily GROUP BY 1,2),
        |pt AS (SELECT shard, sum(child_tot) AS parent_tot FROM ct GROUP BY 1),
        |bu AS (SELECT shard, sum(yhat) AS yhat_bu FROM cfc GROUP BY 1)
        |SELECT c.shard, c.user_id, round(c.yhat, 6) AS yhat_base,
        |  round(CASE WHEN pt.parent_tot <> 0
        |    THEN ct.child_tot / pt.parent_tot END, 6) AS prop,
        |  round(CASE WHEN pt.parent_tot <> 0
        |    THEN pfc.pfc * (ct.child_tot / pt.parent_tot) END, 6) AS yhat_td,
        |  round(bu.yhat_bu, 6) AS yhat_bu
        |FROM cfc c JOIN ct USING (shard, user_id) JOIN pt USING (shard)
        |  JOIN pfc USING (shard) JOIN bu USING (shard)
        |ORDER BY 1, 2""".stripMargin,

    // TSB: p = SES(indicator over ALL days, β=0.2, init = first indicator),
    // z = croston's size level (α=0.3); both as power-decay weighted sums
    "q307_tsb" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |g AS (SELECT user_id, d,
        |    CASE WHEN (epoch(d)::BIGINT // 86400) % 3 = 0 THEN v ELSE 0.0 END AS v
        |  FROM daily),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER w AS rn,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) - 1 AS back,
        |    max(d) OVER (PARTITION BY user_id) AS last_d
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |p AS (SELECT user_id, max(last_d) AS last_d,
        |    sum(CASE WHEN rn = 1 THEN power(0.8, back) ELSE 0.2*power(0.8, back) END
        |        * CASE WHEN v <> 0 THEN 1.0 ELSE 0.0 END) AS p
        |  FROM r GROUP BY 1),
        |nz AS (SELECT user_id, v,
        |    row_number() OVER w2 AS rn2,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) - 1 AS back2
        |  FROM g WHERE v <> 0 WINDOW w2 AS (PARTITION BY user_id ORDER BY d)),
        |z AS (SELECT user_id,
        |    sum(CASE WHEN rn2 = 1 THEN power(0.7, back2)*v
        |        ELSE 0.3*power(0.7, back2)*v END) AS z
        |  FROM nz GROUP BY 1)
        |SELECT p.user_id, epoch(p.last_d)::BIGINT + s.s*86400 AS forecast_s,
        |  s.s AS step, round(p.p * z.z, 6) AS yhat
        |FROM p JOIN z USING (user_id), generate_series(1,3) s(s)
        |ORDER BY 1, 3""".stripMargin,

    // TS_t = cumulative error / expanding MAD of the expanding-mean forecast
    "q308_tracking_signal" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |f AS (SELECT user_id, d, v,
        |    avg(v) OVER (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fc
        |  FROM daily),
        |e AS (SELECT user_id, d, v - fc AS err FROM f WHERE fc IS NOT NULL),
        |t AS (SELECT user_id, d,
        |    sum(err) OVER w AS cum_err, avg(abs(err)) OVER w AS mad
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, epoch(d)::BIGINT AS d_s, round(cum_err, 6) AS cum_err,
        |  round(mad, 6) AS mad,
        |  round(CASE WHEN mad > 0 THEN cum_err/mad END, 6) AS tsig,
        |  CASE WHEN mad > 0 AND abs(cum_err/mad) > 4.0 THEN 1 ELSE 0 END AS alarm
        |FROM t ORDER BY 1, 2""".stripMargin,

    "q309_fva" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |f AS (SELECT user_id, d, v,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY d) AS naive,
        |    avg(v) OVER (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fc
        |  FROM daily),
        |m AS (SELECT user_id, avg(abs(v - naive)) AS mae_naive,
        |    avg(abs(v - fc)) AS mae_model, count(*) AS n
        |  FROM f WHERE naive IS NOT NULL AND fc IS NOT NULL GROUP BY 1)
        |SELECT user_id, round(mae_naive, 6) AS mae_naive,
        |  round(mae_model, 6) AS mae_model,
        |  round(CASE WHEN mae_naive > 0
        |    THEN (mae_naive - mae_model) / mae_naive END, 6) AS fva, n
        |FROM m ORDER BY 1""".stripMargin,

    // inverse-MAE weights fit on train (rd > 5), scored on the 5-day test
    "q310_combo" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY d) AS naive,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rd
        |  FROM daily),
        |st AS (SELECT user_id, avg(abs(v - naive)) AS mae1, avg(v) AS m
        |  FROM r WHERE rd > 5 AND naive IS NOT NULL GROUP BY 1),
        |m2 AS (SELECT r.user_id, avg(abs(r.v - st.m)) AS mae2
        |  FROM r JOIN st USING (user_id)
        |  WHERE rd > 5 AND naive IS NOT NULL GROUP BY 1),
        |t AS (SELECT r.user_id, r.v, r.naive, st.m,
        |    CASE WHEN st.mae1 > 0 AND m2.mae2 > 0
        |      THEN (1.0/st.mae1) / (1.0/st.mae1 + 1.0/m2.mae2) END AS w1
        |  FROM r JOIN st USING (user_id) JOIN m2 USING (user_id)
        |  WHERE rd <= 5)
        |SELECT user_id, round(max(w1), 6) AS w_naive,
        |  round(avg(abs(v - (w1*naive + (1.0 - w1)*m))), 6) AS mae_combo,
        |  count(*) AS n_test
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // δ = 2U/(n_a·n_b) − 1 from the tie-averaged rank-sum U (q272 plumbing)
    "q311_cliffs_delta" ->
      """WITH b AS (SELECT event_type, (user_id % 2)::VARCHAR AS shard, value
        |  FROM events),
        |r AS (SELECT *, rank() OVER (PARTITION BY event_type ORDER BY value) AS rk,
        |    count(*) OVER (PARTITION BY event_type, value) AS tc FROM b),
        |a AS (SELECT event_type,
        |    sum(CASE WHEN shard = '0' THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN shard = '1' THEN 1 ELSE 0 END) AS n_b,
        |    sum(CASE WHEN shard = '0' THEN rk + (tc - 1) / 2.0 ELSE 0 END) AS ra
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
        |  round(CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    2.0 * (ra - n_a * (n_a + 1) / 2.0) / (n_a::DOUBLE * n_b) - 1 END, 6)
        |    AS delta
        |FROM a ORDER BY 1""".stripMargin,

    // pair-count×gap closed form: Σ|x−y| = Σ g·(sr·(nc−sc)+sc·(nr−sr)),
    // Σ|x−x'| = 2·Σ g·sr·(nr−sr); D² = 2E|XY| − E|XX'| − E|YY'|
    "q312_energy_dist" ->
      """WITH b AS (SELECT event_type, (user_id % 2) AS shard, value AS v
        |  FROM events WHERE value IS NOT NULL),
        |pv AS (SELECT event_type, v,
        |    sum(CASE WHEN shard = 0 THEN 1 ELSE 0 END) AS cr,
        |    sum(CASE WHEN shard = 1 THEN 1 ELSE 0 END) AS cc
        |  FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, v, cr, cc,
        |    sum(cr) OVER w AS sr, sum(cc) OVER w AS sc,
        |    sum(cr) OVER (PARTITION BY event_type) AS nr,
        |    sum(cc) OVER (PARTITION BY event_type) AS nc,
        |    lead(v) OVER (PARTITION BY event_type ORDER BY v) - v AS gap
        |  FROM pv WINDOW w AS (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, nr, nc,
        |    sum(CASE WHEN gap IS NOT NULL
        |      THEN gap * (sr*(nc-sc) + sc*(nr-sr)) END) AS sxy,
        |    sum(CASE WHEN gap IS NOT NULL THEN gap * sr * (nr-sr) END) AS sxx,
        |    sum(CASE WHEN gap IS NOT NULL THEN gap * sc * (nc-sc) END) AS syy
        |  FROM c WHERE nr > 0 AND nc > 0 GROUP BY 1, 2, 3),
        |d AS (SELECT event_type, nr, nc,
        |    2.0*coalesce(sxy, 0.0)/(nr*nc) - 2.0*coalesce(sxx, 0.0)/(nr*nr)
        |      - 2.0*coalesce(syy, 0.0)/(nc*nc) AS d2
        |  FROM s)
        |SELECT event_type, round(sqrt(greatest(d2, 0.0)), 6) AS energy_dist,
        |  round(d2, 6) AS d2, nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
        |FROM d ORDER BY 1""".stripMargin,

    // ECDF form: T = nm/(n+m)² · Σ_z multiplicity·(F_n − G_m)²
    "q313_cvm" ->
      """WITH b AS (SELECT event_type, (user_id % 2) AS shard, value AS v
        |  FROM events WHERE value IS NOT NULL),
        |pv AS (SELECT event_type, v,
        |    sum(CASE WHEN shard = 0 THEN 1 ELSE 0 END) AS cr,
        |    sum(CASE WHEN shard = 1 THEN 1 ELSE 0 END) AS cc
        |  FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, v, cr, cc,
        |    sum(cr) OVER w AS sr, sum(cc) OVER w AS sc,
        |    sum(cr) OVER (PARTITION BY event_type) AS nr,
        |    sum(cc) OVER (PARTITION BY event_type) AS nc
        |  FROM pv WINDOW w AS (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, nr, nc,
        |    sum((cr + cc) * power(sr::DOUBLE/nr - sc::DOUBLE/nc, 2)) AS t
        |  FROM c WHERE nr > 0 AND nc > 0 GROUP BY 1, 2, 3)
        |SELECT event_type,
        |  round(t * nr * nc / power(nr + nc, 2), 6) AS cvm,
        |  nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
        |FROM s ORDER BY 1""".stripMargin,

    // Pearson over edges of (out-degree of src, in-degree of dst)
    "q314_assortativity" ->
      """WITH e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |od AS (SELECT src, count(*) AS odeg FROM e GROUP BY 1),
        |idg AS (SELECT dst, count(*) AS ideg FROM e GROUP BY 1),
        |j AS (SELECT od.odeg::DOUBLE AS x, idg.ideg::DOUBLE AS y
        |  FROM e JOIN od USING (src) JOIN idg USING (dst)),
        |m AS (SELECT count(*) AS n_edges, count(*)::DOUBLE AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM j)
        |SELECT round(CASE WHEN sqrt(greatest(n*sxx - sx*sx, 0.0)) *
        |    sqrt(greatest(n*syy - sy*sy, 0.0)) > 0
        |  THEN (n*sxy - sx*sy) / (sqrt(greatest(n*sxx - sx*sx, 0.0)) *
        |    sqrt(greatest(n*syy - sy*sy, 0.0))) END, 6) AS assortativity,
        |  n_edges
        |FROM m""".stripMargin,

    "q315_reciprocity" ->
      """WITH e0 AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |m AS (SELECT count(*) AS n_reciprocal FROM e
        |  WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.src = e.dst AND e2.dst = e.src))
        |SELECT (SELECT count(*) FROM e) AS n_edges, m.n_reciprocal,
        |  round(m.n_reciprocal::DOUBLE / (SELECT count(*) FROM e), 6) AS reciprocity
        |FROM m""".stripMargin,

    // PH_t = m_t − min_{i≤t} m_i with m_t = Σ(x − running mean − δ)
    "q316_page_hinkley" ->
      """WITH h AS (SELECT event_type,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket_start,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, bucket_start, cnt,
        |    avg(cnt) OVER w AS run_mean
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (SELECT event_type, bucket_start, run_mean,
        |    sum(cnt - run_mean - 0.5) OVER w AS mt
        |  FROM m WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT event_type, bucket_start, run_mean,
        |    mt - min(mt) OVER w AS ph
        |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket_start, round(run_mean, 6) AS run_mean,
        |  round(ph, 6) AS ph, CASE WHEN ph > 10.0 THEN 1 ELSE 0 END AS alarm
        |FROM p ORDER BY 1, 2""".stripMargin,

    // MSE = bias² + (s_f−s_y)² + 2(s_f·s_y − cov); population moments
    "q317_mse_decomp" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT user_id, d, v,
        |    lag(v) OVER (PARTITION BY user_id ORDER BY d) AS nv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rd
        |  FROM daily),
        |t AS (SELECT user_id, v, nv FROM r WHERE rd <= 5 AND nv IS NOT NULL),
        |g AS (SELECT user_id, count(*)::DOUBLE AS n, avg(v) AS my, avg(nv) AS mf,
        |    avg(v*v) AS myy, avg(nv*nv) AS mff, avg(nv*v) AS mfy
        |  FROM t GROUP BY 1),
        |d AS (SELECT user_id, n,
        |    sqrt(greatest(myy - my*my, 0.0)) AS sy,
        |    sqrt(greatest(mff - mf*mf, 0.0)) AS sf,
        |    mfy - mf*my AS cov, mff - 2.0*mfy + myy AS mse,
        |    (mf - my)*(mf - my) AS bias_part
        |  FROM g)
        |SELECT user_id, n::BIGINT AS n, round(mse, 6) AS mse,
        |  round(bias_part, 6) AS bias_part,
        |  round((sf - sy)*(sf - sy), 6) AS var_part,
        |  round(2.0*(sf*sy - cov), 6) AS cov_part,
        |  round(CASE WHEN mse > 0 THEN bias_part/mse END, 6) AS um,
        |  round(CASE WHEN mse > 0 THEN (sf - sy)*(sf - sy)/mse END, 6) AS us,
        |  round(CASE WHEN mse > 0 THEN 2.0*(sf*sy - cov)/mse END, 6) AS uc
        |FROM d ORDER BY 1""".stripMargin,

    // centered-moment Cramer: restricted y~y₁, unrestricted y~y₁+x₁;
    // F = (RSS_r − RSS_u)/(RSS_u/(n−3))
    "q318_granger" ->
      """WITH daily AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END) AS x,
        |    sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END) AS y
        |  FROM events WHERE event_type IN ('click','view') GROUP BY 1, 2),
        |l AS (SELECT shard, d, y AS y0, lag(y) OVER w AS l1, lag(x) OVER w AS l2
        |  FROM daily WINDOW w AS (PARTITION BY shard ORDER BY d)),
        |f AS (SELECT * FROM l WHERE l1 IS NOT NULL AND l2 IS NOT NULL),
        |c AS (SELECT shard, y0 - avg(y0) OVER p AS cy, l1 - avg(l1) OVER p AS c1,
        |    l2 - avg(l2) OVER p AS c2
        |  FROM f WINDOW p AS (PARTITION BY shard)),
        |g AS (SELECT shard, count(*) AS n, sum(c1*c1) AS s11, sum(c2*c2) AS s22,
        |    sum(c1*c2) AS s12, sum(cy*c1) AS s1y, sum(cy*c2) AS s2y,
        |    sum(cy*cy) AS syy
        |  FROM c GROUP BY 1),
        |u AS (SELECT shard, n,
        |    CASE WHEN s11 > 0 THEN syy - s1y*s1y/s11 END AS rss_r,
        |    syy - (CASE WHEN s11*s22 - s12*s12 > 0
        |        THEN (s1y*s22 - s2y*s12)/(s11*s22 - s12*s12) END)*s1y
        |      - (CASE WHEN s11*s22 - s12*s12 > 0
        |        THEN (s11*s2y - s12*s1y)/(s11*s22 - s12*s12) END)*s2y AS rss_u
        |  FROM g)
        |SELECT shard, n, round(rss_r, 6) AS rss_r, round(rss_u, 6) AS rss_u,
        |  round(CASE WHEN rss_u > 0 AND n > 3
        |    THEN (rss_r - rss_u)/(rss_u/(n - 3.0)) END, 6) AS f_stat
        |FROM u ORDER BY 1""".stripMargin,

    // U_t = cumsum(2·midrank − (n+1)) in time order (exact half-integers);
    // K = max |U_t| for t < n; p ≈ 2exp(−6K²/(n³+n²))
    "q319_pettitt" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, d,
        |    rank() OVER (PARTITION BY user_id ORDER BY v)
        |      + (count(*) OVER (PARTITION BY user_id, v) - 1)/2.0 AS mid,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM daily),
        |u AS (SELECT user_id, d, n,
        |    sum(2.0*mid - (n + 1)) OVER (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ut,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rt
        |  FROM r),
        |k AS (SELECT user_id, n, d, ut,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY abs(ut) DESC, d) AS rk
        |  FROM u WHERE rt < n)
        |SELECT user_id, n, round(abs(ut), 6) AS u_max,
        |  epoch(d)::BIGINT AS split_s,
        |  round(2.0*exp(-6.0*ut*ut/(n::DOUBLE*n*n + n::DOUBLE*n)), 6) AS p_approx
        |FROM k WHERE rk = 1 ORDER BY 1""".stripMargin,

    // d = Δmean/s_pool (sample variances), g = d·(1 − 3/(4N−9))
    "q320_hedges" ->
      """WITH a AS (SELECT event_type,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END) AS sa,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END) AS sb,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value*value ELSE 0 END) AS qa,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value*value ELSE 0 END) AS qb
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |v AS (SELECT event_type, n_a, n_b,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        |      ((qa - sa*sa/n_a::DOUBLE) + (qb - sb*sb/n_b::DOUBLE))
        |        / (n_a::DOUBLE + n_b - 2) END AS vp,
        |    sa/n_a::DOUBLE - sb/n_b::DOUBLE AS dm
        |  FROM a)
        |SELECT event_type, n_a, n_b,
        |  round(CASE WHEN vp > 0 THEN dm/sqrt(vp) END, 6) AS cohen_d,
        |  round(CASE WHEN vp > 0 THEN dm/sqrt(vp) END
        |    * (1.0 - 3.0/(4.0*(n_a + n_b) - 9)), 6) AS hedges_g
        |FROM v ORDER BY 1""".stripMargin,

    // q290's anovaF formula (k=3) on |value − per-(day,arm) median|
    "q321_brown_forsythe" ->
      """WITH b AS (SELECT day(ts) AS day, event_type, value FROM events
        |  WHERE event_type IN ('click','view','purchase') AND value IS NOT NULL),
        |med AS (SELECT day, event_type, quantile_cont(value, 0.5) AS med
        |  FROM b GROUP BY 1, 2),
        |c AS (SELECT b.day, b.event_type, abs(b.value - med.med) AS adev
        |  FROM b JOIN med USING (day, event_type)),
        |a AS (SELECT day, count(*)::BIGINT AS n,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN event_type = 'click' THEN adev ELSE 0 END) AS s0,
        |    sum(CASE WHEN event_type = 'click' THEN adev*adev ELSE 0 END) AS q0,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN event_type = 'view' THEN adev ELSE 0 END) AS s1,
        |    sum(CASE WHEN event_type = 'view' THEN adev*adev ELSE 0 END) AS q1,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN event_type = 'purchase' THEN adev ELSE 0 END) AS s2,
        |    sum(CASE WHEN event_type = 'purchase' THEN adev*adev ELSE 0 END) AS q2
        |  FROM c GROUP BY 1),
        |f AS (SELECT day, n, n0, n1, n2,
        |    ((s0*s0/n0::DOUBLE + s1*s1/n1::DOUBLE) + s2*s2/n2::DOUBLE) AS ssb_part,
        |    ((s0 + s1) + s2) AS s_tot, ((q0 + q1) + q2) AS q_tot
        |  FROM a)
        |SELECT day, n,
        |  round(CASE WHEN n0>=1 AND n1>=1 AND n2>=1 AND n>3
        |    THEN ssb_part - s_tot*s_tot/n::DOUBLE END, 6) AS ssb,
        |  round(CASE WHEN n0>=1 AND n1>=1 AND n2>=1 AND n>3
        |    THEN q_tot - ssb_part END, 6) AS ssw,
        |  round(CASE WHEN n0>=1 AND n1>=1 AND n2>=1 AND n>3
        |         AND (q_tot - ssb_part) > 0
        |    THEN ((ssb_part - s_tot*s_tot/n::DOUBLE) / 2.0)
        |       / ((q_tot - ssb_part) / (n::DOUBLE - 3.0)) END, 6) AS f_stat
        |FROM f ORDER BY 1""".stripMargin,

    // G = max|x−x̄|/s (sample sd); outlier value via arg_max on |dev|
    "q322_grubbs" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, count(*)::BIGINT AS n, avg(v) AS mean,
        |    sum(v*v) AS q, sum(v) AS s
        |  FROM daily GROUP BY 1),
        |mm AS (SELECT user_id, n, mean,
        |    CASE WHEN n > 1 THEN
        |      sqrt(greatest((q - s*s/n::DOUBLE)/(n::DOUBLE - 1), 0.0)) END AS sd
        |  FROM m),
        |g AS (SELECT d.user_id, mm.n, mm.sd,
        |    max(abs(d.v - mm.mean)) AS dev,
        |    arg_max(d.v, abs(d.v - mm.mean)) AS ov
        |  FROM daily d JOIN mm USING (user_id) GROUP BY 1, 2, 3)
        |SELECT user_id, n,
        |  round(CASE WHEN sd > 0 AND n >= 3 THEN dev/sd END, 6) AS g_stat,
        |  round(ov, 6) AS outlier_value
        |FROM g ORDER BY 1""".stripMargin,

    // runs of above/below-median signs (equal-to-median rows dropped)
    "q323_runs" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT user_id, quantile_cont(v, 0.5) AS med FROM daily GROUP BY 1),
        |s AS (SELECT d.user_id, d.d,
        |    CASE WHEN d.v > med.med THEN 1 ELSE 0 END AS sg
        |  FROM daily d JOIN med USING (user_id) WHERE d.v <> med.med),
        |c AS (SELECT user_id, sg,
        |    CASE WHEN lag(sg) OVER w IS NULL THEN 1
        |         WHEN sg <> lag(sg) OVER w THEN 1 ELSE 0 END AS chg
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, sum(sg)::BIGINT AS n_above,
        |    sum(1 - sg)::BIGINT AS n_below, sum(chg)::BIGINT AS runs
        |  FROM c GROUP BY 1)
        |SELECT user_id, n_above, n_below, runs,
        |  round(CASE WHEN n_above > 0 AND n_below > 0
        |      AND 2.0*n_above*n_below*(2.0*n_above*n_below - (n_above + n_below))
        |        / ((n_above + n_below)::DOUBLE*(n_above + n_below)
        |           *(n_above + n_below - 1)) > 0
        |    THEN (runs - (2.0*n_above*n_below/(n_above + n_below) + 1))
        |      / sqrt(2.0*n_above*n_below*(2.0*n_above*n_below - (n_above + n_below))
        |        / ((n_above + n_below)::DOUBLE*(n_above + n_below)
        |           *(n_above + n_below - 1))) END, 6) AS z
        |FROM a ORDER BY 1""".stripMargin,

    // Fisher recursion from one nine-moment pass over complete daily rows
    "q324_partial_corr" ->
      """WITH daily AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END) AS x,
        |    sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END) AS y,
        |    sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS z
        |  FROM events WHERE event_type IN ('click','view','purchase')
        |  GROUP BY 1, 2),
        |g AS (SELECT shard, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(z) AS sz, sum(x*x) AS sxx, sum(y*y) AS syy, sum(z*z) AS szz,
        |    sum(x*y) AS sxy, sum(x*z) AS sxz, sum(y*z) AS syz
        |  FROM daily GROUP BY 1),
        |r AS (SELECT shard, n,
        |    CASE WHEN sqrt(greatest(n*sxx - sx*sx, 0.0))
        |        * sqrt(greatest(n*syy - sy*sy, 0.0)) > 0
        |      THEN (n*sxy - sx*sy) / (sqrt(greatest(n*sxx - sx*sx, 0.0))
        |        * sqrt(greatest(n*syy - sy*sy, 0.0))) END AS r_xy,
        |    CASE WHEN sqrt(greatest(n*sxx - sx*sx, 0.0))
        |        * sqrt(greatest(n*szz - sz*sz, 0.0)) > 0
        |      THEN (n*sxz - sx*sz) / (sqrt(greatest(n*sxx - sx*sx, 0.0))
        |        * sqrt(greatest(n*szz - sz*sz, 0.0))) END AS r_xz,
        |    CASE WHEN sqrt(greatest(n*syy - sy*sy, 0.0))
        |        * sqrt(greatest(n*szz - sz*sz, 0.0)) > 0
        |      THEN (n*syz - sy*sz) / (sqrt(greatest(n*syy - sy*sy, 0.0))
        |        * sqrt(greatest(n*szz - sz*sz, 0.0))) END AS r_yz
        |  FROM g)
        |SELECT shard, n::BIGINT AS n, round(r_xy, 6) AS r_xy,
        |  round(r_xz, 6) AS r_xz, round(r_yz, 6) AS r_yz,
        |  round(CASE WHEN sqrt(greatest((1.0 - r_xz*r_xz)*(1.0 - r_yz*r_yz), 0.0)) > 0
        |    THEN (r_xy - r_xz*r_yz)
        |      / sqrt(greatest((1.0 - r_xz*r_xz)*(1.0 - r_yz*r_yz), 0.0)) END, 6)
        |    AS r_xy_z
        |FROM r ORDER BY 1""".stripMargin,

    // pooled midranks; H = 12/(N(N+1))·ΣR²/n − 3(N+1), tie-corrected by
    // C = 1 − Σ(t³−t)/(N³−N) with Σ counted per row as t²−1
    "q325_kruskal" ->
      """WITH b AS (SELECT day(ts) AS day, event_type, value FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT day, event_type,
        |    rank() OVER (PARTITION BY day ORDER BY value)
        |      + (count(*) OVER (PARTITION BY day, value) - 1)/2.0 AS mid,
        |    count(*) OVER (PARTITION BY day, value) AS tc
        |  FROM b),
        |pa AS (SELECT day, event_type, count(*)::BIGINT AS ng,
        |    sum(mid) AS rg, sum(tc*tc - 1) AS tie
        |  FROM r GROUP BY 1, 2),
        |g AS (SELECT day, sum(ng)::BIGINT AS n, count(*)::BIGINT AS n_arms,
        |    sum(rg*rg/ng::DOUBLE) AS rr, sum(tie) AS ties
        |  FROM pa GROUP BY 1)
        |SELECT day, n, n_arms,
        |  round(12.0/(n::DOUBLE*(n + 1)) * rr - 3.0*(n + 1), 6) AS h_raw,
        |  round(CASE WHEN 1.0 - ties::DOUBLE/(n::DOUBLE*n*n - n) > 0
        |    THEN (12.0/(n::DOUBLE*(n + 1)) * rr - 3.0*(n + 1))
        |      / (1.0 - ties::DOUBLE/(n::DOUBLE*n*n - n)) END, 6) AS h_stat
        |FROM g ORDER BY 1""".stripMargin,

    // strict interior extrema: (x−prev)(x−next) > 0; z vs 2(n−2)/3
    "q326_turning" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, v,
        |    lag(v) OVER w AS p, lead(v) OVER w AS f
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(CASE WHEN p IS NOT NULL AND f IS NOT NULL
        |      AND (v - p)*(v - f) > 0 THEN 1 ELSE 0 END)::BIGINT AS turning_points
        |  FROM l GROUP BY 1)
        |SELECT user_id, n, turning_points,
        |  round(CASE WHEN n >= 4 THEN
        |    (turning_points - 2.0*(n - 2)/3) / sqrt((16.0*n - 29)/90) END, 6) AS z
        |FROM a ORDER BY 1""".stripMargin,

    // VR(2) = Var(y_t − y_{t−2}) / (2·Var(y_t − y_{t−1})), population vars
    "q327_vr" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, v - lag(v, 1) OVER w AS d1,
        |    v - lag(v, 2) OVER w AS dq
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, count(d1)::BIGINT AS n_diff1,
        |    count(dq)::BIGINT AS n_diffq,
        |    avg(d1) AS m1, avg(d1*d1) AS q1, avg(dq) AS mq, avg(dq*dq) AS qq
        |  FROM l GROUP BY 1)
        |SELECT user_id, n_diff1, n_diffq,
        |  round(CASE WHEN q1 - m1*m1 > 0 AND n_diffq > 0
        |    THEN (qq - mq*mq) / (2.0*(q1 - m1*m1)) END, 6) AS vr
        |FROM a ORDER BY 1""".stripMargin,

    // DW = Σ(e_t − e_{t−1})²/Σe², e = lag-1-naive residual; the lag runs
    // WITHIN the residual frame (first day dropped before differencing)
    "q328_dw" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, d,
        |    v - lag(v) OVER (PARTITION BY user_id ORDER BY d) AS e FROM daily),
        |f AS (SELECT user_id, d, e FROM r WHERE e IS NOT NULL),
        |c AS (SELECT user_id, e,
        |    e - lag(e) OVER (PARTITION BY user_id ORDER BY d) AS de FROM f),
        |a AS (SELECT user_id, count(*) AS n, sum(de*de) AS num, sum(e*e) AS den
        |  FROM c GROUP BY 1)
        |SELECT user_id, n, round(CASE WHEN den > 0 THEN num/den END, 6) AS dw
        |FROM a ORDER BY 1""".stripMargin,

    // CRPS = mean|x−y| − ps/n² with ps = Σ(2i−n−1)x₍ᵢ₎ = Σ_{i<j}|xᵢ−xⱼ|;
    // integer-cents measures make every sum exact → per-row bit parity
    "q329_crps" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100, 0))::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rd
        |  FROM daily),
        |ens AS (SELECT user_id, v FROM rk WHERE rd > 5),
        |obs AS (SELECT user_id, epoch(d)::BIGINT AS od, v AS y FROM rk WHERE rd <= 5),
        |wr AS (SELECT user_id, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY v) AS i,
        |    count(*) OVER (PARTITION BY user_id) AS ne FROM ens),
        |wi AS (SELECT user_id, max(ne)::DOUBLE AS ne,
        |    sum((2.0*i - ne - 1) * v) AS ps FROM wr GROUP BY 1),
        |cr AS (SELECT e.user_id, o.od, avg(abs(e.v - o.y)) AS exy
        |  FROM ens e JOIN obs o USING (user_id) GROUP BY 1, 2)
        |SELECT cr.user_id, cr.od, wi.ne::BIGINT AS n_ens,
        |  round((cr.exy - 0.5 * (2.0 * wi.ps / (wi.ne*wi.ne))) / 100, 6) AS crps
        |FROM cr JOIN wi USING (user_id)
        |ORDER BY 1, 2""".stripMargin,

    // A = 1 − EDE/μ, EDE = (mean(x^0.5))² for ε = 0.5
    "q330_atkinson" ->
      """WITH h AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS b,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |a AS (SELECT shard, count(*) AS n, avg(cnt) AS mean,
        |    avg(power(cnt, 0.5)) AS me
        |  FROM h WHERE cnt > 0 GROUP BY 1)
        |SELECT shard, n, round(mean, 6) AS mean,
        |  round(power(me, 2.0), 6) AS ede,
        |  round(CASE WHEN mean > 0 THEN 1.0 - power(me, 2.0)/mean END, 6)
        |    AS atkinson
        |FROM a ORDER BY 1""".stripMargin,

    // T = mean((x/μ)·ln(x/μ)) over positive values
    "q331_theil_ineq" ->
      """WITH h AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS b,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |p AS (SELECT shard, b, cnt FROM h WHERE cnt > 0),
        |m AS (SELECT shard, avg(cnt) AS mu, count(*) AS n FROM p GROUP BY 1),
        |t AS (SELECT p.shard, m.n, max(m.mu) AS mean,
        |    avg((p.cnt/m.mu) * ln(p.cnt/m.mu)) AS tt
        |  FROM p JOIN m USING (shard) GROUP BY 1, 2)
        |SELECT shard, n, round(mean, 6) AS mean, round(tt, 6) AS theil_t
        |FROM t ORDER BY 1""".stripMargin,

    // integer rank cuts: top = rank > n − n//10, bottom = rank ≤ (4n)//10
    "q332_palma" ->
      """WITH h AS (SELECT (user_id % 4)::VARCHAR AS shard,
        |    floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS b,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT shard, b, cnt,
        |    row_number() OVER (PARTITION BY shard ORDER BY cnt, b) AS rk,
        |    count(*) OVER (PARTITION BY shard) AS n FROM h),
        |a AS (SELECT shard, max(n) AS n, sum(cnt) AS tot,
        |    sum(CASE WHEN rk > n - n//10 THEN cnt ELSE 0.0 END) AS top,
        |    sum(CASE WHEN rk <= (4*n)//10 THEN cnt ELSE 0.0 END) AS bot
        |  FROM r GROUP BY 1)
        |SELECT shard, n::BIGINT AS n,
        |  round(CASE WHEN tot <> 0 THEN top/tot END, 6) AS top_share,
        |  round(CASE WHEN tot <> 0 THEN bot/tot END, 6) AS bottom_share,
        |  round(CASE WHEN n >= 10 AND bot > 0 THEN top/bot END, 6) AS palma
        |FROM a ORDER BY 1""".stripMargin,

    // Bartlett weights 2(1−l/4) = 1.5/1.0/0.5 at L=3; fixed fold order
    "q333_newey_west" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |e AS (SELECT user_id, d, v,
        |    v - avg(v) OVER (PARTITION BY user_id) AS e,
        |    avg(v) OVER (PARTITION BY user_id) AS m FROM daily),
        |l AS (SELECT user_id, e, m, lag(e, 1) OVER w AS e1,
        |    lag(e, 2) OVER w AS e2, lag(e, 3) OVER w AS e3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, count(*) AS n, max(m) AS mean, sum(e*e) AS g0,
        |    sum(e*e1) AS g1, sum(e*e2) AS g2, sum(e*e3) AS g3
        |  FROM l GROUP BY 1)
        |SELECT user_id, n, round(mean, 6) AS mean,
        |  round(sqrt(g0/n::DOUBLE/n::DOUBLE), 6) AS se_iid,
        |  round(sqrt(greatest((((g0/n::DOUBLE
        |    + 1.5*(coalesce(g1, 0.0)/n::DOUBLE))
        |    + 1.0*(coalesce(g2, 0.0)/n::DOUBLE))
        |    + 0.5*(coalesce(g3, 0.0)/n::DOUBLE)), 0.0)/n::DOUBLE), 6) AS se_nw
        |FROM a ORDER BY 1""".stripMargin,

    // α = 1 + n/Σln(k/(kmin−0.5)) over in-degrees k ≥ kmin = 2
    "q334_powerlaw" ->
      """WITH e AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |dg AS (SELECT dst, count(*) AS k FROM e GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_nodes,
        |    sum(ln(k::DOUBLE / 1.5)) AS ls FROM dg WHERE k >= 2)
        |SELECT 2::BIGINT AS kmin, n_nodes,
        |  round(CASE WHEN ls > 0 THEN 1.0 + n_nodes::DOUBLE/ls END, 6) AS alpha
        |FROM a""".stripMargin,

    // Q = Σ_c (e_c/m − (d_c/2m)²) over the undirected simple graph with
    // the deterministic doc_id%7 partition
    "q335_modularity" ->
      """WITH e0 AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |  FROM e0 WHERE src <> dst),
        |lab AS (SELECT doc_id AS id, doc_id % 7 AS c FROM documents),
        |t AS (SELECT und.x, und.y, lx.c AS cx, ly.c AS cy
        |  FROM und JOIN lab lx ON lx.id = und.x JOIN lab ly ON ly.id = und.y),
        |mm AS (SELECT count(*)::BIGINT AS m FROM t),
        |wi AS (SELECT cx AS community, count(*)::BIGINT AS ec FROM t
        |  WHERE cx = cy GROUP BY 1),
        |dgr AS (SELECT c AS community, count(*)::BIGINT AS dc FROM
        |  (SELECT x AS id, cx AS c FROM t UNION ALL SELECT y, cy FROM t)
        |  GROUP BY 1),
        |f AS (SELECT dgr.community,
        |    coalesce(wi.ec, 0)::DOUBLE/(SELECT m FROM mm)
        |      - (dgr.dc::DOUBLE/(2.0*(SELECT m FROM mm)))
        |        * (dgr.dc::DOUBLE/(2.0*(SELECT m FROM mm))) AS term
        |  FROM dgr LEFT JOIN wi USING (community))
        |SELECT (SELECT m FROM mm) AS m, count(*)::BIGINT AS n_communities,
        |  round(sum(term), 6) AS modularity
        |FROM f""".stripMargin,

    // ∫₀^τ S dt over q271's KM curve: Σ S(t_{i−1})·Δt + tail to τ = 25
    "q336_rmst" ->
      """WITH subj AS (SELECT event_type,
        |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS t,
        |    CASE WHEN max(epoch_us(ts)) < 1706054400000000 THEN 1 ELSE 0 END AS e
        |  FROM events GROUP BY event_type, user_id),
        |g AS (SELECT event_type, t, sum(e) AS d, sum(1 - e) AS c
        |  FROM subj GROUP BY 1, 2),
        |r AS (SELECT *,
        |    sum(d + c) OVER (PARTITION BY event_type) -
        |    coalesce(sum(d + c) OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM g),
        |s AS (SELECT *,
        |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w = 1
        |         THEN 0.0
        |         ELSE exp(sum(ln(1 - d::DOUBLE / n_risk::DOUBLE)) OVER w)
        |    END AS surv
        |  FROM r WINDOW w AS (PARTITION BY event_type ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |k AS (SELECT event_type, t, surv FROM s WHERE d > 0 AND t <= 25),
        |seg AS (SELECT event_type, t, surv,
        |    coalesce(lag(t) OVER w, 0) AS pt,
        |    coalesce(lag(surv) OVER w, 1.0) AS ps
        |  FROM k WINDOW w AS (PARTITION BY event_type ORDER BY t)),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_times,
        |    sum(ps * (t - pt)::DOUBLE) AS body,
        |    arg_max(surv, t) AS lasts, max(t) AS lastt
        |  FROM seg GROUP BY 1)
        |SELECT event_type, 25::BIGINT AS tau, n_times,
        |  round(body + lasts * (25 - lastt)::DOUBLE, 6) AS rmst
        |FROM a ORDER BY 1""".stripMargin,

    // envelope = rolling min/max of the mean profile over ±2 days; LB =
    // Σ squared exceedance outside [L, U]
    "q337_lb_keogh" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |ref AS (SELECT d, avg(v) AS rv FROM daily GROUP BY 1),
        |env AS (SELECT d, max(rv) OVER w AS u, min(rv) OVER w AS l
        |  FROM ref WINDOW w AS (ORDER BY d
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |j AS (SELECT daily.user_id, daily.v, env.u, env.l
        |  FROM daily JOIN env USING (d)),
        |a AS (SELECT user_id,
        |    sum(CASE WHEN v > u THEN (v-u)*(v-u)
        |             WHEN v < l THEN (l-v)*(l-v) ELSE 0.0 END) AS lb,
        |    count(*) AS n_matched
        |  FROM j GROUP BY 1)
        |SELECT user_id, round(lb, 6) AS lb_keogh, n_matched
        |FROM a ORDER BY 1""".stripMargin,

    // code = 4·[v₂>v₁] + 2·[v₃>v₂] + [v₃>v₁]; fixed-order entropy chain
    // over the 8 literal codes; pe_norm divides by the 17-digit JVM ln 6
    "q338_perm_entropy" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, v, lead(v, 1) OVER w AS v2, lead(v, 2) OVER w AS v3
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |c AS (SELECT user_id,
        |    (CASE WHEN v2 > v THEN 4 ELSE 0 END +
        |     CASE WHEN v3 > v2 THEN 2 ELSE 0 END +
        |     CASE WHEN v3 > v THEN 1 ELSE 0 END) AS code
        |  FROM l WHERE v2 IS NOT NULL AND v3 IS NOT NULL),
        |p AS (SELECT user_id, count(*)::BIGINT AS n_windows,
        |    sum(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN code = 1 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN code = 2 THEN 1 ELSE 0 END) AS c2,
        |    sum(CASE WHEN code = 3 THEN 1 ELSE 0 END) AS c3,
        |    sum(CASE WHEN code = 4 THEN 1 ELSE 0 END) AS c4,
        |    sum(CASE WHEN code = 5 THEN 1 ELSE 0 END) AS c5,
        |    sum(CASE WHEN code = 6 THEN 1 ELSE 0 END) AS c6,
        |    sum(CASE WHEN code = 7 THEN 1 ELSE 0 END) AS c7
        |  FROM c GROUP BY 1),
        |h AS (SELECT user_id, n_windows,
        |    (((((((CASE WHEN c0 > 0 THEN -(c0::DOUBLE/n_windows)*ln(c0::DOUBLE/n_windows) ELSE 0.0 END
        |    + CASE WHEN c1 > 0 THEN -(c1::DOUBLE/n_windows)*ln(c1::DOUBLE/n_windows) ELSE 0.0 END)
        |    + CASE WHEN c2 > 0 THEN -(c2::DOUBLE/n_windows)*ln(c2::DOUBLE/n_windows) ELSE 0.0 END)
        |    + CASE WHEN c3 > 0 THEN -(c3::DOUBLE/n_windows)*ln(c3::DOUBLE/n_windows) ELSE 0.0 END)
        |    + CASE WHEN c4 > 0 THEN -(c4::DOUBLE/n_windows)*ln(c4::DOUBLE/n_windows) ELSE 0.0 END)
        |    + CASE WHEN c5 > 0 THEN -(c5::DOUBLE/n_windows)*ln(c5::DOUBLE/n_windows) ELSE 0.0 END)
        |    + CASE WHEN c6 > 0 THEN -(c6::DOUBLE/n_windows)*ln(c6::DOUBLE/n_windows) ELSE 0.0 END)
        |    + CASE WHEN c7 > 0 THEN -(c7::DOUBLE/n_windows)*ln(c7::DOUBLE/n_windows) ELSE 0.0 END) AS pe
        |  FROM p)
        |SELECT user_id, n_windows, round(pe, 6) AS pe,
        |  round(pe / 1.7917594692280550, 6) AS pe_norm
        |FROM h ORDER BY 1""".stripMargin,

    // population variances of v, Δv, Δ²v; mobility/complexity ratios
    "q339_hjorth" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, d, v,
        |    v - lag(v, 1) OVER w AS d1 FROM daily
        |  WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |x AS (SELECT user_id, v, d1,
        |    d1 - lag(d1, 1) OVER (PARTITION BY user_id ORDER BY d) AS d2
        |  FROM l),
        |a AS (SELECT user_id, count(*)::BIGINT AS n,
        |    avg(v) AS m0, avg(v*v) AS q0, avg(d1) AS m1, avg(d1*d1) AS q1,
        |    avg(d2) AS m2, avg(d2*d2) AS q2
        |  FROM x GROUP BY 1)
        |SELECT user_id, n, round(q0 - m0*m0, 6) AS activity,
        |  round(CASE WHEN q0 - m0*m0 > 0
        |    THEN sqrt((q1 - m1*m1)/(q0 - m0*m0)) END, 6) AS mobility,
        |  round(CASE WHEN q1 - m1*m1 > 0 AND q0 - m0*m0 > 0
        |      AND sqrt((q1 - m1*m1)/(q0 - m0*m0)) > 0
        |    THEN sqrt((q2 - m2*m2)/(q1 - m1*m1))
        |      / sqrt((q1 - m1*m1)/(q0 - m0*m0)) END, 6) AS complexity
        |FROM a ORDER BY 1""".stripMargin,

    // K = 10⁴(Σm² − N)/N² — integer arithmetic up to one division
    "q340_yules_k" ->
      """WITH w AS (SELECT source,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |t AS (SELECT source, unnest(ws) AS term FROM w),
        |tf AS (SELECT source, term, count(*) AS m FROM t GROUP BY 1, 2),
        |a AS (SELECT source, sum(m)::BIGINT AS n_tokens,
        |    count(*)::BIGINT AS vocab, sum(m*m)::BIGINT AS mm
        |  FROM tf GROUP BY 1)
        |SELECT source, n_tokens, vocab,
        |  round(CASE WHEN n_tokens > 0 THEN
        |    10000.0 * (mm - n_tokens)::DOUBLE / (n_tokens*n_tokens)::DOUBLE
        |  END, 6) AS yules_k
        |FROM a ORDER BY 1""".stripMargin,

    // OLS of ln(types) on ln(tokens) across each source's documents
    "q341_heaps" ->
      """WITH w AS (SELECT source, doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |t AS (SELECT source, doc_id, unnest(ws) AS term FROM w),
        |tf AS (SELECT source, doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2, 3),
        |pd AS (SELECT source, doc_id, sum(tf)::BIGINT AS n, count(*)::BIGINT AS v
        |  FROM tf GROUP BY 1, 2),
        |pts AS (SELECT source, ln(n::DOUBLE) AS x, ln(v::DOUBLE) AS y
        |  FROM pd WHERE n >= 1 AND v >= 1),
        |g AS (SELECT source, count(*)::BIGINT AS n_docs, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
        |  FROM pts GROUP BY 1)
        |SELECT source, n_docs,
        |  round(CASE WHEN n_docs::DOUBLE*sxx - sx*sx > 0
        |    THEN (n_docs::DOUBLE*sxy - sx*sy)/(n_docs::DOUBLE*sxx - sx*sx)
        |  END, 6) AS beta,
        |  round(exp(sy/n_docs::DOUBLE -
        |    (CASE WHEN n_docs::DOUBLE*sxx - sx*sx > 0
        |      THEN (n_docs::DOUBLE*sxy - sx*sy)/(n_docs::DOUBLE*sxx - sx*sx)
        |    END) * (sx/n_docs::DOUBLE)), 6) AS k
        |FROM g ORDER BY 1""".stripMargin,

    // knn(k): per-node mean neighbor degree (exact ratio), bucketed by the
    // node's own degree
    "q342_knn_degree" ->
      """WITH e0 AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |  FROM e0 WHERE src <> dst),
        |adj AS (SELECT x AS v, y AS n FROM und UNION ALL SELECT y, x FROM und),
        |deg AS (SELECT v, count(*)::BIGINT AS degree FROM adj GROUP BY 1),
        |pn AS (SELECT a.v, sum(d2.degree)::DOUBLE / count(*) AS and_
        |  FROM adj a JOIN deg d2 ON d2.v = a.n GROUP BY 1)
        |SELECT deg.degree, count(*)::BIGINT AS n_nodes,
        |  round(avg(pn.and_), 6) AS avg_nbr_degree
        |FROM pn JOIN deg USING (v) GROUP BY 1 ORDER BY 1""".stripMargin,

    // φ(k) = 2E_{>k}/(N_{>k}(N_{>k}−1)); all-integer counts, cuts 1/2/3/5
    "q343_rich_club" ->
      """WITH e0 AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |  FROM e0 WHERE src <> dst),
        |adj AS (SELECT x AS v, y AS n FROM und UNION ALL SELECT y, x FROM und),
        |deg AS (SELECT v, count(*)::BIGINT AS degree FROM adj GROUP BY 1),
        |tg AS (SELECT und.x, und.y, dx.degree AS dxd, dy.degree AS dyd
        |  FROM und JOIN deg dx ON dx.v = und.x JOIN deg dy ON dy.v = und.y),
        |ks AS (SELECT unnest([1, 2, 3, 5]) AS k),
        |a AS (SELECT ks.k,
        |    (SELECT count(*) FROM deg WHERE degree > ks.k)::BIGINT AS n_nodes,
        |    (SELECT count(*) FROM tg WHERE dxd > ks.k AND dyd > ks.k)::BIGINT
        |      AS n_edges
        |  FROM ks)
        |SELECT k::BIGINT AS k, n_nodes, n_edges,
        |  round(CASE WHEN n_nodes >= 2 THEN
        |    2.0 * n_edges / (n_nodes*(n_nodes - 1))::DOUBLE END, 6) AS phi
        |FROM a ORDER BY 1""".stripMargin,

    // Δy ~ α + ρ·y₋₁ via centered moments; t = ρ/√(RSS/(n−2)/Sxx)
    "q344_df_test" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, d, v,
        |    lag(v, 1) OVER (PARTITION BY user_id ORDER BY d) AS x
        |  FROM daily),
        |f AS (SELECT user_id, x, v - x AS dy FROM l WHERE x IS NOT NULL),
        |c AS (SELECT user_id,
        |    x - avg(x) OVER p AS cx, dy - avg(dy) OVER p AS cd
        |  FROM f WINDOW p AS (PARTITION BY user_id)),
        |g AS (SELECT user_id, count(*)::BIGINT AS n, sum(cx*cx) AS sxx,
        |    sum(cx*cd) AS sxd, sum(cd*cd) AS sdd
        |  FROM c GROUP BY 1)
        |SELECT user_id, n,
        |  round(CASE WHEN sxx > 0 THEN sxd/sxx END, 6) AS rho,
        |  round(CASE WHEN sxx > 0 AND n > 2 AND sdd - sxd*sxd/sxx > 0
        |    THEN (sxd/sxx) / sqrt((sdd - sxd*sxd/sxx)/(n::DOUBLE - 2)/sxx)
        |  END, 6) AS t_stat
        |FROM g ORDER BY 1""".stripMargin,

    // Apdex = (satisfied + tolerating/2)/n at T = 50 (4T = 200)
    "q345_apdex" ->
      """SELECT event_type, count(*) AS n,
        |  sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END)::BIGINT AS n_satisfied,
        |  sum(CASE WHEN value > 50.0 AND value <= 200.0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_tolerating,
        |  round((sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN value > 50.0 AND value <= 200.0 THEN 1 ELSE 0 END)/2.0)
        |    / count(*), 6) AS apdex
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ŷ_arm = Σ_s (N_s/N)·ȳ_{arm,s}; pooled stratum weights
    "q346_post_strat" ->
      """WITH b AS (SELECT (user_id % 2)::VARCHAR AS arm, event_type AS s, value
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |pooled AS (SELECT s, count(*)::BIGINT AS ns FROM b GROUP BY 1),
        |tot AS (SELECT sum(ns)::BIGINT AS nt FROM pooled),
        |cell AS (SELECT arm, s, count(*)::BIGINT AS na, sum(value) AS sa
        |  FROM b GROUP BY 1, 2)
        |SELECT cell.arm, sum(cell.na)::BIGINT AS n,
        |  round(sum(cell.sa)/sum(cell.na), 6) AS raw_mean,
        |  round(sum((pooled.ns::DOUBLE/tot.nt) * (cell.sa/cell.na)), 6)
        |    AS post_strat_mean,
        |  round(sum(pooled.ns::DOUBLE/tot.nt), 6) AS coverage
        |FROM cell JOIN pooled USING (s) CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // r₁ = v − hod profile; r₂ = r₁ − dow profile; strengths from
    // population variance ratios (dow value convention differs between
    // engines but only partitions — never compared)
    "q347_multi_seasonal" ->
      """WITH b AS (SELECT event_type, value AS v, hour(ts) AS hod,
        |    dayofweek(ts) AS dow
        |  FROM events WHERE value IS NOT NULL),
        |hp AS (SELECT event_type, hod, avg(v) AS mh FROM b GROUP BY 1, 2),
        |r1 AS (SELECT b.event_type, b.v, b.dow, b.v - hp.mh AS r1
        |  FROM b JOIN hp USING (event_type, hod)),
        |dp AS (SELECT event_type, dow, avg(r1) AS md FROM r1 GROUP BY 1, 2),
        |r2 AS (SELECT r1.event_type, r1.v, r1.r1, r1.r1 - dp.md AS r2
        |  FROM r1 JOIN dp USING (event_type, dow)),
        |a AS (SELECT event_type, count(*)::BIGINT AS n,
        |    avg(v) AS m0, avg(v*v) AS q0, avg(r1) AS m1, avg(r1*r1) AS q1,
        |    avg(r2) AS m2, avg(r2*r2) AS q2
        |  FROM r2 GROUP BY 1)
        |SELECT event_type, n,
        |  round(CASE WHEN q0 - m0*m0 > 0 THEN
        |    greatest(0.0, 1.0 - (q1 - m1*m1)/(q0 - m0*m0)) END, 6)
        |    AS strength_hod,
        |  round(CASE WHEN q1 - m1*m1 > 0 THEN
        |    greatest(0.0, 1.0 - (q2 - m2*m2)/(q1 - m1*m1)) END, 6)
        |    AS strength_dow
        |FROM a ORDER BY 1""".stripMargin,

    // dense pooled-time × segment grid; O/E/V over rows with events
    "q348_log_rank" ->
      """WITH subj AS (SELECT event_type, (user_id % 2)::VARCHAR AS seg,
        |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS t,
        |    CASE WHEN max(epoch_us(ts)) < 1706054400000000 THEN 1 ELSE 0 END AS e
        |  FROM events GROUP BY event_type, user_id, (user_id % 2)::VARCHAR),
        |g AS (SELECT event_type, seg, t, sum(e) AS d, sum(1 - e) AS c
        |  FROM subj GROUP BY 1, 2, 3),
        |tm AS (SELECT DISTINCT event_type, t FROM g),
        |grid AS (SELECT tm.event_type, tm.t, s.seg,
        |    coalesce(g.d, 0) AS d, coalesce(g.c, 0) AS c
        |  FROM tm CROSS JOIN (SELECT unnest(['0','1']) AS seg) s
        |  LEFT JOIN g ON g.event_type = tm.event_type AND g.t = tm.t
        |    AND g.seg = s.seg),
        |risk AS (SELECT *,
        |    sum(d + c) OVER (PARTITION BY event_type, seg) -
        |    coalesce(sum(d + c) OVER (PARTITION BY event_type, seg ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nrisk
        |  FROM grid),
        |bt AS (SELECT event_type, t,
        |    sum(CASE WHEN seg = '0' THEN d ELSE 0 END) AS d1,
        |    sum(CASE WHEN seg = '0' THEN nrisk ELSE 0 END) AS n1,
        |    sum(d) AS dt, sum(nrisk) AS nt
        |  FROM risk GROUP BY 1, 2 HAVING sum(d) > 0 AND sum(nrisk) > 0),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_times,
        |    sum(d1)::DOUBLE AS o1,
        |    sum(dt::DOUBLE * n1 / nt) AS e1,
        |    sum(CASE WHEN nt > 1 THEN dt::DOUBLE * (n1::DOUBLE/nt)
        |      * (1.0 - n1::DOUBLE/nt) * (nt - dt)::DOUBLE/(nt - 1)
        |      ELSE 0.0 END) AS var_lr
        |  FROM bt GROUP BY 1)
        |SELECT event_type, round(o1, 6) AS o1, round(e1, 6) AS e1,
        |  round(var_lr, 6) AS var_lr,
        |  round(CASE WHEN var_lr > 0 THEN (o1 - e1)/sqrt(var_lr) END, 6) AS z,
        |  n_times
        |FROM a ORDER BY 1""".stripMargin,

    // OR_MH = Σ(ad/n)/Σ(bc/n), strata = event_type; null-value rows fall
    // in neither cell on both sides
    "q349_cmh" ->
      """WITH cell AS (SELECT event_type,
        |    sum(CASE WHEN user_id % 2 = 0 AND value > 50.0 THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN user_id % 2 = 0 AND NOT(value > 50.0) THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN user_id % 2 = 1 AND value > 50.0 THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN user_id % 2 = 1 AND NOT(value > 50.0) THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM events GROUP BY 1),
        |a2 AS (SELECT count(*)::BIGINT AS n_strata,
        |    sum(a + b + c + d)::BIGINT AS n,
        |    sum(a*d/(a + b + c + d)::DOUBLE) AS num,
        |    sum(b*c/(a + b + c + d)::DOUBLE) AS den
        |  FROM cell)
        |SELECT n_strata, n,
        |  round(CASE WHEN den > 0 THEN num/den END, 6) AS or_mh
        |FROM a2""".stripMargin,

    // Poisson: 2(y ln(y/μ) − y + μ), y ln y → 0 at 0; Gamma: 2((y−μ)/μ − ln(y/μ))
    "q350_deviance" ->
      """WITH dc AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS y FROM events GROUP BY 1, 2),
        |mc AS (SELECT user_id, avg(y) AS mu FROM dc GROUP BY 1),
        |pois AS (SELECT dc.user_id, 'poisson' AS family,
        |    count(*)::BIGINT AS n, 0::BIGINT AS n_excluded,
        |    avg(2.0 * ((CASE WHEN dc.y > 0 THEN dc.y * ln(dc.y/mc.mu)
        |      ELSE 0.0 END) - dc.y + mc.mu)) AS mean_deviance
        |  FROM dc JOIN mc USING (user_id) WHERE mc.mu > 0 GROUP BY 1),
        |dv AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS y
        |  FROM events GROUP BY 1, 2),
        |mv AS (SELECT user_id, avg(y) AS mu FROM dv GROUP BY 1),
        |gam0 AS (SELECT dv.user_id, dv.y, mv.mu,
        |    CASE WHEN dv.y > 0 AND mv.mu > 0 THEN 1 ELSE 0 END AS ok
        |  FROM dv JOIN mv USING (user_id)),
        |gam AS (SELECT user_id, 'gamma' AS family,
        |    sum(ok)::BIGINT AS n, sum(1 - ok)::BIGINT AS n_excluded,
        |    sum(CASE WHEN ok = 1
        |      THEN 2.0 * ((y - mu)/mu - ln(y/mu)) ELSE 0.0 END)
        |      / sum(ok) AS mean_deviance
        |  FROM gam0 GROUP BY 1)
        |SELECT user_id, family, n, n_excluded, round(mean_deviance, 6)
        |  AS mean_deviance
        |FROM (SELECT * FROM pois UNION ALL SELECT * FROM gam)
        |ORDER BY 1, 2""".stripMargin,

    // 3-day buckets (complete only), q79's SES closed form, even split
    "q351_adida" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        |  FROM daily),
        |bk AS (SELECT user_id, (rn - 1)//3 AS b, sum(v) AS bv, count(*) AS bc
        |  FROM r GROUP BY 1, 2),
        |f AS (SELECT user_id, b, bv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY b) AS rn2,
        |    row_number() OVER (PARTITION BY user_id ORDER BY b DESC) - 1 AS back
        |  FROM bk WHERE bc = 3),
        |lvl AS (SELECT user_id,
        |    sum(CASE WHEN rn2 = 1 THEN power(0.7, back)*bv
        |        ELSE 0.3*power(0.7, back)*bv END) AS level
        |  FROM f GROUP BY 1)
        |SELECT user_id, round(level/3, 6) AS yhat_daily
        |FROM lvl ORDER BY 1""".stripMargin,

    // geometric/arithmetic power mean over the literal period set —
    // q193's periodogram construction, fixed-order ln chain
    "q352_spectral_flatness" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, v::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1)::DOUBLE AS t
        |  FROM daily),
        |c AS (SELECT user_id, avg(y) AS mu FROM r GROUP BY 1),
        |z AS (SELECT r.user_id, r.t, r.y - c.mu AS z FROM r JOIN c USING (user_id)),
        |a AS (SELECT user_id,
        |    sum(z * cos(t * (2.0 * pi() / 2)))*sum(z * cos(t * (2.0 * pi() / 2)))
        |      + sum(z * sin(t * (2.0 * pi() / 2)))*sum(z * sin(t * (2.0 * pi() / 2))) AS p2,
        |    sum(z * cos(t * (2.0 * pi() / 3)))*sum(z * cos(t * (2.0 * pi() / 3)))
        |      + sum(z * sin(t * (2.0 * pi() / 3)))*sum(z * sin(t * (2.0 * pi() / 3))) AS p3,
        |    sum(z * cos(t * (2.0 * pi() / 7)))*sum(z * cos(t * (2.0 * pi() / 7)))
        |      + sum(z * sin(t * (2.0 * pi() / 7)))*sum(z * sin(t * (2.0 * pi() / 7))) AS p7,
        |    sum(z * cos(t * (2.0 * pi() / 14)))*sum(z * cos(t * (2.0 * pi() / 14)))
        |      + sum(z * sin(t * (2.0 * pi() / 14)))*sum(z * sin(t * (2.0 * pi() / 14))) AS p14
        |  FROM z GROUP BY 1)
        |SELECT user_id,
        |  round(CASE WHEN p2 > 0 AND p3 > 0 AND p7 > 0 AND p14 > 0 THEN
        |    exp((((ln(p2) + ln(p3)) + ln(p7)) + ln(p14)) / 4)
        |      / ((((p2 + p3) + p7) + p14) / 4) END, 6) AS flatness
        |FROM a ORDER BY 1""".stripMargin,

    // τ = 1 + 2(ρ₁+ρ₂+ρ₃+ρ₄+ρ₅), fixed-order chain; null acf propagates
    "q353_acf_time" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, v, lag(v,1) OVER w AS l1, lag(v,2) OVER w AS l2,
        |    lag(v,3) OVER w AS l3, lag(v,4) OVER w AS l4, lag(v,5) OVER w AS l5
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)),
        |a AS (SELECT user_id, corr(v, l1) AS a1, corr(v, l2) AS a2,
        |    corr(v, l3) AS a3, corr(v, l4) AS a4, corr(v, l5) AS a5
        |  FROM l GROUP BY 1)
        |SELECT user_id,
        |  round(1.0 + 2.0 * ((((a1 + a2) + a3) + a4) + a5), 6) AS tau_int
        |FROM a ORDER BY 1""".stripMargin,

    // φ = 1 + ρ from q344's regression; hl = −ln2/ln(φ); 17-digit ln 2
    "q354_half_life" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, d, v,
        |    lag(v, 1) OVER (PARTITION BY user_id ORDER BY d) AS x
        |  FROM daily),
        |f AS (SELECT user_id, x, v - x AS dy FROM l WHERE x IS NOT NULL),
        |c AS (SELECT user_id,
        |    x - avg(x) OVER p AS cx, dy - avg(dy) OVER p AS cd
        |  FROM f WINDOW p AS (PARTITION BY user_id)),
        |g AS (SELECT user_id, count(*)::BIGINT AS n, sum(cx*cx) AS sxx,
        |    sum(cx*cd) AS sxd FROM c GROUP BY 1),
        |h AS (SELECT user_id, n,
        |    CASE WHEN sxx > 0 THEN sxd/sxx END AS rho FROM g)
        |SELECT user_id, n, round(rho, 6) AS rho,
        |  round(CASE WHEN 1.0 + rho > 0 AND 1.0 + rho < 1
        |    THEN -0.69314718055994531 / ln(1.0 + rho) END, 6) AS half_life
        |FROM h ORDER BY 1""".stripMargin,

    // usable pairs: earlier duration is an EVENT; prediction ties half
    "q355_cindex" ->
      """WITH subj AS (SELECT event_type, user_id,
        |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS t,
        |    CASE WHEN max(epoch_us(ts)) < 1706054400000000 THEN 1 ELSE 0 END AS e,
        |    count(*)::BIGINT AS pred
        |  FROM events GROUP BY event_type, user_id),
        |p AS (SELECT s1.event_type,
        |    count(*)::BIGINT AS n_pairs,
        |    sum(CASE WHEN s1.pred > s2.pred THEN 1 ELSE 0 END)::BIGINT
        |      AS n_concordant,
        |    sum(CASE WHEN s1.pred = s2.pred THEN 1 ELSE 0 END)::BIGINT AS n_tied
        |  FROM subj s1 JOIN subj s2 ON s1.event_type = s2.event_type
        |    AND s1.t < s2.t
        |  WHERE s1.e = 1 GROUP BY 1)
        |SELECT event_type, n_pairs, n_concordant, n_tied,
        |  round(CASE WHEN n_pairs > 0
        |    THEN (n_concordant + n_tied/2.0) / n_pairs END, 6) AS c_index
        |FROM p ORDER BY 1""".stripMargin,

    // OLS trend per user: h = 1/n + (t−t̄)²/Stt; D = e²/(2s²)·h/(1−h)²
    "q356_cooks" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |s1 AS (SELECT user_id, d, v,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1)::DOUBLE AS t,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM daily),
        |s2 AS (SELECT *, avg(t) OVER p AS tm, avg(v) OVER p AS ym
        |  FROM s1 WINDOW p AS (PARTITION BY user_id)),
        |s3 AS (SELECT *,
        |    sum((t - tm)*(t - tm)) OVER p AS stt,
        |    sum((t - tm)*(v - ym)) OVER p AS sty
        |  FROM s2 WINDOW p AS (PARTITION BY user_id)),
        |s4 AS (SELECT *,
        |    v - (ym - (CASE WHEN stt > 0 THEN sty/stt END)*tm)
        |      - (CASE WHEN stt > 0 THEN sty/stt END)*t AS resid
        |  FROM s3),
        |s5 AS (SELECT *, sum(resid*resid) OVER (PARTITION BY user_id) AS rss
        |  FROM s4),
        |s6 AS (SELECT user_id, d, n, resid,
        |    1.0/n + (t - tm)*(t - tm)/stt AS lev,
        |    CASE WHEN n > 2 THEN rss/(n::DOUBLE - 2) END AS s2v
        |  FROM s5)
        |SELECT user_id, epoch(d)::BIGINT AS d_s, round(resid, 6) AS resid,
        |  round(lev, 6) AS leverage,
        |  round(CASE WHEN s2v > 0 AND lev < 1 THEN
        |    resid*resid/(2.0*s2v) * lev/((1.0 - lev)*(1.0 - lev)) END, 6)
        |    AS cooks_d
        |FROM s6 ORDER BY 1, 2""".stripMargin,

    // complete blocks only; midranks within block; χ² over arm rank sums
    "q357_friedman" ->
      """WITH mv AS (SELECT day(ts) AS blk, event_type AS arm, avg(value) AS v
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT arm) AS k FROM mv),
        |cb AS (SELECT blk FROM mv GROUP BY blk
        |  HAVING count(*) = (SELECT k FROM kk)),
        |r AS (SELECT mv.blk, mv.arm,
        |    rank() OVER (PARTITION BY mv.blk ORDER BY mv.v)
        |      + (count(*) OVER (PARTITION BY mv.blk, mv.v) - 1)/2.0 AS mid
        |  FROM mv JOIN cb USING (blk)),
        |pa AS (SELECT arm, sum(mid) AS rj, count(*) AS nb FROM r GROUP BY 1),
        |a AS (SELECT max(nb)::BIGINT AS n_blocks,
        |    (SELECT k FROM kk)::BIGINT AS k, sum(rj*rj) AS rr FROM pa)
        |SELECT n_blocks, k,
        |  round(12.0/(n_blocks::DOUBLE * k * (k + 1)) * rr
        |    - 3.0*n_blocks*(k + 1), 6) AS chi2
        |FROM a""".stripMargin,

    // α = k/(k−1)·(1 − Σσᵢ²/σ_T²), population variances, literal item chain
    "q358_cronbach" ->
      """WITH piv AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END) AS s_click,
        |    sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END) AS s_view,
        |    sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS s_purchase,
        |    sum(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END) AS s_error,
        |    sum(CASE WHEN event_type = 'signup' THEN value ELSE 0.0 END) AS s_signup
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |    sum(((((s_click + s_view) + s_purchase) + s_error) + s_signup)) AS st,
        |    sum(((((s_click + s_view) + s_purchase) + s_error) + s_signup)
        |      * ((((s_click + s_view) + s_purchase) + s_error) + s_signup)) AS qt,
        |    sum(s_click) AS m1, sum(s_click*s_click) AS q1,
        |    sum(s_view) AS m2, sum(s_view*s_view) AS q2,
        |    sum(s_purchase) AS m3, sum(s_purchase*s_purchase) AS q3,
        |    sum(s_error) AS m4, sum(s_error*s_error) AS q4,
        |    sum(s_signup) AS m5, sum(s_signup*s_signup) AS q5
        |  FROM piv),
        |v AS (SELECT n,
        |    ((((q1/n - (m1/n)*(m1/n)) + (q2/n - (m2/n)*(m2/n)))
        |      + (q3/n - (m3/n)*(m3/n))) + (q4/n - (m4/n)*(m4/n)))
        |      + (q5/n - (m5/n)*(m5/n)) AS sv,
        |    qt/n - (st/n)*(st/n) AS vt
        |  FROM m)
        |SELECT 5::BIGINT AS k, n::BIGINT AS n_users,
        |  round(CASE WHEN vt > 0 THEN 1.25 * (1.0 - sv/vt) END, 6) AS alpha
        |FROM v""".stripMargin,

    // per-(user, dow) MK z's (q172's construction) pivoted to a literal
    // dow chain; χ²_trend = m·z̄², homog = total − trend
    "q359_trend_homog" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |dd AS (SELECT user_id, day, v, dayofweek(day) + 1 AS dow FROM daily),
        |pr AS (SELECT a.user_id, a.dow,
        |    sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END)
        |      AS s_part
        |  FROM dd a JOIN dd b ON a.user_id = b.user_id AND a.dow = b.dow
        |    AND b.day > a.day
        |  GROUP BY 1, 2),
        |nn AS (SELECT user_id, dow, count(*) AS n FROM dd GROUP BY 1, 2),
        |mk AS (SELECT nn.user_id, nn.dow, coalesce(pr.s_part, 0) AS s, nn.n,
        |    nn.n*(nn.n - 1)*(2*nn.n + 5)/18.0 AS var
        |  FROM nn LEFT JOIN pr USING (user_id, dow)),
        |z AS (SELECT user_id, dow,
        |    CASE WHEN n >= 2 THEN
        |      (s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
        |        / sqrt(var) END AS z
        |  FROM mk),
        |p AS (SELECT user_id,
        |    max(CASE WHEN dow = 1 THEN z END) AS z1,
        |    max(CASE WHEN dow = 2 THEN z END) AS z2,
        |    max(CASE WHEN dow = 3 THEN z END) AS z3,
        |    max(CASE WHEN dow = 4 THEN z END) AS z4,
        |    max(CASE WHEN dow = 5 THEN z END) AS z5,
        |    max(CASE WHEN dow = 6 THEN z END) AS z6,
        |    max(CASE WHEN dow = 7 THEN z END) AS z7
        |  FROM z GROUP BY 1),
        |h AS (SELECT user_id,
        |    (((((CASE WHEN z1 IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN z2 IS NOT NULL THEN 1 ELSE 0 END)
        |      + CASE WHEN z3 IS NOT NULL THEN 1 ELSE 0 END)
        |      + CASE WHEN z4 IS NOT NULL THEN 1 ELSE 0 END)
        |      + CASE WHEN z5 IS NOT NULL THEN 1 ELSE 0 END)
        |      + CASE WHEN z6 IS NOT NULL THEN 1 ELSE 0 END)
        |      + CASE WHEN z7 IS NOT NULL THEN 1 ELSE 0 END AS m,
        |    ((((((coalesce(z1, 0.0) + coalesce(z2, 0.0)) + coalesce(z3, 0.0))
        |      + coalesce(z4, 0.0)) + coalesce(z5, 0.0)) + coalesce(z6, 0.0))
        |      + coalesce(z7, 0.0)) AS zs,
        |    ((((((coalesce(z1*z1, 0.0) + coalesce(z2*z2, 0.0))
        |      + coalesce(z3*z3, 0.0)) + coalesce(z4*z4, 0.0))
        |      + coalesce(z5*z5, 0.0)) + coalesce(z6*z6, 0.0))
        |      + coalesce(z7*z7, 0.0)) AS z2s
        |  FROM p)
        |SELECT user_id, m::BIGINT AS m, round(z2s, 6) AS chi2_total,
        |  round(CASE WHEN m > 0 THEN m * (zs/m) * (zs/m) END, 6) AS chi2_trend,
        |  round(z2s - (CASE WHEN m > 0 THEN m * (zs/m) * (zs/m) END), 6)
        |    AS chi2_homog
        |FROM h ORDER BY 1""".stripMargin,

    // T_t = cz²/t + (czn−cz)²/(n−t) on standardized values; argmax on the
    // 6-dp-rounded T with ts tie-break (binarySegment discipline)
    "q360_snht" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |s1 AS (SELECT user_id, d, v,
        |    count(*) OVER p AS n, avg(v) OVER p AS m,
        |    sqrt(greatest(avg(v*v) OVER p - (avg(v) OVER p)*(avg(v) OVER p),
        |      0.0)) AS sd
        |  FROM daily WINDOW p AS (PARTITION BY user_id)),
        |s2 AS (SELECT user_id, d, n, (v - m)/sd AS z
        |  FROM s1 WHERE sd > 0),
        |s3 AS (SELECT user_id, d, n,
        |    sum(z) OVER (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cz,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS i,
        |    sum(z) OVER (PARTITION BY user_id) AS czn
        |  FROM s2),
        |s4 AS (SELECT user_id, d, n,
        |    cz*cz/i + (czn - cz)*(czn - cz)/(n - i) AS t
        |  FROM s3 WHERE i < n),
        |s5 AS (SELECT user_id, d, n,
        |    CASE WHEN t >= 0 THEN floor(t*1e6 + 0.5)/1e6
        |         ELSE -floor(-t*1e6 + 0.5)/1e6 END AS tr
        |  FROM s4),
        |s6 AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY tr DESC, d) AS rk FROM s5)
        |SELECT user_id, n::BIGINT AS n, epoch(d)::BIGINT AS split_s,
        |  round(tr, 6) AS t_stat
        |FROM s6 WHERE rk = 1 ORDER BY 1""".stripMargin,

    // three SES levels at 1/2/3-day aggregation, per-day rates, fixed-
    // order mean — q79's closed form at each level
    "q361_mapa" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |r1s AS (SELECT user_id, d, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) - 1 AS back
        |  FROM daily),
        |l1 AS (SELECT user_id,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back)*v
        |        ELSE 0.3*power(0.7, back)*v END) AS r1
        |  FROM r1s GROUP BY 1),
        |b2 AS (SELECT user_id, (rn - 1)//2 AS bk, sum(v) AS bv, count(*) AS bc
        |  FROM r1s GROUP BY 1, 2),
        |f2 AS (SELECT user_id, bv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY bk) AS rn2,
        |    row_number() OVER (PARTITION BY user_id ORDER BY bk DESC) - 1 AS back2
        |  FROM b2 WHERE bc = 2),
        |l2 AS (SELECT user_id,
        |    sum(CASE WHEN rn2 = 1 THEN power(0.7, back2)*bv
        |        ELSE 0.3*power(0.7, back2)*bv END)/2 AS r2
        |  FROM f2 GROUP BY 1),
        |b3 AS (SELECT user_id, (rn - 1)//3 AS bk, sum(v) AS bv, count(*) AS bc
        |  FROM r1s GROUP BY 1, 2),
        |f3 AS (SELECT user_id, bv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY bk) AS rn3,
        |    row_number() OVER (PARTITION BY user_id ORDER BY bk DESC) - 1 AS back3
        |  FROM b3 WHERE bc = 3),
        |l3 AS (SELECT user_id,
        |    sum(CASE WHEN rn3 = 1 THEN power(0.7, back3)*bv
        |        ELSE 0.3*power(0.7, back3)*bv END)/3 AS r3
        |  FROM f3 GROUP BY 1)
        |SELECT l1.user_id, round(l1.r1, 6) AS r1, round(l2.r2, 6) AS r2,
        |  round(l3.r3, 6) AS r3,
        |  round(((l1.r1 + l2.r2) + l3.r3)/3, 6) AS yhat_daily
        |FROM l1 JOIN l2 USING (user_id) JOIN l3 USING (user_id)
        |ORDER BY 1""".stripMargin,

    // raw power sums on integer-valued doubles (exact), central moments
    // expanded exactly as the engine's fixed-order algebra
    "q362_jarque_bera" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*)::BIGINT AS n, sum(x) AS s1,
        |    sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
        |  FROM daily GROUP BY 1),
        |c AS (SELECT event_type, n, n::DOUBLE AS nd, s1/n::DOUBLE AS mu,
        |    s2, s3, s4 FROM m),
        |mm AS (SELECT event_type, n, nd,
        |    s2/nd - mu*mu AS m2,
        |    s3/nd - 3.0*mu*(s2/nd) + 2.0*mu*mu*mu AS m3,
        |    s4/nd - 4.0*mu*(s3/nd) + 6.0*mu*mu*(s2/nd)
        |      - 3.0*mu*mu*mu*mu AS m4
        |  FROM c),
        |sk AS (SELECT event_type, n, nd,
        |    CASE WHEN n >= 2 AND m2 > 0 THEN m3/sqrt(m2*m2*m2) END AS skew,
        |    CASE WHEN n >= 2 AND m2 > 0 THEN m4/(m2*m2) - 3.0 END AS ex_kurt
        |  FROM mm)
        |SELECT event_type, n, round(skew, 6) AS skew,
        |  round(ex_kurt, 6) AS ex_kurt,
        |  round(nd/6.0 * (skew*skew + ex_kurt*ex_kurt/4.0), 6) AS jb
        |FROM sk ORDER BY 1""".stripMargin,

    "q363_mcnemar" ->
      """WITH p AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND day(ts) <= 15
        |      THEN 1 ELSE 0 END) AS pre,
        |    max(CASE WHEN event_type = 'purchase' AND day(ts) >= 16
        |      THEN 1 ELSE 0 END) AS post
        |  FROM events GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_pairs,
        |    sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM p)
        |SELECT n_pairs, b, c,
        |  round(CASE WHEN b + c > 0 THEN
        |    ((b - c)::DOUBLE)*((b - c)::DOUBLE)/((b + c)::DOUBLE) END, 6)
        |    AS chi2
        |FROM a""".stripMargin,

    // pooled + per-half OLS RSS from raw moment sums; x = 0-based index
    "q364_chow" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |s1 AS (SELECT user_id, v,
        |    (row_number() OVER w - 1)::DOUBLE AS x,
        |    row_number() OVER w AS rn, count(*) OVER p AS n
        |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d),
        |    p AS (PARTITION BY user_id)),
        |s2 AS (SELECT *, CASE WHEN rn <= n::DOUBLE/2 THEN 1 ELSE 2 END AS seg
        |  FROM s1),
        |g AS (SELECT user_id, count(*) AS np,
        |    sum(x) AS sxp, sum(x*x) AS sxxp, sum(v) AS syp,
        |    sum(v*v) AS syyp, sum(x*v) AS sxyp,
        |    sum(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN seg = 1 THEN x ELSE 0.0 END) AS sx1,
        |    sum(CASE WHEN seg = 1 THEN x*x ELSE 0.0 END) AS sxx1,
        |    sum(CASE WHEN seg = 1 THEN v ELSE 0.0 END) AS sy1,
        |    sum(CASE WHEN seg = 1 THEN v*v ELSE 0.0 END) AS syy1,
        |    sum(CASE WHEN seg = 1 THEN x*v ELSE 0.0 END) AS sxy1,
        |    sum(CASE WHEN seg = 2 THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN seg = 2 THEN x ELSE 0.0 END) AS sx2,
        |    sum(CASE WHEN seg = 2 THEN x*x ELSE 0.0 END) AS sxx2,
        |    sum(CASE WHEN seg = 2 THEN v ELSE 0.0 END) AS sy2,
        |    sum(CASE WHEN seg = 2 THEN v*v ELSE 0.0 END) AS syy2,
        |    sum(CASE WHEN seg = 2 THEN x*v ELSE 0.0 END) AS sxy2
        |  FROM s2 GROUP BY 1),
        |r AS (SELECT user_id, np, n1, n2,
        |    CASE WHEN (sxxp - sxp*sxp/np::DOUBLE) > 0 THEN
        |      (syyp - syp*syp/np::DOUBLE)
        |      - (sxyp - sxp*syp/np::DOUBLE)*(sxyp - sxp*syp/np::DOUBLE)
        |        /(sxxp - sxp*sxp/np::DOUBLE) END AS rssp,
        |    CASE WHEN (sxx1 - sx1*sx1/n1::DOUBLE) > 0 THEN
        |      (syy1 - sy1*sy1/n1::DOUBLE)
        |      - (sxy1 - sx1*sy1/n1::DOUBLE)*(sxy1 - sx1*sy1/n1::DOUBLE)
        |        /(sxx1 - sx1*sx1/n1::DOUBLE) END AS rss1,
        |    CASE WHEN (sxx2 - sx2*sx2/n2::DOUBLE) > 0 THEN
        |      (syy2 - sy2*sy2/n2::DOUBLE)
        |      - (sxy2 - sx2*sy2/n2::DOUBLE)*(sxy2 - sx2*sy2/n2::DOUBLE)
        |        /(sxx2 - sx2*sx2/n2::DOUBLE) END AS rss2
        |  FROM g),
        |f AS (SELECT user_id, np,
        |    CASE WHEN n1 >= 3 AND n2 >= 3 THEN rssp END AS rss_pooled,
        |    CASE WHEN n1 >= 3 AND n2 >= 3 THEN rss1 + rss2 END AS rss_split
        |  FROM r)
        |SELECT user_id, np::BIGINT AS n, round(rss_pooled, 6) AS rss_pooled,
        |  round(rss_split, 6) AS rss_split,
        |  round(CASE WHEN rss_split > 0 AND np > 4 THEN
        |    ((rss_pooled - rss_split)/2.0)
        |      /(rss_split/(np::DOUBLE - 4.0)) END, 6) AS f_stat
        |FROM f ORDER BY 1""".stripMargin,

    // demeaned ordered cumsum; eta = sum(S_t^2)/(n^2 * sum(e^2)/n)
    "q365_kpss" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, d,
        |    cnt - avg(cnt) OVER (PARTITION BY event_type) AS e FROM daily),
        |s2 AS (SELECT event_type, e,
        |    sum(e) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM s1),
        |a AS (SELECT event_type, count(*)::BIGINT AS n,
        |    sum(e*e) AS see, sum(s*s) AS sss FROM s2 GROUP BY 1)
        |SELECT event_type, n,
        |  round(CASE WHEN n >= 2 AND see > 0 THEN
        |    sss/(n::DOUBLE * n::DOUBLE * (see/n::DOUBLE)) END, 6) AS eta
        |FROM a ORDER BY 1""".stripMargin,

    // success = day count strictly above the type's mean daily count
    // (integer cross-multiply); complete 5-type blocks only
    "q366_cochran_q" ->
      """WITH daily AS (SELECT event_type, day(ts) AS blk, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, blk,
        |    CASE WHEN cnt * (count(*) OVER p) > (sum(cnt) OVER p)
        |      THEN 1 ELSE 0 END AS x
        |  FROM daily WINDOW p AS (PARTITION BY event_type)),
        |b AS (SELECT blk, count(*) AS kc, sum(x) AS bi,
        |    sum(CASE WHEN event_type = 'click' THEN x END) AS t0,
        |    sum(CASE WHEN event_type = 'view' THEN x END) AS t1,
        |    sum(CASE WHEN event_type = 'purchase' THEN x END) AS t2,
        |    sum(CASE WHEN event_type = 'error' THEN x END) AS t3,
        |    sum(CASE WHEN event_type = 'signup' THEN x END) AS t4
        |  FROM x GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_blocks, sum(bi) AS nn,
        |    sum(bi*bi) AS bb, sum(t0) AS tt0, sum(t1) AS tt1,
        |    sum(t2) AS tt2, sum(t3) AS tt3, sum(t4) AS tt4
        |  FROM b WHERE kc = 5)
        |SELECT n_blocks, 5::BIGINT AS k,
        |  round(CASE WHEN (5*nn - bb)::DOUBLE > 0 THEN 20.0 * (
        |    (((((tt0::DOUBLE - nn::DOUBLE/5.0)*(tt0::DOUBLE - nn::DOUBLE/5.0)
        |    + (tt1::DOUBLE - nn::DOUBLE/5.0)*(tt1::DOUBLE - nn::DOUBLE/5.0))
        |    + (tt2::DOUBLE - nn::DOUBLE/5.0)*(tt2::DOUBLE - nn::DOUBLE/5.0))
        |    + (tt3::DOUBLE - nn::DOUBLE/5.0)*(tt3::DOUBLE - nn::DOUBLE/5.0))
        |    + (tt4::DOUBLE - nn::DOUBLE/5.0)*(tt4::DOUBLE - nn::DOUBLE/5.0)))
        |    / (5*nn - bb)::DOUBLE END, 6) AS q
        |FROM a""".stripMargin,

    // OLS residuals via window moments, then e^2-on-t auxiliary R^2
    "q367_breusch_pagan" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |s1 AS (SELECT user_id, d, v,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1)::DOUBLE AS x
        |  FROM daily),
        |s2 AS (SELECT *, avg(x) OVER p AS xm, avg(v) OVER p AS ym
        |  FROM s1 WINDOW p AS (PARTITION BY user_id)),
        |s3 AS (SELECT *,
        |    sum((x - xm)*(x - xm)) OVER p AS sxx,
        |    sum((x - xm)*(v - ym)) OVER p AS sxy
        |  FROM s2 WINDOW p AS (PARTITION BY user_id)),
        |s4 AS (SELECT *,
        |    CASE WHEN sxx > 0 THEN sxy/sxx END AS b FROM s3),
        |s5 AS (SELECT user_id, x, sxx, b,
        |    (v - (ym - b*xm) - b*x)*(v - (ym - b*xm) - b*x) AS g
        |  FROM s4),
        |g AS (SELECT user_id, count(*) AS n, max(b) AS slope,
        |    max(sxx) AS sxxg, sum(x) AS sx, sum(g) AS sg,
        |    sum(g*g) AS sgg, sum(x*g) AS sxg
        |  FROM s5 GROUP BY 1),
        |r AS (SELECT user_id, n, slope, sxxg,
        |    sgg - sg*sg/n::DOUBLE AS sggc, sxg - sx*sg/n::DOUBLE AS sxgc
        |  FROM g)
        |SELECT user_id, n::BIGINT AS n, round(slope, 6) AS slope,
        |  round(CASE WHEN n >= 3 AND sxxg > 0 AND sggc > 0 THEN
        |    sxgc*sxgc/(sxxg*sggc) END, 6) AS r2_aux,
        |  round(CASE WHEN n >= 3 AND sxxg > 0 AND sggc > 0 THEN
        |    n::DOUBLE * (sxgc*sxgc/(sxxg*sggc)) END, 6) AS lm
        |FROM r ORDER BY 1""".stripMargin,

    // stage-1 OLS via window moments; stage-2 no-intercept DF on residuals
    "q368_engle_granger" ->
      """WITH dp AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c_click,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c_view,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c_purchase,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c_error
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT 'click_on_view' AS pair, d, c_view::DOUBLE AS x,
        |    c_click::DOUBLE AS y FROM dp
        |  UNION ALL
        |  SELECT 'view_on_error', d, c_error::DOUBLE, c_view::DOUBLE FROM dp
        |  UNION ALL
        |  SELECT 'click_on_purchase', d, c_purchase::DOUBLE, c_click::DOUBLE
        |    FROM dp),
        |s2 AS (SELECT *, avg(x) OVER p AS xm, avg(y) OVER p AS ym
        |  FROM st WINDOW p AS (PARTITION BY pair)),
        |s3 AS (SELECT *,
        |    sum((x - xm)*(x - xm)) OVER p AS sxx,
        |    sum((x - xm)*(y - ym)) OVER p AS sxy
        |  FROM s2 WINDOW p AS (PARTITION BY pair)),
        |s4 AS (SELECT *, CASE WHEN sxx > 0 THEN sxy/sxx END AS beta FROM s3),
        |s5 AS (SELECT pair, d, beta,
        |    y - (ym - beta*xm) - beta*x AS e FROM s4),
        |s6 AS (SELECT pair, beta, e,
        |    lag(e) OVER (PARTITION BY pair ORDER BY d) AS el FROM s5),
        |s7 AS (SELECT pair, beta, el, e - el AS de FROM s6),
        |g AS (SELECT pair, count(*)::BIGINT AS n, max(beta) AS beta,
        |    sum(CASE WHEN el IS NOT NULL THEN 1 ELSE 0 END) AS nr,
        |    sum(el*el) AS se2, sum(el*de) AS sed, sum(de*de) AS sdd
        |  FROM s7 GROUP BY 1),
        |r AS (SELECT pair, n, beta,
        |    CASE WHEN se2 > 0 THEN sed/se2 END AS rho,
        |    nr, se2, sdd - sed*sed/se2 AS rss
        |  FROM g)
        |SELECT pair, n, round(beta, 6) AS beta, round(rho, 6) AS rho,
        |  round(CASE WHEN se2 > 0 AND nr > 1 AND rss > 0 THEN
        |    rho/sqrt(rss/(nr::DOUBLE - 1)/se2) END, 6) AS t_stat
        |FROM r ORDER BY 1""".stripMargin,

    "q369_bradley_terry" -> btSql(
      Seq("click", "view", "purchase", "error", "signup"), 5),

    // friedman midranks scored against the fixed lexicographic arm order;
    // E[L] = 45n, Var[L] = 25n at k = 5
    "q370_page_l" ->
      """WITH mv AS (SELECT day(ts) AS blk, event_type AS arm, avg(value) AS v
        |  FROM events GROUP BY 1, 2),
        |cb AS (SELECT blk FROM mv GROUP BY blk HAVING count(*) = 5),
        |r AS (SELECT mv.blk, mv.arm,
        |    rank() OVER (PARTITION BY mv.blk ORDER BY mv.v)
        |      + (count(*) OVER (PARTITION BY mv.blk, mv.v) - 1)/2.0 AS mid
        |  FROM mv JOIN cb USING (blk)),
        |a AS (SELECT count(DISTINCT blk)::BIGINT AS n_blocks,
        |    sum(CASE WHEN arm = 'click' THEN mid ELSE 0.0 END) AS r0,
        |    sum(CASE WHEN arm = 'error' THEN mid ELSE 0.0 END) AS r1,
        |    sum(CASE WHEN arm = 'purchase' THEN mid ELSE 0.0 END) AS r2,
        |    sum(CASE WHEN arm = 'signup' THEN mid ELSE 0.0 END) AS r3,
        |    sum(CASE WHEN arm = 'view' THEN mid ELSE 0.0 END) AS r4
        |  FROM r),
        |l AS (SELECT n_blocks,
        |    ((((1.0*r0 + 2.0*r1) + 3.0*r2) + 4.0*r3) + 5.0*r4) AS lv
        |  FROM a)
        |SELECT n_blocks, 5::BIGINT AS k, round(lv, 6) AS l_stat,
        |  round((lv - n_blocks::DOUBLE * 45.0)
        |    / sqrt(n_blocks::DOUBLE * 25.0), 6) AS z
        |FROM l""".stripMargin,

    // literal 5-language pivot; fixed-order entropy and simpson folds
    "q371_diversity" ->
      """WITH piv AS (SELECT source,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS n3,
        |    sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS n4,
        |    count(*)::BIGINT AS n_docs
        |  FROM documents GROUP BY 1),
        |c AS (SELECT source, n_docs, n0, n1, n2, n3, n4,
        |    n0::DOUBLE/n_docs::DOUBLE AS p0, n1::DOUBLE/n_docs::DOUBLE AS p1,
        |    n2::DOUBLE/n_docs::DOUBLE AS p2, n3::DOUBLE/n_docs::DOUBLE AS p3,
        |    n4::DOUBLE/n_docs::DOUBLE AS p4
        |  FROM piv),
        |s AS (SELECT source, n_docs,
        |    ((((CASE WHEN n0 > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n1 > 0 THEN 1 ELSE 0 END)
        |      + CASE WHEN n2 > 0 THEN 1 ELSE 0 END)
        |      + CASE WHEN n3 > 0 THEN 1 ELSE 0 END)
        |      + CASE WHEN n4 > 0 THEN 1 ELSE 0 END)::BIGINT AS k_langs,
        |    1.0 - ((((p0*p0 + p1*p1) + p2*p2) + p3*p3) + p4*p4) AS simpson,
        |    ((((CASE WHEN n0 > 0 THEN -p0*ln(p0) ELSE 0.0 END
        |      + CASE WHEN n1 > 0 THEN -p1*ln(p1) ELSE 0.0 END)
        |      + CASE WHEN n2 > 0 THEN -p2*ln(p2) ELSE 0.0 END)
        |      + CASE WHEN n3 > 0 THEN -p3*ln(p3) ELSE 0.0 END)
        |      + CASE WHEN n4 > 0 THEN -p4*ln(p4) ELSE 0.0 END) AS shannon
        |  FROM c)
        |SELECT source, n_docs, k_langs, round(simpson, 6) AS simpson,
        |  round(shannon, 6) AS shannon,
        |  round(CASE WHEN k_langs > 1 THEN shannon/ln(k_langs::DOUBLE) END, 6)
        |    AS evenness
        |FROM s ORDER BY 1""".stripMargin,

    // integer daily-count moments: fano = popvar/mean, Poisson dispersion
    // chi2 = (n-1) * sample var / mean
    "q372_fano" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*)::BIGINT AS n,
        |    sum(cnt::DOUBLE) AS s, sum(cnt::DOUBLE * cnt::DOUBLE) AS q
        |  FROM daily GROUP BY 1),
        |c AS (SELECT event_type, n, s/n::DOUBLE AS m,
        |    q/n::DOUBLE - (s/n::DOUBLE)*(s/n::DOUBLE) AS popvar,
        |    (q - s*s/n::DOUBLE)/(n::DOUBLE - 1.0) AS sampvar
        |  FROM a)
        |SELECT event_type, n,
        |  round(CASE WHEN m > 0 THEN popvar/m END, 6) AS fano,
        |  round(CASE WHEN m > 0 AND n >= 2 THEN
        |    (n::DOUBLE - 1.0) * sampvar / m END, 6) AS chi2
        |FROM c ORDER BY 1""".stripMargin,

    // MoM Gumbel on daily maxima; shared 16-digit sqrt(6)/pi and Euler
    // gamma literals; 30-day return level
    "q373_gumbel" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    max(value) AS mx FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*)::BIGINT AS n, sum(mx) AS s,
        |    sum(mx*mx) AS q FROM daily GROUP BY 1),
        |c AS (SELECT event_type, n, s/n::DOUBLE AS m,
        |    q/n::DOUBLE - (s/n::DOUBLE)*(s/n::DOUBLE) AS popvar
        |  FROM a),
        |b AS (SELECT event_type, n, m,
        |    CASE WHEN popvar > 0 THEN sqrt(popvar) * 0.779696801233676 END
        |      AS beta
        |  FROM c),
        |g AS (SELECT event_type, n, beta,
        |    m - 0.5772156649015329 * beta AS mu FROM b)
        |SELECT event_type, n, round(mu, 6) AS mu, round(beta, 6) AS beta,
        |  round(mu - beta * ln(-ln(1.0 - 1.0/30.0)), 6) AS rl30
        |FROM g ORDER BY 1""".stripMargin,

    // DuckDB's builtin jaro_winkler_similarity IS the oracle for the
    // native JaroWinklerExpr (fuzz-verified equal semantics); threshold on
    // the rounded score
    "q374_jw_near_dup" ->
      """WITH s0 AS (SELECT doc_id,
        |    substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 48) AS t
        |  FROM documents WHERE doc_id < 150),
        |c AS (SELECT doc_id, t FROM s0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    concat(substr(t, 1, 5), 'X', substr(t, 7, 42)) FROM s0),
        |cc AS (SELECT doc_id, t FROM c WHERE length(t) >= 40),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(jaro_winkler_similarity(a.t, b.t), 6) AS jw
        |  FROM cc a JOIN cc b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jw FROM p WHERE jw >= 0.9
        |ORDER BY 1, 2""".stripMargin,

    // ordered-group pair counting (+1/2 ties); tie-free normal moments
    "q375_jonckheere" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
        |    WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4
        |    END AS g, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click','error','purchase','signup','view')),
        |j AS (SELECT sum(CASE WHEN x.v < y.v THEN 1.0
        |    WHEN x.v = y.v THEN 0.5 ELSE 0.0 END) AS j_stat
        |  FROM b x JOIN b y ON x.g < y.g),
        |sz AS (SELECT g, count(*) AS ni FROM b GROUP BY 1),
        |m AS (SELECT sum(ni)::BIGINT AS n, sum(ni*ni) AS n2,
        |    sum(ni*ni*(2*ni + 3)) AS n3 FROM sz),
        |z AS (SELECT j.j_stat, m.n,
        |    (m.n::DOUBLE * m.n::DOUBLE - n2::DOUBLE)/4.0 AS e,
        |    (m.n::DOUBLE * m.n::DOUBLE * (2.0*m.n::DOUBLE + 3.0)
        |      - n3::DOUBLE)/72.0 AS var
        |  FROM j, m)
        |SELECT n, round(j_stat, 6) AS j_stat,
        |  round(CASE WHEN var > 0 THEN (j_stat - e)/sqrt(var) END, 6) AS z
        |FROM z""".stripMargin,

    // lower-middle order statistic by explicit row_number; chi2 over the
    // 2 x 5 above/not-above table with rational expectations
    "q376_mood_median" -> moodMedianSql(
      Seq("click", "view", "purchase", "error", "signup")),

    "q377_markov_entropy" -> markovEntropySql(
      Seq("click", "view", "purchase", "error", "signup")),

    // per-arm moment pivot -> SSW -> MSW -> 10 literal Tukey-Kramer pairs
    "q378_tukey_hsd" -> tukeyHsdSql(
      Seq("click", "view", "purchase", "error", "signup")),

    // end scores tie-averaged per value group; exact finite-population z
    "q379_ansari_bradley" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click', 'view')),
        |r AS (SELECT arm, v, row_number() OVER (ORDER BY v, arm) AS rn,
        |    count(*) OVER () AS n FROM b),
        |s0 AS (SELECT arm, v,
        |    least(rn::DOUBLE, (n + 1 - rn)::DOUBLE) AS s0 FROM r),
        |s1 AS (SELECT arm, avg(s0) OVER (PARTITION BY v) AS s FROM s0),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'click' THEN s ELSE 0.0 END) AS ab_stat,
        |    sum(s) AS ss, sum(s*s) AS sq FROM s1),
        |z AS (SELECT n_a, n_b, ab_stat,
        |    (n_a + n_b)::DOUBLE AS nt,
        |    n_a::DOUBLE * ss / (n_a + n_b)::DOUBLE AS e,
        |    n_a::DOUBLE * n_b::DOUBLE / ((n_a + n_b)::DOUBLE - 1.0)
        |      * (sq/(n_a + n_b)::DOUBLE
        |        - (ss/(n_a + n_b)::DOUBLE)*(ss/(n_a + n_b)::DOUBLE)) AS var
        |  FROM a)
        |SELECT n_a, n_b, round(ab_stat, 6) AS ab_stat,
        |  round(CASE WHEN var > 0 THEN (ab_stat - e)/sqrt(var) END, 6) AS z
        |FROM z""".stripMargin,

    "q380_textrank" -> textRankSql(topN = 40, iterations = 4, damping = 0.85),

    // ordered ln-factorial cumsum (0..n), lookup joins, ordered tail sum
    "q381_fisher_exact" ->
      """WITH f AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS fa,
        |    CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END AS fb FROM documents),
        |cc AS (SELECT
        |    sum(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN fa = 0 AND fb = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN fa = 0 AND fb = 0 THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM f),
        |c2 AS (SELECT *, a + b + c + d AS n, a + b AS r1, c + d AS r2,
        |    a + c AS c1 FROM cc),
        |seq AS (SELECT row_number() OVER () - 1 AS i FROM documents
        |  UNION ALL SELECT count(*) FROM documents),
        |lf AS (SELECT i, sum(CASE WHEN i >= 1 THEN ln(i::DOUBLE) ELSE 0.0 END)
        |    OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v FROM seq),
        |ks AS (SELECT c2.*, lf.i AS k FROM c2 JOIN lf
        |  ON lf.i BETWEEN c2.a AND least(c2.r1, c2.c1)),
        |t AS (SELECT ks.k, ks.a, ks.b, ks.c, ks.d,
        |    lk.v AS lf_k, lr1k.v AS lf_r1k, lc1k.v AS lf_c1k,
        |    lr2x.v AS lf_r2x, lr1.v AS lf_r1, lr2.v AS lf_r2,
        |    lnn.v AS lf_n, lc1.v AS lf_c1, lnc1.v AS lf_nc1
        |  FROM ks
        |  JOIN lf lk ON lk.i = ks.k
        |  JOIN lf lr1k ON lr1k.i = ks.r1 - ks.k
        |  JOIN lf lc1k ON lc1k.i = ks.c1 - ks.k
        |  JOIN lf lr2x ON lr2x.i = ks.r2 - ks.c1 + ks.k
        |  JOIN lf lr1 ON lr1.i = ks.r1
        |  JOIN lf lr2 ON lr2.i = ks.r2
        |  JOIN lf lnn ON lnn.i = ks.n
        |  JOIN lf lc1 ON lc1.i = ks.c1
        |  JOIN lf lnc1 ON lnc1.i = ks.n - ks.c1),
        |p AS (SELECT k, a, b, c, d,
        |    sum(exp(lf_r1 - lf_k - lf_r1k + (lf_r2 - lf_c1k - lf_r2x)
        |      - (lf_n - lf_c1 - lf_nc1)))
        |      OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |        CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY k DESC) AS rn
        |  FROM t)
        |SELECT a, b, c, d, round(cum, 6) AS p_greater FROM p WHERE rn = 1""".stripMargin,

    "q382_capture_recapture" ->
      """WITH fl AS (SELECT user_id,
        |    max(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS f1,
        |    max(CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END) AS f2
        |  FROM events GROUP BY 1),
        |a AS (SELECT sum(CASE WHEN f1 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN f2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN f1 = 1 AND f2 = 1 THEN 1 ELSE 0 END)::BIGINT AS m
        |  FROM fl)
        |SELECT n1, n2, m,
        |  round((n1 + 1)::DOUBLE * (n2 + 1)::DOUBLE / (m + 1)::DOUBLE - 1.0, 6)
        |    AS n_hat,
        |  round(sqrt((n1 + 1)::DOUBLE * (n2 + 1)::DOUBLE * (n1 - m)::DOUBLE
        |    * (n2 - m)::DOUBLE / ((m + 1)::DOUBLE * (m + 1)::DOUBLE
        |    * (m + 2)::DOUBLE)), 6) AS se
        |FROM a""".stripMargin,

    "q383_good_turing" ->
      """WITH tf AS (SELECT term, count(*) AS r FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
        |      '\s+'), x -> x <> '')) AS term FROM documents) GROUP BY 1),
        |nr AS (SELECT r, count(*) AS n_r FROM tf GROUP BY 1),
        |tot AS (SELECT sum(r)::BIGINT AS n_tokens,
        |    sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)::BIGINT AS n1 FROM tf),
        |rs AS (SELECT unnest(generate_series(1, 5)) AS r)
        |SELECT rs.r::BIGINT AS r, coalesce(a.n_r, 0)::BIGINT AS n_r,
        |  coalesce(b.n_r, 0)::BIGINT AS n_r_next,
        |  round(CASE WHEN coalesce(a.n_r, 0) > 0 AND coalesce(b.n_r, 0) > 0
        |    THEN (rs.r + 1)::DOUBLE * b.n_r::DOUBLE / a.n_r::DOUBLE END, 6)
        |    AS r_star,
        |  round(tot.n1::DOUBLE / tot.n_tokens::DOUBLE, 6) AS p_unseen
        |FROM rs LEFT JOIN nr a ON a.r = rs.r
        |  LEFT JOIN nr b ON b.r = rs.r + 1, tot
        |ORDER BY 1""".stripMargin,

    "q384_ccc" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n, sum(x::DOUBLE) AS sx,
        |    sum(y::DOUBLE) AS sy, sum(x::DOUBLE * x::DOUBLE) AS sxx,
        |    sum(y::DOUBLE * y::DOUBLE) AS syy,
        |    sum(x::DOUBLE * y::DOUBLE) AS sxy FROM daily),
        |c AS (SELECT n, sx/n::DOUBLE AS mx, sy/n::DOUBLE AS my,
        |    sxx/n::DOUBLE - (sx/n::DOUBLE)*(sx/n::DOUBLE) AS vx,
        |    syy/n::DOUBLE - (sy/n::DOUBLE)*(sy/n::DOUBLE) AS vy,
        |    sxy/n::DOUBLE - (sx/n::DOUBLE)*(sy/n::DOUBLE) AS cxy
        |  FROM a)
        |SELECT n,
        |  round(CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
        |    cxy/sqrt(vx*vy) END, 6) AS pearson,
        |  round(CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
        |    2.0*cxy/(vx + vy + (mx - my)*(mx - my)) END, 6) AS ccc
        |FROM c""".stripMargin,

    "q385_switchback" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1),
        |arm AS (SELECT v, day(d) % 2 AS arm FROM daily),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN arm = 1 THEN v ELSE 0.0 END) AS s1,
        |    sum(CASE WHEN arm = 1 THEN v*v ELSE 0.0 END) AS q1,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN arm = 0 THEN v ELSE 0.0 END) AS s0,
        |    sum(CASE WHEN arm = 0 THEN v*v ELSE 0.0 END) AS q0
        |  FROM arm),
        |c AS (SELECT n1, n0, s1/n1::DOUBLE AS m1, s0/n0::DOUBLE AS m0,
        |    (q1 - s1*s1/n1::DOUBLE)/(n1::DOUBLE - 1.0) AS v1,
        |    (q0 - s0*s0/n0::DOUBLE)/(n0::DOUBLE - 1.0) AS v0
        |  FROM a)
        |SELECT n1, n0,
        |  round(CASE WHEN n1 >= 2 AND n0 >= 2 THEN m1 - m0 END, 6) AS effect,
        |  round(CASE WHEN n1 >= 2 AND n0 >= 2
        |      AND (v1/n1::DOUBLE + v0/n0::DOUBLE) > 0 THEN
        |    (m1 - m0)/sqrt(v1/n1::DOUBLE + v0/n0::DOUBLE) END, 6) AS t_stat
        |FROM c""".stripMargin,

    "q386_ams_f2" -> amsF2Sql(rows = 8),

    // same integer term counts, equal-rate expectations, x*ln(x/E) terms
    "q387_keyness" ->
      """WITH t AS (SELECT (doc_id % 2 = 0) AS fl,
        |    unnest(list_filter(regexp_split_to_array(trim(lower(text)),
        |      '\s+'), x -> x <> '')) AS term FROM documents),
        |tf0 AS (SELECT term,
        |    sum(CASE WHEN fl THEN 1 ELSE 0 END)::BIGINT AS y_a,
        |    sum(CASE WHEN NOT fl THEN 1 ELSE 0 END)::BIGINT AS y_b
        |  FROM t GROUP BY 1),
        |tf AS (SELECT * FROM tf0 WHERE y_a + y_b >= 50),
        |tot AS (SELECT sum(y_a)::DOUBLE AS na, sum(y_b)::DOUBLE AS nb FROM tf)
        |SELECT term, y_a, y_b,
        |  round(2.0 * (
        |    CASE WHEN y_a > 0 THEN y_a::DOUBLE * ln(y_a::DOUBLE
        |      / (na * (y_a + y_b)::DOUBLE / (na + nb))) ELSE 0.0 END
        |    + CASE WHEN y_b > 0 THEN y_b::DOUBLE * ln(y_b::DOUBLE
        |      / (nb * (y_a + y_b)::DOUBLE / (na + nb))) ELSE 0.0 END), 6) AS g2,
        |  CASE WHEN y_a::DOUBLE * nb > y_b::DOUBLE * na THEN 'a' ELSE 'b' END
        |    AS over
        |FROM tf, tot ORDER BY term""".stripMargin,

    "q388_odds_ci" ->
      """WITH c AS (SELECT
        |    sum(CASE WHEN lang = 'en' AND n_chars >= 1000 THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN lang = 'en' AND n_chars < 1000 THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN lang <> 'en' AND n_chars >= 1000 THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN lang <> 'en' AND n_chars < 1000 THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM documents),
        |o AS (SELECT a, b, c, d,
        |    a::DOUBLE * d::DOUBLE / (b::DOUBLE * c::DOUBLE) AS orr,
        |    sqrt(1.0/a::DOUBLE + 1.0/b::DOUBLE + 1.0/c::DOUBLE
        |      + 1.0/d::DOUBLE) AS se,
        |    (a >= 1 AND b >= 1 AND c >= 1 AND d >= 1) AS ok
        |  FROM c)
        |SELECT a, b, c, d,
        |  round(CASE WHEN ok THEN orr END, 6) AS odds_ratio,
        |  round(CASE WHEN ok THEN exp(ln(orr) - 1.96*se) END, 6) AS ci_lo,
        |  round(CASE WHEN ok THEN exp(ln(orr) + 1.96*se) END, 6) AS ci_hi
        |FROM o""".stripMargin,

    // pair x_i with x_{i+ceil(n/2)}; binomial(m, 1/2) normal approximation
    "q389_cox_stuart" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, cnt::DOUBLE AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |s2 AS (SELECT *, ceil(n::DOUBLE/2.0)::BIGINT AS h FROM s1),
        |j AS (SELECT a.event_type, max(a.n) AS n,
        |    sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)::BIGINT AS s_plus,
        |    sum(CASE WHEN b.v <> a.v THEN 1 ELSE 0 END)::BIGINT AS m
        |  FROM s2 a JOIN s2 b ON a.event_type = b.event_type
        |    AND b.rn = a.rn + a.h
        |  WHERE a.rn <= a.n - a.h GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n, m, s_plus,
        |  round(CASE WHEN m > 0 THEN
        |    (s_plus::DOUBLE - m::DOUBLE/2.0)/sqrt(m::DOUBLE/4.0) END, 6) AS z
        |FROM j ORDER BY 1""".stripMargin,

    // midranks of |d| over nonzero pairs; tie-corrected variance
    "q390_wilcoxon_sr" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |b AS (SELECT (x - y)::DOUBLE AS dd, abs((x - y)::DOUBLE) AS ad
        |  FROM daily),
        |nz AS (SELECT dd, ad FROM b WHERE dd <> 0.0),
        |r AS (SELECT dd,
        |    rank() OVER (ORDER BY ad)
        |      + (count(*) OVER (PARTITION BY ad) - 1)/2.0 AS mid,
        |    count(*) OVER (PARTITION BY ad) AS t FROM nz),
        |a AS (SELECT count(*)::BIGINT AS n_nonzero,
        |    sum(CASE WHEN dd > 0 THEN mid ELSE 0.0 END) AS w_plus,
        |    sum((t*t*t - t)::DOUBLE / t::DOUBLE) AS tie FROM r),
        |tot AS (SELECT count(*)::BIGINT AS n_pairs FROM b),
        |z AS (SELECT tot.n_pairs, a.n_nonzero, a.w_plus,
        |    n_nonzero::DOUBLE AS nd,
        |    n_nonzero::DOUBLE * (n_nonzero::DOUBLE + 1)
        |      * (n_nonzero::DOUBLE * 2 + 1) / 24.0 - a.tie/48.0 AS var
        |  FROM tot, a)
        |SELECT n_pairs, n_nonzero, round(w_plus, 6) AS w_plus,
        |  round(CASE WHEN n_nonzero > 0 AND var > 0 THEN
        |    (w_plus - nd*(nd + 1)/4.0)/sqrt(var) END, 6) AS z
        |FROM z""".stripMargin,

    "q391_bartlett" -> bartlettSql(
      Seq("click", "view", "purchase", "error", "signup")),

    // Cramer 3x3 on the hinge design; integer det guard
    "q392_hinge_trend" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |s1 AS (SELECT user_id, v,
        |    (row_number() OVER (PARTITION BY user_id ORDER BY d) - 1)::DOUBLE AS t,
        |    count(*) OVER (PARTITION BY user_id) AS nn
        |  FROM daily),
        |s2 AS (SELECT user_id, v, t,
        |    greatest(t - floor(nn::DOUBLE/2.0), 0.0) AS h, nn FROM s1),
        |g AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(t) AS sa, sum(h) AS sb, sum(t*t) AS s11, sum(t*h) AS s12,
        |    sum(h*h) AS s22, sum(v) AS sy, sum(t*v) AS s1y, sum(h*v) AS s2y
        |  FROM s2 GROUP BY 1),
        |c AS (SELECT *, n::DOUBLE AS nd,
        |    n::DOUBLE*(s11*s22 - s12*s12) - sa*(sa*s22 - s12*sb)
        |      + sb*(sa*s12 - s11*sb) AS da
        |  FROM g),
        |e AS (SELECT user_id, n, da,
        |    sy*(s11*s22 - s12*s12) - sa*(s1y*s22 - s12*s2y)
        |      + sb*(s1y*s12 - s11*s2y) AS d0,
        |    nd*(s1y*s22 - s12*s2y) - sy*(sa*s22 - s12*sb)
        |      + sb*(sa*s2y - s1y*sb) AS d1,
        |    nd*(s11*s2y - s1y*s12) - sa*(sa*s2y - s1y*sb)
        |      + sy*(sa*s12 - s11*sb) AS d2
        |  FROM c)
        |SELECT user_id, n,
        |  round(CASE WHEN n >= 4 AND da > 0 THEN d0/da END, 6) AS b0,
        |  round(CASE WHEN n >= 4 AND da > 0 THEN d1/da END, 6) AS b1,
        |  round(CASE WHEN n >= 4 AND da > 0 THEN d2/da END, 6) AS b2
        |FROM e ORDER BY 1""".stripMargin,

    // MWU z (q179 machinery) + AB z (q379 machinery) on the same pooled
    // frame; L = z1^2 + z2^2
    "q393_lepage" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click', 'view')),
        |r1 AS (SELECT arm, v,
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS mid,
        |    count(*) OVER (PARTITION BY v) AS tc FROM b),
        |mw AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'click' THEN mid ELSE 0.0 END) AS ra,
        |    sum(tc*tc - 1) AS tie FROM r1),
        |mz AS (SELECT n_a, n_b,
        |    (ra - n_a::DOUBLE*(n_a + 1)/2 - n_a::DOUBLE*n_b/2)
        |      / sqrt(n_a::DOUBLE*n_b/12*(((n_a + n_b) + 1)
        |        - tie::DOUBLE/((n_a + n_b)*((n_a + n_b) - 1)))) AS z_loc
        |  FROM mw),
        |r2 AS (SELECT arm, v, row_number() OVER (ORDER BY v, arm) AS rn,
        |    count(*) OVER () AS n FROM b),
        |s0 AS (SELECT arm, v,
        |    least(rn::DOUBLE, (n + 1 - rn)::DOUBLE) AS s0 FROM r2),
        |s1 AS (SELECT arm, avg(s0) OVER (PARTITION BY v) AS s FROM s0),
        |aa AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS nb,
        |    sum(CASE WHEN arm = 'click' THEN s ELSE 0.0 END) AS ab_stat,
        |    sum(s) AS ss, sum(s*s) AS sq FROM s1),
        |az AS (SELECT
        |    (ab_stat - na::DOUBLE * ss / (na + nb)::DOUBLE)
        |      / sqrt(na::DOUBLE * nb::DOUBLE / ((na + nb)::DOUBLE - 1.0)
        |        * (sq/(na + nb)::DOUBLE
        |          - (ss/(na + nb)::DOUBLE)*(ss/(na + nb)::DOUBLE))) AS z_scale
        |  FROM aa)
        |SELECT n_a, n_b, round(z_loc, 6) AS z_loc,
        |  round(z_scale, 6) AS z_scale,
        |  round(z_loc*z_loc + z_scale*z_scale, 6) AS lepage
        |FROM mz, az""".stripMargin,

    "q394_poisson_ci" ->
      """WITH a AS (SELECT event_type, count(*)::BIGINT AS x,
        |    count(DISTINCT date_trunc('day', ts))::BIGINT AS t_days
        |  FROM events GROUP BY 1),
        |c AS (SELECT event_type, x, t_days, x::DOUBLE AS xd,
        |    t_days::DOUBLE AS td, x::DOUBLE + 1.0 AS x1,
        |    1.0 - 1.0/(9.0*x::DOUBLE) - 1.96/(3.0*sqrt(x::DOUBLE)) AS clo,
        |    1.0 - 1.0/(9.0*(x::DOUBLE + 1.0))
        |      + 1.96/(3.0*sqrt(x::DOUBLE + 1.0)) AS chi
        |  FROM a)
        |SELECT event_type, x, t_days, round(xd/td, 6) AS rate,
        |  round(CASE WHEN x >= 1 THEN xd * (clo*clo*clo) / td END, 6) AS ci_lo,
        |  round(x1 * (chi*chi*chi) / td, 6) AS ci_hi
        |FROM c ORDER BY 1""".stripMargin,

    // population pearson on (odd-day, even-day) user totals; SB step-up
    "q395_split_half" ->
      """WITH u AS (SELECT user_id,
        |    sum(CASE WHEN day(ts) % 2 = 1 THEN value ELSE 0.0 END) AS o,
        |    sum(CASE WHEN day(ts) % 2 = 0 THEN value ELSE 0.0 END) AS e
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT AS n, sum(o) AS sx, sum(e) AS sy,
        |    sum(o*o) AS sxx, sum(e*e) AS syy, sum(o*e) AS sxy FROM u),
        |c AS (SELECT n,
        |    sxx/n::DOUBLE - (sx/n::DOUBLE)*(sx/n::DOUBLE) AS vx,
        |    syy/n::DOUBLE - (sy/n::DOUBLE)*(sy/n::DOUBLE) AS vy,
        |    sxy/n::DOUBLE - (sx/n::DOUBLE)*(sy/n::DOUBLE) AS cxy
        |  FROM m),
        |r AS (SELECT n, CASE WHEN n >= 2 AND vx > 0 AND vy > 0 THEN
        |    cxy/sqrt(vx*vy) END AS r FROM c)
        |SELECT n AS n_users, round(r, 6) AS r_half,
        |  round(2.0*r/(1.0 + r), 6) AS sb
        |FROM r""".stripMargin,

    "q396_skyline" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> ''))::BIGINT AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens FROM d a
        |WHERE NOT EXISTS (SELECT 1 FROM d b
        |  WHERE a.n_chars <= b.n_chars AND a.n_tokens <= b.n_tokens
        |    AND (a.n_chars < b.n_chars OR a.n_tokens < b.n_tokens))
        |ORDER BY doc_id""".stripMargin,

    // explicit lower-middle medians per coordinate; quadrant counts
    "q397_blomqvist" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS xi,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS yi
        |  FROM events GROUP BY 1),
        |b AS (SELECT xi::DOUBLE AS x, yi::DOUBLE AS y FROM daily),
        |mx AS (SELECT x AS med_x FROM (SELECT x,
        |    row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
        |  FROM b) WHERE rn = floor((n + 1)::DOUBLE/2.0)::BIGINT),
        |my AS (SELECT y AS med_y FROM (SELECT y,
        |    row_number() OVER (ORDER BY y) AS rn, count(*) OVER () AS n
        |  FROM b) WHERE rn = floor((n + 1)::DOUBLE/2.0)::BIGINT),
        |a AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN (x > med_x AND y > med_y)
        |      OR (x < med_x AND y < med_y) THEN 1 ELSE 0 END)::BIGINT AS conc,
        |    sum(CASE WHEN (x > med_x AND y < med_y)
        |      OR (x < med_x AND y > med_y) THEN 1 ELSE 0 END)::BIGINT AS disc
        |  FROM b, mx, my)
        |SELECT n, (conc + disc) AS n_used,
        |  round(CASE WHEN conc + disc > 0 THEN
        |    (conc - disc)::DOUBLE/(conc + disc)::DOUBLE END, 6) AS beta
        |FROM a""".stripMargin,

    "q398_cramers_v" ->
      """WITH cells AS (SELECT lang AS a, source AS b, count(*) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS na FROM cells GROUP BY 1),
        |cb AS (SELECT b, sum(o) AS nb FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o)::BIGINT AS n,
        |    count(DISTINCT a)::BIGINT AS r_levels,
        |    count(DISTINCT b)::BIGINT AS c_levels FROM cells),
        |grid AS (SELECT ra.a, cb.b, ra.na, cb.nb,
        |    coalesce(cells.o, 0) AS oc
        |  FROM ra CROSS JOIN cb LEFT JOIN cells USING (a, b)),
        |x AS (SELECT sum((oc::DOUBLE - na::DOUBLE*nb::DOUBLE/n::DOUBLE)
        |      *(oc::DOUBLE - na::DOUBLE*nb::DOUBLE/n::DOUBLE)
        |      /(na::DOUBLE*nb::DOUBLE/n::DOUBLE)) AS chi2,
        |    max(n) AS n, max(r_levels) AS r_levels, max(c_levels) AS c_levels
        |  FROM grid, tot),
        |f AS (SELECT n, r_levels, c_levels, chi2, n::DOUBLE AS nd,
        |    r_levels::DOUBLE AS rl, c_levels::DOUBLE AS cl FROM x),
        |g AS (SELECT *, chi2/nd AS phi2,
        |    greatest(0.0, chi2/nd - (rl - 1)*(cl - 1)/(nd - 1)) AS phit,
        |    rl - (rl - 1)*(rl - 1)/(nd - 1) AS rt,
        |    cl - (cl - 1)*(cl - 1)/(nd - 1) AS ct FROM f)
        |SELECT n, r_levels, c_levels, round(chi2, 6) AS chi2,
        |  round(CASE WHEN least(rl, cl) > 1 THEN
        |    sqrt(phi2/(least(rl, cl) - 1)) END, 6) AS v,
        |  round(CASE WHEN least(rt, ct) > 1 THEN
        |    sqrt(phit/(least(rt, ct) - 1)) END, 6) AS v_corrected
        |FROM g""".stripMargin,

    // full pair self-join; unordered counts halved by integer div
    "q399_ordinal_assoc" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |b AS (SELECT x::DOUBLE AS x, y::DOUBLE AS y FROM daily),
        |j AS (SELECT count(*) AS np2,
        |    sum(CASE WHEN (a.x < c.x AND a.y < c.y)
        |      OR (a.x > c.x AND a.y > c.y) THEN 1 ELSE 0 END) AS c2,
        |    sum(CASE WHEN (a.x < c.x AND a.y > c.y)
        |      OR (a.x > c.x AND a.y < c.y) THEN 1 ELSE 0 END) AS d2,
        |    sum(CASE WHEN a.x <> c.x AND a.y = c.y THEN 1 ELSE 0 END) AS ty2
        |  FROM b a, b c),
        |h AS (SELECT sqrt(np2::DOUBLE)::BIGINT AS n, (c2//2)::BIGINT AS n_conc,
        |    (d2//2)::BIGINT AS n_disc, (ty2//2)::BIGINT AS ty FROM j)
        |SELECT n, n_conc, n_disc,
        |  round(CASE WHEN n_conc + n_disc > 0 THEN
        |    (n_conc - n_disc)::DOUBLE/(n_conc + n_disc)::DOUBLE END, 6)
        |    AS gamma,
        |  round(CASE WHEN n_conc + n_disc + ty > 0 THEN
        |    (n_conc - n_disc)::DOUBLE/(n_conc + n_disc + ty)::DOUBLE END, 6)
        |    AS somers_d
        |FROM h""".stripMargin,

    // per-source literal-lang entropy folds; H(x|y) = sum p(y) H(x|y)
    "q400_theil_u_cat" ->
      """WITH p AS (SELECT source,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS x0,
        |    sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS x1,
        |    sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS x2,
        |    sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS x3,
        |    sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS x4,
        |    count(*) AS ny
        |  FROM documents WHERE lang IN ('en','zh','es','de','fr')
        |  GROUP BY 1),
        |h AS (SELECT source, ny, x0, x1, x2, x3, x4,
        |    ((((CASE WHEN x0 > 0 THEN -(x0::DOUBLE/ny::DOUBLE)*ln(x0::DOUBLE/ny::DOUBLE) ELSE 0.0 END
        |      + CASE WHEN x1 > 0 THEN -(x1::DOUBLE/ny::DOUBLE)*ln(x1::DOUBLE/ny::DOUBLE) ELSE 0.0 END)
        |      + CASE WHEN x2 > 0 THEN -(x2::DOUBLE/ny::DOUBLE)*ln(x2::DOUBLE/ny::DOUBLE) ELSE 0.0 END)
        |      + CASE WHEN x3 > 0 THEN -(x3::DOUBLE/ny::DOUBLE)*ln(x3::DOUBLE/ny::DOUBLE) ELSE 0.0 END)
        |      + CASE WHEN x4 > 0 THEN -(x4::DOUBLE/ny::DOUBLE)*ln(x4::DOUBLE/ny::DOUBLE) ELSE 0.0 END) AS hy
        |  FROM p),
        |a AS (SELECT sum(ny)::BIGINT AS n, sum(x0) AS t0, sum(x1) AS t1,
        |    sum(x2) AS t2, sum(x3) AS t3, sum(x4) AS t4,
        |    sum(ny::DOUBLE * hy) AS snh FROM h),
        |f AS (SELECT n, snh/n::DOUBLE AS hxy,
        |    ((((CASE WHEN t0 > 0 THEN -(t0::DOUBLE/n::DOUBLE)*ln(t0::DOUBLE/n::DOUBLE) ELSE 0.0 END
        |      + CASE WHEN t1 > 0 THEN -(t1::DOUBLE/n::DOUBLE)*ln(t1::DOUBLE/n::DOUBLE) ELSE 0.0 END)
        |      + CASE WHEN t2 > 0 THEN -(t2::DOUBLE/n::DOUBLE)*ln(t2::DOUBLE/n::DOUBLE) ELSE 0.0 END)
        |      + CASE WHEN t3 > 0 THEN -(t3::DOUBLE/n::DOUBLE)*ln(t3::DOUBLE/n::DOUBLE) ELSE 0.0 END)
        |      + CASE WHEN t4 > 0 THEN -(t4::DOUBLE/n::DOUBLE)*ln(t4::DOUBLE/n::DOUBLE) ELSE 0.0 END) AS hx
        |  FROM a)
        |SELECT n, round(hx, 6) AS h_x, round(hxy, 6) AS h_x_given_y,
        |  round(CASE WHEN hx > 0 THEN (hx - hxy)/hx END, 6) AS u
        |FROM f""".stripMargin,

    // the full D'Agostino 1990 transform chain, stage by stage
    "q401_dagostino" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*)::BIGINT AS nl, sum(x) AS s1,
        |    sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
        |  FROM daily GROUP BY 1),
        |c AS (SELECT event_type, nl, nl::DOUBLE AS n, s1/nl::DOUBLE AS mu,
        |    s2, s3, s4 FROM m),
        |mm AS (SELECT *, s2/n - mu*mu AS m2,
        |    s3/n - 3.0*mu*(s2/n) + 2.0*mu*mu*mu AS m3,
        |    s4/n - 4.0*mu*(s3/n) + 6.0*mu*mu*(s2/n)
        |      - 3.0*mu*mu*mu*mu AS m4 FROM c),
        |g AS (SELECT event_type, nl, n, m2,
        |    m3/sqrt(m2*m2*m2) AS g1, m4/(m2*m2) - 3.0 AS g2 FROM mm),
        |sk AS (SELECT *, g1 * sqrt((n + 1)*(n + 3)/(6.0*(n - 2))) AS y,
        |    3.0*(n*n + 27.0*n - 70.0)*(n + 1)*(n + 3)
        |      /((n - 2)*(n + 5)*(n + 7)*(n + 9)) AS b2 FROM g),
        |sk2 AS (SELECT *, sqrt(2.0*(b2 - 1)) - 1.0 AS w2 FROM sk),
        |sk3 AS (SELECT *, 1.0/sqrt(ln(sqrt(w2))) AS delta,
        |    sqrt(2.0/(w2 - 1)) AS alpha FROM sk2),
        |sk4 AS (SELECT *,
        |    delta * ln(y/alpha + sqrt((y/alpha)*(y/alpha) + 1)) AS z1
        |  FROM sk3),
        |ku AS (SELECT *, -6.0/(n + 1) AS eg2,
        |    24.0*n*(n - 2)*(n - 3)/((n + 1)*(n + 1)*(n + 3)*(n + 5)) AS vg2
        |  FROM sk4),
        |ku2 AS (SELECT *, (g2 - eg2)/sqrt(vg2) AS xk,
        |    6.0*(n*n - 5.0*n + 2.0)/((n + 7)*(n + 9))
        |      * sqrt(6.0*(n + 3)*(n + 5)/(n*(n - 2)*(n - 3))) AS beta
        |  FROM ku),
        |ku3 AS (SELECT *, 6.0 + 8.0/beta
        |    * (2.0/beta + sqrt(1.0 + 4.0/(beta*beta))) AS aa FROM ku2),
        |ku4 AS (SELECT *,
        |    (1.0 - 2.0/(9.0*aa) - cbrt((1.0 - 2.0/aa)
        |      /(1.0 + xk*sqrt(2.0/(aa - 4)))))
        |      / sqrt(2.0/(9.0*aa)) AS z2
        |  FROM ku3)
        |SELECT event_type, nl AS n,
        |  round(CASE WHEN nl >= 9 AND m2 > 0 THEN z1 END, 6) AS z_skew,
        |  round(CASE WHEN nl >= 9 AND m2 > 0 THEN z2 END, 6) AS z_kurt,
        |  round(CASE WHEN nl >= 9 AND m2 > 0 THEN z1*z1 + z2*z2 END, 6) AS k2
        |FROM ku4 ORDER BY 1""".stripMargin,

    // MWU midranks (q179 machinery) -> u_a -> CLES and rank-biserial
    "q402_effect_sizes" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click', 'view')),
        |r1 AS (SELECT arm, v,
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS mid FROM b),
        |mw AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'click' THEN mid ELSE 0.0 END) AS ra FROM r1),
        |mz AS (SELECT n_a, n_b,
        |    ra - n_a::DOUBLE*(n_a + 1)/2 AS ua FROM mw)
        |SELECT n_a, n_b, round(ua, 6) AS u_a,
        |  round(ua/(n_a::DOUBLE*n_b::DOUBLE), 6) AS cles,
        |  round(2.0*ua/(n_a::DOUBLE*n_b::DOUBLE) - 1.0, 6) AS rank_biserial
        |FROM mz""".stripMargin,

    "q403_weighted_kappa" -> weightedKappaSql(3),

    // pairwise slopes ranked on (slope, i, j); explicit rank picks for the
    // median and the Gilbert CI ranks
    "q404_sen_ci" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, cnt::DOUBLE AS v,
        |    (row_number() OVER (PARTITION BY event_type ORDER BY d) - 1)::DOUBLE AS i
        |  FROM daily),
        |p AS (SELECT a.event_type, a.i AS i, b.i AS j,
        |    (b.v - a.v)/(b.i - a.i) AS s
        |  FROM s1 a JOIN s1 b ON a.event_type = b.event_type AND a.i < b.i),
        |r AS (SELECT event_type, s,
        |    row_number() OVER (PARTITION BY event_type ORDER BY s, i, j) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS np FROM p),
        |c AS (SELECT *,
        |    (1.0 + sqrt(1.0 + 8.0*np::DOUBLE))/2.0 AS neff FROM r),
        |c2 AS (SELECT *,
        |    1.96*sqrt(neff*(neff - 1)*(neff*2 + 5)/18.0) AS cb FROM c),
        |c3 AS (SELECT *, floor((np::DOUBLE + 1.0)/2.0)::BIGINT AS rmed,
        |    greatest(1, ceil((np::DOUBLE - cb)/2.0)::BIGINT) AS rlo,
        |    least(np, ceil((np::DOUBLE + cb)/2.0 + 1.0)::BIGINT) AS rhi
        |  FROM c2),
        |g AS (SELECT event_type, max(np)::BIGINT AS n_pairs,
        |    max(CASE WHEN rn = rmed THEN s END) AS slope,
        |    max(CASE WHEN rn = rlo THEN s END) AS ci_lo,
        |    max(CASE WHEN rn = rhi THEN s END) AS ci_hi
        |  FROM c3 GROUP BY 1)
        |SELECT event_type,
        |  ((1.0 + sqrt(1.0 + 8.0*n_pairs::DOUBLE))/2.0)::BIGINT AS n,
        |  n_pairs, round(slope, 6) AS slope, round(ci_lo, 6) AS ci_lo,
        |  round(ci_hi, 6) AS ci_hi
        |FROM g ORDER BY 1""".stripMargin,

    // octile picks at rank floor((n-1)p)+1 (lower-value convention)
    "q405_robust_shape" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, cnt::DOUBLE AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM daily),
        |g AS (SELECT event_type, max(n)::BIGINT AS n,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.125)::BIGINT + 1 THEN v END) AS e1,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.25)::BIGINT + 1 THEN v END) AS e2,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.375)::BIGINT + 1 THEN v END) AS e3,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.5)::BIGINT + 1 THEN v END) AS e4,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.625)::BIGINT + 1 THEN v END) AS e5,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.75)::BIGINT + 1 THEN v END) AS e6,
        |    max(CASE WHEN rn = floor((n - 1)::DOUBLE * 0.875)::BIGINT + 1 THEN v END) AS e7
        |  FROM s1 GROUP BY 1)
        |SELECT event_type, n, e2 AS q1, e4 AS median, e6 AS q3,
        |  round(CASE WHEN e6 - e2 > 0 THEN
        |    (e6 + e2 - 2.0*e4)/(e6 - e2) END, 6) AS bowley_skew,
        |  round(CASE WHEN e6 - e2 > 0 THEN
        |    ((e7 - e5) + (e3 - e1))/(e6 - e2) END, 6) AS moors_kurt
        |FROM g ORDER BY 1""".stripMargin,

    // the q290 moment pivot -> SSB/SSW -> eta2 / epsilon2 / omega2
    "q406_anova_effects" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |piv AS (SELECT count(*) AS n,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN event_type = 'click' THEN cnt::DOUBLE ELSE 0.0 END) AS s0,
        |    sum(CASE WHEN event_type = 'click' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q0,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN event_type = 'view' THEN cnt::DOUBLE ELSE 0.0 END) AS s1,
        |    sum(CASE WHEN event_type = 'view' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q1,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN event_type = 'purchase' THEN cnt::DOUBLE ELSE 0.0 END) AS s2,
        |    sum(CASE WHEN event_type = 'purchase' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q2,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n3,
        |    sum(CASE WHEN event_type = 'error' THEN cnt::DOUBLE ELSE 0.0 END) AS s3,
        |    sum(CASE WHEN event_type = 'error' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q3,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n4,
        |    sum(CASE WHEN event_type = 'signup' THEN cnt::DOUBLE ELSE 0.0 END) AS s4,
        |    sum(CASE WHEN event_type = 'signup' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q4
        |  FROM daily
        |  WHERE event_type IN ('click','view','purchase','error','signup')),
        |m AS (SELECT n,
        |    ((((s0*s0/n0::DOUBLE + s1*s1/n1::DOUBLE) + s2*s2/n2::DOUBLE)
        |      + s3*s3/n3::DOUBLE) + s4*s4/n4::DOUBLE) AS ssbp,
        |    ((((s0 + s1) + s2) + s3) + s4) AS st,
        |    ((((q0 + q1) + q2) + q3) + q4) AS qt,
        |    (n0 >= 1 AND n1 >= 1 AND n2 >= 1 AND n3 >= 1 AND n4 >= 1
        |      AND n > 5) AS ok
        |  FROM piv),
        |e AS (SELECT n, ok, ssbp - st*st/n::DOUBLE AS ssb,
        |    qt - ssbp AS ssw FROM m),
        |f AS (SELECT n, ok, ssb, ssw, ssb + ssw AS sst,
        |    ssw/(n - 5)::DOUBLE AS msw FROM e)
        |SELECT n::BIGINT AS n,
        |  round(CASE WHEN ok AND sst > 0 THEN ssb/sst END, 6) AS eta2,
        |  round(CASE WHEN ok AND sst > 0 THEN
        |    (ssb - 4.0*msw)/sst END, 6) AS epsilon2,
        |  round(CASE WHEN ok AND sst + msw > 0 THEN
        |    (ssb - 4.0*msw)/(sst + msw) END, 6) AS omega2
        |FROM f""".stripMargin,

    // integer exceedance rule; GPD MoM on the rational excesses
    "q407_gpd_tail" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type) AS tot,
        |    count(*) OVER (PARTITION BY event_type) AS nn FROM daily),
        |x AS (SELECT event_type,
        |    cnt::DOUBLE - tot::DOUBLE/nn::DOUBLE AS excess
        |  FROM w WHERE cnt * nn > tot),
        |g AS (SELECT event_type, count(*)::BIGINT AS n_exceed,
        |    sum(excess) AS s, sum(excess*excess) AS q FROM x GROUP BY 1),
        |c AS (SELECT event_type, n_exceed, s/n_exceed::DOUBLE AS m,
        |    (q - s*s/n_exceed::DOUBLE)/(n_exceed::DOUBLE - 1) AS s2
        |  FROM g),
        |f AS (SELECT event_type, n_exceed, m, s2, m*m/s2 AS ratio,
        |    (n_exceed >= 3 AND s2 > 0 AND m > 0) AS ok FROM c)
        |SELECT event_type, n_exceed,
        |  round(CASE WHEN ok THEN (1.0 - ratio)/2.0 END, 6) AS xi,
        |  round(CASE WHEN ok THEN m*(ratio + 1)/2.0 END, 6) AS sigma
        |FROM f ORDER BY 1""".stripMargin,

    // q153's midrank-moment spearman per type + the Fisher-z interval
    "q408_spearman_ci" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS x, sum(value) AS y FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, x::DOUBLE AS x, y::DOUBLE AS y FROM daily
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |r1 AS (SELECT *, (row_number() OVER (PARTITION BY event_type ORDER BY x))::DOUBLE AS rnx
        |  FROM b),
        |r2 AS (SELECT *, avg(rnx) OVER (PARTITION BY event_type, x) AS rxa FROM r1),
        |r3 AS (SELECT *, (row_number() OVER (PARTITION BY event_type ORDER BY y))::DOUBLE AS rny
        |  FROM r2),
        |r4 AS (SELECT *, avg(rny) OVER (PARTITION BY event_type, y) AS rya FROM r3),
        |g AS (SELECT event_type, count(*)::DOUBLE AS n,
        |    sum(rxa) AS sx, sum(rya) AS sy, sum(rxa*rxa) AS sxx,
        |    sum(rya*rya) AS syy, sum(rxa*rya) AS sxy
        |  FROM r4 GROUP BY 1),
        |rr AS (SELECT event_type, n,
        |    CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0
        |      THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
        |    END AS rho FROM g),
        |ci AS (SELECT event_type, n, rho,
        |    0.5*ln((1.0 + rho)/(1.0 - rho)) AS z,
        |    1.96/sqrt(n - 3.0) AS half FROM rr)
        |SELECT event_type, n::BIGINT AS n, round(rho, 6) AS rho,
        |  round(CASE WHEN n > 3 AND abs(rho) < 1 THEN
        |    (exp(2.0*(z - half)) - 1.0)/(exp(2.0*(z - half)) + 1.0) END, 6)
        |    AS ci_lo,
        |  round(CASE WHEN n > 3 AND abs(rho) < 1 THEN
        |    (exp(2.0*(z + half)) - 1.0)/(exp(2.0*(z + half)) + 1.0) END, 6)
        |    AS ci_hi
        |FROM ci ORDER BY 1""".stripMargin,

    "q409_confusion_metrics" ->
      """WITH c AS (SELECT
        |    sum(CASE WHEN n_chars >= 1000 AND lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN n_chars >= 1000 AND lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS fp,
        |    sum(CASE WHEN n_chars < 1000 AND lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS fn,
        |    sum(CASE WHEN n_chars < 1000 AND lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS tn
        |  FROM documents),
        |m AS (SELECT tp, fp, fn, tn,
        |    CASE WHEN tp + fp > 0 THEN tp::DOUBLE/(tp::DOUBLE + fp::DOUBLE) END AS prec,
        |    CASE WHEN tp + fn > 0 THEN tp::DOUBLE/(tp::DOUBLE + fn::DOUBLE) END AS rec,
        |    CASE WHEN tn + fp > 0 THEN tn::DOUBLE/(tn::DOUBLE + fp::DOUBLE) END AS spec,
        |    sqrt((tp::DOUBLE + fp::DOUBLE)*(tp::DOUBLE + fn::DOUBLE)
        |      *(tn::DOUBLE + fp::DOUBLE)*(tn::DOUBLE + fn::DOUBLE)) AS mden
        |  FROM c)
        |SELECT tp, fp, fn, tn, round(prec, 6) AS precision,
        |  round(rec, 6) AS recall,
        |  round(CASE WHEN prec + rec > 0 THEN
        |    2.0*prec*rec/(prec + rec) END, 6) AS f1,
        |  round((rec + spec)/2.0, 6) AS balanced_acc,
        |  round(rec + spec - 1.0, 6) AS youden_j,
        |  round(CASE WHEN mden > 0 THEN
        |    (tp::DOUBLE*tn::DOUBLE - fp::DOUBLE*fn::DOUBLE)/mden END, 6) AS mcc
        |FROM m""".stripMargin,

    "q410_buishand" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, d,
        |    cnt - avg(cnt) OVER (PARTITION BY event_type) AS e FROM daily),
        |s2 AS (SELECT event_type, e,
        |    sum(e) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM s1),
        |a AS (SELECT event_type, count(*)::BIGINT AS n, max(s) AS smax,
        |    min(s) AS smin, sum(e*e) AS see FROM s2 GROUP BY 1),
        |c AS (SELECT event_type, n, smax - smin AS r_range,
        |    sqrt(see/n::DOUBLE) AS sd FROM a)
        |SELECT event_type, n, round(r_range, 6) AS r_range,
        |  round(CASE WHEN sd > 0 THEN
        |    r_range/sd/sqrt(n::DOUBLE) END, 6) AS r_scaled
        |FROM c ORDER BY 1""".stripMargin,

    "q411_von_neumann" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, cnt,
        |    cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY d) AS dd,
        |    cnt - avg(cnt) OVER (PARTITION BY event_type) AS e FROM daily),
        |a AS (SELECT event_type, count(*)::BIGINT AS n,
        |    sum(dd*dd) AS sdd, sum(e*e) AS see FROM s1 GROUP BY 1)
        |SELECT event_type, n,
        |  round(CASE WHEN n >= 2 AND see > 0 THEN sdd/see END, 6) AS vn
        |FROM a ORDER BY 1""".stripMargin,

    "q412_rmsse" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS y FROM events GROUP BY 1, 2),
        |s1 AS (SELECT event_type, d, y,
        |    lag(y) OVER (PARTITION BY event_type ORDER BY d) AS yhat
        |  FROM daily),
        |s2 AS (SELECT event_type, y, yhat,
        |    CASE WHEN day(d) <= 15 THEN 1 ELSE 2 END AS seg FROM s1
        |  WHERE yhat IS NOT NULL),
        |a AS (SELECT event_type,
        |    sum(CASE WHEN seg = 1 THEN 1 ELSE 0 END)::BIGINT AS n_train,
        |    sum(CASE WHEN seg = 1 THEN (y - yhat)*(y - yhat) ELSE 0.0 END)
        |      AS tr,
        |    sum(CASE WHEN seg = 2 THEN 1 ELSE 0 END)::BIGINT AS n_test,
        |    sum(CASE WHEN seg = 2 THEN (y - yhat)*(y - yhat) ELSE 0.0 END)
        |      AS te
        |  FROM s2 GROUP BY 1)
        |SELECT event_type, n_train, n_test,
        |  round(CASE WHEN n_train >= 1 AND n_test >= 1
        |      AND tr/n_train::DOUBLE > 0 THEN
        |    sqrt((te/n_test::DOUBLE)/(tr/n_train::DOUBLE)) END, 6) AS rmsse
        |FROM a ORDER BY 1""".stripMargin,

    "q413_taylor_law" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(cnt::DOUBLE) AS s, sum(cnt::DOUBLE*cnt::DOUBLE) AS q
        |  FROM daily GROUP BY 1),
        |f AS (SELECT s/n::DOUBLE AS m,
        |    (q - s*s/n::DOUBLE)/(n::DOUBLE - 1) AS v FROM u
        |  WHERE n >= 2),
        |l AS (SELECT ln(m) AS x, ln(v) AS y FROM f WHERE m > 0 AND v > 0),
        |g AS (SELECT count(*)::BIGINT AS n_units, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy FROM l),
        |c AS (SELECT n_units, n_units::DOUBLE AS nd, sx, sy, sxx, sxy,
        |    n_units::DOUBLE*sxx - sx*sx AS den FROM g),
        |e AS (SELECT n_units, sx, sy, nd,
        |    CASE WHEN den > 0 THEN (nd*sxy - sx*sy)/den END AS b FROM c)
        |SELECT n_units, round(sy/nd - b*(sx/nd), 6) AS intercept_ln_a,
        |  round(b, 6) AS slope_b
        |FROM e""".stripMargin,

    "q414_lorenz_asym" ->
      """WITH u AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |w AS (SELECT cnt AS x, count(*) OVER () AS n, sum(cnt) OVER () AS t
        |  FROM u),
        |a AS (SELECT max(n)::BIGINT AS n, max(t) AS tt,
        |    sum(CASE WHEN x * n < t THEN 1 ELSE 0 END)::BIGINT AS nb,
        |    sum(CASE WHEN x * n < t THEN x ELSE 0 END) AS mb FROM w)
        |SELECT n, round(nb::DOUBLE/n::DOUBLE, 6) AS f_below,
        |  round(mb::DOUBLE/tt::DOUBLE, 6) AS l_below,
        |  round(nb::DOUBLE/n::DOUBLE + mb::DOUBLE/tt::DOUBLE, 6) AS s_asym
        |FROM a""".stripMargin,

    // midranks per rater; tie-corrected W over complete day blocks
    "q415_kendall_w" ->
      """WITH daily AS (SELECT event_type, day(ts) AS blk,
        |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
        |cb AS (SELECT blk FROM daily GROUP BY blk HAVING count(*) = 5),
        |b AS (SELECT daily.event_type, daily.blk, daily.cnt
        |  FROM daily JOIN cb USING (blk)),
        |r AS (SELECT event_type, blk,
        |    rank() OVER (PARTITION BY event_type ORDER BY cnt)
        |      + (count(*) OVER (PARTITION BY event_type, cnt) - 1)/2.0 AS mid,
        |    count(*) OVER (PARTITION BY event_type, cnt) AS t FROM b),
        |tj AS (SELECT sum((t*t*t - t)::DOUBLE / t::DOUBLE) AS tsum FROM r),
        |pi AS (SELECT blk, sum(mid) AS rj FROM r GROUP BY 1),
        |pi2 AS (SELECT rj, count(*) OVER () AS n FROM pi),
        |a AS (SELECT max(n)::BIGINT AS n_items,
        |    sum((rj - 5.0*(n::DOUBLE + 1)/2)
        |      *(rj - 5.0*(n::DOUBLE + 1)/2)) AS ss
        |  FROM pi2),
        |f AS (SELECT n_items, ss, tsum, n_items::DOUBLE AS nd FROM a, tj),
        |g AS (SELECT n_items, ss, nd,
        |    25.0*(nd*nd*nd - nd) - 5.0*tsum AS denom FROM f)
        |SELECT n_items, 5::BIGINT AS m,
        |  round(CASE WHEN denom > 0 THEN 12.0*ss/denom END, 6) AS w,
        |  round(CASE WHEN denom > 0 THEN
        |    5.0*(nd - 1)*(12.0*ss/denom) END, 6) AS chi2
        |FROM g""".stripMargin,

    "q416_fleiss_kappa" ->
      """WITH daily AS (SELECT event_type, day(ts) AS blk, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, blk,
        |    CASE WHEN cnt * (count(*) OVER p) > (sum(cnt) OVER p)
        |      THEN 1 ELSE 0 END AS x
        |  FROM daily WINDOW p AS (PARTITION BY event_type)),
        |v AS (SELECT blk, sum(x)::DOUBLE AS pos FROM x GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_items,
        |    sum((pos*pos + (5.0 - pos)*(5.0 - pos) - 5.0)/20.0) AS sp,
        |    sum(pos) AS votes FROM v),
        |c AS (SELECT n_items, sp/n_items::DOUBLE AS p_bar,
        |    votes/(n_items::DOUBLE * 5.0) AS share FROM a),
        |e AS (SELECT n_items, p_bar,
        |    share*share + (1.0 - share)*(1.0 - share) AS pe FROM c)
        |SELECT n_items, 5::BIGINT AS m, round(p_bar, 6) AS p_bar,
        |  round(pe, 6) AS p_e,
        |  round(CASE WHEN 1.0 - pe > 0 THEN (p_bar - pe)/(1.0 - pe) END, 6)
        |    AS kappa
        |FROM e""".stripMargin,

    "q417_gwets_ac1" ->
      """WITH daily AS (SELECT event_type, day(ts) AS blk, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, blk,
        |    CASE WHEN cnt * (count(*) OVER p) > (sum(cnt) OVER p)
        |      THEN 1 ELSE 0 END AS x
        |  FROM daily WINDOW p AS (PARTITION BY event_type)),
        |v AS (SELECT blk, sum(x)::DOUBLE AS pos FROM x GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_items,
        |    sum((pos*pos + (5.0 - pos)*(5.0 - pos) - 5.0)/20.0) AS sp,
        |    sum(pos) AS votes FROM v),
        |c AS (SELECT n_items, sp/n_items::DOUBLE AS p_bar,
        |    votes/(n_items::DOUBLE * 5.0) AS share FROM a),
        |e AS (SELECT n_items, p_bar,
        |    2.0*share*(1.0 - share) AS pe FROM c)
        |SELECT n_items, 5::BIGINT AS m, round(p_bar, 6) AS p_bar,
        |  round(pe, 6) AS p_e_gwet,
        |  round(CASE WHEN 1.0 - pe > 0 THEN (p_bar - pe)/(1.0 - pe) END, 6)
        |    AS ac1
        |FROM e""".stripMargin,

    // sample-corrected g1/g2 from raw power sums; SAS BC formula
    "q418_bimodality" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*)::DOUBLE AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*)::BIGINT AS nl, sum(x) AS s1,
        |    sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
        |  FROM daily GROUP BY 1),
        |c AS (SELECT event_type, nl, nl::DOUBLE AS n, s1/nl::DOUBLE AS mu,
        |    s2, s3, s4 FROM m),
        |mm AS (SELECT *, s2/n - mu*mu AS m2,
        |    s3/n - 3.0*mu*(s2/n) + 2.0*mu*mu*mu AS m3,
        |    s4/n - 4.0*mu*(s3/n) + 6.0*mu*mu*(s2/n)
        |      - 3.0*mu*mu*mu*mu AS m4 FROM c),
        |g AS (SELECT event_type, nl, n, m2,
        |    m3/sqrt(m2*m2*m2) * sqrt(n*(n - 1))/(n - 2) AS g1,
        |    (n - 1)/((n - 2)*(n - 3))
        |      * ((n + 1)*(m4/(m2*m2) - 3.0) + 6.0) AS g2 FROM mm)
        |SELECT event_type, nl AS n,
        |  round(CASE WHEN nl >= 4 AND m2 > 0 THEN g1 END, 6) AS skew_g1,
        |  round(CASE WHEN nl >= 4 AND m2 > 0 THEN g2 END, 6) AS kurt_g2,
        |  round(CASE WHEN nl >= 4 AND m2 > 0 THEN
        |    (g1*g1 + 1)/(g2 + 3.0*(n - 1)*(n - 1)/((n - 2)*(n - 3))) END, 6)
        |    AS bc
        |FROM g ORDER BY 1""".stripMargin,

    // C_t = cum(x^2)/total; rounded argmax with ts tie-break
    "q419_cusum_squares" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |df AS (SELECT event_type, d,
        |    (cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY d))::DOUBLE
        |      AS dx FROM daily),
        |nz AS (SELECT event_type, d, dx*dx AS q FROM df WHERE dx IS NOT NULL),
        |s AS (SELECT event_type, d,
        |    sum(q) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq,
        |    sum(q) OVER (PARTITION BY event_type) AS tq,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM nz),
        |dd AS (SELECT event_type, d, n,
        |    abs(cq/tq - i::DOUBLE/n::DOUBLE) AS dv FROM s WHERE tq > 0),
        |dr AS (SELECT event_type, d, n,
        |    floor(dv*1e6 + 0.5)/1e6 AS dvr FROM dd),
        |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY dvr DESC, d) AS rk FROM dr)
        |SELECT event_type, n::BIGINT AS n, round(dvr, 6) AS stat,
        |  epoch(d)::BIGINT AS split_s
        |FROM p WHERE rk = 1 ORDER BY 1""".stripMargin,

    // binomial tail via the q381 ordered ln-factorial cumsum
    "q420_sign_test" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |cc AS (SELECT count(*)::BIGINT AS n_pairs,
        |    sum(CASE WHEN x > y THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN x < y THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM daily),
        |c2 AS (SELECT *, b + c AS m, least(b, c) AS kmax FROM cc),
        |seq AS (SELECT unnest(generate_series(0, (SELECT m FROM c2))) AS i),
        |lf AS (SELECT i, sum(CASE WHEN i >= 1 THEN ln(i::DOUBLE) ELSE 0.0 END)
        |    OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v FROM seq),
        |ks AS (SELECT c2.*, lf.i AS k FROM c2 JOIN lf
        |  ON lf.i BETWEEN 0 AND c2.kmax),
        |t AS (SELECT ks.k, ks.n_pairs, ks.b, ks.c, ks.m,
        |    lm.v AS lf_m, lk.v AS lf_k, lmk.v AS lf_mk
        |  FROM ks
        |  JOIN lf lm ON lm.i = ks.m
        |  JOIN lf lk ON lk.i = ks.k
        |  JOIN lf lmk ON lmk.i = ks.m - ks.k),
        |p AS (SELECT n_pairs, b, c,
        |    sum(exp(lf_m - lf_k - lf_mk - m::DOUBLE * ln(2.0)))
        |      OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |        CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY k DESC) AS rk
        |  FROM t)
        |SELECT n_pairs, b, c,
        |  round(least(1.0, 2.0*cum), 6) AS p_two_sided
        |FROM p WHERE rk = 1""".stripMargin,

    // pairwise-gap order statistic k = C(floor(n/2)+1, 2)
    "q421_qn_scale" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS x,
        |    row_number() OVER (ORDER BY cnt) AS i FROM daily),
        |g AS (SELECT abs(a.x - c.x) AS gp, a.i AS i, c.i AS j
        |  FROM b a JOIN b c ON a.i < c.i),
        |r AS (SELECT gp, row_number() OVER (ORDER BY gp, i, j) AS rn,
        |    count(*) OVER () AS np FROM g),
        |c3 AS (SELECT *, (1.0 + sqrt(1.0 + 8.0*np::DOUBLE))/2.0 AS nd FROM r),
        |c4 AS (SELECT *,
        |    ((floor(nd/2.0) + 1.0)*(floor(nd/2.0) + 1.0 - 1.0)/2.0)::BIGINT
        |      AS kidx FROM c3)
        |SELECT nd::BIGINT AS n, np::BIGINT AS n_pairs,
        |  round(gp, 6) AS qn_raw, round(gp * 2.2219, 6) AS qn
        |FROM c4 WHERE rn = greatest(1, kidx)""".stripMargin,

    // pairwise differences ranked on (d, i, j); median + Moses CI ranks
    "q422_hl_shift" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |a AS (SELECT cnt::DOUBLE AS x,
        |    row_number() OVER (ORDER BY cnt) AS i FROM daily
        |  WHERE event_type = 'click'),
        |b AS (SELECT cnt::DOUBLE AS y,
        |    row_number() OVER (ORDER BY cnt) AS j FROM daily
        |  WHERE event_type = 'view'),
        |p AS (SELECT a.x - b.y AS dd, a.i, b.j FROM a, b),
        |r AS (SELECT dd, row_number() OVER (ORDER BY dd, i, j) AS rn,
        |    count(*) OVER () AS np FROM p),
        |nn AS (SELECT (SELECT count(*) FROM a)::BIGINT AS n_a,
        |    (SELECT count(*) FROM b)::BIGINT AS n_b),
        |c AS (SELECT r.*, nn.n_a, nn.n_b,
        |    sqrt(nn.n_a::DOUBLE * nn.n_b::DOUBLE
        |      * (nn.n_a::DOUBLE + nn.n_b::DOUBLE + 1)/12.0) AS sd
        |  FROM r, nn),
        |c2 AS (SELECT *, floor((np::DOUBLE + 1.0)/2.0)::BIGINT AS rmed,
        |    greatest(1, ceil(np::DOUBLE/2.0 - 1.96*sd)::BIGINT) AS rlo,
        |    least(np, ceil(np::DOUBLE/2.0 + 1.96*sd + 1.0)::BIGINT) AS rhi
        |  FROM c)
        |SELECT max(n_a) AS n_a, max(n_b) AS n_b,
        |  round(max(CASE WHEN rn = rmed THEN dd END), 6) AS shift,
        |  round(max(CASE WHEN rn = rlo THEN dd END), 6) AS ci_lo,
        |  round(max(CASE WHEN rn = rhi THEN dd END), 6) AS ci_hi
        |FROM c2""".stripMargin,

    "q423_ks_uniform" ->
      """WITH u AS (SELECT
        |    ((floor(epoch(ts))::BIGINT % 86400))::DOUBLE AS u
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT u, row_number() OVER (ORDER BY u) AS i,
        |    count(*) OVER () AS n FROM u),
        |d AS (SELECT n, greatest(i::DOUBLE/n::DOUBLE - u/86400.0,
        |    u/86400.0 - (i::DOUBLE - 1)/n::DOUBLE) AS dv FROM r)
        |SELECT max(n)::BIGINT AS n, round(max(dv), 6) AS d_stat
        |FROM d""".stripMargin,

    "q424_circular" ->
      """WITH th AS (SELECT
        |    ((floor(epoch(ts))::BIGINT % 86400))::DOUBLE
        |      * 6.283185307179586 / 86400.0 AS t
        |  FROM events WHERE event_type = 'click'),
        |a AS (SELECT count(*)::BIGINT AS n, sum(cos(t)) AS c,
        |    sum(sin(t)) AS s FROM th),
        |c2 AS (SELECT n, c, s, c/n::DOUBLE AS cb, s/n::DOUBLE AS sb FROM a),
        |f AS (SELECT n, c, s, sqrt(cb*cb + sb*sb) AS r FROM c2)
        |SELECT n, round(atan2(s, c), 6) AS mean_dir,
        |  round(r, 6) AS resultant, round(1.0 - r, 6) AS circ_var,
        |  round(n::DOUBLE * r * r, 6) AS rayleigh_z
        |FROM f""".stripMargin,

    "q425_median_ci" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |r AS (SELECT cnt::DOUBLE AS x, row_number() OVER (ORDER BY cnt) AS rn,
        |    count(*) OVER () AS n FROM daily),
        |c AS (SELECT *, floor((n::DOUBLE + 1.0)/2.0)::BIGINT AS rmed,
        |    greatest(1, floor((n::DOUBLE - 1.96*sqrt(n::DOUBLE))/2.0)::BIGINT)
        |      AS rlo,
        |    least(n, ceil(1.0 + (n::DOUBLE + 1.96*sqrt(n::DOUBLE))/2.0)::BIGINT)
        |      AS rhi
        |  FROM r)
        |SELECT max(n)::BIGINT AS n,
        |  max(CASE WHEN rn = rmed THEN x END) AS median,
        |  max(CASE WHEN rn = rlo THEN x END) AS ci_lo,
        |  max(CASE WHEN rn = rhi THEN x END) AS ci_hi
        |FROM c""".stripMargin,

    "q426_proportion_effects" ->
      """WITH c AS (SELECT
        |    sum(CASE WHEN day(ts) <= 15 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END)::BIGINT AS x1,
        |    sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN day(ts) >= 16 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END)::BIGINT AS x2,
        |    sum(CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END)::BIGINT AS n2
        |  FROM events),
        |m AS (SELECT x1, n1, x2, n2,
        |    x1::DOUBLE/n1::DOUBLE AS p1, x2::DOUBLE/n2::DOUBLE AS p2,
        |    (x1 >= 1 AND x2 >= 1 AND n1 >= 1 AND n2 >= 1) AS ok
        |  FROM c),
        |e AS (SELECT *, p1/p2 AS rr,
        |    sqrt((1.0 - p1)/x1::DOUBLE + (1.0 - p2)/x2::DOUBLE) AS se
        |  FROM m)
        |SELECT x1, n1, x2, n2,
        |  round(CASE WHEN ok THEN p1 END, 6) AS p1,
        |  round(CASE WHEN ok THEN p2 END, 6) AS p2,
        |  round(CASE WHEN ok THEN
        |    2.0*asin(sqrt(p1)) - 2.0*asin(sqrt(p2)) END, 6) AS cohens_h,
        |  round(CASE WHEN ok THEN rr END, 6) AS risk_ratio,
        |  round(CASE WHEN ok THEN exp(ln(rr) - 1.96*se) END, 6) AS rr_lo,
        |  round(CASE WHEN ok THEN exp(ln(rr) + 1.96*se) END, 6) AS rr_hi
        |FROM e""".stripMargin,

    // median-heuristic bandwidth by explicit rank; full-ordered-pair
    // kernel sums incl. diagonal (biased V-statistic)
    "q427_mmd" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |ids AS (SELECT event_type AS arm, cnt::DOUBLE AS v,
        |    row_number() OVER (ORDER BY cnt::DOUBLE, event_type) AS id
        |  FROM daily WHERE event_type IN ('click', 'view')),
        |g AS (SELECT abs(a.v - c.v) AS gp, a.id AS i, c.id AS j
        |  FROM ids a JOIN ids c ON a.id < c.id),
        |gm AS (SELECT greatest(gp, 1e-9) AS gamma FROM (
        |    SELECT gp, row_number() OVER (ORDER BY gp, i, j) AS rn,
        |      count(*) OVER () AS np FROM g)
        |  WHERE rn = floor((np::DOUBLE + 1.0)/2.0)::BIGINT),
        |k AS (SELECT a.arm AS arm1, c.arm AS arm2, gm.gamma,
        |    exp(-(a.v - c.v)*(a.v - c.v)/(2.0*gm.gamma*gm.gamma)) AS kv
        |  FROM ids a, ids c, gm),
        |agg AS (SELECT max(gamma) AS bandwidth,
        |    sum(CASE WHEN arm1 = 'click' AND arm2 = 'click' THEN kv
        |      ELSE 0.0 END) AS kxx,
        |    sum(CASE WHEN arm1 = 'view' AND arm2 = 'view' THEN kv
        |      ELSE 0.0 END) AS kyy,
        |    sum(CASE WHEN arm1 = 'click' AND arm2 = 'view' THEN kv
        |      ELSE 0.0 END) AS kxy,
        |    sum(CASE WHEN arm1 = 'click' AND arm2 = 'click' THEN 1
        |      ELSE 0 END) AS nxx,
        |    sum(CASE WHEN arm1 = 'view' AND arm2 = 'view' THEN 1
        |      ELSE 0 END) AS nyy,
        |    sum(CASE WHEN arm1 = 'click' AND arm2 = 'view' THEN 1
        |      ELSE 0 END) AS nxy
        |  FROM k)
        |SELECT sqrt(nxx::DOUBLE)::BIGINT AS n_a, sqrt(nyy::DOUBLE)::BIGINT AS n_b,
        |  round(bandwidth, 6) AS bandwidth,
        |  round(kxx/nxx::DOUBLE + kyy/nyy::DOUBLE
        |    - 2.0*kxy/nxy::DOUBLE, 6) AS mmd2
        |FROM agg""".stripMargin,

    // per-arm trim ranks, winsorized clamps, Yuen denominator
    "q428_yuen_t" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click', 'view')),
        |r AS (SELECT arm, v,
        |    row_number() OVER (PARTITION BY arm ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY arm) AS n FROM b),
        |g AS (SELECT *, floor(n::DOUBLE * 0.2)::BIGINT AS gg FROM r),
        |g2 AS (SELECT *,
        |    max(CASE WHEN rn = gg + 1 THEN v END) OVER (PARTITION BY arm) AS lo,
        |    max(CASE WHEN rn = n - gg THEN v END) OVER (PARTITION BY arm) AS hi
        |  FROM g),
        |wz AS (SELECT arm, v,
        |    CASE WHEN rn <= gg THEN lo WHEN rn > n - gg THEN hi ELSE v END AS wv,
        |    (rn > gg AND rn <= n - gg) AS intrim FROM g2),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'click' AND intrim THEN 1 ELSE 0 END)::BIGINT AS h_a,
        |    sum(CASE WHEN arm = 'click' AND intrim THEN v ELSE 0.0 END) AS ts_a,
        |    sum(CASE WHEN arm = 'click' THEN wv ELSE 0.0 END) AS ws_a,
        |    sum(CASE WHEN arm = 'click' THEN wv*wv ELSE 0.0 END) AS wq_a,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'view' AND intrim THEN 1 ELSE 0 END)::BIGINT AS h_b,
        |    sum(CASE WHEN arm = 'view' AND intrim THEN v ELSE 0.0 END) AS ts_b,
        |    sum(CASE WHEN arm = 'view' THEN wv ELSE 0.0 END) AS ws_b,
        |    sum(CASE WHEN arm = 'view' THEN wv*wv ELSE 0.0 END) AS wq_b
        |  FROM wz),
        |c AS (SELECT *, ts_a/h_a::DOUBLE AS tma, ts_b/h_b::DOUBLE AS tmb,
        |    (n_a::DOUBLE - 1)
        |      * ((wq_a - ws_a*ws_a/n_a::DOUBLE)/(n_a::DOUBLE - 1))
        |      / (h_a::DOUBLE * (h_a::DOUBLE - 1)) AS da,
        |    (n_b::DOUBLE - 1)
        |      * ((wq_b - ws_b*ws_b/n_b::DOUBLE)/(n_b::DOUBLE - 1))
        |      / (h_b::DOUBLE * (h_b::DOUBLE - 1)) AS db
        |  FROM a)
        |SELECT n_a, n_b, h_a, h_b,
        |  round(CASE WHEN h_a >= 2 AND h_b >= 2 THEN tma END, 6) AS tmean_a,
        |  round(CASE WHEN h_a >= 2 AND h_b >= 2 THEN tmb END, 6) AS tmean_b,
        |  round(CASE WHEN h_a >= 2 AND h_b >= 2 AND da + db > 0 THEN
        |    (tma - tmb)/sqrt(da + db) END, 6) AS t_stat
        |FROM c""".stripMargin,

    "q429_dixon_q" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, cnt::DOUBLE AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM daily),
        |a AS (SELECT event_type, max(n)::BIGINT AS n,
        |    max(CASE WHEN rn = 1 THEN v END) AS x1,
        |    max(CASE WHEN rn = 2 THEN v END) AS x2,
        |    max(CASE WHEN rn = n - 1 THEN v END) AS xn1,
        |    max(CASE WHEN rn = n THEN v END) AS xn
        |  FROM r GROUP BY 1)
        |SELECT event_type, n,
        |  round(CASE WHEN n >= 3 AND xn - x1 > 0 THEN
        |    (x2 - x1)/(xn - x1) END, 6) AS q_min,
        |  round(CASE WHEN n >= 3 AND xn - x1 > 0 THEN
        |    (xn - xn1)/(xn - x1) END, 6) AS q_max
        |FROM a ORDER BY 1""".stripMargin,

    "q430_harmonic_fit" -> harmonicFitSql(24),

    "q431_icc" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |per AS (SELECT user_id, count(*)::BIGINT AS ni,
        |    sum(cnt::DOUBLE) AS si, sum(cnt::DOUBLE*cnt::DOUBLE) AS qi
        |  FROM daily GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_groups, sum(ni)::BIGINT AS n,
        |    sum(ni*ni) AS n2, sum(si) AS st, sum(qi) AS qt,
        |    sum(si*si/ni::DOUBLE) AS ssbp FROM per),
        |c AS (SELECT n, n_groups,
        |    (ssbp - st*st/n::DOUBLE)/(n_groups::DOUBLE - 1) AS msb,
        |    (qt - ssbp)/(n::DOUBLE - n_groups::DOUBLE) AS msw,
        |    (n::DOUBLE - n2::DOUBLE/n::DOUBLE)/(n_groups::DOUBLE - 1) AS k0
        |  FROM a)
        |SELECT n, n_groups,
        |  round(CASE WHEN n_groups >= 2 AND n > n_groups THEN k0 END, 6) AS k0,
        |  round(CASE WHEN n_groups >= 2 AND n > n_groups THEN msb END, 6) AS msb,
        |  round(CASE WHEN n_groups >= 2 AND n > n_groups THEN msw END, 6) AS msw,
        |  round(CASE WHEN n_groups >= 2 AND n > n_groups
        |      AND msb + (k0 - 1)*msw > 0 THEN
        |    (msb - msw)/(msb + (k0 - 1)*msw) END, 6) AS icc
        |FROM c""".stripMargin,

    "q432_roc_auc" ->
      """WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    n_chars::DOUBLE AS s FROM documents),
        |r AS (SELECT y,
        |    rank() OVER (ORDER BY s)
        |      + (count(*) OVER (PARTITION BY s) - 1)/2.0 AS mid FROM d),
        |a AS (SELECT sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
        |    sum(CASE WHEN y = 1 THEN mid ELSE 0.0 END) AS rp FROM r)
        |SELECT n_pos, n_neg,
        |  round(CASE WHEN n_pos >= 1 AND n_neg >= 1 THEN
        |    (rp/n_pos::DOUBLE - (n_pos::DOUBLE + 1)/2)/n_neg::DOUBLE END, 6)
        |    AS auc
        |FROM a""".stripMargin,

    // pooled + within midranks; placement variances; BM eq. 4.7 reduced
    "q433_brunner_munzel" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click', 'view')),
        |r AS (SELECT arm,
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS rp,
        |    rank() OVER (PARTITION BY arm ORDER BY v)
        |      + (count(*) OVER (PARTITION BY arm, v) - 1)/2.0 AS rw
        |  FROM b),
        |r2 AS (SELECT arm, rp, rp - rw AS dd FROM r),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'click' THEN rp ELSE 0.0 END) AS ra,
        |    sum(CASE WHEN arm = 'view' THEN rp ELSE 0.0 END) AS rb,
        |    sum(CASE WHEN arm = 'click' THEN dd ELSE 0.0 END) AS da,
        |    sum(CASE WHEN arm = 'view' THEN dd ELSE 0.0 END) AS db,
        |    sum(CASE WHEN arm = 'click' THEN dd*dd ELSE 0.0 END) AS qa,
        |    sum(CASE WHEN arm = 'view' THEN dd*dd ELSE 0.0 END) AS qb
        |  FROM r2),
        |c AS (SELECT n_a, n_b, n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
        |    ra/n_a::DOUBLE AS rma, rb/n_b::DOUBLE AS rmb,
        |    (qa - da*da/n_a::DOUBLE)/(n_a::DOUBLE - 1) AS s2a,
        |    (qb - db*db/n_b::DOUBLE)/(n_b::DOUBLE - 1) AS s2b
        |  FROM a),
        |e AS (SELECT n_a, n_b, na, nb, rma, rmb,
        |    (na + nb) * sqrt(s2a/(na*nb*nb) + s2b/(nb*na*na)) AS se
        |  FROM c)
        |SELECT n_a, n_b,
        |  round(CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        |    (rmb - (nb + 1)/2)/na END, 6) AS p_hat,
        |  round(CASE WHEN n_a >= 2 AND n_b >= 2 AND se > 0 THEN
        |    (rmb - rma)/se END, 6) AS w_stat
        |FROM e""".stripMargin,

    // repeated medians: per-point quantile_cont(0.5) of pairwise slopes,
    // then the median of medians; intercept from the slope constant
    "q434_siegel_slope" ->
      """WITH daily AS (SELECT
        |    floor(epoch(date_trunc('day', ts)) / 86400)::BIGINT AS x,
        |    count(*) AS cnt FROM events WHERE event_type = 'click'
        |  GROUP BY 1),
        |p AS (SELECT a.x::DOUBLE AS x1, a.cnt::DOUBLE AS y1,
        |    (b.cnt::DOUBLE - a.cnt::DOUBLE)/(b.x::DOUBLE - a.x::DOUBLE) AS sl
        |  FROM daily a JOIN daily b ON a.x <> b.x),
        |pp AS (SELECT x1, y1, quantile_cont(sl, 0.5) AS mi
        |  FROM p GROUP BY 1, 2),
        |s AS (SELECT count(*)::BIGINT AS n,
        |    quantile_cont(mi, 0.5) AS slope FROM pp)
        |SELECT s.n, round(s.slope, 6) AS slope,
        |  round(quantile_cont(pp.y1 - s.slope * pp.x1, 0.5), 6) AS intercept
        |FROM pp, s GROUP BY s.n, s.slope""".stripMargin,

    // lomed of himeds: inner rank floor(n/2)+1 over each point's n-1
    // gaps, outer rank floor((n+1)/2) over the n high medians
    "q435_sn_scale" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS x,
        |    row_number() OVER (ORDER BY cnt) AS i FROM daily),
        |g AS (SELECT a.i AS i, c.i AS j, abs(a.x - c.x) AS gp
        |  FROM b a JOIN b c ON a.i <> c.i),
        |r AS (SELECT i, gp,
        |    row_number() OVER (PARTITION BY i ORDER BY gp, j) AS rn,
        |    count(*) OVER (PARTITION BY i) AS m FROM g),
        |hm AS (SELECT i, gp AS hmv FROM r
        |  WHERE rn = floor((m + 1)/2.0)::BIGINT + 1),
        |o AS (SELECT hmv, row_number() OVER (ORDER BY hmv, i) AS rn2,
        |    count(*) OVER () AS n FROM hm)
        |SELECT n::BIGINT AS n, round(hmv, 6) AS sn_raw,
        |  round(hmv * 1.1926, 6) AS sn
        |FROM o WHERE rn2 = floor((n + 1)/2.0)::BIGINT""".stripMargin,

    // probability-weighted moments by rank weights; Hosking's l/t ratios
    "q436_lmoments" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |r AS (SELECT cnt::DOUBLE AS x,
        |    row_number() OVER (ORDER BY cnt)::DOUBLE AS i,
        |    count(*) OVER ()::DOUBLE AS n FROM daily),
        |a AS (SELECT max(n)::BIGINT AS n, avg(x) AS b0,
        |    avg(x * (i-1)/(n-1)) AS b1,
        |    avg(x * (i-1)/(n-1) * (i-2)/(n-2)) AS b2,
        |    avg(x * (i-1)/(n-1) * (i-2)/(n-2) * (i-3)/(n-3)) AS b3 FROM r),
        |l AS (SELECT n, b0 AS l1, 2.0*b1 - b0 AS l2,
        |    6.0*b2 - 6.0*b1 + b0 AS l3,
        |    20.0*b3 - 30.0*b2 + 12.0*b1 - b0 AS l4 FROM a)
        |SELECT n, round(l1, 6) AS l1, round(l2, 6) AS l2,
        |  round(CASE WHEN l1 <> 0 THEN l2/l1 END, 6) AS t2,
        |  round(CASE WHEN l2 <> 0 THEN l3/l2 END, 6) AS t3,
        |  round(CASE WHEN l2 <> 0 THEN l4/l2 END, 6) AS t4
        |FROM l""".stripMargin,

    // squared midrank sums from both ends; Cucconi's U/V/rho/C
    "q437_cucconi" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily
        |  WHERE event_type IN ('click', 'view')),
        |r AS (SELECT arm, rank() OVER (ORDER BY v)
        |    + (count(*) OVER (PARTITION BY v) - 1)/2.0 AS mid FROM b),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 'view' THEN mid*mid ELSE 0.0 END) AS sr2,
        |    sum(CASE WHEN arm = 'view' THEN mid ELSE 0.0 END) AS sr
        |  FROM r),
        |c AS (SELECT n_a, n_b, sr2, sr, n_a::DOUBLE AS m, n_b::DOUBLE AS n,
        |    n_a::DOUBLE + n_b::DOUBLE AS bn FROM a),
        |e AS (SELECT n_a, n_b, sr2,
        |    n*(bn+1)*(bn+1) - 2.0*(bn+1)*sr + sr2 AS sc2,
        |    n*(bn+1)*(2.0*bn+1) AS mu,
        |    sqrt(m*n*(bn+1)*(2.0*bn+1)*(8.0*bn+11)/5.0) AS den,
        |    2.0*(bn*bn-4)/((2.0*bn+1)*(8.0*bn+11)) - 1 AS rho
        |  FROM c),
        |f AS (SELECT n_a, n_b, rho, den,
        |    (6.0*sr2 - mu)/den AS u, (6.0*sc2 - mu)/den AS vv FROM e)
        |SELECT n_a, n_b,
        |  round(CASE WHEN n_a >= 1 AND n_b >= 1 AND den > 0
        |    THEN u END, 6) AS u_stat,
        |  round(CASE WHEN n_a >= 1 AND n_b >= 1 AND den > 0
        |    THEN vv END, 6) AS v_stat,
        |  round(CASE WHEN n_a >= 1 AND n_b >= 1 AND den > 0
        |    THEN rho END, 6) AS rho,
        |  round(CASE WHEN n_a >= 1 AND n_b >= 1 AND den > 0
        |    THEN (u*u + vv*vv - 2.0*rho*u*vv)/(2.0*(1.0 - rho*rho))
        |  END, 6) AS c_stat
        |FROM f""".stripMargin,

    // within-block midranks, block-range midrank weights, Quade's A/B/F
    "q438_quade" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, event_type,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM daily),
        |cb AS (SELECT daily.*, kk.k,
        |    count(*) OVER (PARTITION BY d) AS ba FROM daily, kk),
        |comp AS (SELECT * FROM cb WHERE ba = k),
        |rk AS (SELECT *, rank() OVER (PARTITION BY d ORDER BY cnt)
        |    + (count(*) OVER (PARTITION BY d, cnt) - 1)/2.0 AS mid,
        |    (max(cnt) OVER (PARTITION BY d)
        |      - min(cnt) OVER (PARTITION BY d))::DOUBLE AS rng
        |  FROM comp),
        |blk AS (SELECT DISTINCT d, rng FROM rk),
        |qr AS (SELECT d, rank() OVER (ORDER BY rng)
        |    + (count(*) OVER (PARTITION BY rng) - 1)/2.0 AS q FROM blk),
        |sc AS (SELECT rk.event_type, rk.k,
        |    qr.q * (rk.mid - (rk.k::DOUBLE + 1)/2) AS s
        |  FROM rk JOIN qr ON rk.d = qr.d),
        |pa AS (SELECT event_type, sum(s) AS sj, sum(s*s) AS aj,
        |    count(*) AS nb, max(k) AS karm FROM sc GROUP BY 1),
        |t AS (SELECT max(nb)::BIGINT AS n_blocks, max(karm)::BIGINT AS k,
        |    sum(aj) AS a_term, sum(sj*sj) AS ss FROM pa)
        |SELECT n_blocks, k, round(a_term, 6) AS a_term,
        |  round(ss/n_blocks::DOUBLE, 6) AS b_term,
        |  round(CASE WHEN a_term - ss/n_blocks::DOUBLE > 0 THEN
        |    (n_blocks::DOUBLE - 1)*(ss/n_blocks::DOUBLE)
        |      /(a_term - ss/n_blocks::DOUBLE) END, 6) AS f_stat
        |FROM t""".stripMargin,

    // one aggregate: Brier + Spiegelhalter's exact-moment calibration z
    "q439_spiegelhalter_z" ->
      """WITH s AS (SELECT
        |    (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS y,
        |    n_chars::DOUBLE/(n_chars::DOUBLE + 2000.0) AS p
        |  FROM documents),
        |a AS (SELECT count(*)::BIGINT AS n, avg((y-p)*(y-p)) AS brier,
        |    sum((y-p)*(1.0 - 2.0*p)) AS num,
        |    sum((1.0 - 2.0*p)*(1.0 - 2.0*p)*p*(1.0-p)) AS den FROM s)
        |SELECT n, round(brier, 6) AS brier,
        |  round(CASE WHEN den > 0 THEN num/sqrt(den) END, 6) AS z_stat
        |FROM a""".stripMargin,

    // ntile deciles on (p, doc_id); per-bin (O-E)^2/(E(1-E/n)) sum
    "q440_hosmer_lemeshow" ->
      """WITH s AS (SELECT doc_id,
        |    (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS y,
        |    n_chars::DOUBLE/(n_chars::DOUBLE + 2000.0) AS p
        |  FROM documents),
        |b AS (SELECT y, p, ntile(10) OVER (ORDER BY p, doc_id) AS g FROM s),
        |per AS (SELECT g, count(*) AS n, sum(y) AS o1, sum(p) AS e1
        |  FROM b GROUP BY 1)
        |SELECT count(*)::BIGINT AS g, sum(n)::BIGINT AS n,
        |  round(sum((o1 - e1)*(o1 - e1)/(e1*(1.0 - e1/n::DOUBLE))), 6)
        |    AS hl_chi2
        |FROM per""".stripMargin,

    // nominal alpha: per-unit mismatch rationals + value marginals
    "q441_krippendorff" ->
      """WITH ratings AS (SELECT date_trunc('day', ts) AS d, user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS rated
        |  FROM events GROUP BY 1, 2),
        |uv AS (SELECT d, rated::VARCHAR AS v, count(*) AS nuv
        |  FROM ratings GROUP BY 1, 2),
        |pu AS (SELECT d, sum(nuv) AS mu, sum(nuv*nuv) AS sq FROM uv
        |  GROUP BY 1 HAVING sum(nuv) >= 2),
        |o AS (SELECT count(*)::BIGINT AS n_units,
        |    sum(mu)::BIGINT AS n_ratings,
        |    sum((mu*mu - sq)::DOUBLE/(mu - 1)::DOUBLE) AS so FROM pu),
        |nv AS (SELECT sum(nv2*nv2) AS snv FROM (
        |    SELECT uv.v, sum(uv.nuv) AS nv2 FROM uv JOIN pu ON uv.d = pu.d
        |    GROUP BY 1))
        |SELECT n_units, n_ratings,
        |  round(CASE WHEN n_ratings::DOUBLE*n_ratings::DOUBLE - snv > 0
        |    THEN 1.0 - (n_ratings::DOUBLE - 1)*so
        |      /(n_ratings::DOUBLE*n_ratings::DOUBLE - snv) END, 6) AS alpha
        |FROM o, nv""".stripMargin,

    // Kuiper: D+ and D- from one sorted ECDF pass, V = D+ + D-
    "q442_kuiper" ->
      """WITH u AS (SELECT
        |    ((floor(epoch(ts))::BIGINT % 86400))::DOUBLE AS u
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT u, row_number() OVER (ORDER BY u) AS i,
        |    count(*) OVER () AS n FROM u),
        |d AS (SELECT n, i::DOUBLE/n::DOUBLE - u/86400.0 AS dp,
        |    u/86400.0 - (i::DOUBLE - 1)/n::DOUBLE AS dm FROM r)
        |SELECT max(n)::BIGINT AS n, round(max(dp), 6) AS d_plus,
        |  round(max(dm), 6) AS d_minus,
        |  round(max(dp) + max(dm), 6) AS v_stat
        |FROM d""".stripMargin,

    // m=2 template pairs under the exact-median-gap radius; -ln(A/B)
    "q443_sample_entropy" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS v0,
        |    lead(cnt::DOUBLE, 1) OVER (ORDER BY d) AS v1,
        |    lead(cnt::DOUBLE, 2) OVER (ORDER BY d) AS v2,
        |    row_number() OVER (ORDER BY d) AS i FROM daily),
        |rr AS (SELECT quantile_cont(abs(v1 - v0), 0.5) AS r FROM b
        |  WHERE v1 IS NOT NULL),
        |t AS (SELECT i, v0, v1, v2 FROM b WHERE v2 IS NOT NULL),
        |p AS (SELECT
        |    (greatest(abs(a.v0 - c.v0), abs(a.v1 - c.v1)) <= rr.r) AS bm,
        |    (greatest(abs(a.v0 - c.v0), abs(a.v1 - c.v1),
        |      abs(a.v2 - c.v2)) <= rr.r) AS am
        |  FROM t a JOIN t c ON a.i < c.i, rr),
        |a2 AS (SELECT
        |    sum(CASE WHEN bm THEN 1 ELSE 0 END)::BIGINT AS b_pairs,
        |    sum(CASE WHEN am THEN 1 ELSE 0 END)::BIGINT AS a_pairs FROM p)
        |SELECT (SELECT count(*) FROM daily)::BIGINT AS n,
        |  round((SELECT r FROM rr), 6) AS r, b_pairs, a_pairs,
        |  round(CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN
        |    -ln(a_pairs::DOUBLE/b_pairs::DOUBLE) END, 6) AS sampen
        |FROM a2""".stripMargin,

    // literal (k,m) grid; per-offset curve lengths; ln-ln OLS slope
    "q444_higuchi_fd" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |idx AS (SELECT cnt::DOUBLE AS x,
        |    row_number() OVER (ORDER BY d) AS i,
        |    count(*) OVER () AS n FROM daily),
        |grid AS (SELECT g1.k, g2.m
        |  FROM generate_series(1, 5) g1(k), generate_series(1, 5) g2(m)
        |  WHERE g2.m <= g1.k),
        |sub AS (SELECT grid.k, grid.m, idx.i, idx.n, idx.x
        |  FROM idx, grid WHERE idx.i >= grid.m
        |    AND (idx.i - grid.m) % grid.k = 0),
        |df2 AS (SELECT k, m, n,
        |    abs(x - lag(x) OVER (PARTITION BY k, m ORDER BY i)) AS dd
        |  FROM sub),
        |lm AS (SELECT k, m, max(n) AS nn, sum(dd) AS s, count(dd) AS c
        |  FROM df2 WHERE dd IS NOT NULL GROUP BY 1, 2),
        |lk AS (SELECT k, max(nn) AS nn,
        |    avg(s*(nn::DOUBLE - 1)/(c::DOUBLE*k::DOUBLE)/k::DOUBLE) AS lkv
        |  FROM lm GROUP BY 1),
        |pts AS (SELECT nn, ln(k::DOUBLE) AS lx, ln(lkv) AS ly FROM lk),
        |ag AS (SELECT max(nn)::BIGINT AS n, count(*)::DOUBLE AS kc,
        |    sum(lx) AS sx, sum(ly) AS sy, sum(lx*ly) AS sxy,
        |    sum(lx*lx) AS sxx FROM pts)
        |SELECT n, round(CASE WHEN kc*sxx - sx*sx > 0 THEN
        |    -(kc*sxy - sx*sy)/(kc*sxx - sx*sx) END, 6) AS fd
        |FROM ag""".stripMargin,

    // lead windows; c3 product mean + time-reversal asymmetry ratio
    "q445_c3_trev" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS v0,
        |    lead(cnt::DOUBLE, 1) OVER (ORDER BY d) AS v1,
        |    lead(cnt::DOUBLE, 2) OVER (ORDER BY d) AS v2 FROM daily),
        |a AS (SELECT count(*)::BIGINT AS n,
        |    avg(CASE WHEN v2 IS NOT NULL THEN v0*v1*v2 END) AS c3,
        |    avg(CASE WHEN v1 IS NOT NULL
        |      THEN (v1-v0)*(v1-v0)*(v1-v0) END) AS m3,
        |    avg(CASE WHEN v1 IS NOT NULL THEN (v1-v0)*(v1-v0) END) AS m2
        |  FROM b)
        |SELECT n, round(c3, 6) AS c3,
        |  round(CASE WHEN m2 > 0 THEN m3/sqrt(m2*m2*m2) END, 6) AS trev
        |FROM a""".stripMargin,

    // ties-general xi: r/l via RANGE-framed counts, consecutive-in-x |dr|
    "q446_chatterjee_xi" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |s AS (SELECT d, x, y,
        |    count(*) OVER (ORDER BY y) AS r,
        |    count(*) OVER (ORDER BY y DESC) AS l,
        |    count(*) OVER () AS n FROM daily),
        |t AS (SELECT n, l, r, lead(r) OVER (ORDER BY x, d) AS rn FROM s),
        |a AS (SELECT max(n) AS n,
        |    sum(CASE WHEN rn IS NOT NULL THEN abs(rn - r) ELSE 0 END)
        |      AS num,
        |    sum(l*(n - l)) AS den FROM t)
        |SELECT n::BIGINT AS n,
        |  round(CASE WHEN den > 0 THEN
        |    1.0 - n::DOUBLE*num::DOUBLE/(2.0*den::DOUBLE) END, 6) AS xi
        |FROM a""".stripMargin,

    // midrank u() self-join; D1/D2/D3 per Hoeffding 1948
    "q447_hoeffding_d" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |per AS (SELECT a.d,
        |    sum(CASE WHEN a.x > c.x THEN 1.0 WHEN a.x = c.x THEN 0.5
        |      ELSE 0.0 END) AS ra,
        |    sum(CASE WHEN a.y > c.y THEN 1.0 WHEN a.y = c.y THEN 0.5
        |      ELSE 0.0 END) AS rb,
        |    sum((CASE WHEN a.x > c.x THEN 1.0 WHEN a.x = c.x THEN 0.5
        |      ELSE 0.0 END) * (CASE WHEN a.y > c.y THEN 1.0
        |      WHEN a.y = c.y THEN 0.5 ELSE 0.0 END)) AS q
        |  FROM daily a JOIN daily c ON a.d <> c.d GROUP BY 1),
        |ag AS (SELECT count(*)::DOUBLE AS n,
        |    sum(q*(q - 1)) AS d1, sum(ra*(ra - 1)*rb*(rb - 1)) AS d2,
        |    sum((ra - 1)*(rb - 1)*q) AS d3 FROM per)
        |SELECT n::BIGINT AS n, round(CASE WHEN n >= 5 THEN
        |    30.0*((n - 2)*(n - 3)*d1 + d2 - 2.0*(n - 2)*d3)
        |    /(n*(n - 1)*(n - 2)*(n - 3)*(n - 4)) END, 6) AS d_stat
        |FROM ag""".stripMargin,

    // Szekely-Rizzo V-statistics from one full self-join + row sums
    "q448_distance_corr" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |rows_ AS (SELECT a.d, sum(abs(a.x - c.x)*abs(a.y - c.y)) AS sab,
        |    sum(abs(a.x - c.x)*abs(a.x - c.x)) AS saa,
        |    sum(abs(a.y - c.y)*abs(a.y - c.y)) AS sbb,
        |    sum(abs(a.x - c.x)) AS ra, sum(abs(a.y - c.y)) AS rb
        |  FROM daily a JOIN daily c ON true GROUP BY 1),
        |ag AS (SELECT count(*)::DOUBLE AS n, sum(sab) AS tab,
        |    sum(saa) AS taa, sum(sbb) AS tbb, sum(ra) AS ga,
        |    sum(rb) AS gb, sum(ra*rb) AS rab, sum(ra*ra) AS raa,
        |    sum(rb*rb) AS rbb FROM rows_),
        |v AS (SELECT n,
        |    tab/(n*n) + (ga/(n*n))*(gb/(n*n)) - 2.0*rab/(n*n*n) AS dcov2,
        |    taa/(n*n) + (ga/(n*n))*(ga/(n*n)) - 2.0*raa/(n*n*n) AS dvarx2,
        |    tbb/(n*n) + (gb/(n*n))*(gb/(n*n)) - 2.0*rbb/(n*n*n) AS dvary2
        |  FROM ag)
        |SELECT n::BIGINT AS n, round(dcov2, 6) AS dcov2,
        |  round(dvarx2, 6) AS dvarx2, round(dvary2, 6) AS dvary2,
        |  round(CASE WHEN dvarx2 > 0 AND dvary2 > 0 AND dcov2 >= 0 THEN
        |    sqrt(dcov2/sqrt(dvarx2*dvary2)) END, 6) AS dcor
        |FROM v""".stripMargin,

    // above-median binarization; rational triple counts; one ln per triple
    "q449_transfer_entropy" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |med AS (SELECT quantile_cont(x, 0.5) AS mx,
        |    quantile_cont(y, 0.5) AS my FROM daily),
        |b AS (SELECT d, (x > mx)::INT AS xb, (y > my)::INT AS yb
        |  FROM daily, med),
        |tri AS (SELECT xb, yb, lead(yb) OVER (ORDER BY d) AS y1 FROM b),
        |t3 AS (SELECT y1, yb, xb, count(*) AS c3 FROM tri
        |  WHERE y1 IS NOT NULL GROUP BY 1, 2, 3),
        |t2a AS (SELECT yb, xb, sum(c3) AS c2a FROM t3 GROUP BY 1, 2),
        |t2b AS (SELECT y1, yb, sum(c3) AS c2b FROM t3 GROUP BY 1, 2),
        |t1 AS (SELECT yb, sum(c3) AS c1 FROM t3 GROUP BY 1),
        |j AS (SELECT t3.c3, t2a.c2a, t2b.c2b, t1.c1 FROM t3
        |  JOIN t2a ON t3.yb = t2a.yb AND t3.xb = t2a.xb
        |  JOIN t2b ON t3.y1 = t2b.y1 AND t3.yb = t2b.yb
        |  JOIN t1 ON t3.yb = t1.yb)
        |SELECT sum(c3)::BIGINT AS t,
        |  round(sum(c3::DOUBLE*ln(c3::DOUBLE*c1::DOUBLE
        |    /(c2a::DOUBLE*c2b::DOUBLE)))/sum(c3)::DOUBLE, 6) AS te_nats
        |FROM j""".stripMargin,

    // Scholz-Stephens version-1 A2 (k=2), (value, event_id) tie-break
    "q450_ad_2sample" ->
      """WITH pooled AS (SELECT
        |    (event_type = 'click')::INT AS isa, value AS v, event_id
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |s AS (SELECT isa,
        |    row_number() OVER (ORDER BY v, event_id) AS i,
        |    sum(isa) OVER (ORDER BY v, event_id) AS m,
        |    count(*) OVER () AS nn, sum(isa) OVER () AS na
        |  FROM pooled)
        |SELECT max(na)::BIGINT AS n_a, max(nn - na)::BIGINT AS n_b,
        |  round((1.0/max(na)::DOUBLE + 1.0/max(nn - na)::DOUBLE) *
        |    sum((nn::DOUBLE*m::DOUBLE - na::DOUBLE*i::DOUBLE)
        |      *(nn::DOUBLE*m::DOUBLE - na::DOUBLE*i::DOUBLE)
        |      /(i::DOUBLE*(nn::DOUBLE - i::DOUBLE)*nn::DOUBLE)), 6) AS a2
        |FROM s WHERE i < nn""".stripMargin,

    // BWS B = (B_A + B_B)/2 from pooled + within-arm ranks
    "q451_bws" ->
      """WITH pooled AS (SELECT
        |    (event_type = 'click')::INT AS isa, value AS v, event_id
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |s AS (SELECT isa,
        |    row_number() OVER (ORDER BY v, event_id) AS r,
        |    row_number() OVER (PARTITION BY isa ORDER BY v, event_id) AS i,
        |    sum(isa) OVER () AS na, count(*) OVER () AS nn
        |  FROM pooled),
        |t AS (SELECT isa, na, nn,
        |    CASE WHEN isa = 1 THEN na::DOUBLE
        |      ELSE (nn - na)::DOUBLE END AS nown,
        |    CASE WHEN isa = 1 THEN (nn - na)::DOUBLE
        |      ELSE na::DOUBLE END AS noth,
        |    r::DOUBLE AS rd, i::DOUBLE AS id_ FROM s),
        |parts AS (SELECT isa, max(na) AS gna, max(nn) AS gnn,
        |    sum((rd - (nn::DOUBLE/nown)*id_)*(rd - (nn::DOUBLE/nown)*id_)
        |      /((id_/(nown + 1))*(1.0 - id_/(nown + 1))*noth*nn::DOUBLE
        |        /nown))/max(nown) AS bpart
        |  FROM t GROUP BY 1)
        |SELECT max(gna)::BIGINT AS n_a, max(gnn - gna)::BIGINT AS n_b,
        |  round(sum(bpart)/2.0, 6) AS b_stat
        |FROM parts""".stripMargin,

    // ranks = row_number over (cnt, d); integer numerator, exact n(n^2-1)/12
    "q452_bartels_rank" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |s AS (SELECT d, row_number() OVER (ORDER BY cnt, d) AS r,
        |    count(*) OVER () AS n FROM daily),
        |t AS (SELECT n, r, lead(r) OVER (ORDER BY d) AS rn FROM s),
        |a AS (SELECT max(n)::DOUBLE AS n,
        |    sum(CASE WHEN rn IS NOT NULL THEN (r - rn)*(r - rn)
        |      ELSE 0 END)::DOUBLE AS num FROM t)
        |SELECT n::BIGINT AS n,
        |  round(CASE WHEN n >= 2 THEN num/(n*(n*n - 1)/12.0) END, 6) AS rvn,
        |  round(CASE WHEN n >= 4 THEN
        |    (num/(n*(n*n - 1)/12.0) - 2.0)
        |    /sqrt(4.0*(n - 2)*(5.0*n*n - 2*n - 9)
        |      /(5.0*n*(n + 1)*(n - 1)*(n - 1))) END, 6) AS z
        |FROM a""".stripMargin,

    // Gaussian kernel weights exp(-(((g-x)/h)^2)/2); weighted mean per g
    "q453_nadaraya_watson" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |s AS (SELECT row_number() OVER (ORDER BY d)::DOUBLE AS x,
        |    cnt::DOUBLE AS y FROM daily),
        |g AS (SELECT unnest([10.0, 30.0, 60.0]::DOUBLE[]) AS gv),
        |w AS (SELECT gv,
        |    exp(-(((gv - x)/7.0)*((gv - x)/7.0))/2) AS w, y FROM s, g)
        |SELECT gv AS g, round(sum(w*y)/sum(w), 6) AS yhat,
        |  count(*)::BIGINT AS n
        |FROM w GROUP BY 1""".stripMargin,

    // Gringorten positions, Gumbel reduced variates, Pearson r from sums
    "q454_gumbel_ppcc" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, max(value) AS mx
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |s AS (SELECT mx, row_number() OVER (ORDER BY mx, d) AS i,
        |    count(*) OVER () AS n FROM daily),
        |t AS (SELECT mx AS x,
        |    -ln(-ln((i::DOUBLE - 0.44)/(n::DOUBLE + 0.12))) AS m FROM s),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(m) AS sm,
        |    sum(x*m) AS sxm, sum(x*x) AS sxx, sum(m*m) AS smm FROM t)
        |SELECT n::BIGINT AS n,
        |  round(CASE WHEN (sxx - sx*sx/n) > 0 AND (smm - sm*sm/n) > 0 THEN
        |    (sxm - sx*sm/n)
        |    /sqrt((sxx - sx*sx/n)*(smm - sm*sm/n)) END, 6) AS ppcc
        |FROM a""".stripMargin,

    // half-angle tau (no atan2); Sum cos^2 = (n+R)/2 exactly
    "q455_lomb_scargle" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, avg(value) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |s2 AS (SELECT (epoch_us(h) - min(epoch_us(h)) OVER ())::DOUBLE/1e6
        |    AS t, m - avg(m) OVER () AS z FROM hourly),
        |g AS (SELECT count(*) AS n, sum(z*z) AS zz,
        |    sum(z*cos(t*(2*pi()/86400.0))) AS cz0,
        |    sum(z*sin(t*(2*pi()/86400.0))) AS sz0,
        |    sum(cos((t*(2*pi()/86400.0))*2)) AS c20,
        |    sum(sin((t*(2*pi()/86400.0))*2)) AS s20,
        |    sum(z*cos(t*(2*pi()/604800.0))) AS cz1,
        |    sum(z*sin(t*(2*pi()/604800.0))) AS sz1,
        |    sum(cos((t*(2*pi()/604800.0))*2)) AS c21,
        |    sum(sin((t*(2*pi()/604800.0))*2)) AS s21 FROM s2),
        |u AS (SELECT 86400.0 AS period_sec, cz0 AS cz, sz0 AS sz,
        |    c20 AS c2, s20 AS s2, n, zz FROM g
        |  UNION ALL SELECT 604800.0, cz1, sz1, c21, s21, n, zz FROM g),
        |w AS (SELECT period_sec, n, zz, cz, sz, c2, s2,
        |    sqrt(c2*c2 + s2*s2) AS r FROM u),
        |x AS (SELECT period_sec, n, zz, cz, sz, r,
        |    CASE WHEN r > 0 THEN sqrt((1.0 + c2/r)/2) ELSE 1.0 END AS ct,
        |    CASE WHEN r > 0 THEN sign(s2)*sqrt((1.0 - c2/r)/2)
        |      ELSE 0.0 END AS st FROM w),
        |y AS (SELECT period_sec, n, zz,
        |    cz*ct + sz*st AS cterm, sz*ct - cz*st AS sterm,
        |    (n::DOUBLE + r)/2 AS cc, (n::DOUBLE - r)/2 AS ss FROM x)
        |SELECT period_sec,
        |  round(CASE WHEN zz/n::DOUBLE > 0 THEN
        |    ((CASE WHEN cc > 0 THEN cterm*cterm/cc ELSE 0 END)
        |     + (CASE WHEN ss > 0 THEN sterm*sterm/ss ELSE 0 END))
        |    /(2.0*(zz/n::DOUBLE)) END, 6) AS power,
        |  n::BIGINT AS n
        |FROM y""".stripMargin,

    // profile cumsum, per-box OLS detrend via closed-form SSres,
    // log-log slope over sizes with F^2 > 0
    "q456_dfa" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT d, row_number() OVER (ORDER BY d)::DOUBLE AS k,
        |    count(*) OVER () AS n, avg(cnt::DOUBLE) OVER () AS mu,
        |    sum(cnt::DOUBLE) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS cs FROM daily),
        |prof AS (SELECT k, n, cs - k*mu AS y FROM st),
        |boxed AS (SELECT sz.s, floor((k - 1)/sz.s) AS b, k, y FROM prof,
        |    (VALUES (4), (8), (16)) sz(s)
        |  WHERE floor((k - 1)/sz.s) < floor(n/sz.s)),
        |pb AS (SELECT s, b, count(*)::DOUBLE AS m, sum(k) AS sk,
        |    sum(y) AS sy, sum(k*y) AS sky, sum(k*k) AS skk,
        |    sum(y*y) AS syy FROM boxed GROUP BY 1, 2),
        |ps AS (SELECT s, count(*) AS nboxes,
        |    sum((syy - sy*sy/m)
        |      - (sky - sk*sy/m)*(sky - sk*sy/m)/(skk - sk*sk/m))
        |      /(count(*)*s)::DOUBLE AS f2 FROM pb GROUP BY 1),
        |pts AS (SELECT s, nboxes, f2, ln(s::DOUBLE) AS xl,
        |    CASE WHEN f2 > 0 THEN ln(f2)/2 END AS yl FROM ps),
        |fit AS (SELECT CASE WHEN count(*) >= 2 THEN
        |    (sum(xl*yl) - sum(xl)*sum(yl)/count(*)::DOUBLE)
        |    /(sum(xl*xl) - sum(xl)*sum(xl)/count(*)::DOUBLE) END AS alpha
        |  FROM pts WHERE yl IS NOT NULL)
        |SELECT s, nboxes, round(f2, 6) AS f2, round(alpha, 6) AS alpha
        |FROM pts CROSS JOIN fit""".stripMargin,

    // Benard median ranks; ln(-ln(1-p)) on ln v; shape = slope,
    // scale = exp(-intercept/shape)
    "q457_weibull_mrr" ->
      """WITH pur AS (SELECT value AS v, event_id FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL
        |    AND value > 0),
        |s AS (SELECT v, row_number() OVER (ORDER BY v, event_id) AS i,
        |    count(*) OVER () AS n FROM pur),
        |t AS (SELECT ln(v) AS x,
        |    ln(-ln(1.0 - (i::DOUBLE - 0.3)/(n::DOUBLE + 0.4))) AS y
        |  FROM s),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx FROM t),
        |b AS (SELECT n, sx, sy, CASE WHEN n >= 2 AND (sxx - sx*sx/n) > 0
        |    THEN (sxy - sx*sy/n)/(sxx - sx*sx/n) END AS shape FROM a)
        |SELECT n::BIGINT AS n, round(shape, 6) AS shape,
        |  round(CASE WHEN shape IS NOT NULL AND shape <> 0 THEN
        |    exp(-(sy/n - shape*sx/n)/shape) END, 6) AS scale_
        |FROM b""".stripMargin,

    // non-overlapping tau-bucket means; AVAR = sum(dM^2)/(2(G-1))
    "q458_allan_var" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, avg(value) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |st AS (SELECT m, row_number() OVER (ORDER BY h) AS k,
        |    count(*) OVER () AS n FROM hourly),
        |boxed AS (SELECT tz.tau, floor((k - 1)/tz.tau) AS g, m FROM st,
        |    (VALUES (1), (2), (4)) tz(tau)
        |  WHERE floor((k - 1)/tz.tau) < floor(n/tz.tau)),
        |gm AS (SELECT tau, g, avg(m) AS mm FROM boxed GROUP BY 1, 2),
        |ld AS (SELECT tau, mm,
        |    lead(mm) OVER (PARTITION BY tau ORDER BY g) AS mn FROM gm)
        |SELECT tau, count(*)::BIGINT AS groups,
        |  round(sum(CASE WHEN mn IS NOT NULL THEN (mn - mm)*(mn - mm)
        |      ELSE 0 END)/(2.0*(count(*) - 1)::DOUBLE), 6) AS avar
        |FROM ld GROUP BY 1""".stripMargin,

    // pairs matched on day offsets from the series start
    "q459_variogram" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT date_diff('day', min(d) OVER (), d) AS dd,
        |    cnt::DOUBLE AS v FROM daily),
        |l AS (SELECT dd, v, hz.h FROM b,
        |    (VALUES (1), (2), (7), (14)) hz(h)),
        |j AS (SELECT l.h, (r.v - l.v)*(r.v - l.v) AS sq FROM l
        |  JOIN b r ON r.dd = l.dd + l.h)
        |SELECT h, count(*)::BIGINT AS n_pairs,
        |  round(sum(sq)/(2.0*count(*)::DOUBLE), 6) AS gamma
        |FROM j GROUP BY 1""".stripMargin,

    // one TWO-SIDED range-frame pass per r (both orientations, self
    // excluded) so E[pairs] ~ n^2*2r/span under CSR; K = span*pairs/n^2;
    // CSR-calibrated ratio K/(2r)
    "q460_ripley_k" ->
      """WITH p AS (SELECT epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |c AS (SELECT us,
        |    count(*) OVER (ORDER BY us RANGE BETWEEN 60000000 PRECEDING
        |      AND 60000000 FOLLOWING) - 1 AS c0,
        |    count(*) OVER (ORDER BY us RANGE BETWEEN 600000000 PRECEDING
        |      AND 600000000 FOLLOWING) - 1 AS c1,
        |    count(*) OVER (ORDER BY us RANGE BETWEEN 3600000000 PRECEDING
        |      AND 3600000000 FOLLOWING) - 1 AS c2 FROM p),
        |a AS (SELECT count(*) AS n, (max(us) - min(us))::DOUBLE/1e6 AS span,
        |    sum(c0) AS p0, sum(c1) AS p1, sum(c2) AS p2 FROM c),
        |u AS (SELECT 60.0 AS r_sec, p0 AS pr, n, span FROM a
        |  UNION ALL SELECT 600.0, p1, n, span FROM a
        |  UNION ALL SELECT 3600.0, p2, n, span FROM a)
        |SELECT r_sec, n::BIGINT AS n, pr::BIGINT AS pairs,
        |  round(span*pr::DOUBLE/(n::DOUBLE*n::DOUBLE), 6) AS k_hat,
        |  round(span*pr::DOUBLE/(n::DOUBLE*n::DOUBLE)/(2.0*r_sec), 6)
        |    AS ratio
        |FROM u""".stripMargin,

    // compact-support kernel: far points contribute exact zeros
    "q461_epanechnikov_kde" ->
      """WITH v AS (SELECT value AS x FROM events WHERE value IS NOT NULL),
        |g AS (SELECT unnest([2.0, 5.0, 10.0, 20.0]::DOUBLE[]) AS gv),
        |w AS (SELECT gv, CASE WHEN abs((gv - x)/5.0) <= 1 THEN
        |    0.75*(1.0 - ((gv - x)/5.0)*((gv - x)/5.0)) ELSE 0 END AS kk
        |  FROM v, g)
        |SELECT gv AS g, round(sum(kk)/(count(*)::DOUBLE*5.0), 6) AS fhat,
        |  count(*)::BIGINT AS n
        |FROM w GROUP BY 1""".stripMargin,

    // weighted-least-squares closed form (S2*T0 - S1*T1)/(S0*S2 - S1^2)
    "q462_local_linear" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |s AS (SELECT row_number() OVER (ORDER BY d)::DOUBLE AS x,
        |    cnt::DOUBLE AS y FROM daily),
        |g AS (SELECT unnest([10.0, 30.0, 60.0]::DOUBLE[]) AS gv),
        |w AS (SELECT gv, x, y,
        |    exp(-(((x - gv)/7.0)*((x - gv)/7.0))/2) AS w FROM s, g),
        |a AS (SELECT gv, count(*) AS n, sum(w) AS s0,
        |    sum(w*(x - gv)) AS s1, sum(w*(x - gv)*(x - gv)) AS s2,
        |    sum(w*y) AS t0, sum(w*(x - gv)*y) AS t1 FROM w GROUP BY 1)
        |SELECT gv AS g, round(CASE WHEN s0*s2 - s1*s1 <> 0 THEN
        |    (s2*t0 - s1*t1)/(s0*s2 - s1*s1) END, 6) AS yhat,
        |  n::BIGINT AS n
        |FROM a""".stripMargin,

    // top-(k+1) order stats only; 1/alpha = mean ln(x_i / x_(k+1))
    "q463_hill" ->
      """WITH top AS (SELECT value AS v FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL AND value > 0
        |  ORDER BY value DESC, event_id LIMIT 101),
        |a AS (SELECT count(*) AS cnt, min(v) AS thr, sum(ln(v)) AS slog
        |  FROM top)
        |SELECT 100::BIGINT AS n_top, round(thr, 6) AS threshold,
        |  round(CASE WHEN cnt = 101 THEN
        |    (slog - 101.0*ln(thr))/100.0 END, 6) AS inv_alpha,
        |  round(CASE WHEN cnt = 101 AND (slog - 101.0*ln(thr))/100.0 > 0
        |    THEN 1.0/((slog - 101.0*ln(thr))/100.0) END, 6) AS alpha
        |FROM a""".stripMargin,

    // central moments from power sums; third-order CF expansion at z_95
    "q464_cornish_fisher" ->
      """WITH a AS (SELECT count(*)::DOUBLE AS n, sum(value) AS s1,
        |    sum(value*value) AS s2, sum(value*value*value) AS s3,
        |    sum(value*value*value*value) AS s4,
        |    quantile_cont(value, 0.95) AS exact_q
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT n, exact_q, s1/n AS m1,
        |    s2/n - (s1/n)*(s1/n) AS m2,
        |    s3/n - 3.0*(s1/n)*s2/n + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3,
        |    s4/n - 4.0*(s1/n)*s3/n + 6.0*(s1/n)*(s1/n)*s2/n
        |      - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4 FROM a),
        |d AS (SELECT n, exact_q, m1,
        |    CASE WHEN m2 > 0 THEN sqrt(m2) END AS sd,
        |    CASE WHEN m2 > 0 THEN m3/(sqrt(m2)*m2) END AS skew,
        |    CASE WHEN m2 > 0 THEN m4/(m2*m2) - 3.0 END AS ex_kurt FROM m)
        |SELECT n::BIGINT AS n, round(m1, 6) AS mu, round(sd, 6) AS sd,
        |  round(skew, 6) AS skew, round(ex_kurt, 6) AS ex_kurt,
        |  round(CASE WHEN sd IS NOT NULL THEN m1 + sd*(z + (z*z - 1)*skew/6
        |    + (z*z*z - z*3)*ex_kurt/24
        |    - (z*z*z*2 - z*5)*skew*skew/36) END, 6) AS cf_q,
        |  round(exact_q, 6) AS exact_q
        |FROM d, (SELECT 1.6448536269514722::DOUBLE AS z) zz""".stripMargin,

    // Schuster powers (q193 skeleton), then exp(mean ln P)/mean P
    "q465_spectral_flatness" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, cnt::DOUBLE AS y,
        |    (row_number() OVER (PARTITION BY event_type ORDER BY d) - 1)
        |      ::DOUBLE AS t FROM daily),
        |c AS (SELECT event_type, avg(y) AS mu FROM r GROUP BY 1),
        |z AS (SELECT r.event_type, r.t, r.y - c.mu AS z
        |  FROM r JOIN c USING (event_type)),
        |p AS (SELECT unnest([3, 7, 14, 30]) AS period),
        |a AS (SELECT z.event_type, p.period,
        |    sum(z.z * cos(z.t * (2.0 * pi() / p.period))) AS sc,
        |    sum(z.z * sin(z.t * (2.0 * pi() / p.period))) AS ss
        |  FROM z CROSS JOIN p GROUP BY 1, 2),
        |pw AS (SELECT event_type, sc*sc + ss*ss AS power FROM a)
        |SELECT event_type, count(*)::BIGINT AS n_periods,
        |  round(exp(avg(ln(power)))/avg(power), 6) AS flatness
        |FROM pw WHERE power > 0 GROUP BY 1""".stripMargin,

    // literal demeaned BK weights (interpolated below), interior rows only
    "q466_baxter_king" -> {
      val b = graft.operators.Features.baxterKingWeights(6, 32, 12)
      val terms = (s"(${b(0)})*v" +: (1 to 12).map(j =>
        s"(${b(j)})*(lag(v, $j) OVER w + lead(v, $j) OVER w)"))
        .mkString("\n|    + ")
      s"""WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
         |  FROM events GROUP BY 1),
         |s AS (SELECT d, cnt::DOUBLE AS v,
         |    row_number() OVER (ORDER BY d) AS i,
         |    count(*) OVER () AS n FROM daily),
         |f AS (SELECT d, $terms AS cycle, i, n FROM s
         |  WINDOW w AS (ORDER BY d))
         |SELECT d, round(cycle, 6) AS cycle FROM f
         |WHERE i > 12 AND i <= n - 12""".stripMargin
    },

    // integer eps-recurrence; det2 via the (i+1, j+1) successor join
    "q467_rqa" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT cnt::BIGINT AS v, row_number() OVER (ORDER BY d) AS i,
        |    count(*) OVER () AS n FROM daily),
        |rec AS (SELECT a.i, b2.j, a.n FROM b a JOIN
        |    (SELECT i AS j, v AS vj FROM b) b2
        |  ON a.i <> b2.j AND abs(a.v - b2.vj) <= 5),
        |j AS (SELECT r.i, r.j, r.n, s.ip FROM rec r LEFT JOIN
        |    (SELECT i - 1 AS ip, j - 1 AS jp FROM rec) s
        |  ON r.i = s.ip AND r.j = s.jp)
        |SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS rec_pairs,
        |  round(count(*)::DOUBLE/(max(n)::DOUBLE*max(n)::DOUBLE), 6) AS rr,
        |  round(CASE WHEN
        |      sum(CASE WHEN i < n AND j < n THEN 1 ELSE 0 END) > 0 THEN
        |    sum(CASE WHEN ip IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |    /sum(CASE WHEN i < n AND j < n THEN 1 ELSE 0 END)::DOUBLE
        |    END, 6) AS det2
        |FROM j""".stripMargin,

    // successive-pair rotated variances, population form
    "q468_poincare" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, avg(value) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |p AS (SELECT m, lead(m) OVER (ORDER BY h) AS mn FROM hourly),
        |q AS (SELECT (m - mn)/sqrt(2.0) AS d, (m + mn)/sqrt(2.0) AS s
        |  FROM p WHERE mn IS NOT NULL),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(d) AS sd1s,
        |    sum(d*d) AS sd2s, sum(s) AS ss1, sum(s*s) AS ss2 FROM q),
        |v AS (SELECT n, sd2s/n - (sd1s/n)*(sd1s/n) AS v1,
        |    ss2/n - (ss1/n)*(ss1/n) AS v2 FROM a)
        |SELECT n::BIGINT AS n_pairs,
        |  round(CASE WHEN v1 >= 0 THEN sqrt(v1) END, 6) AS sd1,
        |  round(CASE WHEN v2 >= 0 THEN sqrt(v2) END, 6) AS sd2,
        |  round(CASE WHEN v2 > 0 AND v1 >= 0 THEN sqrt(v1)/sqrt(v2) END, 6)
        |    AS sd_ratio
        |FROM v""".stripMargin,

    // interior-point discrete energy operator x^2 - x_prev*x_next
    "q469_tkeo" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS v,
        |    lag(cnt::DOUBLE) OVER (ORDER BY d) AS vp,
        |    lead(cnt::DOUBLE) OVER (ORDER BY d) AS vn FROM daily),
        |i AS (SELECT v, vp, vn FROM b
        |  WHERE vp IS NOT NULL AND vn IS NOT NULL)
        |SELECT count(*)::BIGINT AS n_interior,
        |  round(sum(v*v - vp*vn)/count(*)::DOUBLE, 6) AS mean_tkeo
        |FROM i""".stripMargin,

    // centered-square lag-1 regression; LM = m * R^2
    "q470_arch_lm" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT d, cnt::DOUBLE AS v FROM daily),
        |c AS (SELECT d, (v - avg(v) OVER ())*(v - avg(v) OVER ()) AS s
        |  FROM st),
        |p AS (SELECT s, lag(s) OVER (ORDER BY d) AS sp FROM c),
        |f AS (SELECT s, sp FROM p WHERE sp IS NOT NULL),
        |a AS (SELECT count(*)::DOUBLE AS m, sum(s) AS sy, sum(sp) AS sx,
        |    sum(s*sp) AS sxy, sum(sp*sp) AS sxx, sum(s*s) AS syy FROM f),
        |t AS (SELECT m, CASE WHEN (sxx - sx*sx/m) > 0
        |      AND (syy - sy*sy/m) > 0 THEN
        |    (sxy - sx*sy/m)*(sxy - sx*sy/m)
        |    /((sxx - sx*sx/m)*(syy - sy*sy/m)) END AS r2 FROM a)
        |SELECT m::BIGINT AS n_pairs, round(r2, 6) AS r2,
        |  round(m*r2, 6) AS lm
        |FROM t""".stripMargin,

    // Ferro-Segers intervals estimator over exact-p90 exceedance gaps
    "q471_extremal_index" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
        |    max(value) AS mx FROM events WHERE value IS NOT NULL
        |  GROUP BY 1),
        |st AS (SELECT mx, row_number() OVER (ORDER BY h) AS i,
        |    quantile_cont(mx, 0.9) OVER () AS u FROM hourly),
        |e AS (SELECT i, u FROM st WHERE mx > u),
        |g AS (SELECT u, (i - lag(i) OVER (ORDER BY i))::DOUBLE AS t FROM e),
        |a AS (SELECT count(*) AS ne, max(u) AS threshold, max(t) AS gmax,
        |    sum(t) AS s1, sum(t*t) AS s2, sum(t - 1) AS d1,
        |    sum((t - 1)*(t - 2)) AS d2 FROM g)
        |SELECT ne::BIGINT AS n_exceed, round(threshold, 6) AS threshold,
        |  round(CASE WHEN ne >= 2 THEN least(1.0,
        |    CASE WHEN gmax <= 2 THEN 2.0*s1*s1/((ne - 1)::DOUBLE*s2)
        |      ELSE CASE WHEN d2 > 0 THEN
        |        2.0*d1*d1/((ne - 1)::DOUBLE*d2) END END) END, 6) AS theta
        |FROM a""".stripMargin,

    // e(u) = mean(x - u | x > u) at literal thresholds
    "q472_mean_excess" ->
      """WITH v AS (SELECT value AS x FROM events WHERE value IS NOT NULL),
        |e AS (SELECT uz.u, x FROM v,
        |    (SELECT unnest([10.0, 20.0, 40.0]::DOUBLE[]) AS u) uz
        |  WHERE x > uz.u)
        |SELECT u, count(*)::BIGINT AS n_exceed,
        |  round(avg(x - u), 6) AS mean_excess
        |FROM e GROUP BY 1""".stripMargin,

    // exact quantile pairs on the p-grid; OLS of q_B on q_A
    "q473_qq_decomp" ->
      """WITH a AS (SELECT quantile_cont(value, 0.1) AS p1,
        |    quantile_cont(value, 0.2) AS p2, quantile_cont(value, 0.3) AS p3,
        |    quantile_cont(value, 0.4) AS p4, quantile_cont(value, 0.5) AS p5,
        |    quantile_cont(value, 0.6) AS p6, quantile_cont(value, 0.7) AS p7,
        |    quantile_cont(value, 0.8) AS p8, quantile_cont(value, 0.9) AS p9
        |  FROM events WHERE value IS NOT NULL AND event_type = 'click'),
        |b AS (SELECT quantile_cont(value, 0.1) AS p1,
        |    quantile_cont(value, 0.2) AS p2, quantile_cont(value, 0.3) AS p3,
        |    quantile_cont(value, 0.4) AS p4, quantile_cont(value, 0.5) AS p5,
        |    quantile_cont(value, 0.6) AS p6, quantile_cont(value, 0.7) AS p7,
        |    quantile_cont(value, 0.8) AS p8, quantile_cont(value, 0.9) AS p9
        |  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'),
        |pairs AS (
        |  SELECT a.p1 AS qa, b.p1 AS qb FROM a, b
        |  UNION ALL SELECT a.p2, b.p2 FROM a, b
        |  UNION ALL SELECT a.p3, b.p3 FROM a, b
        |  UNION ALL SELECT a.p4, b.p4 FROM a, b
        |  UNION ALL SELECT a.p5, b.p5 FROM a, b
        |  UNION ALL SELECT a.p6, b.p6 FROM a, b
        |  UNION ALL SELECT a.p7, b.p7 FROM a, b
        |  UNION ALL SELECT a.p8, b.p8 FROM a, b
        |  UNION ALL SELECT a.p9, b.p9 FROM a, b),
        |s AS (SELECT count(*)::DOUBLE AS m, sum(qa) AS sx, sum(qb) AS sy,
        |    sum(qa*qb) AS sxy, sum(qa*qa) AS sxx, sum(qb*qb) AS syy
        |  FROM pairs),
        |t AS (SELECT m, sx, sy, (sxy - sx*sy/m) AS cov,
        |    (sxx - sx*sx/m) AS vx, (syy - sy*sy/m) AS vy FROM s),
        |u AS (SELECT m, sx, sy, cov, vx, vy,
        |    CASE WHEN vx > 0 THEN cov/vx END AS slope FROM t)
        |SELECT m::BIGINT AS n_q, round(slope, 6) AS slope,
        |  round(CASE WHEN slope IS NOT NULL THEN sy/m - slope*sx/m END, 6)
        |    AS intercept,
        |  round(CASE WHEN vx > 0 AND vy > 0 THEN cov*cov/(vx*vy) END, 6)
        |    AS r2
        |FROM u""".stripMargin,

    // Schuster sums per series; cospectrum/quadrature normalized by
    // sqrt(Sxx*Syy) = cos/sin of the phase lag
    "q474_cross_spectrum" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |st AS (SELECT x::DOUBLE AS xv, y::DOUBLE AS yv,
        |    (row_number() OVER (ORDER BY d) - 1)::DOUBLE AS t FROM daily),
        |c AS (SELECT t, xv - avg(xv) OVER () AS zx,
        |    yv - avg(yv) OVER () AS zy FROM st),
        |a AS (SELECT
        |    sum(zx*cos(t*(2.0*pi()/7))) AS cx7,
        |    sum(zx*sin(t*(2.0*pi()/7))) AS sx7,
        |    sum(zy*cos(t*(2.0*pi()/7))) AS cy7,
        |    sum(zy*sin(t*(2.0*pi()/7))) AS sy7,
        |    sum(zx*cos(t*(2.0*pi()/14))) AS cx14,
        |    sum(zx*sin(t*(2.0*pi()/14))) AS sx14,
        |    sum(zy*cos(t*(2.0*pi()/14))) AS cy14,
        |    sum(zy*sin(t*(2.0*pi()/14))) AS sy14,
        |    sum(zx*cos(t*(2.0*pi()/30))) AS cx30,
        |    sum(zx*sin(t*(2.0*pi()/30))) AS sx30,
        |    sum(zy*cos(t*(2.0*pi()/30))) AS cy30,
        |    sum(zy*sin(t*(2.0*pi()/30))) AS sy30 FROM c),
        |u AS (SELECT 7 AS period, cx7 AS cx, sx7 AS sx, cy7 AS cy,
        |    sy7 AS sy FROM a
        |  UNION ALL SELECT 14, cx14, sx14, cy14, sy14 FROM a
        |  UNION ALL SELECT 30, cx30, sx30, cy30, sy30 FROM a)
        |SELECT period, round(cx*cx + sx*sx, 6) AS sxx,
        |  round(cy*cy + sy*sy, 6) AS syy,
        |  round(CASE WHEN cx*cx + sx*sx > 0 AND cy*cy + sy*sy > 0 THEN
        |    (cx*cy + sx*sy)/sqrt((cx*cx + sx*sx)*(cy*cy + sy*sy)) END, 6)
        |    AS re_norm,
        |  round(CASE WHEN cx*cx + sx*sx > 0 AND cy*cy + sy*sy > 0 THEN
        |    (sx*cy - cx*sy)/sqrt((cx*cx + sx*sx)*(cy*cy + sy*sy)) END, 6)
        |    AS im_norm
        |FROM u""".stripMargin,

    // dfa-style boxes; residual closed forms for AA/BB/AB; Zebende rho
    "q475_dcca" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |st AS (SELECT d, row_number() OVER (ORDER BY d)::DOUBLE AS k,
        |    count(*) OVER () AS n,
        |    avg(x::DOUBLE) OVER () AS mx, avg(y::DOUBLE) OVER () AS my,
        |    sum(x::DOUBLE) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS cx,
        |    sum(y::DOUBLE) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS cy FROM daily),
        |prof AS (SELECT k, n, cx - k*mx AS a, cy - k*my AS b FROM st),
        |boxed AS (SELECT sz.s, floor((k - 1)/sz.s) AS box, k, a, b
        |  FROM prof, (VALUES (4), (8), (16)) sz(s)
        |  WHERE floor((k - 1)/sz.s) < floor(n/sz.s)),
        |pb AS (SELECT s, box, count(*)::DOUBLE AS m, sum(k) AS sk,
        |    sum(k*k) AS skk, sum(a) AS sa, sum(b) AS sb,
        |    sum(k*a) AS ska, sum(k*b) AS skb, sum(a*a) AS saa,
        |    sum(b*b) AS sbb, sum(a*b) AS sab FROM boxed GROUP BY 1, 2),
        |r AS (SELECT s,
        |    (saa - sa*sa/m) - (ska - sk*sa/m)*(ska - sk*sa/m)
        |      /(skk - sk*sk/m) AS raa,
        |    (sbb - sb*sb/m) - (skb - sk*sb/m)*(skb - sk*sb/m)
        |      /(skk - sk*sk/m) AS rbb,
        |    (sab - sa*sb/m) - (ska - sk*sa/m)*(skb - sk*sb/m)
        |      /(skk - sk*sk/m) AS rab FROM pb)
        |SELECT s, count(*)::BIGINT AS nboxes,
        |  round(CASE WHEN sum(raa) > 0 AND sum(rbb) > 0 THEN
        |    sum(rab)/sqrt(sum(raa)*sum(rbb)) END, 6) AS rho
        |FROM r GROUP BY 1""".stripMargin,

    // ntile(3) classes on (m, h); base-3 pair patterns; exact counts
    "q476_dispersion_entropy" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, avg(value) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |cls AS (SELECT h, ntile(3) OVER (ORDER BY m, h)::BIGINT AS c
        |  FROM hourly),
        |emb AS (SELECT c, lead(c) OVER (ORDER BY h) AS c1 FROM cls),
        |pat AS (SELECT c*3 + c1 AS p, count(*) AS cnt FROM emb
        |  WHERE c1 IS NOT NULL GROUP BY 1),
        |a AS (SELECT sum(cnt)::BIGINT AS t, count(*)::BIGINT AS n_distinct,
        |    sum(cnt::DOUBLE*ln(cnt::DOUBLE)) AS slnc FROM pat)
        |SELECT t, n_distinct,
        |  round((ln(t::DOUBLE) - slnc/t::DOUBLE)/(2*ln(3)), 6) AS h_norm
        |FROM a""".stripMargin,

    // inter-event gap moments; lag-paired correlation for memory
    "q477_burstiness" ->
      """WITH p AS (SELECT epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |g0 AS (SELECT us, lag(us) OVER (ORDER BY us) AS prev FROM p),
        |g1 AS (SELECT (us - prev)::DOUBLE/1e6 AS g, us FROM g0
        |  WHERE prev IS NOT NULL),
        |g2 AS (SELECT g, lead(g) OVER (ORDER BY us) AS gn FROM g1),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(g) AS s1, sum(g*g) AS s2,
        |    sum(CASE WHEN gn IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE AS m,
        |    sum(CASE WHEN gn IS NOT NULL THEN g ELSE 0 END) AS px,
        |    sum(CASE WHEN gn IS NOT NULL THEN gn ELSE 0 END) AS py,
        |    sum(CASE WHEN gn IS NOT NULL THEN g*gn ELSE 0 END) AS pxy,
        |    sum(CASE WHEN gn IS NOT NULL THEN g*g ELSE 0 END) AS pxx,
        |    sum(CASE WHEN gn IS NOT NULL THEN gn*gn ELSE 0 END) AS pyy
        |  FROM g2)
        |SELECT n::BIGINT AS n_gaps,
        |  round(CASE WHEN sqrt(s2/n - (s1/n)*(s1/n)) + s1/n > 0 THEN
        |    (sqrt(s2/n - (s1/n)*(s1/n)) - s1/n)
        |    /(sqrt(s2/n - (s1/n)*(s1/n)) + s1/n) END, 6) AS b,
        |  round(CASE WHEN (pxx - px*px/m) > 0 AND (pyy - py*py/m) > 0 THEN
        |    (pxy - px*py/m)/sqrt((pxx - px*px/m)*(pyy - py*py/m)) END, 6)
        |    AS mem
        |FROM a""".stripMargin,

    // cumulative new-cluster indicators over exceedance positions
    "q478_pot_clusters" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
        |    max(value) AS mx FROM events WHERE value IS NOT NULL
        |  GROUP BY 1),
        |st AS (SELECT mx, row_number() OVER (ORDER BY h) AS i,
        |    quantile_cont(mx, 0.9) OVER () AS u FROM hourly),
        |e AS (SELECT i FROM st WHERE mx > u),
        |n1 AS (SELECT i, CASE WHEN lag(i) OVER (ORDER BY i) IS NULL
        |      OR i - lag(i) OVER (ORDER BY i) > 3 THEN 1 ELSE 0 END AS nw
        |  FROM e),
        |c AS (SELECT sum(nw) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS cl FROM n1),
        |pc AS (SELECT cl, count(*) AS sz FROM c GROUP BY 1)
        |SELECT sum(sz)::BIGINT AS n_exceed, count(*)::BIGINT AS n_clusters,
        |  round(sum(sz)::DOUBLE/count(*)::DOUBLE, 6) AS mean_size,
        |  max(sz)::BIGINT AS max_size
        |FROM pc""".stripMargin,

    // within-season sign pairs; combined S, summed variances
    "q479_seasonal_mk" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |sd AS (SELECT dayofweek(d) AS sea, d, cnt::DOUBLE AS y FROM daily),
        |pairs AS (SELECT a.sea, sign(b.y - a.y)::BIGINT AS sg
        |  FROM sd a JOIN sd b ON a.sea = b.sea AND b.d > a.d),
        |ps AS (SELECT sea, sum(sg) AS s FROM pairs GROUP BY 1),
        |ns AS (SELECT sea, count(*) AS nsea FROM sd GROUP BY 1),
        |j AS (SELECT coalesce(ps.s, 0) AS s, ns.nsea FROM ns
        |  LEFT JOIN ps USING (sea)),
        |a AS (SELECT sum(nsea)::BIGINT AS n, count(*)::BIGINT AS n_seasons,
        |    sum(s)::BIGINT AS s,
        |    sum(nsea*(nsea - 1)*(nsea*2 + 5)/18.0) AS var FROM j)
        |SELECT n, n_seasons, s,
        |  round(CASE WHEN var > 0 THEN (s - sign(s::DOUBLE))/sqrt(var)
        |    END, 6) AS z
        |FROM a""".stripMargin,

    // Schuster powers at 6 candidates; exact Fisher-g null p-value via
    // the truncated alternating-binomial sum (max(0, 1-jg)^5 terms)
    "q480_fisher_g" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT cnt::DOUBLE AS v,
        |    (row_number() OVER (ORDER BY d) - 1)::DOUBLE AS t FROM daily),
        |c AS (SELECT t, v - avg(v) OVER () AS z FROM st),
        |a AS (SELECT count(*) AS n,
        |    sum(z*cos(t*(2.0*pi()/3))) AS c3, sum(z*sin(t*(2.0*pi()/3))) AS s3,
        |    sum(z*cos(t*(2.0*pi()/4))) AS c4, sum(z*sin(t*(2.0*pi()/4))) AS s4,
        |    sum(z*cos(t*(2.0*pi()/5))) AS c5, sum(z*sin(t*(2.0*pi()/5))) AS s5,
        |    sum(z*cos(t*(2.0*pi()/7))) AS c7, sum(z*sin(t*(2.0*pi()/7))) AS s7,
        |    sum(z*cos(t*(2.0*pi()/14))) AS c14, sum(z*sin(t*(2.0*pi()/14))) AS s14,
        |    sum(z*cos(t*(2.0*pi()/30))) AS c30, sum(z*sin(t*(2.0*pi()/30))) AS s30
        |  FROM c),
        |pw AS (SELECT n, c3*c3 + s3*s3 AS p3, c4*c4 + s4*s4 AS p4,
        |    c5*c5 + s5*s5 AS p5, c7*c7 + s7*s7 AS p7,
        |    c14*c14 + s14*s14 AS p14, c30*c30 + s30*s30 AS p30 FROM a),
        |g AS (SELECT n, CASE WHEN p3 + p4 + p5 + p7 + p14 + p30 > 0 THEN
        |    greatest(p3, p4, p5, p7, p14, p30)
        |    /(p3 + p4 + p5 + p7 + p14 + p30) END AS gs FROM pw),
        |t AS (SELECT n, gs,
        |    greatest(0.0, 1.0 - gs*1) AS b1, greatest(0.0, 1.0 - gs*2) AS b2,
        |    greatest(0.0, 1.0 - gs*3) AS b3, greatest(0.0, 1.0 - gs*4) AS b4,
        |    greatest(0.0, 1.0 - gs*5) AS b5, greatest(0.0, 1.0 - gs*6) AS b6
        |  FROM g)
        |SELECT n::BIGINT AS n, round(gs, 6) AS g_stat,
        |  round(CASE WHEN gs IS NOT NULL THEN
        |    6.0*(b1*b1*b1*b1*b1) - 15.0*(b2*b2*b2*b2*b2)
        |    + 20.0*(b3*b3*b3*b3*b3) - 15.0*(b4*b4*b4*b4*b4)
        |    + 6.0*(b5*b5*b5*b5*b5) - 1.0*(b6*b6*b6*b6*b6) END, 6)
        |    AS p_value
        |FROM t""".stripMargin,

    // ZIP method of moments: lambda = (v + m^2 - m)/m, pi = 1 - m/lambda
    "q481_zip_fit" ->
      """WITH pu AS (SELECT user_id, sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS pc FROM events GROUP BY 1),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(pc::DOUBLE) AS s1,
        |    sum(pc::DOUBLE*pc::DOUBLE) AS s2 FROM pu),
        |m AS (SELECT n, s1/n AS mean, s2/n - (s1/n)*(s1/n) AS var FROM a),
        |l AS (SELECT n, mean, var, CASE WHEN mean > 0 THEN
        |    (var + mean*mean - mean)/mean END AS lambda FROM m)
        |SELECT n::BIGINT AS n, round(mean, 6) AS mean_,
        |  round(var, 6) AS var_, round(lambda, 6) AS lambda_,
        |  round(CASE WHEN lambda > 0 THEN 1.0 - mean/lambda END, 6) AS pi_
        |FROM l""".stripMargin,

    // adjacent-mean OLS for (a, b); exact exponential forecast replay
    "q482_grey_gm11" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT d, cnt::DOUBLE AS x0,
        |    row_number() OVER (ORDER BY d) AS k,
        |    sum(cnt::DOUBLE) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS x1 FROM daily),
        |fst AS (SELECT x0 AS x01 FROM st WHERE k = 1),
        |p AS (SELECT x0, (lag(x1) OVER (ORDER BY k) + x1)/2 AS z, k
        |  FROM st),
        |pp AS (SELECT x0, z, k FROM p WHERE z IS NOT NULL),
        |a AS (SELECT count(*)::DOUBLE AS m, sum(z) AS sz, sum(x0) AS sx,
        |    sum(z*x0) AS szx, sum(z*z) AS szz, max(k)::DOUBLE AS n
        |  FROM pp),
        |ab AS (SELECT m, n, sx, sz, CASE WHEN (szz - sz*sz/m) <> 0 THEN
        |    -((szx - sz*sx/m)/(szz - sz*sz/m)) END AS av FROM a),
        |ab2 AS (SELECT n, av, CASE WHEN av IS NOT NULL THEN
        |    sx/m + av*sz/m END AS bv FROM ab),
        |h AS (SELECT unnest([1, 2, 3]) AS step)
        |SELECT h.step,
        |  round(CASE WHEN av IS NOT NULL AND av <> 0 THEN
        |    (1.0 - exp(av))*(f.x01 - bv/av)*exp(-av*(n + h.step - 1))
        |    END, 6) AS yhat
        |FROM ab2, fst f, h""".stripMargin,

    // nonzero-demand intervals + size moments; label cut on rounded stats
    "q483_adi_cv2" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pc
        |  FROM events GROUP BY 1),
        |st AS (SELECT pc::DOUBLE AS v, row_number() OVER (ORDER BY d) AS i,
        |    count(*) OVER () AS n FROM daily),
        |dem AS (SELECT v, i, n, lag(i) OVER (ORDER BY i) AS ip FROM st
        |  WHERE v <> 0),
        |a AS (SELECT max(n) AS nb, count(*) AS nd,
        |    avg(CASE WHEN ip IS NOT NULL THEN (i - ip)::DOUBLE END) AS adi0,
        |    avg(v) AS mu, sum(v*v)/count(*)::DOUBLE AS m2 FROM dem),
        |r AS (SELECT nb, nd,
        |    sign(adi0)*floor(abs(adi0)*1e6 + 0.5)/1e6 AS adi,
        |    CASE WHEN mu <> 0 THEN sign((m2 - mu*mu)/(mu*mu))
        |      *floor(abs((m2 - mu*mu)/(mu*mu))*1e6 + 0.5)/1e6 END AS cv2
        |  FROM a)
        |SELECT nb::BIGINT AS n_buckets, nd::BIGINT AS n_demand, adi, cv2,
        |  CASE WHEN adi IS NULL OR cv2 IS NULL THEN 'unclassified'
        |    WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
        |    WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
        |    WHEN adi < 1.32 THEN 'erratic' ELSE 'lumpy' END AS label
        |FROM r""".stripMargin,

    // q-moment scaling slopes over the lag ladder; H(2) halves its slope
    "q484_ghe" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS v, row_number() OVER (ORDER BY d) AS i
        |  FROM daily),
        |l AS (SELECT i, v, tz.tau FROM b,
        |    (VALUES (1), (2), (4), (8)) tz(tau)),
        |j AS (SELECT l.tau, abs(r.v - l.v) AS ad,
        |    (r.v - l.v)*(r.v - l.v) AS sq FROM l
        |  JOIN b r ON r.i = l.i + l.tau),
        |pl AS (SELECT tau, avg(ad) AS k1, avg(sq) AS k2 FROM j GROUP BY 1),
        |pt AS (SELECT ln(tau::DOUBLE) AS xl,
        |    CASE WHEN k1 > 0 THEN ln(k1) END AS y1,
        |    CASE WHEN k2 > 0 THEN ln(k2) END AS y2 FROM pl),
        |s1 AS (SELECT count(y1)::DOUBLE AS m,
        |    sum(CASE WHEN y1 IS NOT NULL THEN xl*y1 END) AS sxy,
        |    sum(CASE WHEN y1 IS NOT NULL THEN xl END) AS sx,
        |    sum(y1) AS sy,
        |    sum(CASE WHEN y1 IS NOT NULL THEN xl*xl END) AS sxx FROM pt),
        |s2 AS (SELECT count(y2)::DOUBLE AS m,
        |    sum(CASE WHEN y2 IS NOT NULL THEN xl*y2 END) AS sxy,
        |    sum(CASE WHEN y2 IS NOT NULL THEN xl END) AS sx,
        |    sum(y2) AS sy,
        |    sum(CASE WHEN y2 IS NOT NULL THEN xl*xl END) AS sxx FROM pt),
        |f AS (SELECT
        |    (s1.sxy - s1.sx*s1.sy/s1.m)/(s1.sxx - s1.sx*s1.sx/s1.m) AS h1,
        |    ((s2.sxy - s2.sx*s2.sy/s2.m)/(s2.sxx - s2.sx*s2.sx/s2.m))/2
        |      AS h2 FROM s1, s2)
        |SELECT round(h1, 6) AS h1, round(h2, 6) AS h2,
        |  round(h1 - h2, 6) AS mf_gap
        |FROM f""".stripMargin,

    // Mardia R^2 from the three pairwise correlations
    "q485_circ_linear" ->
      """WITH b AS (SELECT value AS x,
        |    cos(hour(ts)*(2.0*pi()/24)) AS c,
        |    sin(hour(ts)*(2.0*pi()/24)) AS s FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(c) AS sc,
        |    sum(s) AS ss, sum(x*c) AS sxc, sum(x*s) AS sxs,
        |    sum(c*s) AS scs, sum(x*x) AS sxx, sum(c*c) AS scc,
        |    sum(s*s) AS sss FROM b),
        |r AS (SELECT n,
        |    CASE WHEN (sxx - sx*sx/n) > 0 AND (scc - sc*sc/n) > 0 THEN
        |      (sxc - sx*sc/n)/sqrt((sxx - sx*sx/n)*(scc - sc*sc/n)) END
        |      AS rxc,
        |    CASE WHEN (sxx - sx*sx/n) > 0 AND (sss - ss*ss/n) > 0 THEN
        |      (sxs - sx*ss/n)/sqrt((sxx - sx*sx/n)*(sss - ss*ss/n)) END
        |      AS rxs,
        |    CASE WHEN (scc - sc*sc/n) > 0 AND (sss - ss*ss/n) > 0 THEN
        |      (scs - sc*ss/n)/sqrt((scc - sc*sc/n)*(sss - ss*ss/n)) END
        |      AS rcs FROM a)
        |SELECT n::BIGINT AS n, round(rxc, 6) AS r_xc,
        |  round(rxs, 6) AS r_xs, round(rcs, 6) AS r_cs,
        |  round(CASE WHEN rxc IS NOT NULL AND rxs IS NOT NULL
        |      AND rcs IS NOT NULL AND rcs*rcs < 1 THEN
        |    (rxc*rxc + rxs*rxs - 2.0*rxc*rxs*rcs)/(1.0 - rcs*rcs) END, 6)
        |    AS r2
        |FROM r""".stripMargin,

    // quantized power shares; cumulative walk fast->slow; first >= 0.85
    "q486_rolloff" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT cnt::DOUBLE AS v,
        |    (row_number() OVER (ORDER BY d) - 1)::DOUBLE AS t FROM daily),
        |c AS (SELECT t, v - avg(v) OVER () AS z FROM st),
        |a AS (SELECT count(*) AS n,
        |    sum(z*cos(t*(2.0*pi()/3))) AS c3, sum(z*sin(t*(2.0*pi()/3))) AS s3,
        |    sum(z*cos(t*(2.0*pi()/4))) AS c4, sum(z*sin(t*(2.0*pi()/4))) AS s4,
        |    sum(z*cos(t*(2.0*pi()/5))) AS c5, sum(z*sin(t*(2.0*pi()/5))) AS s5,
        |    sum(z*cos(t*(2.0*pi()/7))) AS c7, sum(z*sin(t*(2.0*pi()/7))) AS s7,
        |    sum(z*cos(t*(2.0*pi()/14))) AS c14, sum(z*sin(t*(2.0*pi()/14))) AS s14,
        |    sum(z*cos(t*(2.0*pi()/30))) AS c30, sum(z*sin(t*(2.0*pi()/30))) AS s30
        |  FROM c),
        |pw AS (SELECT n, c3*c3 + s3*s3 AS p3, c4*c4 + s4*s4 AS p4,
        |    c5*c5 + s5*s5 AS p5, c7*c7 + s7*s7 AS p7,
        |    c14*c14 + s14*s14 AS p14, c30*c30 + s30*s30 AS p30 FROM a),
        |u AS (SELECT n, 3 AS p, p3 AS pwr FROM pw
        |  UNION ALL SELECT n, 4, p4 FROM pw
        |  UNION ALL SELECT n, 5, p5 FROM pw
        |  UNION ALL SELECT n, 7, p7 FROM pw
        |  UNION ALL SELECT n, 14, p14 FROM pw
        |  UNION ALL SELECT n, 30, p30 FROM pw),
        |sh AS (SELECT n, p,
        |    floor(pwr/sum(pwr) OVER () * 1e6 + 0.5)/1e6 AS share FROM u),
        |cm AS (SELECT n, p, sum(share) OVER (ORDER BY p ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sh)
        |SELECT p AS rolloff_period, cum AS cum_share, n::BIGINT AS n
        |FROM cm WHERE cum >= 0.85 ORDER BY p LIMIT 1""".stripMargin,

    // exact integer pair counts at two radii; D2 = ln ratio / ln 4
    "q487_corr_dim" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT cnt::BIGINT AS v, row_number() OVER (ORDER BY d) AS i
        |  FROM daily),
        |p AS (SELECT abs(a.v - c.v) AS dd FROM b a JOIN b c ON a.i < c.i),
        |ag AS (SELECT sum(CASE WHEN dd <= 2 THEN 1 ELSE 0 END)::BIGINT
        |      AS c1,
        |    sum(CASE WHEN dd <= 8 THEN 1 ELSE 0 END)::BIGINT AS c2,
        |    count(*)::BIGINT AS np FROM p)
        |SELECT np AS n_pairs, c1 AS c1_pairs, c2 AS c2_pairs,
        |  round(CASE WHEN c1 > 0 AND c2 > 0 THEN
        |    ln(c2::DOUBLE/c1::DOUBLE)/ln(4.0) END, 6) AS d2
        |FROM ag""".stripMargin,

    // moving ranges; 2.66/3.267 Shewhart constants; strict exceedances
    "q488_imr_chart" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT cnt::DOUBLE AS x, d FROM daily),
        |mr AS (SELECT x, abs(x - lag(x) OVER (ORDER BY d)) AS m FROM st),
        |a AS (SELECT count(*) AS n, avg(x) AS xbar, avg(m) AS mrbar
        |  FROM mr),
        |lim AS (SELECT n, xbar, mrbar, xbar + 2.66*mrbar AS ucl,
        |    xbar - 2.66*mrbar AS lcl, 3.267*mrbar AS uclmr FROM a)
        |SELECT max(n)::BIGINT AS n, round(max(xbar), 6) AS xbar,
        |  round(max(mrbar), 6) AS mrbar, round(max(ucl), 6) AS ucl_x,
        |  round(max(lcl), 6) AS lcl_x,
        |  sum(CASE WHEN x > ucl OR x < lcl THEN 1 ELSE 0 END)::BIGINT
        |    AS ooc_x,
        |  sum(CASE WHEN m > uclmr THEN 1 ELSE 0 END)::BIGINT AS ooc_mr
        |FROM mr, lim""".stripMargin,

    // closed-form z weights; exact time-varying sigma_z(t) limits
    "q489_ewma_chart" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT cnt::DOUBLE AS x, row_number() OVER (ORDER BY d) AS i
        |  FROM daily),
        |mom AS (SELECT count(*) AS n, avg(x) AS xbar,
        |    sqrt(sum(x*x)/count(*)::DOUBLE - avg(x)*avg(x)) AS sigma
        |  FROM b),
        |z AS (SELECT a.i,
        |    max(pow(0.8, a.i))*max(m.xbar)
        |      + sum(0.2*pow(0.8, a.i - c.i)*c.x) AS z,
        |    max(m.xbar) AS xb, max(m.sigma) AS sg
        |  FROM b a JOIN b c ON c.i <= a.i, mom m GROUP BY a.i),
        |o AS (SELECT CASE WHEN abs(z - xb) >
        |    3.0*sg*sqrt((0.2/1.8)*(1.0 - pow(0.8, i*2))) THEN 1 ELSE 0 END
        |    AS ooc, xb, sg FROM z)
        |SELECT count(*)::BIGINT AS n, round(max(xb), 6) AS xbar,
        |  round(max(sg), 6) AS sigma, sum(ooc)::BIGINT AS ooc
        |FROM o""".stripMargin,

    // population-sigma capability vs literal [0, 60] specs
    "q490_capability" ->
      """WITH a AS (SELECT count(*) AS n, avg(value) AS mu,
        |    sum(value*value)/count(*)::DOUBLE AS m2 FROM events
        |  WHERE value IS NOT NULL),
        |s AS (SELECT n, mu, sqrt(m2 - mu*mu) AS sigma FROM a)
        |SELECT n::BIGINT AS n, round(mu, 6) AS mu,
        |  round(sigma, 6) AS sigma,
        |  round(CASE WHEN sigma > 0 THEN 60.0/(6.0*sigma) END, 6) AS cp,
        |  round(CASE WHEN sigma > 0 THEN
        |    least(60.0 - mu, mu - 0.0)/(3.0*sigma) END, 6) AS cpk
        |FROM s""".stripMargin,

    // integer rolling side/trend/alternation indicators per WECO rule
    "q491_we_rules" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT d, cnt::DOUBLE AS x FROM daily),
        |s0 AS (SELECT d, x, x - lag(x) OVER (ORDER BY d) AS dd,
        |    row_number() OVER (ORDER BY d) AS i FROM st),
        |m AS (SELECT avg(x) AS mu,
        |    (SELECT avg(abs(dd)) FROM s0) / 1.128 AS sg FROM st),
        |s1 AS (SELECT s0.d, s0.x, mu, sg, (x > mu)::BIGINT AS ab,
        |    (x < mu)::BIGINT AS bl, s0.dd, s0.i FROM s0, m),
        |s2 AS (SELECT *, (dd > 0)::BIGINT AS up, (dd < 0)::BIGINT AS dn,
        |    CASE WHEN dd * lag(dd) OVER (ORDER BY d) < 0 THEN 1 ELSE 0 END
        |      AS alt FROM s1),
        |s3 AS (SELECT i,
        |    CASE WHEN abs(x - mu) > 3.0*sg THEN 1 ELSE 0 END AS r1,
        |    greatest(sum(ab) OVER w9, sum(bl) OVER w9) AS same9,
        |    greatest(sum(up) OVER w5, sum(dn) OVER w5) AS mono6,
        |    sum(alt) OVER w12 AS alt12
        |  FROM s2 WINDOW
        |    w9 AS (ORDER BY d ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
        |    w5 AS (ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |    w12 AS (ORDER BY d ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        |SELECT count(*)::BIGINT AS n, sum(r1)::BIGINT AS r1,
        |  sum(CASE WHEN i >= 9 AND same9 = 9 THEN 1 ELSE 0 END)::BIGINT
        |    AS r2,
        |  sum(CASE WHEN i >= 6 AND mono6 = 5 THEN 1 ELSE 0 END)::BIGINT
        |    AS r3,
        |  sum(CASE WHEN i >= 14 AND alt12 = 12 THEN 1 ELSE 0 END)::BIGINT
        |    AS r4
        |FROM s3""".stripMargin,

    // running peak; relative drawdowns; ulcer = rms of drawdown pct
    "q492_drawdown" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, avg(value) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |st AS (SELECT m AS x, max(m) OVER (ORDER BY d ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS pk FROM daily),
        |dd AS (SELECT x, pk, pk - x AS dd,
        |    CASE WHEN pk > 0 THEN (pk - x)/pk END AS ddp FROM st)
        |SELECT count(*)::BIGINT AS n, round(max(pk), 6) AS peak,
        |  round(max(dd), 6) AS max_dd, round(max(ddp), 6) AS max_dd_pct,
        |  round(CASE WHEN count(ddp) > 0 THEN
        |    sqrt(sum(ddp*ddp)/count(ddp)::DOUBLE) END, 6) AS ulcer
        |FROM dd""".stripMargin,

    // one-sided second moment; gain/loss mass ratio at zero target
    "q493_sortino_omega" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |r0 AS (SELECT cnt::DOUBLE - lag(cnt::DOUBLE) OVER (ORDER BY d)
        |    AS r FROM daily),
        |rr AS (SELECT r FROM r0 WHERE r IS NOT NULL),
        |a AS (SELECT count(*) AS n, avg(r) AS mean_r,
        |    sum(CASE WHEN r < 0 THEN r*r ELSE 0 END) AS dsq,
        |    sum(CASE WHEN r > 0 THEN r ELSE 0 END) AS gain,
        |    sum(CASE WHEN r < 0 THEN -r ELSE 0 END) AS loss FROM rr),
        |s AS (SELECT n, mean_r, sqrt(dsq/n::DOUBLE) AS ddev, gain, loss
        |  FROM a)
        |SELECT n::BIGINT AS n, round(mean_r, 6) AS mean_r,
        |  round(ddev, 6) AS downside_dev,
        |  round(CASE WHEN ddev > 0 THEN mean_r/ddev END, 6) AS sortino,
        |  round(CASE WHEN loss > 0 THEN gain/loss END, 6) AS omega
        |FROM s""".stripMargin,

    // Erlang B recursion unrolled to 5 agents; C and wait guarded a < N
    "q494_erlang_c" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS c
        |  FROM events GROUP BY 1),
        |hod AS (SELECT hour(h) AS hod, avg(c/60.0) AS lam FROM hourly
        |  GROUP BY 1),
        |s0 AS (SELECT hod, lam, lam/2.0 AS a FROM hod),
        |s1 AS (SELECT *, a*1.0/(1.0 + a*1.0) AS b1 FROM s0),
        |s2 AS (SELECT *, a*b1/(2.0 + a*b1) AS b2 FROM s1),
        |s3 AS (SELECT *, a*b2/(3.0 + a*b2) AS b3 FROM s2),
        |s4 AS (SELECT *, a*b3/(4.0 + a*b3) AS b4 FROM s3),
        |s5 AS (SELECT *, a*b4/(5.0 + a*b4) AS b5 FROM s4),
        |f AS (SELECT hod, lam, a, b5, CASE WHEN a < 5 THEN
        |    5.0*b5/(5.0 - a*(1.0 - b5)) END AS cc FROM s5)
        |SELECT hod, round(lam, 6) AS lambda, round(a, 6) AS offered_a,
        |  round(b5, 6) AS erlang_b, round(cc, 6) AS erlang_c,
        |  round(CASE WHEN cc IS NOT NULL THEN cc/(10.0 - lam) END, 6)
        |    AS mean_wait
        |FROM f""".stripMargin,

    // exact critical-ratio quantile + one-sided expected costs
    "q495_newsvendor" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pc
        |  FROM events GROUP BY 1),
        |q AS (SELECT quantile_cont(pc::DOUBLE, 0.75) AS qs FROM daily)
        |SELECT count(*)::BIGINT AS n, 0.75::DOUBLE AS ratio,
        |  round(max(qs), 6) AS q_star,
        |  round(avg(greatest(pc::DOUBLE - qs, 0.0)), 6) AS exp_short,
        |  round(avg(greatest(qs - pc::DOUBLE, 0.0)), 6) AS exp_left
        |FROM daily, q""".stripMargin,

    // cumulative level + trailing-14 run rate + buckets-to-capacity
    "q496_runway" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT count(*) AS n, sum(cnt::DOUBLE) AS level FROM daily),
        |r AS (SELECT avg(cnt::DOUBLE) AS run_rate FROM
        |    (SELECT cnt FROM daily ORDER BY d DESC LIMIT 14))
        |SELECT n::BIGINT AS n, round(level, 6) AS level,
        |  round(run_rate, 6) AS run_rate,
        |  round(CASE WHEN run_rate > 0 AND level < 1000000.0 THEN
        |    (1000000.0 - level)/run_rate END, 6) AS runway_buckets
        |FROM t, r""".stripMargin,

    // k/2k/4k order-stat spacings; ln ratio over ln 2
    "q497_pickands" ->
      """WITH top AS (SELECT value AS v,
        |    row_number() OVER (ORDER BY value DESC, event_id) AS r
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        |  ORDER BY value DESC, event_id LIMIT 100),
        |a AS (SELECT count(*) AS cnt,
        |    max(CASE WHEN r = 25 THEN v END) AS xk,
        |    max(CASE WHEN r = 50 THEN v END) AS x2k,
        |    max(CASE WHEN r = 100 THEN v END) AS x4k FROM top)
        |SELECT 25::BIGINT AS k, round(xk, 6) AS x_k,
        |  round(x2k, 6) AS x_2k, round(x4k, 6) AS x_4k,
        |  round(CASE WHEN cnt = 100 AND xk - x2k > 0 AND x2k - x4k > 0
        |    THEN ln((xk - x2k)/(x2k - x4k))/ln(2.0) END, 6) AS xi
        |FROM a""".stripMargin,

    // top-k log-excess moments; DEdH gamma
    "q498_moment_tail" ->
      """WITH top AS (SELECT value AS v FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL AND value > 0
        |  ORDER BY value DESC, event_id LIMIT 101),
        |a AS (SELECT count(*) AS cnt, min(v) AS thr, sum(ln(v)) AS sl,
        |    sum(ln(v)*ln(v)) AS sll FROM top),
        |m AS (SELECT cnt, thr,
        |    CASE WHEN cnt = 101 THEN (sl - 101.0*ln(thr))/100.0 END AS m1,
        |    CASE WHEN cnt = 101 THEN
        |      (sll - 2.0*ln(thr)*sl + 101.0*ln(thr)*ln(thr))/100.0 END
        |      AS m2 FROM a)
        |SELECT 100::BIGINT AS n_top, round(thr, 6) AS threshold,
        |  round(m1, 6) AS m1, round(m2, 6) AS m2,
        |  round(CASE WHEN m2 IS NOT NULL AND m2 > 0
        |      AND (1.0 - m1*m1/m2) <> 0 THEN
        |    m1 + 1 - 0.5/(1.0 - m1*m1/m2) END, 6) AS gamma_
        |FROM m""".stripMargin,

    // L-moment GEV (Hosking) with the SAME Lanczos literals as the
    // engine (interpolated below) and pow-based return levels
    "q499_gev_lmom" -> {
      val cs = graft.operators.StatTests.lanczosCoeffs
      val aExpr = cs.head.toString + cs.zipWithIndex.tail.map {
        case (cc, i) => s" + ($cc)/(z - 1 + $i.0)"
      }.mkString
      val sqrt2pi = math.sqrt(2.0 * math.Pi)
      val ln2ln3 = math.log(2.0) / math.log(3.0)
      s"""WITH daily AS (SELECT date_trunc('day', ts) AS d,
         |    max(value) AS mx FROM events WHERE value IS NOT NULL
         |  GROUP BY 1),
         |r AS (SELECT mx AS x, row_number() OVER (ORDER BY mx)::DOUBLE AS i,
         |    count(*) OVER ()::DOUBLE AS n FROM daily),
         |a AS (SELECT max(n)::BIGINT AS n, avg(x) AS b0,
         |    avg(x * (i-1)/(n-1)) AS b1,
         |    avg(x * (i-1)/(n-1) * (i-2)/(n-2)) AS b2 FROM r),
         |l AS (SELECT n, b0 AS l1, 2.0*b1 - b0 AS l2,
         |    6.0*b2 - 6.0*b1 + b0 AS l3 FROM a),
         |t AS (SELECT n, l1, l2, CASE WHEN l2 <> 0 THEN l3/l2 END AS t3
         |  FROM l),
         |cc AS (SELECT n, l1, l2, 2.0/(3.0 + t3) - $ln2ln3 AS c FROM t),
         |kk AS (SELECT n, l1, l2, 7.8590*c + 2.9554*c*c AS kappa FROM cc),
         |zz AS (SELECT n, l1, l2, kappa, 1.0 + kappa AS z FROM kk),
         |gg AS (SELECT n, l1, l2, kappa, CASE WHEN z >= 0.5 THEN
         |    $sqrt2pi * pow(z + 6.5, z - 0.5) * exp(-(z + 6.5))
         |      * ($aExpr) END AS g1k FROM zz),
         |al AS (SELECT n, l1, kappa, g1k, CASE WHEN kappa <> 0
         |      AND (1.0 - pow(2.0, -kappa)) <> 0 AND g1k IS NOT NULL THEN
         |    l2*kappa/((1.0 - pow(2.0, -kappa))*g1k) END AS alpha FROM gg),
         |mm AS (SELECT n, kappa, alpha, CASE WHEN alpha IS NOT NULL THEN
         |    l1 - alpha*(1.0 - g1k)/kappa END AS mu FROM al),
         |u AS (SELECT n, kappa, alpha, mu, 20 AS ret_t,
         |    -ln(1.0 - ${1.0 / 20}) AS y FROM mm
         |  UNION ALL SELECT n, kappa, alpha, mu, 100,
         |    -ln(1.0 - ${1.0 / 100}) FROM mm)
         |SELECT n, round(kappa, 6) AS kappa, round(alpha, 6) AS alpha_,
         |  round(mu, 6) AS mu_, ret_t,
         |  round(CASE WHEN mu IS NOT NULL THEN
         |    mu + alpha*(1.0 - pow(y, kappa))/kappa END, 6) AS ret_level
         |FROM u""".stripMargin
    },

    // NB method of moments: r = m^2/(v-m), p = m/v; null if v <= m
    "q500_negbin_fit" ->
      """WITH pu AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(c::DOUBLE) AS s1,
        |    sum(c::DOUBLE*c::DOUBLE) AS s2 FROM pu),
        |m AS (SELECT n, s1/n AS mean, s2/n - (s1/n)*(s1/n) AS var FROM a),
        |r AS (SELECT n, mean, var, CASE WHEN var > mean AND mean > 0 THEN
        |    mean*mean/(var - mean) END AS rr FROM m)
        |SELECT n::BIGINT AS n, round(mean, 6) AS mean_,
        |  round(var, 6) AS var_, round(rr, 6) AS r_,
        |  round(CASE WHEN rr IS NOT NULL THEN mean/var END, 6) AS p_
        |FROM r""".stripMargin,

    // pooled per-mean variance; positive-part shrink factor
    "q501_james_stein" ->
      """WITH per AS (SELECT event_type AS grp, count(*)::DOUBLE AS ng,
        |    avg(value) AS rm, sum(value*value)/count(*)::DOUBLE AS m2
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |pe AS (SELECT grp, ng, rm, (m2 - rm*rm)/ng AS se2 FROM per),
        |g AS (SELECT count(*)::DOUBLE AS k, avg(rm) AS gm,
        |    avg(se2) AS sbar FROM pe),
        |ss AS (SELECT sum((rm - g.gm)*(rm - g.gm)) AS s FROM pe, g),
        |f AS (SELECT k, gm, sbar, s, CASE WHEN k >= 4 AND s > 0 THEN
        |    greatest(0.0, 1.0 - (k - 3)*sbar/s) END AS c FROM g, ss)
        |SELECT pe.grp AS "group", pe.ng::BIGINT AS n_g,
        |  round(pe.rm, 6) AS raw_mean,
        |  round(CASE WHEN f.c IS NOT NULL THEN
        |    f.gm + f.c*(pe.rm - f.gm) END, 6) AS shrunk
        |FROM pe, f""".stripMargin,

    // cell means, additive margins, Tukey 1-df SS and F
    "q502_tukey_additivity" ->
      """WITH cells AS (SELECT dayofweek(ts) AS r, floor(hour(ts)/6) AS c,
        |    avg(value) AS m FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2),
        |wm AS (SELECT r, c, m, avg(m) OVER (PARTITION BY r) AS rm,
        |    avg(m) OVER (PARTITION BY c) AS cm, avg(m) OVER () AS gm
        |  FROM cells),
        |eff AS (SELECT r, c, m, rm - gm AS a, cm - gm AS b,
        |    m - rm - cm + gm AS res FROM wm),
        |rsq AS (SELECT sum(aa*aa) AS sa2, count(*)::DOUBLE AS nr FROM
        |    (SELECT DISTINCT r, a AS aa FROM eff)),
        |csq AS (SELECT sum(bb*bb) AS sb2, count(*)::DOUBLE AS nc FROM
        |    (SELECT DISTINCT c, b AS bb FROM eff)),
        |ag AS (SELECT count(*) AS cells_, sum(res*res) AS ss_res,
        |    sum(res*a*b) AS num FROM eff),
        |f AS (SELECT cells_, ss_res, CASE WHEN sa2 > 0 AND sb2 > 0 THEN
        |    num*num/(sa2*sb2) END AS ssn,
        |    (nr - 1)*(nc - 1) - 1 AS dfr FROM ag, rsq, csq)
        |SELECT cells_::BIGINT AS cells_, round(ss_res, 6) AS ss_res,
        |  round(ssn, 6) AS ss_nonadd,
        |  round(CASE WHEN ssn IS NOT NULL AND dfr > 0
        |      AND (ss_res - ssn) > 0 THEN
        |    ssn/((ss_res - ssn)/dfr) END, 6) AS f_stat
        |FROM f""".stripMargin,

    // exact split counts; quantized-gain argmax, smallest-thr tie-break
    "q503_decision_stump" ->
      """WITH s AS (SELECT value AS x,
        |    (event_type = 'purchase')::BIGINT AS y FROM events
        |  WHERE value IS NOT NULL),
        |e AS (SELECT tz.t, x, y FROM s,
        |    (SELECT unnest([5.0, 10.0, 20.0, 40.0]::DOUBLE[]) AS t) tz),
        |p AS (SELECT t, count(*)::DOUBLE AS n, sum(y)::DOUBLE AS pos,
        |    sum(CASE WHEN x <= t THEN 1 ELSE 0 END)::DOUBLE AS nl,
        |    sum(CASE WHEN x <= t THEN y ELSE 0 END)::DOUBLE AS pl
        |  FROM e GROUP BY 1),
        |g AS (SELECT t, n, pos, nl, pl, n - nl AS nr, pos - pl AS pr
        |  FROM p),
        |sc AS (SELECT t, nl, nr, CASE WHEN nl > 0 AND nr > 0 THEN
        |    2.0*(pos/n)*(1.0 - pos/n)
        |    - (nl*(2.0*(pl/nl)*(1.0 - pl/nl))
        |       + nr*(2.0*(pr/nr)*(1.0 - pr/nr)))/n ELSE 0.0 END AS gain
        |  FROM g),
        |q AS (SELECT t, nl, nr, gain,
        |    sign(gain)*floor(abs(gain)*1e6 + 0.5)/1e6 AS qg FROM sc),
        |b AS (SELECT max(qg) AS bq FROM q),
        |b2 AS (SELECT min(t) AS bt FROM q, b WHERE qg = bq)
        |SELECT t AS thr, nl::BIGINT AS n_left, nr::BIGINT AS n_right,
        |  round(gain, 6) AS gini_gain,
        |  (qg = b.bq AND t = b2.bt) AS best
        |FROM q, b, b2""".stripMargin,

    // paired hourly means; 1.96-sd limits; outside recount
    "q504_bland_altman" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
        |    avg(CASE WHEN event_type = 'click' THEN value END) AS a,
        |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS b
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |p AS (SELECT a - b AS d FROM hourly
        |  WHERE a IS NOT NULL AND b IS NOT NULL),
        |m AS (SELECT count(*) AS n, avg(d) AS bias,
        |    sum(d*d)/count(*)::DOUBLE AS m2 FROM p),
        |s AS (SELECT n, bias, sqrt(m2 - bias*bias) AS sd FROM m),
        |l AS (SELECT n, bias, sd, bias - 1.96*sd AS lo,
        |    bias + 1.96*sd AS hi FROM s)
        |SELECT max(n)::BIGINT AS n, round(max(bias), 6) AS bias,
        |  round(max(sd), 6) AS sd_d, round(max(lo), 6) AS loa_low,
        |  round(max(hi), 6) AS loa_high,
        |  sum(CASE WHEN d < lo OR d > hi THEN 1 ELSE 0 END)::BIGINT
        |    AS n_outside
        |FROM p, l""".stripMargin,

    // Wilson bounds per arm; Newcombe square-and-add difference CI
    "q505_newcombe" -> {
      val z = 1.959963984540054
      val z2 = z * z
      s"""WITH s AS (SELECT event_type, (value > 20)::BIGINT AS sc
         |  FROM events WHERE value IS NOT NULL),
         |w1 AS (SELECT count(*)::DOUBLE AS n1, sum(sc)::DOUBLE AS x1
         |  FROM s WHERE event_type = 'click'),
         |w2 AS (SELECT count(*)::DOUBLE AS n2, sum(sc)::DOUBLE AS x2
         |  FROM s WHERE event_type = 'purchase'),
         |c1 AS (SELECT n1, x1/n1 AS p1,
         |    (x1/n1 + $z2/(n1*2) - $z*sqrt((x1/n1)*(1.0 - x1/n1)/n1
         |      + $z2/(n1*n1*4)))/(1.0 + $z2/n1) AS lo1,
         |    (x1/n1 + $z2/(n1*2) + $z*sqrt((x1/n1)*(1.0 - x1/n1)/n1
         |      + $z2/(n1*n1*4)))/(1.0 + $z2/n1) AS hi1 FROM w1),
         |c2 AS (SELECT n2, x2/n2 AS p2,
         |    (x2/n2 + $z2/(n2*2) - $z*sqrt((x2/n2)*(1.0 - x2/n2)/n2
         |      + $z2/(n2*n2*4)))/(1.0 + $z2/n2) AS lo2,
         |    (x2/n2 + $z2/(n2*2) + $z*sqrt((x2/n2)*(1.0 - x2/n2)/n2
         |      + $z2/(n2*n2*4)))/(1.0 + $z2/n2) AS hi2 FROM w2),
         |j AS (SELECT *, p1 - p2 AS diff FROM c1, c2)
         |SELECT n1::BIGINT AS n1, round(p1, 6) AS p1, round(lo1, 6) AS lo1,
         |  round(hi1, 6) AS hi1, n2::BIGINT AS n2, round(p2, 6) AS p2,
         |  round(lo2, 6) AS lo2, round(hi2, 6) AS hi2,
         |  round(diff, 6) AS diff,
         |  round(diff - sqrt((p1 - lo1)*(p1 - lo1)
         |    + (hi2 - p2)*(hi2 - p2)), 6) AS d_lo,
         |  round(diff + sqrt((hi1 - p1)*(hi1 - p1)
         |    + (p2 - lo2)*(p2 - lo2)), 6) AS d_hi
         |FROM j""".stripMargin
    },

    // centered moments; positive root of the Deming quadratic
    "q506_deming" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
        |    avg(CASE WHEN event_type = 'click' THEN value END) AS a,
        |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS b
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |p AS (SELECT a AS x, b AS y FROM hourly
        |  WHERE a IS NOT NULL AND b IS NOT NULL),
        |ag AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM p),
        |m AS (SELECT n, sx, sy, sxx/n - (sx/n)*(sx/n) AS mxx,
        |    syy/n - (sy/n)*(sy/n) AS myy,
        |    sxy/n - (sx/n)*(sy/n) AS mxy FROM ag),
        |s AS (SELECT n, sx, sy, CASE WHEN mxy <> 0 THEN
        |    ((myy - 1.0*mxx) + sqrt((myy - 1.0*mxx)*(myy - 1.0*mxx)
        |      + 4.0*mxy*mxy))/(2.0*mxy) END AS slope FROM m)
        |SELECT n::BIGINT AS n, round(slope, 6) AS slope,
        |  round(CASE WHEN slope IS NOT NULL THEN sy/n - slope*sx/n END, 6)
        |    AS intercept
        |FROM s""".stripMargin,

    // persistence forecast vs above-exact-median observation
    "q507_heidke_peirce" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT d, cnt, quantile_cont(cnt::DOUBLE, 0.5) OVER ()
        |    AS med FROM daily),
        |ob AS (SELECT d, (cnt::DOUBLE > med)::BIGINT AS obs FROM st),
        |fc AS (SELECT obs, lag(obs) OVER (ORDER BY d) AS f FROM ob),
        |g AS (SELECT obs, f FROM fc WHERE f IS NOT NULL),
        |a AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN f = 1 AND obs = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS hits,
        |    sum(CASE WHEN f = 1 AND obs = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS false_alarms,
        |    sum(CASE WHEN f = 0 AND obs = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS misses,
        |    sum(CASE WHEN f = 0 AND obs = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS corr_neg FROM g),
        |d2 AS (SELECT n, hits, false_alarms, misses, corr_neg,
        |    hits::DOUBLE AS ad, false_alarms::DOUBLE AS bd,
        |    misses::DOUBLE AS cd, corr_neg::DOUBLE AS dd FROM a)
        |SELECT n, hits, false_alarms, misses, corr_neg,
        |  round(CASE WHEN (ad + cd) > 0 AND (bd + dd) > 0 THEN
        |    ad/(ad + cd) - bd/(bd + dd) END, 6) AS pss,
        |  round(CASE WHEN (ad + cd)*(cd + dd) + (ad + bd)*(bd + dd) > 0
        |    THEN 2.0*(ad*dd - bd*cd)
        |      /((ad + cd)*(cd + dd) + (ad + bd)*(bd + dd)) END, 6) AS hss
        |FROM d2""".stripMargin,

    // one pass of reciprocal/ln/linear/square sums
    "q508_power_means" ->
      """WITH v AS (SELECT value AS x FROM events
        |  WHERE value IS NOT NULL AND value > 0),
        |a AS (SELECT count(*)::DOUBLE AS n, sum(1.0/x) AS sinv,
        |    sum(ln(x)) AS sln, sum(x) AS s1, sum(x*x) AS s2 FROM v)
        |SELECT n::BIGINT AS n, round(n/sinv, 6) AS hm,
        |  round(exp(sln/n), 6) AS gm, round(s1/n, 6) AS am,
        |  round(sqrt(s2/n), 6) AS qm
        |FROM a""".stripMargin,

    // exact confusion counts per cut; quantized-J argmax
    "q509_youden" ->
      """WITH s AS (SELECT (event_type = 'purchase')::BIGINT AS y,
        |    value AS sc FROM events WHERE value IS NOT NULL),
        |e AS (SELECT tz.t, y, sc FROM s,
        |    (SELECT unnest([5.0, 10.0, 20.0, 40.0]::DOUBLE[]) AS t) tz),
        |p AS (SELECT t,
        |    sum(CASE WHEN sc > t AND y = 1 THEN 1 ELSE 0 END)::DOUBLE
        |      AS tp,
        |    sum(CASE WHEN sc <= t AND y = 0 THEN 1 ELSE 0 END)::DOUBLE
        |      AS tn,
        |    sum((y = 1)::INT)::DOUBLE AS pos,
        |    sum((y = 0)::INT)::DOUBLE AS neg FROM e GROUP BY 1),
        |sc2 AS (SELECT t, CASE WHEN pos > 0 THEN tp/pos END AS sens,
        |    CASE WHEN neg > 0 THEN tn/neg END AS spec FROM p),
        |j AS (SELECT t, sens, spec, sens + spec - 1 AS j FROM sc2),
        |q AS (SELECT t, sens, spec, j,
        |    sign(j)*floor(abs(j)*1e6 + 0.5)/1e6 AS qj FROM j),
        |b AS (SELECT max(qj) AS bq FROM q),
        |b2 AS (SELECT min(t) AS bt FROM q, b WHERE qj = bq)
        |SELECT t AS thr, round(sens, 6) AS sens, round(spec, 6) AS spec,
        |  round(j, 6) AS j, (qj = b.bq AND t = b2.bt) AS best
        |FROM q, b, b2""".stripMargin,

    // share entropy/Simpson from exact counts; Hill effective numbers
    "q510_hill_diversity" ->
      """WITH per AS (SELECT user_id, count(*) AS c FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS s_, sum(c)::DOUBLE AS tot,
        |    sum(c::DOUBLE*ln(c::DOUBLE)) AS slnc,
        |    sum(c::DOUBLE*c::DOUBLE) AS sc2 FROM per),
        |h AS (SELECT s_, tot, ln(tot) - slnc/tot AS hh, sc2 FROM a)
        |SELECT s_, round(exp(hh), 6) AS d1, round(tot*tot/sc2, 6) AS d2,
        |  round(CASE WHEN s_ > 1 THEN hh/ln(s_::DOUBLE) END, 6)
        |    AS evenness
        |FROM h""".stripMargin,

    // adjacent-day distinct-user sets; exact overlap; Jaccard
    "q511_user_turnover" ->
      """WITH dl AS (SELECT DISTINCT date_trunc('day', ts) AS d,
        |    user_id AS u FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |dd AS (SELECT date_diff('day', min(d) OVER (), d) AS dd, u
        |  FROM dl),
        |sz AS (SELECT dd, count(*) AS sz FROM dd GROUP BY 1),
        |cm AS (SELECT a.dd, count(*) AS com FROM dd a JOIN dd b
        |  ON b.dd = a.dd + 1 AND b.u = a.u GROUP BY 1),
        |p AS (SELECT s1.dd, s1.sz AS np, s2.sz AS nc,
        |    coalesce(cm.com, 0) AS ncom FROM sz s1
        |  JOIN (SELECT dd - 1 AS ddp, sz FROM sz) s2 ON s1.dd = s2.ddp
        |  LEFT JOIN cm ON cm.dd = s1.dd)
        |SELECT dd, np::BIGINT AS n_prev, nc::BIGINT AS n_curr,
        |  ncom::BIGINT AS n_common,
        |  round(ncom::DOUBLE/(np + nc - ncom)::DOUBLE, 6) AS jaccard
        |FROM p""".stripMargin,

    // q214's twin with the df<=2 hot-shingle cap applied on both engines:
    // n_a counts only kept (rare) shingles, so the ratio's denominator is
    // the capped universe — the scale-safe semantics, not a post-filter
    "q512_containment_capped" ->
      """WITH w AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 60),
        |sh AS (SELECT doc_id, list_distinct(
        |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]) AS sh
        |  FROM w WHERE len(ws) >= 3),
        |ex0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |rare AS (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= 2),
        |ex AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN rare USING (s)),
        |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |          FROM ex a JOIN ex b ON b.s = a.s AND a.doc_id <> b.doc_id
        |          GROUP BY 1, 2)
        |SELECT i.id_a, i.id_b, i.inter::BIGINT AS inter, sz.n::BIGINT AS n_a,
        |  round(i.inter::DOUBLE / sz.n, 6) AS containment
        |FROM inter i JOIN sz ON sz.doc_id = i.id_a
        |WHERE i.inter::DOUBLE / sz.n >= 0.05 ORDER BY 1, 2""".stripMargin
  )

  /** q430's oracle: the same 24-bin pivot + Fourier-1 folds as
    * [[graft.operators.StatTests.harmonicFit]], with every cos/sin
    * constant emitted as the 17-digit JVM double so both engines multiply
    * identical values.
    */
  private def harmonicFitSql(period: Int): String = {
    def lit17(x: Double): String = "%.17g".format(x)
    val idx = 0 until period
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val pivDefs = idx.map(b =>
      s"coalesce(sum(CASE WHEN b = $b THEN m END), 0.0) AS m$b")
      .mkString(",\n    ")
    val mesor = chain(idx.map(b => s"m$b")) + s" / ${period.toDouble}"
    val ca = chain(idx.map(b =>
      s"m$b * ${lit17(math.cos(2.0 * math.Pi * b / period))}")) +
      s" * ${lit17(2.0 / period)}"
    val cb = chain(idx.map(b =>
      s"m$b * ${lit17(math.sin(2.0 * math.Pi * b / period))}")) +
      s" * ${lit17(2.0 / period)}"
    val msq = chain(idx.map(b => s"m$b * m$b")) + s" / ${period.toDouble}"
    s"""WITH hourly AS (SELECT hour(ts) AS b, date_trunc('day', ts) AS d,
       |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
       |perbin AS (SELECT b, avg(cnt) AS m, count(*) AS cr FROM hourly
       |  WHERE b BETWEEN 0 AND ${period - 1} GROUP BY 1),
       |piv AS (SELECT sum(cr)::BIGINT AS n, count(*)::BIGINT AS nb,
       |    $pivDefs FROM perbin),
       |f AS (SELECT n, nb, $mesor AS mesor, $ca AS ca, $cb AS cb,
       |    $msq AS msq FROM piv),
       |g AS (SELECT n, nb, mesor, ca, cb, msq - mesor*mesor AS varb FROM f)
       |SELECT n, round(CASE WHEN nb = $period THEN mesor END, 6) AS mesor,
       |  round(CASE WHEN nb = $period THEN sqrt(ca*ca + cb*cb) END, 6)
       |    AS amplitude,
       |  round(CASE WHEN nb = $period THEN atan2(cb, ca) END, 6) AS phase,
       |  round(CASE WHEN nb = $period AND varb > 0 THEN
       |    (ca*ca + cb*cb)/2.0/varb END, 6) AS var_explained
       |FROM g""".stripMargin
  }

  /** q403's oracle: ntile terciles on the identical (value, doc_id)
    * orderings, then [[graft.operators.StatTests.weightedKappa]]'s literal
    * 9-cell pivot with the same ascending-(i,j) ΣvO/ΣvE folds, generated.
    */
  private def weightedKappaSql(k: Int): String = {
    val idx = 0 until k
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val cells = (for { i <- idx; j <- idx } yield
      s"sum(CASE WHEN ta = ${i + 1} AND tb = ${j + 1} THEN 1 ELSE 0 END) AS o_${i}_$j")
      .mkString(",\n    ")
    val margins = idx.flatMap { i =>
      Seq(chain(idx.map(j => s"o_${i}_$j")) + s" AS ra_$i",
        chain(idx.map(j => s"o_${j}_$i")) + s" AS cb_$i")
    }.mkString(",\n    ")
    val vO = chain(for { i <- idx; j <- idx if i != j } yield
      s"${math.abs(i - j).toDouble} * o_${i}_$j::DOUBLE")
    val vE = chain(for { i <- idx; j <- idx if i != j } yield
      s"${math.abs(i - j).toDouble} * ra_$i::DOUBLE * cb_$j::DOUBLE / n::DOUBLE")
    s"""WITH d AS (SELECT doc_id, n_chars,
       |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> x <> ''))::BIGINT AS n_tokens FROM documents),
       |t AS (SELECT ntile($k) OVER (ORDER BY n_chars, doc_id) AS ta,
       |    ntile($k) OVER (ORDER BY n_tokens, doc_id) AS tb FROM d),
       |piv AS (SELECT count(*)::BIGINT AS n,
       |    $cells FROM t),
       |mg AS (SELECT *,
       |    $margins FROM piv)
       |SELECT n, round(CASE WHEN n > 0 AND ($vE) > 0 THEN
       |  1.0 - ($vO) / ($vE) END, 6) AS kappa_w
       |FROM mg""".stripMargin
  }

  /** q386's oracle: the same md5-parity ±1 counters as
    * [[graft.operators.Sketch.amsF2]], generated with the engine's hash
    * parity contract and the identical fixed-order estimator fold.
    */
  private def amsF2Sql(rows: Int): String = {
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val counters = (0 until rows).map { r =>
      s"sum(cnt * ((('0x' || substr(md5('$r:' || term), 1, 15))::BIGINT % 2) * 2 - 1)) AS c$r"
    }.mkString(",\n    ")
    val est = chain((0 until rows).map(r => s"c$r::DOUBLE * c$r::DOUBLE")) +
      s" / ${rows.toDouble}"
    s"""WITH tf AS (SELECT term, count(*) AS cnt FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
       |      '\\s+'), x -> x <> '')) AS term FROM documents) GROUP BY 1),
       |a AS (SELECT count(*)::BIGINT AS n_items,
       |    sum(cnt*cnt)::BIGINT AS f2_exact,
       |    $counters FROM tf),
       |e AS (SELECT n_items, f2_exact, $est AS est FROM a)
       |SELECT n_items, f2_exact, round(est, 6) AS f2_est,
       |  round(abs(est - f2_exact::DOUBLE)/f2_exact::DOUBLE, 6) AS rel_err
       |FROM e""".stripMargin
  }

  /** q391's oracle: [[graft.operators.StatTests.bartlett]]'s moment pivot
    * with the identical fixed-order Σ(nᵢ−1)Sᵢ² / Σln / Σ1/(nᵢ−1) folds.
    */
  private def bartlettSql(arms: Seq[String]): String = {
    val idx = arms.indices
    val k = arms.size
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val pivDefs = (Seq("count(*) AS n") ++ idx.flatMap { i =>
      Seq(
        s"sum(CASE WHEN event_type = '${arms(i)}' THEN 1 ELSE 0 END) AS n$i",
        s"sum(CASE WHEN event_type = '${arms(i)}' THEN cnt::DOUBLE ELSE 0.0 END) AS s$i",
        s"sum(CASE WHEN event_type = '${arms(i)}' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q$i")
    }).mkString(",\n    ")
    def s2(i: Int) = s"((q$i - s$i*s$i/n$i::DOUBLE)/(n$i::DOUBLE - 1))"
    val sp2 = chain(idx.map(i => s"(n$i::DOUBLE - 1) * ${s2(i)}")) +
      s" / (n::DOUBLE - $k.0)"
    val num = s"(n::DOUBLE - $k.0) * ln($sp2) - " +
      chain(idx.map(i => s"(n$i::DOUBLE - 1) * ln(${s2(i)})"))
    val cFac = s"1.0 + (${chain(idx.map(i => s"1.0/(n$i::DOUBLE - 1)"))}" +
      s" - 1.0/(n::DOUBLE - $k.0)) / ${3.0 * (k - 1)}"
    val ok = idx.map(i => s"n$i >= 2").mkString(" AND ") + " AND " +
      idx.map(i => s"${s2(i)} > 0").mkString(" AND ")
    s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |piv AS (SELECT
       |    $pivDefs FROM daily)
       |SELECT n::BIGINT AS n,
       |  round(CASE WHEN $ok THEN ($num) / ($cFac) END, 6) AS chi2
       |FROM piv""".stripMargin
  }

  /** q380's oracle: the same bounded-node TextRank rounds as
    * [[graft.operators.TextAnalysis.textRank]], unrolled — bigrams from
    * PARALLEL unnests of shifted list slices (DuckDB's generate_series
    * rejects lateral column args), one vote+renormalize CTE pair per
    * round, damping constants emitted with the exact JVM doubles.
    */
  private def textRankSql(topN: Int, iterations: Int, damping: Double): String = {
    def lit17(x: Double): String = "%.17g".format(x)
    val sb = new StringBuilder
    sb.append(
      s"""WITH w AS (SELECT list_filter(regexp_split_to_array(trim(lower(text)),
         |    '\\s+'), x -> x <> '') AS ws FROM documents),
         |wnz AS (SELECT ws FROM w WHERE len(ws) > 0),
         |nf AS (SELECT term, count(*) AS freq FROM (
         |    SELECT unnest(ws) AS term FROM wnz) GROUP BY 1
         |  ORDER BY freq DESC, term LIMIT $topN),
         |bi AS (SELECT unnest(list_slice(ws, 1, len(ws) - 1)) AS a,
         |    unnest(list_slice(ws, 2, len(ws))) AS b
         |  FROM wnz WHERE len(ws) >= 2),
         |bf AS (SELECT least(a, b) AS x, greatest(a, b) AS y, count(*) AS w
         |  FROM bi WHERE a <> b AND a IN (SELECT term FROM nf)
         |    AND b IN (SELECT term FROM nf)
         |  GROUP BY 1, 2),
         |dir AS (SELECT x AS src, y AS dst, w FROM bf
         |  UNION ALL SELECT y, x, w FROM bf),
         |st AS (SELECT src, sum(w) AS wsrc FROM dir GROUP BY 1),
         |dd AS (SELECT d.src, d.dst, d.w, st.wsrc FROM dir d JOIN st USING (src)),
         |it0 AS (SELECT term, 1.0 AS s FROM nf)""".stripMargin)
    for (t <- 1 to iterations) {
      sb.append(s""",
        |v$t AS (SELECT dd.dst AS term,
        |    sum(dd.w::DOUBLE/dd.wsrc::DOUBLE * p.s) AS vin
        |  FROM dd JOIN it${t - 1} p ON dd.src = p.term GROUP BY 1),
        |it$t AS (SELECT nf.term,
        |    ${lit17(1.0 - damping)} + ${lit17(damping)} * coalesce(v$t.vin, 0.0) AS s
        |  FROM nf LEFT JOIN v$t USING (term))""".stripMargin)
    }
    sb.append(s"""
      |SELECT nf.term, nf.freq::BIGINT AS freq, round(it$iterations.s, 6) AS score
      |FROM nf JOIN it$iterations USING (term) ORDER BY 1""".stripMargin)
    sb.toString
  }

  /** q376's oracle: the [[graft.operators.StatTests.moodMedian]] explicit
    * lower-middle order statistic plus the 2×k χ² cells, generated so the
    * per-arm (above, not-above) terms fold in the identical ascending-arm
    * order.
    */
  private def moodMedianSql(arms: Seq[String]): String = {
    val idx = arms.indices
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val aDefs = idx.flatMap { i =>
      Seq(
        s"sum(CASE WHEN arm = '${arms(i)}' AND v > (SELECT median FROM med) THEN 1 ELSE 0 END) AS a$i",
        s"sum(CASE WHEN arm = '${arms(i)}' THEN 1 ELSE 0 END) AS t$i")
    }.mkString(",\n    ")
    val aTot = chain(idx.map(i => s"a$i"))
    val terms = idx.map { i =>
      val ea = s"(t$i::DOUBLE * at::DOUBLE / n::DOUBLE)"
      val eb = s"(t$i::DOUBLE * (n - at)::DOUBLE / n::DOUBLE)"
      val oa = s"a$i::DOUBLE"
      val ob = s"(t$i - a$i)::DOUBLE"
      s"(($oa - $ea)*($oa - $ea)/$ea + ($ob - $eb)*($ob - $eb)/$eb)"
    }
    val ok = idx.map(i => s"t$i >= 1").mkString(" AND ") +
      " AND at > 0 AND at < n"
    s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |b AS (SELECT event_type AS arm, cnt::DOUBLE AS v FROM daily),
       |r AS (SELECT arm, v, row_number() OVER (ORDER BY v, arm) AS rn,
       |    count(*) OVER () AS n FROM b),
       |med AS (SELECT v AS median FROM r
       |  WHERE rn = floor((n + 1)::DOUBLE/2.0)::BIGINT),
       |a AS (SELECT count(*)::BIGINT AS n,
       |    $aDefs FROM b),
       |c AS (SELECT *, $aTot AS at FROM a)
       |SELECT n, (SELECT median FROM med) AS median,
       |  round(CASE WHEN $ok THEN ${chain(terms)} END, 6) AS chi2
       |FROM c""".stripMargin
  }

  /** q377's oracle: the same k² literal pivot + fixed-order entropy folds
    * as [[graft.operators.StatTests.markovEntropyRate]], generated so the
    * summation structure is identical in both engines.
    */
  private def markovEntropySql(states: Seq[String]): String = {
    val idx = states.indices
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val pivDefs = (for { i <- idx; j <- idx } yield
      s"sum(CASE WHEN f = '${states(i)}' AND t = '${states(j)}' THEN 1 ELSE 0 END) AS n_${i}_$j")
      .mkString(",\n    ")
    val niDefs = idx.map(i =>
      chain(idx.map(j => s"n_${i}_$j")) + s" AS ni_$i").mkString(",\n    ")
    val nTot = chain(idx.map(i => s"ni_$i"))
    val h = chain(idx.map { i =>
      val inner = chain(idx.map { j =>
        s"CASE WHEN n_${i}_$j > 0 THEN -(n_${i}_$j::DOUBLE/ni_$i::DOUBLE)" +
          s" * ln(n_${i}_$j::DOUBLE/ni_$i::DOUBLE) ELSE 0.0 END"
      })
      s"CASE WHEN ni_$i > 0 THEN (ni_$i::DOUBLE/($nTot)::DOUBLE) * ($inner) ELSE 0.0 END"
    })
    s"""WITH tr AS (SELECT event_type AS f,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
       |  FROM events WHERE event_type IS NOT NULL),
       |tt AS (SELECT f, t FROM tr WHERE t IS NOT NULL),
       |piv AS (SELECT
       |    $pivDefs FROM tt),
       |ni AS (SELECT *,
       |    $niDefs FROM piv),
       |hh AS (SELECT ($nTot)::BIGINT AS n_transitions, $h AS h FROM ni)
       |SELECT n_transitions, round(h, 6) AS entropy_rate,
       |  round(exp(h), 6) AS perplexity FROM hh""".stripMargin
  }

  /** q378's oracle: the [[graft.operators.StatTests.tukeyHsd]] moment
    * pivot and the k(k−1)/2 Tukey–Kramer pair rows, generated with the
    * identical fixed-order SSW fold.
    */
  private def tukeyHsdSql(arms: Seq[String]): String = {
    val idx = arms.indices
    val k = arms.size
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val pivDefs = (Seq("count(*) AS n") ++ idx.flatMap { i =>
      Seq(
        s"sum(CASE WHEN event_type = '${arms(i)}' THEN 1 ELSE 0 END) AS n$i",
        s"sum(CASE WHEN event_type = '${arms(i)}' THEN cnt::DOUBLE ELSE 0.0 END) AS s$i",
        s"sum(CASE WHEN event_type = '${arms(i)}' THEN cnt::DOUBLE*cnt::DOUBLE ELSE 0.0 END) AS q$i")
    }).mkString(",\n    ")
    val ssw = chain(idx.map(i => s"(q$i - s$i*s$i/n$i::DOUBLE)"))
    val pairSelects = (for { i <- idx; j <- idx if i < j } yield
      s"""SELECT '${arms(i)}' AS arm_a, '${arms(j)}' AS arm_b,
         |  round(s$i/n$i::DOUBLE, 6) AS mean_a,
         |  round(s$j/n$j::DOUBLE, 6) AS mean_b,
         |  round(CASE WHEN n$i >= 1 AND n$j >= 1 AND n > $k AND msw > 0 THEN
         |    abs(s$i/n$i::DOUBLE - s$j/n$j::DOUBLE)
         |      / sqrt(msw/2.0 * (1.0/n$i::DOUBLE + 1.0/n$j::DOUBLE)) END, 6)
         |    AS q_stat FROM m""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |piv AS (SELECT
       |    $pivDefs FROM daily),
       |m AS (SELECT *, ($ssw)/(n - $k)::DOUBLE AS msw FROM piv),
       |u AS (
       |  $pairSelects)
       |SELECT * FROM u ORDER BY arm_a, arm_b""".stripMargin
  }

  /** q369's oracle: the same pivoted Jacobi MM rounds as
    * [[graft.operators.StatTests.bradleyTerry]], unrolled — one CTE pair
    * (q-step, renormalize) per iteration, with every Σ a fixed left-assoc
    * chain in ascending item order so both engines fold identically.
    */
  private def btSql(types: Seq[String], iterations: Int): String = {
    val k = types.size
    val idx = types.indices
    def chain(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val wDefs = (for { i <- idx; j <- idx if i != j } yield
      s"coalesce(max(CASE WHEN i = '${types(i)}' AND j = '${types(j)}' THEN w END), 0.0) AS w_${i}_$j")
      .mkString(",\n    ")
    val wiDefs = idx.map { i =>
      chain(idx.filter(_ != i).map(j => s"w_${i}_$j")) + s" AS bw_$i"
    }.mkString(",\n    ")
    val p0 = idx.map(i => s"${1.0 / k} AS p0_$i").mkString(", ")
    val sb = new StringBuilder
    sb.append(
      s"""WITH daily AS (SELECT event_type AS t, date_trunc('day', ts) AS d,
         |    count(*) AS cnt FROM events GROUP BY 1, 2),
         |pw AS (SELECT a.t AS i, b.t AS j,
         |    sum(CASE WHEN a.cnt > b.cnt THEN 1 ELSE 0 END)::DOUBLE AS w
         |  FROM daily a JOIN daily b ON a.d = b.d AND a.t <> b.t
         |  GROUP BY 1, 2),
         |piv AS (SELECT
         |    $wDefs,
         |    sum(w) AS tot FROM pw),
         |it0 AS (SELECT *,
         |    $wiDefs,
         |    $p0 FROM piv)""".stripMargin)
    for (t <- 1 to iterations) {
      val qDefs = idx.map { i =>
        val denom = chain(idx.filter(_ != i).map(j =>
          s"(w_${i}_$j + w_${j}_$i)/(p${t - 1}_$i + p${t - 1}_$j)"))
        s"CASE WHEN $denom > 0 THEN bw_$i/($denom) ELSE p${t - 1}_$i END AS q${t}_$i"
      }.mkString(",\n    ")
      val total = chain(idx.map(i => s"q${t}_$i"))
      val pDefs = idx.map(i => s"q${t}_$i/($total) AS p${t}_$i").mkString(",\n    ")
      sb.append(s""",
        |q$t AS (SELECT *,
        |    $qDefs FROM it${t - 1}),
        |it$t AS (SELECT *,
        |    $pDefs FROM q$t)""".stripMargin)
    }
    val outs = idx.map(i =>
      s"round(p${iterations}_$i, 6) AS p_${types(i)}").mkString(", ")
    sb.append(s"""
      |SELECT $outs, tot::BIGINT AS n_comparisons FROM it$iterations""".stripMargin)
    sb.toString
  }

  /** q282's oracle: the aggregated-variance Hurst replay. The ln-m design
    * constants (Σln m, Σ(ln m)²) are computed ONCE here in JVM doubles and
    * injected into the SQL as 17-significant-digit literals, so both
    * engines combine the per-m ln-variances with bit-identical design
    * constants (the [[graft.operators.Governance.BenfordExpected]]
    * shared-constant pattern).
    */
  private def hurstSql: String = {
    val ms = Seq(1, 2, 4)
    val bucketSec = 86400L
    val lnM = ms.map(m => math.log(m.toDouble))
    def lit17(x: Double): String = "%.17g".format(x)
    val blocks = ms.zipWithIndex.map { case (m, i) =>
      s"""b$i AS (SELECT event_type, idx // $m AS b, sum(v) AS s, count(*) AS c
         |  FROM h GROUP BY 1, 2),
         |g$i AS (SELECT event_type, count(*)::DOUBLE AS k$i,
         |    sum(s/c::DOUBLE) AS sm$i, sum((s/c::DOUBLE)*(s/c::DOUBLE)) AS ssm$i
         |  FROM b$i WHERE c = $m GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val lnV = ms.indices.map(i => s"ln((ssm$i - sm$i*sm$i/k$i)/(k$i - 1))")
    val valid = ms.indices.map(i =>
      s"k$i >= 2 AND (ssm$i - sm$i*sm$i/k$i) > 0").mkString(" AND ")
    val sy = lnV.foldLeft("0.0")((acc, v) => s"($acc + $v)")
    val sxy = ms.indices.foldLeft("0.0")((acc, i) =>
      s"($acc + ${lit17(lnM(i))} * ${lnV(i)})")
    val (sx, sxx) = (lit17(lnM.sum), lit17(lnM.map(x => x * x).sum))
    val p = s"${ms.length}.0"
    val joins = ms.indices.tail.map(i => s"JOIN g$i USING (event_type)").mkString(" ")
    val gcols = ms.indices.map(i => s"k$i, sm$i, ssm$i").mkString(", ")
    s"""WITH h AS (SELECT event_type, floor(epoch(ts))::BIGINT // $bucketSec AS idx,
       |    count(*)::DOUBLE AS v FROM events GROUP BY 1, 2),
       |$blocks,
       |j AS (SELECT g0.event_type, $gcols FROM g0 $joins),
       |s AS (SELECT event_type, k0,
       |    CASE WHEN $valid THEN
       |      (($sxy) - $sx * ($sy) / $p) / ($sxx - $sx * $sx / $p) END AS slope
       |  FROM j)
       |SELECT event_type, k0::BIGINT AS n_blocks, round(slope, 6) AS slope,
       |  round(CASE WHEN slope IS NOT NULL THEN 1.0 + slope / 2 END, 6) AS hurst
       |FROM s ORDER BY 1""".stripMargin
  }

  /** q221's oracle: the same bounded-round k-core peel as
    * [[graft.operators.Graph.kCore]], unrolled — round i restricts the
    * edge set to vertices whose round-(i−1) degree cleared k.
    */
  private def kcoreSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT count(*) FROM documents) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 3) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id // 2) FROM documents),
        |u0 AS (SELECT DISTINCT least(s, t) AS x, greatest(s, t) AS y FROM raw WHERE s <> t)""".stripMargin)
    for (i <- 0 until rounds) {
      sb.append(s""",
        |d$i AS (SELECT v, count(*) AS deg FROM (
        |  SELECT x AS v FROM u$i UNION ALL SELECT y FROM u$i) GROUP BY 1),
        |k$i AS (SELECT v FROM d$i WHERE deg >= $k),
        |u${i + 1} AS (SELECT u$i.x, u$i.y FROM u$i
        |  JOIN k$i a ON a.v = u$i.x JOIN k$i b ON b.v = u$i.y)""".stripMargin)
    }
    sb.append(s"""
      |SELECT v, count(*) AS degree FROM (
      |  SELECT x AS v FROM u$rounds UNION ALL SELECT y FROM u$rounds) GROUP BY 1
      |HAVING count(*) >= $k ORDER BY v""".stripMargin)
    sb.toString
  }

  /** q217's oracle: the digit histogram joined to the SAME 12-dp expected-
    * share literals the engine uses ([[graft.operators.Governance.BenfordExpected]]) —
    * generated so one constant table serves both engines.
    */
  private def benfordSql: String = {
    val values = graft.operators.Governance.BenfordExpected
      .map { case (d, e) => s"($d, $e)" }.mkString(", ")
    s"""WITH exp(digit, expected_share) AS (VALUES $values),
       |c AS (SELECT substr((n_chars::BIGINT)::VARCHAR, 1, 1)::INT AS digit,
       |    count(*) AS cnt FROM documents WHERE n_chars >= 1 GROUP BY 1),
       |tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM c)
       |SELECT e.digit, coalesce(c.cnt, 0)::BIGINT AS cnt,
       |  coalesce(c.cnt, 0)::DOUBLE / tot.n_total::DOUBLE AS share,
       |  e.expected_share,
       |  (coalesce(c.cnt, 0)::DOUBLE - e.expected_share * tot.n_total::DOUBLE)
       |    * (coalesce(c.cnt, 0)::DOUBLE - e.expected_share * tot.n_total::DOUBLE)
       |    / (e.expected_share * tot.n_total::DOUBLE) AS chi2_term
       |FROM exp e LEFT JOIN c USING (digit), tot
       |ORDER BY e.digit""".stripMargin
  }

  /** q211's oracle: ACF per lag 1..36 via windowed lag + corr, argmax on
    * the 6-dp-rounded value with the smaller lag winning ties (the
    * cross-engine rank-cut rule). Generated — 36 stacked UNION ALL arms.
    */
  private def seasonDetectSql: String = {
    val lags = 1 to 36
    val lagCols = lags.map(k => s"lag(cnt, $k) OVER w AS l$k").mkString(", ")
    val arms = lags.map(k =>
      s"SELECT event_type, $k AS prd, round(corr(cnt, l$k), 6) AS r FROM l GROUP BY 1")
      .mkString(" UNION ALL ")
    s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
       |    count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
       |l AS (SELECT event_type, cnt, $lagCols FROM h
       |      WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
       |a AS ($arms),
       |rk AS (SELECT event_type, prd, r, row_number()
       |    OVER (PARTITION BY event_type ORDER BY r DESC, prd) AS rn
       |  FROM a WHERE r IS NOT NULL)
       |SELECT event_type, prd AS period, r AS acf FROM rk WHERE rn = 1
       |ORDER BY event_type""".stripMargin
  }

  /** Exact integer bit-length of the 52-bit remainder `r` as a SQL CASE
    * chain (`WHEN r >= 2^51 THEN 52 … WHEN r >= 1 THEN 1`) — avoids float
    * log2 whose rounding could disagree with the JVM's
    * `numberOfLeadingZeros` at powers-of-two boundaries.
    */
  private def hllBitlenCase: String =
    (51 to 0 by -1).map(bit => s"WHEN r >= ${1L << bit} THEN ${bit + 1}").mkString(" ")
}
