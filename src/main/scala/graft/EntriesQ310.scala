package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.functions.Hier
import graft.operators.{Conformal, CrossVal, Dedup, Encoding, Ewma, Features, GapFill, Hist, Intervals, Metrics, Multimodal, Profile, Rollup, Sax, Scalers, Similarity, TextAnalysis}
import graft.EntryHelpers._

/** SparkEntry queries q310–q371 with their DuckDB oracle twins,
  * split from the former single-file map (round-4 maintainability item:
  * entries and oracles live side by side per file so a mispaired oracle
  * is caught by the duplicate/coverage checks in [[SparkEntry]]).
  */
private[graft] object EntriesQ310 extends EntryPart {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
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
    // cross-user mean daily profile — the DTW pruning pass.
    // DETERMINISM (r5): runs in lbKeoghExact's integer-cents algebra —
    // the r5 sf0.1 exact-repr sweep caught the double path's squared-
    // exceedance sum straddling a 6-dp boundary (1 of 1500 rows). The
    // reference profile is the cent-quantized mean (floor(sum/n + 0.5)
    // of exact cent sums — a deterministic double floor, identical in
    // both engines), so envelope and exceedance sums are exact longs.
    "q337_lb_keogh" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("vc"))
      val ref = daily.groupBy(col("d"))
        .agg(floor(sum(col("vc")) / count(lit(1)) + 0.5).cast("long")
          .as("rvq"))
      graft.operators.Similarity.lbKeoghExact(daily, Seq("user_id"), "d",
          "vc", ref, "rvq", band = 2, scale = 100L)
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
  )

  val oracles: Seq[(String, String)] = Seq(
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

    // envelope = rolling min/max of the CENT-QUANTIZED mean profile over
    // ±2 days; LB = Σ squared exceedance outside [L, U] — all integer
    // cents (exact in both engines), one division at the end
    "q337_lb_keogh" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) AS vc
        |  FROM events GROUP BY 1, 2),
        |ref AS (SELECT d, floor(sum(vc) / count(*) + 0.5)::BIGINT AS rvq
        |  FROM daily GROUP BY 1),
        |env AS (SELECT d, max(rvq) OVER w AS u, min(rvq) OVER w AS l
        |  FROM ref WINDOW w AS (ORDER BY d
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |j AS (SELECT daily.user_id, daily.vc, env.u, env.l
        |  FROM daily JOIN env USING (d)),
        |a AS (SELECT user_id,
        |    sum(CASE WHEN vc > u THEN (vc-u)*(vc-u)
        |             WHEN vc < l THEN (l-vc)*(l-vc) ELSE 0 END) AS lb,
        |    count(*) AS n_matched
        |  FROM j GROUP BY 1)
        |SELECT user_id, round(lb / 10000.0, 6) AS lb_keogh, n_matched
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
  )
}
