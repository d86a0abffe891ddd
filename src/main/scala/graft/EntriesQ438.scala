package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.functions.Hier
import graft.operators.{Conformal, CrossVal, Dedup, Encoding, Ewma, Features, GapFill, Hist, Intervals, Metrics, Multimodal, Profile, Rollup, Sax, Scalers, Similarity, TextAnalysis}
import graft.EntryHelpers._

/** SparkEntry queries q438–q518 with their DuckDB oracle twins,
  * split from the former single-file map (round-4 maintainability item:
  * entries and oracles live side by side per file so a mispaired oracle
  * is caught by the duplicate/coverage checks in [[SparkEntry]]).
  */
private[graft] object EntriesQ438 extends EntryPart {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
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
    }),

    // banded DTW distance from each user's LAST-7-day series to a fixed
    // reference pattern — the pattern-similarity triage read at the tier
    // grain. Bounding the window to exactly ref-length points makes the
    // Sakoe-Chiba DP a fixed small grid, so the previously spec-only DTW
    // fold gains a full DuckDB oracle (dtwRefSql unrolls the same DP
    // cell-for-cell as lateral aliases). Daily sums run in integer cents
    // (the q148 determinism discipline); every DP op is the identical
    // |a-b|/least/+ tree in both engines.
    "q513_dtw_reference" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d").desc)
      val last7 = daily.withColumn("_rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") <= 7)
      val eligible = last7.groupBy(col("user_id"))
        .agg(count(lit(1)).as("_c")).filter(col("_c") === 7)
        .select("user_id")
      graft.operators.Similarity.dtwToReference(
          last7.join(eligible, "user_id"), Seq("user_id"), "d", "v",
          reference = Seq(50.0, 75.0, 100.0, 125.0, 100.0, 75.0, 50.0),
          band = 2)
        .select(col("user_id"), r6(col("dtw")).as("dtw"), col("n_points"))
        .orderBy("user_id")
    }),

    // isotonic (PAVA) monotone calibration of per-bin event counts vs the
    // value-score bin — the previously spec-only pooling recursion gains a
    // DuckDB oracle through the PAVA minimax identity
    // fitted_i = max_{j<=i} min_{k>=i} mean(y_j..y_k), a closed form over
    // prefix sums. EXACTNESS: y is integer counts and w = 1, so with pava
    // carrying exact block sums every block mean is the correctly-rounded
    // rational S/len; candidate means are rationals with denominator <= 21
    // whose distinct values differ by >= 1/441 (>> ulp at count scale), so
    // both engines' min/max pick the identical double — bit-equal before
    // the 6-dp round
    "q514_isotonic" -> ((s, dir) => {
      val binned = ev(s, dir)
        .filter(col("value").isNotNull && col("value") >= 0)
        .withColumn("bin",
          least(floor(col("value") / lit(5.0)).cast("double"), lit(20.0)))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.operators.Isotonic.fitFrame(binned, Seq("event_type"), "bin", "cnt")
        .select(col("event_type"), col("x"), r6(col("y_fit")).as("y_fit"))
        .orderBy("event_type", "x")
    }),

    // dHash image near-dup DECISION layer (banding + Hamming verify) over
    // PRECOMPUTED hash literals — the decode itself is oracle-invisible
    // (DuckDB cannot read images; q60 + MultimodalSpec cover it), but the
    // candidate generation and verify are pure integer algebra a DuckDB
    // twin replays exactly (the q513/q514 closing move). Fixture: each
    // doc_id < 1200 gets a 64-bit hash whose four 16-bit bands are
    // affine-mod values (odd multipliers => bijections mod 2^16, so
    // DISTINCT ids never collide on any band); every 7th id gets a mutant
    // copy with band-0 bits flipped — 2 bits (accepted, hamming 2) or,
    // every 14th, 10 bits (candidate found via bands 1-3 but REJECTED by
    // the hamming cut). Exercises banding, multi-band candidate dedup
    // (each pair surfaces in 3 bands -> distinct), and the verify filter.
    "q515_image_neardup_decision" -> ((s, dir) => {
      val ids = docs(s, dir).filter(col("doc_id") < 1200)
        .select(col("doc_id").cast("long").as("doc_id"))
      def band(mult: Long, add: Long, mod: Long) =
        pmod(col("doc_id") * lit(mult) + lit(add), lit(mod))
      val h = band(40503L, 1299721L, 65536L) +
        band(2654435761L, 97L, 65536L) * lit(65536L) +
        band(11400714819323L, 12345L, 65536L) * lit(4294967296L) +
        band(2246822519L, 7L, 32768L) * lit(281474976710656L)
      val base = ids.select(
        concat(lit("d"), col("doc_id")).as("img_id"), h.as("dhash"),
        col("doc_id"))
      val mut = base.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(concat(lit("m"), col("doc_id")).as("img_id"),
          col("dhash").bitwiseXOR(
            when(pmod(col("doc_id"), lit(14)) === 7, lit(23387L))
              .otherwise(lit(3L))).as("dhash"))
      val hashes = base.select("img_id", "dhash").union(mut)
      graft.operators.Multimodal.nearDupImages(hashes, "img_id",
          maxHamming = 8)
        .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"),
          col("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // rolling-origin model selection COMPOSED (r5): the reference's
    // cross_validate + grid-search DECISION layer (which model for which
    // series) over the engine's own forecaster family — 3 candidates
    // (drift, SES α=0.3, seasonal-naive m=7) × 2 weekly fold boundaries
    // on the daily integer-cents series; forecasts clipped to each
    // fold's held-out region, sMAPE pooled across folds, per-user winner
    // ranked on the 6-dp grid with model-name tie-break (the rank-cut
    // discipline). The oracle replays all three forecasters (q73/q74/q79
    // logic) per fold prefix and the identical scoring tail.
    "q516_model_select" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("v"))
      val f = graft.operators.Forecast
      val cands: Seq[(String, DataFrame => DataFrame)] = Seq(
        ("drift", (t: DataFrame) => f.drift(t, Seq("user_id"), "d", "v",
          horizon = 7, stepSeconds = 86400L)),
        ("ses_a03", (t: DataFrame) => f.ses(t, Seq("user_id"), "d", "v",
          alpha = 0.3, horizon = 7, stepSeconds = 86400L)),
        ("snaive_7", (t: DataFrame) => f.seasonalNaive(t, Seq("user_id"),
          "d", "v", period = 7, horizon = 7, stepSeconds = 86400L)))
      f.rollingOriginSelect(daily, Seq("user_id"), "d", "v", cands,
          Seq(java.sql.Timestamp.valueOf("2024-01-17 00:00:00"),
            java.sql.Timestamp.valueOf("2024-01-24 00:00:00")))
        .select(col("user_id"), col("model"), col("n_eval"),
          r6(col("smape")).as("smape"), col("rank"), col("is_best"))
        .orderBy("user_id", "model")
    }),

    // per-row linear SHAP (r5): the reference's interpret layer for the
    // model family the engine fits — exact closed-form φ_j = β_j·(x_j−x̄_j)
    // per user for daily value vs (day number, weekend flag). Integer
    // features × integer-cents target ⇒ every moment/co-moment is an
    // exact long; β and φ are fixed double trees over exact operands
    // (bit-identical cross-engine; note Spark dayofweek is 1=Sunday,
    // DuckDB's is 0=Sunday — the oracle shifts accordingly).
    "q517_linear_shap" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("vc"))
        .withColumn("x1", expr("unix_timestamp(d) div 86400"))
        .withColumn("x2",
          when(dayofweek(col("d")).isin(1, 7), lit(1L)).otherwise(lit(0L)))
      graft.operators.Interpret.linearShap2(daily, Seq("user_id"),
          "x1", "x2", "vc", scale = 100L)
        .select(col("user_id"), unix_timestamp(col("d")).as("d_s"),
          r6(col("bias")).as("bias"), r6(col("phi_1")).as("phi_1"),
          r6(col("phi_2")).as("phi_2"), r6(col("yhat")).as("yhat"),
          r6(col("resid")).as("resid"))
        .orderBy("user_id", "d_s")
    }),

    // the importance-plot readout over q517's attribution: mean |φ| per
    // user and feature (exposure-class-3 double mean, r6-bounded)
    "q518_shap_importance" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("vc"))
        .withColumn("x1", expr("unix_timestamp(d) div 86400"))
        .withColumn("x2",
          when(dayofweek(col("d")).isin(1, 7), lit(1L)).otherwise(lit(0L)))
      val att = graft.operators.Interpret.linearShap2(daily, Seq("user_id"),
        "x1", "x2", "vc", scale = 100L)
      graft.operators.Interpret.shapImportance(att, Seq("user_id"))
        .select(col("user_id"), col("feature"),
          r6(col("importance")).as("importance"), col("n"))
        .orderBy("user_id", "feature")
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
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
        |WHERE i.inter::DOUBLE / sz.n >= 0.05 ORDER BY 1, 2""".stripMargin,

    // last-7 pivot (rn=7 is the oldest -> x1), then the banded DTW DP
    // unrolled by dtwRefSql (same cell order and op tree as the Scala DP)
    "q513_dtw_reference" ->
      s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) / 100.0 AS v
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT user_id, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rn
        |  FROM daily),
        |l7 AS (SELECT user_id, v, rn FROM rk WHERE rn <= 7),
        |el AS (SELECT user_id FROM l7 GROUP BY 1 HAVING count(*) = 7),
        |pv AS (SELECT l7.user_id,
        |${(1 to 7).map(i => s"    max(CASE WHEN rn = ${8 - i} THEN v END) AS x$i")
             .mkString("", ",\n|", "")}
        |  FROM l7 JOIN el USING (user_id) GROUP BY 1),
        |dp AS (${dtwRefSql(Seq(50.0, 75.0, 100.0, 125.0, 100.0, 75.0, 50.0), band = 2)})
        |SELECT user_id, round(dtwv, 6) AS dtw, 7::BIGINT AS n_points
        |FROM dp ORDER BY user_id""".stripMargin,

    // PAVA via the minimax identity: mu(j,k) = (S_k - S_{j-1})/(k - j + 1)
    // over consecutive positions, fitted_i = max_{j<=i} min_{k>=i} mu
    "q514_isotonic" ->
      """WITH b AS (SELECT event_type, least(floor(value/5), 20)::DOUBLE AS bin,
        |    count(*)::DOUBLE AS y
        |  FROM events WHERE value IS NOT NULL AND value >= 0 GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY bin) AS i,
        |    sum(y) OVER (PARTITION BY event_type ORDER BY bin) AS S FROM b),
        |m AS (SELECT s.event_type, s.i AS j, e.i AS k,
        |    (e.S - coalesce(p.S, 0)) / (e.i - s.i + 1) AS mu
        |  FROM c s JOIN c e ON e.event_type = s.event_type AND e.i >= s.i
        |  LEFT JOIN c p ON p.event_type = s.event_type AND p.i = s.i - 1),
        |inn AS (SELECT m.event_type, m.j, ix.i, min(m.mu) AS v
        |  FROM m JOIN c ix ON ix.event_type = m.event_type
        |    AND m.j <= ix.i AND m.k >= ix.i
        |  GROUP BY 1, 2, 3),
        |f AS (SELECT event_type, i, max(v) AS fit FROM inn GROUP BY 1, 2)
        |SELECT c.event_type, c.bin AS x, round(f.fit, 6) AS y_fit
        |FROM f JOIN c ON c.event_type = f.event_type AND c.i = f.i
        |ORDER BY 1, 2""".stripMargin,

    // same affine-mod hash fixture, 4-band LSH via unnest, shared-band
    // equi-join, pair dedup, bit_count(xor) Hamming verify — all integer
    // algebra, exact in both engines
    "q515_image_neardup_decision" ->
      """WITH ids AS (SELECT doc_id::BIGINT AS doc_id FROM documents
        |  WHERE doc_id < 1200),
        |base AS (SELECT 'd' || doc_id AS img_id,
        |    (doc_id * 40503 + 1299721) % 65536
        |    + ((doc_id * 2654435761 + 97) % 65536) * 65536
        |    + ((doc_id * 11400714819323 + 12345) % 65536) * 4294967296
        |    + ((doc_id * 2246822519 + 7) % 32768) * 281474976710656 AS dhash,
        |    doc_id
        |  FROM ids),
        |mut AS (SELECT 'm' || doc_id AS img_id,
        |    xor(dhash, CASE WHEN doc_id % 14 = 7 THEN 23387 ELSE 3 END) AS dhash
        |  FROM base WHERE doc_id % 7 = 0),
        |h AS (SELECT img_id, dhash FROM base
        |  UNION ALL SELECT img_id, dhash FROM mut),
        |banded AS (SELECT img_id, dhash, band,
        |    (dhash >> (band * 16)) & 65535 AS key
        |  FROM h, unnest([0, 1, 2, 3]) AS t(band)),
        |cand AS (SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b,
        |    a.dhash AS h_a, b.dhash AS h_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.img_id < b.img_id)
        |SELECT id_a, id_b, h_a, h_b,
        |  bit_count(xor(h_a, h_b))::BIGINT AS hamming
        |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 8
        |ORDER BY 1, 2""".stripMargin,

    // three forecasters replayed per fold prefix (q74 drift, q79 SES
    // closed form, q73 snaive source-lookup), clipped to the held-out
    // region, pooled sMAPE, 6-dp-grid rank with name tie-break
    "q516_model_select" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) / 100.0 AS v
        |  FROM events GROUP BY 1,2),
        |tr AS (SELECT b.bs, dd.user_id, dd.d, dd.v
        |  FROM daily dd, (SELECT unnest([1705449600, 1706054400]) AS bs) b
        |  WHERE epoch(dd.d)::BIGINT < b.bs),
        |pk_dr AS (SELECT bs, user_id, min_by(v, d) AS y1, max_by(v, d) AS yT,
        |    max(d) AS last_d, count(*) AS n FROM tr GROUP BY 1,2),
        |fc_dr AS (SELECT bs, user_id, 'drift' AS model,
        |    epoch(last_d)::BIGINT + g.s*86400 AS fs,
        |    CASE WHEN n > 1 THEN yT + g.s*(yT - y1)/(n - 1) ELSE yT END AS yhat
        |  FROM pk_dr, generate_series(1,7) g(s)),
        |r_se AS (SELECT bs, user_id, d, v,
        |    row_number() OVER (PARTITION BY bs, user_id ORDER BY d) AS rn,
        |    row_number() OVER (PARTITION BY bs, user_id ORDER BY d DESC) - 1 AS back
        |  FROM tr WHERE v IS NOT NULL),
        |lvl AS (SELECT bs, user_id,
        |    sum(CASE WHEN rn = 1 THEN power(0.7, back) * v
        |             ELSE 0.3 * power(0.7, back) * v END) AS level,
        |    max(d) AS last_d FROM r_se GROUP BY 1,2),
        |fc_se AS (SELECT bs, user_id, 'ses_a03' AS model,
        |    epoch(last_d)::BIGINT + g.s*86400 AS fs, level AS yhat
        |  FROM lvl, generate_series(1,7) g(s)),
        |pk_sn AS (SELECT bs, user_id, max(d) AS last_d FROM tr GROUP BY 1,2),
        |f_sn AS (SELECT bs, user_id,
        |    epoch(last_d)::BIGINT + g.s*86400 AS fs,
        |    epoch(last_d)::BIGINT + (g.s - 7*ceil(g.s/7.0))::BIGINT*86400 AS src_s
        |  FROM pk_sn, generate_series(1,7) g(s)),
        |fc_sn AS (SELECT f.bs, f.user_id, 'snaive_7' AS model, f.fs,
        |    t2.v AS yhat
        |  FROM f_sn f LEFT JOIN tr t2
        |    ON f.bs = t2.bs AND f.user_id = t2.user_id
        |    AND epoch(t2.d)::BIGINT = f.src_s),
        |fc AS (SELECT * FROM fc_dr UNION ALL SELECT * FROM fc_se
        |  UNION ALL SELECT * FROM fc_sn),
        |j AS (SELECT fc.user_id, fc.model, fc.yhat, a.v AS y
        |  FROM fc JOIN daily a ON a.user_id = fc.user_id
        |    AND epoch(a.d)::BIGINT = fc.fs
        |  WHERE fc.fs >= fc.bs AND fc.yhat IS NOT NULL),
        |sc AS (SELECT user_id, model, count(*) AS n_eval,
        |    sum(abs(y - yhat)) AS sae, sum(abs(y) + abs(yhat)) AS sden
        |  FROM j GROUP BY 1,2),
        |rk AS (SELECT user_id, model, n_eval,
        |    CASE WHEN sden > 0 THEN 2.0 * sae / sden END AS smape FROM sc),
        |fin AS (SELECT user_id, model, n_eval, smape,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY floor(smape * 1e6 + 0.5) ASC NULLS LAST, model) AS rank
        |  FROM rk)
        |SELECT user_id, model, n_eval, round(smape, 6) AS smape,
        |  rank, rank = 1 AS is_best
        |FROM fin ORDER BY 1, 2""".stripMargin,

    // exact normal equations over integer moments, then the fixed double
    // tree b·(x − s/n) — the verbatim twin of Interpret.linearShap2
    // (DuckDB dayofweek is 0=Sunday where Spark's is 1=Sunday)
    "q517_linear_shap" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) AS vc
        |  FROM events GROUP BY 1,2),
        |b AS (SELECT user_id, d, vc,
        |    epoch(d)::BIGINT // 86400 AS x1,
        |    CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS x2
        |  FROM daily),
        |m AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
        |    sum(x1*x1)::BIGINT AS s11, sum(x1*x2)::BIGINT AS s12,
        |    sum(x2*x2)::BIGINT AS s22, sum(vc)::BIGINT AS sy,
        |    sum(x1*vc)::BIGINT AS s1y, sum(x2*vc)::BIGINT AS s2y
        |  FROM b GROUP BY 1),
        |c AS (SELECT user_id, n, s1, s2, sy,
        |    n*s11 - s1*s1 AS c11, n*s22 - s2*s2 AS c22,
        |    n*s12 - s1*s2 AS c12, n*s1y - s1*sy AS c1y,
        |    n*s2y - s2*sy AS c2y
        |  FROM m),
        |fit AS (SELECT user_id, n, s1, s2, sy,
        |    CASE WHEN n >= 3 AND c11 > 0 AND c22 > 0
        |        AND c11*c22 - c12*c12 <> 0
        |      THEN (c22*c1y - c12*c2y)::DOUBLE
        |        / (c11*c22 - c12*c12)::DOUBLE END AS b1,
        |    CASE WHEN n >= 3 AND c11 > 0 AND c22 > 0
        |        AND c11*c22 - c12*c12 <> 0
        |      THEN (c11*c2y - c12*c1y)::DOUBLE
        |        / (c11*c22 - c12*c12)::DOUBLE END AS b2
        |  FROM c),
        |att AS (SELECT b.user_id, b.d, b.vc,
        |    fit.sy::DOUBLE / (100 * fit.n) AS bias,
        |    fit.b1 * (b.x1::DOUBLE - fit.s1 / fit.n) / 100.0 AS p1,
        |    fit.b2 * (b.x2::DOUBLE - fit.s2 / fit.n) / 100.0 AS p2
        |  FROM b JOIN fit USING (user_id))
        |SELECT user_id, floor(epoch(d))::BIGINT AS d_s,
        |  round(bias, 6) AS bias, round(p1, 6) AS phi_1,
        |  round(p2, 6) AS phi_2, round(bias + p1 + p2, 6) AS yhat,
        |  round(vc / 100.0 - (bias + p1 + p2), 6) AS resid
        |FROM att ORDER BY 1, 2""".stripMargin,

    // mean |phi| per user and feature over the q517 attribution
    "q518_shap_importance" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT) AS vc
        |  FROM events GROUP BY 1,2),
        |b AS (SELECT user_id, d, vc,
        |    epoch(d)::BIGINT // 86400 AS x1,
        |    CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS x2
        |  FROM daily),
        |m AS (SELECT user_id, count(*)::BIGINT AS n,
        |    sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
        |    sum(x1*x1)::BIGINT AS s11, sum(x1*x2)::BIGINT AS s12,
        |    sum(x2*x2)::BIGINT AS s22, sum(vc)::BIGINT AS sy,
        |    sum(x1*vc)::BIGINT AS s1y, sum(x2*vc)::BIGINT AS s2y
        |  FROM b GROUP BY 1),
        |c AS (SELECT user_id, n, s1, s2, sy,
        |    n*s11 - s1*s1 AS c11, n*s22 - s2*s2 AS c22,
        |    n*s12 - s1*s2 AS c12, n*s1y - s1*sy AS c1y,
        |    n*s2y - s2*sy AS c2y
        |  FROM m),
        |fit AS (SELECT user_id, n, s1, s2,
        |    CASE WHEN n >= 3 AND c11 > 0 AND c22 > 0
        |        AND c11*c22 - c12*c12 <> 0
        |      THEN (c22*c1y - c12*c2y)::DOUBLE
        |        / (c11*c22 - c12*c12)::DOUBLE END AS b1,
        |    CASE WHEN n >= 3 AND c11 > 0 AND c22 > 0
        |        AND c11*c22 - c12*c12 <> 0
        |      THEN (c11*c2y - c12*c1y)::DOUBLE
        |        / (c11*c22 - c12*c12)::DOUBLE END AS b2
        |  FROM c),
        |att AS (SELECT b.user_id,
        |    fit.b1 * (b.x1::DOUBLE - fit.s1 / fit.n) / 100.0 AS p1,
        |    fit.b2 * (b.x2::DOUBLE - fit.s2 / fit.n) / 100.0 AS p2
        |  FROM b JOIN fit USING (user_id)),
        |u AS (SELECT user_id, 'phi_1' AS feature, p1 AS p FROM att
        |  UNION ALL SELECT user_id, 'phi_2', p2 FROM att)
        |SELECT user_id, feature,
        |  round(sum(abs(p)) / count(*), 6) AS importance,
        |  count(*)::BIGINT AS n
        |FROM u WHERE p IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
