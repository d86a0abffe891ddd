package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.functions.Hier
import graft.operators.{Conformal, CrossVal, Dedup, Encoding, Ewma, Features, GapFill, Hist, Intervals, Metrics, Multimodal, Profile, Rollup, Sax, Scalers, Similarity, TextAnalysis}
import graft.EntryHelpers._

/** SparkEntry queries q372–q437 with their DuckDB oracle twins,
  * split from the former single-file map (round-4 maintainability item:
  * entries and oracles live side by side per file so a mispaired oracle
  * is caught by the duplicate/coverage checks in [[SparkEntry]]).
  */
private[graft] object EntriesQ372 extends EntryPart {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
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
  )

  val oracles: Seq[(String, String)] = Seq(
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
  )
}
