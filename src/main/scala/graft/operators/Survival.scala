package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — the retention /
  * time-to-churn curve with right-censoring, the readout behind "what share
  * of users are still active after t days".
  *
  * Semantics: subjects contribute an integer `duration` and an `eventFlag`
  * (1 = the terminal event was observed, 0 = censored — still alive when
  * observation ended). At each distinct event time t, with n(t) subjects
  * still at risk (duration ≥ t; ties: censored-at-t count as at-risk, the
  * standard convention) and d(t) observed events,
  * `S(t) = Π_{t_j ≤ t} (1 − d(t_j)/n(t_j))`. Rows are emitted at event
  * times only (censor-only times change n but not S).
  *
  * Cross-engine determinism: the cumulative product is exp of an ORDERED
  * running sum of ln factors — fixed accumulation order in any engine (a
  * running window frame, never a shuffled aggregate); each factor is an
  * exact small rational. A zero factor (d = n at some time) short-circuits
  * to S = 0 via an integer flag rather than ln(0) = −∞ arithmetic.
  *
  * Scale: one shuffle to (group, duration) grain, then bounded per-group
  * windows over DISTINCT durations — cost is the duration cardinality per
  * group, independent of subject count.
  */
object Survival {

  def kaplanMeier(df: DataFrame, groupCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val grain = df
      .groupBy((keys :+ col(durationCol).cast("long").as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("n_censored"))
    val byT = Window.partitionBy(keys: _*).orderBy(col("t"))
    val prior = byT.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perG = Window.partitionBy(keys: _*)
    grain
      .withColumn("_total", sum(col("n_event") + col("n_censored")).over(perG))
      .withColumn("n_risk",
        col("_total") - coalesce(
          sum(col("n_event") + col("n_censored")).over(prior), lit(0L)))
      // ordered running sum of ln factors = deterministic cumprod; the
      // integer zero flag handles d = n without ln(0)
      .withColumn("_zero",
        max(when(col("n_event") === col("n_risk"), 1L).otherwise(0L)).over(upTo))
      .withColumn("survival",
        when(col("_zero") === 1L, lit(0.0)).otherwise(exp(sum(
          log(lit(1.0) - col("n_event").cast("double") /
            col("n_risk").cast("double"))).over(upTo))))
      .filter(col("n_event") > 0)
      .select((keys :+ col("t") :+ col("n_risk") :+ col("n_event") :+
        col("n_censored") :+ col("survival")): _*)
  }

  /** Nelson–Aalen cumulative-hazard estimator (Nelson 1972, Aalen 1978):
    * Ĥ(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ over the same right-censored event grain as
    * [[kaplanMeier]] — the additive view of the hazard (KM is the
    * multiplicative view; exp(−Ĥ) is the Fleming–Harrington survival
    * estimate, slightly above KM in small samples). Each term is ONE
    * integer/integer IEEE division and the accumulation is a WINDOW-ordered
    * running sum — fixed order, replayable term for term in any engine
    * (the same discipline as KM's ordered ln sum).
    *
    * Plan: one aggregate to duration grain + three frames over one ordered
    * exchange; cost = duration cardinality per group.
    */
  /** Restricted mean survival time (Royston & Parmar 2013; the integral
    * ∫₀^τ S(t)dt of the [[kaplanMeier]] step curve up to horizon τ) — the
    * "average event-free time in the first τ units" readout that stays
    * defined under heavy censoring where the median survival isn't.
    * Step-function integral: each event time t_i ≤ τ contributes
    * S(t_{i−1})·(t_i − t_{i−1}) (S = 1 before the first event), plus the
    * tail S(t_last)·(τ − t_last). One lag window over the KM event grain +
    * one aggregate. Groups whose first event time exceeds τ are absent
    * (their RMST is trivially τ). Output: (groups..., tau, n_times, rmst).
    */
  def rmst(df: DataFrame, groupCols: Seq[String], durationCol: String,
           eventCol: String, tau: Long): DataFrame = {
    require(tau > 0, s"tau must be > 0, got $tau")
    val keys = groupCols.map(col)
    val km = kaplanMeier(df, groupCols, durationCol, eventCol)
      .filter(col("t") <= tau)
    val w = Window.partitionBy(keys: _*).orderBy(col("t"))
    km.withColumn("_pt", coalesce(lag(col("t"), 1).over(w), lit(0L)))
      .withColumn("_ps", coalesce(lag(col("survival"), 1).over(w), lit(1.0)))
      .withColumn("_seg", col("_ps") * (col("t") - col("_pt")).cast("double"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_times"), sum(col("_seg")).as("_body"),
        max_by(col("survival"), col("t")).as("_lastS"),
        max(col("t")).as("_lastT"))
      .withColumn("tau", lit(tau))
      .withColumn("rmst",
        col("_body") + col("_lastS") * (lit(tau) - col("_lastT")).cast("double"))
      .select((keys :+ col("tau") :+ col("n_times") :+ col("rmst")): _*)
  }

  def nelsonAalen(df: DataFrame, groupCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val grain = df
      .groupBy((keys :+ col(durationCol).cast("long").as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("n_censored"))
    val byT = Window.partitionBy(keys: _*).orderBy(col("t"))
    val prior = byT.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perG = Window.partitionBy(keys: _*)
    grain
      .withColumn("_total", sum(col("n_event") + col("n_censored")).over(perG))
      .withColumn("n_risk", col("_total") -
        coalesce(sum(col("n_event") + col("n_censored")).over(prior), lit(0L)))
      .withColumn("cum_hazard",
        sum(col("n_event").cast("double") / col("n_risk").cast("double"))
          .over(upTo))
      .withColumn("survival_fh", exp(-col("cum_hazard")))
      .filter(col("n_event") > 0) // censor-only times add 0 hazard (as in KM)
      .select((keys :+ col("t") :+ col("n_risk") :+ col("n_event") :+
        col("n_censored") :+ col("cum_hazard") :+ col("survival_fh")): _*)
  }

  /** Log-rank test (Mantel 1966) per group: do segments A and B share a
    * survival curve? Over the POOLED distinct event times,
    *   O₁ = Σ d₁ᵢ,  E₁ = Σ dᵢ·n₁ᵢ/nᵢ,
    *   V  = Σ dᵢ·(n₁ᵢ/nᵢ)·(1 − n₁ᵢ/nᵢ)·(nᵢ − dᵢ)/(nᵢ − 1),
    *   z  = (O₁ − E₁)/√V  (≈ N(0,1) under H₀)
    * — the censoring-correct significance companion to eyeballing two
    * [[kaplanMeier]] curves. Per-segment at-risk counts are computed on a
    * DENSE (pooled time × segment) grid — a segment with no subjects at a
    * time still has a well-defined risk set — via one cumulative window per
    * (group, segment); every Oᵢ/dᵢ/nᵢ is an exact integer.
    * Output: (groups..., o1, e1, var_lr, z, n_times).
    */
  def logRank(df: DataFrame, groupCols: Seq[String], segCol: String,
              segA: String, segB: String, durationCol: String,
              eventCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val both = df.filter(col(segCol).cast("string").isin(segA, segB))
      .withColumn("_sa", (col(segCol).cast("string") === segA).cast("int"))
    val grain = both
      .groupBy((keys :+ col("_sa") :+ col(durationCol).cast("long").as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("_d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("_c"))
    // dense grid: every pooled time × both segments, zero-filled
    val times = grain.select((keys :+ col("t")): _*).distinct()
    val grid = times.withColumn("_sa", explode(array(lit(1), lit(0))))
      .join(grain, groupCols ++ Seq("_sa", "t"), "left")
      .na.fill(0L, Seq("_d", "_c"))
    val wSeg = Window.partitionBy((keys :+ col("_sa")): _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy((keys :+ col("_sa")): _*)
    val risk = grid
      .withColumn("_nrisk", sum(col("_d") + col("_c")).over(wTot) -
        coalesce(sum(col("_d") + col("_c")).over(wSeg), lit(0L)))
    val byTime = risk.groupBy((keys :+ col("t")): _*)
      .agg(sum(when(col("_sa") === 1, col("_d")).otherwise(0L)).as("_d1"),
        sum(when(col("_sa") === 1, col("_nrisk")).otherwise(0L)).as("_n1"),
        sum(col("_d")).as("_dt"), sum(col("_nrisk")).as("_nt"))
      .filter(col("_dt") > 0 && col("_nt") > 0)
    byTime.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_times"),
        sum(col("_d1")).cast("double").as("o1"),
        sum(col("_dt").cast("double") * col("_n1") / col("_nt")).as("e1"),
        sum(when(col("_nt") > 1,
          col("_dt").cast("double") * (col("_n1").cast("double") / col("_nt")) *
            (lit(1.0) - col("_n1").cast("double") / col("_nt")) *
            (col("_nt") - col("_dt")).cast("double") / (col("_nt") - 1))
          .otherwise(lit(0.0))).as("var_lr"))
      .withColumn("z", when(col("var_lr") > 0,
        (col("o1") - col("e1")) / sqrt(col("var_lr"))))
      .select((keys :+ col("o1") :+ col("e1") :+ col("var_lr") :+
        col("z") :+ col("n_times")): _*)
  }

  /** Harrell's concordance index (Harrell 1982) per group: over usable
    * pairs (the earlier duration is an EVENT), the share where the
    * higher-risk prediction belongs to the shorter survivor (prediction
    * ties count half):
    *   C = (concordant + ties/2) / usable ∈ [0, 1],  0.5 = random
    * — THE discrimination metric for survival/churn models. Integer pair
    * counts + one division (cross-engine exact). O(n²) per group — the
    * [[graft.operators.Robust.theilSenSlope]] bounded contract (`maxPoints`
    * gate); feed subject-grain frames, never raw events.
    * Output: (groups..., n_pairs, n_concordant, n_tied, c_index).
    */
  def concordanceIndex(df: DataFrame, groupCols: Seq[String],
                       durationCol: String, eventCol: String,
                       predCol: String, maxPoints: Int = 10000): DataFrame = {
    val keys = groupCols.map(col)
    val pts = df.select((keys :+ col(durationCol).cast("long").as("_t") :+
      col(eventCol).cast("int").as("_e") :+
      col(predCol).cast("double").as("_p")): _*)
      .localCheckpoint() // consumed 3×: gate + both pair sides
    val sizes = pts.groupBy(keys: _*).agg(count(lit(1)).as("_n"))
    val tooBig = sizes.filter(col("_n") > maxPoints).limit(1).collect()
    require(tooBig.isEmpty,
      s"a group exceeds maxPoints=$maxPoints subjects — feed subject-grain frames")
    val a = pts.toDF((groupCols :+ "_t1" :+ "_e1" :+ "_p1"): _*)
    val b = pts.toDF((groupCols :+ "_t2" :+ "_e2" :+ "_p2"): _*)
    a.join(b, groupCols)
      .filter(col("_t1") < col("_t2") && col("_e1") === 1) // usable pairs
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_p1") > col("_p2"), 1L).otherwise(0L)).as("n_concordant"),
        sum(when(col("_p1") === col("_p2"), 1L).otherwise(0L)).as("n_tied"))
      .withColumn("c_index", when(col("n_pairs") > 0,
        (col("n_concordant") + col("n_tied") / lit(2.0)) / col("n_pairs")))
  }
}
