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
}
