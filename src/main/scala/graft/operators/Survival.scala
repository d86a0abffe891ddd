package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier product-limit survival estimator (Kaplan & Meier 1958) —
  * retention/churn curves that handle RIGHT-CENSORING correctly: a subject
  * still active at the observation cutoff contributes to the risk set up to
  * its censoring time without being counted as churned, which the naive
  * "share retained at day t" cohort table ([[Sessions]] cohort retention)
  * gets wrong whenever observation windows are ragged.
  *
  *   S(t) = Π_{tᵢ ≤ t, d_i > 0} (1 − dᵢ/nᵢ)
  *
  * with dᵢ = events at tᵢ and nᵢ = subjects still at risk (duration ≥ tᵢ).
  * The running product is computed as exp(Σ ln(1 − d/n)) — a pinned,
  * engine-replayable form (mathematically identical, float-stable because
  * the cumulative sum and the product share monotone term order); a time
  * where the whole remaining risk set fails (d = n) makes the survival 0
  * from that point on (log of 0 is absorbed explicitly, not through −∞).
  *
  * Scale shape: one grouped count per (key, t), one per-key window over
  * DISTINCT event times (bounded by the time grain, not by subjects) —
  * subjects never cross the shuffle as rows, only their (t, d, c) counts.
  * Output: (keys..., t, n_risk, d, survival) — one row per event time.
  */
object Survival {

  /** @param durationCol integer time-to-event/censoring (e.g. days)
    * @param eventCol    1 = event observed (churned), 0 = right-censored
    */
  def kaplanMeier(df: DataFrame, keyCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val perT = df
      .filter(col(durationCol).isNotNull)
      .groupBy((keys :+ col(durationCol).cast("long").as("t")): _*)
      .agg(sum(col(eventCol).cast("long")).as("d"), count(lit(1)).as("_c"))
    val wAll = Window.partitionBy(keys: _*)
    val wCum = wAll.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = perT
      .withColumn("n_risk", sum(col("_c")).over(wAll) -
        sum(col("_c")).over(wCum) + col("_c"))
      .filter(col("d") > 0)
    val wEv = wAll.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk
      .withColumn("_lt", when(col("d") < col("n_risk"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk"))).otherwise(lit(null)))
      .withColumn("_dead", max(when(col("d") === col("n_risk"), 1L)
        .otherwise(0L)).over(wEv))
      .withColumn("survival", when(col("_dead") === 1L, lit(0.0))
        .otherwise(exp(sum(col("_lt")).over(wEv))))
      .select((keys :+ col("t") :+ col("n_risk") :+ col("d") :+
        col("survival")): _*)
  }
}
