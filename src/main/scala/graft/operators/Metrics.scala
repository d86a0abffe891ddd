package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Forecast error metrics (ref /root/reference/forecastframe/interpret.py:47-115
  * and model.py:134-148, :527-547). Null actuals are masked before
  * aggregation like `_remove_rows_with_missing_actuals` (interpret.py:110-115).
  */
object Metrics {

  def ae(actual: Column, pred: Column): Column = abs(actual - pred)
  def se(actual: Column, pred: Column): Column = pow(actual - pred, 2)
  /** Absolute percent error; division-safe like the reference's inf→nan. */
  def ape(actual: Column, pred: Column): Column =
    when(actual.isNull || actual === 0, lit(null)).otherwise(abs((actual - pred) / actual))
  /** Absolute percent accuracy = 1 - APE. */
  def apa(actual: Column, pred: Column): Column = lit(1) - ape(actual, pred)

  /** Pinball / quantile loss (ref model.py:134-148). */
  def pinball(actual: Column, pred: Column, q: Double): Column =
    when(actual >= pred, (actual - pred) * q).otherwise((pred - actual) * (1 - q))

  /** Asymmetric squared loss: over-predictions weighted `overWeight`
    * (ref model.py:527-547).
    */
  def asymmetricSe(actual: Column, pred: Column, overWeight: Double): Column =
    when(pred > actual, pow(pred - actual, 2) * overWeight).otherwise(pow(actual - pred, 2))

  /** Aggregated metric summary per optional grouping: MAPE, MAPA, MAE, MSE,
    * RMSE, SMAPE (null actuals dropped first).
    */
  def summarize(df: DataFrame, actualCol: String, predCol: String,
                groupBy: Seq[String] = Nil): DataFrame = {
    val a = col(actualCol); val p = col(predCol)
    val clean = df.filter(a.isNotNull && p.isNotNull)
    val aggs = Seq(
      avg(ape(a, p)).as("mape"),
      avg(apa(a, p)).as("mapa"),
      avg(ae(a, p)).as("mae"),
      avg(se(a, p)).as("mse"),
      sqrt(avg(se(a, p))).as("rmse"),
      avg(when(abs(a) + abs(p) === 0, lit(0.0))
        .otherwise(abs(a - p) * 2 / (abs(a) + abs(p)))).as("smape"),
      count(lit(1)).as("n"))
    if (groupBy.isEmpty) clean.agg(aggs.head, aggs.tail: _*)
    else clean.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** MASE — mean absolute scaled error (Hyndman & Koehler 2006, "Another
    * look at measures of forecast accuracy" — public): test-period MAE
    * scaled by the TRAIN-period in-sample MAE of the m-step naive forecast.
    * Scale-free (comparable across series of different magnitudes) and
    * defined where MAPE is not (zero actuals) — the missing member of the
    * reference's metric set (interpret.py:47-115 has MAPE/MAE/RMSE/SMAPE).
    *
    * One window pass over train (lag m) + two partial aggs + a key join —
    * both inputs are touched exactly once.
    *
    * @return one row per key: `(keys..., mase, n)`; mase is null when the
    *         train naive MAE is 0 (constant train series) or train has < m+1
    *         rows
    */
  def mase(train: DataFrame, test: DataFrame, keyCols: Seq[String], tsCol: String,
           actualCol: String, predCol: String, m: Int = 1): DataFrame = {
    require(m >= 1, s"seasonal period m must be >= 1, got $m")
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(tsCol))
    val denom = train
      .withColumn("_nae", abs(col(actualCol) - lag(col(actualCol), m).over(w)))
      .groupBy(keys: _*).agg(avg(col("_nae")).as("_d")) // avg skips the first m nulls
    val num = test.filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(keys: _*)
      .agg(avg(abs(col(actualCol) - col(predCol))).as("_n"), count(lit(1)).as("n"))
    num.join(denom, keyCols)
      .withColumn("mase", when(col("_d") > 0, col("_n") / col("_d")))
      .select((keys :+ col("mase") :+ col("n")): _*)
  }

  /** Diebold–Mariano statistic (Diebold & Mariano 1995 JBES — public) for
    * equal predictive accuracy of two competing forecasts under SQUARED
    * loss at horizon 1: per key, the loss differential
    *   d_t = (y_t − p1_t)² − (y_t − p2_t)²
    * is summarized as DM = d̄ / sqrt(Var_pop(d)/n) — asymptotically N(0,1)
    * under the null of equal accuracy (h=1 ⇒ the long-run variance is just
    * γ₀, no HAC autocovariance terms). DM ≪ 0 means forecast 1 wins. The
    * missing COMPARISON member of this metric family: [[summarize]]/[[mase]]
    * score one forecast, this decides between two on the same actuals.
    *
    * One grouped aggregation (mean + population variance of a projected
    * expression) — a single shuffle on the series keys.
    *
    * @return (keys..., n, mean_d, dm_stat); dm_stat null when Var(d)=0
    *         (identical losses, e.g. p1≡p2) or n<2
    */
  def dieboldMariano(df: DataFrame, keyCols: Seq[String], actualCol: String,
                     pred1Col: String, pred2Col: String): DataFrame = {
    val y = col(actualCol).cast("double")
    val p1 = col(pred1Col).cast("double"); val p2 = col(pred2Col).cast("double")
    val d = (y - p1) * (y - p1) - (y - p2) * (y - p2)
    df.filter(y.isNotNull && p1.isNotNull && p2.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), avg(d).as("mean_d"), var_pop(d).as("_v"))
      .withColumn("dm_stat", when(col("_v") > 0 && col("n") >= 2,
        col("mean_d") / sqrt(col("_v") / col("n"))))
      .drop("_v")
  }

  /** Theil's U2 (Theil 1966 — public): RMSE of the candidate forecast over
    * the RMSE of the supplied naive forecast on the SAME rows,
    *   U2 = sqrt(Σ(p−y)²) / sqrt(Σ(naive−y)²)
    * — U2 < 1 beats naive, > 1 loses to it. The caller supplies the naive
    * column (typically `lag(actual)` over the series window) so the
    * comparison window is explicit and leak-free. One grouped aggregation.
    *
    * @return (keys..., theil_u, n); null when the naive SSE is 0
    */
  def theilU(df: DataFrame, keyCols: Seq[String], actualCol: String,
             predCol: String, naiveCol: String): DataFrame = {
    val y = col(actualCol).cast("double")
    val p = col(predCol).cast("double"); val nv = col(naiveCol).cast("double")
    df.filter(y.isNotNull && p.isNotNull && nv.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum((p - y) * (p - y)).as("_sp"),
        sum((nv - y) * (nv - y)).as("_sn"), count(lit(1)).as("n"))
      .withColumn("theil_u", when(col("_sn") > 0, sqrt(col("_sp") / col("_sn"))))
      .select((keyCols.map(col) :+ col("theil_u") :+ col("n")): _*)
  }

  /** Winkler interval score for a central (1−α) prediction interval
    * (Winkler 1972; Gneiting & Raftery 2007 eq. 43 — the proper scoring
    * rule for interval forecasts, and what FPP3 §5.9 recommends for
    * evaluating bands like [[Forecast.seasonalNaive]]'s):
    *   W = (u − l) + (2/α)·(l − y)·1[y < l] + (2/α)·(y − u)·1[y > u]
    * — narrow intervals are rewarded, misses are charged proportionally to
    * how far outside they land. Point metrics can't rank BAND quality;
    * this can, and lower is better.
    *
    * One aggregation per key: mean score, plus empirical `coverage` (share
    * of actuals inside the band — should be ≈ 1−α if the bands are honest).
    */
  def intervalScore(df: DataFrame, keyCols: Seq[String], actualCol: String,
                    loCol: String, hiCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val y = col(actualCol).cast("double")
    val l = col(loCol).cast("double"); val u = col(hiCol).cast("double")
    val w = (u - l) +
      when(y < l, (lit(2.0) / alpha) * (l - y)).otherwise(lit(0.0)) +
      when(y > u, (lit(2.0) / alpha) * (y - u)).otherwise(lit(0.0))
    df.filter(y.isNotNull && l.isNotNull && u.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(avg(w).as("interval_score"),
        avg(when(y >= l && y <= u, 1.0).otherwise(0.0)).as("coverage"),
        count(lit(1)).as("n"))
  }

  /** Tracking signal — the classical forecast-monitoring statistic (Trigg
    * 1964; every demand-planning text): per key, over the time-ordered
    * (actual, forecast) series,
    *   TS_t = Σ_{i≤t} e_i  /  mean_{i≤t} |e_i|     with e = actual − forecast
    * — a persistent bias drives |TS| up while unbiased noise keeps it near
    * zero; |TS| > threshold (4 is the textbook default ≈ 3σ for MAD-based
    * control) flags a forecast gone stale. Expanding mean denominator (the
    * cumulative-MAD variant) so both engines share an exact closed form —
    * no smoothing recursion. One pass: two cumulative windows per key.
    * Output: every input row + `cum_err`, `mad`, `tsig`, `alarm`.
    */
  def trackingSignal(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     actualCol: String, fcCol: String,
                     threshold: Double = 4.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val e = col(actualCol).cast("double") - col(fcCol).cast("double")
    df.filter(col(actualCol).isNotNull && col(fcCol).isNotNull)
      .withColumn("cum_err", sum(e).over(w))
      .withColumn("mad", avg(abs(e)).over(w))
      .withColumn("tsig", when(col("mad") > 0, col("cum_err") / col("mad")))
      .withColumn("alarm",
        (col("tsig").isNotNull && abs(col("tsig")) > threshold).cast("int"))
  }

  /** Theil's MSE decomposition (Theil 1966, "Applied Economic Forecasting"
    * §2.4): splits per-key MSE into three interpretable, additive parts,
    *   MSE = (f̄ − ȳ)²  +  (s_f − s_y)²  +  2(1 − r)·s_f·s_y
    *          bias        variance           covariance
    * (population sd; r = Pearson correlation of forecast and actual) —
    * tells a forecaster WHERE the error lives: systematic offset, wrong
    * volatility, or irreducible phase mismatch. Shares (um/us/uc sum to 1)
    * are emitted alongside the raw parts. One aggregation pass per key over
    * the six moment sums. Degenerate keys (zero MSE or zero sd) emit null
    * shares rather than dividing by zero.
    */
  def mseDecomposition(df: DataFrame, keyCols: Seq[String], actualCol: String,
                       predCol: String): DataFrame = {
    val y = col(actualCol).cast("double")
    val f = col(predCol).cast("double")
    val g = df.filter(y.isNotNull && f.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("_n"),
        avg(y).as("_my"), avg(f).as("_mf"),
        avg(y * y).as("_myy"), avg(f * f).as("_mff"), avg(f * y).as("_mfy"))
      .withColumn("_sy", sqrt(greatest(col("_myy") - col("_my") * col("_my"), lit(0.0))))
      .withColumn("_sf", sqrt(greatest(col("_mff") - col("_mf") * col("_mf"), lit(0.0))))
      .withColumn("_cov", col("_mfy") - col("_mf") * col("_my"))
      .withColumn("mse",
        col("_mff") - lit(2.0) * col("_mfy") + col("_myy"))
      .withColumn("bias_part", (col("_mf") - col("_my")) * (col("_mf") - col("_my")))
      .withColumn("var_part", (col("_sf") - col("_sy")) * (col("_sf") - col("_sy")))
      .withColumn("cov_part",
        lit(2.0) * (col("_sf") * col("_sy") - col("_cov")))
    g.withColumn("um", when(col("mse") > 0, col("bias_part") / col("mse")))
      .withColumn("us", when(col("mse") > 0, col("var_part") / col("mse")))
      .withColumn("uc", when(col("mse") > 0, col("cov_part") / col("mse")))
      .select((keyCols.map(col) :+ col("_n").cast("long").as("n") :+ col("mse") :+
        col("bias_part") :+ col("var_part") :+ col("cov_part") :+
        col("um") :+ col("us") :+ col("uc")): _*)
  }

  /** Durbin–Watson statistic (Durbin & Watson 1950) per key over the
    * time-ordered residual series: DW = Σ(e_t − e_{t−1})² / Σe_t², in
    * [0, 4] — ≈ 2 for uncorrelated residuals, → 0 under positive serial
    * correlation (the fingerprint of an UNDERFIT forecast: errors cluster),
    * → 4 under negative. DW ≈ 2(1 − ρ₁). One lag window + one aggregate.
    * Output: (keys..., n, dw) — null when Σe² = 0.
    */
  def durbinWatson(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   residCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(tsCol))
    val e = col(residCol).cast("double")
    df.filter(e.isNotNull)
      .withColumn("_d", e - lag(e, 1).over(w))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_d") * col("_d")).as("_num"), sum(e * e).as("_den"))
      .withColumn("dw", when(col("_den") > 0, col("_num") / col("_den")))
      .select((keys :+ col("n") :+ col("dw")): _*)
  }

  /** CRPS of an empirical-ensemble forecast (Gneiting & Raftery 2007,
    * eq. 21): for ensemble X = {x₁..x_n} and observation y,
    *   CRPS = (1/n)Σ|xᵢ − y| − (1/2n²)ΣΣ|xᵢ − xⱼ|
    * — the proper score that generalizes MAE to DISTRIBUTIONAL forecasts
    * (it is MAE when n = 1) and what [[intervalScore]] approximates with
    * two quantiles. The within-ensemble term collapses to the sorted-rank
    * form Σᵢ(2i − n − 1)·x₍ᵢ₎ / n² (tie-order invariant), computed ONCE per
    * key; the cross term is a (key)-local ensemble × observation join —
    * bounded by design (tier-aggregated ensembles: n_ens · n_obs per key
    * must be small; the [[graft.operators.Robust.theilSenSlope]] contract).
    *
    * Output: one row per OBSERVATION (keys..., obsId, n_ens, crps) — the
    * caller aggregates. Emitting per-observation scores keeps the whole
    * statistic a ratio of sums: with integer-quantized measures both sums
    * are exact and the score is bit-identical across engines (a per-key
    * AVG of the scores would re-introduce an addition-order ulp — observed
    * as a 6-dp boundary flake at sf0.1 before this was split out).
    */
  def crpsEmpirical(ensemble: DataFrame, keyCols: Seq[String], valCol: String,
                    obs: DataFrame, obsIdCol: String, obsCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val x = col(valCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(x)
    val within = ensemble.filter(x.isNotNull)
      .withColumn("_i", row_number().over(w).cast("double"))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys: _*))
        .cast("double"))
      .groupBy(keys: _*)
      .agg(max(col("_n")).as("_ne"),
        sum((lit(2.0) * col("_i") - col("_n") - 1) * x).as("_pairsum"))
      // ΣΣ over ORDERED pairs = 2·Σ_{i<j}; the rank sum gives the i<j half
      .withColumn("_exx",
        lit(2.0) * col("_pairsum") / (col("_ne") * col("_ne")))
    val y = col(obsCol).cast("double")
    val cross = ensemble.filter(x.isNotNull)
      .join(obs.filter(y.isNotNull), keyCols)
      .groupBy((keys :+ col(obsIdCol)): _*)
      .agg(avg(abs(x - y)).as("_exy"))
    cross.join(within, keyCols)
      .select((keys :+ col(obsIdCol) :+ col("_ne").cast("long").as("n_ens") :+
        (col("_exy") - lit(0.5) * col("_exx")).as("crps")): _*)
  }

  /** Apdex score (Apdex Alliance standard) per key: with target threshold
    * T, a measurement is satisfied (≤ T), tolerating (≤ 4T) or frustrated;
    *   Apdex = (n_satisfied + n_tolerating/2) / n ∈ [0, 1]
    * — the de-facto latency SLO readout. Integer counts + ONE division
    * (cross-engine exact). One conditional aggregate.
    * Output: (keys..., n, n_satisfied, n_tolerating, apdex).
    */
  def apdex(df: DataFrame, keyCols: Seq[String], valCol: String,
            threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val v = col(valCol).cast("double")
    df.filter(v.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(v <= threshold, 1L).otherwise(0L)).as("n_satisfied"),
        sum(when(v > threshold && v <= 4 * threshold, 1L).otherwise(0L))
          .as("n_tolerating"))
      .withColumn("apdex",
        (col("n_satisfied") + col("n_tolerating") / lit(2.0)) / col("n"))
  }

  /** Mean Tweedie deviance per key at power p ∈ {1, 2} — the right loss
    * for the count/positive-skewed demand the reference forecasts (squared
    * error over-penalizes high-volume series):
    *   p = 1 (Poisson): d = 2(y·ln(y/μ) − y + μ),  y ln y → 0 at y = 0
    *   p = 2 (Gamma):   d = 2((y − μ)/μ − ln(y/μ)),  y > 0 required
    * Rows violating the domain (μ ≤ 0; y < 0 at p=1; y ≤ 0 at p=2) are
    * excluded and counted in `n_excluded`. One conditional aggregate.
    * Output: (keys..., n, n_excluded, mean_deviance).
    */
  def tweedieDeviance(df: DataFrame, keyCols: Seq[String], actualCol: String,
                      predCol: String, power: Int): DataFrame = {
    require(power == 1 || power == 2, s"power must be 1 or 2, got $power")
    val keys = keyCols.map(col)
    val y = col(actualCol).cast("double")
    val mu = col(predCol).cast("double")
    val ok = if (power == 1) y >= 0 && mu > 0 else y > 0 && mu > 0
    val d = if (power == 1)
      lit(2.0) * (when(y > 0, y * log(y / mu)).otherwise(lit(0.0)) - y + mu)
    else
      lit(2.0) * ((y - mu) / mu - log(y / mu))
    df.filter(y.isNotNull && mu.isNotNull)
      .groupBy(keys: _*)
      .agg(sum(when(ok, 1L).otherwise(0L)).as("n"),
        sum(when(!ok, 1L).otherwise(0L)).as("n_excluded"),
        sum(when(ok, d).otherwise(lit(0.0))).as("_dev"))
      .withColumn("mean_deviance",
        when(col("n") > 0, col("_dev") / col("n"))) // ANSI-safe: all-excluded keys
      .select((keys :+ col("n") :+ col("n_excluded") :+
        col("mean_deviance")): _*)
  }
}
