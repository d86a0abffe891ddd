package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical baseline forecasters: seasonal-naive and drift, with
  * residual-based prediction intervals.
  *
  * The reference's model layer fits LightGBM/Prophet
  * (/root/reference/forecastframe/model.py:802-953 — scoped out per SURVEY
  * §3: driver-side ML, not engine work), but every forecasting pipeline
  * needs the classical baselines the models must beat, and THOSE are pure
  * relational algebra — they belong in the engine. Semantics follow the
  * standard definitions (Hyndman & Athanasopoulos, "Forecasting: Principles
  * and Practice", §5.2 — public):
  *   - seasonal naive: ŷ(T+s) = y(T + s − m·⌈s/m⌉)   (last same-season value)
  *   - drift:          ŷ(T+s) = y(T) + s·(y(T) − y(1))/(T−1)
  *
  * Scale design: no per-key collect, no cross join with history.
  *   - snaive: the future frame (keys × 1..h rows — tiny) computes each
  *     step's SOURCE timestamp arithmetically, then equi-joins history on
  *     (key, source_ts): one broadcast-able equi-join, pushdown-friendly,
  *     instead of a range join or per-key window over history+future.
  *   - drift: one groupBy over history (map-side partial min/max by ts via
  *     min_by/max_by) + explode(1..h) — history is touched exactly once.
  *   - intervals: residual σ per key from the same single history pass
  *     (stddev of the m-lag difference), widened by √⌈s/m⌉ as the naive
  *     variance grows with steps-ahead (same Hyndman §5.5 shape).
  *
  * Inputs are a REGULAR per-key series (run [[GapFill]] first): `tsCol`
  * spaced exactly `stepSeconds` apart within each key.
  */
object Forecast {

  /** Seasonal-naive forecast with ±z·σ̂·√⌈s/m⌉ prediction intervals.
    *
    * @param period      season length m, in steps
    * @param horizon     number of future steps to emit (1..horizon)
    * @param stepSeconds series grid spacing in seconds
    * @return one row per (key, step): `forecast_ts, step, yhat, lo, hi`
    */
  def seasonalNaive(history: DataFrame, keyCols: Seq[String], tsCol: String,
                    valCol: String, period: Int, horizon: Int,
                    stepSeconds: Long, z: Double = 1.96): DataFrame = {
    require(period >= 1 && horizon >= 1 && stepSeconds >= 1,
      s"period/horizon/stepSeconds must be >= 1, got $period/$horizon/$stepSeconds")
    val keys = keyCols.map(col)

    // one pass over history: last timestamp + m-lag residual spread per key
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val resid = history
      .withColumn("_resid", col(valCol) - lag(col(valCol), period).over(w))
    val perKey = resid
      .groupBy(keys: _*)
      .agg(max(col(tsCol)).as("_last_ts"),
        coalesce(stddev_samp(col("_resid")), lit(0.0)).as("_sigma"))

    // future frame: step s forecasts from source ts = T + (s − m·⌈s/m⌉)·Δ
    val future = perKey
      .withColumn("step", explode(sequence(lit(1), lit(horizon))))
      .withColumn("forecast_ts",
        timestamp_seconds(unix_timestamp(col("_last_ts")) + col("step") * stepSeconds))
      .withColumn("_k", ceil(col("step").cast("double") / period).cast("long"))
      .withColumn("_src_ts",
        timestamp_seconds(unix_timestamp(col("_last_ts")) +
          (col("step") - col("_k") * period) * stepSeconds))

    val src = history.select((keys :+ col(tsCol).as("_src_ts")
      :+ col(valCol).as("yhat")): _*)
    future.join(src, keyCols :+ "_src_ts", "left")
      .withColumn("lo", col("yhat") - lit(z) * col("_sigma") * sqrt(col("_k")))
      .withColumn("hi", col("yhat") + lit(z) * col("_sigma") * sqrt(col("_k")))
      .select((keys :+ col("forecast_ts") :+ col("step")
        :+ col("yhat") :+ col("lo") :+ col("hi")): _*)
  }

  /** Drift forecast: the line through the first and last observation,
    * extrapolated `horizon` steps. One aggregate pass + explode.
    */
  def drift(history: DataFrame, keyCols: Seq[String], tsCol: String,
            valCol: String, horizon: Int, stepSeconds: Long): DataFrame = {
    require(horizon >= 1 && stepSeconds >= 1,
      s"horizon/stepSeconds must be >= 1, got $horizon/$stepSeconds")
    val keys = keyCols.map(col)
    history
      .groupBy(keys: _*)
      .agg(
        min_by(col(valCol), col(tsCol)).as("_y1"),
        max_by(col(valCol), col(tsCol)).as("_yT"),
        max(col(tsCol)).as("_last_ts"),
        count(lit(1)).as("_n"))
      .withColumn("step", explode(sequence(lit(1), lit(horizon))))
      .withColumn("forecast_ts",
        timestamp_seconds(unix_timestamp(col("_last_ts")) + col("step") * stepSeconds))
      .withColumn("yhat",
        when(col("_n") > 1,
          col("_yT") + col("step") * (col("_yT") - col("_y1")) / (col("_n") - 1))
          .otherwise(col("_yT")))
      .select((keys :+ col("forecast_ts") :+ col("step") :+ col("yhat")): _*)
  }
}
