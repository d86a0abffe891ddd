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
}
