package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) construction: turn a keyed change LOG
  * (one row per observation) into VALIDITY INTERVALS — one row per run of
  * consecutive equal states, with `valid_from` / `valid_to` (half-open,
  * null-open tail) and a per-key version number. The warehouse op that
  * builds a point-in-time dimension for [[AsOf.asofJoin]] to hit.
  *
  * The reference updates values in place (`update_values`,
  * /root/reference/forecastframe/utilities.py) and keeps no history; SCD2
  * is the history-preserving form every durable dimension needs.
  *
  * Plan: one window pass keyed on `keyCols` ordered by (`tsCol`, `tieCol`)
  * computes the change flag (lag ≠ current) and its running sum — the run
  * id; one aggregation collapses runs; one more window (over the RUN table,
  * |runs| ≪ |log|) leads `valid_from` into `valid_to`. Two shuffles on the
  * key, both over progressively smaller data; nothing is collected.
  *
  * Determinism: the tie column makes the order total, so run boundaries —
  * and therefore every interval — are reproducible across engines and
  * shuffle orders. Null states are a state like any other (null ≠ non-null
  * is a change; null = null is not, via null-safe equality).
  */
object Scd {

  /** @param tieCol total-order tie-break within equal `tsCol` (an event id)
    * @return keyCols + (state, version, valid_from, valid_to, n_obs),
    *         `version` 1-based per key in time order, `valid_to` null for
    *         the current (last) state.
    */
  def scd2(log: DataFrame, keyCols: Seq[String], tsCol: String,
           stateCol: String, tieCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val obsWin = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val runs = log
      .withColumn("_chg",
        when(lag(col(stateCol), 1).over(obsWin) <=> col(stateCol), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("version", sum(col("_chg")).over(
        obsWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys :+ col("version")): _*)
      .agg(min(col(stateCol)).as("state"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val runWin = Window.partitionBy(keys: _*).orderBy(col("version"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(runWin))
      .select((keys :+ col("state") :+ col("version") :+ col("valid_from") :+
        col("valid_to") :+ col("n_obs")): _*)
  }
}
