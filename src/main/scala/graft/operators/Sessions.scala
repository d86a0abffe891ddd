package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a keyed event stream into sessions that
  * close after `gapSeconds` of inactivity, and per-session summary stats.
  *
  * The reference's datetime handling stops at calendar features
  * (/root/reference/forecastframe/feature_engineering.py `calc_datetime_features`);
  * sessionization is the standard event-stream extension (web analytics,
  * crawl-visit grouping at Common-Crawl scale).
  *
  * Scale design: two window passes over ONE shuffle — `lag` to flag session
  * starts, then a running `sum` of the flags for the session index; both
  * windows share the same (keys, order) so Catalyst plans a single sort +
  * exchange. No self-join, no explode. Session ids are (key, session_idx)
  * pairs — globally unique without any driver-side counter, stable under
  * re-partitioning. Skewed hot keys: the window is per-key sequential by
  * nature (a session is a per-key order-dependent construct); a key too hot
  * for one task should be chunked on coarse time with flag carry-in, same
  * note as [[AsOf]]. For unbounded streams use the Structured Streaming
  * `session_window` tumbling analogue instead (see graft.streaming).
  */
object Sessions {

  /** Assign `session_idx` (1-based per key) to every event. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    // sub-second-exact gap: compare integer MICROSECONDS (unix_micros here,
    // epoch_us in the DuckDB oracle) — no truncation, no float compare
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    val newSession = when(prev.isNull
        .or(micros(col(tsCol)) - micros(prev) > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: start/end, duration, event count, summed value. */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   gapSeconds: Long, valueCol: String): DataFrame =
    sessionize(df, keyCols, tsCol, gapSeconds)
      .groupBy((keyCols.map(col) :+ col("session_idx")): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
}
