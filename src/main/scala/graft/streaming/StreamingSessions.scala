package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming sessionization: the streaming twin of the batch
  * gap-split ([[graft.operators.Sessions.sessionize]]/`sessionStats`), built
  * on Spark's native `session_window` state store — sessions grow while
  * events keep arriving within `gap` of the session's end, close when the
  * WATERMARK passes end, and emit exactly once in append mode.
  *
  * Semantics vs batch: a session window spans `[first event, last event +
  * gap)` and an event at EXACTLY `prev + gap` starts a NEW session
  * (half-open window), while the batch `sessionize` splits only on
  * `diff > gap`; the two agree everywhere except gaps of exactly `gap`
  * (measure-zero for real timestamps; pin it in tests, not in prod data).
  *
  * Scale: per-key state is ONE open session struct (start, end, counters) —
  * not the events — so state size is O(active keys), and Spark's
  * session-window merge is the same partial-aggregation shape as the tier-1
  * rollup: shuffle on keys, merge-on-arrival. The output feeds the same
  * durable stores as batch session stats; replay/late-data beyond the
  * watermark goes through the batch path, mirroring the tier pipeline's
  * split between streaming ingest and batch promotion.
  */
object StreamingSessions {

  /** Per-session aggregate rows: (keys, session_start, session_end,
    * n_events, sum of `valueCol` if given). `events` must be a streaming
    * DataFrame; emit policy follows the caller's output mode (append =
    * closed sessions only).
    *
    * @param gap       session gap, e.g. "30 minutes"
    * @param watermark how late an event may be before its session closes
    */
  def sessionStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                    gap: String, watermark: String,
                    valueCol: Option[String] = None): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +:
      valueCol.map(v => sum(col(v)).as("sum_value")).toSeq
    events
      .withWatermark(tsCol, watermark)
      .groupBy(keyCols.map(col) :+ session_window(col(tsCol), gap).as("sw"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("sw.start"))
      .withColumn("session_end", col("sw.end"))
      .drop("sw")
  }
}
