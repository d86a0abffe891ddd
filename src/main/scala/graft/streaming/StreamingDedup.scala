package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time half of the batch
  * [[graft.operators.Dedup.exactDedup]]: duplicate ids arriving within the
  * watermark are dropped by Spark's `dropDuplicatesWithinWatermark` state
  * store, so the durable tier pipeline downstream never double-counts a
  * re-delivered page (at-least-once sources re-deliver on every retry).
  *
  * Semantics: state per id lives until the WATERMARK passes its event time
  * — a duplicate arriving later than the watermark delay is NOT caught
  * (its state has been reclaimed; that is the price of bounded state).
  * Exactly the batch/stream split the tier store already uses: streaming
  * dedup bounds the common case cheaply, and the batch digest dedup
  * ([[graft.operators.Dedup.exactDedup]]) sweeps the durable store for
  * stragglers. State size is O(ids per watermark window), independent of
  * stream length.
  */
object StreamingDedup {

  /** Drop re-deliveries of the same `idCols` within the watermark.
    * `events` must be a streaming DataFrame with an event-time `tsCol`.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
}
