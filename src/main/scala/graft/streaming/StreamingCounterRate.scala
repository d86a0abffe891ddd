package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A monotone-counter event: the cumulative value a metrics agent reports. */
case class CounterEvent(key: Long, ts: Timestamp, counter: Double)

/** One adjusted delta per surviving event. `delta` is null for a series
  * head (nothing to difference against) and for dropped late rows.
  */
case class CounterDelta(key: Long, ts: Timestamp, delta: Option[Double],
                        is_reset: Boolean, dropped_late: Boolean)

private case class CounterState(lastTsMillis: Long, lastVal: Double)

/** Streaming counter-delta extraction with CUSTOM state — the
  * `flatMapGroupsWithState` realization of [[graft.operators.Features.counterRate]]'s
  * delta pass (PromQL `increase` semantics: negative delta = reset, the
  * restarted absolute value counts). The built-in stateful operators the
  * other streaming pieces use (windowed agg, session_window,
  * dropDuplicatesWithinWatermark) cannot express "difference against the
  * PREVIOUS event of this key", so this is the op that exercises Spark's
  * arbitrary-state API.
  *
  * Ordering contract: within a micro-batch each key's events are sorted by
  * event time before folding; an event at or before the state's last seen
  * timestamp (out of order ACROSS batches — the watermark bounds how late)
  * is emitted with `dropped_late = true` and a null delta rather than
  * silently corrupting the recursion. State per key is ONE (ts, value)
  * pair — O(active keys), independent of stream length.
  *
  * Downstream, a plain watermarked `window()` aggregation of `delta` gives
  * the same per-bucket `increase`/`rate` as the batch operator.
  */
object StreamingCounterRate {

  implicit private val deltaEnc: Encoder[CounterDelta] = Encoders.product[CounterDelta]
  implicit private val stateEnc: Encoder[CounterState] = Encoders.product[CounterState]
  implicit private val keyEnc: Encoder[Long] = Encoders.scalaLong

  /** Per-event adjusted deltas over a streaming `Dataset[CounterEvent]`.
    * Append-mode output; set a watermark upstream to bound late data.
    */
  def deltas(events: Dataset[CounterEvent], watermark: String = "10 minutes"): Dataset[CounterDelta] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[CounterEvent], state: GroupState[CounterState]) => {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption
          val out = sorted.map { e =>
            st match {
              case Some(s) if e.ts.getTime <= s.lastTsMillis =>
                CounterDelta(key, e.ts, None, is_reset = false, dropped_late = true)
              case Some(s) =>
                val d = e.counter - s.lastVal
                st = Some(CounterState(e.ts.getTime, e.counter))
                CounterDelta(key, e.ts,
                  Some(if (d >= 0) d else e.counter), is_reset = d < 0,
                  dropped_late = false)
              case None =>
                st = Some(CounterState(e.ts.getTime, e.counter))
                CounterDelta(key, e.ts, None, is_reset = false, dropped_late = false)
            }
          }
          st.foreach(state.update)
          out.iterator
        })
}
