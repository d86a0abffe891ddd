package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed typed event on the stream (funnel step candidates). */
case class FunnelEvent(key: Long, ts: Timestamp, etype: String)

/** One funnel snapshot per key per micro-batch that touched it:
  * `max_step` steps reached so far, their event times (micros, length =
  * max_step), late-dropped count, and a monotone `n_seen` so consumers can
  * select each key's LATEST snapshot without batch ids.
  */
case class FunnelProgress(key: Long, max_step: Int, step_ts_us: Seq[Long],
                          n_late: Long, n_seen: Long)

private case class FunnelState(lastTsUs: Long, reachedUs: Seq[Long],
                               nLate: Long, nSeen: Long)

/** Streaming windowed funnel — the `flatMapGroupsWithState` realization of
  * [[graft.operators.Sessions.windowFunnel]] (strict-order earliest chain:
  * t₁ = first s₁ event; tᵢ = first sᵢ event with tᵢ > tᵢ₋₁ and
  * tᵢ ≤ t₁ + window). Because the batch chain is the GREEDY fold of the
  * per-key event-time order — each step takes the earliest qualifying
  * event — it folds incrementally through state with no event buffering:
  * state per key is the reached-step times + 3 longs, O(active keys),
  * independent of stream length.
  *
  * Same ordering contract as [[StreamingCusum]]/[[StreamingCounterRate]]:
  * in-batch events fold in event-time order; an event at or before the
  * state's last processed timestamp (late ACROSS batches, or an exact
  * duplicate stamp) is counted in `n_late` rather than corrupting the
  * fold. Exact-timestamp ties are measure-zero at microsecond stamps —
  * pinned in StreamingFunnelSpec, same caveat as
  * [[StreamingSessions]]' half-open boundary.
  */
object StreamingFunnel {

  implicit private val outEnc: Encoder[FunnelProgress] = Encoders.product[FunnelProgress]
  implicit private val stEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit private val keyEnc: Encoder[Long] = Encoders.scalaLong

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  def progress(events: Dataset[FunnelEvent], steps: Seq[String],
               windowSeconds: Long,
               watermark: String = "1 hour"): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          val st0 = state.getOption.getOrElse(
            FunnelState(Long.MinValue, Seq.empty, 0L, 0L))
          val reached = st0.reachedUs.toBuffer
          var last = st0.lastTsUs
          var late = st0.nLate
          var seen = st0.nSeen
          it.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            val us = micros(e.ts)
            seen += 1
            if (us <= last) late += 1
            else {
              last = us
              val nxt = reached.size
              if (nxt < steps.length && e.etype == steps(nxt)) {
                val qualifies = nxt == 0 ||
                  (us > reached(nxt - 1) &&
                    us <= reached.head + windowSeconds * 1000000L)
                if (qualifies) reached += us
              }
            }
          }
          state.update(FunnelState(last, reached.toSeq, late, seen))
          Iterator.single(
            FunnelProgress(key, reached.size, reached.toSeq, late, seen))
        })
  }
}
