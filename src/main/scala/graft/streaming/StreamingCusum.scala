package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed metric observation on the stream. */
case class MetricEvent(key: Long, ts: Timestamp, value: Double)

/** One CUSUM point per surviving event. */
case class CusumPoint(key: Long, ts: Timestamp, z: Double, cusum_pos: Double,
                      cusum_neg: Double, is_drift: Boolean, dropped_late: Boolean)

private case class CusumState(lastTsMillis: Long, sp: Double, sn: Double)

/** Streaming two-sided tabular CUSUM (Page 1954) — the
  * `flatMapGroupsWithState` realization of [[graft.operators.Anomaly.cusum]]:
  *   s⁺ = max(0, s⁺ + z − slack);  s⁻ = max(0, s⁻ − z − slack)
  * with z standardized against a CALIBRATED per-key baseline (μ, σ) fitted
  * on a reference window batch-side — streaming cannot see the full-series
  * moments the batch operator computes, and a drifting online mean would
  * mask exactly the drifts CUSUM exists to catch. Keys absent from the
  * baseline standardize as (0, 1), i.e. pre-standardized input.
  *
  * Same ordering contract as [[StreamingCounterRate]]: in-batch events fold
  * in event-time order; an event at or before the state's last timestamp
  * (late ACROSS batches) is emitted with `dropped_late = true` and null-ish
  * scores rather than corrupting the recursion. State per key is one
  * (ts, s⁺, s⁻) triple — O(active keys).
  */
object StreamingCusum {

  implicit private val outEnc: Encoder[CusumPoint] = Encoders.product[CusumPoint]
  implicit private val stEnc: Encoder[CusumState] = Encoders.product[CusumState]
  implicit private val keyEnc: Encoder[Long] = Encoders.scalaLong

  def scores(events: Dataset[MetricEvent], baseline: Map[Long, (Double, Double)],
             slack: Double = 0.5, h: Double = 5.0,
             watermark: String = "1 hour"): Dataset[CusumPoint] = {
    require(slack >= 0 && h > 0, s"bad slack/h: $slack/$h")
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[MetricEvent], state: GroupState[CusumState]) => {
          val (mu, sd) = baseline.getOrElse(key, (0.0, 1.0))
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0.0, 0.0))
          val out = sorted.map { e =>
            if (e.ts.getTime <= st.lastTsMillis)
              CusumPoint(key, e.ts, 0.0, st.sp, st.sn,
                is_drift = false, dropped_late = true)
            else {
              val z = if (sd > 0) (e.value - mu) / sd else 0.0
              val sp = math.max(0.0, st.sp + z - slack)
              val sn = math.max(0.0, st.sn - z - slack)
              st = CusumState(e.ts.getTime, sp, sn)
              CusumPoint(key, e.ts, z, sp, sn,
                is_drift = sp > h || sn > h, dropped_late = false)
            }
          }
          state.update(st)
          out.iterator
        })
  }
}
