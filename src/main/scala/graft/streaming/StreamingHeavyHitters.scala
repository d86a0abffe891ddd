package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters

/** A keyed item observation on the stream. */
case class ItemEvent(g: String, ts: Timestamp, item: String)

/** One candidate row per (group, surviving counter) per micro-batch:
  * `count_lb = counter` is a LOWER bound on the item's true count so far and
  * `count_lb + err_ub` an upper bound, with `err_ub ≤ n/k` the group's
  * Misra–Gries decrement total. Every item with true count > n/k is
  * guaranteed present.
  */
case class HhCandidate(g: String, item: String, count_lb: Long, err_ub: Long,
                       n: Long)

private case class HhState(items: Array[String], counts: Array[Long],
                           decremented: Long, n: Long)

/** Streaming exact-superset heavy hitters — the `flatMapGroupsWithState`
  * realization of [[graft.operators.HeavyHitters]]' pass 1: a bounded
  * k-counter Misra–Gries summary per group, folded across micro-batches
  * through state, emitting the full candidate set each batch (Update mode —
  * downstream either re-counts candidates exactly against storage, exactly
  * as the batch operator's pass 2 does, or consumes the (lb, ub) bounds
  * directly). State per group is ≤ k (item, count) pairs + 2 longs —
  * independent of stream length; the item tail never enters state.
  *
  * The MG fold is the SAME code as the batch operator
  * ([[HeavyHitters.mgReduce]]/[[HeavyHitters.mgMerge]]), so stream-vs-batch
  * parity is structural; StreamingHhSpec asserts candidate-set equality
  * with the batch aggregator and the ⊇-frequent-items guarantee across
  * adversarial batch splits.
  */
object StreamingHeavyHitters {

  implicit private val outEnc: Encoder[HhCandidate] = Encoders.product[HhCandidate]
  implicit private val stEnc: Encoder[HhState] = Encoders.product[HhState]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  def candidates(events: Dataset[ItemEvent], k: Int): Dataset[HhCandidate] = {
    require(k >= 2, s"k must be >= 2, got $k")
    events
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[ItemEvent], state: GroupState[HhState]) => {
          val st = state.getOption.getOrElse(HhState(Array.empty, Array.empty, 0L, 0L))
          var m = st.items.zip(st.counts).toMap
          var dec = st.decremented
          var n = st.n
          it.foreach { e =>
            if (e.item != null) {
              val sizeBefore = m.size
              m = HeavyHitters.mgReduce(m, e.item, k)
              // a reduce that shrank (or kept) a full map decremented all
              if (sizeBefore == k && !m.contains(e.item)) dec += 1
              n += 1
            }
          }
          val items = m.keys.toArray.sorted
          state.update(HhState(items, items.map(m), dec, n))
          items.iterator.map(i => HhCandidate(g, i, m(i), dec, n))
        })
  }
}
