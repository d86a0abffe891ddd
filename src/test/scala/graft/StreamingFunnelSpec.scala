package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{FunnelEvent, StreamingFunnel}
import graft.operators.Sessions

/** Streaming funnel parity: the greedy stateful fold's FINAL per-key
  * snapshot must equal the batch [[Sessions.windowFunnel]] chain
  * (max_step + every step timestamp) on the same events, regardless of
  * how the stream was split into micro-batches — plus the late-data
  * contract: a trailing all-stale batch only increments n_late, never
  * mutates an established chain.
  */
class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp(sec * 1000L)
  private val base = 1704067200L

  test("streamed funnel == batch windowFunnel across adversarial splits; late events only count") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "cart", "buy")
    val window = 100L
    val rnd = new scala.util.Random(99L)
    val types = Seq("view", "cart", "buy", "noise", "other")

    // randomized bulk: 10 keys, distinct per-key seconds so the chain is
    // tie-free (exact-stamp ties are the documented measure-zero caveat)
    val bulk = (1L to 10L).flatMap { k =>
      val n = 20 + rnd.nextInt(30)
      rnd.shuffle((0 until 400).toList).take(n).sorted
        .map(s => FunnelEvent(k, t(base + s), types(rnd.nextInt(types.length))))
    }
    // hand scenarios (seconds ≥ base+1000, disjoint from the bulk range)
    val hand = Seq(
      (21L, Seq(1000L -> "view", 1010L -> "cart", 1050L -> "buy")),        // full chain
      (22L, Seq(1000L -> "cart", 1020L -> "buy")),                         // never starts
      (23L, Seq(1000L -> "view", 1150L -> "cart", 1160L -> "buy")),        // window breaks chain
      (24L, Seq(1000L -> "noise", 1001L -> "other")),                      // max_step 0
      (25L, Seq(1000L -> "cart", 1005L -> "view", 1010L -> "cart", 1020L -> "buy")), // pre-anchor step-2 ignored
      (26L, Seq(1000L -> "view", 1001L -> "view", 1098L -> "cart", 1099L -> "buy")), // boundary inside window
      (27L, Seq(1000L -> "view", 1001L -> "buy", 1002L -> "cart", 1003L -> "buy"))   // out-of-order step types
    ).flatMap { case (k, evs) => evs.map { case (s, ty) => FunnelEvent(k, t(base + s), ty) } }
    val all = (bulk ++ hand).sortBy(_.ts.getTime)

    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.progress(mem.toDS(), steps, window)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      // 5 time-ordered chunks, shuffled INSIDE each chunk (the fold sorts
      // in-batch; only cross-batch order is the contract)
      all.grouped((all.size + 4) / 5).foreach { chunk =>
        mem.addData(rnd.shuffle(chunk.toList): _*)
        q.processAllAvailable()
      }
      val snap = latestSnapshots()
      val batch = Sessions.windowFunnel(
          all.toDF("key", "ts", "etype"), Seq("key"), "ts", "etype", steps, window)
        .select(col("key"), col("max_step"),
          unix_micros(col("t1")).as("u1"), unix_micros(col("t2")).as("u2"),
          unix_micros(col("t3")).as("u3"))
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), Seq(1, 2, 3).map(i =>
            if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))))).toMap
      assert(snap.keySet === batch.keySet)
      batch.foreach { case (k, (mx, ts3)) =>
        val (smx, sts, late) = snap(k)
        assert(smx === mx, s"key $k: stream max_step $smx != batch $mx")
        assert(late === 0L, s"key $k: unexpected late drops in ordered feed")
        (0 until mx).foreach { i =>
          assert(Some(sts(i)) === ts3(i), s"key $k step ${i + 1} ts mismatch")
        }
        assert(sts.size === mx)
      }
      assert(batch.values.map(_._1).toSet === Set(0, 1, 2, 3),
        "generator must cover every funnel depth")

      // late-data contract: replay a stale batch (every event at or before
      // each key's last processed stamp) — chains unchanged, n_late counts
      val stale = hand.filter(_.key == 21L)
      mem.addData(stale: _*)
      q.processAllAvailable()
      val after = latestSnapshots()
      assert(after(21L)._1 === snap(21L)._1 && after(21L)._2 === snap(21L)._2,
        "stale replay mutated an established chain")
      assert(after(21L)._3 === stale.size.toLong, "stale events not counted late")
    } finally q.stop()
  }

  /** Latest snapshot per key = the row with that key's max monotone n_seen. */
  private def latestSnapshots(): Map[Long, (Int, Seq[Long], Long)] =
    spark.table("funnel_stream")
      .withColumn("mx", max(col("n_seen")).over(Window.partitionBy(col("key"))))
      .filter(col("n_seen") === col("mx"))
      .select("key", "max_step", "step_ts_us", "n_late")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2), r.getLong(3))))
      .toMap
}
