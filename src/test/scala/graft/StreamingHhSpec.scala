package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{ItemEvent, StreamingHeavyHitters}
import graft.operators.HeavyHitters

/** Streaming Misra–Gries candidates across micro-batch boundaries: the
  * MG guarantee (every item above n/k survives; lb ≤ true ≤ lb + err_ub)
  * must hold on the FINAL state regardless of how the stream was split
  * into batches, and an exact recount of the streamed candidates must
  * equal the batch two-pass operator's answer.
  */
class StreamingHhSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)

  test("streamed MG candidates: guarantee + exact-recount parity with batch") {
    implicit val sqlCtx = spark.sqlContext
    val k = 32
    // adversarial: tail first, hot items only in the LAST batch — counters
    // for hot items must survive the eviction pressure of earlier batches
    val rnd = new scala.util.Random(17L)
    val rows: Seq[(String, String)] =
      (for (g <- Seq("a", "b"); i <- 0 until 1600) yield {
        val item = if (i < 1200) s"t${rnd.nextInt(800)}" else s"hot${i % 4}"
        (g, item)
      })
    val events = rows.zipWithIndex.map { case ((g, item), i) =>
      ItemEvent(g, ts(i.toLong), item)
    }

    val mem = MemoryStream[ItemEvent]
    val q = StreamingHeavyHitters.candidates(mem.toDS(), k)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      events.grouped(1100).foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // final snapshot = rows from the batch where n reached the group total
    val snap = spark.table("hh_stream")
      .withColumn("max_n", max(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("n") === col("max_n"))
      .select("g", "item", "count_lb", "err_ub", "n")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    val cands = snap.map(_._1).toSet

    val exact = rows.groupBy(identity).map { case ((g, i), v) => ((g, i), v.size.toLong) }
    val nByG = rows.groupBy(_._1).map { case (g, v) => (g, v.size.toLong) }

    // every item above n/k is present; bounds hold for every candidate
    exact.foreach { case ((g, i), c) =>
      if (c > nByG(g) / k) assert(cands.contains((g, i)), s"lost frequent item $g/$i ($c)")
    }
    snap.foreach { case ((g, i), (lb, ub, n)) =>
      val t = exact((g, i))
      assert(lb <= t && t <= lb + ub, s"$g/$i bounds violated: lb=$lb ub=$ub true=$t")
      assert(ub <= n / (k + 1), s"$g decrement total above n/(k+1)")
    }

    // exact recount of streamed candidates, thresholded == batch operator
    val thr = nByG.map { case (g, n) => (g, n / k + 1) }
    val streamedAnswer = exact.filter { case ((g, i), c) =>
      cands.contains((g, i)) && c >= thr(g)
    }.map { case ((g, i), c) => (g, i, c) }.toSet
    val batchAnswer = HeavyHitters.frequentItems(
        rows.toDF("g", "item"), Seq("g"), "item", k)
      .select("g", "item", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamedAnswer == batchAnswer)
    assert(batchAnswer.nonEmpty)
  }
}
