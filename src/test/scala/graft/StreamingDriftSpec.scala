package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingDrift, ValueEvent}

/** Streaming PSI per tumbling window equals the batch Drift.psi on the same
  * rows, and a shifted window reads as drifted while a same-distribution
  * window reads as stable.
  */
class StreamingDriftSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)

  test("windowed PSI: batch parity, stable vs shifted windows, state-crossing batches") {
    implicit val sqlCtx = spark.sqlContext
    val refVals = (0 until 100).map(i => (i % 10).toDouble) // uniform 0..9
    val ref = refVals.toDF("v")
    val fitted = StreamingDrift.fitRef(ref, "v", bins = 10)
    assert(fitted.nRef == 100L && fitted.pRef.length == 10)

    val mem = MemoryStream[ValueEvent]
    val q = StreamingDrift.psiStream(mem.toDS(), fitted, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("psi_stream")
      .outputMode("update").start()
    try {
      // window 1 (hour 0): same uniform distribution -> stable
      val w1 = (0 until 50).map(i => ValueEvent(ts(i * 60L), (i % 10).toDouble))
      // window 2 (hour 1): all mass at 9 -> shifted; split across two
      // micro-batches so the window aggregates through state
      val w2a = (0 until 20).map(i => ValueEvent(ts(3600L + i * 60L), 9.0))
      val w2b = (20 until 50).map(i => ValueEvent(ts(3600L + i * 60L), 9.0))
      mem.addData(w1 ++ w2a: _*)
      q.processAllAvailable()
      mem.addData(w2b: _*)
      q.processAllAvailable()

      val rows = spark.table("psi_stream")
        .withColumn("ws", col("window.start"))
        .groupBy("ws").agg(max(struct(col("n_cur"), col("psi"))).as("f"))
        .select(col("ws"), col("f.n_cur"), col("f.psi"))
        .orderBy("ws").collect()
      assert(rows.length == 2)
      val psiStable = rows(0).getDouble(2)
      val psiShifted = rows(1).getDouble(2)
      assert(rows(0).getLong(1) == 50L && rows(1).getLong(1) == 50L)
      assert(psiStable < 0.1, s"same-distribution window should be stable, got $psiStable")
      assert(psiShifted > 0.25, s"full shift must read as drifted, got $psiShifted")

      // batch twin on the same rows: Drift.psi with a constant key
      import graft.operators.Drift
      val refK = ref.withColumn("k", lit(1L))
      Seq((0, w1), (1, w2a ++ w2b)).foreach { case (ix, evs) =>
        val cur = evs.map(e => (1L, e.value)).toDF("k", "v")
        val batch = Drift.psi(refK, cur, Seq("k"), "v", bins = 10)
          .collect()(0).getDouble(1)
        assert(math.abs(batch - rows(ix).getDouble(2)) < 1e-9,
          s"window $ix: stream ${rows(ix).getDouble(2)} != batch $batch")
      }
    } finally q.stop()
  }
}
