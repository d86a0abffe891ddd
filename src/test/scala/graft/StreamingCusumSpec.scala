package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{MetricEvent, StreamingCusum}

/** Streaming CUSUM == the batch Anomaly.cusum on the same events when the
  * stream's baseline equals the batch operator's full-series moments, with
  * the recursion crossing micro-batch boundaries through state; late
  * arrivals surface as dropped_late.
  */
class StreamingCusumSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)

  test("scores match batch cusum across micro-batches; drift fires on a level shift") {
    implicit val sqlCtx = spark.sqlContext
    // level shift at t>=10: 0-ish then 8-ish
    val vals = (0 until 10).map(i => (i, 0.0 + (i % 3))) ++
      (10 until 20).map(i => (i, 8.0 + (i % 3)))
    val events = vals.map { case (i, v) => MetricEvent(1L, ts(i * 60L), v) }
    val mu = vals.map(_._2).sum / vals.size
    val sd = math.sqrt(vals.map(v => (v._2 - mu) * (v._2 - mu)).sum / vals.size)
    val baseline = Map(1L -> (mu, sd))

    val mem = MemoryStream[MetricEvent]
    val q = StreamingCusum.scores(mem.toDS(), baseline, slack = 0.5, h = 3.0)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      // the recursion must cross this batch boundary through state
      mem.addData(events.take(7): _*)
      q.processAllAvailable()
      mem.addData(events.drop(7): _*)
      q.processAllAvailable()

      val streamed = spark.table("cusum_stream")
        .select("ts", "z", "cusum_pos", "cusum_neg", "is_drift")
        .collect().map(r => (r.getTimestamp(0).getTime,
          (math.rint(r.getDouble(1) * 1e9), math.rint(r.getDouble(2) * 1e9),
            math.rint(r.getDouble(3) * 1e9), r.getBoolean(4)))).toMap

      val batch = graft.operators.Anomaly.cusum(
        events.map(e => (1L, e.ts, e.hashCode.toLong, e.value))
          .toDF("k", "ts", "tie", "v")
          .withColumn("tie", lit(0L)),
        Seq("k"), "ts", "tie", "v", slack = 0.5, h = 3.0)
        .collect().map(r => (r.getLong(r.fieldIndex("ts_sec")) * 1000L,
          (math.rint(r.getDouble(r.fieldIndex("z")) * 1e9),
            math.rint(r.getDouble(r.fieldIndex("cusum_pos")) * 1e9),
            math.rint(r.getDouble(r.fieldIndex("cusum_neg")) * 1e9),
            r.getBoolean(r.fieldIndex("is_drift"))))).toMap

      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (t, s) =>
        assert(s == batch(t), s"mismatch at $t: stream $s vs batch ${batch(t)}")
      }
      // the shift is detected
      assert(streamed.values.exists(_._4), "level shift must trip the CUSUM")
    } finally q.stop()
  }

  test("late arrival across batches is dropped_late, state untouched") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MetricEvent]
    val q = StreamingCusum.scores(mem.toDS(), Map(1L -> (0.0, 1.0)),
      watermark = "2 hours")
      .writeStream.format("memory").queryName("cusum_late")
      .outputMode("append").start()
    try {
      mem.addData(MetricEvent(1L, ts(600), 1.0))
      q.processAllAvailable()
      mem.addData(MetricEvent(1L, ts(300), 99.0), MetricEvent(1L, ts(900), 1.0))
      q.processAllAvailable()
      val rows = spark.table("cusum_late").orderBy("ts").collect()
      assert(rows.length == 3)
      assert(rows(0).getAs[Boolean]("dropped_late"),
        "the rewound event must be flagged late")
      // the late 99.0 never entered the recursion: the last point's s+ grows
      // only by the two legitimate z=1.0 steps (1-0.5)+(1-0.5)
      assert(math.abs(rows(2).getAs[Double]("cusum_pos") - 1.0) < 1e-12)
    } finally q.stop()
  }
}
