package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSessions

/** Streaming session_window sessions == batch gap-split sessions on the same
  * events (start, event count, end = last + gap), and append mode emits a
  * session only after the watermark passes its end.
  */
case class StreamEvent(user_id: Long, ts: Timestamp, v: Double)

class StreamingSessionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)

  test("closed streaming sessions equal batch sessionize (start, count, end=last+gap)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val stream = StreamingSessions.sessionStream(mem.toDF(), Seq("user_id"),
      "ts", gap = "30 seconds", watermark = "0 seconds", valueCol = Some("v"))
    val q = stream.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // user 1: [0,10,25] one session, [120] another; user 2: lone event.
      // No inter-event gap is exactly 30 s (the one boundary where the
      // half-open streaming window and the batch `diff > gap` split differ).
      val events = Seq(
        StreamEvent(1L, ts(0), 1.0), StreamEvent(1L, ts(10), 2.0),
        StreamEvent(1L, ts(25), 4.0), StreamEvent(1L, ts(120), 8.0),
        StreamEvent(2L, ts(40), 16.0))
      mem.addData(events: _*)
      q.processAllAvailable()
      // sentinel on an unused key pushes the watermark past every session end
      mem.addData(StreamEvent(99L, ts(100000), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_stream")
        .filter(col("user_id") < 99L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
        .collect().map(_.toSeq).toSet

      val batch = graft.operators.Sessions.sessionize(
          events.toDF(), Seq("user_id"), "ts", gapSeconds = 30L)
        .groupBy("user_id", "session_idx")
        .agg(min(col("ts")).as("session_start"),
          (max(col("ts")) + expr("INTERVAL 30 SECONDS")).as("session_end"),
          count(lit(1)).as("n_events"), sum(col("v")).as("sum_value"))
        .drop("session_idx")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.size === 3)
    } finally q.stop()
  }

  test("append emits a session only after the watermark passes its end") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val stream = StreamingSessions.sessionStream(mem.toDF(), Seq("user_id"),
      "ts", gap = "30 seconds", watermark = "60 seconds")
    val q = stream.writeStream.format("memory").queryName("sess_append")
      .outputMode("append").start()
    try {
      mem.addData(StreamEvent(1L, ts(0), 1.0))
      q.processAllAvailable()
      // watermark = 0 - 60 s: the open session [0, 30) is not closed yet
      assert(spark.table("sess_append").count() === 0)
      // an event within the gap EXTENDS the session instead of closing it
      mem.addData(StreamEvent(1L, ts(20), 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_append").count() === 0)
      // advance event time past end (50 s) + watermark (60 s)
      mem.addData(StreamEvent(2L, ts(200), 1.0))
      q.processAllAvailable()
      mem.addData(StreamEvent(2L, ts(400), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_append").filter(col("user_id") === 1L).collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Timestamp]("session_start") === ts(0))
      assert(rows.head.getAs[Timestamp]("session_end") === ts(50))
      assert(rows.head.getAs[Long]("n_events") === 2L)
    } finally q.stop()
  }
}
