package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup

/** Streaming dedup == batch distinct for in-watermark re-deliveries; a
  * duplicate arriving after its id's state expired is passed through (the
  * documented bounded-state trade-off).
  */
case class StreamDoc(doc_id: Long, ts: Timestamp, payload: String)

class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)

  test("in-watermark re-deliveries dropped; post-expiry duplicate passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val stream = StreamingDedup.dedupStream(mem.toDF(), Seq("doc_id"), "ts",
      watermark = "60 seconds")
    val q = stream.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // first batch: 1,2 and an immediate re-delivery of 1
      mem.addData(StreamDoc(1L, ts(0), "a"), StreamDoc(2L, ts(5), "b"),
        StreamDoc(1L, ts(10), "a-dup"))
      q.processAllAvailable()
      // second batch: another in-watermark re-delivery of 2
      mem.addData(StreamDoc(2L, ts(20), "b-dup"))
      q.processAllAvailable()
      val t1 = spark.table("dedup_stream")
      assert(t1.count() === 2)
      assert(t1.filter(col("doc_id") === 1L).count() === 1)
      assert(t1.filter(col("payload") === "a").count() === 1, "FIRST delivery wins")
      // advance event time far past the watermark so id 1's state expires…
      mem.addData(StreamDoc(99L, ts(10000), "sentinel"))
      q.processAllAvailable()
      // …then a very late duplicate of 1 is NOT caught (state reclaimed)
      mem.addData(StreamDoc(1L, ts(10010), "a-late"))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
      assert(rows.filter(col("doc_id") === 1L).count() === 2,
        "post-expiry duplicate passes through — batch sweep catches it")
      // batch parity on the IN-watermark prefix: distinct ids 1,2
      assert(rows.filter(col("doc_id") < 99L && col("ts") < ts(100)).count() === 2)
    } finally q.stop()
  }
}
