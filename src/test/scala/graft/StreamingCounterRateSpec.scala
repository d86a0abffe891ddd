package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{CounterEvent, StreamingCounterRate}

/** Streaming counter deltas == the batch counterRate delta pass on the same
  * events (resets included, deltas crossing micro-batch boundaries), and an
  * out-of-order arrival is surfaced as dropped_late, never folded.
  */
class StreamingCounterRateSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)

  test("deltas match the batch operator across batches; resets and heads agree") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CounterEvent]
    val q = StreamingCounterRate.deltas(mem.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("ctr_stream")
      .outputMode("append").start()
    try {
      // batch 1: key 1 rises 10→20, key 2 head only
      mem.addData(CounterEvent(1L, ts(0), 10.0), CounterEvent(1L, ts(60), 20.0),
        CounterEvent(2L, ts(30), 100.0))
      q.processAllAvailable()
      // batch 2: key 1 RESETS to 5 then rises — the 20→5 delta crosses the
      // micro-batch boundary through state
      mem.addData(CounterEvent(1L, ts(120), 5.0), CounterEvent(1L, ts(180), 8.0))
      q.processAllAvailable()

      val streamed = spark.table("ctr_stream")
        .select("key", "ts", "delta", "is_reset")
        .collect().map(_.toSeq).toSet

      // batch twin: Features.counterRate's delta pass over the union
      val all = Seq((1L, ts(0), 10.0), (1L, ts(60), 20.0), (2L, ts(30), 100.0),
        (1L, ts(120), 5.0), (1L, ts(180), 8.0)).toDF("key", "ts", "counter")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("ts"))
      val d = col("counter") - lag(col("counter"), 1).over(w)
      val batch = all
        .withColumn("delta", when(d.isNull, lit(null).cast("double"))
          .when(d >= 0, d).otherwise(col("counter")))
        .withColumn("is_reset", coalesce(d < 0, lit(false)))
        .select("key", "ts", "delta", "is_reset")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // the reset row specifically: delta = restarted value 5, flagged
      val r = spark.table("ctr_stream").filter(col("ts") === ts(120)).collect().head
      assert(r.getDouble(r.fieldIndex("delta")) == 5.0 && r.getBoolean(r.fieldIndex("is_reset")))
    } finally q.stop()
  }

  test("an out-of-order arrival is emitted as dropped_late, state untouched") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CounterEvent]
    val q = StreamingCounterRate.deltas(mem.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("ctr_late")
      .outputMode("append").start()
    try {
      mem.addData(CounterEvent(1L, ts(100), 50.0))
      q.processAllAvailable()
      mem.addData(CounterEvent(1L, ts(40), 40.0)) // behind the state's ts
      q.processAllAvailable()
      mem.addData(CounterEvent(1L, ts(200), 70.0))
      q.processAllAvailable()
      val rows = spark.table("ctr_late").orderBy("ts").collect()
      assert(rows.length == 3)
      assert(rows(0).getBoolean(rows(0).fieldIndex("dropped_late")) &&
        rows(0).isNullAt(rows(0).fieldIndex("delta")), "late row surfaced, not folded")
      // the 50→70 delta is computed as if the late row never existed
      val last = rows(2)
      assert(last.getDouble(last.fieldIndex("delta")) == 20.0 &&
        !last.getBoolean(last.fieldIndex("dropped_late")))
    } finally q.stop()
  }
}
