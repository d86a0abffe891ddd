package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{MeasureEvent, StreamingSketch}
import graft.operators.Sketch

/** Streaming sketch tier == batch tierSketch, bucket-map-exact, with the
  * sketch state merged across micro-batch boundaries; the streamed rows
  * feed the batch promote path unchanged.
  */
class StreamingSketchSpec extends SparkSuite {
  import spark.implicits._

  test("streamed 1m sketch tier == batch tierSketch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(37L)
    val t0 = 1700000000L - 1700000000L % 3600
    val events = (0 until 3000).map { i =>
      val v = math.max(1L, math.round(math.exp(rnd.nextGaussian() + 3.0)))
      MeasureEvent(s"g${i % 2}", new Timestamp((t0 + (i.toLong * 7) % 1800) * 1000L), v)
    }

    val mem = MemoryStream[MeasureEvent]
    val q = StreamingSketch.tier(mem.toDS(), bucketSeconds = 60L, alpha = 0.02)
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").start()
    try {
      events.grouped(1100).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    def rendered(df: org.apache.spark.sql.DataFrame) =
      df.select(col("g"), col("bucket_start"), col("cnt"), col("sum_v"),
          col("min_v"), col("max_v"),
          array_sort(map_entries(col("dd_sketch"))).cast("string").as("sk"))
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))))
        .toMap

    val streamed = rendered(spark.table("sketch_stream"))
    val batch = rendered(Sketch.tierSketch(
      events.toDF().withColumnRenamed("v", "value")
        .select(col("g"), col("ts"), col("value").as("v")),
      Seq("g"), "ts", "v", 60L, 0.02))
    assert(streamed == batch)
    assert(streamed.nonEmpty)

    // streamed rows feed the batch promote path unchanged
    val promoted = Sketch.promoteSketch(
      spark.table("sketch_stream"), Seq("g"), 3600L)
    assert(promoted.count() > 0)
  }
}
