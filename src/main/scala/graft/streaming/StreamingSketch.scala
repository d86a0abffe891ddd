package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** A keyed non-negative integer measure on the stream. */
case class MeasureEvent(g: String, ts: Timestamp, v: Long)

/** Streaming sketch tier — the watermarked realization of
  * [[graft.operators.Sketch.tierSketch]]: one windowed aggregation whose
  * distribution state is the DDSketch bucket map (bounded ~550 entries per
  * open bucket, merged across micro-batches by counter sums — the exact
  * associativity [[Sketch.promoteSketch]] relies on batch-side). Late data
  * within the watermark lands in its original bucket; the batch promote
  * path replays anything later, same contract as `StreamingRollup`.
  *
  * The bucket function is the same JVM arithmetic as the batch column
  * (`ceil(ln v / ln γ)` via `Math.log`), so stream == batch is
  * bucket-for-bucket EXACT (StreamingSketchSpec asserts map equality with
  * [[Sketch.tierSketch]] across micro-batch splits).
  */
object StreamingSketch {

  /** Map-building DDSketch Aggregator: buffer = bucket→count, merge =
    * counter sums. Used streaming-side where the batch two-stage groupBy
    * is unavailable (one aggregation per streaming query).
    */
  private class DdMapAgg(alpha: Double)
      extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
    private val lg = math.log(Sketch.gamma(alpha))
    private def bucket(v: Long): Long =
      if (v <= 0L) -1L else math.ceil(math.log(v.toDouble) / lg).toLong
    def zero: Map[Long, Long] = Map.empty
    def reduce(m: Map[Long, Long], v: Long): Map[Long, Long] = {
      val b = bucket(v)
      m.updated(b, m.getOrElse(b, 0L) + 1L)
    }
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
    def finish(m: Map[Long, Long]): Map[Long, Long] = m
    def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  }

  /** Watermarked sketch tier over the stream: same output schema as
    * [[Sketch.tierSketch]] (keys, bucket_start, cnt/sum_v/min_v/max_v,
    * dd_sketch map) — rows feed [[Sketch.promoteSketch]] /
    * [[Sketch.quantileFromMap]] unchanged.
    */
  def tier(events: Dataset[MeasureEvent], bucketSeconds: Long, alpha: Double,
           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("g"), window(col("ts"), s"$bucketSeconds seconds").as("w"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        udaf(new DdMapAgg(alpha)).apply(col("v")).as("dd_raw"))
      .withColumn("bucket_start", unix_timestamp(col("w.start")))
      // normalize to the batch tier's sorted-entry map rendering
      .withColumn("dd_sketch",
        map_from_entries(array_sort(map_entries(col("dd_raw")))))
      .drop("w", "dd_raw")
}
