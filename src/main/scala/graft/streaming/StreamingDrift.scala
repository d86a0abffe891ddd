package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A raw numeric observation on the stream. */
case class ValueEvent(ts: Timestamp, value: Double)

/** Fitted PSI reference profile: fixed-width bin geometry over [lo, hi] plus
  * the Laplace-smoothed reference share per bin — B+3 numbers, a plan-time
  * constant (the same bounded-collect license as the IVF centroids and LSH
  * hyperplanes).
  */
case class PsiRef(lo: Double, hi: Double, nRef: Long, pRef: Array[Double])

/** Streaming distribution drift: the [[graft.operators.Drift.psi]] score per
  * tumbling event-time window against a STATIC reference window — the
  * monitoring loop that pages before downstream quality metrics move. The
  * reference profile is fitted once (batch) and folded into the streaming
  * plan as literals, so the stream side is ONE watermarked windowed
  * aggregation: per-bin conditional counts ride the same shuffle as the
  * total, and the PSI is a pure projection over the closed bucket. No
  * stream-static join, no second aggregation, state = one row per open
  * window.
  */
object StreamingDrift {

  /** Fit the reference profile from a batch frame (same binning + smoothing
    * as [[graft.operators.Drift.psi]]: fixed-width bins over [min, max],
    * p = (c + 0.5)/(n + B/2)).
    */
  def fitRef(ref: DataFrame, valueCol: String, bins: Int = 10): PsiRef = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = col(valueCol).cast("double")
    val st = ref.filter(v.isNotNull)
      .agg(min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n")).collect()(0)
    val lo = st.getDouble(0); val hi = st.getDouble(1); val n = st.getLong(2)
    require(n > 0, "reference window is empty")
    val counts = ref.filter(v.isNotNull)
      .withColumn("_bin", binOf(v, lo, hi, bins))
      .groupBy("_bin").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p = Array.tabulate(bins)(b =>
      (counts.getOrElse(b.toLong, 0L) + 0.5) / (n + 0.5 * bins))
    PsiRef(lo, hi, n, p)
  }

  private def binOf(v: org.apache.spark.sql.Column, lo: Double, hi: Double,
                    bins: Int): org.apache.spark.sql.Column =
    if (hi == lo) lit(0L)
    else least(lit(bins - 1L), greatest(lit(0L),
      floor((v - lit(lo)) / lit(hi - lo) * bins)))

  /** PSI per tumbling window. Update mode while a window is open; with the
    * watermark, a closed window's row is final. Output:
    * (window, n_cur, psi).
    */
  def psiStream(events: Dataset[ValueEvent], ref: PsiRef,
                windowDuration: String, watermark: String): DataFrame = {
    val bins = ref.pRef.length
    val binned = events.toDF()
      .withWatermark("ts", watermark)
      .withColumn("_bin", binOf(col("value").cast("double"), ref.lo, ref.hi, bins))
    val counts = (0 until bins).map(b =>
      sum(when(col("_bin") === b, lit(1L)).otherwise(lit(0L))).as(s"_c$b"))
    val agged = binned
      .groupBy(window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("n_cur"), counts: _*)
    val psi = (0 until bins).map { b =>
      val pc = (col(s"_c$b") + lit(0.5)) / (col("n_cur") + lit(0.5) * bins)
      (pc - lit(ref.pRef(b))) * log(pc / lit(ref.pRef(b)))
    }.reduce(_ + _)
    agged.select(col("window"), col("n_cur"), psi.as("psi"))
  }
}
