package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact frequent-items (heavy hitters) at corpus scale — the two-pass
  * Misra–Gries pattern (Misra & Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS 2012 — public papers, independent
  * realization).
  *
  * Why not `groupBy(item).count`: at 100 TB the item domain (tokens,
  * shingles, query strings) can be 10¹⁰+ distinct values — the full
  * aggregation shuffles and materializes the entire long tail to answer a
  * question about the top handful. Misra–Gries keeps a BOUNDED summary of
  * k counters per group with the guarantee that every item of true
  * frequency > N/k survives; a second pass re-counts only those ≤ k
  * candidates exactly. The tail never shuffles: pass 1 moves k counters
  * per map task, pass 2 counts against a broadcast candidate set.
  *
  * EXACTNESS: the final filter keeps items with exact count ≥ max(minCount,
  * floor(N_g/k) + 1) per group. Anything above floor(N_g/k) is guaranteed
  * to survive pass 1, so the output equals the full `groupBy.count HAVING`
  * answer exactly — verified against the DuckDB oracle (q191) and by
  * PipelineOpsSpec on adversarial streams.
  */
object HeavyHitters {

  /** One Misra–Gries fold step: increment a live counter, insert while
    * under budget, else the classic decrement-all (drop zeros). Shared by
    * the batch Aggregator and [[graft.streaming.StreamingHeavyHitters]] so
    * stream-vs-batch parity is structural.
    */
  private[graft] def mgReduce(b: Map[String, Long], item: String, k: Int): Map[String, Long] = {
    if (item == null) b
    else if (b.contains(item)) b.updated(item, b(item) + 1L)
    else if (b.size < k) b.updated(item, 1L)
    else b.iterator.map { case (i, c) => (i, c - 1L) }
      .filter(_._2 > 0L).toMap
  }

  /** Merge two MG summaries: counter-wise sum, then if over k entries
    * subtract the (k+1)-st largest count from all and drop non-positives
    * (the standard mergeable-summary reduction — keeps the N/k bound).
    */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val m = mutable.Map.empty[String, Long]
    a.foreach { case (i, c) => m(i) = m.getOrElse(i, 0L) + c }
    b.foreach { case (i, c) => m(i) = m.getOrElse(i, 0L) + c }
    if (m.size <= k) m.toMap
    else {
      val kth = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.iterator.map { case (i, c) => (i, c - kth) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Misra–Gries summary Aggregator: at most k counters; buffer is a
    * ≤ k-entry map regardless of input size.
    */
  private class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k >= 1, s"misra-gries k must be >= 1, got $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      mgReduce(b, item, k)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(a, b, k)
    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Exact heavy hitters of `itemCol` per `keys` group.
    *
    * Pass 1: one Misra–Gries aggregation per group (k counters, map-side
    * combined). Pass 2: explode the ≤ k candidates per group, broadcast
    * them, and re-count exactly with an inner join — only candidate rows
    * reach the second aggregation. The threshold max(minCount,
    * floor(N_g/k)+1) makes the result EXACT: nothing above N_g/k can be
    * missed by pass 1, and counts come from the exact pass.
    *
    * Output: keys, item, cnt (exact), n_group, threshold.
    */
  def frequentItems(df: DataFrame, keys: Seq[String], itemCol: String,
                    k: Int, minCount: Long = 1L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val kcols = keys.map(col)
    val rows = df.select(kcols :+ col(itemCol).cast("string").as("hh_item"): _*)
      .filter(col("hh_item").isNotNull)

    val summaries = rows
      .groupBy(kcols: _*)
      .agg(udaf(new MgAgg(k)).apply(col("hh_item")).as("hh_cands"),
        count(lit(1)).as("n_group"))

    val candidates = summaries
      .select(kcols :+ col("n_group") :+ explode(col("hh_cands")).as("hh_item"): _*)

    rows
      .join(broadcast(candidates), keys :+ "hh_item")
      .groupBy(kcols :+ col("hh_item").as("item") :+ col("n_group"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("threshold",
        greatest(lit(minCount), floor(col("n_group") / k) + 1))
      .filter(col("cnt") >= col("threshold"))
  }
}
