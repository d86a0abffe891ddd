package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) selection: rows not dominated on two
  * maximize-goals — the "best tradeoff" corpus view (e.g. longest AND
  * highest-quality documents for curriculum sampling).
  *
  * Dominance: row r is OUT when some other row is ≥ on both attributes
  * and > on at least one. Computed as a left-anti self-join on the
  * dominance predicate. The pair join is O(n²) worst-case — fine at the
  * AGGREGATED grain this engine feeds it; the documented scale path for
  * raw corpora is a grid prefilter (partition the (x, y) plane, keep each
  * cell's corner candidates, then run the exact join on the survivors —
  * the [[Dedup]] candidate-then-verify shape). Integer attributes make
  * the dominance predicate bit-exact cross-engine.
  */
object Skyline {

  /** Rows of `df` on the maximize-maximize Pareto front of (xCol, yCol).
    * Ties: duplicate points are NOT dominated by each other (strict-in-one
    * rule), so equal-coordinate rows all survive together.
    */
  def paretoFront(df: DataFrame, idCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val self = df.select(col(xCol).as("_dx"), col(yCol).as("_dy"))
    val dominated = (col(xCol) <= col("_dx")) && (col(yCol) <= col("_dy")) &&
      ((col(xCol) < col("_dx")) || (col(yCol) < col("_dy")))
    df.join(self, dominated, "left_anti")
  }
}
