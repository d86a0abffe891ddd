package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (outlier-resistant) trend estimation.
  *
  * Web-telemetry role: per-series activity trends where a single crawler
  * burst or outage day would wreck an OLS slope — the median-of-slopes
  * estimator has a 29% breakdown point (up to ~29% of points can be
  * arbitrary garbage before the slope moves).
  */
object Robust {

  /** Theil–Sen slope (Theil 1950, Sen 1968, public papers) per group:
    * the MEDIAN of all pairwise slopes (y_j − y_i)/(x_j − x_i) over points
    * with distinct x. Exact (no approximation) — median by exact
    * interpolating percentile, identical to SQL `quantile_cont(0.5)`.
    *
    * Determinism note for oracle parity: when y is integer-valued (e.g. a
    * daily event count) every slope is ONE IEEE division of exact
    * integers, and the median interpolates at most two such doubles — no
    * float summation anywhere, so the result is bit-identical across
    * engines and shuffle orders.
    *
    * Scale: the pair self-join is O(n²) per group — intended for series of
    * PRE-AGGREGATED points (daily/hourly tier rows, n in the hundreds),
    * never raw events; `maxPoints` enforces that contract at runtime
    * (fails loudly instead of silently exploding a year of 1m points into
    * 10¹⁰ pairs). Groups are independent — the join key is the group, so
    * the work distributes and the hottest group costs n² only locally.
    *
    * Returns one row per group: (groupCols…, n_points, ts_slope).
    */
  def theilSenSlope(df: DataFrame, groupCols: Seq[String], xCol: String,
                    yCol: String, maxPoints: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "theilSenSlope needs at least one group column")
    val pts = df.select((groupCols.map(col) :+
      col(xCol).cast("double").as("_x") :+ col(yCol).cast("double").as("_y")): _*)
      .localCheckpoint() // consumed twice (both join sides) + the size gate
    val sizes = pts.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n_points"))
    val tooBig = sizes.filter(col("n_points") > maxPoints).limit(1).collect() // bounded: 0 or 1 row
    require(tooBig.isEmpty,
      s"a group exceeds maxPoints=$maxPoints points — feed tier-aggregated series, not raw events")
    val a = pts.toDF((groupCols :+ "_x1" :+ "_y1"): _*)
    val b = pts.toDF((groupCols :+ "_x2" :+ "_y2"): _*)
    val slopes = a.join(b, groupCols)
      .filter(col("_x1") < col("_x2"))
      .select((groupCols.map(col) :+
        ((col("_y2") - col("_y1")) / (col("_x2") - col("_x1"))).as("_slope")): _*)
    // right join keeps 1-point groups (no pairs) with a null slope
    slopes.groupBy(groupCols.map(col): _*)
      .agg(expr("percentile(_slope, 0.5)").as("ts_slope"))
      .join(sizes, groupCols, "right")
      .select((groupCols.map(col) :+ col("n_points") :+ col("ts_slope")): _*)
  }
}
