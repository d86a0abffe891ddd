package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anomaly detection over rolled-up series: robust (median/MAD) outlier
  * flags and a two-window mean-shift changepoint score.
  *
  * The reference stops at error metrics (interpret.py:47-115) — production
  * monitoring of the same rolled-up series needs "which points are broken"
  * and "where did the level shift", and both are pure relational algebra
  * over the tier tables this engine already produces.
  *
  * Scale design:
  *   - [[madOutliers]] is two grouped EXACT-median aggregates + two
  *     broadcast-able joins on the hierarchy keys — the per-key stats frame
  *     is tier-cardinality-sized (tiny next to the series), never a global
  *     sort. At extreme key cardinality both joins are plain shuffled
  *     hash joins on the same key — still two narrow passes.
  *   - [[meanShiftScore]] is one window shuffle (both frames share the
  *     (keys, ts) sort), rows-frame aggregates only — codegen'd, no UDF.
  */
object Anomaly {

  /** Robust outlier flags via the modified z-score (Iglewicz & Hoaglin 1993,
    * "How to Detect and Handle Outliers" — public):
    *   med  = median(v) per key
    *   mad  = median(|v − med|) per key
    *   z    = 0.6745·(v − med)/mad     (0.6745 ≈ Φ⁻¹(0.75): MAD→σ for normals)
    *   flag = |z| > threshold          (3.5 is the standard cut)
    * A key whose MAD is 0 (over half the points identical) yields null z and
    * false flags — the robust scale is undefined, not infinite.
    *
    * Output: input columns + `med, mad, robust_z, is_outlier`.
    */
  def madOutliers(df: DataFrame, keyCols: Seq[String], valCol: String,
                  threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val v = col(valCol).cast("double")
    val med = df.groupBy(keyCols.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("med"))
    val withMed = df.join(med, keyCols)
    val mad = withMed.groupBy(keyCols.map(col): _*)
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"))
    withMed.join(mad, keyCols)
      .withColumn("robust_z",
        when(col("mad") > 0, lit(0.6745) * (v - col("med")) / col("mad")))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }

  /** Two-window mean-shift changepoint score (CUSUM-adjacent, but windowed
    * so it is pure window algebra — the standard "compare the last w points
    * against the next w points" scan statistic):
    *
    * At each row t, left = rows [t−w, t−1], right = rows [t, t+w−1];
    *   score(t) = |mean(right) − mean(left)| / sqrt(var(left)/w + var(right)/w)
    * — Welch's t-statistic of the two windows. Null unless both windows are
    * FULL (w rows each) and the pooled variance is positive; high scores mark
    * level shifts.
    *
    * Output: input columns + `mean_l, mean_r, shift_score`.
    */
  def meanShiftScore(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     valCol: String, w: Int): DataFrame = {
    require(w >= 2, s"window w must be >= 2 (variance needs 2 points), got $w")
    val v = col(valCol).cast("double")
    val base = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val left = base.rowsBetween(-w, -1)
    val right = base.rowsBetween(0, w - 1)
    val full = count(v).over(left) === w && count(v).over(right) === w
    val pooled = var_samp(v).over(left) / w + var_samp(v).over(right) / w
    df.withColumn("mean_l", when(full, avg(v).over(left)))
      .withColumn("mean_r", when(full, avg(v).over(right)))
      .withColumn("shift_score",
        when(full && pooled > 0,
          abs(avg(v).over(right) - avg(v).over(left)) / sqrt(pooled)))
  }
}
