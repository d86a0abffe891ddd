package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column scalers with persisted parameters + inverses — the reference's
  * transform layer (/root/reference/forecastframe/transform.py): log1p
  * (:89-97) / expm1 inverse (:264-265), standardize (:127-140) + inverse
  * (:238-239), min-max normalize (:175-186) + inverse (:242-243), and the
  * stored-parameter replay `_apply_transform_dict` (:189-204).
  *
  * Parameters are collected once per fit (a 2-value aggregate — one tiny
  * job) and inlined as literals, exactly how the reference stores them in
  * `self.transforms`; predictions descale via [[ScalerParams.inverse]].
  * The metadata is a plain case class — persist as JSON next to outputs
  * (no JVM pickling; SURVEY.md §1.3).
  */
object Scalers {

  sealed trait ScalerParams {
    def column: String
    def apply(c: Column): Column
    def inverse(c: Column): Column
  }
  case class Log1pParams(column: String) extends ScalerParams {
    def apply(c: Column): Column = log1p(c)
    def inverse(c: Column): Column = expm1(c)
  }
  case class StandardizeParams(column: String, mean: Double, std: Double) extends ScalerParams {
    def apply(c: Column): Column = (c - mean) / (if (std == 0) 1.0 else std)
    def inverse(c: Column): Column = c * (if (std == 0) 1.0 else std) + mean
  }
  case class MinMaxParams(column: String, min: Double, max: Double) extends ScalerParams {
    private val span = if (max == min) 1.0 else max - min
    def apply(c: Column): Column = (c - min) / span
    def inverse(c: Column): Column = c * span + min
  }

  /** Box-Cox power transform (Box & Cox 1964 — public; the variance
    * stabilizer the reference's log1p is the λ=0 special case of):
    *   λ ≠ 0: (y^λ − 1)/λ        λ = 0: ln(y)
    * Defined for y > 0 only — non-positive inputs become null (the caller
    * decides between shifting and dropping; silently shifting would corrupt
    * the inverse). Participates in [[applyAll]]/[[inverseAll]] replay like
    * every other scaler.
    */
  case class BoxCoxParams(column: String, lambda: Double) extends ScalerParams {
    def apply(c: Column): Column =
      if (lambda == 0.0) when(c > 0, log(c))
      else when(c > 0, (pow(c, lambda) - 1.0) / lambda)
    def inverse(c: Column): Column =
      if (lambda == 0.0) exp(c)
      else pow(c * lambda + 1.0, 1.0 / lambda)
  }

  /** Yeo-Johnson transform (Yeo & Johnson 2000; sklearn PowerTransformer's
    * default) — the Box-Cox generalization defined on ALL reals, not just
    * positives:
    *   x ≥ 0: ((x+1)^λ − 1)/λ            (λ ≠ 0),  ln(x+1)        (λ = 0)
    *   x < 0: −((1−x)^(2−λ) − 1)/(2−λ)   (λ ≠ 2),  −ln(1−x)       (λ = 2)
    * with the exact piecewise inverse. Differences, residuals, and
    * log-returns are signed — the reference's log1p (transform.py:42-61)
    * silently nulls them; Yeo-Johnson is the drop-in that does not.
    */
  case class YeoJohnsonParams(column: String, lambda: Double) extends ScalerParams {
    def apply(c: Column): Column = {
      val pos =
        if (lambda == 0.0) log(c + 1.0)
        else (pow(c + 1.0, lambda) - 1.0) / lambda
      val neg =
        if (lambda == 2.0) -log(lit(1.0) - c)
        else -(pow(lit(1.0) - c, 2.0 - lambda) - 1.0) / (2.0 - lambda)
      when(c >= 0, pos).otherwise(neg)
    }
    def inverse(c: Column): Column = {
      val pos =
        if (lambda == 0.0) exp(c) - 1.0
        else pow(c * lambda + 1.0, 1.0 / lambda) - 1.0
      val neg =
        if (lambda == 2.0) lit(1.0) - exp(-c)
        else lit(1.0) - pow(lit(1.0) - c * (2.0 - lambda), 1.0 / (2.0 - lambda))
      when(c >= 0, pos).otherwise(neg)
    }
  }

  /** Robust scaler (sklearn RobustScaler semantics): center on the exact
    * median, scale by the exact IQR — outlier-insensitive where
    * [[StandardizeParams]] is not. Degenerate IQR (constant bulk) scales
    * by 1 like the other scalers' zero-span guards.
    */
  case class RobustParams(column: String, median: Double, iqr: Double) extends ScalerParams {
    private val denom = if (iqr == 0) 1.0 else iqr
    def apply(c: Column): Column = (c - median) / denom
    def inverse(c: Column): Column = c * denom + median
  }

  def fitRobust(df: DataFrame, column: String): RobustParams = {
    val r = df.agg(
      percentile(col(column), lit(0.5)),
      percentile(col(column), lit(0.25)),
      percentile(col(column), lit(0.75))).head()
    RobustParams(column, r.getDouble(0), r.getDouble(2) - r.getDouble(1))
  }

  /** Fit standardize params on (a filtered view of) df — e.g. train-only
    * rows for the leak-free CV pipeline (ref model.py:664-670).
    */
  def fitStandardize(df: DataFrame, column: String): StandardizeParams = {
    val r = df.agg(avg(col(column)), stddev_samp(col(column))).head()
    StandardizeParams(column, r.getDouble(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  def fitMinMax(df: DataFrame, column: String): MinMaxParams = {
    val r = df.select(col(column).cast("double")).agg(min(col(column)), max(col(column))).head()
    MinMaxParams(column, r.getDouble(0), r.getDouble(1))
  }

  /** Applies a recorded scaler pipeline in order (ref `_run_scaler_pipeline`,
    * model.py:550-589).
    */
  def applyAll(df: DataFrame, params: Seq[ScalerParams]): DataFrame =
    params.foldLeft(df)((d, p) => d.withColumn(p.column, p(col(p.column))))

  /** Descales in reverse order (ref `_descale_target`, transform.py:246-306). */
  def inverseAll(df: DataFrame, params: Seq[ScalerParams]): DataFrame =
    params.reverse.foldLeft(df)((d, p) => d.withColumn(p.column, p.inverse(col(p.column))))

  // ------------------------------------------------------------- binning

  /** Quantile binning (pandas-`qcut`-shaped): assign each row its n-quantile
    * bucket of `column` within each group — `ntile(n)` over the value order.
    * ONE window shuffle on the group keys; ntile is rank-based so no second
    * pass computes edges. Global binning (groupCols empty) funnels the sort
    * through a single ordered window — for a 10^12-row global qcut use
    * [[fitQuantileEdges]] + [[applyEdges]] instead (approx edges, narrow
    * apply). Tie rows are split between adjacent buckets by the stable
    * (value, idCol) order, exactly like DuckDB/ANSI `ntile`.
    */
  def quantileBin(df: DataFrame, groupCols: Seq[String], column: String,
                  idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = org.apache.spark.sql.expressions.Window
      .orderBy(col(column), col(idCol))
    val w = if (groupCols.isEmpty) base
      else org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(col(column), col(idCol))
    df.withColumn("bin", ntile(n).over(w))
  }

  /** Scale path for global quantile binning: fit approximate edges once
    * (`approx_quantile`, a single mergeable-sketch aggregate — no global
    * sort), then bin with a narrow `width_bucket`-style projection. Error is
    * the sketch's relative-rank epsilon, not a row-count bound.
    */
  def fitQuantileEdges(df: DataFrame, column: String, n: Int,
                       relErr: Double = 0.001): Array[Double] = {
    require(n >= 1, s"n must be >= 1, got $n")
    val probs = (1 until n).map(_.toDouble / n)
    df.stat.approxQuantile(column, probs.toArray, relErr)
  }

  /** Assign 1-based bins from fitted edges: bin = 1 + #edges below value. */
  def applyEdges(df: DataFrame, column: String, edges: Array[Double]): DataFrame = {
    val c = col(column)
    val bin = edges.foldLeft(lit(1)) { (acc, e) => acc + when(c > e, 1).otherwise(0) }
    df.withColumn("bin", bin)
  }

  /** Winsorize: clamp `column` into its per-group EXACT [pLo, pHi] quantile
    * band (the robust alternative to the reference's hard clamp,
    * transform.py:42-61). One grouped percentile aggregate (tiny — one row
    * per group) + one join + a `least/greatest` projection; nulls pass
    * through. Adds `<column>_wins`. Quantiles are the interpolating
    * (`quantile_cont`) definition. For a GLOBAL winsorize at extreme scale
    * use [[fitQuantileEdges]]-style approximate bounds instead — exact
    * global percentiles funnel the distribution into one aggregator.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], column: String,
                pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got $pLo/$pHi")
    val c = col(column).cast("double")
    val bounds =
      if (groupCols.isEmpty)
        df.agg(percentile(c, lit(pLo)).as("_lo"), percentile(c, lit(pHi)).as("_hi"))
          .crossJoin(df).select(df.columns.map(col) :+ col("_lo") :+ col("_hi"): _*)
      else
        df.join(df.groupBy(groupCols.map(col): _*)
          .agg(percentile(c, lit(pLo)).as("_lo"), percentile(c, lit(pHi)).as("_hi")),
          groupCols)
    bounds
      .withColumn(s"${column}_wins",
        when(c.isNotNull, least(greatest(c, col("_lo")), col("_hi"))))
      .drop("_lo", "_hi")
  }

  /** Quantile normalization (Bolstad et al. 2003 microarray form): make
    * every group's value DISTRIBUTION identical while preserving each
    * row's within-group rank — row at rank r gets the cross-group mean of
    * the rank-r values. The standard fix for comparing measures across
    * sources with different scales (hosts with different traffic bases,
    * sensors with different gains).
    *
    * Rows rank within group by (`valCol`, `tieCol`) — raw stored values
    * compare bit-identically across engines; the tie-break makes equal
    * values deterministic. Groups of unequal size: rank r averages over
    * the groups that HAVE a rank-r row (documented deviation from the
    * equal-size textbook case).
    *
    * Plan: one bounded per-group rank window, one rank-grain aggregate
    * (cardinality = max group size), one join back on rank — all
    * shuffles on rank or group, nothing single-task.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, tieCol: String,
                        valCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valCol), col(tieCol))
    val ranked = df.withColumn("_rank", row_number().over(w))
    val ref = ranked.groupBy("_rank")
      .agg(avg(col(valCol)).as("_qnorm"), count(lit(1)).as("_n_groups"))
    ranked.join(ref, Seq("_rank"))
      .select(col(groupCol), col(tieCol), col(valCol), col("_rank").as("rank"),
        col("_qnorm").as("qnorm"), col("_n_groups").as("n_groups_at_rank"))
  }
}
