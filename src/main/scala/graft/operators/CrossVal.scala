package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Rolling-origin cross-validation — the leak-free split pipeline that is
  * the semantic heart of the reference
  * (`_split_scale_and_feature_engineering`, /root/reference/forecastframe/model.py:654-714,
  * fold generation via sklearn TimeSeriesSplit :243-252).
  *
  * Fold boundaries become date literals; scaler stats are fitted with a
  * train-only filter; masking is a `when(ts >= boundary, null)`; the feature
  * pass runs ONCE over the combined frame so test rows see only history —
  * all one Catalyst plan, no per-fold data movement beyond the filters.
  */
object CrossVal {

  case class Fold(trainEnd: java.sql.Timestamp, testStart: java.sql.Timestamp,
                  testEnd: java.sql.Timestamp)

  /** sklearn-compatible TimeSeriesSplit over the distinct sorted time points:
    * test size = n/(nSplits+1); fold i trains on everything before
    * (test start - gap points).
    */
  def timeSeriesSplits(df: DataFrame, tsCol: String, nSplits: Int, gap: Int = 0): Seq[Fold] = {
    val ts = df.select(col(tsCol)).distinct().orderBy(col(tsCol))
      .collect().map(_.getTimestamp(0))
    val n = ts.length
    val testSize = n / (nSplits + 1)
    require(testSize > 0, s"not enough distinct time points ($n) for $nSplits splits")
    (0 until nSplits).map { i =>
      val testStartIx = n - (nSplits - i) * testSize
      val testEndIx = testStartIx + testSize - 1
      val trainEndIx = testStartIx - gap - 1
      require(trainEndIx >= 0, "gap leaves no training data")
      Fold(ts(trainEndIx), ts(testStartIx), ts(testEndIx))
    }
  }

  /** Purged K-fold with embargo (López de Prado 2018, "Advances in Financial
    * Machine Learning" ch. 7) — K-fold CV that is valid when features carry
    * trailing windows: the timeline's distinct time buckets are cut into K
    * contiguous test blocks, and for each fold the `purge` buckets BEFORE the
    * test block (whose rolling features would overlap test observations) and
    * the `embargo` buckets AFTER it (whose labels/windows look back into it)
    * are dropped from training instead of silently leaking.
    *
    * Returns the input columns + `fold` (0..nFolds-1) + `role`
    * ('train'/'test'/'purged'/'embargo') — one output row per (input row,
    * fold), so the caller filters `fold = i AND role = 'train'` per fold.
    * Bucket index and fold id are pure integer forms (`fold =
    * ⌊idx·K / n⌋`) so an independent engine can replay the assignment.
    *
    * Scale shape: the distinct-bucket frame is tiny (time buckets, same
    * bound as [[timeSeriesSplits]]'s driver collect — here kept distributed:
    * one single-task window over distinct buckets only, never over rows).
    * Rows join the bucket index on the bucket key (broadcast) and cross-join
    * the K-row fold-bounds table; output is K× the input, which is the
    * honest cost of materializing every fold at once — per-fold filters
    * prune it back when the plan is consumed fold-by-fold.
    */
  def purgedFoldAssign(df: DataFrame, tsCol: String, nFolds: Int,
                       purge: Int, embargo: Int): DataFrame = {
    require(nFolds >= 2, s"nFolds must be >= 2, got $nFolds")
    require(purge >= 0 && embargo >= 0,
      s"purge/embargo must be >= 0, got $purge/$embargo")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tsCol))
    val idxed = df.select(col(tsCol)).distinct()
      .withColumn("_idx", row_number().over(w) - lit(1))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("fold",
        floor(col("_idx") * lit(nFolds) / col("_n")).cast("long"))
    val bounds = idxed.groupBy(col("fold"))
      .agg(min(col("_idx")).as("_si"), max(col("_idx")).as("_ei"))
    df.join(broadcast(idxed.select(col(tsCol), col("_idx"))), Seq(tsCol))
      .crossJoin(broadcast(bounds))
      .withColumn("role",
        when(col("_idx").between(col("_si"), col("_ei")), lit("test"))
          .when(col("_idx") >= col("_si") - lit(purge) &&
            col("_idx") < col("_si"), lit("purged"))
          .when(col("_idx") > col("_ei") &&
            col("_idx") <= col("_ei") + lit(embargo), lit("embargo"))
          .otherwise(lit("train")))
      .drop("_idx", "_si", "_ei")
  }

  /** The leak-free per-fold pipeline (ref model.py:654-714):
    * 1. fit scalers on train rows only, apply everywhere;
    * 2. save test actuals aside, null the test target;
    * 3. run feature engineering on the combined frame (test rows see only
    *    train-visible lagged/rolled history — the target is null there);
    * 4. restore test actuals and tag rows train/test.
    *
    * @param featureFn the recorded feature plan (lags/rollups/EWMA chain)
    */
  def leakFreeFold(df: DataFrame, tsCol: String, targetCol: String, fold: Fold,
                   scalerCols: Seq[String], featureFn: DataFrame => DataFrame): DataFrame = {
    val inFold = df.filter(col(tsCol) <= lit(fold.testEnd))
    val isTrain = col(tsCol) <= lit(fold.trainEnd)

    // 1. train-only scaler stats, applied to the full fold frame
    val params = scalerCols.map(c => Scalers.fitStandardize(inFold.filter(isTrain), c))
    val scaled = params.foldLeft(inFold)((d, p) => d.withColumn(p.column, p(col(p.column))))

    // 2./3. mask test target, run the feature plan once over the combined frame
    val masked = scaled
      .withColumn("_actual", col(targetCol))
      .withColumn(targetCol, when(isTrain, col(targetCol)).otherwise(lit(null)))
    val featured = featureFn(masked)

    // 4. restore actuals + tag (ref :694-704 keyed update ≡ coalesce restore)
    featured
      .withColumn(targetCol, coalesce(col(targetCol), col("_actual")))
      .withColumn("_sample", when(isTrain, lit("train")).otherwise(lit("test")))
      .drop("_actual")
  }
}
