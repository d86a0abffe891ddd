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
