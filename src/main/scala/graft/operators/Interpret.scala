package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-native model interpretation — the Spark-first analogue of the
  * reference's SHAP layer (/root/reference/forecastframe/interpret.py:
  * 211-430) for the model family this engine actually fits. interpret.py
  * computes TreeSHAP over a fitted LightGBM plus Altair plots; the
  * LightGBM fit is out of engine scope (SURVEY §7), but for a LINEAR
  * model SHAP values have the exact closed form
  *
  *   φ_j(x) = β_j · (x_j − E[x_j])        (Lundberg & Lee 2017 — linear
  *                                         SHAP under feature independence)
  *
  * so per-row attribution is pure plan algebra: one closed-form
  * normal-equations fit per key + a per-row projection. No model binary,
  * no UDF, no iteration — attribution for a million-series population is
  * one aggregate + one broadcast join.
  *
  * Determinism discipline (the q148/q337 class, applied from the start):
  * features and target enter as INTEGERS (the target fixed-point at
  * `scale`), so every moment sum and every centered co-moment is an
  * exact long; β, mean, and φ are then fixed-arity double expressions
  * over exact operands — bit-identical across runs, shuffle orders, and
  * engines (the DuckDB twin replays the same casts in the same places).
  */
object Interpret {

  /** Per-row linear-SHAP attribution of an integer target against two
    * integer features, per key: fits ŷ = b0 + b1·x1 + b2·x2 by exact
    * normal equations over (keyCols) groups and appends
    * `bias` (= ȳ, the SHAP base value), `phi_1`, `phi_2`, `yhat`
    * (= bias + φ1 + φ2) and `resid` (= y − ŷ) to every input row.
    *
    * Exactness bounds (document per call site): with n rows per key,
    * |x| ≤ X, |y·scale| ≤ Y, the centered co-moments are ≤ n²·X·Y and
    * the β numerators ≤ n⁴·X²·Y² — keep the former < 2⁶³ as longs and
    * cast products land < 2⁵³ for the lossless long→double conversion
    * (daily cents series with day-number features: ~10¹³, wide margin).
    *
    * Degenerate fits (n < 3, a constant feature, or exactly collinear
    * features — D is an exact long, so the D ≠ 0 test is crisp, not a
    * float epsilon) yield null β → null φ/yhat/resid, never a blowup.
    */
  def linearShap2(df: DataFrame, keyCols: Seq[String], x1Col: String,
                  x2Col: String, yIntCol: String,
                  scale: Long = 100L): DataFrame = {
    require(keyCols.nonEmpty, "linearShap2 needs at least one key column")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val keys = keyCols.map(col)
    val x1 = col(x1Col).cast("long"); val x2 = col(x2Col).cast("long")
    val yc = col(yIntCol).cast("long")
    val m = df.groupBy(keys: _*).agg(
      count(lit(1)).as("_n"),
      sum(x1).as("_s1"), sum(x2).as("_s2"),
      sum(x1 * x1).as("_s11"), sum(x1 * x2).as("_s12"),
      sum(x2 * x2).as("_s22"),
      sum(yc).as("_sy"), sum(x1 * yc).as("_s1y"), sum(x2 * yc).as("_s2y"))
    val c = m
      .withColumn("_c11", col("_n") * col("_s11") - col("_s1") * col("_s1"))
      .withColumn("_c22", col("_n") * col("_s22") - col("_s2") * col("_s2"))
      .withColumn("_c12", col("_n") * col("_s12") - col("_s1") * col("_s2"))
      .withColumn("_c1y", col("_n") * col("_s1y") - col("_s1") * col("_sy"))
      .withColumn("_c2y", col("_n") * col("_s2y") - col("_s2") * col("_sy"))
    val dd = col("_c11") * col("_c22") - col("_c12") * col("_c12")
    val ok = col("_n") >= 3 && col("_c11") > 0 && col("_c22") > 0 && dd =!= 0
    val fit = c
      .withColumn("_b1", when(ok,
        (col("_c22") * col("_c1y") - col("_c12") * col("_c2y"))
          .cast("double") / dd.cast("double")))
      .withColumn("_b2", when(ok,
        (col("_c11") * col("_c2y") - col("_c12") * col("_c1y"))
          .cast("double") / dd.cast("double")))
      .select((keys :+ col("_n") :+ col("_s1") :+ col("_s2") :+ col("_sy") :+
        col("_b1") :+ col("_b2")): _*)
    df.join(broadcast(fit), keyCols)
      .withColumn("bias",
        col("_sy").cast("double") / (lit(scale) * col("_n")))
      // β from the cents fit is scale·β_units — divide the projection
      // back to target units so bias and φ share the same scale
      .withColumn("phi_1",
        col("_b1") * (x1.cast("double") - col("_s1") / col("_n")) /
          lit(scale.toDouble))
      .withColumn("phi_2",
        col("_b2") * (x2.cast("double") - col("_s2") / col("_n")) /
          lit(scale.toDouble))
      .withColumn("yhat", col("bias") + col("phi_1") + col("phi_2"))
      .withColumn("resid",
        yc.cast("double") / lit(scale.toDouble) -
          (col("bias") + col("phi_1") + col("phi_2")))
      .drop("_n", "_s1", "_s2", "_sy", "_b1", "_b2")
  }

  /** Global feature importance from [[linearShap2]]'s per-row output —
    * interpret.py's importance-plot semantics: mean |φ_j| per key and
    * feature, long format (keys..., feature, importance, n). The |φ| sum
    * is a grouped double aggregate (exposure-class 3 of the COVERAGE.md
    * determinism policy — bounded by the r6 rounding callers apply). */
  def shapImportance(attributed: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    // unpivot via explode, ONE pass: a per-feature union would embed (and
    // largely re-execute) the whole upstream attribution plan per branch
    attributed
      .select((keys :+ explode(array(
        struct(lit("phi_1").as("feature"), col("phi_1").as("p")),
        struct(lit("phi_2").as("feature"), col("phi_2").as("p")))).as("_f")): _*)
      .select((keys :+ col("_f.feature").as("feature") :+
        col("_f.p").as("p")): _*)
      .filter(col("p").isNotNull)
      .groupBy((keys :+ col("feature")): _*)
      .agg(count(lit(1)).as("n"),
        (sum(abs(col("p"))) / count(lit(1))).as("importance"))
      .select((keys :+ col("feature") :+ col("importance") :+ col("n")): _*)
  }
}
