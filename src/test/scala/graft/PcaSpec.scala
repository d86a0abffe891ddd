package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA fit/transform: planted low-rank structure recovered, projection
  * variances equal eigenvalues, whitening normalizes, the moments
  * Aggregator is partition-order invariant, and transform stays narrow.
  */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  // d=4 embeddings with variance concentrated on axes 0 (var≈3) and 1
  // (var≈1/3), independent seeded streams so the planted axes stay the
  // principal directions
  private lazy val planted = {
    val rnd = new scala.util.Random(42)
    (0 until 400).map { i =>
      val a = 6.0 * (rnd.nextDouble() - 0.5)  // axis 0, var = 36/12 = 3
      val b = 2.0 * (rnd.nextDouble() - 0.5)  // axis 1, var = 4/12 ≈ 0.333
      (i.toLong, Seq(a.toFloat, b.toFloat, 0.25f, -1.5f)) // axes 2,3 constant
    }.toDF("vec_id", "emb")
  }

  test("fit recovers planted axes with deterministic signs; variances match") {
    val m = Pca.fit(planted, "emb", k = 2)
    assert(m.d == 4 && m.k == 2)
    // component 0 ≈ +e0, component 1 ≈ +e1 (sign-normalized)
    assert(math.abs(m.components(0)(0)) > 0.999 && m.components(0)(0) > 0)
    assert(math.abs(m.components(1)(1)) > 0.999 && m.components(1)(1) > 0)
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > 1e-4)
    // orthonormal components
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
    // per-component projection variance == eigenvalue; whitened variance == 1
    val proj = Pca.transform(planted, "emb", m)
      .select(element_at(col("pca"), 1).as("p0"), element_at(col("pca"), 2).as("p1"))
    val Array(v0, v1) = proj.agg(var_pop(col("p0")), var_pop(col("p1")))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(v0 - m.eigenvalues(0)) < 1e-6 * (1 + m.eigenvalues(0)))
    assert(math.abs(v1 - m.eigenvalues(1)) < 1e-6 * (1 + m.eigenvalues(1)))
    val white = Pca.transform(planted, "emb", m, whiten = true)
      .agg(var_pop(element_at(col("pca"), 1))).collect()(0).getDouble(0)
    assert(math.abs(white - 1.0) < 1e-6)
  }

  test("moments aggregator is partition invariant; transform stays narrow") {
    val m1 = Pca.fit(planted, "emb", k = 3)
    val m7 = Pca.fit(planted.repartition(7), "emb", k = 3)
    (0 until 3).foreach { j =>
      assert(math.abs(m1.eigenvalues(j) - m7.eigenvalues(j)) < 1e-8)
      m1.components(j).zip(m7.components(j)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6) }
    }
    val plan = Pca.transform(planted, "emb", m1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "transform must be a narrow projection")
  }

  test("guards: dim mismatch, empty frame, k too large") {
    val mixed = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "emb")
    intercept[Exception](Pca.fit(mixed, "emb", k = 1))
    intercept[Exception](Pca.fit(planted.filter(col("vec_id") < 0), "emb", k = 1))
    intercept[Exception](Pca.fit(planted, "emb", k = 5))
  }
}
