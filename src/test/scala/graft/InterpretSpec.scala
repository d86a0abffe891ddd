package graft

import org.apache.spark.sql.functions._
import graft.operators.Interpret

/** Closed-form linear-SHAP goldens: on a planted exactly-linear target
  * the fit recovers β and the attribution decomposes ŷ = bias + φ₁ + φ₂
  * with zero residual; degenerate designs yield null, never a blowup.
  */
class InterpretSpec extends SparkSuite {
  import spark.implicits._

  test("linearShap2: recovers planted coefficients; phi sums to yhat; resid 0") {
    // y = 700 + 3*x1 - 5*x2 in integer cents (scale 100): y_cents exact
    val rows = for (i <- 0 until 12) yield {
      val x1 = 100L + i; val x2 = (i % 3).toLong
      ("k", x1, x2, 70000L + 300L * x1 - 500L * x2)
    }
    val df = rows.toDF("k", "x1", "x2", "yc")
    val out = Interpret.linearShap2(df, Seq("k"), "x1", "x2", "yc")
      .orderBy("x1", "x2").collect()
    assert(out.length === 12)
    val m1 = rows.map(_._2).sum.toDouble / 12 // mean x1
    val m2 = rows.map(_._3).sum.toDouble / 12
    out.foreach { r =>
      val x1 = r.getAs[Long]("x1"); val x2 = r.getAs[Long]("x2")
      val y = r.getAs[Long]("yc") / 100.0
      assert(math.abs(r.getAs[Double]("phi_1") - 3.0 * (x1 - m1)) < 1e-9, "phi_1")
      assert(math.abs(r.getAs[Double]("phi_2") - (-5.0) * (x2 - m2)) < 1e-9, "phi_2")
      // local accuracy (the SHAP axiom): bias + sum(phi) == yhat == y exactly
      assert(math.abs(r.getAs[Double]("yhat") - y) < 1e-9, "yhat == y on exact fit")
      assert(math.abs(r.getAs[Double]("resid")) < 1e-9, "resid 0")
      // bias is the base value E[y]
      assert(math.abs(r.getAs[Double]("bias") -
        rows.map(_._4).sum / 100.0 / 12) < 1e-9, "bias = mean y")
    }
    // importance: mean |phi| matches the hand fold
    val imp = Interpret.shapImportance(
        Interpret.linearShap2(df, Seq("k"), "x1", "x2", "yc"), Seq("k"))
      .collect().map(r => r.getAs[String]("feature") ->
        r.getAs[Double]("importance")).toMap
    val want1 = rows.map(t => math.abs(3.0 * (t._2 - m1))).sum / 12
    val want2 = rows.map(t => math.abs(-5.0 * (t._3 - m2))).sum / 12
    assert(math.abs(imp("phi_1") - want1) < 1e-9)
    assert(math.abs(imp("phi_2") - want2) < 1e-9)
  }

  test("linearShap2: degenerate designs -> null attribution, no blowup") {
    // constant x2 (c22 = 0): null phi across the key
    val const = (0 until 6).map(i => ("k", 10L + i, 1L, 1000L + i))
      .toDF("k", "x1", "x2", "yc")
    val out = Interpret.linearShap2(const, Seq("k"), "x1", "x2", "yc").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("phi_1"))))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("yhat"))))
    // n < 3: null
    val tiny = Seq(("k", 1L, 0L, 100L), ("k", 2L, 1L, 200L))
      .toDF("k", "x1", "x2", "yc")
    val t = Interpret.linearShap2(tiny, Seq("k"), "x1", "x2", "yc").collect()
    assert(t.forall(_.isNullAt(t.head.fieldIndex("phi_1"))))
    // bias (= mean y) survives degeneracy — the base value needs no fit
    assert(t.forall(r => math.abs(r.getAs[Double]("bias") - 1.5) < 1e-12))
  }
}
