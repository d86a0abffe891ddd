package graft

import org.apache.spark.sql.functions._
import graft.operators.{Drift, Features, Profile}

/** Mathematical invariants of the statistical operator family on seeded
  * random data — properties a correct implementation cannot violate,
  * complementing the per-operator hand goldens and the DuckDB oracle rows
  * (which pin VALUES; these pin LAWS).
  */
class StatInvariantsSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private def series(k: Long, n: Int, f: Int => Double) =
    (1 to n).map(i => (k, new java.sql.Timestamp((1704067200L + i * 3600L) * 1000L), f(i)))

  test("spearman: bounded in [-1,1] and invariant under monotone transform of x") {
    val rows = series(1L, 60, _ => rnd.nextGaussian())
      .map { case (k, t, v) => (k, t, v, rnd.nextGaussian() + v) }
      .toDF("k", "ts", "x", "y")
    def rho(d: org.apache.spark.sql.DataFrame) =
      Features.spearman(d, Seq("k"), "x", "y").collect()(0).getDouble(1)
    val r = rho(rows)
    assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12)
    // exp() is strictly monotone: ranks unchanged, rho identical
    val warped = rows.withColumn("x", exp(col("x")))
    assert(math.abs(rho(warped) - r) < 1e-9)
  }

  test("gini: in [0,1), scale-invariant, grows when mass concentrates") {
    val vals = (1 to 80).map(_ => (1L, math.abs(rnd.nextGaussian()) + 0.1)).toDF("k", "v")
    def g(d: org.apache.spark.sql.DataFrame) =
      Profile.gini(d, Seq("k"), "v").collect()(0).getDouble(1)
    val base = g(vals)
    assert(base >= 0.0 && base < 1.0)
    assert(math.abs(g(vals.withColumn("v", col("v") * 7.5)) - base) < 1e-9,
      "gini must be scale-invariant")
    val concentrated = vals.withColumn("v", pow(col("v"), 4.0))
    assert(g(concentrated) > base, "raising to a power concentrates mass")
  }

  test("wasserstein1: symmetric, zero-iff-identical, translation = |shift|") {
    val a = (1 to 50).map(_ => (1L, rnd.nextGaussian())).toDF("k", "v")
    val b = (1 to 50).map(_ => (1L, rnd.nextGaussian() * 1.5)).toDF("k", "v")
    def w1(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.wasserstein1(x, y, Seq("k"), "v").collect()(0).getDouble(1)
    assert(math.abs(w1(a, b) - w1(b, a)) < 1e-12, "W1 must be symmetric")
    assert(w1(a, a) == 0.0)
    assert(math.abs(w1(a, a.withColumn("v", col("v") + 4.25)) - 4.25) < 1e-9)
  }

  test("ks: in [0,1], symmetric, 1 for disjoint supports; psi: 0 iff same, >= 0 always") {
    val a = (1 to 40).map(_ => (1L, rnd.nextDouble())).toDF("k", "v")
    val b = (1 to 40).map(_ => (1L, rnd.nextDouble() + 5.0)).toDF("k", "v")
    def ks(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.ks(x, y, Seq("k"), "v").collect()(0).getDouble(1)
    assert(ks(a, b) == 1.0, "disjoint supports separate completely")
    assert(math.abs(ks(a, b) - ks(b, a)) < 1e-12)
    val mixed = (1 to 40).map(_ => (1L, rnd.nextDouble())).toDF("k", "v")
    val kab = ks(a, mixed)
    assert(kab >= 0.0 && kab <= 1.0)
    def psi(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.psi(x, y, Seq("k"), "v").collect()(0).getDouble(1)
    assert(psi(a, a) == 0.0)
    // every PSI term (pc-pr)ln(pc/pr) is non-negative
    assert(psi(a, mixed) >= 0.0)
  }

  test("theilSen: slope scale-equivariance and shift-invariance") {
    val pts = series(1L, 30, i => 2.0 * i + rnd.nextGaussian()).toDF("k", "ts", "v")
    def slope(d: org.apache.spark.sql.DataFrame) =
      Features.theilSen(d, Seq("k"), "ts", "v").collect()(0).getDouble(1)
    val s = slope(pts)
    assert(math.abs(slope(pts.withColumn("v", col("v") * 3.0)) - 3.0 * s) < 1e-9)
    assert(math.abs(slope(pts.withColumn("v", col("v") + 100.0)) - s) < 1e-9)
  }

  test("mannKendall: antisymmetric under negation, |S| <= n(n-1)/2") {
    val pts = series(1L, 25, _ => rnd.nextGaussian()).toDF("k", "ts", "v")
    def sOf(d: org.apache.spark.sql.DataFrame) =
      Features.mannKendall(d, Seq("k"), "ts", "v").collect()(0).getLong(1)
    val s = sOf(pts)
    assert(sOf(pts.withColumn("v", -col("v"))) == -s)
    assert(math.abs(s) <= 25L * 24 / 2)
  }
}
