package graft

import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, Drift, Experiment, Forecast, Graph, Metrics, Profile, Robust, Similarity, Survival, TextAnalysis}

/** Hand-computed goldens for the round-3 closing wave: TSB, top-down
  * reconciliation, tracking signal, MSE decomposition, Cliff's delta,
  * energy distance, two-sample CvM, assortativity/reciprocity, and
  * Page–Hinkley.
  */
class ForecastMonitorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i))

  test("tsb: probability decays every period, size level only on demand") {
    // v = [2,0,0,4,0], alpha=beta=0.5
    // p: 1, .5, .25, .625, .3125 ; z: 2 -> 3 ; yhat = .3125*3 = .9375
    val df = (1 to 5).map(i => ("k", ts(i), Seq(2.0, 0.0, 0.0, 4.0, 0.0)(i - 1)))
      .toDF("k", "t", "v")
    val got = Forecast.tsb(df, Seq("k"), "t", "v", alpha = 0.5, beta = 0.5,
      horizon = 2, stepSeconds = 1L).orderBy("step").collect()
    assert(got.length === 2)
    got.foreach(r => assert(math.abs(r.getAs[Double]("yhat") - 0.9375) < 1e-12))
    // forecast_ts advances by stepSeconds from the last observation
    assert(got.map(_.getAs[java.sql.Timestamp]("forecast_ts").toInstant.getEpochSecond)
      .toSeq === Seq(6L, 7L))
    // all-zero key: no output (no size level)
    val zero = (1 to 3).map(i => ("z", ts(i), 0.0)).toDF("k", "t", "v")
    assert(Forecast.tsb(zero, Seq("k"), "t", "v", 0.5, 0.5, 1, 1L).count() === 0)
  }

  test("reconcileTopDown: coherence (sum of td children == parent forecast)") {
    val hist = Seq(
      ("p1", "a", 1, 10.0), ("p1", "a", 2, 20.0),
      ("p1", "b", 1, 30.0),
      ("p2", "c", 1, 5.0), ("p2", "c", 2, 7.0)).toDF("p", "c", "t", "v")
    val childFc = Seq(("p1", "a", 12.0), ("p1", "b", 40.0), ("p2", "c", 6.0))
      .toDF("p", "c", "yhat")
    val parentFc = Seq(("p1", 60.0), ("p2", 11.0)).toDF("p", "yhat")
    val out = Forecast.reconcileTopDown(hist, childFc, parentFc,
      Seq("p"), Seq("p", "c"), "v", "yhat").collect()
    // proportions: a=30/60, b=30/60 ; c=1
    val byChild = out.map(r => r.getAs[String]("c") ->
      (r.getAs[Double]("prop"), r.getAs[Double]("yhat_td"),
        r.getAs[Double]("yhat_bu"))).toMap
    assert(math.abs(byChild("a")._1 - 0.5) < 1e-12)
    assert(math.abs(byChild("a")._2 - 30.0) < 1e-12) // 60 * .5
    assert(math.abs(byChild("b")._2 - 30.0) < 1e-12)
    assert(math.abs(byChild("c")._2 - 11.0) < 1e-12)
    // bottom-up column carries the (incoherent) child sum per parent
    assert(math.abs(byChild("a")._3 - 52.0) < 1e-12) // 12 + 40
    // coherence: td children sum to the parent forecast exactly
    val tdSum = out.filter(_.getAs[String]("p") == "p1")
      .map(_.getAs[Double]("yhat_td")).sum
    assert(math.abs(tdSum - 60.0) < 1e-9)
  }

  test("trackingSignal: persistent bias drives |TS| past the threshold") {
    val df = (1 to 3).map(i => ("k", ts(i), 1.0, 0.0)).toDF("k", "t", "y", "f")
    val got = Metrics.trackingSignal(df, Seq("k"), "t", "y", "f",
      threshold = 2.5).orderBy("t").collect()
    assert(got.map(_.getAs[Double]("tsig")).toSeq === Seq(1.0, 2.0, 3.0))
    assert(got.map(_.getAs[Int]("alarm")).toSeq === Seq(0, 0, 1))
  }

  test("mseDecomposition: the three parts are the MSE, shares sum to 1") {
    val df = Seq((1.0, 2.0), (2.0, 2.0), (3.0, 4.0), (4.0, 3.0))
      .map { case (y, f) => ("k", y, f) }.toDF("k", "y", "f")
    val r = Metrics.mseDecomposition(df, Seq("k"), "y", "f").head()
    val mse = r.getAs[Double]("mse")
    assert(math.abs(mse - 0.75) < 1e-12)
    val parts = r.getAs[Double]("bias_part") + r.getAs[Double]("var_part") +
      r.getAs[Double]("cov_part")
    assert(math.abs(parts - mse) < 1e-12, s"parts $parts != mse $mse")
    val shares = r.getAs[Double]("um") + r.getAs[Double]("us") + r.getAs[Double]("uc")
    assert(math.abs(shares - 1.0) < 1e-12)
  }

  test("cliffsDelta: ties counted half, sign follows the dominant side") {
    val df = (Seq(1.0, 2.0, 3.0).map(("g", "A", _)) ++
      Seq(2.0, 3.0, 4.0).map(("g", "B", _))).toDF("g", "seg", "v")
    val d = Robust.cliffsDelta(df, Seq("g"), "seg", "A", "B", "v")
      .head().getAs[Double]("delta")
    assert(math.abs(d - (2.0 * 2.0 / 9.0 - 1.0)) < 1e-12) // U_A = 2 -> -5/9
    // swapping the roles flips the sign
    val d2 = Robust.cliffsDelta(df, Seq("g"), "seg", "B", "A", "v")
      .head().getAs[Double]("delta")
    assert(math.abs(d + d2) < 1e-12)
  }

  test("energyDistance: hand value, and zero for identical samples") {
    val x = Seq(0.0, 2.0).map(("g", _)).toDF("g", "v")
    val y = Seq(1.0, 3.0).map(("g", _)).toDF("g", "v")
    val r = Drift.energyDistance(x, y, Seq("g"), "v").head()
    // 2*1.5 - 1 - 1 = 1 -> distance 1
    assert(math.abs(r.getAs[Double]("d2") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("energy_dist") - 1.0) < 1e-12)
    val same = Drift.energyDistance(x, x, Seq("g"), "v").head()
    assert(math.abs(same.getAs[Double]("d2")) < 1e-12)
  }

  test("cvm2: zero on equal samples, 0.25 on fully separated singletons") {
    val x = Seq(1.0, 2.0).map(("g", _)).toDF("g", "v")
    assert(math.abs(Drift.cvm2(x, x, Seq("g"), "v").head()
      .getAs[Double]("cvm")) < 1e-12)
    val a = Seq(1.0).map(("g", _)).toDF("g", "v")
    val b = Seq(2.0).map(("g", _)).toDF("g", "v")
    assert(math.abs(Drift.cvm2(a, b, Seq("g"), "v").head()
      .getAs[Double]("cvm") - 0.25) < 1e-12)
  }

  test("degreeAssortativity + reciprocity on a 4-edge toy graph") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L)).toDF("src", "dst")
    val a = Graph.degreeAssortativity(e).head()
    assert(a.getAs[Long]("n_edges") === 4L)
    // od=(1:2,2:1,3:1), id=(2:2,1:1,3:1): pairs (2,2),(1,1),(2,1),(1,2) -> r=0
    assert(math.abs(a.getAs[Double]("assortativity")) < 1e-12)
    val r = Graph.reciprocity(e).head()
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_reciprocal") === 2L) // (1,2) and (2,1)
    assert(math.abs(r.getAs[Double]("reciprocity") - 0.5) < 1e-12)
  }

  test("grangerF: extra-regressor law (RSS_u <= RSS_r), F identity, degenerate x") {
    val rnd = new scala.util.Random(7)
    val ys = Seq.fill(20)(rnd.nextDouble() * 10)
    val xs = Seq.fill(20)(rnd.nextDouble() * 10)
    val df = (0 until 20).map(i => ("k", ts(i + 1), ys(i), xs(i))).toDF("k", "t", "y", "x")
    val r = Forecast.grangerF(df, Seq("k"), "t", "y", "x").head()
    val (rssR, rssU, f, n) = (r.getAs[Double]("rss_r"), r.getAs[Double]("rss_u"),
      r.getAs[Double]("f_stat"), r.getAs[Long]("n"))
    assert(n === 19)
    assert(rssU <= rssR + 1e-9, "adding a regressor may not increase RSS")
    assert(math.abs(f - (rssR - rssU) / (rssU / (n - 3.0))) < 1e-9)
    // constant x -> singular design -> null F
    val const = (0 until 10).map(i => ("k", ts(i + 1), ys(i), 5.0)).toDF("k", "t", "y", "x")
    assert(Forecast.grangerF(const, Seq("k"), "t", "y", "x").head()
      .getAs[Any]("f_stat") == null)
  }

  test("varianceRatio: alternating series -> 0, monotone 1-diffs -> null") {
    val alt = (1 to 6).map(i => ("k", ts(i), (i % 2).toDouble)).toDF("k", "t", "v")
    val r = Forecast.varianceRatio(alt, Seq("k"), "t", "v", 2).head()
    assert(math.abs(r.getAs[Double]("vr")) < 1e-12) // 2-diffs all zero
    val mono = (1 to 4).map(i => ("k", ts(i), i.toDouble)).toDF("k", "t", "v")
    assert(Forecast.varianceRatio(mono, Seq("k"), "t", "v", 2).head()
      .getAs[Any]("vr") == null) // 1-diff variance is zero
  }

  test("pettitt: step series splits at the step, exact half-integer U") {
    val df = (1 to 6).map(i => ("k", ts(i), if (i <= 3) 0.0 else 10.0))
      .toDF("k", "t", "v")
    val r = Anomaly.pettitt(df, Seq("k"), "t", "v").head()
    assert(r.getAs[Double]("u_max") === 9.0)
    assert(r.getAs[java.sql.Timestamp]("split_ts").toInstant.getEpochSecond === 3L)
    val p = 2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0))
    assert(math.abs(r.getAs[Double]("p_approx") - p) < 1e-12)
  }

  test("hedgesG: textbook pooled-sd golden with small-sample correction") {
    val df = (Seq(1.0, 2.0, 3.0).map(("g", "A", _)) ++
      Seq(2.0, 4.0, 6.0).map(("g", "B", _))).toDF("g", "arm", "v")
    val r = Experiment.hedgesG(df, Seq("g"), "arm", "A", "B", "v").head()
    val d = -2.0 / math.sqrt(2.5)
    assert(math.abs(r.getAs[Double]("cohen_d") - d) < 1e-12)
    assert(math.abs(r.getAs[Double]("hedges_g") - d * 0.8) < 1e-12)
  }

  test("runsTest: two-block sequence golden") {
    val df = (1 to 4).map(i => ("k", ts(i), i.toDouble)).toDF("k", "t", "v")
    val r = Robust.runsTest(df, Seq("k"), "t", "v").head()
    assert(r.getAs[Long]("runs") === 2L) // 0,0 then 1,1
    assert(r.getAs[Long]("n_above") === 2L && r.getAs[Long]("n_below") === 2L)
    val z = (2.0 - 3.0) / math.sqrt(2.0 * 2 * 2 * (8 - 4) / (16.0 * 3))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
  }

  test("kruskalWallis: no-tie two-arm golden H = 2.4") {
    val df = (Seq(1.0, 2.0).map(("g", "a", _)) ++ Seq(3.0, 4.0).map(("g", "b", _)))
      .toDF("g", "arm", "v")
    val r = Robust.kruskalWallis(df, Seq("g"), "arm", "v").head()
    assert(math.abs(r.getAs[Double]("h_raw") - 2.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_stat") - 2.4) < 1e-12) // no ties
    assert(r.getAs[Long]("n_arms") === 2L)
  }

  test("grubbs: single spike golden") {
    val df = (Seq(1.0, 1.0, 1.0, 1.0, 6.0)).zipWithIndex
      .map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v")
    val r = Anomaly.grubbs(df, Seq("k"), "v").head()
    assert(math.abs(r.getAs[Double]("g_stat") - 4.0 / math.sqrt(5.0)) < 1e-12)
    assert(r.getAs[Double]("outlier_value") === 6.0)
  }

  test("partialCorr: x==y gives partial 1; shared driver is removed") {
    val df = Seq((1.0, 1.0, 1.0), (2.0, 2.0, 2.0), (3.0, 3.0, 3.0), (5.0, 5.0, 4.0))
      .map { case (x, y, z) => ("g", x, y, z) }.toDF("g", "x", "y", "z")
    val r = Profile.partialCorr(df, Seq("g"), "x", "y", "z").head()
    assert(math.abs(r.getAs[Double]("r_xy") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("r_xy_z") - 1.0) < 1e-9)
    // constant confounder: r_xz/r_yz undefined -> null partial (guarded
    // denominator; note exact-1 pairwise r is NOT reachable in floats for
    // collinear data — sqrt(A)·sqrt(A) != A — so the null path is the
    // zero-variance one)
    val det = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0))
      .map { case (x, y) => ("g", x, y, 7.0) }.toDF("g", "x", "y", "z")
    assert(Profile.partialCorr(det, Seq("g"), "x", "y", "z").head()
      .getAs[Any]("r_xy_z") == null)
  }

  test("turningPoints: zigzag golden") {
    val df = Seq(1.0, 3.0, 2.0, 4.0, 3.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("k", "t", "v")
    val r = Profile.turningPoints(df, Seq("k"), "t", "v").head()
    assert(r.getAs[Long]("turning_points") === 3L)
    val z = (3.0 - 2.0) / math.sqrt((16.0 * 5 - 29) / 90)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
  }

  test("brownForsythe: hand anova-on-deviations golden") {
    val df = (Seq(1.0, 2.0, 3.0).map(("g", "A", _)) ++
      Seq(10.0, 20.0, 30.0).map(("g", "B", _))).toDF("g", "arm", "v")
    val r = Robust.brownForsythe(df, Seq("g"), "arm", Seq("A", "B"), "v").head()
    // adev A = [1,0,1], B = [10,0,10]; ssb = 54, ssw = 202/3... see spec notes
    assert(math.abs(r.getAs[Double]("ssb") - 54.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ssw") - (202.0 - 404.0 / 3.0)) < 1e-9)
    val f = 54.0 / ((202.0 - 404.0 / 3.0) / 4.0)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-9)
  }

  test("durbinWatson: alternating residuals give DW = 3 on this fixture") {
    val df = Seq(1.0, -1.0, 1.0, -1.0).zipWithIndex
      .map { case (e, i) => ("k", ts(i + 1), e) }.toDF("k", "t", "e")
    val r = Metrics.durbinWatson(df, Seq("k"), "t", "e").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("dw") - 3.0) < 1e-12) // 12/4
  }

  test("crpsEmpirical: hand two-member golden; n=1 ensemble degrades to MAE") {
    val ens = Seq(0.0, 2.0).map(("k", _)).toDF("k", "v")
    val obs = Seq(("k", 1L, 1.0)).toDF("k", "oid", "y")
    val r = Metrics.crpsEmpirical(ens, Seq("k"), "v", obs, "oid", "y").head()
    assert(math.abs(r.getAs[Double]("crps") - 0.5) < 1e-12) // 1 - 0.5*1
    val one = Seq(3.0).map(("k", _)).toDF("k", "v")
    val r1 = Metrics.crpsEmpirical(one, Seq("k"), "v", obs, "oid", "y").head()
    assert(math.abs(r1.getAs[Double]("crps") - 2.0) < 1e-12) // = MAE
  }

  test("atkinson + theilT: two-point goldens, zero at equality") {
    val df = Seq(1.0, 4.0).map(("g", _)).toDF("g", "v")
    val a = Profile.atkinson(df, Seq("g"), "v", epsilon = 0.5).head()
    assert(math.abs(a.getAs[Double]("ede") - 2.25) < 1e-12) // ((1+2)/2)^2
    assert(math.abs(a.getAs[Double]("atkinson") - 0.1) < 1e-12)
    val eq = Seq(2.0, 2.0).map(("g", _)).toDF("g", "v")
    assert(math.abs(Profile.theilT(eq, Seq("g"), "v").head()
      .getAs[Double]("theil_t")) < 1e-12)
    val un = Seq(1.0, 3.0).map(("g", _)).toDF("g", "v")
    val tt = Profile.theilT(un, Seq("g"), "v").head().getAs[Double]("theil_t")
    val expect = (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2
    assert(math.abs(tt - expect) < 1e-12)
  }

  test("palma: 1..10 integer-rank cuts") {
    val df = (1 to 10).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val r = Profile.palma(df, Seq("g"), "v", "id").head()
    assert(math.abs(r.getAs[Double]("palma") - 1.0) < 1e-12) // 10 / (1+2+3+4)
    assert(math.abs(r.getAs[Double]("top_share") - 10.0 / 55.0) < 1e-12)
  }

  test("neweyWest: alternating series golden (negative autocorr shrinks SE)") {
    val df = Seq(1.0, -1.0, 1.0, -1.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("k", "t", "v")
    val r = Robust.neweyWest(df, Seq("k"), "t", "v", maxLag = 3).head()
    assert(math.abs(r.getAs[Double]("se_iid") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_nw") - 0.25) < 1e-12) // lrv = 0.25
    val const = (1 to 5).map(i => ("k", ts(i), 7.0)).toDF("k", "t", "v")
    assert(math.abs(Robust.neweyWest(const, Seq("k"), "t", "v", 3).head()
      .getAs[Double]("se_nw")) < 1e-12)
  }

  test("powerlawAlpha: MLE formula over a hand degree distribution") {
    // in-degrees: a:1, b:2, c:4
    val e = (Seq((10L, 1L)) ++ (11L to 12L).map((_, 2L)) ++
      (13L to 16L).map((_, 3L))).toDF("src", "dst")
    val r = Graph.powerlawAlpha(e, kmin = 2L).head()
    assert(r.getAs[Long]("n_nodes") === 2L)
    val ls = math.log(2.0 / 1.5) + math.log(4.0 / 1.5)
    assert(math.abs(r.getAs[Double]("alpha") - (1.0 + 2.0 / ls)) < 1e-12)
  }

  test("modularity: two disjoint triangles labeled by component = 0.5") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("src", "dst")
    val labels = (1L to 6L).map(i => (i, if (i <= 3) 0L else 1L))
      .toDF("id", "community")
    val r = Graph.modularity(e, labels).head()
    assert(r.getAs[Long]("m") === 6L)
    assert(math.abs(r.getAs[Double]("modularity") - 0.5) < 1e-12)
    // same graph, random-cut labels (split triangles): Q drops below
    val bad = (1L to 6L).map(i => (i, i % 2)).toDF("id", "community")
    assert(Graph.modularity(e, bad).head().getAs[Double]("modularity") < 0.0)
  }

  test("rmst: two-event step curve integrates to 3.5 at tau=10") {
    val df = Seq(("g", 2L, 1), ("g", 5L, 1)).toDF("g", "dur", "e")
    val r = Survival.rmst(df, Seq("g"), "dur", "e", tau = 10L).head()
    // 1.0*(2-0) + 0.5*(5-2) + 0.0*(10-5)
    assert(math.abs(r.getAs[Double]("rmst") - 3.5) < 1e-12)
    assert(r.getAs[Long]("n_times") === 2L)
  }

  test("lbKeogh: zero inside the envelope, squared exceedance outside") {
    val series = Seq(0.0, 0.0, 10.0, 0.0).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "idx", "v")
    val ref = (0 to 3).map(i => (i.toLong, 0.0)).toDF("idx", "rv")
    val r = Similarity.lbKeogh(series, Seq("k"), "idx", "v", ref, "rv", band = 1)
      .head()
    assert(math.abs(r.getAs[Double]("lb_keogh") - 100.0) < 1e-12)
    assert(r.getAs[Long]("n_matched") === 4L)
    // series identical to the reference: LB = 0 (always <= DTW)
    val same = (0 to 3).map(i => ("k", i.toLong, math.sin(i.toDouble)))
      .toDF("k", "idx", "v")
    val sref = (0 to 3).map(i => (i.toLong, math.sin(i.toDouble))).toDF("idx", "rv")
    assert(math.abs(Similarity.lbKeogh(same, Seq("k"), "idx", "v", sref, "rv", 1)
      .head().getAs[Double]("lb_keogh")) < 1e-12)
  }

  test("permutationEntropy: monotone = 0, zigzag hand entropy") {
    val mono = (1 to 5).map(i => ("k", ts(i), i.toDouble)).toDF("k", "t", "v")
    val m = Profile.permutationEntropy(mono, Seq("k"), "t", "v").head()
    assert(math.abs(m.getAs[Double]("pe")) < 1e-12)
    val zig = Seq(1.0, 3.0, 2.0, 4.0, 3.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("k", "t", "v")
    val z = Profile.permutationEntropy(zig, Seq("k"), "t", "v").head()
    val h = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(z.getAs[Long]("n_windows") === 3L)
    assert(math.abs(z.getAs[Double]("pe") - h) < 1e-12)
  }

  test("hjorth: square-wave goldens") {
    val df = Seq(0.0, 1.0, 0.0, 1.0, 0.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("k", "t", "v")
    val r = Profile.hjorth(df, Seq("k"), "t", "v").head()
    assert(math.abs(r.getAs[Double]("activity") - 0.24) < 1e-12)
    assert(math.abs(r.getAs[Double]("mobility") - math.sqrt(1.0 / 0.24)) < 1e-12)
    val complexity = math.sqrt(32.0 / 9.0) / math.sqrt(1.0 / 0.24)
    assert(math.abs(r.getAs[Double]("complexity") - complexity) < 1e-12)
  }

  test("yulesK + heapsFit: tiny-corpus goldens") {
    val docs = Seq(("g", 1L, "a a b")).toDF("g", "id", "text")
    val k = TextAnalysis.yulesK(docs, Seq("g"), "text").head()
    assert(k.getAs[Long]("n_tokens") === 3L && k.getAs[Long]("vocab") === 2L)
    assert(math.abs(k.getAs[Double]("yules_k") - 1e4 * 2.0 / 9.0) < 1e-9)
    val two = Seq(("g", 1L, "a"), ("g", 2L, "a b a b")).toDF("g", "id", "text")
    val h = TextAnalysis.heapsFit(two, Seq("g"), "id", "text").head()
    assert(math.abs(h.getAs[Double]("beta") - 0.5) < 1e-12)
    assert(math.abs(h.getAs[Double]("k") - 1.0) < 1e-12)
  }

  test("avgNeighborDegree + richClub on hand graphs") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val knn = Graph.avgNeighborDegree(path).collect()
      .map(r => r.getAs[Long]("degree") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Double]("avg_nbr_degree"))).toMap
    assert(knn(1L) === (2L, 2.0)) // leaves see the hub
    assert(knn(2L) === (1L, 1.0)) // hub sees leaves
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val rc = Graph.richClub(tri, Seq(1L, 2L)).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(math.abs(rc(1L).getAs[Double]("phi") - 1.0) < 1e-12) // triangle core
    assert(rc(2L).getAs[Any]("phi") == null) // a single node has no pairs
  }

  test("dickeyFuller: alternating series is maximal mean reversion") {
    val df = Seq(1.0, -1.0, 1.0, -1.0, 1.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("k", "t", "v")
    val r = Forecast.dickeyFuller(df, Seq("k"), "t", "v").head()
    assert(math.abs(r.getAs[Double]("rho") - (-2.0)) < 1e-12)
    assert(r.getAs[Any]("t_stat") == null) // perfect fit -> zero RSS
  }

  test("apdex: textbook bucket split") {
    val df = Seq(10.0, 60.0, 100.0, 300.0).map(("svc", _)).toDF("svc", "v")
    val r = Metrics.apdex(df, Seq("svc"), "v", threshold = 50.0).head()
    assert(r.getAs[Long]("n_satisfied") === 1L)
    assert(r.getAs[Long]("n_tolerating") === 2L)
    assert(math.abs(r.getAs[Double]("apdex") - 0.5) < 1e-12)
  }

  test("postStratify: pooled weights remove composition imbalance") {
    val df = Seq(("A", "s1", 1.0), ("B", "s1", 3.0),
      ("A", "s2", 5.0), ("A", "s2", 5.0), ("B", "s2", 7.0))
      .toDF("arm", "s", "y")
    val got = Experiment.postStratify(df, "arm", "s", "y").collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(math.abs(got("A").getAs[Double]("post_strat_mean") - 3.4) < 1e-12)
    assert(math.abs(got("B").getAs[Double]("post_strat_mean") - 5.4) < 1e-12)
    assert(math.abs(got("A").getAs[Double]("coverage") - 1.0) < 1e-12)
  }

  test("multiSeasonalStrength: pure hour-of-day signal -> strength 1") {
    val rows = for (day <- 1 to 3; h <- 0 until 24) yield
      ("k", java.sql.Timestamp.valueOf(f"2024-01-0$day $h%02d:00:00"), h.toDouble)
    val df = rows.toDF("k", "t", "v")
    val r = graft.operators.Features.multiSeasonalStrength(df, Seq("k"), "t", "v").head()
    assert(math.abs(r.getAs[Double]("strength_hod") - 1.0) < 1e-12)
    assert(r.getAs[Any]("strength_dow") == null) // no residual variance left
  }

  test("logRank: symmetric arms give z = 0; early-vs-late separates") {
    val sym = Seq(("g", "A", 2L, 1), ("g", "A", 4L, 1),
      ("g", "B", 2L, 1), ("g", "B", 4L, 1)).toDF("g", "seg", "dur", "e")
    val r = Survival.logRank(sym, Seq("g"), "seg", "A", "B", "dur", "e").head()
    assert(math.abs(r.getAs[Double]("o1") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e1") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z")) < 1e-12)
    val sep = Seq(("g", "A", 1L, 1), ("g", "A", 1L, 1),
      ("g", "B", 5L, 1), ("g", "B", 5L, 1)).toDF("g", "seg", "dur", "e")
    val s = Survival.logRank(sep, Seq("g"), "seg", "A", "B", "dur", "e").head()
    assert(math.abs(s.getAs[Double]("o1") - 2.0) < 1e-12)
    assert(math.abs(s.getAs[Double]("e1") - 1.0) < 1e-12)
    assert(math.abs(s.getAs[Double]("z") - math.sqrt(3.0)) < 1e-9)
  }

  test("cmhOddsRatio: two-stratum hand golden = 2.6") {
    val rows =
      Seq.fill(3)(("s1", "A", 1)) ++ Seq.fill(1)(("s1", "A", 0)) ++
      Seq.fill(1)(("s1", "B", 1)) ++ Seq.fill(3)(("s1", "B", 0)) ++
      Seq.fill(2)(("s2", "A", 1)) ++ Seq.fill(2)(("s2", "A", 0)) ++
      Seq.fill(2)(("s2", "B", 1)) ++ Seq.fill(2)(("s2", "B", 0))
    val df = rows.toDF("s", "arm", "succ")
    val r = Experiment.cmhOddsRatio(df, Seq(), "s", "arm", "A", "B", "succ").head()
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(math.abs(r.getAs[Double]("or_mh") - 2.6) < 1e-12)
  }

  test("tweedieDeviance: zero at y = mu, Poisson zero-count term = 2mu") {
    val perfect = Seq(("k", 3.0, 3.0), ("k", 5.0, 5.0)).toDF("k", "y", "mu")
    assert(math.abs(Metrics.tweedieDeviance(perfect, Seq("k"), "y", "mu", 1)
      .head().getAs[Double]("mean_deviance")) < 1e-12)
    assert(math.abs(Metrics.tweedieDeviance(perfect, Seq("k"), "y", "mu", 2)
      .head().getAs[Double]("mean_deviance")) < 1e-12)
    val zero = Seq(("k", 0.0, 1.0)).toDF("k", "y", "mu")
    assert(math.abs(Metrics.tweedieDeviance(zero, Seq("k"), "y", "mu", 1)
      .head().getAs[Double]("mean_deviance") - 2.0) < 1e-12)
    // gamma domain: y = 0 is excluded, not NaN'd
    val g = Metrics.tweedieDeviance(zero, Seq("k"), "y", "mu", 2).head()
    assert(g.getAs[Long]("n_excluded") === 1L)
  }

  test("concordanceIndex: perfect and inverted predictors") {
    val df = Seq(("g", 1L, 1, 10.0), ("g", 2L, 1, 5.0), ("g", 3L, 0, 1.0))
      .toDF("g", "dur", "e", "pred")
    val r = Survival.concordanceIndex(df, Seq("g"), "dur", "e", "pred").head()
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(math.abs(r.getAs[Double]("c_index") - 1.0) < 1e-12)
    val inv = df.withColumn("pred", -col("pred"))
    assert(math.abs(Survival.concordanceIndex(inv, Seq("g"), "dur", "e", "pred")
      .head().getAs[Double]("c_index")) < 1e-12)
  }

  test("cooksDistance: OLS influence laws (Σh = 2, Σe ≈ 0, spike dominates)") {
    val df = Seq(0.0, 0.0, 0.0, 0.0, 10.0).zipWithIndex
      .map { case (v, i) => ("k", ts(i + 1), v) }.toDF("k", "t", "v")
    val rows = Robust.cooksDistance(df, Seq("k"), "t", "v")
      .orderBy("t").collect()
    val hSum = rows.map(_.getAs[Double]("leverage")).sum
    assert(math.abs(hSum - 2.0) < 1e-9, s"sum of leverages = $hSum, want p = 2")
    assert(math.abs(rows.map(_.getAs[Double]("resid")).sum) < 1e-9)
    val ds = rows.map(_.getAs[Double]("cooks_d"))
    assert(ds.last === ds.max, "the edge spike must carry the largest D")
  }

  test("friedman: perfectly ordered arms hit the k=3 maximum chi2 = 6") {
    val df = (1 to 3).flatMap(b => Seq((b, "a", 1.0), (b, "b", 2.0), (b, "c", 3.0)))
      .toDF("blk", "arm", "v")
    val r = Robust.friedman(df, "blk", "arm", "v").head()
    assert(r.getAs[Long]("n_blocks") === 3L && r.getAs[Long]("k") === 3L)
    assert(math.abs(r.getAs[Double]("chi2") - 6.0) < 1e-12)
    // incomplete blocks are dropped
    val withHole = df.unionByName(Seq((4, "a", 9.0)).toDF("blk", "arm", "v"))
    assert(Robust.friedman(withHole, "blk", "arm", "v").head()
      .getAs[Long]("n_blocks") === 3L)
  }

  test("snht: step series splits at the step with T = 6") {
    val df = (1 to 6).map(i => ("k", ts(i), if (i <= 3) 0.0 else 10.0))
      .toDF("k", "t", "v")
    val r = Anomaly.snht(df, Seq("k"), "t", "v").head()
    assert(r.getAs[java.sql.Timestamp]("split_ts").toInstant.getEpochSecond === 3L)
    assert(math.abs(r.getAs[Double]("t_stat") - 6.0) < 1e-9)
    // constant series: sd = 0 -> no rows (nothing to test)
    val flat = (1 to 5).map(i => ("k", ts(i), 2.0)).toDF("k", "t", "v")
    assert(Anomaly.snht(flat, Seq("k"), "t", "v").count() === 0L)
  }

  test("pageHinkley: flat series never alarms, a level jump does") {
    val df = (1 to 4).map(i => ("k", ts(i), Seq(0.0, 0.0, 0.0, 10.0)(i - 1)))
      .toDF("k", "t", "v")
    val got = Anomaly.pageHinkley(df, Seq("k"), "t", "v",
      delta = 0.0, lambda = 1.0).orderBy("t").collect()
    assert(got.map(_.getAs[Int]("alarm")).toSeq === Seq(0, 0, 0, 1))
    assert(math.abs(got.last.getAs[Double]("ph") - 7.5) < 1e-12)
    val flat = (1 to 6).map(i => ("k", ts(i), 5.0)).toDF("k", "t", "v")
    assert(Anomaly.pageHinkley(flat, Seq("k"), "t", "v", 0.0, 1.0)
      .agg(sum(col("alarm"))).head().getLong(0) === 0L)
  }

  test("rollingOriginSelect: right winner per series shape; held-out clipping; tie-break") {
    def day(i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(i.toLong * 86400))
    // trending key: y = 10t (drift extrapolates exactly); seasonal key:
    // period-4 pattern repeated (snaive m=4 is exact, drift/ses are not)
    val rows =
      (0 until 20).map(i => ("trend", day(i), 10.0 * i)) ++
      (0 until 20).map(i => ("season", day(i), Seq(5.0, 50.0, 5.0, 50.0)(i % 4) + (i % 4)))
    val df = rows.toDF("k", "t", "v")
    val cands: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      ("drift", d => Forecast.drift(d, Seq("k"), "t", "v", horizon = 4, stepSeconds = 86400L)),
      ("snaive4", d => Forecast.seasonalNaive(d, Seq("k"), "t", "v", period = 4, horizon = 4, stepSeconds = 86400L)))
    val out = Forecast.rollingOriginSelect(df, Seq("k"), "t", "v", cands,
      Seq(day(12), day(16))).collect()
    val best = out.filter(_.getBoolean(out.head.fieldIndex("is_best")))
      .map(r => r.getString(0) -> r.getAs[String]("model")).toMap
    assert(best("trend") === "drift", s"trend series must pick drift: ${out.toSeq}")
    assert(best("season") === "snaive4", s"seasonal series must pick snaive: ${out.toSeq}")
    // exact winners score sMAPE 0 on their home series
    out.foreach { r =>
      val k = r.getString(0); val m = r.getAs[String]("model")
      val s = r.getAs[Double]("smape")
      if (k == "trend" && m == "drift") assert(math.abs(s) < 1e-12)
      if (k == "season" && m == "snaive4") assert(math.abs(s) < 1e-12)
      // both folds fully scored: 2 folds x horizon 4 on a gap-free grid
      assert(r.getAs[Long]("n_eval") === 8L, s"($k,$m) n_eval")
    }
    // held-out clipping: a key whose history STOPS before the boundary
    // forecasts into its own train region — those rows must not score
    val stale = (0 until 8).map(i => ("stale", day(i), 1.0 * i)).toDF("k", "t", "v")
    val staleOut = Forecast.rollingOriginSelect(stale, Seq("k"), "t", "v",
      cands.take(1), Seq(day(12)))
    assert(staleOut.count() === 0, "stale key forecasts land pre-boundary; none may score")
    // deterministic name tie-break on identical scores: two copies of the
    // same candidate under different names -> rank by name
    val tied = Forecast.rollingOriginSelect(df.filter(col("k") === "trend"),
      Seq("k"), "t", "v",
      Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
        ("b_drift", d => Forecast.drift(d, Seq("k"), "t", "v", 4, 86400L)),
        ("a_drift", d => Forecast.drift(d, Seq("k"), "t", "v", 4, 86400L))),
      Seq(day(12))).orderBy("rank").collect()
    assert(tied.map(_.getAs[String]("model")).toSeq === Seq("a_drift", "b_drift"))
    assert(tied.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }
}
