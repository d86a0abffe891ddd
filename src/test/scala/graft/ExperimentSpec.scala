package graft

import graft.operators.Experiment

/** Hand-derived goldens for the experimentation-analytics family. */
class ExperimentSpec extends SparkSuite {
  import spark.implicits._

  test("cuped: y = 2x exactly -> theta 2, all adjusted means equal, reduction 1") {
    val unit = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("b", 3.0, 6.0),
      ("b", 4.0, 8.0)).toDF("seg", "x", "y")
    val got = Experiment.cuped(unit, "seg", "y", "x")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("y_mean"), r.getAs[Double]("y_adj_mean"),
          r.getAs[Double]("theta"), r.getAs[Double]("var_reduction"))).toMap
    assert(approxEq(got("a")._3, 2.0) && approxEq(got("b")._3, 2.0))
    // a perfectly predictive covariate maps every arm to the global mean
    assert(approxEq(got("a")._2, 5.0) && approxEq(got("b")._2, 5.0))
    assert(approxEq(got("a")._1, 3.0) && approxEq(got("b")._1, 7.0))
    assert(approxEq(got("a")._4, 1.0))
  }

  test("diffInDiff: 2x2 cell means and the DiD estimate") {
    val df = Seq(
      ("g", 1, 0, 1.0), ("g", 1, 0, 3.0), // treat pre: mean 2
      ("g", 1, 1, 5.0),                   // treat post: mean 5
      ("g", 0, 0, 2.0),                   // control pre: mean 2
      ("g", 0, 1, 3.0), ("g", 0, 1, 5.0)) // control post: mean 4
      .toDF("g", "treat", "post", "y")
    val r = Experiment.diffInDiff(df, Seq("g"), "treat", "post", "y").head
    assert(approxEq(r.getAs[Double]("m_t0"), 2.0))
    assert(approxEq(r.getAs[Double]("m_t1"), 5.0))
    assert(approxEq(r.getAs[Double]("m_c0"), 2.0))
    assert(approxEq(r.getAs[Double]("m_c1"), 4.0))
    assert(approxEq(r.getAs[Double]("did"), 1.0)) // (5-2)-(4-2)
  }

  test("srmCheck: 6/4 split against 50/50 gives chi2 = 0.4; balanced gives 0") {
    val df = (Seq.fill(6)(("g", "0")) ++ Seq.fill(4)(("g", "1")))
      .toDF("g", "arm")
    val r = Experiment.srmCheck(df, Seq("g"), "arm",
      Seq("0" -> 0.5, "1" -> 0.5)).head
    assert(r.getAs[Long]("n") === 10L)
    assert(approxEq(r.getAs[Double]("chi2"), 0.4))
    val bal = (Seq.fill(5)(("g", "0")) ++ Seq.fill(5)(("g", "1")))
      .toDF("g", "arm")
    assert(Experiment.srmCheck(bal, Seq("g"), "arm",
      Seq("0" -> 0.5, "1" -> 0.5)).head.getAs[Double]("chi2") === 0.0)
  }

  test("ebShrinkRates: MoM prior golden; zero-variance rates hit the floor") {
    // rates 1, 0, .5, .5: m=.5, v=.125, ab = max(.25/.125 - 1, 1) = 1
    val items = Seq((1L, 1L, 1L), (2L, 0L, 1L), (3L, 1L, 2L), (4L, 1L, 2L))
      .toDF("id", "x", "n")
    val got = Experiment.ebShrinkRates(items, Seq("id"), "x", "n")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("prior_strength"), r.getAs[Double]("shrunk"))).toMap
    assert(got.values.forall(v => approxEq(v._1, 1.0)))
    assert(approxEq(got(1L)._2, 0.75))  // (1 + .5)/(1 + 1)
    assert(approxEq(got(2L)._2, 0.25))  // (0 + .5)/(1 + 1)
    assert(approxEq(got(3L)._2, 0.5))   // (1 + .5)/(2 + 1)
    // identical rates: v = 0 -> prior strength = the floor, shrink is mild
    val flat = Seq((1L, 1L, 2L), (2L, 2L, 4L)).toDF("id", "x", "n")
    Experiment.ebShrinkRates(flat, Seq("id"), "x", "n", minConcentration = 2.0)
      .collect().foreach { r =>
        assert(r.getAs[Double]("prior_strength") === 2.0)
        assert(approxEq(r.getAs[Double]("shrunk"),
          (r.getAs[Long]("x") + 0.5 * 2.0) / (r.getAs[Long]("n") + 2.0)))
      }
  }
}
