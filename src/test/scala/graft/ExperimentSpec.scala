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

  test("ucb1: hand golden; the under-pulled arm gets the bigger bonus") {
    // arm a: 3 pulls mean 1.0; arm b: 1 pull mean 2.0; N = 4
    val df = Seq(("g", "a", 1.0), ("g", "a", 1.0), ("g", "a", 1.0),
      ("g", "b", 2.0)).toDF("g", "arm", "v")
    val got = Experiment.ucb1(df, Seq("g"), "arm", "v", c = 1.0)
      .collect().map(r => r.getString(1) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_total"),
          r.getAs[Double]("mean"), r.getAs[Double]("ucb"))).toMap
    assert(got("a")._1 === 3L && got("b")._1 === 1L)
    assert(got.values.forall(_._2 == 4L))
    assert(approxEq(got("a")._4, 1.0 + math.sqrt(2 * math.log(4.0) / 3)))
    assert(approxEq(got("b")._4, 2.0 + math.sqrt(2 * math.log(4.0) / 1)))
    // exploration bonus shrinks with pulls
    assert(got("b")._4 - got("b")._3 > got("a")._4 - got("a")._3)
  }

  test("anovaF: hand golden; identical arm means -> F = 0") {
    // arms a = {1, 3} (mean 2), b = {5, 7} (mean 6): SSB = 16, SSW = 4,
    // F = (16/1)/(4/2) = 8
    val df = Seq(("g", "a", 1.0), ("g", "a", 3.0), ("g", "b", 5.0),
      ("g", "b", 7.0)).toDF("g", "arm", "v")
    val r = Experiment.anovaF(df, Seq("g"), "arm", Seq("a", "b"), "v").head
    assert(approxEq(r.getAs[Double]("ssb"), 16.0))
    assert(approxEq(r.getAs[Double]("ssw"), 4.0))
    assert(approxEq(r.getAs[Double]("f_stat"), 8.0))
    val flat = Seq(("g", "a", 1.0), ("g", "a", 3.0), ("g", "b", 1.0),
      ("g", "b", 3.0)).toDF("g", "arm", "v")
    val f = Experiment.anovaF(flat, Seq("g"), "arm", Seq("a", "b"), "v").head
    assert(math.abs(f.getAs[Double]("ssb")) < 1e-9)
    assert(math.abs(f.getAs[Double]("f_stat")) < 1e-9)
  }

  test("fdrAdjust: textbook BH and Holm goldens") {
    // m = 4, sorted p = .01, .02, .03, .04:
    // BH: p·m/rank = .04, .04, .04, .04 -> reversed running min all .04
    // Holm: (m-rank+1)·p = .04, .06, .06, .04 -> running max .04,.06,.06,.06
    val df = Seq(("f", "h1", 0.01), ("f", "h2", 0.02), ("f", "h3", 0.03),
      ("f", "h4", 0.04)).toDF("fam", "id", "p")
    val got = Experiment.fdrAdjust(df, Seq("fam"), "p", "id")
      .collect().map(r => r.getString(1) ->
        (r.getAs[Int]("p_rank"), r.getAs[Double]("p_bh"),
          r.getAs[Double]("p_holm"))).toMap
    assert(got("h1")._1 === 1 && got("h4")._1 === 4)
    assert(got.values.forall(v => approxEq(v._2, 0.04)))
    assert(approxEq(got("h1")._3, 0.04))
    assert(approxEq(got("h2")._3, 0.06))
    assert(approxEq(got("h3")._3, 0.06))
    assert(approxEq(got("h4")._3, 0.06))
    // adjusted p never exceeds 1
    val big = Seq(("f", "a", 0.9), ("f", "b", 0.95)).toDF("fam", "id", "p")
    Experiment.fdrAdjust(big, Seq("fam"), "p", "id").collect().foreach { r =>
      assert(r.getAs[Double]("p_bh") <= 1.0 && r.getAs[Double]("p_holm") <= 1.0)
    }
  }

  test("mdePower: closed-form sizing golden; degenerate arms null out") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // g: 100 control rows / 10 conv, 100 treat rows / 10 conv
    // h: every row converts -> p_pool = 1 -> mde/n_required null
    val rows = (0 until 200).map(i => ("g", i.toLong, if (i % 20 < 2) 1L else 0L)) ++
      (0 until 10).map(i => ("h", i.toLong, 1L))
    val df = rows.toDF("grp", "uid", "conv")
    val out = Experiment.mdePower(df, Seq("grp"),
        isControl = pmod(col("uid"), lit(2L)) === 0, convCol = "conv",
        targetRel = 0.10)
      .orderBy("grp").collect()
    val g = out(0)
    assert(g.getAs[Long]("n_a") == 100L && g.getAs[Long]("n_b") == 100L)
    assert(approxEq(g.getAs[Double]("p_control"), 0.1))
    assert(approxEq(g.getAs[Double]("p_pool"), 0.1))
    val zs = Experiment.Z975 + Experiment.Z80
    val mde = zs * math.sqrt(0.1 * 0.9 * (1.0 / 100 + 1.0 / 100))
    assert(approxEq(g.getAs[Double]("mde_abs"), mde))
    assert(approxEq(g.getAs[Double]("mde_rel"), mde / 0.1))
    assert(approxEq(g.getAs[Double]("n_required"),
      2.0 * 0.1 * 0.9 * zs * zs / (0.01 * 0.01)))
    val h = out(1)
    assert(h.isNullAt(h.fieldIndex("mde_abs")) &&
      h.isNullAt(h.fieldIndex("n_required")))
  }
}
