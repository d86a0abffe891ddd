package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, Robust, Survival}

/** Textbook goldens for the survival / hypothesis-test / divergence batch. */
class SurvivalStatsSpec extends SparkSuite {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring; rows only at event times") {
    // durations: 1(event), 2(censored), 3(event), 4(event), 5(censored)
    val df = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1), ("g", 4L, 1),
      ("g", 5L, 0)).toDF("g", "dur", "e")
    val got = Survival.kaplanMeier(df, Seq("g"), "dur", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Double]("survival"))).toMap
    assert(got.keySet === Set(1L, 3L, 4L)) // censor-only times emit no row
    assert(got(1L)._1 === 5L && approxEq(got(1L)._2, 0.8))
    assert(got(3L)._1 === 3L && approxEq(got(3L)._2, 0.8 * 2 / 3))
    assert(got(4L)._1 === 2L && approxEq(got(4L)._2, 0.8 * 2 / 3 * 0.5))
  }

  test("kaplanMeier: everyone dies at once -> survival exactly 0, no ln(0) NaN") {
    val df = Seq(("g", 2L, 1), ("g", 2L, 1)).toDF("g", "dur", "e")
    val got = Survival.kaplanMeier(df, Seq("g"), "dur", "e").collect()
    assert(got.length === 1)
    assert(got.head.getAs[Double]("survival") === 0.0)
    assert(got.head.getAs[Long]("n_risk") === 2L)
  }

  test("mannWhitney: midrank ties, tie-corrected z (hand-derived)") {
    // A = [1,2,3], B = [2,4]: midranks 1, 2.5, 2.5, 4, 5
    // R_A = 7.5, U_A = 1.5; mu = 3; tie term = 6; var = 0.5*(6 - 6/20) = 2.85
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0),
      ("g", "B", 2.0), ("g", "B", 4.0)).toDF("g", "seg", "v")
    val r = Robust.mannWhitney(df, Seq("g"), "seg", "A", "B", "v").head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(approxEq(r.getAs[Double]("u_a"), 1.5))
    assert(approxEq(r.getAs[Double]("z"), (1.5 - 3.0) / math.sqrt(2.85)))
  }

  test("cohenKappa: classic 2x2 table gives kappa = 0.4 exactly") {
    // 20 yes/yes, 15 no/no, 10 yes/no, 5 no/yes: po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)(("g", "y", "y")) ++ Seq.fill(15)(("g", "n", "n")) ++
      Seq.fill(10)(("g", "y", "n")) ++ Seq.fill(5)(("g", "n", "y"))
    val r = Robust.cohenKappa(rows.toDF("g", "a", "b"), Seq("g"), "a", "b").head
    assert(r.getAs[Long]("n") === 50L && r.getAs[Long]("n_agree") === 35L)
    assert(r.getAs[Double]("kappa") === 0.4) // integer arithmetic: exact
  }

  test("jsDivergence: zero for the global-matching group, formula golden else") {
    // g1: all 'a' (4 rows); g2: all 'b' (4 rows); global = 50/50
    val df = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g2", "b")))
      .toDF("g", "cat")
    val got = Profile.jsDivergence(df, Seq("g"), "cat", Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd")).toMap
    val expected = (1.0 * math.log(2 / 1.5) + 0.5 * math.log(1 / 1.5)) / 2 +
      0.5 * math.log(2.0) / 2
    assert(approxEq(got("g1"), expected) && approxEq(got("g2"), expected))
    // a group whose mix equals the global mix diverges by exactly 0
    val bal = (Seq.fill(2)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(2)(("g2", "a")) ++ Seq.fill(2)(("g2", "b"))).toDF("g", "cat")
    Profile.jsDivergence(bal, Seq("g"), "cat", Seq("a", "b"))
      .collect().foreach(r => assert(r.getAs[Double]("jsd") === 0.0))
  }

  test("nelsonAalen: textbook hazard accumulation with censoring") {
    // durations: 1 (event), 1 (event), 2 (censored), 3 (event)
    // t=1: n=4, d=2 -> H = 0.5; t=2 censor-only (skipped, adds 0);
    // t=3: n=1, d=1 -> H = 1.5
    val df = Seq(("g", 1L, 1), ("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1))
      .toDF("g", "dur", "e")
    val got = Survival.nelsonAalen(df, Seq("g"), "dur", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Double]("cum_hazard"),
          r.getAs[Double]("survival_fh"))).toMap
    assert(got.keySet === Set(1L, 3L)) // censor-only t=2 not emitted
    assert(got(1L)._1 === 4L && approxEq(got(1L)._2, 0.5))
    assert(got(3L)._1 === 1L && approxEq(got(3L)._2, 1.5))
    assert(approxEq(got(3L)._3, math.exp(-1.5)))
    // Fleming–Harrington survival sits at or above Kaplan–Meier
    val km = Survival.kaplanMeier(df, Seq("g"), "dur", "e")
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("survival")).toMap
    km.foreach { case (t, s) => assert(got(t)._3 >= s - 1e-12) }
  }

  test("hodgesLehmann: median of Walsh averages, outlier-damped") {
    // values {1, 2, 6}: Walsh avgs 1, 1.5, 3.5, 2, 4, 6 -> median 2.75
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 6.0))
      .toDF("g", "id", "v")
    val r = Robust.hodgesLehmann(df, Seq("g"), "id", "v").head
    assert(r.getAs[Long]("n_points") === 3L)
    assert(approxEq(r.getAs[Double]("hl_center"), 2.75))
    // replacing the max with a wild outlier moves HL less than the mean
    val wild = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 600.0))
      .toDF("g", "id", "v")
    val hlWild = Robust.hodgesLehmann(wild, Seq("g"), "id", "v")
      .head.getAs[Double]("hl_center")
    // Walsh avgs {1, 1.5, 2, 300.5, 301, 600} -> median (2 + 300.5)/2
    assert(math.abs(hlWild - 151.25) < 1e-9)
  }
}
