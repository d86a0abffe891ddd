package graft

import graft.operators.Spc

class SpcSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int) =
    new java.sql.Timestamp((1704067200L + i * 86400L) * 1000L)

  test("imrChart: spike trips both the X and MR charts") {
    val v = Seq(1.0, 2, 1, 2, 100)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = Spc.imrChart(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    val mrbar = (1.0 + 1 + 1 + 98) / 4
    val xbar = v.sum / 5
    assert(approxEq(r.getAs[Double]("xbar"), xbar, 1e-12))
    assert(approxEq(r.getAs[Double]("mrbar"), mrbar, 1e-12))
    assert(approxEq(r.getAs[Double]("ucl_x"), xbar + 2.66 * mrbar, 1e-12))
    assert(r.getAs[Long]("ooc_x") === 1L)  // 100 > 88.365
    assert(r.getAs[Long]("ooc_mr") === 1L) // 98 > 82.49
    // quiet series: nothing out of control
    val q = Seq(1.0, 2, 1, 2, 1)
    val rq = Spc.imrChart(q.indices.map(i => (ts(i), q(i))).toDF("t", "v"),
      "t", "v").collect()(0)
    assert(rq.getAs[Long]("ooc_x") === 0L)
    assert(rq.getAs[Long]("ooc_mr") === 0L)
  }

  test("ewmaChart: level shift vs reference params, hand-recurrence parity") {
    val v = Seq.fill(10)(0.0) ++ Seq.fill(5)(2.0)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    // reference in-control parameters mu0 = 0, sigma0 = 1
    val r = Spc.ewmaChart(df, "t", "v", 0.2, 3.0, Some(0.0), Some(1.0))
      .collect()(0)
    var z = 0.0
    var ooc = 0
    v.zipWithIndex.foreach { case (x, i0) =>
      val t = i0 + 1
      z = 0.2 * x + 0.8 * z
      val lim = 3.0 * math.sqrt(0.2 / 1.8 * (1 - math.pow(0.8, 2.0 * t)))
      if (math.abs(z) > lim) ooc += 1
    }
    assert(r.getAs[Long]("n") === 15L)
    assert(approxEq(r.getAs[Double]("xbar"), 0.0, 1e-12))
    assert(approxEq(r.getAs[Double]("sigma"), 1.0, 1e-12))
    assert(r.getAs[Long]("ooc") === ooc.toLong)
    assert(ooc > 0, "2-sigma shift must trip the reference-param chart")
    // in-sample fallback still matches its own recurrence
    val xbar = v.sum / v.length
    val sigma = math.sqrt(v.map(x => x * x).sum / v.length - xbar * xbar)
    val rf = Spc.ewmaChart(df, "t", "v", 0.2, 3.0).collect()(0)
    assert(approxEq(rf.getAs[Double]("xbar"), xbar, 1e-12))
    assert(approxEq(rf.getAs[Double]("sigma"), sigma, 1e-12))
  }

  test("capability: {4,6} against [0,10] specs") {
    val df = Seq(4.0, 6.0).map(Tuple1(_)).toDF("v")
    val r = Spc.capability(df, "v", 0.0, 10.0).collect()(0)
    assert(approxEq(r.getAs[Double]("mu"), 5.0, 1e-12))
    assert(approxEq(r.getAs[Double]("sigma"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("cp"), 10.0 / 6, 1e-12))
    assert(approxEq(r.getAs[Double]("cpk"), 5.0 / 3, 1e-12))
  }

  test("westernElectric: strict ascent trips rule 3 at positions 6..10") {
    val df = (1 to 10).map(i => (ts(i), i.toDouble)).toDF("t", "v")
    val r = Spc.westernElectric(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    // MR-bar sigma = 1/1.128 = 0.8865: 3-sigma band is mu +- 2.6596, so
    // the trend's extremes {1,2,9,10} trip rule 1 — exactly the WECO
    // sensitivity the population-SD convention (sigma 2.87, 0 trips)
    // would have hidden; imrChart's ooc_x uses the same MR sigma
    assert(r.getAs[Long]("r1") === 4L)
    assert(r.getAs[Long]("r2") === 0L)
    assert(r.getAs[Long]("r3") === 5L)
    assert(r.getAs[Long]("r4") === 0L)
    // 14 alternating points trip rule 4 exactly once
    val alt = (0 until 14).map(i =>
      (ts(i), if (i % 2 == 0) 1.0 else 2.0)).toDF("t", "v")
    val ra = Spc.westernElectric(alt, "t", "v").collect()(0)
    assert(ra.getAs[Long]("r4") === 1L)
  }
}
