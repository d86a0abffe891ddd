package graft

import graft.operators.OpsMath

class OpsMathSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int) =
    new java.sql.Timestamp((1704067200L + i * 86400L) * 1000L)

  test("erlangC: textbook B(2,1) = 0.2, C = 1/3, wait = 1/3") {
    val df = Seq((1, 1.0)).toDF("k", "lam")
    val r = OpsMath.erlangC(df, Seq("k"), "lam", 1.0, 2).collect()(0)
    assert(approxEq(r.getAs[Double]("offered_a"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("erlang_b"), 0.2, 1e-12))
    assert(approxEq(r.getAs[Double]("erlang_c"), 1.0 / 3, 1e-12))
    assert(approxEq(r.getAs[Double]("mean_wait"), 1.0 / 3, 1e-12))
    // unstable queue (a >= N) reports null C honestly
    val hot = Seq((1, 5.0)).toDF("k", "lam")
    val rh = OpsMath.erlangC(hot, Seq("k"), "lam", 1.0, 2).collect()(0)
    assert(rh.isNullAt(rh.fieldIndex("erlang_c")))
  }

  test("newsvendor: symmetric costs stock the median") {
    val df = Seq(1.0, 2, 3, 4).map(Tuple1(_)).toDF("d")
    val r = OpsMath.newsvendor(df, "d", 1.0, 1.0).collect()(0)
    assert(approxEq(r.getAs[Double]("ratio"), 0.5, 1e-12))
    assert(approxEq(r.getAs[Double]("q_star"), 2.5, 1e-12))
    assert(approxEq(r.getAs[Double]("exp_short"), 0.5, 1e-12))
    assert(approxEq(r.getAs[Double]("exp_left"), 0.5, 1e-12))
  }

  test("capacityRunway: 5 days of 10 against capacity 100") {
    val df = (0 until 5).map(i => (ts(i), 10.0)).toDF("t", "v")
    val r = OpsMath.capacityRunway(df, "t", "v", 100.0, 2).collect()(0)
    assert(approxEq(r.getAs[Double]("level"), 50.0, 1e-12))
    assert(approxEq(r.getAs[Double]("run_rate"), 10.0, 1e-12))
    assert(approxEq(r.getAs[Double]("runway_buckets"), 5.0, 1e-12))
    // already over capacity -> null runway
    val ro = OpsMath.capacityRunway(df, "t", "v", 40.0, 2).collect()(0)
    assert(ro.isNullAt(ro.fieldIndex("runway_buckets")))
  }
}
