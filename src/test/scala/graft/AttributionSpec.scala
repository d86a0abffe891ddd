package graft

import org.apache.spark.sql.functions._
import graft.operators.{Attribution, Features, Profile}

/** Hand-derived goldens for the batch: Markov removal-effect attribution,
  * top-k leaderboard churn, and Haar multi-resolution downsampling.
  */
class AttributionSpec extends SparkSuite {
  import spark.implicits._

  test("removalEffects: hand-derived 2-channel chain, truncation at first CONV") {
    // u1: A, CONV, (B after conv — must be truncated away)
    // u2: A, B (no conversion -> B -> NULL)
    // u3: B, CONV
    // counts: START->A 2, START->B 1, A->CONV 1, A->B 1, B->NULL 1, B->CONV 1
    // base p_conv(3 steps) = 2/3; remove A -> 1/6 (eff 3/4); remove B -> 1/3 (eff 1/2)
    val ev = Seq(
      ("u1", 1L, 1L, "A"), ("u1", 2L, 2L, "conv"), ("u1", 3L, 3L, "B"),
      ("u2", 1L, 4L, "A"), ("u2", 2L, 5L, "B"),
      ("u3", 1L, 6L, "B"), ("u3", 2L, 7L, "conv"))
      .toDF("u", "ts", "id", "t")
    val got = Attribution.removalEffects(ev, "u", "ts", "id", "t",
        convType = "conv", channels = Seq("A", "B"), steps = 3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(approxEq(got("base")._1, 2.0 / 3))
    assert(got("base")._2.isNaN)
    assert(approxEq(got("A")._1, 1.0 / 6) && approxEq(got("A")._2, 0.75))
    assert(approxEq(got("B")._1, 1.0 / 3) && approxEq(got("B")._2, 0.5))
  }

  test("removalEffects: p_conv monotone in steps (absorbing self-loops conserve mass)") {
    val ev = Seq(
      ("u1", 1L, 1L, "A"), ("u1", 2L, 2L, "conv"),
      ("u2", 1L, 3L, "A"), ("u2", 2L, 4L, "B"), ("u2", 3L, 5L, "conv"),
      ("u3", 1L, 6L, "B"))
      .toDF("u", "ts", "id", "t")
    def pConv(steps: Int) = Attribution.removalEffects(ev, "u", "ts", "id",
        "t", "conv", Seq("A", "B"), steps)
      .filter(col("removed_channel") === "base").head.getDouble(1)
    val ps = Seq(1, 2, 3, 5).map(pConv)
    assert(ps.zip(ps.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(ps.last <= 1.0 + 1e-12)
  }

  test("topKChurn: leaderboard turnover Jaccard, first period emits no row") {
    val df = Seq(
      ("g", 1L, "a", 10L), ("g", 1L, "b", 5L), ("g", 1L, "c", 1L),
      ("g", 2L, "b", 10L), ("g", 2L, "c", 5L))
      .toDF("g", "period", "item", "cnt")
    val got = Profile.topKChurn(df, Seq("g"), "period", "item", "cnt", k = 2)
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("period") === 2L)
    assert(r.getAs[Long]("n_prev") === 2L && r.getAs[Long]("n_cur") === 2L)
    assert(r.getAs[Long]("n_common") === 1L) // only b survives
    assert(approxEq(r.getAs[Double]("jaccard"), 1.0 / 3))
  }

  test("haarDownsample: dyadic-exact approx/detail and child reconstruction") {
    // counts per 10-us base bucket: b0=3, b1=1, b2=2 (b3 absent = 0)
    val us = Seq(0L, 3L, 7L, 12L, 20L, 29L)
    val df = us.map(u => ("g", u)).toDF("g", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Features.haarDownsample(df, Seq("g"), "ts", epochUs = 0L,
        baseUs = 10L, levels = 2)
      .collect().map(r => (r.getAs[Int]("level"), r.getAs[Long]("idx")) ->
        (r.getAs[Double]("approx"), r.getAs[Double]("detail"))).toMap
    assert(got((1, 0L)) === ((2.0, 1.0)))  // (3+1)/2, (3-1)/2
    assert(got((1, 1L)) === ((1.0, 1.0)))  // (2+0)/2, (2-0)/2
    assert(got((2, 0L)) === ((1.5, 0.5)))  // 6/4, (4-2)/4
    // reconstruction: approx_2 ± detail_2 = the two level-1 approxes
    val (a2, d2) = got((2, 0L))
    assert(a2 + d2 === got((1, 0L))._1 && a2 - d2 === got((1, 1L))._1)
  }
}
