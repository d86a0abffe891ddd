package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomJoin, Features, Intervals, Robust, Scalers, Segment, Sessions}

class SegmentSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rfm: aligned metrics score rank+1, integer-exact") {
    // customer i: i orders, latest ts i*100s, amount i*10 each
    val rows = for { i <- 1 to 5; j <- 1 to i }
      yield (i.toLong, ts(f"2024-01-0$j%d 00:0$i%02d:00"), i * 10.0)
    val got = Segment.rfm(rows.toDF("cust", "ts", "amt"), "cust", "ts", "amt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    (1 to 5).foreach { i =>
      assert(got(i.toLong) === ((i.toLong, i.toLong, i.toLong)), s"cust $i")
    }
    // monetary check: cust 3 spent 3 * 30
    val m = Segment.rfm(rows.toDF("cust", "ts", "amt"), "cust", "ts", "amt")
      .filter($"cust" === 3).head.getDouble(3)
    assert(m === 90.0)
  }

  test("rfm: exact ties break on customer id; buckets=2 splits in half") {
    val rows = Seq(
      (7L, ts("2024-01-01 00:00:00"), 50.0),
      (3L, ts("2024-01-01 00:00:00"), 50.0))
    val got = Segment.rfm(rows.toDF("cust", "ts", "amt"), "cust", "ts", "amt",
      buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(3L -> 1L, 7L -> 2L)) // lower id ranks first
  }

  test("ltvCurve: cumulative per-cohort revenue over month offsets") {
    val rows = Seq(
      (1L, ts("1995-01-05 00:00:00"), 100.0),
      (1L, ts("1995-03-10 00:00:00"), 50.0),
      (2L, ts("1995-01-20 00:00:00"), 10.0),
      (3L, ts("1995-02-02 00:00:00"), 70.0))
    val got = Segment.ltvCurve(rows.toDF("cust", "ts", "amt"), "cust", "ts", "amt")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val c95jan = 1995 * 12 + 1
    assert(got((c95jan, 0)) === ((2L, 110.0, 110.0, 55.0)))
    assert(got((c95jan, 2)) === ((2L, 50.0, 160.0, 80.0)))
    assert(got((c95jan + 1, 0)) === ((1L, 70.0, 70.0, 70.0)))
    assert(got.size === 3)
  }

  test("stickiness: trailing-window distinct actives, active days only") {
    val rows = Seq(
      ("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-01 11:00:00")),
      ("u1", ts("2024-01-02 10:00:00")),
      ("u2", ts("2024-01-01 10:00:00")),
      ("u3", ts("2024-01-03 10:00:00")))
    val got = Sessions.stickiness(rows.toDF("u", "ts"), "u", "ts", windowDays = 2)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 2L, 1.0)),  // u1,u2 that day; window {d0,d1}
      "2024-01-02" -> ((1L, 2L, 0.5)),  // u1; window d1..d2 has u1,u2
      "2024-01-03" -> ((1L, 2L, 0.5)))) // u3; window d2..d3 has u1,u3
  }

  test("timeWeightedAvg: LOCF integral over irregular samples") {
    val rows = Seq(
      // u1: 10 held 10 s, 20 held 30 s, last value never weighted
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:00:10"), 2L, 20.0),
      (1L, ts("2024-01-01 00:00:40"), 3L, 99.0),
      // u2: single point -> no interval, twa null
      (2L, ts("2024-01-01 00:00:00"), 4L, 5.0),
      // u3: duplicate timestamp -> zero-length interval contributes 0
      (3L, ts("2024-01-01 00:00:00"), 5L, 5.0),
      (3L, ts("2024-01-01 00:00:00"), 6L, 7.0),
      (3L, ts("2024-01-01 00:00:10"), 7L, 1.0))
    val got = Features.timeWeightedAvg(rows.toDF("u", "ts", "id", "v"),
        Seq("u"), "ts", "id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 === 40.0)
    assert(approxEq(got(1L)._3.get, (10.0 * 10 + 20.0 * 30) / 40))
    assert(got(2L)._3.isEmpty)
    assert(approxEq(got(3L)._3.get, 7.0)) // only the 7-for-10s interval weighs
  }

  test("bloomSemiJoin: exact left-semi parity and scan-level pre-filter") {
    // spark.range, not a LocalRelation: ConvertToLocalRelation would fold
    // the bloom filter away at optimization time and hide it from the plan
    val big = spark.range(2000).select(($"id" % 500).as("k"),
      concat(lit("p"), $"id").as("payload"))
    val small = (0L until 100L).map(i => i * 3).toDF("sk") // 0,3,..297
    val got = BloomJoin.semiJoin(big, small, "k", "sk")
    val want = big.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
    assert(got.collect().map(_.toString).sorted.toSeq ===
      want.collect().map(_.toString).sorted.toSeq)
    // the bloom pre-filter must sit in the plan (below the exact join)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    // empty build side -> empty result, no exception
    assert(BloomJoin.semiJoin(big, small.filter(lit(false)), "k", "sk")
      .count() === 0L)
  }

  test("rankBiasedOverlap: identical lists = 1-p^d, swap golden, disjoint empty") {
    // 12 items, identical counts/order in both lists
    val a = (1 to 12).map(i => ("g", s"i$i%02d".format(i), (100 - i).toLong))
      .toDF("g", "item", "cnt")
    val same = Robust.rankBiasedOverlap(a, a, Seq("g"), "item", "cnt",
      depth = 10, p = 0.9).head
    assert(same.getLong(1) === 10L)
    assert(approxEq(same.getDouble(2), 1.0 - math.pow(0.9, 10)))
    // two items, ranks swapped, d=2 p=0.5: rbo = 0.25 (hand-derived)
    val x = Seq(("g", "x", 10L), ("g", "y", 5L)).toDF("g", "item", "cnt")
    val y = Seq(("g", "x", 5L), ("g", "y", 10L)).toDF("g", "item", "cnt")
    val sw = Robust.rankBiasedOverlap(x, y, Seq("g"), "item", "cnt", 2, 0.5).head
    assert(sw.getLong(1) === 2L)
    assert(approxEq(sw.getDouble(2), 0.25))
    // disjoint item sets: no common row, group disappears
    val z = Seq(("g", "zz", 10L)).toDF("g", "item", "cnt")
    assert(Robust.rankBiasedOverlap(x, z, Seq("g"), "item", "cnt", 2, 0.5)
      .count() === 0L)
  }

  test("coverage: overlap merge, touching merge, clipping, zero-length drop") {
    val iv = Seq(
      ("k1", 0L, 10L, 1L), ("k1", 5L, 15L, 2L),   // overlap -> [0,15]
      ("k1", 20L, 30L, 3L), ("k1", 30L, 40L, 4L), // touching -> [20,40]
      ("k1", 90L, 120L, 5L),                      // clipped -> [90,100]
      ("k1", 50L, 50L, 6L),                       // zero-length: drops
      ("k2", 200L, 300L, 7L))                     // fully outside: no row
      .toDF("k", "s_us", "e_us", "id")
    val got = Intervals.coverage(iv, Seq("k"), "s_us", "e_us", "id",
      winStartUs = 0L, winEndUs = 100L).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getString(0) === "k1")
    assert(r.getLong(1) === 3L)       // three merged spans
    assert(r.getLong(2) === 45L)      // 15 + 20 + 10
    assert(approxEq(r.getDouble(3), 0.45))
  }

  test("quantileNormalize: rank-mean reference, unequal group sizes") {
    val df = Seq(
      ("g1", 1L, 1.0), ("g1", 2L, 3.0), ("g1", 3L, 5.0),
      ("g2", 4L, 2.0), ("g2", 5L, 4.0))
      .toDF("g", "id", "v")
    val got = Scalers.quantileNormalize(df, "g", "id", "v")
      .collect().map(r => r.getLong(1) -> (r.getInt(3), r.getDouble(4))).toMap
    assert(got(1L) === ((1, 1.5)) && got(4L) === ((1, 1.5))) // rank 1 avg(1,2)
    assert(got(2L)._2 === 3.5 && got(5L)._2 === 3.5) // rank 2 avg(3,4)
    assert(got(3L)._2 === 5.0)                       // rank 3: g1 only
    val nAt = Scalers.quantileNormalize(df, "g", "id", "v")
      .collect().map(r => r.getInt(3) -> r.getLong(5)).toMap
    assert(nAt(3) === 1L && nAt(1) === 2L)
  }
}
