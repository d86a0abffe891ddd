package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.codec.TsCodec

/** Gorilla XOR + delta-of-delta round-trip identity (FIXTURES.md §5):
  * bit-pattern fidelity incl. NaN, ±0.0, ±Inf, subnormals, constant runs.
  */
class CodecSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def sameBits(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.indices.forall(i =>
      java.lang.Double.doubleToRawLongBits(a(i)) == java.lang.Double.doubleToRawLongBits(b(i)))

  private def roundTripOk(ts: Array[Long], vs: Array[Double]): Boolean = {
    val (ts2, vs2) = TsCodec.decode(TsCodec.encode(ts, vs))
    ts2.sameElements(ts) && sameBits(vs2, vs)
  }

  test("empty and singleton blocks") {
    assert(roundTripOk(Array.empty, Array.empty))
    assert(roundTripOk(Array(1704067200L), Array(3.14)))
    assert(roundTripOk(Array(0L), Array(Double.NaN)))
  }

  test("special values") {
    val vs = Array(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, 1.0, 1.0, 1.0)
    assert(roundTripOk(vs.indices.map(i => 1704067200L + i * 60L).toArray, vs))
  }

  test("constant run compresses to ~2 bits per point") {
    val n = 1000
    val ts = (0 until n).map(i => 1704067200L + i * 60L).toArray
    val vs = Array.fill(n)(42.5)
    val block = TsCodec.encode(ts, vs)
    assert(block.length < 4 + 16 + 16 + n / 2, s"block ${block.length}B too large")
    assert(roundTripOk(ts, vs))
  }

  test("property: PointSort equals the boxed tuple sort / concat+sort merge") {
    import graft.functions.codec.PointSort
    val genV = Gen.oneOf(Gen.chooseNum(-1e6, 1e6),
      Gen.oneOf(Double.NaN, 0.0, -0.0, 1.0))
    val genPts = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 500L), genV))
    // sortPairs == Ordering[(Long, Double)] sortBy (TotalOrdering on bits)
    check(Prop.forAll(genPts) { pts =>
      val ts = pts.map(_._1).toArray; val vs = pts.map(_._2).toArray
      PointSort.sortPairs(ts, vs, ts.length)
      val expect = pts.sortBy(identity).toArray
      ts.sameElements(expect.map(_._1)) && sameBits(vs, expect.map(_._2))
    })
    // mergeSortedRuns(sorted runs) == concat + full sort
    check(Prop.forAll(Gen.listOf(genPts)) { runs =>
      val sortedRuns = runs.map(_.sortBy(identity))
      val (mts, mvs) = PointSort.mergeSortedRuns(
        sortedRuns.map(_.map(_._1).toArray).toArray,
        sortedRuns.map(_.map(_._2).toArray).toArray)
      val expect = runs.flatten.sortBy(identity).toArray
      mts.sameElements(expect.map(_._1)) && sameBits(mvs, expect.map(_._2))
    })
  }

  test("property: random (ts, value) streams round-trip exactly") {
    val genV = Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity,
        Double.MinPositiveValue, 1.0),
      Gen.chooseNum(-5.0, 5.0))
    val genPts = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 100000L), genV))
    check(Prop.forAll(genPts) { pts =>
      var t = 1704067200L
      val ts = pts.map { case (dt, _) => t += dt; t }.toArray
      roundTripOk(ts, pts.map(_._2).toArray)
    })
  }

  test("property: arbitrary sorted timestamps incl. negatives") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))) { rawTs =>
      val ts = rawTs.sorted.toArray
      roundTripOk(ts, rawTs.map(t => (t % 97).toDouble).toArray)
    })
  }
}

/** BlockAggregator (typed Aggregator, primitive buffers) must produce the
  * same block bytes and percentiles as the collect_list + scalar UDF path,
  * including across partition merges.
  */
class BlockAggregatorSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import graft.functions.codec.BlockAggregator
  import graft.operators.Rollup

  test("aggregator == collect_list+UDF path, merge-safe across partitions") {
    import spark.implicits._
    val pts = (1 to 500).map(i => (i % 7L, 1704067200L + (i * 37) % 1000, (i % 13) * 1.5))
    val df = pts.toDF("g", "ts", "v").repartition(7) // force multi-partition merges
    val viaAgg = df.groupBy("g")
      .agg(BlockAggregator(col("ts"), col("v")).as("m"))
      .select(col("g"), col("m.block").as("b1"), col("m.p50").as("p1"), col("m.p95").as("q1"))
    val viaUdf = df.groupBy("g")
      .agg(Rollup.encodeWithStatsUdf(collect_list(struct(col("ts"), col("v").cast("double")))).as("m"))
      .select(col("g"), col("m.block").as("b2"), col("m.p50").as("p2"), col("m.p95").as("q2"))
    val j = viaAgg.join(viaUdf, "g")
    assert(j.count() === 7)
    val bad = j.filter(sha2(col("b1"), 256) =!= sha2(col("b2"), 256) ||
      col("p1") =!= col("p2") || col("q1") =!= col("q2")).count()
    assert(bad === 0)
  }
}
