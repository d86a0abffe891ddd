package graft

import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, Sketch, TextAnalysis}

/** DDSketch quantile sketch, Misra–Gries heavy hitters, and URL
  * canonicalization (oracle-covered end-to-end by q191/q192/q194; these
  * tests pin the invariants the SQL twin can't see — the sketch's
  * relative-error GUARANTEE against exact percentiles, exact mergeability,
  * bucket monotonicity that the oracle's cumulative lookup relies on, MG
  * exactness under adversarial ordering with heavy eviction, and the
  * canonicalization contract on golden cases).
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private val Alpha = 0.02

  // seeded skewed values: lognormal-ish positive integers, 3 groups
  private def seededValues(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val g = s"g${i % 3}"
      val v = math.max(1L, math.round(math.exp(rnd.nextGaussian() * 1.5 + 5.0)))
      (g, i % 7, v) // (group, part, value)
    }.toDF("g", "part", "v")
  }

  test("ddsketch: bucket index is monotone over the integer domain") {
    val lg = math.log(Sketch.gamma(Alpha))
    var prev = Long.MinValue
    var n = 1L
    while (n <= 200000L) {
      val idx = math.ceil(math.log(n.toDouble) / lg).toLong
      assert(idx >= prev, s"bucket index decreased at n=$n")
      prev = idx
      n += 1
    }
  }

  test("ddsketch: merge of partial sketches == direct build, bucket-exact") {
    val df = seededValues(5000, seed = 7L)
    val direct = Sketch.build(df, Seq("g"), "v", Alpha)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val merged = Sketch.merge(
        Sketch.build(df, Seq("g", "part"), "v", Alpha), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == direct)
  }

  test("ddsketch: quantile estimates hold the relative-error guarantee") {
    val df = seededValues(5000, seed = 11L)
    val qs = Seq(0.5, 0.9, 0.99)
    val sk = Sketch.build(df, Seq("g"), "v", Alpha)
    val est = Sketch.quantiles(sk, Seq("g"), qs, Alpha)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(4))).toMap
    val raw = df.collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (g, vs) => (g, vs.map(_._2).sorted) }
    for ((g, sorted) <- raw; q <- qs) {
      val rank = (math.floor(q * (sorted.length - 1)) + 1).toInt // 1-based
      val exact = sorted(rank - 1).toDouble
      val e = est((g, q))
      assert(math.abs(e - exact) / exact <= Alpha + 1e-9,
        s"g=$g q=$q exact=$exact est=$e rel=${math.abs(e - exact) / exact}")
    }
  }

  test("sketch tiers: promote(1m)==direct(1h) map-exact; quantile within α") {
    import graft.operators.Sketch
    val rnd = new scala.util.Random(23L)
    val rows = (0 until 4000).map { i =>
      val v = math.max(1L, math.round(math.exp(rnd.nextGaussian() * 1.2 + 4.0)))
      (s"g${i % 2}", 1700000000L + (i.toLong * 13) % 7200, v)
    }.toDF("g", "sec", "v").withColumn("ts", timestamp_seconds(col("sec")))

    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    def rendered(df: org.apache.spark.sql.DataFrame) =
      df.select(col("g"), col("bucket_start"), col("cnt"), col("sum_v"),
          col("min_v"), col("max_v"),
          map_entries(col("dd_sketch")).cast("string").as("sk"))
        .collect().map(r => (key(r), (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap

    val t1m = Sketch.tierSketch(rows, Seq("g"), "ts", "v", 60L, 0.02)
    val promoted = rendered(Sketch.promoteSketch(t1m, Seq("g"), 3600L))
    val direct = rendered(Sketch.tierSketch(rows, Seq("g"), "ts", "v", 3600L, 0.02))
    assert(promoted == direct)

    // declarative map quantile holds the relative-error guarantee per bucket
    val est = Sketch.promoteSketch(t1m, Seq("g"), 3600L)
      .select(col("g"), col("bucket_start"),
        Sketch.bucketEstimate(
          Sketch.quantileFromMap(col("dd_sketch"), 0.5), 0.02).as("e"))
      .collect().map(r => (key(r), r.getDouble(2))).toMap
    val raw = rows.collect()
      .map(r => ((r.getString(0), r.getLong(1) - r.getLong(1) % 3600), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sorted) }
    raw.foreach { case (k, sorted) =>
      val rank = (math.floor(0.5 * (sorted.length - 1)) + 1).toInt
      val exact = sorted(rank - 1).toDouble
      assert(math.abs(est(k) - exact) / exact <= 0.02 + 1e-9,
        s"$k exact=$exact est=${est(k)}")
    }
  }

  test("sketch readRange: stitched tiers == direct build over the raw range") {
    import graft.operators.Sketch
    val rnd = new scala.util.Random(29L)
    // 3 hours of data; query a misaligned range [00:17, 02:23) so coverage
    // stitches 1m edges around whole 1h interiors
    val t0 = 1700000000L - 1700000000L % 3600
    val rows = (0 until 6000).map { i =>
      val v = math.max(1L, math.round(math.exp(rnd.nextGaussian() + 3.0)))
      (s"g${i % 2}", t0 + (i.toLong * 7) % 10800, v)
    }.toDF("g", "sec", "v").withColumn("ts", timestamp_seconds(col("sec")))
    val t1m = Sketch.tierSketch(rows, Seq("g"), "ts", "v", 60L, 0.02)
    val t1h = Sketch.promoteSketch(t1m, Seq("g"), 3600L)
    val (s, e) = (t0 + 17 * 60, t0 + 2 * 3600 + 23 * 60)
    val got = Sketch.readRange(
        Map("1m" -> (60L, t1m), "1h" -> (3600L, t1h)),
        Seq("g"), s, e, Seq(0.5, 0.95), 0.02)
      .collect().map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.get(3)))).toMap
    val want = Sketch.quantiles(
        Sketch.build(rows.filter(col("sec") >= s && col("sec") < e),
          Seq("g"), "v", 0.02), Seq("g"), Seq(0.5, 0.95), 0.02)
      .collect().map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.get(3)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("zorder: roundtrip bit-exact; aligned boxes are contiguous key ranges") {
    import graft.functions.ZOrder
    val rnd = new scala.util.Random(31L)
    val pairs = (0 until 500).map(_ =>
      (rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, z) =>
      assert(ZOrder.deinterleave(z) == ((a, b)), s"roundtrip failed at ($a,$b)")
    }
    // locality: every 2^k-aligned square box maps to one contiguous key
    // range of exactly 4^k keys (k=2 exhaustive over a 32x32 grid)
    val grid = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (a0 <- 0 until 32 by 4; b0 <- 0 until 32 by 4) {
      val zs = for (a <- a0 until a0 + 4; b <- b0 until b0 + 4)
        yield grid((a.toLong, b.toLong))
      assert(zs.max - zs.min == 15 && zs.toSet.size == 16,
        s"box ($a0,$b0) not contiguous: ${zs.sorted}")
    }
  }

  test("heavy hitters: exact equality with full count under heavy eviction") {
    // domain of 800 tail items (each ~2 hits) + 4 hot items; k=32 counters
    // per group → 25x eviction pressure; adversarial order (tail first,
    // hot items last — the worst case for counter-based summaries)
    val rnd = new scala.util.Random(13L)
    val rows = (for (g <- Seq("a", "b"); i <- 0 until 1600) yield {
      val item = if (i < 1200) s"t${rnd.nextInt(800)}" else s"hot${i % 4}"
      (g, item)
    }).toDF("g", "item")
    val k = 32
    val out = HeavyHitters.frequentItems(rows, Seq("g"), "item", k)
      .select("g", "item", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exact = rows.groupBy("g", "item").count()
      .withColumn("n", sum(col("count")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .filter(col("count") >= floor(col("n") / k) + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == exact)
    assert(out.nonEmpty, "hot items must qualify") // 100 hits vs N/k=50
  }

  test("stripTracking: golden cases, alone and composed with canonicalizeUrl") {
    val cases = Seq(
      // strip + separator repair, fragment preserved
      ("https://h.com/p?utm_source=x&id=1&utm_campaign=y#f",
        "https://h.com/p?id=1#f"),
      // all params were tracking → dangling '?' removed
      ("https://h.com/?utm_a=1", "https://h.com/"),
      ("https://h.com/p?a=1&fbclid=xyz", "https://h.com/p?a=1"),
      ("https://h.com/p?gclid=z&a=1&mc_eid=7", "https://h.com/p?a=1"),
      // dangling '&' before fragment repaired
      ("https://h.com/p?a=1&utm_c=2#s", "https://h.com/p?a=1#s"),
      // no tracking params → unchanged
      ("http://h.com/p?b=2&a=1", "http://h.com/p?b=2&a=1"))
    val out = cases.map(_._1).toDF("url")
      .select(graft.functions.Hier.stripTracking(col("url")).as("c"))
      .collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
    // composed: tracking variants of the same page collapse to ONE key
    val variants = Seq(
      "HTTPS://Ex.COM:443/p/1?b=2&a=1",
      "https://ex.com/p/1?utm_source=feed&a=1&b=2",
      "https://EX.com/p/1?a=1&gclid=xyz&b=2&utm_campaign=c")
    val keys = variants.toDF("url")
      .select(graft.functions.Hier.canonicalizeUrl(
        graft.functions.Hier.stripTracking(col("url"))).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("https://ex.com/p/1?a=1&b=2"))
  }
}
