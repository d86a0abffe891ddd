package graft

import org.apache.spark.sql.functions._
import graft.operators.{Alloc, Sessions, Similarity}

class AllocSpec extends SparkSuite {
  import spark.implicits._

  test("largestRemainder: exact budget, within-1 quotas, remainder tie-break") {
    // scores 5,3,2 over budget 7: quotas 3.5/2.1/1.4, bases 3/2/1 (sum 6),
    // remainders .5/.1/.4 -> leftover unit to 'a'
    val df = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "s")
    val got = Alloc.largestRemainder(df, "k", "s", budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // sum == budget for an awkward budget too
    val tot = Alloc.largestRemainder(df, "k", "s", budget = 101L)
      .agg(sum(col("alloc"))).head().getLong(0)
    assert(tot === 101L)
    // zero-score keys are excluded, zero budget allocates zero
    val z = Alloc.largestRemainder(
      Seq(("a", 5L), ("z", 0L)).toDF("k", "s"), "k", "s", budget = 0L).collect()
    assert(z.map(_.getString(0)).toSet === Set("a"))
    assert(z.forall(_.getLong(2) === 0L))
  }

  test("rendezvousAssign: deterministic, balanced-ish, minimal disruption") {
    val keys = (0L until 400L).toDF("key")
    val before = Alloc.rendezvousAssign(keys, "key", Seq("w1", "w2", "w3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = Alloc.rendezvousAssign(keys, "key", Seq("w1", "w2", "w3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === again) // pure function of (key, node set)
    val counts = before.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size === 3)
    counts.values.foreach(c => assert(c > 60 && c < 220, s"skewed: $counts"))
    // adding w4: every moved key moves TO w4, nothing else shifts
    val after = Alloc.rendezvousAssign(keys, "key", Seq("w1", "w2", "w3", "w4"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty)
    moved.foreach(k => assert(after(k) === "w4"))
  }

  test("conversionLatency: first-from to first-at-or-after-to, nulls kept") {
    val df = Seq(
      (1L, 100L, "signup"), (1L, 50L, "purchase"), (1L, 300L, "purchase"),
      (2L, 100L, "signup"),                      // never converts
      (3L, 100L, "signup"), (3L, 100L, "purchase"), // same instant counts
      (4L, 500L, "purchase")                     // never signed up -> no row
    ).toDF("u", "sec", "t")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessions.conversionLatency(df, Seq("u"), "ts", "t", "signup", "purchase")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) === ((Some(300000000L), Some(200.0)))) // the t=50 purchase is ignored
    assert(got(2L) === ((None, None)))
    assert(got(3L)._2 === Some(0.0))
    assert(!got.contains(4L))
  }

  test("stratifiedSample: exact total, proportional mix, deterministic replay") {
    // strata sizes 60/30/10 over total 10 -> quotas 6/3/1
    val df = ((1 to 60).map(i => (i.toLong, "big")) ++
      (61 to 90).map(i => (i.toLong, "mid")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("id", "s")
    val got = graft.operators.Sampling.stratifiedSample(df, "s", "id", 10L, "sd")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 10)
    val mix = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(mix === Map("big" -> 6, "mid" -> 3, "small" -> 1))
    // replay: same seed -> same rows; different seed -> (almost surely) different
    val again = graft.operators.Sampling.stratifiedSample(df, "s", "id", 10L, "sd")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sortBy(_._1) === again.sortBy(_._1))
    val other = graft.operators.Sampling.stratifiedSample(df, "s", "id", 10L, "other")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet !== other.toSet)
  }

  test("distinctiveTerms: hand odds ratios, minCount bound") {
    val df = Seq(
      (true, "apple apple apple shared"),
      (false, "banana shared shared")
    ).toDF("a", "text")
    val got = graft.operators.TextAnalysis.distinctiveTerms(df, "text", "a")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // n_a = 4, n_b = 3
    // apple: y_a=3,y_b=0 -> (4/2)/(1/4) = 8
    assert(got("apple") === ((3L, 0L, 8.0)))
    // banana: y_a=0,y_b=1 -> (1/5)/(2/3)
    assert(approxEq(got("banana")._3, (1.0 / 5) / (2.0 / 3)))
    // shared: y_a=1,y_b=2 -> (2/4)/(3/2)
    assert(approxEq(got("shared")._3, 0.5 / 1.5))
    assert(graft.operators.TextAnalysis.distinctiveTerms(df, "text", "a", minCount = 3L)
      .collect().map(_.getString(0)).toSet === Set("apple", "shared"))
  }

  test("native vec_dot == declarative HOF dot (incl. empty/zero/null/unequal)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    } ++ Seq(
      (100L, Array.fill(16)(0f)),
      (101L, Array.empty[Float])
    )
    val df = rows.toDF("id", "v")
    val both = df.toDF("ia", "a").crossJoin(df.toDF("ib", "b"))
      .select(Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    both.foreach { r =>
      val n = Option(r.get(0)).map(_.asInstanceOf[Double])
      val h = Option(r.get(1)).map(_.asInstanceOf[Double])
      // exact bit equality, not approx — the whole point of the contract
      assert(n.map(java.lang.Double.doubleToLongBits) ===
        h.map(java.lang.Double.doubleToLongBits))
    }
    // unequal lengths and null arrays -> null, matching zip_with poisoning
    val odd = Seq((1L, Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f))),
      (2L, None, Some(Array(1f))))
      .toDF("id", "a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(odd.forall(_.isNullAt(0)))
  }

  test("behaviorEntropy: uniform = ln k, single = 0, hand 2-cat value") {
    val df = (Seq.fill(5)(("u1", "a")) ++ Seq.fill(5)(("u1", "b")) ++
      Seq.fill(4)(("u2", "a")) ++
      Seq.fill(3)(("u3", "a")) ++ Seq.fill(1)(("u3", "b"))).toDF("u", "c")
    val got = graft.operators.Profile.behaviorEntropy(df, Seq("u"), "c")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(approxEq(got("u1")._3, math.log(2.0)))
    assert(got("u2") === ((4L, 1L, 0.0)))
    val h3 = -(0.75 * math.log(0.75)) - (0.25 * math.log(0.25))
    assert(approxEq(got("u3")._3, h3))
    // bounded-domain contract
    intercept[IllegalArgumentException] {
      graft.operators.Profile.behaviorEntropy(df, Seq("u"), "c", maxCategories = 1)
    }
  }

  test("topKWithOther: tail folds into OTHER, total mass conserved") {
    val df = (Seq.fill(5)(("g", "a")) ++ Seq.fill(3)(("g", "b")) ++
      Seq.fill(2)(("g", "c")) ++ Seq.fill(1)(("g", "d"))).toDF("g", "cat")
    val got = graft.operators.Profile.topKWithOther(df, Seq("g"), "cat", k = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 5L, "b" -> 3L, "OTHER" -> 3L))
    assert(got.values.sum === 11L)
  }

  test("syndicationMatrix: shared distinct digests per source pair") {
    val df = Seq(
      ("s1", "shared one"), ("s1", "shared one"), // dup within source: distinct first
      ("s2", "shared one"), ("s2", "only two"),
      ("s3", "shared one"), ("s3", "only two")
    ).toDF("source", "text")
    val got = graft.operators.Governance.syndicationMatrix(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("s1", "s2") -> 1L, ("s1", "s3") -> 1L, ("s2", "s3") -> 2L))
  }

  test("readability: hand Flesch on a two-sentence doc; degenerate docs null") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"), // 2 sents, 6 words, 6 vowel groups
      (2L, "..."),                        // no sentences/words -> null
      (3L, "zzz zzz")                     // words but 0 syllables -> formula still defined
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L)._1 === 2L)
    assert(got(1L)._2 === 6L)
    assert(got(1L)._3 === 6L)
    assert(approxEq(got(1L)._4.get, 206.835 - 1.015 * 3.0 - 84.6 * 1.0))
    assert(got(2L)._4 === None)
    assert(approxEq(got(3L)._4.get, 206.835 - 1.015 * 2.0 - 0.0))
  }

  test("gapRegularity: metronome cv 0, bursty cv > 0, <2 gaps null") {
    val mk = (u: Long, secs: Seq[Long]) => secs.zipWithIndex.map { case (s, i) =>
      (u, i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
    }
    val df = (mk(1L, Seq(0L, 60L, 120L, 180L)) ++      // gaps 60,60,60 -> cv 0
      mk(2L, Seq(0L, 10L, 1000L, 1010L)) ++            // bursty
      mk(3L, Seq(0L, 5L))                              // single gap -> null cv
    ).toDF("u", "event_id", "ts")
    val got = graft.operators.Anomaly.gapRegularity(df, Seq("u"), "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) === ((3L, 180L, Some(0.0))))
    assert(got(2L)._3.get > 0.5)
    assert(got(3L) === ((1L, 5L, None)))
  }

  test("overlapJoin: overlap/touch/nest/disjoint, bucket straddle dedups to one pair") {
    import graft.operators.Intervals
    val a = Seq((1L, 0L, 100L), (2L, 200L, 300L), (3L, 1000L, 5000L))
      .toDF("aid", "start_s", "end_s")
    val b = Seq(
      (10L, 50L, 150L),   // overlaps a1 by 50
      (11L, 100L, 120L),  // TOUCHES a1 (half-open: no overlap)
      (12L, 210L, 220L),  // nested in a2 -> 10
      (13L, 400L, 500L),  // disjoint
      (14L, 900L, 4100L)  // straddles many buckets of a3 -> one pair, 3100
    ).toDF("bid", "start_s", "end_s")
    val got = Intervals.overlapJoin(a, b, Seq("aid"), Seq("bid"),
        "start_s", "end_s", bucketSeconds = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 10L) -> 50L, (2L, 12L) -> 10L, (3L, 14L) -> 3100L))
  }

  test("tukeyFences: hand quartiles, outlier counts, robust to the outlier itself") {
    // 1..11 plus outlier 100: q1=3.25? percentile linear interp on 12 pts:
    // q1 at rank 0.25*(12-1)=2.75 -> 3.75; q3 at 8.25 -> 9.25; iqr=5.5
    // lo = 3.75 - 8.25 = -4.5; hi = 9.25 + 8.25 = 17.5 -> one above (100)
    val df = ((1 to 11).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("g", "v")
    val r = graft.operators.Anomaly.tukeyFences(df, Seq("g"), "v").head()
    assert(approxEq(r.getAs[Double]("q1"), 3.75))
    assert(approxEq(r.getAs[Double]("q3"), 9.25))
    assert(approxEq(r.getAs[Double]("lo_fence"), -4.5))
    assert(approxEq(r.getAs[Double]("hi_fence"), 17.5))
    assert(r.getAs[Long]("n_below") === 0L)
    assert(r.getAs[Long]("n_above") === 1L)
    assert(r.getAs[Long]("n") === 12L)
  }

  test("contingency: marginals, independence expecteds, residual signs") {
    // perfectly independent 2x2 -> residuals exactly 0
    val ind = Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("x", "v")) ++
      Seq.fill(2)(("y", "u")) ++ Seq.fill(2)(("y", "v"))
    val r0 = graft.operators.Anomaly.contingency(ind.toDF("a", "b"), "a", "b")
      .collect()
    r0.foreach(r => assert(approxEq(r.getAs[Double]("residual"), 0.0)))
    // skewed cell: observed > expected -> positive residual
    val skew = ind ++ Seq.fill(4)(("x", "u"))
    val m = graft.operators.Anomaly.contingency(skew.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("residual")).toMap
    assert(m(("x", "u")) > 0)
    assert(m(("x", "v")) < 0)
  }

  test("quantizeInt8: codes round-trip, clamp, zero vector, high recon cosine") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0f, 0f, 0f, 0f)),          // all-zero -> null scale/codes
      (3L, Array(127f, -127f, 63.5f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    // vec 1: scale = 1/127; codes = round(x*127) = 127, -64 (floor(-63.5)? no:
    // floor(-63.5+0.5) = -63), 32 (floor(31.75+.5)=32), 0
    val c1 = got(1L).getSeq[Long](2)
    assert(got(1L).getDouble(1) === 1.0 / 127)
    assert(c1 === Seq(127L, -63L, 32L, 0L))
    assert(got(1L).getDouble(3) > 0.999) // reconstruction barely moves it
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(2) && got(2L).isNullAt(3))
    assert(got(3L).getSeq[Long](2) === Seq(127L, -127L, 64L, 1L))
  }

  test("skipGrams: hand window-2 counts, symmetry, minCount") {
    val df = Seq("a b c b").toDF("text")
    val got = graft.operators.TextAnalysis.skipGrams(df, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs (d=1): (a,b) (b,c) (c,b); (d=2): (a,c) (b,b)
    assert(got(("a", "b")) === 1L)
    assert(got(("b", "a")) === 1L)      // symmetric
    assert(got(("b", "c")) === 2L)      // (b,c) d1 + (c,b) d1 reversed
    assert(got(("c", "b")) === 2L)
    assert(got((("b", "b"))) === 2L)    // both orientations of the d=2 (b,b)
    assert(got((("a", "c"))) === 1L)
    // symmetry across the whole table
    got.foreach { case ((x, y), n) => assert(got((y, x)) === n) }
  }

  test("reciprocalBestMatch: mutual pairs only, emitted once") {
    // 1<->2 mutual (identical direction), 3's best is 1 but 1's best is 2
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(2f, 0.0001f)),
      (3L, Array(1f, 0.1f)), (4L, Array(0f, 1f)), (5L, Array(-0.1f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.reciprocalBestMatch(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((4L, 5L)))
    assert(got.forall { case (a, b) => a < b })
    // every emitted pair is genuinely mutual-top-1
    val top1 = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (a, b) => assert(top1(a) === b && top1(b) === a) }
    assert(got === top1.filter { case (a, b) => top1(b) == a && a < b }.toSet)
  }

  test("dhondt: hand-allocated seats, exact budget, zero-seat keys kept") {
    // scores A=7 B=5 C=3, 8 seats. Quotients won: A {7, 3.5, 2.33, 1.75},
    // B {5, 2.5, 1.67}, C {3} -> 4/3/1
    val df = (Seq.fill(7)("A") ++ Seq.fill(5)("B") ++ Seq.fill(3)("C"))
      .map((_, 1L)).toDF("k", "s")
    val got = Alloc.dhondt(df, "k", "s", seats = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(got === Map("A" -> 4L, "B" -> 3L, "C" -> 1L))
    // tiny party wins nothing but still appears; total always == seats
    val skew = Seq(("big", 100L), ("tiny", 1L)).toDF("k", "s")
    val s2 = Alloc.dhondt(skew, "k", "s", seats = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(s2("big") === 5L && s2("tiny") === 0L)
  }
}
