package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Kmv}
import graft.operators.{Dedup, Graph, Robust}

class KmvRobustSpec extends SparkSuite {
  import spark.implicits._

  test("kmv: exact under k, sane estimate at k, merge == direct global sketch") {
    val k = 8
    val vals = (1 to 200).map(i => (s"grp${i % 4}", s"v$i")).toDF("g", "s")
      .withColumn("h", Hashing.md5Long(col("s")))
    // under-k group: 5 distinct values -> estimate is the exact count
    val tiny = (1 to 5).map(i => s"t$i").toDF("s")
      .withColumn("h", Hashing.md5Long(col("s")))
      .agg(Kmv.kmvSketch(col("h"), k).as("sk"))
      .select(Kmv.kmvN(col("sk")), Kmv.kmvEstimate(col("sk"), k)).head()
    assert(tiny.getInt(0) === 5)
    assert(tiny.getDouble(1) === 5.0)
    // at-k: estimate within a loose factor of the truth (50 distinct per grp)
    val est = vals.groupBy("g").agg(Kmv.kmvSketch(col("h"), k).as("sk"))
      .select(Kmv.kmvEstimate(col("sk"), k).as("e")).collect().map(_.getDouble(0))
    est.foreach(e => assert(e > 10 && e < 250, s"estimate $e implausible for 50"))
    // merge of per-group sketches == sketch built over everything at once
    val merged = vals.groupBy("g").agg(Kmv.kmvSketch(col("h"), k).as("sk"))
      .agg(Kmv.kmvMerge(col("sk"), k).as("sk"))
      .select(col("sk")).head().getAs[Array[Byte]](0)
    val direct = vals.agg(Kmv.kmvSketch(col("h"), k).as("sk"))
      .select(col("sk")).head().getAs[Array[Byte]](0)
    assert(merged.toSeq === direct.toSeq)
  }

  test("kmv insert: ordering, dedup, capacity eviction") {
    val k = 3
    val b = new Array[Byte](4 + 8 * k)
    Seq(50L, 10L, 30L, 50L, 40L, 5L).foreach(Kmv.insert(b, k, _))
    // minima {5,10,30}: 50 evicted, duplicate 50 ignored, 40 evicted
    val got = (0 until 3).map(i =>
      java.nio.ByteBuffer.wrap(b, 4 + 8 * i, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    assert(got === Seq(5L, 10L, 30L))
  }

  test("labelPropagation: two cliques joined by a bridge keep distinct labels") {
    // clique A {0,1,2,3}, clique B {10,11,12,13}, bridge 3-10
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L))
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within each clique everyone converges to the min id of the clique
    assert(Seq(0L, 1L, 2L).map(got).distinct.size === 1)
    assert(Seq(11L, 12L, 13L).map(got).distinct.size === 1)
    assert(got(1L) !== got(11L)) // the two communities stay separate
  }

  test("theilSenSlope: exact on a line, robust to one outlier, null for 1-point") {
    val line = (0 to 10).map(i => ("a", i.toLong, (3 * i + 7).toLong))
    val outlier = line.updated(5, ("a", 5L, 1000L)).map { case (_, x, y) => ("b", x, y) }
    val single = Seq(("c", 0L, 5L))
    val df = (line ++ outlier ++ single).toDF("g", "x", "y")
    val got = Robust.theilSenSlope(df, Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(got("a")._1 === 11L)
    assert(approxEq(got("a")._2.get, 3.0))
    assert(approxEq(got("b")._2.get, 3.0)) // the median shrugs the outlier off
    assert(got("c") === ((1L, None)))
    // contract: raw-scale groups are rejected, not silently exploded
    intercept[IllegalArgumentException] {
      Robust.theilSenSlope(df, Seq("g"), "x", "y", maxPoints = 5)
    }
  }

  test("kmv pairwise merge2 == aggregate merge; values are the sorted minima") {
    val k = 8
    val vals = (1 to 120).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "s")
      .withColumn("h", Hashing.md5Long(col("s")))
    val per = vals.groupBy("g").agg(Kmv.kmvSketch(col("h"), k).as("sk"))
    val viaAgg = per.agg(Kmv.kmvMerge(col("sk"), k).as("m"))
      .select(Kmv.kmvValues(col("m"))).head().getSeq[Long](0)
    val skA = per.filter(col("g") === "g0").select(col("sk"))
    val skB = per.filter(col("g") === "g1").select(col("sk").as("sk2"))
    val via2 = skA.crossJoin(skB)
      .select(Kmv.kmvValues(Kmv.kmvMerge2(col("sk"), col("sk2"), k)))
      .head().getSeq[Long](0)
    assert(via2 === viaAgg)
    assert(via2 === via2.sorted)
    assert(via2.size === k)
  }

  test("growthAccounting: hand-computed statuses and churn attribution") {
    // u1 active weeks 1,2,4; u2 active 1 only; u3 active 2,3
    val df = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 1L), (3L, 2L), (3L, 3L))
      .toDF("u", "w")
    val got = graft.operators.Sessions.growthAccounting(df, "u", "w")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((1L, "new")) === 2L)        // u1@1, u2@1
    assert(got((2L, "new")) === 1L)        // u3@2
    assert(got((2L, "retained")) === 1L)   // u1@2
    assert(got((3L, "retained")) === 1L)   // u3@3
    assert(got((4L, "resurrected")) === 1L) // u1@4 (silent in 3)
    assert(got((2L, "churned")) === 1L)    // u2 silent from week 2
    assert(got((3L, "churned")) === 1L)    // u1 silent in 3
    assert(got((4L, "churned")) === 1L)    // u3 silent in 4
    // identity: active(p) = new + retained + resurrected
    assert(!got.contains((5L, "churned"))) // beyond max observed week
    assert(got.size === 8)
  }

  test("abcClass: hand-computed cuts, ties broken by category id") {
    val df = Seq(("a", 120L), ("b", 48L), ("c", 22L), ("d", 10L))
      .flatMap { case (c, n) => Seq.fill(2)((c, n / 2)) } // split rows, same sums
      .toDF("cat", "w")
    val got = graft.operators.Profile.abcClass(df, "cat", "w")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(got("a") === ((120L, "A"))) // cum 0.60
    assert(got("b") === ((48L, "B")))  // cum 0.84
    assert(got("c") === ((22L, "B")))  // cum 0.95 (== bCut boundary, inclusive)
    assert(got("d") === ((10L, "C")))  // cum 1.00
  }

  test("kendallTau: perfect/inverted/tied goldens match the closed form") {
    // g=a: y = x (perfect concordance, tau 1); g=b: y = -x (tau -1);
    // g=c: x has ties -> tau-b with tie correction
    val a = (1 to 6).map(i => ("a", i.toLong, i.toLong, (i * 2).toLong))
    val b = (1 to 6).map(i => ("b", i.toLong, i.toLong, (10 - i).toLong))
    val c = Seq(("c", 1L, 1L, 1L), ("c", 2L, 1L, 2L), ("c", 3L, 2L, 3L), ("c", 4L, 2L, 4L))
    val df = (a ++ b ++ c).toDF("g", "i", "x", "y")
    val got = graft.operators.Robust.kendallTau(df, Seq("g"), "i", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got("a") === ((15L, Some(1.0))))
    assert(got("b") === ((-15L, Some(-1.0))))
    // c: pairs (i<j): (1,2) x tie ->0; (1,3)+; (1,4)+; (2,3)+; (2,4)+; (3,4) x tie ->0
    // S=4, n0=6, n1 = 1+1 = 2 (two tied-x pairs), n2 = 0
    // tau = 4 / sqrt(4*6) = 0.8164965...
    assert(got("c")._1 === 4L)
    assert(approxEq(got("c")._2.get, 4.0 / math.sqrt(24.0)))
    // constant measure -> null tau
    val const = Seq(("k", 1L, 5L, 1L), ("k", 2L, 5L, 2L)).toDF("g", "i", "x", "y")
    assert(graft.operators.Robust.kendallTau(const, Seq("g"), "i", "x", "y")
      .head().isNullAt(3))
  }

  test("editDistanceJoin equals naive levenshtein join; short strings rejected") {
    val base = "the quick brown fox jumps over the lazy dog!!"
    val strs = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")),          // dist 1 (i -> a)
      (3L, base.toUpperCase),                        // far
      (4L, "a completely different sentence of sufficient length here"),
      (5L, base.drop(3) + "xyz")                     // shifted
    ).toDF("id", "s")
    val got = Dedup.editDistanceJoin(strs, "id", "s", maxDist = 8, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // naive check
    val rows = strs.collect().map(r => (r.getLong(0), r.getString(1)))
    val naive = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(sa, sb).intValue
      if d <= 8
    } yield (ia, ib) -> d).toMap
    assert(got === naive)
    assert(got((1L, 2L)) === 1)
    intercept[IllegalArgumentException] {
      Dedup.editDistanceJoin(Seq((9L, "tiny")).toDF("id", "s"), "id", "s", maxDist = 8)
    }
  }
}
