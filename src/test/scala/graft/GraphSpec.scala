package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank: mass conservation and uniform fixed point on a cycle") {
    // a pure cycle is 1-regular: uniform 1/n is the exact fixed point at
    // every iteration, independent of damping
    val n = 12
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 7).collect()
    assert(ranks.length === n)
    ranks.foreach(r => assert(approxEq(r.getDouble(1), 1.0 / n)))
  }

  test("pageRank: hand-computed 2-node asymmetric graph") {
    // nodes {0,1}; 0 -> 1, 1 -> 0, 1 -> 1 (self loop). outdeg(0)=1, outdeg(1)=2.
    // recurrence: r0' = .075 + .85*(r1/2); r1' = .075 + .85*(r0 + r1/2)
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 1L)).toDF("src", "dst")
    var e0 = 0.5; var e1 = 0.5
    for (_ <- 1 to 6) {
      val n0 = 0.075 + 0.85 * (e1 / 2)
      val n1 = 0.075 + 0.85 * (e0 + e1 / 2)
      e0 = n0; e1 = n1
    }
    val got = Graph.pageRank(edges, iterations = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approxEq(got(0L), e0))
    assert(approxEq(got(1L), e1))
    assert(approxEq(got(0L) + got(1L), 1.0))
  }

  test("pageRank: total rank stays 1 on a skewed closed graph") {
    val n = 40
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong),
          (i.toLong, ((i * i + 3) % n).toLong),
          (i.toLong, (i / 2).toLong))
    }.toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 10).collect().map(_.getDouble(1))
    assert(ranks.length === n)
    assert(approxEq(ranks.sum, 1.0, 1e-12))
    // non-regular graph: ranks must actually vary
    assert(ranks.max > 1.5 / n && ranks.min < 0.8 / n)
  }

  test("pageRank: rejects dangling nodes") {
    val edges = Seq((0L, 1L)).toDF("src", "dst") // node 1 has outdegree 0
    val ex = intercept[IllegalArgumentException](Graph.pageRank(edges, iterations = 2))
    assert(ex.getMessage.contains("dangling"))
  }

  test("hits: star graph hands hubs to the center and authority to the leaves") {
    // 0 -> {1,2,3}: h(0)=3^T, leaves 0; final auth a(i)=3^T, a(0)=0
    // normalized (n=4): hub = (4, 0, 0, 0), auth = (0, 4/3, 4/3, 4/3)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val m = Graph.hits(star, iterations = 10).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approxEq(m(0L)._1, 4.0)); assert(m(0L)._2 === 0.0)
    Seq(1L, 2L, 3L).foreach { i =>
      assert(m(i)._1 === 0.0); assert(approxEq(m(i)._2, 4.0 / 3))
    }
  }

  test("hits: 2-cycle is uniform; scores sum to n on a skewed graph") {
    val cyc = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    Graph.hits(cyc, iterations = 5).collect().foreach { r =>
      assert(approxEq(r.getDouble(1), 1.0)); assert(approxEq(r.getDouble(2), 1.0))
    }
    val n = 30
    val skew = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong), (i.toLong, ((i * i + 3) % n).toLong),
          (i.toLong, (i / 2).toLong))
    }.toDF("src", "dst")
    val rows = Graph.hits(skew, iterations = 10).collect()
    assert(rows.length === n)
    assert(approxEq(rows.map(_.getDouble(1)).sum, n.toDouble, 1e-9))
    assert(approxEq(rows.map(_.getDouble(2)).sum, n.toDouble, 1e-9))
  }

  test("hopDistance: path graph distances, cap, and unreachable exclusion") {
    // 0 -> 1 -> 2 -> 3 -> 4, plus isolated pair 10 -> 11
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = Graph.hopDistance(edges, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3)) // 4 beyond cap, 10/11 unreachable
    // multi-source takes the min over seeds
    val multi = Graph.hopDistance(edges, Seq(0L, 2L).toDF("id"), maxHops = 9).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(multi === Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 2))
    // early exit when the frontier drains before the cap
    assert(Graph.hopDistance(edges, seeds, maxHops = 100).count() === 5)
  }

  test("triangles: K4 is all-triangles, C5 is none, direction/duplicates collapse") {
    val k4 = (for { i <- 0 until 4; j <- 0 until 4 if i != j } yield (i.toLong, j.toLong))
      .toDF("src", "dst") // both directions + would-be duplicates
    val gotK4 = Graph.triangles(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(gotK4.length === 4)
    gotK4.foreach { case (_, deg, tri, cc) =>
      assert(deg === 3L); assert(tri === 3L); assert(approxEq(cc, 1.0))
    }
    val c5 = (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong)).toDF("src", "dst")
    val gotC5 = Graph.triangles(c5).collect()
    assert(gotC5.length === 5)
    gotC5.foreach { r => assert(r.getLong(2) === 0L); assert(r.getDouble(3) === 0.0) }
    // one triangle hanging off a path: 0-1-2-0 plus 2-3
    val mixed = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("src", "dst")
    val m = Graph.triangles(mixed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(0L) === ((2L, 1L, 1.0)))
    assert(m(1L) === ((2L, 1L, 1.0)))
    assert(m(2L)._1 === 3L); assert(m(2L)._2 === 1L); assert(approxEq(m(2L)._3, 1.0 / 3))
    assert(m(3L) === ((1L, 0L, 0.0)))
  }

  test("kTruss: triangle survives, pendant and star edges peel") {
    // K4 on {0,1,2,3} (every edge support 2) + pendant 3-9 + star 10-{11,12}
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((3L, 9L), (10L, 11L), (10L, 12L))).toDF("src", "dst")
    val got = Graph.kTruss(edges, k = 3L, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === k4.toSet) // only the K4 edges survive a 3-truss
    got.values.foreach(s => assert(s === 2L))
    // k above the max support empties the graph
    assert(Graph.kTruss(edges, k = 5L, rounds = 2).count() === 0L)
  }

  test("adamicAdar: hand-computed star-plus-path graph") {
    // edges: 0-1, 0-2, 0-3 (star around 0, deg 3), 1-4, 2-4 (deg(4)=2).
    // non-adjacent pairs with common neighbors:
    //   {1,2}: common {0, 4} -> 1/ln3 + 1/ln2
    //   {1,3}, {2,3}: common {0}  -> 1/ln3
    //   {0,4}: common {1, 2}      -> 1/ln2 + 1/ln2 (deg(1)=deg(2)=2)
    //   {3,4}: none
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (2L, 4L)).toDF("src", "dst")
    def pico(deg: Int): Long = math.floor(1e12 / math.log(deg.toDouble) + 0.5).toLong
    val got = Graph.adamicAdar(edges, minCommon = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got((1L, 2L)) === ((2L, pico(3) + pico(2))))
    assert(got((1L, 3L)) === ((1L, pico(3))))
    assert(got((2L, 3L)) === ((1L, pico(3))))
    assert(got((0L, 4L)) === ((2L, 2 * pico(2))))
    assert(got.size === 4)
    // minCommon prunes the single-neighbor pairs
    assert(Graph.adamicAdar(edges, minCommon = 2L).count() === 2L)
  }

  test("personalizedPageRank: mass conservation and seed concentration") {
    // closed 12-cycle, seeds {0}: total mass stays 1; the seed holds the
    // maximum score (teleport mass lands only there)
    val n = 12
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = Graph.personalizedPageRank(edges, seeds, iterations = 12).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approxEq(got.values.sum, 1.0))
    assert(got(0L) === got.values.max)
    // downstream of the seed decays geometrically along the cycle
    assert(got(1L) > got(5L))
  }

  test("personalizedPageRank: hand-computed 2-node recurrence") {
    // 0 -> 1, 1 -> 0, 1 -> 1; seed {0}: s = (1, 0)
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 1L)).toDF("src", "dst")
    var e0 = 1.0; var e1 = 0.0
    for (_ <- 1 to 6) {
      val n0 = 0.15 + 0.85 * (e1 / 2)
      val n1 = 0.85 * (e0 + e1 / 2)
      e0 = n0; e1 = n1
    }
    val got = Graph.personalizedPageRank(edges, Seq(0L).toDF("id"), iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approxEq(got(0L), e0))
    assert(approxEq(got(1L), e1))
  }
}
