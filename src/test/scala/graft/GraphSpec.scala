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
}
