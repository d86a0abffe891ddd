package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — PageRank (Brin & Page
  * 1998, public paper; independent DataFrame realization).
  *
  * Web-corpus role: rank hosts/pages by link structure for crawl
  * prioritization and quality weighting — the classic companion to the
  * dedup/quality pipeline (a near-dup cluster's canonical pick can prefer
  * the highest-ranked URL instead of the min id).
  *
  * Scale design: each iteration is ONE equi-join (edges ⋈ ranks on src,
  * both sides partitioned by the join key after the first iteration —
  * Catalyst reuses the exchange) plus one map-side-combined groupBy(dst).
  * Rank state is one (id, rank) row per node, never materialized on the
  * driver; `localCheckpoint` every `checkpointEvery` iterations truncates
  * the growing lineage exactly as [[Dedup.connectedComponents]] does.
  * Dangling nodes (outdegree 0) would leak mass — callers must close the
  * graph first (the q199 construction has outdegree exactly 3 everywhere);
  * a `require`d invariant, not silent redistribution, so the oracle's
  * recursion and the engine agree term-for-term.
  */
object Graph {

  /** PageRank over `edges(src, dst)` (long ids, duplicates = parallel
    * edges that contribute twice). Returns (id, rank) after `iterations`
    * synchronous updates of
    *   rank'(v) = (1−d)/n + d · Σ_{(u,v)∈E} rank(u)/outdeg(u),
    * starting uniform at 1/n. Every node must have outdegree ≥ 1.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val n = nodes.count() // one bounded scalar (node count), never the rows
    val sinks = nodes.join(edges.select(col("src")).distinct(),
      nodes("id") === col("src"), "left_anti").count()
    require(sinks == 0L, s"$sinks dangling node(s) (outdegree 0) — close the graph first")
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint() // reused every iteration; lineage cut once
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"), (lit((1.0 - damping) / n) +
          lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
