package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** Deterministic resource allocation & placement for crawl scheduling —
  * the "which host gets how much budget, and which shard owns it" pair of
  * decisions a 100-TB crawl pipeline re-makes every cycle.
  */
object Alloc {

  /** Largest-remainder (Hamilton) apportionment: split an integer `budget`
    * across keys proportionally to an integer `scoreCol`, exactly —
    * Σ alloc = budget, every alloc within 1 of its real quota, house-
    * monotone per cycle. Classic apportionment (Hamilton 1792; the method
    * behind most legislature seat allocation — public domain math).
    *
    * All arithmetic is integer: base_i = ⌊budget·s_i / S⌋, remainder_i =
    * budget·s_i − base_i·S, and the budget − Σ base leftover units go to
    * the largest remainders (key tie-break). No floats anywhere, so the
    * allocation is bit-reproducible across engines and runs. Overflow
    * bound: budget·s_i must fit a long (budget ≤ 2^63 / max score —
    * `require`d).
    *
    * The ranking window is global but runs on the AGGREGATED key table
    * (bounded-domain contract, as [[Profile.abcClass]]).
    */
  def largestRemainder(df: DataFrame, keyCol: String, scoreCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val agg = df.groupBy(col(keyCol).as("key"))
      .agg(sum(col(scoreCol)).cast("long").as("score"))
      .filter(col("score") > 0)
      .localCheckpoint() // consumed twice: totals + allocation
    val tot = agg.agg(sum(col("score")).as("s_total"),
      max(col("score")).as("s_max")).head() // one bounded scalar row
    val sTotal = tot.getLong(0)
    require(budget == 0 || tot.getLong(1) <= Long.MaxValue / math.max(budget, 1L),
      "budget * max(score) would overflow long — rescale scores first")
    val based = agg // `div` = integral division (Spark's `/` is always fractional)
      .withColumn("_base", expr(s"(score * ${budget}L) div ${sTotal}L"))
      .withColumn("_rem", col("score") * budget - col("_base") * lit(sTotal))
    val leftover = budget - based.agg(sum(col("_base"))).head().getLong(0) // bounded scalar
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_rem").desc, col("key"))
    based.withColumn("_rk", row_number().over(w))
      .withColumn("alloc", col("_base") + when(col("_rk") <= leftover, 1L).otherwise(0L))
      .select(col("key"), col("score"), col("alloc"))
  }

  /** Rendezvous (highest-random-weight) hashing (Thaler & Ravishankar
    * 1996, public paper): each key is owned by the node with the highest
    * hash(node ++ key) — deterministic, coordination-free, and MINIMALLY
    * disruptive: adding a node moves exactly the keys whose new-node hash
    * beats every old one; nothing else shifts. The placement function for
    * sharding a crawl frontier across workers.
    *
    * One narrow projection per key: `greatest` over |nodes| seeded hashes
    * ([[md5Long]] of "node:key" — the same replayable contract as every
    * sketch in this engine), argmax via a struct max. No shuffle at all.
    */
  def rendezvousAssign(df: DataFrame, keyCol: String,
                       nodes: Seq[String]): DataFrame = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      s"nodes must be non-empty and distinct: $nodes")
    val scored = nodes.map(n =>
      struct(md5Long(concat(lit(s"$n:"), col(keyCol).cast("string"))).as("h"),
        lit(n).as("node")))
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.select(col(keyCol).as("key"), best.getField("node").as("node"))
  }

  /** D'Hondt (Jefferson) highest-averages apportionment — the divisor-method
    * sibling of [[largestRemainder]]: each key's integer score spawns the
    * quotients s/1, s/2, …, s/seats, and the `seats` largest quotients win
    * one unit each. Favors large scores slightly (no remainder lottery);
    * used where proportionality should never over-reward small players.
    *
    * Determinism: each quotient is ONE IEEE division of an integer by a
    * small integer — computed identically in any engine — and the top-seats
    * cut is a distributed TakeOrdered on (quotient desc, key, divisor), ties
    * broken lexicographically so d'Hondt's ambiguous last seat is pinned.
    * The quotient table is keys×seats rows on the AGGREGATED key table
    * (bounded-domain contract, as [[largestRemainder]]).
    */
  def dhondt(df: DataFrame, keyCol: String, scoreCol: String,
             seats: Int): DataFrame = {
    require(seats >= 1, s"seats must be >= 1, got $seats")
    val agg = df.groupBy(col(keyCol).as("key"))
      .agg(sum(col(scoreCol)).cast("long").as("score"))
      .filter(col("score") > 0)
    val won = agg
      .withColumn("divisor", explode(sequence(lit(1), lit(seats))))
      .withColumn("_q", col("score").cast("double") / col("divisor").cast("double"))
      .orderBy(col("_q").desc, col("key"), col("divisor"))
      .limit(seats)
      .groupBy(col("key")).agg(count(lit(1)).as("alloc"))
    agg.join(won, Seq("key"), "left")
      .withColumn("alloc", coalesce(col("alloc"), lit(0L)))
      .select(col("key"), col("score"), col("alloc"))
  }
}
