package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** Deterministic, replayable sampling for training-data pipelines.
  *
  * The reference samples with `df.sample(frac)` + a stored random seed
  * (/root/reference/forecastframe/main.py sample-loading path); at 100 TB a
  * seed is not enough — a sample must be REPLAYABLE independent of
  * partitioning, row order, executor count, and engine (so an external
  * auditor can re-derive exactly which rows were kept). Everything here is
  * content-hash based (md5, see [[graft.functions.Hashing]]): the same row
  * is kept or dropped everywhere, forever, and the DuckDB oracle replays the
  * identical sample in SQL.
  *
  * Scale design:
  *   - [[hashSample]]: a pure narrow filter — no shuffle, no state, pushes
  *     down past column pruning; sampling 0.1% of 10^12 rows costs one scan.
  *   - [[stratifiedBottomK]]: exact k per stratum via one window shuffle on
  *     the stratum key. The hash order is uniform, so rank ≤ k is an
  *     unbiased without-replacement sample per stratum. Skew-safe: a 10^9-row
  *     stratum still sorts only within its partition, and for k ≪ stratum
  *     size a `filter(hash < threshold)` pre-prune (documented below) caps
  *     the sort input at ~k·oversample rows per stratum.
  */
object Sampling {

  /** Keep a row iff md5Long(idCol) mod `denom` < `keep` — a deterministic
    * `keep/denom` Bernoulli-style sample keyed on content, not on RNG state.
    */
  def hashSample(df: DataFrame, idCol: Column, keep: Int, denom: Int): DataFrame = {
    require(keep >= 0 && denom > 0 && keep <= denom, s"need 0 <= keep <= denom, got $keep/$denom")
    df.filter(pmod(md5Long(idCol), lit(denom.toLong)) < keep)
  }

  /** Exactly `min(k, |stratum|)` rows per stratum: the k rows whose
    * (md5 hex of `idCol`, id) sort lowest. MD5's avalanche makes the order
    * uniform w.r.t. any input structure; the id tiebreak makes the result
    * total even under (astronomically unlikely) digest collisions.
    *
    * At very large strata with small k, pre-prune before the window:
    * `df.filter(md5Long(id) < Long.MaxValue / stratumSize * k * 8)` keeps
    * ~8k candidate rows per stratum and cannot lose a true bottom-k member
    * unless the stratum's k-th hash exceeds the threshold (probability
    * ~exp(-7) per stratum at the 8× oversample; tighten as needed).
    */
  def stratifiedBottomK(df: DataFrame, strataCols: Seq[String], idCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Top-k rows per group by a measure (ref `argmin`/top-k shapes,
    * SURVEY §2.6, generalized per group): deterministic under ties via the
    * id tiebreak. One window shuffle on the group keys; the filter prunes
    * before anything downstream shuffles again. Adds `rnk` (1-based).
    */
  def topKBy(df: DataFrame, groupCols: Seq[String], orderCol: String,
             idCol: String, k: Int, descending: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ord = if (descending) col(orderCol).desc else col(orderCol).asc
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord, col(idCol))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Replayable bootstrap: `b` resample means of an integer measure, for a
    * percentile confidence interval on the mean (Efron 1979, public
    * method). Returns one row per replicate: (rep, boot_mean).
    *
    * Draws are content-hash uniforms, not RNG state: replicate r's draw i
    * picks row id md5Long("seed:r:i") mod n — the same auditor-replayable
    * contract as [[hashSample]], and the DuckDB oracle re-derives every
    * draw. Ids must be CONTIGUOUS 0..n-1 ([[graft.operators.Encoding]]'s
    * ordinal dictionary produces exactly that for anything else).
    *
    * Scale: the draw grid is generate_series-shaped (b × m rows of two
    * longs, no text), equi-joined once against the measure table — both
    * sides one shuffle on the id. `m` is the m-out-of-n bootstrap size: at
    * 10^12 rows resampling n-out-of-n is pointless and unpayable — fix m
    * (10^5 or so) and the CI stays consistent (Bickel et al., public
    * result) while the grid stays tiny. Means are exact: int64 sums, one
    * double division.
    */
  def bootstrapMeans(df: DataFrame, idCol: String, valCol: String,
                     n: Long, b: Int, m: Long, seed: String): DataFrame = {
    require(n >= 1 && b >= 1 && m >= 1, s"need n,b,m >= 1, got n=$n b=$b m=$m")
    val spark = df.sparkSession
    val draws = spark.range(b.toLong).select(col("id").as("rep"))
      .select(col("rep"), explode(sequence(lit(0L), lit(m - 1))).as("i"))
      .select(col("rep"),
        pmod(md5Long(concat_ws(":", lit(seed), col("rep"), col("i"))), lit(n)).as("_idx"))
    draws.join(df.select(col(idCol).as("_idx"), col(valCol).as("_v")), "_idx")
      .groupBy("rep")
      .agg((sum(col("_v").cast("long")).cast("double") / m).as("boot_mean"))
  }

  /** Priority sampling (Duffield, Lund & Thorup 2007): weight-proportional
    * sample WITHOUT replacement by taking the top-k priorities
    * q_i = w_i / u_i, u_i uniform on (0, 1] — the scheme whose
    * threshold-adjusted estimator max(w_i, τ) is unbiased for subset sums.
    *
    * Replayable like every sampler here: u_i = (md5Long(seed:id) + 1) / 2⁶⁰
    * — no RNG state, each priority is two fixed-order IEEE ops on exact
    * integers, so an auditing engine reproduces every priority
    * BIT-IDENTICALLY and the top-k cut cannot flake cross-engine (id
    * tie-break makes the order total regardless).
    *
    * Scale: one narrow projection then a distributed TakeOrdered
    * (`orderBy(...).limit(k)`) — no global window, no shuffle of the
    * un-sampled mass. Weights must be positive.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (md5Long(concat_ws(":", lit(seed), col(idCol))) + 1L).cast("double") /
      lit(1152921504606846976.0) // 2^60
    df.filter(col(weightCol) > 0)
      .withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol).as("weight"), col("priority"))
  }

  /** Stratified sample of exactly `total` rows with per-stratum counts
    * apportioned PROPORTIONALLY to stratum sizes by the largest-remainder
    * method ([[Alloc.largestRemainder]] — Σ quotas == total exactly,
    * every stratum within 1 of its real share), members picked per
    * stratum by seeded-hash rank — the auditor-replayable version of
    * `sampleBy` (whose Bernoulli draws neither hit the target count nor
    * replay from SQL). The training-data staple: "exactly 1M pages,
    * source mix preserved".
    *
    * Plan: one stratum-size count, the bounded-domain apportionment, one
    * broadcast quota join, one per-stratum window ranked by
    * (md5(seed:id), id). The window sorts within each stratum — fine
    * while strata are the natural corpus partitions (source, lang); the
    * hash order makes the pick uniform within the stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       total: Long, seed: String): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    val quotas = Alloc.largestRemainder(
      df.select(col(stratumCol), lit(1L).as("_one")), stratumCol, "_one", total)
      .select(col("key").as(stratumCol), col("alloc").as("_quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5Long(concat_ws(":", lit(seed), col(idCol))), col(idCol))
    df.join(broadcast(quotas), stratumCol)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= col("_quota"))
      .select(df.columns.map(col): _*) // the using-join fronted the stratum
  }
}
