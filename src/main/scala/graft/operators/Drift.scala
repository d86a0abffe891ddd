package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributional drift between a reference window and a current window —
  * the monitoring layer that tells a pipeline its inputs moved before the
  * downstream metrics do. Complements the SEQUENTIAL detectors
  * ([[Anomaly.cusum]], [[Kalman]] innovations) with two-sample tests over
  * whole windows:
  *
  *  - [[psi]] — population stability index (Karakoulas 2004 credit-scoring
  *    folklore, the industry-standard drift score): bin the reference range,
  *    PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref). Rule of thumb: <0.1 stable,
  *    0.1–0.25 drifting, >0.25 shifted.
  *  - [[ks]] — exact two-sample Kolmogorov–Smirnov statistic
  *    D = sup_x |F_ref(x) − F_cur(x)|, distribution-free.
  *
  * Both are deterministic, closed-form plans an independent engine can
  * replay: PSI uses fixed-width bins over the reference min/max (NOT approx
  * quantile edges — those aren't replayable) with Laplace-smoothed shares
  * p = (c + 0.5)/(n + B/2) so empty bins stay finite; KS works on integer
  * cumulative counts divided once at the end.
  *
  * Scale shape: PSI is two grouped counts + a B-row-per-key join (B tiny) —
  * all map-side-combinable. KS needs each key's distinct values ordered in
  * one task (the honest exact-statistic cost, same bound class as the
  * per-key series ops); at unbounded per-key cardinality, bucket values
  * first ([[Hist.histogram]]) and accept binned resolution.
  */
object Drift {

  /** PSI per key: (keys..., psi, n_ref, n_cur). Keys present only in `cur`
    * are dropped (no reference range to bin against); a key whose reference
    * range is degenerate (min == max) puts everything in bin 0.
    */
  def psi(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
          valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val stats = ref.filter(v.isNotNull).groupBy(keys: _*)
      .agg(min(v).as("_lo"), max(v).as("_hi"), count(lit(1)).as("n_ref"))
    def binned(df: DataFrame, cntName: String): DataFrame =
      df.filter(v.isNotNull)
        .join(stats.select((keys :+ col("_lo") :+ col("_hi")): _*), keyCols)
        .withColumn("_bin", when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(lit(bins - 1L), greatest(lit(0L),
            floor((v - col("_lo")) / (col("_hi") - col("_lo")) * bins)))))
        .groupBy((keys :+ col("_bin")): _*)
        .agg(count(lit(1)).as(cntName))
    val refCnt = binned(ref, "_cr")
    val curCnt = binned(cur, "_cc")
    val curN = cur.filter(v.isNotNull).groupBy(keys: _*)
      .agg(count(lit(1)).as("n_cur"))
    // every (key, bin) slot materialized so empty bins enter the smoothing
    val slots = stats.select(keys: _*)
      .withColumn("_bin", explode(sequence(lit(0L), lit(bins - 1L))))
    val shares = slots
      .join(refCnt, keyCols :+ "_bin", "left")
      .join(curCnt, keyCols :+ "_bin", "left")
      .join(stats.select((keys :+ col("n_ref")): _*), keyCols)
      .join(curN, keyCols)
      .withColumn("_pr", (coalesce(col("_cr"), lit(0L)) + lit(0.5)) /
        (col("n_ref") + lit(0.5) * bins))
      .withColumn("_pc", (coalesce(col("_cc"), lit(0L)) + lit(0.5)) /
        (col("n_cur") + lit(0.5) * bins))
    shares.groupBy(keys: _*)
      .agg(sum((col("_pc") - col("_pr")) * log(col("_pc") / col("_pr"))).as("psi"),
        max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"))
  }

  /** Exact two-sample KS statistic per key: (keys..., ks, n_ref, n_cur).
    * Keys must appear in both windows (inner semantics via the count join).
    */
  def ks(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
         valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val tagged = ref.filter(v.isNotNull)
      .select((keys :+ v.as("_v") :+ lit(1L).as("_ir") :+ lit(0L).as("_ic")): _*)
      .unionByName(cur.filter(v.isNotNull)
        .select((keys :+ v.as("_v") :+ lit(0L).as("_ir") :+ lit(1L).as("_ic")): _*))
    val perVal = tagged.groupBy((keys :+ col("_v")): _*)
      .agg(sum(col("_ir")).as("_cr"), sum(col("_ic")).as("_cc"))
    val w = Window.partitionBy(keys: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val cum = perVal
      .withColumn("_sr", sum(col("_cr")).over(w))
      .withColumn("_sc", sum(col("_cc")).over(w))
      .withColumn("n_ref", sum(col("_cr")).over(wAll))
      .withColumn("n_cur", sum(col("_cc")).over(wAll))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
    cum.groupBy(keys: _*)
      .agg(max(abs(col("_sr") / col("n_ref") - col("_sc") / col("n_cur"))).as("ks"),
        max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"))
  }

  /** Exact 1-Wasserstein (earth-mover) distance per key between the two
    * windows' empirical distributions:
    *   W₁ = ∫ |F_ref(x) − F_cur(x)| dx = Σ |F_ref(vᵢ) − F_cur(vᵢ)|·(vᵢ₊₁ − vᵢ)
    * — where [[ks]] reports the WORST ECDF gap, W₁ integrates all of them,
    * in the VALUE's units (a 10-unit mean shift gives W₁ ≈ 10), which makes
    * it the drift magnitude to alert on and PSI/KS the normalized scores.
    * Same exact integer-cumulative-count plumbing and per-key sort bound as
    * [[ks]]. Output: (keys..., w1, n_ref, n_cur).
    */
  def wasserstein1(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
                   valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val tagged = ref.filter(v.isNotNull)
      .select((keys :+ v.as("_v") :+ lit(1L).as("_ir") :+ lit(0L).as("_ic")): _*)
      .unionByName(cur.filter(v.isNotNull)
        .select((keys :+ v.as("_v") :+ lit(0L).as("_ir") :+ lit(1L).as("_ic")): _*))
    val perVal = tagged.groupBy((keys :+ col("_v")): _*)
      .agg(sum(col("_ir")).as("_cr"), sum(col("_ic")).as("_cc"))
    val w = Window.partitionBy(keys: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val wNext = Window.partitionBy(keys: _*).orderBy(col("_v"))
    val cum = perVal
      .withColumn("_sr", sum(col("_cr")).over(w))
      .withColumn("_sc", sum(col("_cc")).over(w))
      .withColumn("n_ref", sum(col("_cr")).over(wAll))
      .withColumn("n_cur", sum(col("_cc")).over(wAll))
      .withColumn("_gap", lead(col("_v"), 1).over(wNext) - col("_v"))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
    // NOTE: the float accumulation order is engine-internal (DuckDB windows
    // sum through a segment tree, Spark sequentially), so the last ulp of
    // w1 is NOT cross-engine reproducible — for decimal-quantized measures
    // use [[wasserstein1Quantized]], which is integer-exact end to end
    cum.withColumn("_w1cum", sum(when(col("_gap").isNotNull,
        abs(col("_sr") / col("n_ref") - col("_sc") / col("n_cur")) * col("_gap")))
        .over(w))
      .groupBy(keys: _*)
      .agg(max(col("_w1cum")).as("w1"),
        max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"))
  }

  /** [[wasserstein1]] for decimal-quantized measures, BIT-EXACT across
    * engines: values scale to integer units (e.g. cents at scale=100), the
    * gap integral becomes Σ |sr·nc − sc·nr| · gapᵤ — a pure INTEGER sum no
    * float-accumulation order can perturb — and floats appear only in the
    * single final division w1 = Σ / (n_ref·n_cur) / scale. The integer sum
    * is bounded by n_ref·n_cur·range·scale: within long for realistic
    * windows (document the bound when pointing it at 10⁹-row windows).
    */
  def wasserstein1Quantized(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
                            valueCol: String, scale: Long = 100L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val keys = keyCols.map(col)
    val vq = round(col(valueCol).cast("double") * scale).cast("long")
    val tagged = ref.filter(col(valueCol).isNotNull)
      .select((keys :+ vq.as("_v") :+ lit(1L).as("_ir") :+ lit(0L).as("_ic")): _*)
      .unionByName(cur.filter(col(valueCol).isNotNull)
        .select((keys :+ vq.as("_v") :+ lit(0L).as("_ir") :+ lit(1L).as("_ic")): _*))
    val perVal = tagged.groupBy((keys :+ col("_v")): _*)
      .agg(sum(col("_ir")).as("_cr"), sum(col("_ic")).as("_cc"))
    val w = Window.partitionBy(keys: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val wNext = Window.partitionBy(keys: _*).orderBy(col("_v"))
    val cum = perVal
      .withColumn("_sr", sum(col("_cr")).over(w))
      .withColumn("_sc", sum(col("_cc")).over(w))
      .withColumn("n_ref", sum(col("_cr")).over(wAll))
      .withColumn("n_cur", sum(col("_cc")).over(wAll))
      .withColumn("_gap", lead(col("_v"), 1).over(wNext) - col("_v"))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
    cum.groupBy(keys: _*)
      .agg(sum(when(col("_gap").isNotNull,
        abs(col("_sr") * col("n_cur") - col("_sc") * col("n_ref")) * col("_gap"))
        .otherwise(lit(0L))).as("_int"),
        max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"))
      .withColumn("w1", col("_int").cast("double") /
        (col("n_ref") * col("n_cur")).cast("double") / scale)
      .select((keys :+ col("w1") :+ col("n_ref") :+ col("n_cur")): _*)
  }

  /** Two-proportion z-test per key (the standard A/B and rate-drift test):
    * with successes s and trials n in each window,
    *   p̂ = (s_r + s_c)/(n_r + n_c)
    *   z  = (s_r/n_r − s_c/n_c) / √(p̂(1−p̂)(1/n_r + 1/n_c))
    * |z| > 1.96 rejects equal rates at 5%. All inputs are exact integer
    * counts; z is null when either window is empty or the pooled rate is
    * degenerate (0 or 1 — no variance to test against). Completes the
    * drift family for RATE measures (psi/ks/w1 cover distributions).
    * Two grouped counts + one key-sized join. Output: (keys..., rate_ref,
    * rate_cur, z, n_ref, n_cur).
    */
  def proportionZ(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
                  successCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val s = col(successCol).cast("long")
    def cnt(df: DataFrame, sn: String, nn: String): DataFrame =
      df.filter(s.isNotNull).groupBy(keys: _*)
        .agg(sum(s).as(sn), count(lit(1)).as(nn))
    val j = cnt(ref, "_sr", "n_ref").join(cnt(cur, "_sc", "n_cur"), keyCols)
    val pr = col("_sr") / col("n_ref"); val pc = col("_sc") / col("n_cur")
    val pool = (col("_sr") + col("_sc")) / (col("n_ref") + col("n_cur"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_ref") + lit(1.0) / col("n_cur")))
    j.withColumn("rate_ref", pr).withColumn("rate_cur", pc)
      .withColumn("z", when(pool > 0 && pool < 1, (pr - pc) / se))
      .select((keys :+ col("rate_ref") :+ col("rate_cur") :+ col("z") :+
        col("n_ref") :+ col("n_cur")): _*)
  }

  /** Exponential inter-arrival fit + one-sample KS goodness-of-fit per key:
    * λ̂ = 1/mean(gap) (the MLE), then
    *   D = max_i max( i/n − F(x₍ᵢ₎), F(x₍ᵢ₎) − (i−1)/n ),  F(x) = 1 − e^(−λ̂x)
    * — "is this arrival process Poisson": D near 0 accepts memorylessness,
    * large D flags burstiness/periodicity that capacity models built on
    * Poisson assumptions will get wrong. Gaps are computed from the event
    * times inside this operator (one lag window), the fit and the test run
    * on exact order statistics (one ranked window per key).
    * Output: (keys..., lambda, ks_stat, n_gaps).
    */
  def expFitKs(df: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val t = unix_micros(col(tsCol).cast("timestamp"))
    val wT = Window.partitionBy(keys: _*).orderBy(t)
    val gaps = df
      .withColumn("_gap", (t - lag(t, 1).over(wT)).cast("double") / lit(1e6))
      .filter(col("_gap").isNotNull && col("_gap") > 0)
    val lam = gaps.groupBy(keys: _*)
      .agg((lit(1.0) / avg(col("_gap"))).as("lambda"),
        count(lit(1)).as("n_gaps"))
    val wR = Window.partitionBy(keys: _*).orderBy(col("_gap"))
    gaps.join(lam, keyCols)
      .withColumn("_i", row_number().over(wR).cast("double"))
      .withColumn("_f", lit(1.0) - exp(-col("lambda") * col("_gap")))
      .groupBy((keys :+ col("lambda") :+ col("n_gaps")): _*)
      .agg(max(greatest(col("_i") / col("n_gaps") - col("_f"),
        col("_f") - (col("_i") - 1) / col("n_gaps"))).as("ks_stat"))
      .select((keys :+ col("lambda") :+ col("ks_stat") :+ col("n_gaps")): _*)
  }

  /** Two-sample ENERGY distance per key (Székely & Rizzo 2004 — the
    * metric that is zero iff the distributions are equal and, unlike
    * [[ks]]/[[wasserstein1]], generalizes to multivariate; in 1-D it
    * integrates the SQUARED ECDF gap where W₁ integrates |gap|):
    *   D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|
    * Each expectation collapses to a pair-count-times-gap sum over the
    * sorted distinct values — for the cut between consecutive values with
    * gap g, the pairs straddling it contribute g each:
    *   Σ|x−y|  = Σ g·(sr·(nc−sc) + sc·(nr−sr))
    *   Σ|x−x'| = 2·Σ g·sr·(nr−sr)     (sr/sc = cumulative counts, nr/nc totals)
    * so the whole statistic is ONE per-value aggregate + one cumulative
    * window per key — identical plumbing (and per-key sort bound) to
    * [[wasserstein1]], never an O(n²) pair join. The pair-count factors are
    * exact integers; floats enter only at gap·count products, so mirror the
    * construction on the oracle side and round the result.
    * Output: (keys..., energy_dist, d2, n_ref, n_cur).
    */
  def energyDistance(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
                     valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val tagged = ref.filter(v.isNotNull)
      .select((keys :+ v.as("_v") :+ lit(1L).as("_ir") :+ lit(0L).as("_ic")): _*)
      .unionByName(cur.filter(v.isNotNull)
        .select((keys :+ v.as("_v") :+ lit(0L).as("_ir") :+ lit(1L).as("_ic")): _*))
    val perVal = tagged.groupBy((keys :+ col("_v")): _*)
      .agg(sum(col("_ir")).as("_cr"), sum(col("_ic")).as("_cc"))
    val w = Window.partitionBy(keys: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val wNext = Window.partitionBy(keys: _*).orderBy(col("_v"))
    val cum = perVal
      .withColumn("_sr", sum(col("_cr")).over(w))
      .withColumn("_sc", sum(col("_cc")).over(w))
      .withColumn("n_ref", sum(col("_cr")).over(wAll))
      .withColumn("n_cur", sum(col("_cc")).over(wAll))
      .withColumn("_gap", lead(col("_v"), 1).over(wNext) - col("_v"))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
    cum.groupBy((keys :+ col("n_ref") :+ col("n_cur")): _*)
      .agg(
        sum(when(col("_gap").isNotNull, col("_gap") *
          (col("_sr") * (col("n_cur") - col("_sc")) +
           col("_sc") * (col("n_ref") - col("_sr"))))).as("_sxy"),
        sum(when(col("_gap").isNotNull,
          col("_gap") * col("_sr") * (col("n_ref") - col("_sr")))).as("_sxx"),
        sum(when(col("_gap").isNotNull,
          col("_gap") * col("_sc") * (col("n_cur") - col("_sc")))).as("_syy"))
      .withColumn("d2",
        lit(2.0) * coalesce(col("_sxy"), lit(0.0)) / (col("n_ref") * col("n_cur"))
          - lit(2.0) * coalesce(col("_sxx"), lit(0.0)) / (col("n_ref") * col("n_ref"))
          - lit(2.0) * coalesce(col("_syy"), lit(0.0)) / (col("n_cur") * col("n_cur")))
      .withColumn("energy_dist", sqrt(greatest(col("d2"), lit(0.0))))
      .select((keys :+ col("energy_dist") :+ col("d2") :+
        col("n_ref") :+ col("n_cur")): _*)
  }

  /** Two-sample Cramér–von Mises statistic per key, ECDF form (Anderson
    * 1962): T = nm/(n+m)² · Σ_z (F_n(z) − G_m(z))², summed over every
    * POOLED observation z (distinct values weighted by pooled multiplicity
    * — the natural ties handling; equal to the classical rank form when
    * ties are absent). Between [[ks]] (max gap — localized shifts) and
    * [[wasserstein1]] (integrated |gap| in value units), CvM weights gaps
    * by local data density: sensitive where the data actually lives,
    * scale-free in the value. Same per-value-counts plumbing; one window +
    * one aggregate per key. Output: (keys..., cvm, n_ref, n_cur).
    */
  def cvm2(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
           valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val tagged = ref.filter(v.isNotNull)
      .select((keys :+ v.as("_v") :+ lit(1L).as("_ir") :+ lit(0L).as("_ic")): _*)
      .unionByName(cur.filter(v.isNotNull)
        .select((keys :+ v.as("_v") :+ lit(0L).as("_ir") :+ lit(1L).as("_ic")): _*))
    val perVal = tagged.groupBy((keys :+ col("_v")): _*)
      .agg(sum(col("_ir")).as("_cr"), sum(col("_ic")).as("_cc"))
    val w = Window.partitionBy(keys: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val cum = perVal
      .withColumn("_sr", sum(col("_cr")).over(w))
      .withColumn("_sc", sum(col("_cc")).over(w))
      .withColumn("n_ref", sum(col("_cr")).over(wAll))
      .withColumn("n_cur", sum(col("_cc")).over(wAll))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
    cum.groupBy((keys :+ col("n_ref") :+ col("n_cur")): _*)
      .agg(sum((col("_cr") + col("_cc")) *
        pow(col("_sr") / col("n_ref") - col("_sc") / col("n_cur"), 2)).as("_s"))
      .withColumn("cvm", col("_s") * col("n_ref") * col("n_cur") /
        pow(col("n_ref") + col("n_cur"), 2))
      .select((keys :+ col("cvm") :+ col("n_ref") :+ col("n_cur")): _*)
  }
}
