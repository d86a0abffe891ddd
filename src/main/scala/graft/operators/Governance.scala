package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** Privacy-guarded aggregate release — the governance gate between a raw
  * corpus and published statistics (per-source counts in a transparency
  * report, shared eval-set breakdowns).
  *
  * Not in the reference; the web-corpus extension beside the scrub/redact
  * ops (q67/q194). Two public mechanisms composed:
  *   - k-anonymity small-cell suppression (Sweeney 2002): groups with
  *     fewer than `minGroupSize` rows are withheld entirely — the cells
  *     that would re-identify.
  *   - bounded integer noise on the surviving counts, derived from a
  *     content hash (uniform on [-noiseBound, +noiseBound]) and clamped at
  *     the suppression floor. Uniform-bounded rather than Laplace BY
  *     DESIGN here: the release stays integer-exact so an auditing engine
  *     reproduces it bit-for-bit (the md5 contract of
  *     [[graft.functions.Hashing]]) — swap the noise map for a discrete
  *     Laplace sampler when formal ε-DP is the requirement; the
  *     suppression/clamp/release plumbing is identical.
  *
  * Scale: one map-side-combined count on the group keys, then pure
  * projection — no second shuffle, nothing collected.
  */
object Governance {

  /** Release noisy counts per group: true count → suppress (< minGroupSize)
    * → add hash-seeded noise in [-noiseBound, +noiseBound] → clamp to
    * minGroupSize so the noise itself can never leak a suppressed-adjacent
    * cell below the floor. Output: group cols + released_count.
    */
  def noisyCountRelease(df: DataFrame, groupCols: Seq[String],
                        minGroupSize: Long, noiseBound: Long,
                        seed: String): DataFrame = {
    require(minGroupSize >= 1, s"minGroupSize must be >= 1, got $minGroupSize")
    require(noiseBound >= 0, s"noiseBound must be >= 0, got $noiseBound")
    val counts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("_true"))
      .filter(col("_true") >= minGroupSize)
    val noise = pmod(
      md5Long(concat_ws(":", lit(seed) +: groupCols.map(c => col(c).cast("string")): _*)),
      lit(2 * noiseBound + 1)) - noiseBound
    counts.select((groupCols.map(col) :+
      greatest(col("_true") + noise, lit(minGroupSize)).as("released_count")): _*)
  }
}
