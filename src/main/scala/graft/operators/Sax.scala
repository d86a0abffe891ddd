package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SAX symbolization (Lin, Keogh, Lonardi, Chiu 2003, "A Symbolic
  * Representation of Time Series"): z-normalize each series, Piecewise
  * Aggregate Approximation (mean per fixed time frame), then map each frame
  * mean to a letter via equiprobable Gaussian breakpoints. The per-series
  * output is one short word — the standard index key for motif discovery,
  * similar-shape grouping, and anomaly triage over huge series populations.
  *
  * The reference has no symbolization, but this is the time-series analogue
  * of its categorical encoding (/root/reference/forecastframe/transform.py:367-396):
  * a lossy, dictionary-friendly representation that downstream stages group
  * and join on. At 10^12 points the value is exactly that: a month of
  * minutes per host compresses to a ~30-char word, and "hosts shaped like
  * this one" becomes an equi-join on the word (or on its prefix), not a
  * distance scan.
  *
  * Scale: two narrow aggregations — per-series moments, then per-frame means
  * — both shuffle on the series key only; the word assembly is a
  * `collect_list` bounded by the frame count (range-width / frameSeconds),
  * never by the raw point count. Frame means are rounded to 6 dp before the
  * breakpoint compare so the letter is reproducible across engines
  * (summation-order ulp noise cannot flip a symbol except exactly ON a
  * rounded breakpoint).
  */
object Sax {

  /** Equiprobable N(0,1) breakpoints (Lin et al. 2003, Table 3). */
  val Breakpoints: Map[Int, Seq[Double]] = Map(
    2 -> Seq(0.0),
    3 -> Seq(-0.4307273, 0.4307273),
    4 -> Seq(-0.6744898, 0.0, 0.6744898),
    5 -> Seq(-0.841621, -0.2533471, 0.2533471, 0.841621),
    6 -> Seq(-0.9674216, -0.4307273, 0.0, 0.4307273, 0.9674216))

  private def round6(c: Column): Column =
    when(c.isNull, lit(null).cast("double"))
      .otherwise(signum(c) * floor(abs(c) * 1e6 + 0.5) / 1e6)

  /** Letter for a (rounded) frame mean: symbol j when
    * breakpoint(j-1) <= m < breakpoint(j), letters 'a'.. upward.
    */
  private def symbol(m: Column, alphabet: Int): Column = {
    val bps = Breakpoints(alphabet)
    val last = lit(('a' + bps.length).toChar.toString)
    bps.zipWithIndex.foldRight(last) { case ((bp, i), rest) =>
      when(m < lit(bp), lit(('a' + i).toChar.toString)).otherwise(rest)
    }
  }

  /** Per-frame PAA over the z-normalized series: one row per (group, frame)
    * with the frame's z-mean (`paa`, 6 dp) and its letter (`sym`).
    * Constant series (stddev 0) z-normalize to all-zero, per convention.
    */
  def paa(df: DataFrame, groupCols: Seq[String], tsCol: String, valueCol: String,
          frameSeconds: Long, alphabet: Int = 4): DataFrame = {
    require(Breakpoints.contains(alphabet),
      s"alphabet must be one of ${Breakpoints.keys.toSeq.sorted.mkString(",")}")
    val keys = groupCols.map(col)
    val moments = df.groupBy(keys: _*)
      .agg(avg(col(valueCol)).as("_mu"), stddev_pop(col(valueCol)).as("_sd"))
    df.join(moments, groupCols)
      .withColumn("_z", when(col("_sd") > 0,
        (col(valueCol) - col("_mu")) / col("_sd")).otherwise(lit(0.0)))
      .withColumn("frame_start",
        (unix_timestamp(col(tsCol)) - pmod(unix_timestamp(col(tsCol)), lit(frameSeconds))))
      .groupBy((keys :+ col("frame_start")): _*)
      .agg(round6(avg(col("_z"))).as("paa"))
      .withColumn("sym", symbol(col("paa"), alphabet))
  }

  /** One SAX word per group: frame letters concatenated in time order. */
  def sax(df: DataFrame, groupCols: Seq[String], tsCol: String, valueCol: String,
          frameSeconds: Long, alphabet: Int = 4): DataFrame = {
    paa(df, groupCols, tsCol, valueCol, frameSeconds, alphabet)
      .groupBy(groupCols.map(col): _*)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("frame_start"), col("sym")))),
          x => x.getField("sym")), "").as("sax_word"),
        count(lit(1)).as("n_frames"))
  }

  /** Motif discovery by SAX-word collision (the Lin et al. 2003 use case):
    * series whose whole-range words are IDENTICAL form a motif class — the
    * "hosts shaped like this one" equi-group. Emits classes of at least
    * `minSize` members with the class size and the min/max member key (a
    * deterministic summary — never a collected member list, which at 10⁹
    * series would be the one unbounded thing in the plan). `seriesCol` must
    * be a single orderable key column.
    *
    * Scale: everything [[sax]] costs plus ONE more shuffle on the word —
    * motif search over a series population without a single distance
    * computation; candidate classes can then feed an exact verify stage the
    * way LSH buckets feed [[Dedup]]'s.
    */
  def motifs(df: DataFrame, seriesCol: String, tsCol: String, valueCol: String,
             frameSeconds: Long, alphabet: Int = 4, minSize: Long = 2L): DataFrame =
    sax(df, Seq(seriesCol), tsCol, valueCol, frameSeconds, alphabet)
      .groupBy(col("sax_word"))
      .agg(count(lit(1)).as("n_series"),
        min(col(seriesCol)).as("member_min"),
        max(col(seriesCol)).as("member_max"),
        min(col("n_frames")).as("min_frames"),
        max(col("n_frames")).as("max_frames"))
      .filter(col("n_series") >= minSize)
}
