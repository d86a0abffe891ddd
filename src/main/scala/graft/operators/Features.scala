package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-series feature engineering over a keyed, time-indexed table —
  * the Spark realization of the reference's feature layer
  * (/root/reference/forecastframe/feature_engineering.py). Where pandas
  * replays a recorded `function_list` on the full frame
  * (model.py:592-628), these are lazy Catalyst transforms: composition IS
  * the deferred plan.
  *
  * All operators are window functions over `W(h,t) =
  * partitionBy(hierarchy).orderBy(time)` — a single shuffle on the
  * hierarchy key serves every feature in the same stage, so a chain of N
  * features costs one Exchange, not N.
  */
object Features {

  /** W(h,t): the canonical per-series window. */
  def w(hierarchy: Seq[String], tsCol: String): WindowSpec =
    Window.partitionBy(hierarchy.map(col): _*).orderBy(col(tsCol))

  /** Range window over unix-seconds ordering for time-based rolling frames. */
  def rangeW(hierarchy: Seq[String], tsCol: String): WindowSpec =
    Window.partitionBy(hierarchy.map(col): _*).orderBy(unix_timestamp(col(tsCol)))

  /** Per-group lag features (ref feature_engineering.py:210-267). `lags`
    * must be ≥ 1 — the reference enforces this to prevent target leakage.
    */
  def lagFeatures(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                  cols: Seq[String], lags: Seq[Int]): DataFrame = {
    require(lags.forall(_ >= 1), "lags must be >= 1 (anti-leakage, ref feature_engineering.py:231)")
    val win = w(hierarchy, tsCol)
    lags.foldLeft(df) { (d, l) =>
      cols.foldLeft(d)((dd, c) => dd.withColumn(s"${c}_lag$l", lag(col(c), l).over(win)))
    }
  }

  /** Per-group differences: x - lag(x, periods) (ref :173-207). */
  def differenceFeatures(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                         cols: Seq[String], periods: Seq[Int]): DataFrame = {
    val win = w(hierarchy, tsCol)
    periods.foldLeft(df) { (d, p) =>
      cols.foldLeft(d)((dd, c) => dd.withColumn(s"${c}_diff$p", col(c) - lag(col(c), p).over(win)))
    }
  }

  /** Per-group percent change of the lagged series (ref :724-810):
    * pandas `shift(lag).pct_change()` = (lag(x,l) - lag(x,l+1)) / lag(x,l+1),
    * with ±inf (zero denominator) mapped to null like the reference's
    * `replace([np.inf,-np.inf], np.nan)` (:732).
    */
  def percentChange(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                    cols: Seq[String], lags: Seq[Int]): DataFrame = {
    val win = w(hierarchy, tsCol)
    lags.foldLeft(df) { (d, l) =>
      cols.foldLeft(d) { (dd, c) =>
        val num = lag(col(c), l).over(win) - lag(col(c), l + 1).over(win)
        val den = lag(col(c), l + 1).over(win)
        dd.withColumn(s"${c}_pct_change$l",
          when(den.isNull || den === 0, lit(null)).otherwise(num / den))
      }
    }
  }

  /** Reference default min_periods = ceil(window^0.8)
    * (feature_engineering.py:479-483).
    */
  def defaultMinPeriods(windowDays: Int): Int = math.ceil(math.pow(windowDays, 0.8)).toInt

  /** Rolling aggregate frame: pandas `shift(lag).rolling(f"{w}D")` on a daily
    * grid ≡ time range (t - lag·D - (w-1)·D, t - lag·D] — expressed in
    * seconds over unix-ts ordering so irregular/gapped series behave like the
    * pandas time-based window (closed='right').
    */
  private def rollingFrame(win: WindowSpec, windowDays: Int, lagDays: Int): WindowSpec =
    win.rangeBetween(-(lagDays.toLong + windowDays.toLong - 1L) * 86400L, -lagDays.toLong * 86400L)

  /** Rolling statistics with the reference's min_periods gate
    * (feature_engineering.py:314-496): max,min,std,mean,median,sum,kurt,skew
    * over a `windowDays`-day window of the series lagged by `lagDays` days.
    * Buckets with fewer than minPeriods observations yield null.
    */
  def rollingStats(df: DataFrame, hierarchy: Seq[String], tsCol: String, valueCol: String,
                   windowDays: Int, lagDays: Int = 1, minPeriods: Option[Int] = None,
                   ops: Seq[String] = Seq("max", "min", "std", "mean", "median", "sum", "kurt", "skew")): DataFrame = {
    val mp = minPeriods.getOrElse(defaultMinPeriods(windowDays))
    val frame = rollingFrame(rangeW(hierarchy, tsCol), windowDays, lagDays)
    val x = col(valueCol)
    val n = count(x).over(frame)
    def gated(c: Column): Column = when(n >= mp, c).otherwise(lit(null))
    // pandas parity for the shape stats (reference uses pandas .skew()/.kurt(),
    // which are the sample-adjusted G1/G2, not Spark's population g1/g2):
    //   G1 = g1 * sqrt(n(n-1)) / (n-2)            (null for n < 3)
    //   G2 = ((n+1)*g2 + 6) * (n-1) / ((n-2)(n-3)) (null for n < 4)
    val pandasSkew = when(n >= 3,
      skewness(x).over(frame) * sqrt(n * (n - 1)) / (n - 2))
    val pandasKurt = when(n >= 4,
      ((n + 1) * kurtosis(x).over(frame) + 6) * (n - 1) / ((n - 2) * (n - 3)))
    val exprs: Map[String, Column] = Map(
      "max" -> max(x).over(frame), "min" -> min(x).over(frame),
      "std" -> stddev_samp(x).over(frame), "mean" -> avg(x).over(frame),
      "median" -> percentile(x, lit(0.5)).over(frame), "sum" -> sum(x).over(frame),
      "kurt" -> pandasKurt, "skew" -> pandasSkew)
    ops.foldLeft(df)((d, op) =>
      d.withColumn(s"${valueCol}_roll${windowDays}d_lag${lagDays}_$op", gated(exprs(op))))
  }

  /** Rolling exact quantile at an arbitrary q — generalizes the `median`
    * op of [[rollingStats]] (feature_engineering.py:314-496) to any
    * percentile. Spark's exact `percentile` aggregate and DuckDB's
    * `quantile_cont` share the same interpolating definition (parity pinned
    * by q56's rolling median), so this stays oracle-comparable. Same
    * time-range frame and min_periods gate as [[rollingStats]].
    */
  def rollingQuantile(df: DataFrame, hierarchy: Seq[String], tsCol: String, valueCol: String,
                      q: Double, windowDays: Int, lagDays: Int = 1,
                      minPeriods: Option[Int] = None): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val mp = minPeriods.getOrElse(defaultMinPeriods(windowDays))
    val frame = rollingFrame(rangeW(hierarchy, tsCol), windowDays, lagDays)
    val n = count(col(valueCol)).over(frame)
    val qName = math.round(q * 100)
    df.withColumn(s"${valueCol}_roll${windowDays}d_lag${lagDays}_p$qName",
      when(n >= mp, percentile(col(valueCol), lit(q)).over(frame)).otherwise(lit(null)))
  }

  /** Momentum: lagged value ÷ rolling mean (ref :400-410). Group-correct
    * numerator — the reference's global shift there is a documented leakage
    * bug (SURVEY.md §7.4), so this column is excluded from byte-parity.
    */
  def momentum(df: DataFrame, hierarchy: Seq[String], tsCol: String, valueCol: String,
               windowDays: Int, lagDays: Int = 1): DataFrame = {
    val frame = rollingFrame(rangeW(hierarchy, tsCol), windowDays, lagDays)
    val lagged = lag(col(valueCol), lagDays).over(w(hierarchy, tsCol))
    val m = avg(col(valueCol)).over(frame)
    df.withColumn(s"${valueCol}_momentum${windowDays}d",
      when(m.isNull || m === 0, lit(null)).otherwise(lagged / m))
  }

  /** Rolling-percent: lagged value ÷ rolling sum (ref :412-422). */
  def rollingPercent(df: DataFrame, hierarchy: Seq[String], tsCol: String, valueCol: String,
                     windowDays: Int, lagDays: Int = 1): DataFrame = {
    val frame = rollingFrame(rangeW(hierarchy, tsCol), windowDays, lagDays)
    val lagged = lag(col(valueCol), lagDays).over(w(hierarchy, tsCol))
    val s = sum(col(valueCol)).over(frame)
    df.withColumn(s"${valueCol}_rollpct${windowDays}d",
      when(s.isNull || s === 0, lit(null)).otherwise(lagged / s))
  }

  /** Share of the rolling window beyond a threshold (ref :813-940):
    * rolling mean of the boolean `value <op> threshold`; nulls compare against
    * the threshold as equal (reference fills nulls with the threshold).
    */
  def percentOverThreshold(df: DataFrame, hierarchy: Seq[String], tsCol: String, valueCol: String,
                           threshold: Double, op: String, windowDays: Int, lagDays: Int = 1,
                           minPeriods: Option[Int] = None): DataFrame = {
    val mp = minPeriods.getOrElse(defaultMinPeriods(windowDays))
    val filled = coalesce(col(valueCol), lit(threshold))
    val flag = op match {
      case "gt" => filled > threshold
      case "lt" => filled < threshold
      case "ge" => filled >= threshold
      case "le" => filled <= threshold
      case "eq" => filled === threshold
      case "ne" => filled =!= threshold
    }
    val frame = rollingFrame(rangeW(hierarchy, tsCol), windowDays, lagDays)
    val n = count(col(valueCol)).over(frame)
    df.withColumn(s"${valueCol}_pct_${op}_${threshold}_${windowDays}d",
      when(n >= mp, avg(flag.cast("double")).over(frame)).otherwise(lit(null)))
  }

  /** Days since the group's first (optionally first-positive) observation
    * (ref calc_days_since_release, feature_engineering.py:44-100): rows
    * before the first positive get 0.
    */
  def daysSinceRelease(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                       targetCol: String, skipLeadingZeros: Boolean = true): DataFrame = {
    val grp = Window.partitionBy(hierarchy.map(col): _*)
    val firstTs =
      if (skipLeadingZeros) min(when(col(targetCol) > 0, col(tsCol))).over(grp)
      else min(col(tsCol)).over(grp)
    df.withColumn("days_since_release",
      greatest(coalesce(datediff(col(tsCol), firstTs), lit(0)), lit(0)))
  }

  /** Calendar features (ref feature_engineering.py:103-170), pandas-parity:
    * weekday Mon=0 (pandas `dt.dayofweek`) vs Spark Sun=1; `week` =
    * strftime("%U")+1 (Sunday-started week-of-year, leading days = week 0);
    * 2-digit year; "20M01" month_year; "20Q1" quarter_year.
    */
  def calendarFeatures(df: DataFrame, tsCol: String,
                       features: Seq[String] = Seq("day", "day_of_week", "weekend_flag", "week",
                         "month", "year", "quarter", "month_year", "quarter_year")): DataFrame = {
    val t = col(tsCol)
    val exprs: Map[String, Column] = Map(
      "day" -> dayofmonth(t),
      "day_of_week" -> pmod(dayofweek(t) + 5, lit(7)), // pandas Mon=0..Sun=6
      "weekend_flag" -> (pmod(dayofweek(t) + 5, lit(7)) >= 5).cast("int"),
      // %U = (tm_yday + 7 - tm_wday)/7 (Sunday-started, Jan partial week = 0);
      // tm_yday 0-based, tm_wday Sun=0; the reference adds +1 (:155)
      "week" -> (floor((dayofyear(t) + 6 - (dayofweek(t) - 1)) / 7) + 1).cast("int"),
      "month" -> month(t),
      "year" -> pmod(year(t), lit(100)),
      "quarter" -> quarter(t),
      "month_year" -> concat(format_string("%02d", pmod(year(t), lit(100))), lit("M"),
        format_string("%02d", month(t))),
      "quarter_year" -> concat(format_string("%02d", pmod(year(t), lit(100))), lit("Q"), quarter(t)))
    features.foldLeft(df)((d, f) => d.withColumn(f, exprs(f)))
  }

  /** Fourier seasonality terms (Harvey 1989 / Hyndman §12.1 — the standard
    * way to hand a gradient model smooth periodic features; the reference's
    * calendar features above are the categorical version of the same idea):
    * for harmonics j = 1..k of a period of `period` units,
    *   fourier_sin_j = sin(2π·j·t/period),  fourier_cos_j = cos(...)
    * where t = floor(unix_ts / unitSeconds) — e.g. unitSeconds=86400,
    * period=7 gives the weekly pair(s). A pure projection: no shuffle, no
    * state, codegen'd end to end.
    */
  def fourierTerms(df: DataFrame, tsCol: String, period: Int, k: Int,
                   unitSeconds: Long = 86400L): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(k >= 1 && k <= period / 2,
      s"harmonics k must be in [1, period/2] = [1, ${period / 2}], got $k")
    val t = floor(unix_timestamp(col(tsCol)) / unitSeconds).cast("double")
    (1 to k).foldLeft(df) { (d, j) =>
      val theta = lit(2.0) * lit(math.Pi) * t * j / period
      d.withColumn(s"fourier_sin_$j", sin(theta))
        .withColumn(s"fourier_cos_$j", cos(theta))
    }
  }

  /** Classical additive seasonal decomposition (the moving-average method —
    * statsmodels `seasonal_decompose` semantics for odd periods):
    *   trend_t    = centered m-point moving average (null at the edges)
    *   detrended  = y − trend
    *   s_raw(pos) = mean(detrended) per (key, pos = 0-based index mod m)
    *   seasonal   = s_raw − mean of the m per-position means  (sums to ~0)
    *   remainder  = y − trend − seasonal
    * Input must be a REGULAR per-key series (run [[GapFill]] first); m must
    * be odd (the even-m variant needs the 2×m double average — callers
    * resample instead).
    *
    * Shape: one window shuffle on the keys (trend + index share the sort),
    * then two tiny grouped means (m rows per key) joined back — the joins
    * are on (key, pos) / (key): broadcast-able at any real key count.
    */
  def seasonalDecompose(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                        valCol: String, period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (even periods need the 2x$period MA), got $period")
    val h = period / 2
    val y = col(valCol).cast("double")
    val win = w(hierarchy, tsCol)
    val frame = win.rowsBetween(-h, h)
    val indexed = df
      .withColumn("_pos", pmod(row_number().over(win) - 1, lit(period)))
      .withColumn("trend", when(count(y).over(frame) === period, avg(y).over(frame)))
      .withColumn("_det", y - col("trend"))
    val keys = hierarchy.map(col)
    val sRaw = indexed.groupBy((keys :+ col("_pos")): _*)
      .agg(avg(col("_det")).as("_s_raw"))
    val ctr = sRaw.groupBy(keys: _*).agg(avg(col("_s_raw")).as("_ctr"))
    indexed
      .join(sRaw, hierarchy :+ "_pos")
      .join(ctr, hierarchy)
      .withColumn("seasonal", col("_s_raw") - col("_ctr"))
      .withColumn("remainder", y - col("trend") - col("seasonal"))
      .drop("_pos", "_det", "_s_raw", "_ctr")
  }

  /** Order-INDEPENDENT classical additive decomposition over a SCALED-
    * INTEGER series — the exact-arithmetic twin of [[seasonalDecompose]]
    * for hash-exact cross-engine / cross-run parity. `intCol` is the
    * series as `long` fixed-point at `scale` (cents: scale = 100); the
    * logical value is y = intCol / scale. Emits `y, trend, seasonal,
    * remainder` beside the input columns.
    *
    * Determinism argument — it must cover EVERY aggregate in the chain,
    * not just the head (the r4 q148 lesson):
    *   1. s_p   = sum(intCol) over the centered p-frame — LONG sum: exact
    *      integer arithmetic, associative, order-independent (safe even if
    *      the engine evaluates the frame via a segment tree).
    *   2. trend = s_p / (p·scale) — ONE double division of exact operands:
    *      IEEE-754 round-to-nearest, bit-identical on JVM and DuckDB.
    *   3. det_p = p·intCol − s_p — exact long; this is the detrended value
    *      at scale p·scale (det = y − trend = det_p / (p·scale)).
    *   4. per-phase Σ det_p and count — LONG sum + count: exact and
    *      shuffle-merge-order-independent. (r4's hole was exactly here:
    *      `avg(double)` accumulated non-dyadic fractions in merge order.)
    *      s_raw = Σdet_p / (p·scale·n_phase) — one double division; the
    *      long→double cast of an exact |Σ| < 2^53 sum is lossless.
    *   5. ctr = LEFT FOLD of the per-phase means in ascending-phase order
    *      (sort_array over unique `_pos` + `aggregate` HOF — a fixed
    *      association ((…(s₀+s₁)+…)+s_{p−1}), NOT a grouped double agg),
    *      divided by the phase count.
    *   6. seasonal = s_raw − ctr; remainder = (y − trend) − seasonal —
    *      per-row fixed-arity expression trees over deterministic operands.
    * Every shuffle-order-sensitive reduction is over longs; every double
    * op is a fixed expression tree — replayable verbatim in a DuckDB twin
    * (same divisions, same fold association) for exact-repr hash parity.
    *
    * Bound for step 4's losslessness: |Σ det_p| ≤ p·max|intCol|·n_phase;
    * callers keep p·scale·Σ|y| below 2^53 (cents at p=7 over ~10^3-row
    * series with |y| ≤ 10^6: ~10^12 — 3 orders of margin).
    *
    * API divergence from [[seasonalDecompose]] (documented, r6): rows in a
    * (key, phase) with no full-window occurrence — and whole keys whose
    * series is shorter than period+1 — are DROPPED (the s_raw filter +
    * inner join), whereas the generic variant keeps them with a null
    * seasonal. The oracle twins replay the drop, so parity holds; callers
    * needing the null-preserving contract use [[seasonalDecompose]].
    */
  def seasonalDecomposeExact(df: DataFrame, hierarchy: Seq[String],
                             tsCol: String, intCol: String, period: Int,
                             scale: Long = 100L): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (even periods need the 2x$period MA), got $period")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val h = period / 2
    val c = col(intCol).cast("long")
    val den = lit((period * scale).toDouble)
    val win = w(hierarchy, tsCol)
    val frame = win.rowsBetween(-h, h)
    val indexed = df
      .withColumn("_pos", pmod(row_number().over(win) - 1, lit(period)))
      .withColumn("_sp", when(count(c).over(frame) === period, sum(c).over(frame)))
      .withColumn("y", c / lit(scale.toDouble))
      .withColumn("trend", col("_sp") / den)
      .withColumn("_detp", lit(period.toLong) * c - col("_sp"))
    val keys = hierarchy.map(col)
    val sRaw = indexed.groupBy((keys :+ col("_pos")): _*)
      .agg((sum(col("_detp")).cast("double") /
        (den * count(col("_detp")))).as("_s_raw"))
      .filter(col("_s_raw").isNotNull)
    val ctr = sRaw.groupBy(keys: _*)
      .agg((aggregate(
          transform(array_sort(collect_list(struct(col("_pos"), col("_s_raw")))),
            x => x.getField("_s_raw")),
          lit(0.0), (acc, v) => acc + v) /
        count(lit(1)).cast("double")).as("_ctr"))
    indexed
      .join(sRaw, hierarchy :+ "_pos")
      .join(ctr, hierarchy)
      .withColumn("seasonal", col("_s_raw") - col("_ctr"))
      .withColumn("remainder", col("y") - col("trend") - col("seasonal"))
      .drop("_pos", "_sp", "_detp", "_s_raw", "_ctr")
  }

  /** Periodogram at CANDIDATE periods — "which seasonality does this series
    * have": for each candidate period p, the spectral power of the
    * mean-centered series at frequency 1/p,
    *   power(p) = (Σ z_t·cos(2πt/p))² + (Σ z_t·sin(2πt/p))²,   t = 0,1,…
    * (the Schuster periodogram / single-bin Goertzel evaluated by direct
    * sums — no FFT needed for a handful of candidates). Feeding the argmax
    * into [[seasonalDecompose]]/[[fourierTerms]] closes the loop: detect
    * the period, then model it. Row position t comes from a per-key
    * `row_number` so irregular timestamps still get integer phases.
    *
    * Scale: one window pass for t and the centering mean, then ONE grouped
    * aggregation carrying 2·|periods| codegen'd sums — |periods| is small
    * (candidate periods are domain knowledge: 7, 24, 30, 365…), so the
    * shuffle is the series keys only. Output: (keys, period, power, n) —
    * one row per candidate, consumers argmax or threshold.
    */
  def periodogram(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                  valueCol: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      s"candidate periods must all be >= 2, got $periods")
    val keys = hierarchy.map(col)
    val part = Window.partitionBy(keys: _*)
    val ordered = part.orderBy(col(tsCol))
    val v = col(valueCol).cast("double")
    val staged = df
      .withColumn("_t", (row_number().over(ordered) - 1).cast("double"))
      .withColumn("_mu", avg(v).over(part))
      .withColumn("_z", v - col("_mu"))
    val sums = periods.flatMap { p =>
      val ang = col("_t") * lit(2.0 * math.Pi / p)
      Seq(sum(col("_z") * cos(ang)).as(s"_c$p"), sum(col("_z") * sin(ang)).as(s"_s$p"))
    }
    staged.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sums: _*)
      .select((keys :+ col("n") :+ explode(array(periods.map { p =>
        struct(lit(p).as("period"),
          (col(s"_c$p") * col(s"_c$p") + col(s"_s$p") * col(s"_s$p")).as("power"))
      }: _*)).as("e")): _*)
      .select((keys ++ Seq(col("e.period"), col("e.power"), col("n"))): _*)
  }

  /** Trend / seasonal STRENGTH features (Hyndman & Athanasopoulos FPP3
    * §4.3, the tsfeatures definitions) from a classical decomposition:
    *   F_T = max(0, 1 − Var(R) / Var(T + R))
    *   F_S = max(0, 1 − Var(R) / Var(S + R))
    * in [0, 1] — the per-series scalars that let a 10^6-series population
    * be triaged ("strongly seasonal hosts", "trending hosts") with a sort
    * instead of eyeballing decompositions. One row per key; edge rows with
    * null trend (the centered-MA warmup) are excluded, zero-variance
    * denominators yield null (strength undefined, not 1).
    */
  def decompStrength(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                     valueCol: String, period: Int): DataFrame =
    strengthOf(seasonalDecompose(df, hierarchy, tsCol, valueCol, period), hierarchy)

  /** [[decompStrength]] over the order-independent
    * [[seasonalDecomposeExact]] decomposition (scaled-integer input) — the
    * component series entering the variances are bit-deterministic; the
    * `var_pop` reductions themselves remain last-ulp merge-order-sensitive
    * (double sums), bounded by the r6 rounding the entry applies.
    */
  def decompStrengthExact(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                          intCol: String, period: Int,
                          scale: Long = 100L): DataFrame =
    strengthOf(
      seasonalDecomposeExact(df, hierarchy, tsCol, intCol, period, scale),
      hierarchy)

  private def strengthOf(decomposed: DataFrame, hierarchy: Seq[String]): DataFrame = {
    val dec = decomposed.filter(col("trend").isNotNull)
    val r = col("remainder")
    dec.groupBy(hierarchy.map(col): _*)
      .agg(count(lit(1)).as("n"), var_pop(r).as("_vr"),
        var_pop(col("trend") + r).as("_vtr"),
        var_pop(col("seasonal") + r).as("_vsr"))
      .withColumn("trend_strength",
        when(col("_vtr") > 0, greatest(lit(0.0), lit(1.0) - col("_vr") / col("_vtr"))))
      .withColumn("seasonal_strength",
        when(col("_vsr") > 0, greatest(lit(0.0), lit(1.0) - col("_vr") / col("_vsr"))))
      .drop("_vr", "_vtr", "_vsr")
  }

  /** Rolling Pearson correlation of two measures over the trailing `win`
    * rows per key (pandas `rolling(w).corr` shape): null until the window
    * is full or when either measure is constant in the window (the builtin
    * `corr` divides by zero there under ANSI mode — window aggregates
    * evaluate for every frame, so a `when` guard cannot save it). Computed
    * from the five moment sums with the division null-guarded; the oracle
    * replays the identical expression shape. One window shuffle, all
    * codegen'd sums, no UDF.
    */
  def rollingCorr(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                  xCol: String, yCol: String, winRows: Int): DataFrame = {
    require(winRows >= 2, s"winRows must be >= 2, got $winRows")
    val frame = w(hierarchy, tsCol).rowsBetween(-(winRows - 1), 0)
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    val n = lit(winRows.toDouble)
    val sx = sum(x).over(frame); val sy = sum(y).over(frame)
    val sxy = sum(x * y).over(frame)
    val sxx = sum(x * x).over(frame); val syy = sum(y * y).over(frame)
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    df.withColumn("rolling_corr",
      when(count(x).over(frame) === winRows && denx > 0 && deny > 0,
        num / sqrt(denx * deny)))
  }

  /** Forward fill (LOCF) per group (ref transform.py:475-500). */
  def forwardFill(df: DataFrame, hierarchy: Seq[String], tsCol: String, cols: Seq[String]): DataFrame = {
    val win = w(hierarchy, tsCol).rowsBetween(Window.unboundedPreceding, 0)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(win)))
  }

  /** Backward fill per group (ref transform.py:491). */
  def backwardFill(df: DataFrame, hierarchy: Seq[String], tsCol: String, cols: Seq[String]): DataFrame = {
    val win = w(hierarchy, tsCol).rowsBetween(0, Window.unboundedFollowing)
    cols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(win)))
  }

  /** Clamp negatives to a replacement value (ref transform.py:42-61). */
  def correctNegatives(df: DataFrame, cols: Seq[String], replaceWith: Double = 0.0): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c) < 0, lit(replaceWith)).otherwise(col(c))))

  /** Autocorrelation at the given lags, per series: Pearson correlation of
    * the series with its k-step-shifted self — `pandas.Series.autocorr(k)`
    * semantics exactly (pairwise corr over the overlapping rows, NOT the
    * statsmodels full-mean ACF), matching the reference's pandas world where
    * this is the standard seasonality probe before choosing a lag/window set
    * (ref transform.py lag features, :93-134).
    *
    * One window pass stages all shifted columns, one groupBy computes every
    * lag's `corr` (map-side partial moments), then an in-row `stack` unpivots
    * to long form — lags never multiply the shuffled data: the shuffle is
    * one row per (key, lag) pair at the end.
    *
    * @return one row per (keys..., lag, acf); acf is null when a lag has
    *         fewer than 2 overlapping pairs or zero variance
    */
  def acf(df: DataFrame, hierarchy: Seq[String], tsCol: String, valCol: String,
          lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must all be >= 1, got $lags")
    val win = w(hierarchy, tsCol)
    val staged = lags.foldLeft(df)((d, k) =>
      d.withColumn(s"_lag$k", lag(col(valCol), k).over(win)))
    val agged = staged.groupBy(hierarchy.map(col): _*)
      .agg(corr(col(valCol), col(s"_lag${lags.head}")).as(s"_acf${lags.head}"),
        lags.tail.map(k => corr(col(valCol), col(s"_lag$k")).as(s"_acf$k")): _*)
    val stackExpr = s"stack(${lags.size}, " +
      lags.map(k => s"$k, _acf$k").mkString(", ") + ") AS (lag, acf)"
    agged.select(hierarchy.map(col) :+ expr(stackExpr): _*)
  }

  /** Partial autocorrelation at lags 1..maxLag, per series, via the
    * Durbin–Levinson recursion over the [[acf]] values (Box–Jenkins §3.2.36
    * — the AR-order-selection companion to the ACF: pacf(k) is the lag-k
    * coefficient of the best AR(k) fit, i.e. the correlation at lag k with
    * the shorter lags partialled out).
    *
    *   φ₁₁ = ρ₁;  φ_nn = (ρ_n − Σ_{k<n} φ_{n−1,k}·ρ_{n−k})
    *                    / (1 − Σ_{k<n} φ_{n−1,k}·ρ_k);
    *   φ_{n,k} = φ_{n−1,k} − φ_nn·φ_{n−1,n−k}
    *
    * The recursion is BOUNDED by maxLag and unrolled at plan time into
    * fixed-order column expressions over the per-lag corr aggregates — an
    * oracle replays it term for term (each φ is a closed-form rational in
    * ρ₁..ρ_n). One window stage + one groupBy, exactly [[acf]]'s plan;
    * maxLag is capped because the unrolled expression tree is O(maxLag²).
    *
    * @return one row per (keys..., lag, pacf)
    */
  def pacf(df: DataFrame, hierarchy: Seq[String], tsCol: String,
           valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8,
      s"pacf: maxLag must be in [1, 8] (plan-time unrolled), got $maxLag")
    val lags = 1 to maxLag
    val win = w(hierarchy, tsCol)
    val staged = lags.foldLeft(df)((d, k) =>
      d.withColumn(s"_lag$k", lag(col(valCol), k).over(win)))
    val agged = staged.groupBy(hierarchy.map(col): _*)
      .agg(corr(col(valCol), col("_lag1")).as("_rho1"),
        lags.tail.map(k => corr(col(valCol), col(s"_lag$k")).as(s"_rho$k")): _*)
    def rho(k: Int) = col(s"_rho$k")
    // Durbin–Levinson, unrolled: phi(n) = coefficients of the AR(n) fit
    val phi = Array.ofDim[org.apache.spark.sql.Column](maxLag + 1, maxLag + 1)
    phi(1)(1) = rho(1)
    for (n <- 2 to maxLag) {
      val num = rho(n) -
        (1 until n).map(k => phi(n - 1)(k) * rho(n - k)).reduce(_ + _)
      val den = lit(1.0) -
        (1 until n).map(k => phi(n - 1)(k) * rho(k)).reduce(_ + _)
      phi(n)(n) = num / den
      for (k <- 1 until n) phi(n)(k) = phi(n - 1)(k) - phi(n)(n) * phi(n - 1)(n - k)
    }
    val withPhi = lags.foldLeft(agged)((d, n) =>
      d.withColumn(s"_pacf$n", phi(n)(n)))
    val stackExpr = s"stack($maxLag, " +
      lags.map(n => s"$n, _pacf$n").mkString(", ") + ") AS (lag, pacf)"
    withPhi.select(hierarchy.map(col) :+ expr(stackExpr): _*)
  }

  /** Consecutive-streak annotation (gaps-and-islands): for a boolean
    * condition per row, `streak_id` numbers each maximal run of consecutive
    * condition-true rows within a key and `streak_len` is the running
    * length INSIDE the run (condition-false rows carry nulls). The
    * monitoring primitive behind "alert after N consecutive breaches" —
    * [[percentOverThreshold]] measures how often, streaks measure how long
    * in a row.
    *
    * Pure window algebra, one shuffle: the island id is the classic
    * difference of two row_numbers (global minus condition-filtered),
    * materialized as columns because window expressions cannot nest.
    */
  def streaks(df: DataFrame, hierarchy: Seq[String], tsCol: String,
              cond: Column): DataFrame = {
    val win = w(hierarchy, tsCol)
    val staged = df
      .withColumn("_cond", cond)
      .withColumn("_rn", row_number().over(win))
      .withColumn("_crn", count(when(col("_cond"), lit(1))).over(
        w(hierarchy, tsCol).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_island", when(col("_cond"), col("_rn") - col("_crn")))
    val runWin = Window.partitionBy((hierarchy.map(col) :+ col("_island")): _*)
      .orderBy(col(tsCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("streak_len", when(col("_cond"), count(lit(1)).over(runWin)))
      // the island key itself is the id: opaque but deterministic, distinct
      // per run, and ordered with time within a key
      .withColumn("streak_id", when(col("_cond"), col("_island")))
      .drop("_cond", "_rn", "_crn", "_island")
  }

  /** Cross-correlation function at candidate lags — LEAD-LAG detection
    * between two measures of the same keyed series ("requests lead errors
    * by 2 buckets"): ccf(l) = corr(x_t, y_{t−l}), so a peak at POSITIVE l
    * means x must be shifted back to align — y leads; a peak at NEGATIVE l
    * means x leads. The cross-series sibling of [[acf]], built the same
    * way: one window pass stages every shifted y, one grouped aggregation
    * computes all correlations, `stack` unpivots to (keys, lag, ccf).
    * Negative lags use `lead` (shift forward).
    */
  def crossCorrelation(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                       xCol: String, yCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    require(lags.distinct.size == lags.size, s"duplicate lags in $lags")
    val win = w(hierarchy, tsCol)
    def nameOf(k: Int) = if (k < 0) s"_ylag_m${-k}" else s"_ylag_$k"
    val staged = lags.foldLeft(df)((d, k) =>
      d.withColumn(nameOf(k),
        if (k >= 0) lag(col(yCol), k).over(win) else lead(col(yCol), -k).over(win)))
    val agged = staged.groupBy(hierarchy.map(col): _*)
      .agg(corr(col(xCol), col(nameOf(lags.head))).as(s"_c${nameOf(lags.head)}"),
        lags.tail.map(k => corr(col(xCol), col(nameOf(k))).as(s"_c${nameOf(k)}")): _*)
    val stackExpr = s"stack(${lags.size}, " +
      lags.map(k => s"$k, _c${nameOf(k)}").mkString(", ") + ") AS (lag, ccf)"
    agged.select(hierarchy.map(col) :+ expr(stackExpr): _*)
  }

  /** OHLC downsample: open/high/low/close + count per (keys, tumbling
    * bucket) — the classic tick→bar compaction, and the natural extra
    * measure set for a retention tier (first/last are associative, so this
    * promotes tier-to-tier just like min/max).
    *
    * open/close use `min_by`/`max_by` on a (ts, tieCol) struct — fully
    * deterministic under timestamp ties (a real concern at 10^9 events/day)
    * and still a single partial-aggregable shuffle: no window sort, no
    * second pass.
    */
  def ohlc(df: DataFrame, hierarchy: Seq[String], tsCol: String, tieCol: String,
           valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val orderKey = struct(col(tsCol), col(tieCol))
    df.groupBy(hierarchy.map(col) :+
        window(col(tsCol), s"$bucketSeconds seconds").as("_w"): _*)
      .agg(
        min_by(col(valueCol), orderKey).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), orderKey).as("close"),
        count(lit(1)).as("cnt"))
      .withColumn("bucket_start", unix_timestamp(col("_w.start")))
      .drop("_w")
  }

  /** Time-weighted average per (keys, tumbling bucket) over IRREGULARLY
    * sampled points — the step-function (LOCF) integral divided by the
    * covered span:  Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first), µs-exact deltas.
    * A plain `avg` over irregular ticks over-weights bursts; TWAP is the
    * standard correction (and what a 1m tier should store for irregular
    * sources). Buckets with a single point (zero span) fall back to the
    * plain mean.
    *
    * One shuffle: the `lead` window partitions on exactly the final group
    * keys, so the aggregation reuses the window's exchange.
    */
  def timeWeightedAvg(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                      tieCol: String, valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val keyed = df.withColumn("bucket_start",
      unix_timestamp(window(col(tsCol), s"$bucketSeconds seconds").getField("start")))
    val win = Window.partitionBy((hierarchy :+ "bucket_start").map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    // ts may be TIMESTAMP_NTZ (parquet default here); unix_micros needs LTZ
    val tus = unix_micros(col(tsCol).cast("timestamp"))
    keyed
      .withColumn("_dt_us", (lead(tus, 1).over(win) - tus).cast("double"))
      .groupBy((hierarchy :+ "bucket_start").map(col): _*)
      .agg(
        when(sum(col("_dt_us")).isNull || sum(col("_dt_us")) === 0.0,
          avg(col(valueCol)))
          .otherwise(sum(col(valueCol) * col("_dt_us")) / sum(col("_dt_us")))
          .as("twap"),
        count(lit(1)).as("cnt"))
  }

  /** Monotone-counter increase and per-second rate per (keys, tumbling
    * bucket), with counter RESETS handled PromQL-`increase`-style: the
    * per-sample delta is `v − lag(v)` when non-negative, else `v` (the
    * counter restarted from 0 and has reached v since). Byte counters,
    * request counters, and wraparound gauges are the other half of a
    * metrics-tier ingest (the value side of the same 1m tier this engine
    * builds for gauges); storing raw cumulative values and bucketing deltas
    * at read time is wrong the moment a process restarts inside a bucket.
    *
    * The first sample of each series has no predecessor: its delta is null
    * (unknown), matching PromQL's refusal to extrapolate before the first
    * point. One window shuffle on the series keys (`lag` over the full
    * series order, so deltas cross bucket boundaries correctly), then a
    * partial-aggregable groupBy per bucket.
    */
  def counterRate(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                  tieCol: String, counterCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val series = Window.partitionBy(hierarchy.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val v = col(counterCol).cast("double")
    val d = v - lag(v, 1).over(series)
    // null lag (series head) must yield a NULL delta, not fall through to
    // the reset branch: `d >= 0` is null there and when() would take
    // otherwise(v), silently counting the first absolute value as increase.
    // Both window-derived values materialize as columns BEFORE the groupBy —
    // a window expression inside an aggregate is illegal.
    df.withColumn("_delta",
      when(d.isNull, lit(null).cast("double")).when(d >= 0, d).otherwise(v))
      .withColumn("_is_reset", when(d < 0, 1L).otherwise(0L))
      .groupBy(hierarchy.map(col) :+
        window(col(tsCol), s"$bucketSeconds seconds").as("_w"): _*)
      .agg(
        sum(col("_delta")).as("increase"),
        count(col("_delta")).as("n_deltas"),
        sum(col("_is_reset")).as("n_resets"))
      .withColumn("rate", col("increase") / lit(bucketSeconds.toDouble))
      .withColumn("bucket_start", unix_timestamp(col("_w.start")))
      .drop("_w")
  }

  /** Rolling OLS slope of `valueCol` against time (in days) over the
    * trailing `winRows` samples per key — the local linear trend (PromQL
    * `deriv`, pandas `rolling.apply(polyfit)` shape): slope =
    * (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) with x = epoch days. Null until the
    * window is full or when all x in the window coincide. Same moment-sum
    * construction as [[rollingCorr]]: one window shuffle, codegen'd sums,
    * no UDF; the oracle replays the identical expression shape.
    *
    * x is RE-CENTERED on the key's earliest epoch day before the moment
    * sums (a per-key constant shift leaves the OLS slope unchanged):
    * epoch-day magnitudes (~2e4) otherwise eat half the double mantissa in
    * Σx², and catastrophic cancellation in the denominator makes the slope
    * engine-order-dependent. The centering min is materialized as a column
    * first — window expressions cannot nest — and shares the rolling
    * window's exchange (same partition keys).
    */
  def rollingSlope(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                   valueCol: String, winRows: Int): DataFrame = {
    require(winRows >= 2, s"winRows must be >= 2, got $winRows")
    val frame = w(hierarchy, tsCol).rowsBetween(-(winRows - 1), 0)
    val xAbs = unix_micros(col(tsCol).cast("timestamp")).cast("double") / lit(86400e6)
    val centered = df.withColumn("_x0",
      min(xAbs).over(Window.partitionBy(hierarchy.map(col): _*)))
    val x = xAbs - col("_x0")
    val y = col(valueCol).cast("double")
    val n = lit(winRows.toDouble)
    val sx = sum(x).over(frame); val sy = sum(y).over(frame)
    val sxy = sum(x * y).over(frame); val sxx = sum(x * x).over(frame)
    val den = n * sxx - sx * sx
    centered.withColumn("rolling_slope",
      when(count(y).over(frame) === winRows && den > 0,
        (n * sxy - sx * sy) / den))
      .drop("_x0")
  }

  /** Rolling percent-rank of the CURRENT value within its trailing window —
    * "how unusual is now": share of the last `winRows` samples (current
    * included) at or below the current value, in [1/w, 1]. The monitoring
    * gauge behind "p99 of the last hour"-style alerting, and the rank
    * analogue of [[rollingQuantile]] (quantile maps rank→value; this maps
    * value→rank).
    *
    * A frame aggregate cannot compare frame rows against the CURRENT row,
    * so the frame is materialized per row (`collect_list` over the sliding
    * frame — O(w) state, the same cost class as the rolling-quantile sort)
    * and ranked with a codegen'd HOF filter. Null until the window fills;
    * null current values rank null. One window shuffle.
    */
  def rollingPercentRank(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                         valueCol: String, winRows: Int): DataFrame = {
    require(winRows >= 1, s"winRows must be >= 1, got $winRows")
    val frame = w(hierarchy, tsCol).rowsBetween(-(winRows - 1), 0)
    val v = col(valueCol).cast("double")
    df.withColumn("_win", collect_list(v).over(frame))
      .withColumn("rolling_pct_rank",
        when(size(col("_win")) === winRows && v.isNotNull,
          size(filter(col("_win"), x => x <= v)).cast("double") / lit(winRows.toDouble)))
      .drop("_win")
  }

  /** M4 visualization downsample (Jugel et al., VLDB 2014): per (keys,
    * tumbling bucket) keep only the rows that realize the bucket's FIRST,
    * LAST, MIN-value, and MAX-value points — the minimal point set whose
    * line rendering is pixel-identical to the full series at that bucket
    * width. The standard decimation for serving month-wide interactive
    * charts off a 10^12-point store: output is ≤ 4 rows per bucket
    * regardless of raw density, and unlike avg-downsampling it preserves
    * spikes exactly.
    *
    * Selection is deterministic under ties: min/max roles go to the
    * EARLIEST (ts, tie) row among equals. Implemented as whole-frame window
    * aggregates (`min`/`min_by` over the bucket partition) + a filter — one
    * window shuffle, no join back, no second pass. Rows keep all input
    * columns plus `bucket_start` and a `roles` array (a row may fill
    * several roles).
    */
  def m4Downsample(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                   tieCol: String, valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val keyed = df.withColumn("bucket_start",
      unix_timestamp(window(col(tsCol), s"$bucketSeconds seconds").getField("start")))
    val part = Window.partitionBy((hierarchy :+ "bucket_start").map(col): _*)
    val tus = unix_micros(col(tsCol).cast("timestamp"))
    val rowKey = struct(tus.as("t"), col(tieCol).cast("long").as("i"))
    val v = col(valueCol).cast("double")
    val tieBreak = struct(v.as("v"), tus.as("t"), col(tieCol).cast("long").as("i"))
    val tieBreakNeg = struct((-v).as("v"), tus.as("t"), col(tieCol).cast("long").as("i"))
    keyed
      .withColumn("_rk", rowKey)
      .withColumn("_first_k", min(rowKey).over(part))
      .withColumn("_last_k", max(rowKey).over(part))
      .withColumn("_min_k", min_by(rowKey, tieBreak).over(part))
      .withColumn("_max_k", min_by(rowKey, tieBreakNeg).over(part))
      .withColumn("roles", filter(array(
        when(col("_rk") === col("_first_k"), lit("first")),
        when(col("_rk") === col("_last_k"), lit("last")),
        when(col("_rk") === col("_min_k"), lit("min")),
        when(col("_rk") === col("_max_k"), lit("max"))), x => x.isNotNull))
      .filter(size(col("roles")) > 0)
      .drop("_rk", "_first_k", "_last_k", "_min_k", "_max_k")
  }
  /** Theil–Sen robust trend: the MEDIAN of all pairwise slopes
    * (y_j − y_i)/(x_j − x_i), i < j (Theil 1950; Sen 1968) — up to ~29%
    * contaminated points leave the estimate standing where one outlier
    * already wrecks the OLS slope of [[rollingSlope]]. Intercept =
    * median(y − slope·x), the standard companion estimator.
    *
    * x is the epoch time scaled to `unitSeconds` (slope is "per unit") and
    * re-centered per key before differencing for the same mantissa reasons
    * documented on [[rollingSlope]].
    *
    * Cost is the honest O(n²) pairs per key via a self-join — run it on
    * TIER-BUCKETED series (30 daily points → 435 pairs), never raw events;
    * the pair explosion is quadratic in per-key cardinality by definition
    * of the estimator. Medians are exact interpolated percentiles (the
    * [[Rollup]] percentile parity contract).
    * Output: (keys..., ts_slope, ts_intercept, n_pairs).
    */
  def theilSen(df: DataFrame, keyCols: Seq[String], tsCol: String,
               valueCol: String, unitSeconds: Long = 86400L): DataFrame = {
    require(unitSeconds >= 1, s"unitSeconds must be >= 1, got $unitSeconds")
    val keys = keyCols.map(col)
    val xAbs = unix_micros(col(tsCol).cast("timestamp")).cast("double") /
      lit(unitSeconds * 1e6)
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("_x0", min(xAbs).over(Window.partitionBy(keys: _*)))
      .select((keys :+ (xAbs - col("_x0")).as("_x") :+
        col(valueCol).cast("double").as("_y")): _*)
    val a = base.select((keys :+ col("_x").as("_xa") :+ col("_y").as("_ya")): _*)
    val b = base.select((keys :+ col("_x").as("_xb") :+ col("_y").as("_yb")): _*)
    val slopes = a.join(b, keyCols)
      .filter(col("_xb") > col("_xa"))
      .withColumn("_s", (col("_yb") - col("_ya")) / (col("_xb") - col("_xa")))
    val fit = slopes.groupBy(keys: _*)
      .agg(percentile(col("_s"), lit(0.5)).as("ts_slope"),
        count(lit(1)).as("n_pairs"))
    base.join(fit, keyCols)
      .groupBy((keys :+ col("ts_slope") :+ col("n_pairs")): _*)
      .agg(percentile(col("_y") - col("ts_slope") * col("_x"), lit(0.5))
        .as("ts_intercept"))
      .select((keys :+ col("ts_slope") :+ col("ts_intercept") :+ col("n_pairs")): _*)
  }

  /** Mann–Kendall monotone-trend test (Mann 1945; Kendall 1975) — the
    * nonparametric significance companion of [[theilSen]] (Sen's slope is
    * literally the MK-recommended magnitude estimate):
    *   S = Σ_{i<j} sign(x_j − x_i)          (an exact INTEGER cross-engine)
    *   Z = (S − sign(S)) / √(n(n−1)(2n+5)/18)
    * No tie correction (pinned; real-valued tier measures make exact ties
    * vanishingly rare — with heavy ties the variance is slightly
    * overstated, i.e. the test gets conservative). |Z| > 1.96 rejects
    * "no trend" at 5%.
    *
    * Same honest O(n²) self-join cost and tier-bucketed-input contract as
    * [[theilSen]]. Output: (keys..., s, z, n).
    */
  def mannKendall(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
      .select((keys :+ unix_micros(col(tsCol).cast("timestamp")).as("_t") :+
        col(valueCol).cast("double").as("_y")): _*)
    val a = base.select((keys :+ col("_t").as("_ta") :+ col("_y").as("_ya")): _*)
    val b = base.select((keys :+ col("_t").as("_tb") :+ col("_y").as("_yb")): _*)
    val n = base.groupBy(keys: _*).agg(count(lit(1)).as("n"))
    a.join(b, keyCols).filter(col("_tb") > col("_ta"))
      .groupBy(keys: _*)
      .agg(sum(signum(col("_yb") - col("_ya")).cast("long")).as("s"))
      .join(n, keyCols)
      .withColumn("_var",
        col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) / lit(18.0))
      .withColumn("z", when(col("n") >= 2,
        (col("s") - signum(col("s").cast("double"))) / sqrt(col("_var"))))
      .select((keys :+ col("s") :+ col("z") :+ col("n")): _*)
  }

  /** Spearman rank correlation per key (Spearman 1904) — Pearson over
    * AVERAGE ranks, the outlier/monotone-robust sibling of [[rollingCorr]]'s
    * Pearson: invariant under any monotone transform of either measure, so
    * it answers "do these move together" without assuming linearity.
    * Ties get average ranks (the standard convention, and exact here:
    * avg of row_numbers within the tied value group — half-integer
    * rationals, deterministic cross-engine).
    *
    * Two ordered windows per measure (rank + tie-average) sharing the key
    * exchange, then one closed-form moment aggregation.
    * Output: (keys..., spearman_rho, n).
    */
  def spearman(df: DataFrame, keyCols: Seq[String], xCol: String,
               yCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select((keys :+ x.as("_x") :+ y.as("_y")): _*)
    def avgRank(vc: String, out: String)(d: DataFrame): DataFrame = d
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col(vc))).cast("double"))
      .withColumn(out, avg(col("_rn")).over(
        Window.partitionBy((keys :+ col(vc)): _*)))
      .drop("_rn")
    val ranked = avgRank("_y", "_ry")(avgRank("_x", "_rx")(base))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("_rx")); val sy = sum(col("_ry"))
    val sxx = sum(col("_rx") * col("_rx")); val syy = sum(col("_ry") * col("_ry"))
    val sxy = sum(col("_rx") * col("_ry"))
    // null when either measure has zero rank variance (all tied) — the
    // correlation is undefined there, not infinite
    ranked.groupBy(keys: _*)
      .agg(when((n * sxx - sx * sx) * (n * syy - sy * sy) > 0,
        (n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).as("spearman_rho"),
        count(lit(1)).as("n"))
  }

  /** Trapezoidal integral of an irregular series per key, in value·unit
    * units (e.g. degree-days at unitSeconds=86400) — the straight-line
    * sibling of [[timeWeightedAvg]]'s LOCF integral (LOCF holds the last
    * value; the trapezoid interpolates linearly between samples):
    *   ∫ ≈ Σ (vᵢ + vᵢ₊₁)/2 · (tᵢ₊₁ − tᵢ)/unit
    * One lead window + one aggregation, microsecond-exact timestamps.
    * Output: (keys..., integral, n_points).
    */
  def trapezoidIntegral(df: DataFrame, keyCols: Seq[String], tsCol: String,
                        valueCol: String, unitSeconds: Long = 86400L): DataFrame = {
    require(unitSeconds >= 1, s"unitSeconds must be >= 1, got $unitSeconds")
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")
    val t = unix_micros(col(tsCol).cast("timestamp"))
    val w = Window.partitionBy(keys: _*).orderBy(t)
    df.filter(v.isNotNull)
      .withColumn("_nv", lead(v, 1).over(w))
      .withColumn("_dt", (lead(t, 1).over(w) - t).cast("double") /
        lit(unitSeconds * 1e6))
      .groupBy(keys: _*)
      .agg(sum(when(col("_nv").isNotNull,
        (v + col("_nv")) / 2 * col("_dt"))).as("integral"),
        count(lit(1)).as("n_points"))
  }

  /** Rolling regression slope of `yCol` on `xCol` over a trailing row
    * window — [[rollingSlope]] generalized from time-as-regressor to any
    * driver measure ("how many units of y per unit of x lately", the
    * rolling-beta of finance). Same moment-sum construction and full-window
    * gate; null when the window is short or x is degenerate.
    */
  def rollingBeta(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                  xCol: String, yCol: String, winRows: Int): DataFrame = {
    require(winRows >= 2, s"winRows must be >= 2, got $winRows")
    val frame = w(hierarchy, tsCol).rowsBetween(-(winRows - 1), 0)
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    val n = lit(winRows.toDouble)
    val sx = sum(x).over(frame); val sy = sum(y).over(frame)
    val sxy = sum(x * y).over(frame); val sxx = sum(x * x).over(frame)
    val den = n * sxx - sx * sx
    df.withColumn("rolling_beta",
      when(count(when(x.isNotNull && y.isNotNull, lit(1))).over(frame) === winRows
        && den > 0, (n * sxy - sx * sy) / den))
  }

  /** Period-over-period comparison on a DAILY tier: each (hierarchy, date)
    * row gains the value from exactly `periodDays` earlier plus the delta
    * and ratio — the week-over-week / 28-day-over-28-day read every
    * monitoring dashboard issues against the 1d retention tier.
    *
    * NOT `lag(k)`: a missing day would silently shift the comparison to
    * the wrong calendar date. Calendar-exact via a self-equi-join on
    * (hierarchy, date − periodDays) — both sides shuffle once on the same
    * key, and at tier cardinality (hosts × days) the join is tiny relative
    * to raw. Rows whose prior date is absent keep null prev/delta/ratio.
    */
  def periodOverPeriod(daily: DataFrame, hierarchy: Seq[String],
                       dateCol: String, valCol: String,
                       periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val prev = daily.select((hierarchy.map(col) :+
      date_add(col(dateCol), periodDays).as(dateCol) :+
      col(valCol).as("prev_value")): _*)
    daily.join(prev, hierarchy :+ dateCol, "left")
      .withColumn("delta", col(valCol) - col("prev_value"))
      .withColumn("ratio",
        when(col("prev_value") =!= 0, col(valCol).cast("double") / col("prev_value")))
  }

  /** Dominant seasonal period per series: the lag in `lags` whose
    * autocorrelation ([[acf]]) is highest — the automatic period detector
    * that picks the seasonality for Holt-Winters / seasonal decomposition
    * instead of a hand-set constant.
    *
    * Cross-engine determinism: the argmax compares acf ROUNDED to 6 dp
    * with the smaller lag winning ties — raw doubles differ in the last
    * ulp between engines (verify-skill rank-cut rule). One aggregation
    * over the tiny (series × lags) ACF table.
    */
  /** Spectral flatness (Wiener entropy) over the candidate-period
    * Schuster powers of [[periodogram]]:
    *   SFM = exp(mean(ln Pₖ)) / mean(Pₖ)  over the candidates with
    * Pₖ > 0 — the geometric/arithmetic power-ratio in [0, 1]. SFM → 1
    * means energy spread evenly across the candidate set (noise-like —
    * no candidate explains the series); SFM → 0 means energy
    * concentrated in few periods (strongly seasonal). The one-number
    * companion of [[dominantPeriod]]: that names the winning period,
    * this says whether A winner exists at all. Same single-shuffle plan
    * as periodogram plus one tiny per-key reduction over |periods| rows.
    * Output: (keys..., n_periods, flatness).
    */
  def spectralFlatness(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                       valCol: String, periods: Seq[Int]): DataFrame = {
    val p = periodogram(df, hierarchy, tsCol, valCol, periods)
      .filter(col("power") > 0)
    p.groupBy(hierarchy.map(col): _*)
      .agg(count(lit(1)).as("n_periods"),
        (exp(avg(log(col("power")))) / avg(col("power"))).as("flatness"))
  }

  /** Baxter–King band-pass filter (Baxter & King 1999) — the
    * business-cycle extractor: an order-K symmetric moving average whose
    * weights approximate an ideal band-pass keeping only oscillations
    * with period ∈ [pLow, pHigh]:
    *   b_j = (sin(ω₂j) − sin(ω₁j))/(πj), b₀ = (ω₂ − ω₁)/π,
    *   ω₁ = 2π/pHigh, ω₂ = 2π/pLow,
    * demeaned so the weights sum to EXACTLY zero (unit roots and slow
    * trends are annihilated, not just damped). The weights are
    * compile-time Scala constants inlined as literals — the same doubles
    * an oracle can replay — and the filter is one rows-frame window of
    * 2K+1 lag/lead terms (codegen'd, no join). The K boundary points on
    * each side are dropped (the filter is undefined there; emitting
    * shortened averages would alias trend into the band). Output:
    * (tsCol, cycle) for the interior rows.
    */
  def baxterKing(df: DataFrame, tsCol: String, valCol: String,
                 pLow: Int, pHigh: Int, k: Int): DataFrame = {
    require(2 <= pLow && pLow < pHigh, s"need 2 <= pLow < pHigh, got $pLow/$pHigh")
    require(k >= 1, s"k must be >= 1, got $k")
    val b = baxterKingWeights(pLow, pHigh, k)
    val v = col(valCol).cast("double")
    val win = Window.orderBy(col(tsCol))
    val staged = df.filter(v.isNotNull)
      .select(col(tsCol), v.as("_v"))
      .withColumn("_i", row_number().over(win))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
    val terms = lit(b.head) * col("_v") +: 1.to(k).map { j =>
      lit(b(j)) * (lag(col("_v"), j).over(win) + lead(col("_v"), j).over(win))
    }
    staged
      .withColumn("cycle", terms.reduce(_ + _))
      .filter(Bounded.gate(col("_n"), Bounded.DefaultMaxPoints, "baxterKing") &&
        col("_i") > k && col("_i") <= col("_n") - k)
      .select(col(tsCol), col("cycle"))
  }

  /** The literal BK weights for a given (pLow, pHigh, k) — exposed so an
    * independent oracle can replay [[baxterKing]] with the SAME doubles
    * (Double.toString round-trips bit-exactly through SQL parsers).
    */
  def baxterKingWeights(pLow: Int, pHigh: Int, k: Int): Seq[Double] = {
    val w1 = 2.0 * math.Pi / pHigh
    val w2 = 2.0 * math.Pi / pLow
    val raw = 0.to(k).map { j =>
      if (j == 0) (w2 - w1) / math.Pi
      else (math.sin(w2 * j) - math.sin(w1 * j)) / (math.Pi * j)
    }
    val mean = (raw.head + 2.0 * raw.tail.sum) / (2 * k + 1)
    raw.map(_ - mean)
  }

  def dominantPeriod(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                     valCol: String, lags: Seq[Int]): DataFrame = {
    // arithmetic half-away rounding, NOT Spark round() (BigDecimal
    // shortest-repr — diverges from DuckDB's raw-double rounding)
    val a = acf(df, hierarchy, tsCol, valCol, lags)
      .withColumn("_r",
        signum(col("acf")) * floor(abs(col("acf")) * 1e6 + 0.5) / 1e6)
      .filter(col("_r").isNotNull)
    a.groupBy(hierarchy.map(col): _*)
      .agg(max(struct(col("_r").as("r"), (-col("lag")).as("neglag"))).as("_best"))
      .select((hierarchy.map(col) :+
        (-col("_best.neglag")).cast("int").as("period") :+
        col("_best.r").as("acf")): _*)
  }

  /** Time-weighted average over IRREGULARLY sampled series (TimescaleDB
    * `time_weight('LOCF', ...)` semantics): each sample holds its value
    * until the next sample, so the average is
    * `Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)` — the plain `avg()` of an
    * irregular gauge over-weights bursts of dense samples; this doesn't.
    *
    * Returns one row per key: `n_points`, `duration_s`, `twa` (null when
    * the series has a single point / zero duration — there is no interval
    * to weight). Timestamps are compared at exact microsecond precision;
    * `tieCol` makes the ordering of equal-timestamp samples deterministic
    * (a zero-length interval contributes zero weight regardless).
    *
    * Plan: one `lead` window + one aggregate over the SAME keys — Catalyst
    * plans a single sort+exchange, and the aggregate is partial-merge
    * (map-side combined). No join, no collect.
    */
  def timeWeightedAvg(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                      tieCol: String, valCol: String): DataFrame = {
    val keys = hierarchy.map(col)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val win = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val dtS = (lead(us, 1).over(win) - us) / lit(1e6) // seconds, double
    df
      .select((keys :+ us.as("_us") :+ (col(valCol) * dtS).as("_vdt")): _*)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_points"),
        ((max(col("_us")) - min(col("_us"))) / lit(1e6)).as("duration_s"),
        // sum() skips the last point's null _vdt; a zero duration yields
        // null twa via the guarded division
        (sum(col("_vdt")) /
          when(max(col("_us")) > min(col("_us")),
            (max(col("_us")) - min(col("_us"))) / lit(1e6))).as("twa"))
  }

  /** Haar multi-resolution downsample of per-bucket EVENT COUNTS: for each
    * level ℓ = 1..`levels`, the approximation (mean count per base bucket
    * over the 2^ℓ-bucket span, absent buckets counting 0) and the Haar
    * detail coefficient ((left-half − right-half) / 2^ℓ) — the coarse
    * views the tier cascade serves, plus the detail that reconstructs the
    * finer level exactly (approx_ℓ ± detail_ℓ = the two child approxes).
    *
    * EVERYTHING is exact: integer count sums divided by powers of two are
    * dyadic rationals, representable exactly in doubles — no rounding, no
    * order sensitivity, in any engine. (That exactness is WHY the measure
    * is a count; an arbitrary float measure would reintroduce shuffled
    * sums.)
    *
    * Plan: one shuffle to base buckets, then `levels` halving aggregates,
    * each half the size of the last — a binary tier cascade.
    */
  def haarDownsample(df: DataFrame, hierarchy: Seq[String], tsCol: String,
                     epochUs: Long, baseUs: Long, levels: Int): DataFrame = {
    require(levels >= 1 && levels <= 40,
      s"haarDownsample: levels must be in [1,40], got $levels")
    require(baseUs >= 1, s"haarDownsample: baseUs must be >= 1, got $baseUs")
    val keys = hierarchy.map(col)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    // integer `div`, not float `/`: at µs magnitudes (~1.7e15) a double
    // quotient is within 1 ulp of a bucket boundary and can misbucket
    var cur = df
      .filter(us >= lit(epochUs))
      .select((keys :+ (us - lit(epochUs)).as("_d")): _*)
      .withColumn("_b", expr(s"_d div ${baseUs}L")).drop("_d")
      .groupBy((keys :+ col("_b")): _*).agg(count(lit(1)).as("_s"))
    val out = (1 to levels).map { l =>
      val paired = cur
        .withColumn("_parent", expr("_b div 2"))
        .groupBy((keys :+ col("_parent")): _*)
        .agg(sum(col("_s")).as("_s"),
          sum(when(col("_b") % 2 === 0, col("_s")).otherwise(lit(0L))).as("_sl"))
      cur = paired.select((keys :+ col("_parent").as("_b") :+ col("_s")): _*)
      val denom = lit(1L << l)
      paired.select((keys :+ lit(l).as("level") :+ col("_parent").as("idx") :+
        (col("_s") / denom).as("approx") :+
        ((lit(2L) * col("_sl") - col("_s")) / denom).as("detail")): _*)
    }
    out.reduce(_ unionByName _)
  }

  /** Closed-form multivariate OLS fit, `y = b0 + b1·x1 + b2·x2`, per group:
    * one pass of moment sums (the 3×3 Gram matrix + X'y) and a literal
    * Cramer's-rule solve — the normal-equations pattern that scales to any
    * row count because only 10 doubles per group cross the shuffle. The
    * two-regressor case is closed-form-safe to replay in SQL; for general
    * k, aggregate the same Gram matrix and Cholesky-solve the k×k system on
    * the driver (k² scalars per group — the [[graft.operators.Pca]]
    * pattern).
    *
    * Output per group: n, b0/b1/b2 and r2 (1 − SSR/SST, computed from the
    * same moments in a pinned operation order so an oracle can replay it
    * term for term). Degenerate design matrices (det ≈ 0) yield nulls.
    */
  def olsFit(df: DataFrame, groupCols: Seq[String], yCol: String,
             x1Col: String, x2Col: String): DataFrame = {
    val keys = groupCols.map(col)
    val (y, x1, x2) =
      (col(yCol).cast("double"), col(x1Col).cast("double"), col(x2Col).cast("double"))
    val m = df
      .filter(y.isNotNull && x1.isNotNull && x2.isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).cast("double").as("_n"),
        sum(x1).as("_s1"), sum(x2).as("_s2"), sum(y).as("_sy"),
        sum(x1 * x1).as("_s11"), sum(x1 * x2).as("_s12"),
        sum(x2 * x2).as("_s22"),
        sum(x1 * y).as("_s1y"), sum(x2 * y).as("_s2y"),
        sum(y * y).as("_syy"))
    // 3x3 Cramer on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] · b = [sy,s1y,s2y]
    val (n, s1, s2, sy) = (col("_n"), col("_s1"), col("_s2"), col("_sy"))
    val (s11, s12, s22) = (col("_s11"), col("_s12"), col("_s22"))
    val (s1y, s2y, syy) = (col("_s1y"), col("_s2y"), col("_syy"))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val d0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val d1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val d2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val ok = abs(det) > lit(1e-9)
    val (b0, b1, b2) = (d0 / det, d1 / det, d2 / det)
    // SSR from moments: b'X'y with the intercept folded in; SST = syy - sy²/n
    val sst = syy - sy * sy / n
    val ssr = (b0 * sy + b1 * s1y + b2 * s2y) - sy * sy / n
    m.select((keys :+ col("_n").cast("long").as("n") :+
      when(ok, b0).as("b0") :+ when(ok, b1).as("b1") :+ when(ok, b2).as("b2") :+
      when(ok && sst > 0, ssr / sst).as("r2")): _*)
  }

  /** Hurst exponent via the aggregated-variance method (Beran 1994 §4.4):
    * chop the per-key regular series into non-overlapping blocks of m
    * points for each dyadic m, take the variance of the block MEANS, and
    * fit `ln Var(m) = c + (2H − 2)·ln m` by OLS over the (ln m, ln Var)
    * points. H ≈ 0.5 for independent increments, → 1 under long-range
    * dependence — a one-number memory profile of a tier series.
    *
    * Exactness discipline: incomplete tail blocks are DROPPED (a ragged
    * mean would make the estimate depend on series length mod m); the
    * final ln-ln fit folds a bounded per-m pivot in a literal column order,
    * never a shuffled float aggregation, so an oracle replays it exactly.
    * Plan: one shuffle to (key, finest block), then |ms| halving re-aggs of
    * an already-tiny frame, then a pivot to one row per key.
    *
    * @param idxCol integer position of each point in its series (regular
    *               grid — run on a gap-filled tier series)
    * @param ms     dyadic block sizes, each dividing the next (e.g. 1,2,4,8)
    */
  def hurst(df: DataFrame, groupCols: Seq[String], idxCol: String,
            valCol: String, ms: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(ms.length >= 2 && ms.head >= 1 && ms == ms.sorted && ms.distinct == ms,
      s"hurst: ms must be >= 2 distinct ascending block sizes, got $ms")
    require(ms.sliding(2).forall { case Seq(a, b) => b % a == 0 },
      s"hurst: each block size must divide the next (halving re-agg), got $ms")
    val keys = groupCols.map(col)
    // blocks of the smallest m once from the raw series, then re-agg up
    var cur = df
      .select((keys :+ expr(s"$idxCol div ${ms.head}").as("_b") :+
        col(valCol).cast("double").as("_v") :+ lit(1L).as("_c")): _*)
      .groupBy((keys :+ col("_b")): _*)
      .agg(sum(col("_v")).as("_v"), sum(col("_c")).as("_c"))
    val perM = ms.zipWithIndex.map { case (mSize, i) =>
      if (i > 0) {
        val factor = mSize / ms(i - 1)
        cur = cur.withColumn("_p", expr(s"_b div $factor")).drop("_b")
          .groupBy((keys :+ col("_p").as("_b")): _*)
          .agg(sum(col("_v")).as("_v"), sum(col("_c")).as("_c"))
      }
      val mean = col("_v") / col("_c")
      cur.filter(col("_c") === mSize.toLong) // whole blocks only
        .groupBy(keys: _*)
        .agg(count(lit(1)).cast("double").as(s"_k$i"),
          sum(mean).as(s"_s$i"), sum(mean * mean).as(s"_ss$i"))
    }
    val joined = perM.reduce((a, b) => a.join(b, groupCols))
    // sample variance per m, then the 2-D OLS slope over (ln m, ln var) in
    // literal order; keys with any degenerate variance (k<2 or var<=0) null out
    val lnM = ms.map(mSize => math.log(mSize.toDouble))
    val lnV = ms.indices.map { i =>
      val (k, s, ss) = (col(s"_k$i"), col(s"_s$i"), col(s"_ss$i"))
      log((ss - s * s / k) / (k - 1))
    }
    val valid = ms.indices.map { i =>
      val (k, s, ss) = (col(s"_k$i"), col(s"_s$i"), col(s"_ss$i"))
      k >= 2 && (ss - s * s / k) > 0
    }.reduce(_ && _)
    val p = ms.length.toDouble
    val sx = lit(lnM.sum)
    val sxx = lit(lnM.map(x => x * x).sum)
    val sy = lnV.foldLeft(lit(0.0))(_ + _)
    val sxy = ms.indices.map(i => lit(lnM(i)) * lnV(i)).foldLeft(lit(0.0))(_ + _)
    val slope = (sxy - sx * sy / p) / (sxx - sx * sx / p)
    joined.select((keys :+ col("_k0").cast("long").as("n_blocks") :+
      when(valid, slope).as("slope") :+
      when(valid, lit(1.0) + slope / 2).as("hurst")): _*)
  }

  /** Multi-seasonal strength per key via sequential mean-profile removal
    * (the MSTL idea — Bandara et al. 2021 — restricted to two calendar
    * components, profile means instead of LOESS so every step is a
    * grouped aggregate the oracle replays exactly):
    *   r₁ = v − mean over (key, hour-of-day);  r₂ = r₁ − mean over
    *   (key, day-of-week);
    *   strength_hod = max(0, 1 − Var(r₁)/Var(v)),
    *   strength_dow = max(0, 1 − Var(r₂)/Var(r₁))
    * — how much variance each calendar cycle explains, the multi-period
    * generalization of [[seasonalDecompose]]'s single-period strength.
    * Two profile joins (bounded 24- and 7-row profiles per key, broadcast)
    * + one six-moment aggregate; population variances.
    * Output: (keys..., n, strength_hod, strength_dow).
    */
  def multiSeasonalStrength(df: DataFrame, keyCols: Seq[String],
                            tsCol: String, valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val v = col(valCol).cast("double")
    val t = col(tsCol).cast("timestamp")
    val base = df.filter(v.isNotNull)
      .withColumn("_hod", hour(t))
      .withColumn("_dow", dayofweek(t))
      .withColumn("_v", v)
    val hodProf = base.groupBy((keys :+ col("_hod")): _*)
      .agg(avg(col("_v")).as("_mh"))
    val r1 = base.join(broadcast(hodProf), keyCols :+ "_hod")
      .withColumn("_r1", col("_v") - col("_mh"))
    val dowProf = r1.groupBy((keys :+ col("_dow")): _*)
      .agg(avg(col("_r1")).as("_md"))
    val r2 = r1.join(broadcast(dowProf), keyCols :+ "_dow")
      .withColumn("_r2", col("_r1") - col("_md"))
    r2.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        avg(col("_v")).as("_m0"), avg(col("_v") * col("_v")).as("_q0"),
        avg(col("_r1")).as("_m1"), avg(col("_r1") * col("_r1")).as("_q1"),
        avg(col("_r2")).as("_m2"), avg(col("_r2") * col("_r2")).as("_q2"))
      .withColumn("_v0", col("_q0") - col("_m0") * col("_m0"))
      .withColumn("_v1", col("_q1") - col("_m1") * col("_m1"))
      .withColumn("_v2", col("_q2") - col("_m2") * col("_m2"))
      .withColumn("strength_hod", when(col("_v0") > 0,
        greatest(lit(0.0), lit(1.0) - col("_v1") / col("_v0"))))
      .withColumn("strength_dow", when(col("_v1") > 0,
        greatest(lit(0.0), lit(1.0) - col("_v2") / col("_v1"))))
      .select((keys :+ col("n") :+ col("strength_hod") :+
        col("strength_dow")): _*)
  }
}
