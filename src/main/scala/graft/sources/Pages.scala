package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed synthetic Common-Crawl-style page table.
  *
  * Schema (per BASELINE.json `input_hint`):
  * `url: string, warc_ts: timestamp, html: binary, text: string, lang: string`.
  *
  * Everything is pure column arithmetic over `spark.range(n)` — no `Random`
  * state, no driver-side loops — so the same `(seed, n)` yields the same rows
  * on any partitioning / cluster size, and generation itself scales linearly
  * with cores (it is embarrassingly parallel and whole-stage-codegen'd).
  *
  * Deliberate data characteristics (mirrors the reference's golden fixture
  * edge cases, /root/reference/forecastframe/testing.py:9-45, translated to
  * the page-table shape):
  *   - Zipf-ish host skew: host id = floor(H * u^3) concentrates traffic on a
  *     few hot hosts → exercises salting + AQE skew handling.
  *   - empty 1-minute buckets (minute slots ≡ 3 mod 7 are never emitted) →
  *     exercises gap-fill.
  *   - empty texts (length 0) and null lang values.
  *   - out-of-order arrival: row id order is uncorrelated with warc_ts.
  */
object Pages {

  /** Fixed epoch: 2024-01-01T00:00:00Z (no Date.now — determinism). */
  val Epoch: Long = 1704067200L

  val Tlds = Seq("com", "org", "net", "io", "dev")
  val Langs = Seq("en", "de", "fr", "es", "zh")

  /** Number of distinct hosts in the pool. */
  val HostPool = 1000

  /** Minutes of simulated crawl time (default: one day). */
  val Minutes = 1440

  /** @param minutes    span of simulated crawl time; > 1440 yields multi-day
    *                    data (exercises day-partitioned layouts / resume)
    * @param partitions  generate directly into this many range partitions
    *                    (0 = default parallelism). Row content depends only on
    *                    `id`, so the partition count never changes the data —
    *                    but generating INTO the target layout beats
    *                    `.repartition(n)` by the full shuffle of the raw
    *                    corpus (~4.5 KB/row of text+html through the sorter;
    *                    at 32M rows that shuffle GC-thrashed a 32 GB heap).
    */
  def synthesize(spark: SparkSession, nRows: Long, seed: Long = 42L,
                 minutes: Int = Minutes, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val h = (salt: Int) => xxhash64(lit(seed), lit(salt), $"id")

    val range = if (partitions > 0) spark.range(0L, nRows, 1L, partitions)
                else spark.range(nRows)
    val base = range
      // uniform in [0,1) from a 64-bit hash
      .withColumn("u", (pmod(h(1), lit(1000000L)).cast("double")) / lit(1000000.0))
      // skewed host id: u^3 concentrates mass near 0 → hot hosts
      .withColumn("host_id", floor(pow($"u", lit(3.0)) * lit(HostPool)).cast("long"))
      .withColumn("domain_id", pmod($"host_id", lit(200L)))
      .withColumn("tld", element_at(typedLit(Tlds), (pmod($"domain_id", lit(5L)) + 1).cast("int")))
      .withColumn("domain", concat(lit("site"), $"domain_id"))
      .withColumn("sub", concat(lit("w"), $"host_id"))
      // minute slot in [0, Minutes); slots ≡ 3 (mod 7) shifted forward → permanently empty buckets
      .withColumn("minute0", pmod(h(2), lit(minutes.toLong)))
      .withColumn("minute", when(pmod($"minute0", lit(7L)) === 3, $"minute0" + 1).otherwise($"minute0"))
      .withColumn("sec", pmod(h(3), lit(60L)))
      .withColumn("warc_ts", timestamp_seconds(lit(Epoch) + $"minute" * 60 + $"sec"))
      // text length: 0..4000 chars, step 10, with empty texts when hash ≡ 0
      .withColumn("tlen", pmod(h(4), lit(401L)) * 10)
      .withColumn("phrase", element_at(
        typedLit(Seq(
          "the quick brown fox jumps over the lazy dog ",
          "pack my box with five dozen liquor jugs ",
          "sphinx of black quartz judge my vow ",
          "how vexingly quick daft zebras jump ",
          "der schnelle braune fuchs springt hoch ",
          "le renard brun rapide saute par dessus ",
          "el zorro marron rapido salta sobre ",
          "quartz glyphs vex bold mime jocks "
        )), (pmod(h(5), lit(8L)) + 1).cast("int")))
      .withColumn("text", substring(repeat($"phrase", 100), lit(1), $"tlen".cast("int")))
      .withColumn("lang_ix", pmod(h(6), lit(6L)))
      .withColumn("lang", when($"lang_ix" === 5, lit(null).cast("string"))
        .otherwise(element_at(typedLit(Langs), ($"lang_ix" + 1).cast("int"))))
      .withColumn("url", concat(lit("https://"), $"sub", lit("."), $"domain", lit("."), $"tld", lit("/p/"), $"id"))
      .withColumn("html", encode(concat(lit("<html><head><title>p"), $"id",
        lit("</title></head><body>"), $"text", lit("</body></html>")), "UTF-8"))

    base.select($"url", $"warc_ts", $"html", $"text", $"lang")
  }

  /** Deterministic text re-extraction from `html` — the inverse of the
    * synthesis rule above. The per-row invariant (BASELINE.json `input_hint`)
    * is byte-identical `extractText(html) == text` for every url.
    */
  def extractText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(decode(html, "UTF-8"), "(?s)<body>(.*)</body>", 1)
}
