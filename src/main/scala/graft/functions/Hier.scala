package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-host hierarchy extraction + skew helpers.
  *
  * Replaces the reference's M5 store/item hierarchy
  * (/root/reference/forecastframe/main.py:31-56, hierarchy columns are just
  * ordered string grouping keys) with the web-page hierarchy
  * `tld ← registered_domain ← host` derived from `url`.
  *
  * The registered-domain rule is deterministic (last two labels of the host)
  * — a public-suffix list is out of scope per SURVEY.md §2.8; the rule is the
  * parity contract, applied identically in oracle SQL.
  */
object Hier {

  /** Full host from url: strips the scheme and everything from the first '/'. */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** Registered domain = last two dot-separated labels of the host. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    // substring_index(h, '.', -2) keeps the last two labels; a one-label host
    // is returned unchanged by substring_index.
    substring_index(h, ".", -2)
  }

  /** Top-level domain = last label of the host. */
  def tld(url: Column): Column = substring_index(host(url), ".", -1)

  /** Stable bucket of the host for physical partitioning (day/host_bucket
    * directory layout — the Iceberg-style partition spec emulated on Parquet,
    * SURVEY.md §4.3).
    */
  def hostBucket(url: Column, buckets: Int = 64): Column =
    pmod(xxhash64(host(url)), lit(buckets.toLong))

  /** Adds the derived hierarchy columns to a page table. */
  def withHierarchy(pages: DataFrame, buckets: Int = 64): DataFrame =
    pages
      .withColumn("host", host(col("url")))
      .withColumn("registered_domain", registeredDomain(col("url")))
      .withColumn("tld", tld(col("url")))
      .withColumn("host_bucket", hostBucket(col("url"), buckets))

  /** Salting for skewed hot keys: adds `salt ∈ [0, s)` derived from a row-level
    * column so the tier-1 aggregate fans a hot host over `s` reducers; the
    * caller re-aggregates without the salt afterwards (associative measures
    * only). See [[graft.operators.Rollup.tier1mSalted]].
    */
  def salt(rowKey: Column, s: Int): Column = pmod(xxhash64(rowKey), lit(s.toLong))
}
