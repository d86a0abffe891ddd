package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for the dedup / similarity / text
  * analysis operators.
  *
  * Everything is derived from standard MD5 so the DuckDB oracle can compute
  * the *identical* value in ANSI-ish SQL:
  *   Spark : `conv(substring(md5(s), 1, 15), 16, 10)::long`
  *   DuckDB: `('0x' || substr(md5(s), 1, 15))::BIGINT`
  * 15 hex digits = 60 bits — always non-negative in a signed 64-bit long, so
  * min/ordering semantics agree on both engines.
  *
  * This is deliberately NOT `xxhash64`/`hash` (Spark-private algorithms) —
  * parity with an independent implementation is the point. MD5 through
  * whole-stage codegen is plenty fast for shingle-level hashing; for
  * hash-partitioning-only uses (no oracle) prefer `xxhash64`.
  */
object Hashing {

  /** 60-bit non-negative hash of a string column. */
  def md5Long(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant: k independent hash functions h_i(x) = md5Long(i:x) —
    * the MinHash permutation family. Seeding by prefix (not arithmetic on one
    * hash) keeps every function full-strength and overflow-free in SQL.
    */
  def md5LongSeeded(seed: Int, s: Column): Column =
    md5Long(concat(lit(s"$seed:"), s))

  /** Words of a text: split on whitespace runs, empties dropped. The token
    * rule is the parity contract — the oracle uses
    * `list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '')`.
    */
  def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** Word n-gram shingles: `concat_ws(" ", w_i .. w_{i+n-1})` for every start
    * position. Returns an empty array when the text has fewer than n words.
    *
    * PERFORMANCE: pass an already-materialized words *attribute* (a column
    * produced by a previous projection), not an inline `words(text)`
    * expression — Catalyst does not CSE lambda-internal subtrees, so an
    * inline expression would re-split the text for every `element_at` call
    * (O(words²) per row). [[wordShinglesOf]] takes the staged array;
    * this overload stages nothing and is for tests/small data.
    */
  def wordShingles(text: Column, n: Int): Column = wordShinglesOf(words(text), n)

  /** Shingles from a words array column.
    *
    * LAMBDA-SHIELDED against CollapseProject: staging `ws` with
    * `withColumn` is NOT enough — adjacent Projects collapse and the
    * alias inlines into every `element_at`, so a computed `ws` (the
    * usual `words(text)`) would re-split the text for EVERY element
    * reference (O(words²) splits per row; measured 8× on the q214
    * containment plan at sf0.1: 37 s → 4.5 s). Wrapping the array in
    * `array(ws)` references it exactly ONCE; inside the outer transform
    * the lambda VARIABLE `a` carries the materialized array, and lambda
    * variables are evaluation results — nothing to inline.
    */
  def wordShinglesOf(ws: Column, n: Int): Column =
    flatten(transform(array(ws), a =>
      when(size(a) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(a) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(a, i + j)): _*)))))

  /** Character n-gram shingles over the raw text (spaces included) —
    * the language-ID feature space.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

}
