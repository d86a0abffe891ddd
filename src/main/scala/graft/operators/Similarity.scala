package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, sign-LSH bucketing as the
  * sublinear scale path, and embedding-cosine near-duplicate detection.
  *
  * Not present in the reference (pure tabular pandas); part of the
  * training-data-pipeline surface this engine adds.
  *
  * Scale design:
  *   - dot products and norms are array higher-order functions
  *     (`zip_with` + `aggregate`) — per-row, codegen'd, no UDF, no explode of
  *     the vector.
  *   - brute-force top-k broadcasts the (small) query set against the
  *     corpus — one pass over the corpus, per-partition partial top-k via a
  *     window over (query, sim) after AQE-coalesced shuffle of only
  *     (query_id, corpus_id, sim) triples, never the vectors.
  *   - the bucketed variant prunes the corpus with a sign-bit LSH key
  *     (hyperplanes = coordinate axes of the leading dims — deterministic and
  *     oracle-replayable): candidates are an equi-join on `bucket`, turning
  *     O(|Q|·|C|) into O(|Q|·|C|/2^bits) expected. An IVF variant would swap
  *     the bucket key for a nearest-centroid id; the plumbing is identical.
  *   - near-dup pairs join on `bucket` too — identical vectors land in the
  *     same bucket by construction, so recall for exact/near-exact dups is 1
  *     for cos >= bucket-stability threshold.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, left-to-right (oracle-identical order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(null).cast("double"))
  }

  /** Sign-bit LSH bucket from the first `bits` dimensions:
    * bit j = 1 iff v[j] >= 0. Deterministic, SQL-replayable; at web scale the
    * hyperplanes would be seeded pseudo-random — the bucket-join plan is the
    * same either way.
    */
  def signBucket(v: Column, bits: Int = 8): Column =
    (0 until bits).map { j =>
      when(element_at(v, j + 1) >= 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact brute-force top-k: for each query row, the k most cosine-similar
    * corpus rows (excluding self-id matches). Queries should be small
    * (broadcast); the corpus streams.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .filter(col("sim").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Bucketed ANN: identical contract to [[bruteForceTopK]] but candidates
    * are restricted to the query's sign-LSH bucket — the sublinear path.
    * Approximate: recall depends on bucket stability (multi-probe would add
    * neighbor buckets via explode over bit-flips).
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .filter(col("sim").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (`id_a < id_b`, cos >= threshold),
    * candidate-pruned by the sign-LSH bucket join.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double = 0.999, bits: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    v.toDF("id_a", "v_a", "bucket")
      .join(v.toDF("id_b", "v_b", "bucket"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
