package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) — the
  * standard way to merge rankings from incomparable retrieval systems
  * (BM25 scores and cosine similarities live on different scales; ranks
  * don't):
  *   RRF(d) = Σ_systems 1 / (k + rank_s(d))
  * with the paper's k=60 damping. A document missing from one system simply
  * contributes nothing for it — fusion runs over the union of candidate
  * lists, which is how hybrid (lexical + dense) search composes
  * [[TextAnalysis.bm25]] with [[Similarity.bruteForceTopK]]/`bucketedTopK`.
  *
  * Scale shape: inputs are top-N candidate LISTS (already cut by their
  * systems), so the union is N·|systems| rows per query — the groupBy is a
  * small shuffle and the final rank window partitions by the query keys.
  * With no query keys (single-query fusion) the window is global: bounded
  * by the candidate-list length, same documented bound as the ordinal
  * dictionary in `Encoding`.
  */
object Fusion {

  /** Fuse ranked candidate lists. Each input frame must carry
    * `queryCols ++ idCols ++ rankCol` (rank 1 = best within its system and
    * query). Output: (queryCols..., idCols..., rrf_score, n_systems,
    * fused_rank).
    */
  def rrf(systems: Seq[DataFrame], queryCols: Seq[String], idCols: Seq[String],
          rankCol: String, kRrf: Int = 60): DataFrame = {
    require(systems.nonEmpty, "rrf needs at least one ranking")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    require(idCols.nonEmpty, "rrf needs id columns")
    val keep = (queryCols ++ idCols :+ rankCol).map(col)
    val tagged = systems.map(_.select(keep: _*)).reduce(_.unionByName(_))
    val keys = (queryCols ++ idCols).map(col)
    val fused = tagged
      .groupBy(keys: _*)
      .agg(sum(lit(1.0) / (lit(kRrf) + col(rankCol))).as("rrf_score"),
        count(lit(1)).as("n_systems"))
    val w = Window.partitionBy(queryCols.map(col): _*)
      .orderBy((col("rrf_score").desc +: idCols.map(col)): _*)
    fused.withColumn("fused_rank", row_number().over(w))
  }
}
