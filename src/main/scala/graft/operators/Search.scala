package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing.words

/** Inverted-index construction and positional phrase search — the retrieval
  * primitives a web corpus needs beside scoring (TF-IDF/BM25 live in
  * [[TextAnalysis]]; reciprocal-rank fusion in [[Fusion]]).
  *
  * Not in the reference (no text retrieval there); this is the web-text
  * extension. The token rule is the oracle parity contract
  * ([[graft.functions.Hashing.words]]).
  *
  * Scale design: `posexplode` of a staged words array is one narrow pass
  * (no re-split per position — the array is a real column, see the
  * Catalyst-CSE note on [[graft.functions.Hashing.wordShinglesOf]]); the
  * only shuffle is the groupBy on the term (or (doc, term)) key. Postings
  * are never collect()ed — term stats stay distributed, and phrase search
  * is an equi-join on (doc, position+1), i.e. co-partitioned after one
  * shuffle on the doc id. A df cap (`maxDf`) drops stop-terms BEFORE the
  * phrase join, the same guard [[Dedup.ngramJaccardPairs]] uses against
  * hot-shingle skew.
  */
object Search {

  /** Positional postings: one row per (term, doc, position), position
    * 0-based in token order. The raw exploded layout every retrieval op
    * downstream starts from.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_ws", words(col(textCol)))
      .select(col(idCol).as("doc"), posexplode(col("_ws")).as(Seq("pos", "term")))
      .select(col("term"), col("doc"), col("pos"))

  /** Term-level index statistics: document frequency `df`, collection
    * frequency `cf` (total occurrences), and the single best document for
    * the term (highest term frequency, ties → lowest doc id) — the head of
    * the impact-ordered postings list a real index would store.
    *
    * One narrow explode + two map-side-combined aggregations (doc-term,
    * then term); `minDf` prunes hapax noise, `maxDf` prunes stop-terms.
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String,
                minDf: Long = 1L, maxDf: Option[Long] = None): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val perDoc = postings(docs, idCol, textCol)
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))
    val stats = perDoc
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        // impact head: max under the lexicographic (tf desc, doc asc) order,
        // packed so one max() aggregate carries both fields — no window.
        max(struct(col("tf"), (-col("doc")).as("negdoc"))).as("_top"))
      .select(col("term"), col("df"), col("cf"),
        (-col("_top.negdoc")).as("top_doc"), col("_top.tf").as("top_tf"))
      .filter(col("df") >= minDf)
    maxDf.fold(stats)(tau => stats.filter(col("df") <= tau))
  }

  /** Exact phrase search via positional adjacency: documents containing the
    * consecutive token sequence `phrase` (2+ words), with the match count
    * and the first match position.
    *
    * The classic postings-intersection plan: the first word's postings are
    * equi-joined to each subsequent word's on (doc, pos + offset) — after
    * one shuffle on the doc id every join is co-partitioned. Cost is
    * bounded by the RAREST word's postings once Catalyst reorders; at web
    * scale pair this with a `maxDf` pre-filter from [[termStats]] so a
    * stop-word in the phrase cannot quadratically blow the first join.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 words, got $phrase")
    val post = postings(docs, idCol, textCol)
    val first = post.filter(col("term") === phrase.head)
      .select(col("doc"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (wrd, off)) =>
      acc.join(
        post.filter(col("term") === wrd)
          .select(col("doc"), (col("pos") - off).as("pos")),
        Seq("doc", "pos"))
    }
    matches.groupBy("doc")
      .agg(count(lit(1)).as("n_matches"), min("pos").as("first_pos"))
  }
}
