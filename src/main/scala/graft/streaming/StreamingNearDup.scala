package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing._
import graft.operators.Dedup

/** Streaming near-duplicate flagging against a STATIC indexed corpus — the
  * ingest-time twin of the batch MinHash+LSH pipeline
  * ([[graft.operators.Dedup.lshNearDupPairs]]): each arriving document is
  * signed, banded, candidate-matched by stream-static equi-join on the
  * corpus's (band, bucket) table, and verified with EXACT shingle Jaccard
  * against only the candidate corpus docs — the decision a crawl frontier
  * needs ("is this page a near-copy of anything already kept?") without
  * waiting for the next batch dedup sweep.
  *
  * Scale shape: the stream side is pure projection (words → shingles → one
  * native MinHashSig pass) plus an explode of `bands` literal band ids; the
  * corpus index is a NARROW static table (id, band, bucket — ~24 B/row)
  * that Spark broadcasts or shuffle-joins per micro-batch exactly like any
  * stream-static join, and the shingle re-attach for verification touches
  * only candidate corpus ids. No stream-stream join, no unbounded state:
  * the only stateful operator is `dropDuplicatesWithinWatermark` over
  * (doc, corpus) pairs, whose duplicates can only arise from multiple
  * shared bands WITHIN one document's arrival — so the watermark bound is
  * exact, not approximate (same contract as [[StreamingDedup]]).
  *
  * The signature/band/bucket hashing is the SAME code as the batch
  * operator, so stream-vs-batch candidate parity is structural;
  * StreamingNearDupSpec asserts flagged-pair equality with a batch replay
  * on the same corpus + arrivals.
  */
object StreamingNearDup {

  /** Static corpus index: `buckets` (idCol, band, bucket) for candidate
    * generation + `shingles` (idCol, _corpus_sh) for exact verification.
    * Build once batch-side; both frames are plain static DataFrames (write
    * them to the tier store and `spark.read` them back in production).
    */
  final case class CorpusIndex(buckets: DataFrame, shingles: DataFrame,
                               idCol: String, k: Int, bands: Int, shingleN: Int)

  def indexCorpus(corpus: DataFrame, textCol: String, idCol: String,
                  k: Int = 8, bands: Int = 4, shingleN: Int = 3): CorpusIndex = {
    val base = corpus.select(col(idCol), col(textCol))
      .filter(size(words(col(textCol))) >= shingleN)
    val sigs = Dedup.minhashSignature(base, textCol, k, shingleN)
    val buckets = Dedup.lshBuckets(sigs, k, bands)
      .select(col(idCol), col("band"), col("bucket"))
    val shingles = base
      .select(col(idCol),
        array_distinct(wordShinglesOf(words(col(textCol)), shingleN))
          .as("_corpus_sh"))
    CorpusIndex(buckets, shingles, idCol, k, bands, shingleN)
  }

  /** Flag streamed documents whose exact shingle Jaccard against any
    * corpus candidate reaches `threshold`. `docs` must be a streaming
    * DataFrame with (`docIdCol`, `tsCol`, `textCol`); output rows are
    * (docIdCol, tsCol, <corpus idCol>, jaccard), one per flagged
    * (document, corpus-doc) pair, de-duplicated across that document's
    * shared bands within `watermark`.
    */
  def flagAgainst(docs: DataFrame, index: CorpusIndex, textCol: String,
                  docIdCol: String, tsCol: String, threshold: Double,
                  watermark: String = "10 minutes"): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val staged = docs
      .select(col(docIdCol), col(tsCol), col(textCol))
      .filter(size(words(col(textCol))) >= index.shingleN)
    val sigs = Dedup.minhashSignature(staged, textCol, index.k, index.shingleN)
      .withColumn("_sh",
        array_distinct(wordShinglesOf(words(col(textCol)), index.shingleN)))
    val banded = Dedup.lshBuckets(sigs, index.k, index.bands)
      .select(col(docIdCol), col(tsCol), col("_sh"), col("band"), col("bucket"))
    val cands = banded
      .join(index.buckets, Seq("band", "bucket"))
      .join(index.shingles, index.idCol)
    val inter = size(array_intersect(col("_sh"), col("_corpus_sh"))).cast("double")
    val uni = (size(col("_sh")) + size(col("_corpus_sh"))).cast("double") - inter
    cands
      .withColumn("jaccard", when(uni > 0, inter / uni).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col(docIdCol), col(tsCol), col(index.idCol), col("jaccard"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(docIdCol, index.idCol)
  }
}
