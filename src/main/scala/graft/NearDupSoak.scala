package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing._
import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Streaming near-dup soak: the end-to-end leg the unit spec doesn't reach
  * (~100k-doc corpus index, ~10k streamed arrivals through a real
  * file-source micro-batch stream), asserting flagged-pair PARITY with a
  * batch replay of the identical sign→band→candidate→verify pipeline at
  * soak scale, plus sustained arrivals/sec (numbers land in BASELINE.md).
  *
  * Corpus/arrival generator: each corpus doc is 40 words drawn from a 20k
  * vocabulary by a per-id seeded RNG (diverse shingle sets — unrelated
  * docs essentially never share a minhash band, so candidate volume is
  * driven by the planted relations, like a real crawl frontier). Arrivals
  * cycle exact-copy / one-word-mutation / unrelated, so both sides of the
  * threshold and the jaccard<1 verify path carry real traffic.
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.NearDupSoak [nCorpus] [nArrivals] [root]"
  */
object NearDupSoak {

  private val VocabSize = 20000
  private val DocWords = 40

  private def genWords(seed: Long): Array[String] = {
    val rnd = new scala.util.Random(seed * 2654435761L + 11)
    Array.fill(DocWords)("w" + rnd.nextInt(VocabSize))
  }

  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(100000L)
    val nArrivals = args.lift(1).map(_.toLong).getOrElse(10000L)
    val root = args.lift(2).getOrElse("/tmp/graft_neardup_soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    // ---- corpus + static LSH index (batch-side, untimed) ----
    val corpus = spark.range(nCorpus)
      .map(i => (i, genWords(i).mkString(" ")))
      .toDF("corpus_id", "text")
      .repartition(64).cache()
    corpus.count()
    val index = StreamingNearDup.indexCorpus(corpus, "text", "corpus_id",
      k = 8, bands = 4, shingleN = 3)
    index.buckets.cache().count()
    index.shingles.cache().count()

    // ---- arrivals staged as time-ordered parquet files ----
    val t0ms = 1704067200000L
    val arrivals = spark.range(nArrivals).map { j =>
      val id = 10000000L + j
      val ts = new Timestamp(t0ms + j * 100L)
      val body = (j % 3) match {
        case 0 => genWords(j % nCorpus).mkString(" ") // exact copy
        case 1 =>
          val ws = genWords((j * 7) % nCorpus)
          ws.updated(ws.length / 2, "mut" + j).mkString(" ") // near-dup
        case _ => genWords(-j - 1).mkString(" ") // unrelated (disjoint seeds)
      }
      (id, ts, body)
    }.toDF("doc_id", "ts", "text")
    val srcDir = s"$root/arrivals"
    arrivals.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    // ---- streamed flagging (timed) ----
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(srcDir)
    val flagged = StreamingNearDup.flagAgainst(stream, index, "text",
      "doc_id", "ts", threshold = 0.5)
    val t0 = System.nanoTime()
    val q = flagged.writeStream.format("memory").queryName("neardup_soak")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9

    val streamedPairs = spark.table("neardup_soak")
      .select(col("doc_id"), col("corpus_id"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // ---- batch replay of the identical pipeline on the same arrivals ----
    val arrDf = spark.read.parquet(srcDir)
      .filter(size(words(col("text"))) >= 3)
    val sigs = Dedup.minhashSignature(arrDf, "text", 8, 3)
      .withColumn("_sh", array_distinct(wordShinglesOf(words(col("text")), 3)))
    val banded = Dedup.lshBuckets(sigs, 8, 4)
      .select(col("doc_id"), col("_sh"), col("band"), col("bucket"))
    val inter = size(array_intersect(col("_sh"), col("_corpus_sh"))).cast("double")
    val uni = (size(col("_sh")) + size(col("_corpus_sh"))).cast("double") - inter
    val batchPairs = banded
      .join(index.buckets, Seq("band", "bucket"))
      .join(index.shingles, "corpus_id")
      .withColumn("jaccard", when(uni > 0, inter / uni).otherwise(lit(0.0)))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_id"), col("corpus_id"), col("jaccard")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val keyParity = streamedPairs.keySet == batchPairs.keySet
    val valParity = keyParity && batchPairs.forall { case (k, j) =>
      math.abs(streamedPairs(k) - j) < 1e-12 }
    val exact = streamedPairs.count { case (_, j) => j >= 0.999 }
    val near = streamedPairs.count { case (_, j) => j < 0.999 && j >= 0.5 }
    println(s"[neardup-soak] {" +
      s""""corpus_docs":$nCorpus,"arrivals":$nArrivals,""" +
      s""""stream_sec":${String.format(java.util.Locale.ROOT, "%.1f",
        Double.box(streamSec))},""" +
      s""""arrivals_per_sec":${(nArrivals / streamSec).toLong},""" +
      s""""flagged_pairs":${streamedPairs.size},""" +
      s""""exact_copies":$exact,"near_dups":$near,""" +
      s""""pair_parity":$keyParity,"jaccard_parity":$valParity}""")
    require(keyParity, "streamed flag set != batch replay (pair parity broken)")
    require(valParity, "streamed jaccard != batch replay")
    require(exact > 0 && near > 0, "generator degenerate: need both pair kinds")
    spark.stop()
  }
}
