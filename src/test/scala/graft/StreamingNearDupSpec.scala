package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.Hashing._
import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Stream-vs-corpus near-dup parity: the streamed flag set (doc, corpus,
  * jaccard) must equal a batch replay of the identical sign→band→candidate→
  * verify pipeline on the same corpus + arrivals, across micro-batch
  * splits — and every flagged pair must be a true above-threshold pair
  * (verification is exact, so LSH recall only affects WHICH pairs are
  * candidates, identically on both sides).
  */
class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  private def t(sec: Long): Timestamp = new Timestamp((1704067200L + sec) * 1000L)
  private val pool = (0 until 40).map(i => s"w$i")

  private def text(rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)(pool(rnd.nextInt(pool.length))).mkString(" ")

  test("streamed near-dup flags == batch replay; flags are true positives") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7L)
    val corpusRows = (0L until 30L).map(i => (i, text(rnd, 14)))
    val corpus = corpusRows.toDF("corpus_id", "text")
    val index = StreamingNearDup.indexCorpus(corpus, "text", "corpus_id",
      k = 8, bands = 4, shingleN = 3)

    // arrivals: exact copies, one-word mutations, and unrelated docs
    val arrivals = (0 until 24).map { j =>
      val id = 1000L + j
      val body = j % 3 match {
        case 0 => corpusRows(j % corpusRows.size)._2                  // exact copy
        case 1 =>
          val ws = corpusRows((j * 7) % corpusRows.size)._2.split(" ")
          ws.updated(ws.length / 2, "mut").mkString(" ")              // near-dup
        case _ => Seq.fill(14)("z" + rnd.nextInt(30)).mkString(" ")   // unrelated
      }
      (id, t(j * 10L), body)
    }

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingNearDup.flagAgainst(
        mem.toDS().toDF("doc_id", "ts", "text"), index,
        "text", "doc_id", "ts", threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      arrivals.grouped(9).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("neardup_stream")
      .select("doc_id", "corpus_id", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // batch replay of the identical pipeline on the same arrivals
    val arrDf = arrivals.toDF("doc_id", "ts", "text")
      .filter(size(words(col("text"))) >= 3)
    val sigs = Dedup.minhashSignature(arrDf, "text", 8, 3)
      .withColumn("_sh", array_distinct(wordShinglesOf(words(col("text")), 3)))
    val banded = Dedup.lshBuckets(sigs, 8, 4)
      .select(col("doc_id"), col("_sh"), col("band"), col("bucket"))
    val inter = size(array_intersect(col("_sh"), col("_corpus_sh"))).cast("double")
    val uni = (size(col("_sh")) + size(col("_corpus_sh"))).cast("double") - inter
    val batch = banded
      .join(index.buckets, Seq("band", "bucket"))
      .join(index.shingles, "corpus_id")
      .withColumn("jaccard", when(uni > 0, inter / uni).otherwise(lit(0.0)))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id", "corpus_id", "jaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (k, j) => assert(approxEq(streamed(k), j, 1e-12)) }
    // the generator must produce real work on both sides of the threshold
    assert(batch.nonEmpty, "no pairs flagged — generator degenerate")
    val exactCopies = streamed.filter { case (_, j) => j >= 0.999 }
    assert(exactCopies.nonEmpty, "exact copies must flag at jaccard 1.0")
    assert(streamed.values.exists(j => j < 0.999 && j >= 0.5),
      "near-dup mutations must flag strictly below 1.0")
    // true-positive check against brute-force exact Jaccard for flagged docs
    streamed.foreach { case ((d, c), j) =>
      val ds = arrivals.find(_._1 == d).get._3.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val cs = corpusRows.find(_._1 == c).get._2.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val bj = ds.intersect(cs).size.toDouble / ds.union(cs).size.toDouble
      assert(approxEq(bj, j, 1e-12), s"flagged ($d,$c) jaccard $j != brute $bj")
      assert(bj >= 0.5)
    }
  }
}
