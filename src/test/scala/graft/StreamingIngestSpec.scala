package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Hier
import graft.operators.Rollup
import graft.plans.TierPipeline
import graft.streaming.{StreamingIngest, StreamingRollup}

/** Durable streaming ingestion ([[graft.streaming.StreamingIngest]]): closed
  * buckets land in the tier-store layout exactly once, micro-batch replay is
  * idempotent, and the hot/cold serving view never double-counts a partition.
  */
class StreamingIngestSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    new Timestamp((1704067200L + minute * 60L + sec) * 1000L)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val assoc = Seq("host", "bucket_start", "cnt", "sum_len", "min_len",
    "max_len", "mean_len")

  test("sink lands exactly the closed buckets, batch-parity, partitioned layout") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("ingest_store")
    val cfg = TierPipeline.Config(root)
    val mem = MemoryStream[StreamPage]
    val closed = StreamingRollup.tier1mStream(
      Hier.withHierarchy(mem.toDF()), watermark = "10 minutes")
    val q = StreamingIngest.startTierSink(closed, cfg, tmp("ingest_ckpt"), "runA")
    try {
      val pages = (0 until 20).map { i =>
        StreamPage(s"https://w${i % 2}.site${i % 2}.com/p/$i", ts(i % 5, (i * 7) % 60),
          "x" * (1 + i % 9), Seq("en", "de", "fr")(i % 3))
      }
      pages.grouped(7).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      mem.addData(StreamPage("https://w0.site0.com/p/zz", ts(60), "y", "en"))
      q.processAllAvailable()

      val landed = StreamingIngest.readStreamTier(spark, cfg)
        .select(assoc.map(col): _*).collect().map(_.toSeq).toSet
      val batch = Rollup.tier1m(Hier.withHierarchy(pages.toDF()))
        .select(assoc.map(col): _*).collect().map(_.toSeq).toSet
      assert(landed === batch) // all 0-4m buckets closed and landed, once each

      // physical layout: day= / host_bucket= / batch_id= subdirectories
      val dayDirs = new java.io.File(StreamingIngest.streamTierPath(root)).listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(dayDirs.contains("day=2024-01-01"))
      val hbDirs = new java.io.File(StreamingIngest.streamTierPath(root) + "/day=2024-01-01")
        .listFiles().filter(_.isDirectory)
      assert(hbDirs.nonEmpty && hbDirs.forall(_.getName.startsWith("host_bucket=")))
      assert(hbDirs.head.listFiles().exists(_.getName.startsWith("batch_id=")))

      // lineage audit rows rode along
      val lin = TierPipeline.lineage(spark, root)
        .filter(col("tier") === StreamingIngest.StreamTier &&
          col("status") === "stream-append")
      assert(lin.count() > 0)
      assert(lin.agg(sum(col("page_cnt"))).first().getLong(0) === pages.length.toLong)
    } finally q.stop()
  }

  test("micro-batch replay is idempotent (same batch_id overwrites itself)") {
    val root = tmp("ingest_replay")
    val cfg = TierPipeline.Config(root)
    val pages = Seq(
      StreamPage("https://a.one.com/1", ts(0, 10), "aaaa", "en"),
      StreamPage("https://b.two.com/2", ts(1, 20), "bb", "de"))
    val buckets = Rollup.tier1m(Hier.withHierarchy(pages.toDF()))
      .drop("p50_len", "p95_len", "lang_set", "points_blob")

    // Array-valued columns (point blobs) use reference equality — normalize
    // to Seq so set comparison is structural
    def rows(): Set[Seq[Any]] = StreamingIngest.readStreamTier(spark, cfg)
      .collect().map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }).toSet
    StreamingIngest.ingestBatch(buckets, cfg, "runB", batchId = 7L)
    val once = rows()
    // crash-replay of the SAME micro-batch: same id, same data
    StreamingIngest.ingestBatch(buckets, cfg, "runB", batchId = 7L)
    val twice = rows()
    assert(twice === once)
    // lineage not double-appended either
    val lin = TierPipeline.lineage(spark, root)
      .filter(col("run_id") === "runB#7").collect()
    assert(lin.map(r => (r.getString(1), r.getInt(2))).distinct.length === lin.length)
  }

  test("readHot serves each partition from exactly one layer") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("ingest_hot")
    val cfg = TierPipeline.Config(root, saltBuckets = 1)
    // day 1 = 2024-01-01 (minutes 0-4), day 2 = 2024-01-02 (minutes 1500-1504)
    val day1 = (0 until 10).map { i =>
      StreamPage(s"https://w$i.site${i % 3}.com/p/$i", ts(i % 5, i), "x" * (2 + i), "en")
    }
    val day2 = (0 until 10).map { i =>
      StreamPage(s"https://w$i.site${i % 3}.com/q/$i", ts(1500 + i % 5, i), "y" * (3 + i), "de")
    }

    // hot layer receives BOTH days (stream runs ahead of the batch cascade)
    val mem = MemoryStream[StreamPage]
    val closed = StreamingRollup.tier1mStream(
      Hier.withHierarchy(mem.toDF()), watermark = "10 minutes")
    val q = StreamingIngest.startTierSink(closed, cfg, tmp("hot_ckpt"), "runC")
    try {
      mem.addData(day1: _*); q.processAllAvailable()
      mem.addData(day2: _*); q.processAllAvailable()
      mem.addData(StreamPage("https://w0.site0.com/p/zz", ts(3000), "z", "en"))
      q.processAllAvailable()
    } finally q.stop()

    // cold layer has caught up through day 1 only
    TierPipeline.buildAll(Hier.withHierarchy(day1.toDF()), cfg, "cold-run")

    val served = StreamingIngest.readHot(spark, cfg)
      .select(assoc.map(col): _*).collect().map(_.toSeq).toSet
    val expected = Rollup.tier1m(Hier.withHierarchy((day1 ++ day2).toDF()))
      .select(assoc.map(col): _*).collect().map(_.toSeq).toSet
    assert(served === expected) // no partition dropped, none double-counted

    // hot-layer GC: day-1 stream partitions are superseded by the cold layer
    // — pruning deletes them without changing any served result
    val prunedParts = StreamingIngest.pruneStreamTier(spark, cfg, "gc-run")
    assert(prunedParts.nonEmpty && prunedParts.forall(_._1 == "2024-01-01"))
    val afterPrune = StreamingIngest.readHot(spark, cfg)
      .select(assoc.map(col): _*).collect().map(_.toSeq).toSet
    assert(afterPrune === expected)
    // day-1 dirs are physically gone; day-2 (hot-only) dirs remain
    val streamDays = new java.io.File(StreamingIngest.streamTierPath(root))
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(!streamDays.contains("day=2024-01-01") && streamDays.contains("day=2024-01-02"))
    // idempotent: second pass finds nothing to prune
    assert(StreamingIngest.pruneStreamTier(spark, cfg, "gc-run2").isEmpty)

    // and day-1 rows really came from the cold layer: hot day-1 rows are
    // anti-joined away because batch lineage marks those partitions complete
    val hotOnly = StreamingIngest.readHot(spark, TierPipeline.Config(tmp("empty_cold")))
    assert(hotOnly.collect().isEmpty) // empty stream store + no cold layer
  }
}
