package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.plans.TierPipeline

/** Durable landing of the streaming 1-minute tier into the
  * [[graft.plans.TierPipeline]] store — the ingestion half of a
  * hot/cold-layer architecture:
  *
  *   - COLD: the batch cascade (`TierPipeline.buildAll`) owns
  *     `tier_1m/` .. `tier_1d/` with exact percentiles and point blocks.
  *   - HOT: this sink lands watermark-CLOSED streaming buckets
  *     ([[StreamingRollup.tier1mStream]] in append mode) into
  *     `tier_1m_stream/` within seconds of bucket close, carrying the
  *     associative measures. [[readHot]] serves the union: batch partitions
  *     where the cold layer has caught up, streamed rows elsewhere.
  *
  * Exactly-once without a transactional table format (same constraint as
  * TierPipeline — no Iceberg/Delta jar on the box): each micro-batch writes
  * under `batch_id=<id>` subpartitions with dynamic-partition OVERWRITE.
  * Structured Streaming replays a failed micro-batch with the same id and
  * the same data (replayable source + checkpoint), so a replay overwrites
  * exactly the files the failed attempt may have half-written — append-only
  * at the dataset level, idempotent at the batch level. Lineage rows
  * (status=`stream-append`, run_id=`<runId>#<batchId>`) are appended after
  * the data write as the audit trail + replay fast-path.
  *
  * Scale notes: one closed 1m bucket per (host, minute) is tiny relative to
  * raw pages — the sink shuffles nothing (the streaming agg already grouped),
  * writes are partition-pruned appends, and the per-batch metrics collect is
  * bounded by distinct (day, host_bucket) pairs in the batch (≤ hostBuckets ×
  * days touched, not rows).
  */
object StreamingIngest {

  val StreamTier = "1m_stream"

  def streamTierPath(root: String): String = TierPipeline.tierPath(root, StreamTier)

  /** Lands one micro-batch of CLOSED 1m buckets. Public for direct batch-level
    * testing; normal entry is [[startTierSink]]. Idempotent per (runId,
    * batchId): a replay overwrites its own batch_id partitions and skips
    * lineage re-append.
    */
  def ingestBatch(closed: DataFrame, cfg: TierPipeline.Config,
                  runId: String, batchId: Long): Unit = {
    val spark = closed.sparkSession
    val batchRun = s"$runId#$batchId"
    val replayed = TierPipeline.lineage(spark, cfg.root)
      .filter(col("tier") === StreamTier && col("run_id") === batchRun &&
        col("status") === "stream-append")
      .take(1).nonEmpty

    val part = TierPipeline.withPartitionCols(closed, cfg.hostBuckets)
      .withColumn("batch_id", lit(batchId))
      .persist() // one materialization feeds both the write and the metrics agg
    try {
      if (part.isEmpty) return
      part.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day", "host_bucket", "batch_id")
        .parquet(streamTierPath(cfg.root))
      if (replayed) return // data re-landed idempotently; lineage already there

      val metrics = part.groupBy("day", "host_bucket")
        .agg(count(lit(1)).as("row_cnt"), sum(col("cnt")).as("page_cnt"),
          sum(col("sum_len")).as("sum_len_sum"))
        .collect()
      val rows = metrics.map(r => org.apache.spark.sql.Row(
        StreamTier, r.getAs[String]("day"), r.getAs[Int]("host_bucket"), batchRun,
        r.getAs[Long]("row_cnt"), r.getAs[Long]("page_cnt"),
        r.getAs[Double]("sum_len_sum"), "stream-append"))
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
          org.apache.spark.sql.types.StructType.fromDDL(TierPipeline.lineageSchema))
        .write.mode(SaveMode.Append).parquet(TierPipeline.lineagePath(cfg.root))
    } finally part.unpersist()
  }

  /** Starts the durable sink over a CLOSED-bucket stream (i.e.
    * `StreamingRollup.tier1mStream(...)` written in append mode — update-mode
    * streams would land still-open buckets and violate the one-row-per-bucket
    * contract).
    */
  def startTierSink(closed1m: DataFrame, cfg: TierPipeline.Config,
                    checkpoint: String, runId: String,
                    trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    closed1m.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, id: Long) => ingestBatch(batch, cfg, runId, id))
      .start()

  /** The streamed hot tier as a DataFrame (associative measures; `batch_id`
    * and partition columns dropped, `day` normalized to yyyy-MM-dd).
    */
  def readStreamTier(spark: SparkSession, cfg: TierPipeline.Config): DataFrame =
    spark.read.parquet(streamTierPath(cfg.root)).drop("batch_id")

  /** Hot-layer garbage collection: once the cold cascade marks a (day,
    * host_bucket) partition complete in `tier_1m`, the streamed rows for that
    * partition are superseded — [[readHot]]'s anti-join already ignores them,
    * so deleting them changes no query result; it only reclaims the space and
    * the small-file count that accumulate at one-directory-per-micro-batch.
    * Appends a `stream-pruned` lineage row per dropped partition for audit.
    * Idempotent; bounded by lineage size (partition count), never data size.
    *
    * Returns the pruned (day, host_bucket) partitions.
    */
  def pruneStreamTier(spark: SparkSession, cfg: TierPipeline.Config,
                      runId: String): Seq[(String, Int)] = {
    val lin = TierPipeline.lineage(spark, cfg.root)
    val batchDone = lin.filter(col("tier") === "1m" && col("status") === "complete")
      .select("day", "host_bucket")
    val streamed = lin.filter(col("tier") === StreamTier &&
        col("status") === "stream-append")
      .select("day", "host_bucket")
    val pruned = lin.filter(col("tier") === StreamTier &&
        col("status") === "stream-pruned")
      .select("day", "host_bucket")
    val todo = streamed.join(batchDone, Seq("day", "host_bucket"), "left_semi")
      .join(pruned, Seq("day", "host_bucket"), "left_anti")
      .distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    if (todo.isEmpty) return Seq.empty

    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    todo.foreach { case (d, hb) =>
      fs.delete(new org.apache.hadoop.fs.Path(
        streamTierPath(cfg.root), s"day=$d/host_bucket=$hb"), true)
    }
    // drop day directories left empty (keeps file listings clean for readers)
    todo.map(_._1).distinct.foreach { d =>
      val dayPath = new org.apache.hadoop.fs.Path(streamTierPath(cfg.root), s"day=$d")
      if (fs.exists(dayPath) && fs.listStatus(dayPath).isEmpty) fs.delete(dayPath, true)
    }
    val rows = todo.map { case (d, hb) =>
      org.apache.spark.sql.Row(StreamTier, d, hb, runId, 0L, 0L, 0.0, "stream-pruned")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        org.apache.spark.sql.types.StructType.fromDDL(TierPipeline.lineageSchema))
      .write.mode(SaveMode.Append).parquet(TierPipeline.lineagePath(cfg.root))
    todo
  }

  /** Serving view over the associative measures: batch `tier_1m` rows for
    * every (day, host_bucket) partition the cold layer has marked complete,
    * streamed rows for everything else. The overlap filter is a broadcast
    * anti-join against the (tiny) lineage table — a partition is served from
    * exactly one layer, so catch-up of the cold cascade never double-counts.
    */
  def readHot(spark: SparkSession, cfg: TierPipeline.Config,
              groupCols: Seq[String] = Seq("tld", "registered_domain", "host")): DataFrame = {
    val serveCols = (groupCols ++ Seq("bucket_start", "cnt", "sum_len",
      "min_len", "max_len", "mean_len")).map(col)
    def exists(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    }
    def empty: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        groupCols.map(c => s"$c string").mkString(", ") +
        ", bucket_start long, cnt long, sum_len double, min_len double" +
        ", max_len double, mean_len double"))
    val batchDone = TierPipeline.lineage(spark, cfg.root)
      .filter(col("tier") === "1m" && col("status") === "complete")
      .select("day", "host_bucket")
    val hot = if (!exists(streamTierPath(cfg.root))) empty else
      spark.read.parquet(streamTierPath(cfg.root))
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .join(broadcast(batchDone), Seq("day", "host_bucket"), "left_anti")
        .select(serveCols: _*)
    val coldPath = new org.apache.hadoop.fs.Path(TierPipeline.tierPath(cfg.root, "1m"))
    if (!exists(coldPath.toString)) hot
    else {
      // cold side restricted to lineage-COMPLETE partitions: data written by
      // a crashed batch run that never reached its lineage append must not be
      // served (it will be overwritten on resume, and its partition is still
      // served from the hot layer by the anti-join above)
      val cold = spark.read.parquet(coldPath.toString)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .join(broadcast(batchDone), Seq("day", "host_bucket"), "left_semi")
        .select(serveCols: _*)
      cold.unionByName(hot)
    }
  }
}
