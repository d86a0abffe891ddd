package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults: AQE on
  * (runtime re-plan, skew-join splitting, partition coalescing), shuffle
  * partitions sized to cores (not the 200 default), UTC for oracle parity.
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // native expressions reachable from pure SQL (SHOW FUNCTIONS /
      // spark.sql); external apps get the same via
      // --conf spark.sql.extensions=graft.GraftExtensions
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ObjectHashAggregate (typed Aggregators, collect_set) falls back to
      // SORT-BASED aggregation after 128 distinct groups per task by
      // default — the tier tables have 10^5-10^6 groups per task and the
      // fallback externally sorts every input row. 256k groups × ~500 B
      // block buffers ≈ 128 MB/task: comfortably in-memory at executor
      // sizes this engine targets.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")

  def get(master: String = s"local[${Runtime.getRuntime.availableProcessors}]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
