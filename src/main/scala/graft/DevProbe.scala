package graft

// Scratch profiling main for round-6 optimization work (not part of the
// driver contract). Times sub-stages of hot operators with the noop sink;
// the numbers it printed are cited in OPTIMIZATION_r06.md.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object DevProbe {
  private def t(name: String, reps: Int = 3)(df: => DataFrame): Unit = {
    val plans = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $name min=${plans.min}%.3f runs=${plans.map(x => f"$x%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", 1024).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ev = spark.read.parquet(s"$sfDir/events.parquet")

    // ---- q228 prefixJaccardJoin sub-stages (mirrors Dedup internals) ----
    import graft.functions.Hashing.{words, wordShinglesOf}
    val d0 = docs
      .withColumn("_ws", words(col("text")))
      .select(col("doc_id").as("id"),
        array_distinct(wordShinglesOf(col("_ws"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("n", size(col("sh")).cast("long"))
    t("228.docs")(d0)
    val dck = d0.localCheckpoint()
    val ex = dck.select(col("id"), col("n"), explode(col("sh")).as("s"))
    t("228.explode")(ex)
    val tokDf = ex.groupBy("s").agg(count(lit(1)).as("_df"))
    t("228.tokdf")(tokDf)
    val w = Window.partitionBy("id").orderBy(col("_df"), col("s"))
    val tau = 0.5
    val prefixes = ex.join(tokDf, "s")
      .withColumn("_pos", row_number().over(w))
      .filter(col("_pos") <= col("n") - ceil(col("n") * tau - 1e-9) + 1L)
      .select(col("id"), col("n"), col("s"))
    t("228.prefixes")(prefixes)
    val cands = prefixes.toDF("id_a", "n_a", "s")
      .join(prefixes.toDF("id_b", "n_b", "s"), "s")
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast("double") >=
          greatest(col("n_a"), col("n_b")).cast("double") * tau - 1e-9)
      .select("id_a", "id_b")
    t("228.candsRaw")(cands)
    t("228.candsDistinct")(cands.distinct())
    val cd = cands.distinct()
    val verify = cd
      .join(dck.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("na")), "id_a")
      .join(dck.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("nb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
    t("228.full")(verify)

    // ---- q211 acf sub-stages ----
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    t("211.hourly")(hourly)
    val win211 = Window.partitionBy("event_type").orderBy("bucket")
    val lags = (1 to 36)
    val staged = lags.foldLeft(hourly)((d, k) =>
      d.withColumn(s"_lag$k", lag(col("cnt"), k).over(win211)))
    t("211.staged")(staged)
    val agged = staged.groupBy(col("event_type"))
      .agg(corr(col("cnt"), col("_lag1")).as("_acf1"),
        lags.tail.map(k => corr(col("cnt"), col(s"_lag$k")).as(s"_acf$k")): _*)
    t("211.agged")(agged)
    t("211.full")(graft.operators.Features.dominantPeriod(
      hourly, Seq("event_type"), "bucket", "cnt", lags = (1 to 36)))

    // ---- q119 hist sub-stages ----
    import graft.operators.Hist
    val h1m = Hist.histogram(ev, Seq("user_id"), "ts", "value",
      bucketSeconds = 60L, lo = 0.0, hi = 100.0, nbins = 10)
    t("119.h1m")(h1m)
    val h1h = Hist.promote(h1m, Seq("user_id"), tierSeconds = 3600L, nbins = 10)
    t("119.h1h")(h1h)
    t("119.full")(Hist.quantileEst(h1h, Seq("user_id"), lo = 0.0, hi = 100.0,
      nbins = 10, qs = Seq(0.5, 0.95)))

    // ---- q196 sketch sub-stages ----
    import graft.operators.Sketch
    val cents = ev.withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
    val t1m = Sketch.tierSketch(cents, Seq("event_type"), "ts", "cents",
      bucketSeconds = 60L, alpha = 0.02)
    t("196.t1m")(t1m)
    val t1h = Sketch.promoteSketch(t1m, Seq("event_type"), tierSeconds = 3600L)
    t("196.promote")(t1h)
    t("196.withQuantiles")(t1h.select(col("event_type"), col("bucket_start"),
      col("cnt"), Sketch.quantileFromMap(col("dd_sketch"), 0.5).as("p50_b"),
      Sketch.quantileFromMap(col("dd_sketch"), 0.95).as("p95_b")))
    val qq = Sketch.quantilesFromMap(col("dd_sketch"), Seq(0.5, 0.95))
    t("196.withQuantilesPaired")(t1h.select(col("event_type"),
      col("bucket_start"), col("cnt"), qq.getField("bkt0").as("p50_b"),
      qq.getField("bkt1").as("p95_b")))
    t("196.pairedSortBarrier")(t1h
      .select(col("event_type"), col("bucket_start"), col("cnt"),
        qq.as("_qq"))
      .orderBy("event_type", "bucket_start")
      .select(col("event_type"), col("bucket_start"), col("cnt"),
        col("_qq.bkt0").as("p50_b"), col("_qq.bkt1").as("p95_b")))
    t("196.withQuantilesOrdered")(t1h.select(col("event_type"),
      col("bucket_start"), col("cnt"), qq.getField("bkt0").as("p50_b"),
      qq.getField("bkt1").as("p95_b")).orderBy("event_type", "bucket_start"))

    // ---- q239 inner top-1 stage plans (the committed q239_rbm_*.txt
    // files show only the post-checkpoint mutuality join — the top-1
    // stage executes inside reciprocalBestMatch's localCheckpoint, so its
    // plan is dumped here explicitly; "r5shape" reconstructs the previous
    // window formulation verbatim for the before/after diff) ----
    if (sys.env.contains("GRAFT_PROBE_PLANS")) {
      val dir239 = new java.io.File("plans/r06"); dir239.mkdirs()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      def dump(name: String, df: DataFrame): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r06/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      dump("q239_top1_inner_after", graft.operators.Similarity
        .bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1))
      // r5 formulation: broadcast crossJoin over the raw (1-partition)
      // corpus scan + row_number window over every scored pair
      import graft.operators.Similarity.{dot, norm}
      val q0 = emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), norm(col("embedding")).as("_qn"))
      val c0 = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), norm(col("embedding")).as("_cn"))
      val scored0 = broadcast(q0).crossJoin(c0)
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", when(col("_qn") * col("_cn") > 0,
          dot(col("qv"), col("cv")) / (col("_qn") * col("_cn")))
          .otherwise(lit(null).cast("double")))
        .filter(col("sim").isNotNull)
      val w0 = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      dump("q239_top1_inner_r5shape", scored0
        .withColumn("rank", row_number().over(w0))
        .filter(col("rank") <= 1)
        .select("query_id", "neighbor_id", "sim", "rank"))
    }

    // ---- q39 langId full ----
    val dfull = docs.sparkSession.read.parquet(s"$sfDir/documents.parquet")
    val train = dfull.filter(pmod(col("doc_id"), lit(5L)) < 4 && col("lang").isNotNull)
    val profiles = graft.operators.TextAnalysis.langProfiles(train, "text", "lang",
      topN = 50, sampleIdCol = Some("doc_id"), sampleMod = 3)
    t("39.full")(graft.operators.TextAnalysis.langId(
      dfull.filter(pmod(col("doc_id"), lit(5L)) === 4), "doc_id", "text", profiles))

    spark.stop()
  }
}
