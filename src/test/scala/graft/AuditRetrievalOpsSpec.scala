package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Governance, Graph, Intervals, Profile, Sampling, Sax, Scd, Search, Sessions, TextAnalysis}

/** The round-3 audit/retrieval wave (oracle-covered end-to-end by
  * q208–q220): these tests pin the semantics and invariants the SQL twin
  * can't express — interval tiling in SCD2, top-k dominance in priority
  * sampling, suppression floors in the governed release, subset-containment
  * extremes, phrase adjacency, and motif/word parity.
  */
class AuditRetrievalOpsSpec extends SparkSuite {
  import spark.implicits._

  // ---------------------------------------------------------------- SCD2

  test("scd2: runs collapse, intervals tile, null state is a state") {
    val log = Seq(
      (1L, 10L, Some("a"), 1L), (1L, 20L, Some("a"), 2L),
      (1L, 30L, None: Option[String], 3L), (1L, 40L, None: Option[String], 4L),
      (1L, 50L, Some("b"), 5L),
      (2L, 10L, Some("x"), 6L))
      .toDF("k", "s", "state", "eid")
      .withColumn("ts", timestamp_seconds(col("s"))).drop("s")
    val out = Scd.scd2(log, Seq("k"), "ts", "state", "eid")
      .withColumn("vf", unix_timestamp(col("valid_from")))
      .withColumn("vt", unix_timestamp(col("valid_to")))
      .select("k", "state", "version", "vf", "vt", "n_obs")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      .sortBy(r => (r._1, r._3))
    assert(out.toSeq == Seq(
      (1L, Some("a"), 1L, 10L, 30L, 2L),
      (1L, None, 2L, 30L, 50L, 2L),
      (1L, Some("b"), 3L, 50L, -1L, 1L),
      (2L, Some("x"), 1L, 10L, -1L, 1L)))
  }

  test("scd2: n_obs sums to log size; versions contiguous from 1") {
    val log = spark.range(200).select(
      (col("id") % 5).as("k"), col("id").as("eid"),
      timestamp_seconds(col("id") * 60).as("ts"),
      ((col("id") / 7) % 3).cast("string").as("state"))
    val out = Scd.scd2(log, Seq("k"), "ts", "state", "eid").cache()
    assert(out.agg(sum("n_obs")).head.getLong(0) == 200L)
    val perKey = out.groupBy("k")
      .agg(min("version").as("lo"), max("version").as("hi"),
        count(lit(1)).as("n")).collect()
    perKey.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == r.getLong(3))
    }
    out.unpersist()
  }

  // --------------------------------------------------- priority sampling

  test("prioritySample: every kept priority dominates every dropped one") {
    val df = spark.range(500).select(col("id"),
      (col("id") % 17 + 1).as("w"))
    val kept = Sampling.prioritySample(df, "id", "w", k = 50, seed = "t")
    assert(kept.count() == 50)
    val minKept = kept.agg(min("priority")).head.getDouble(0)
    val all = Sampling.prioritySample(df, "id", "w", k = 500, seed = "t")
    val dropped = all.join(kept.select("id"), Seq("id"), "left_anti")
    assert(dropped.filter(col("priority") > minKept).count() == 0)
    // u <= 1 so priority >= weight always
    assert(all.filter(col("priority") < col("weight")).count() == 0)
  }

  test("prioritySample: replayable (same seed same set, new seed differs)") {
    val df = spark.range(300).select(col("id"), lit(1L).as("w"))
    val a = Sampling.prioritySample(df, "id", "w", 30, "s1").select("id")
    val b = Sampling.prioritySample(df, "id", "w", 30, "s1").select("id")
    val c = Sampling.prioritySample(df, "id", "w", 30, "s2").select("id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(c.exceptAll(a).count() > 0)
  }

  // ------------------------------------------------------------- Benford

  test("benfordDigits: 9 rows, counts conserve, shares sum to 1, chi2 >= 0") {
    val df = spark.range(1, 2000).select((col("id") * col("id")).as("v"))
    val out = Governance.benfordDigits(df, "v").cache()
    assert(out.count() == 9)
    assert(out.agg(sum("cnt")).head.getLong(0) == 1999L)
    assert(approxEq(out.agg(sum("share")).head.getDouble(0), 1.0, 1e-12))
    assert(out.filter(col("chi2_term") < 0).count() == 0)
    out.unpersist()
  }

  // ------------------------------------------------------- governed release

  test("noisyCountRelease: small cells suppressed, floor clamps, replayable") {
    val df = (Seq.fill(25)("big") ++ Seq.fill(3)("small")).toDF("g")
    val rel = Governance.noisyCountRelease(df, Seq("g"),
      minGroupSize = 10L, noiseBound = 5L, seed = "z")
    val rows = rel.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!rows.contains("small"))
    assert(rows("big") >= 10L && math.abs(rows("big") - 25L) <= 5L)
    val again = Governance.noisyCountRelease(df, Seq("g"), 10L, 5L, "z")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == rows)
  }

  // ------------------------------------------------------------ containment

  test("containmentPairs: a verbatim subset scores 1.0 toward its container") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "iota kappa lambda mu nu xi omicron")).toDF("id", "text")
    val out = Dedup.containmentPairs(docs, "text", "id",
        shingleN = 3, minContainment = 0.9)
      .select("id_a", "id_b", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 0L, 1.0))) // subset -> container only
  }

  // ---------------------------------------------------------------- search

  test("phraseSearch: adjacency only, counts overlapping repeats") {
    val docs = Seq(
      (0L, "the quick fox the quick fox"),
      (1L, "quick the fox"),
      (2L, "the slow quick fox")).toDF("id", "text")
    val out = Search.phraseSearch(docs, "id", "text", Seq("the", "quick", "fox"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq.sorted == Seq((0L, 2L, 0)))
  }

  test("termStats: df/cf and the impact head (tf desc, doc asc)") {
    val docs = Seq((0L, "a a b"), (1L, "a b b b"), (2L, "b")).toDF("id", "text")
    val out = Search.termStats(docs, "id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(("a", 2L, 3L, 0L, 2L), ("b", 3L, 5L, 1L, 3L)))
  }

  // ---------------------------------------------------------- collocations

  test("collocations: exact lift on a hand corpus") {
    // corpus: 4 docs "x y", 4 docs "x z" -> T=16 tokens, B=8 bigrams
    // n_xy=4, n_x=8, n_y=4 -> lift = (4/8)/((8/16)*(4/16)) = 4.0
    val docs = (Seq.fill(4)("x y") ++ Seq.fill(4)("x z")).toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minPairCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    assert(out(("x", "y")) == 4.0 && out(("x", "z")) == 4.0)
  }

  test("burrowsDelta: hand z-scores; sigma=0 words carry no signal") {
    // A: f(x)=.5 f(y)=.25 f(z)=.25 | B: f(x)=.25 f(y)=.5 f(z)=.25
    // z is equal-share in both groups -> sigma 0 -> excluded (m_used 2)
    // x: mu=.375 sd_pop=.125 -> z_A=1, z_B=-1 (y mirrored)
    // delta = mean(|1-(-1)|, |-1-1|) = 2
    val docs = Seq(("A", "x x y z"), ("B", "x y y z")).toDF("g", "text")
    val out = TextAnalysis.burrowsDelta(docs, "g", "text", topM = 3).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(r.fieldIndex("m_used")) == 2L)
    assert(math.abs(r.getDouble(r.fieldIndex("delta")) - 2.0) < 1e-12)
    // identical word distributions -> every word sigma=0 -> empty result
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("g", "text")
    val d2 = TextAnalysis.burrowsDelta(same, "g", "text", topM = 2).collect()
    assert(d2.length == 1 && d2(0).getLong(d2(0).fieldIndex("m_used")) == 0L)
  }

  // ---------------------------------------------------------------- motifs

  test("motifs: classes regroup sax words exactly; singletons dropped") {
    val ev = spark.range(600).select(
      (col("id") % 6).as("series"), // 6 series, 3 shape-pairs
      timestamp_seconds(floor(col("id") / 6) * 3600).as("ts"),
      (sin(floor(col("id") / 6) * (col("id") % 6 % 3 + 1))).as("v"))
    val words = Sax.sax(ev, Seq("series"), "ts", "v",
      frameSeconds = 36000L, alphabet = 2)
    val classes = Sax.motifs(ev, "series", "ts", "v",
      frameSeconds = 36000L, alphabet = 2, minSize = 2L)
    val regrouped = words.groupBy("sax_word")
      .agg(count(lit(1)).as("n_series")).filter(col("n_series") >= 2)
    assert(classes.select("sax_word", "n_series")
      .exceptAll(regrouped).isEmpty)
    assert(regrouped.exceptAll(classes.select("sax_word", "n_series")).isEmpty)
    // series i and i+3 share the generator frequency -> identical words,
    // so every shape-pair lands in one class (classes may merge further
    // if two frequencies share a sign pattern, never split)
    val wmap = words.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L to 2L).foreach(i => assert(wmap(i) == wmap(i + 3)))
    assert(classes.count() >= 1)
    assert(classes.filter(col("n_series") < 2).count() == 0)
  }

  // ------------------------------------------------------------------ k-core

  test("kCore: pendant chain peels, clique survives with inner degrees") {
    // 4-clique {0,1,2,3} + chain 3-10-11 hanging off it
    val cliq = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val edges = (cliq ++ Seq((3L, 10L), (10L, 11L))).toDF("src", "dst")
    val out = Graph.kCore(edges, k = 3L, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("kCore: more rounds never grows the core") {
    val edges = spark.range(100).select(col("id").as("src"),
      ((col("id") * 7 + 3) % 100).as("dst"))
    val c1 = Graph.kCore(edges, 2L, 1).select("v")
    val c3 = Graph.kCore(edges, 2L, 3).select("v")
    assert(c3.exceptAll(c1).count() == 0) // c3 ⊆ c1
  }

  // -------------------------------------------------------------- path mining

  test("pathNgrams: consecutive trigrams only, never spanning keys") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "a"),
      (2L, 5L, "b"), (2L, 6L, "c"), (2L, 7L, "a"))
      .toDF("k", "eid", "s")
      .withColumn("ts", timestamp_seconds(col("eid"))).drop()
    val out = Sessions.pathNgrams(ev, Seq("k"), "ts", "eid", "s", n = 3)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", "b", "c")) == (1L, 1L))
    assert(out(("b", "c", "a")) == (2L, 2L)) // once per key, both keys
    assert(!out.contains(("c", "a", "b"))) // would span key 1 -> 2
  }

  test("touchAttribution: conversion opening a stream attributes to (none)") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "buy"),
      (2L, 4L, "buy"), (2L, 5L, "view"), (2L, 6L, "buy"))
      .toDF("k", "eid", "s")
      .withColumn("ts", timestamp_seconds(col("eid")))
    val out = Sessions.touchAttribution(ev, Seq("k"), "ts", "eid", "s", "buy")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out(("view", "click")) == 1L) // key 1: first=view, prev=click
    assert(out(("buy", "(none)")) == 1L) // key 2 first event converts
    assert(out(("buy", "view")) == 1L)   // key 2 second conversion
  }

  // ---------------------------------------------------------- profile cosine

  test("profileCosine: identical shapes -> 1.0, disjoint -> 0.0") {
    val df = Seq(
      ("a", 0), ("a", 0), ("a", 1),   // a: [2,1,0]
      ("b", 0), ("b", 0), ("b", 0), ("b", 0), ("b", 1), ("b", 1), // b=2a
      ("c", 2), ("c", 2))             // c: [0,0,2]
      .toDF("seg", "b")
    val out = Profile.profileCosine(df, "seg", "b")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(approxEq(out(("a", "b")), 1.0, 1e-15))
    // zero-overlap pairs are omitted (no shared bucket -> no row), the
    // documented sparse semantics
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")))
  }

  // ------------------------------------------------------- interval coalesce

  test("coalesceIntervals: overlap+touch merge, nesting absorbs, gaps split") {
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 8L),   // nested
      (1L, 3L, 10L, 20L),                    // touches -> same span
      (1L, 4L, 25L, 30L),                    // gap -> new span
      (2L, 5L, 0L, 1L)).toDF("k", "eid", "s", "e")
    val out = Intervals.coalesceIntervals(iv, Seq("k"), "s", "e", "eid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 20L, 3L), (1L, 2L, 25L, 30L, 1L), (2L, 1L, 0L, 1L, 1L)))
  }

  // -------------------------------------------------------------- tail lift

  test("tailLift: tail counts conserve K; owner segment lifts above 1") {
    val df = spark.range(1000).select(col("id"),
      when(col("id") < 100, lit("hot")).otherwise(lit("cold")).as("seg"),
      when(col("id") < 100, col("id") + 10000).otherwise(col("id")).cast("double").as("v"))
    val out = Profile.tailLift(df, "seg", "v", "id", tailK = 50).cache()
    assert(out.agg(sum("tail_cnt")).head.getLong(0) == 50L)
    val hot = out.filter(col("seg") === "hot").head
    assert(hot.getAs[Long]("tail_cnt") == 50L)
    assert(hot.getAs[Double]("lift") == (50.0 / 50.0) / (100.0 / 1000.0)) // 10x
    out.unpersist()
  }
}
