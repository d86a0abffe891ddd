package graft

import org.apache.spark.sql.functions._
import graft.operators.StatTests

/** Hand goldens for the distributional/structural diagnostics, computed
  * independently with numpy (least-squares + moment definitions) — values
  * pinned to the published formulas: Jarque–Bera 1980, McNemar 1947,
  * Chow 1960, KPSS 1992 (l=0), Cochran 1950, Breusch–Pagan 1979 (Koenker
  * studentized form).
  */
class StatTestsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int) = new java.sql.Timestamp((1704067200L + i * 86400L) * 1000L)

  test("jarqueBera: symmetric uniform-ish series has zero skew, platykurtic tail") {
    val x = Seq(3.0, 7, 2, 9, 4, 12, 5, 8, 6, 10, 1, 11)
    val df = x.map(v => (1L, v)).toDF("k", "v")
    val r = StatTests.jarqueBera(df, Seq("k"), "v").collect()(0)
    assert(r.getAs[Long]("n") === 12L)
    assert(approxEq(r.getAs[Double]("skew"), 0.0, 1e-12))
    assert(approxEq(r.getAs[Double]("ex_kurt"), -1.2167832167832167))
    assert(approxEq(r.getAs[Double]("jb"), 0.7402806983226562))
  }

  test("jarqueBera: constant series yields null (m2 = 0)") {
    val df = Seq((1L, 5.0), (1L, 5.0), (1L, 5.0)).toDF("k", "v")
    val r = StatTests.jarqueBera(df, Seq("k"), "v").collect()(0)
    assert(r.isNullAt(r.fieldIndex("jb")))
  }

  test("mcnemar: b=3 c=1 discordant pairs give chi2 = 1") {
    val pairs = Seq((1, 0), (1, 0), (1, 0), (0, 1), (1, 1), (1, 1), (0, 0), (0, 0))
    val df = pairs.toDF("pre", "post")
    val r = StatTests.mcnemar(df, Nil, "pre", "post").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 8L)
    assert(r.getAs[Long]("b") === 3L)
    assert(r.getAs[Long]("c") === 1L)
    assert(approxEq(r.getAs[Double]("chi2"), 1.0, 1e-12))
    // all-concordant: undefined
    val conc = Seq((1, 1), (0, 0)).toDF("pre", "post")
    val r2 = StatTests.mcnemar(conc, Nil, "pre", "post").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("chi2")))
  }

  test("chow: slope break at the midpoint — numpy lstsq golden") {
    val y = Seq(1.0, 2.1, 2.9, 4.2, 5.0, 6.1, 10.0, 12.2, 13.9, 16.1, 18.0, 20.2)
    val df = y.zipWithIndex.map { case (v, i) => (1L, ts(i), v) }.toDF("k", "t", "v")
    val r = StatTests.chow(df, Seq("k"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 12L)
    assert(approxEq(r.getAs[Double]("rss_pooled"), 13.228310023310028, 1e-6))
    assert(approxEq(r.getAs[Double]("rss_split"), 0.11961904761904824, 1e-6))
    assert(approxEq(r.getAs[Double]("f_stat"), 438.34794663934576, 1e-6))
    // a pure line has no break: F ~ small (split RSS ~ pooled RSS)
    val line = (0 until 12).map(i => (1L, ts(i), 2.0 * i + 1.0)).toDF("k", "t", "v")
    val rl = StatTests.chow(line, Seq("k"), "t", "v").collect()(0)
    assert(rl.isNullAt(rl.fieldIndex("f_stat")) ||
      math.abs(rl.getAs[Double]("f_stat")) < 1e-6)
  }

  test("kpss: l=0 eta matches the partial-sum definition") {
    val x = Seq(3.0, 7, 2, 9, 4, 12, 5, 8, 6, 10, 1, 11)
    val df = x.zipWithIndex.map { case (v, i) => (1L, ts(i), v) }.toDF("k", "t", "v")
    val r = StatTests.kpss(df, Seq("k"), "t", "v").collect()(0)
    assert(approxEq(r.getAs[Double]("eta"), 0.12033799533799534))
    // a strong trend inflates eta far above the 0.463 5% critical value
    val trend = (0 until 40).map(i => (1L, ts(i), i.toDouble)).toDF("k", "t", "v")
    val rt = StatTests.kpss(trend, Seq("k"), "t", "v").collect()(0)
    assert(rt.getAs[Double]("eta") > 0.463)
  }

  test("cochranQ: 6 blocks x 3 treatments golden = 0.4; complete blocks only") {
    val x = Seq( // (block, treatment, success) — the numpy design matrix
      (1, "a", 1), (1, "b", 1), (1, "c", 0),
      (2, "a", 1), (2, "b", 0), (2, "c", 0),
      (3, "a", 1), (3, "b", 1), (3, "c", 1),
      (4, "a", 0), (4, "b", 1), (4, "c", 0),
      (5, "a", 1), (5, "b", 0), (5, "c", 1),
      (6, "a", 0), (6, "b", 1), (6, "c", 1))
    val df = x.toDF("blk", "treat", "x")
    val r = StatTests.cochranQ(df, "blk", "treat", Seq("a", "b", "c"), "x").collect()(0)
    assert(r.getAs[Long]("n_blocks") === 6L)
    assert(approxEq(r.getAs[Double]("q"), 0.4, 1e-12))
    // drop one cell -> that block is incomplete and excluded
    val incomplete = df.filter(!(col("blk") === 6 && col("treat") === "c"))
    val r2 = StatTests.cochranQ(incomplete, "blk", "treat", Seq("a", "b", "c"), "x")
      .collect()(0)
    assert(r2.getAs[Long]("n_blocks") === 5L)
  }

  test("breuschPagan: variance growing with t — numpy golden LM") {
    val y = Seq(2.3381051407600713, 2.36021878883775, 3.0131280654714336,
      3.703758141498254, 3.5266461828245568, 4.501445901034164,
      4.999287691313655, 3.920748124289121, 7.017658005663494,
      7.160548367511504, 6.2494852312398885, 7.276987260445562,
      8.707419123875452, 8.10796537721253, 8.611601474123926,
      7.029489598765656, 10.998244561405398, 10.735373720045374,
      11.548919847519928, 8.294298483073336, 15.631539320610246,
      12.854971731549623, 12.070864136112668, 18.57268055190278,
      13.88199632236232, 10.583167512304248, 13.865362004802478,
      8.863886204282004, 19.148189648029764, 15.208929612587943)
    val df = y.zipWithIndex.map { case (v, i) => (1L, ts(i), v) }.toDF("k", "t", "v")
    val r = StatTests.breuschPagan(df, Seq("k"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 30L)
    assert(approxEq(r.getAs[Double]("slope"), 0.47175375192298735, 1e-9))
    assert(approxEq(r.getAs[Double]("r2_aux"), 0.24284754954838458, 1e-9))
    assert(approxEq(r.getAs[Double]("lm"), 7.285426486451538, 1e-9))
    // homoskedastic pure line: residuals ~ 0, aux R2 degenerate or ~ 0
    val line = (0 until 20).map(i => (1L, ts(i), 3.0 * i)).toDF("k", "t", "v")
    val rl = StatTests.breuschPagan(line, Seq("k"), "t", "v").collect()(0)
    assert(rl.isNullAt(rl.fieldIndex("lm")) || rl.getAs[Double]("lm") < 1e-6)
  }

  test("engleGranger: cointegrated pair strongly rejects (numpy golden)") {
    val x = Seq(1.7494547413, 1.4633817445, 0.9788166123, -1.674501947,
      -1.6827865764, -2.0024179401, -2.5390473024, -2.2236446339,
      -1.8025939177, -2.8681968981, -3.7544365681, -4.2301700608,
      -3.5404877506, -2.9792955745, -4.2848440843, -5.4043193459,
      -4.6674819547, -3.0928478816, -3.1239229701, -3.8073695975,
      -2.711739899, -3.0213165362, -2.2955643114, -0.746492678,
      -0.1164128556, -0.0429196186, 0.6893517353, 0.0467763429,
      -0.1313168324, -0.7052713918, -0.9096467075, -1.3961418076,
      -1.5819171316, -1.9624535483, -1.873475913, -1.8098042516,
      -1.5134571435, -0.110686024, -1.6575485916, -0.3619300068)
    val y = Seq(3.4277343489, 2.557059627, 1.9059072944, -3.3214523815,
      -3.0453056156, -4.3233262147, -5.0128901423, -4.4119434166,
      -4.1104211033, -6.0921203759, -7.3288425345, -8.2516699449,
      -6.7546622431, -5.7984446344, -8.4511245648, -10.771778433,
      -8.9722334167, -6.4386155935, -6.2904140144, -7.4991329536,
      -5.8967280906, -5.6493499804, -4.8289881252, -1.5145101797,
      0.4141766166, -0.3346704128, 1.2198918624, 0.5620637939,
      -0.5866918124, -1.5401600693, -1.6644682038, -2.6556657571,
      -2.9857284022, -3.8137551963, -3.3433384044, -3.3148258592,
      -2.8483307507, -0.4262125329, -3.529165162, -1.2963468761)
    val df = x.zip(y).zipWithIndex.map { case ((xv, yv), i) => (1L, ts(i), xv, yv) }
      .toDF("k", "t", "x", "y")
    val r = StatTests.engleGranger(df, Seq("k"), "t", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 40L)
    assert(approxEq(r.getAs[Double]("beta"), 1.958647613912626, 1e-9))
    assert(approxEq(r.getAs[Double]("rho"), -1.0514684178804978, 1e-9))
    assert(approxEq(r.getAs[Double]("t_stat"), -6.196234516735642, 1e-9))
  }

  test("bradleyTerry: Jacobi MM golden; strengths sum to 1, dominance ordering") {
    val pairs = Seq(("a", "b", 8L), ("b", "a", 2L), ("a", "c", 6L),
      ("c", "a", 4L), ("b", "c", 5L), ("c", "b", 5L))
    val df = pairs.toDF("item", "opp", "wins")
    val r = StatTests.bradleyTerry(df, "item", "opp", "wins",
      Seq("a", "b", "c"), iterations = 5).collect()(0)
    val (pa, pb, pc) = (r.getAs[Double]("p_a"), r.getAs[Double]("p_b"),
      r.getAs[Double]("p_c"))
    assert(approxEq(pa, 0.5346557610828194, 1e-12))
    assert(approxEq(pb, 0.19982238099415198, 1e-12))
    assert(approxEq(pc, 0.2655218579230287, 1e-12))
    assert(approxEq(pa + pb + pc, 1.0, 1e-12))
    assert(pa > pc && pc > pb, "a dominates; c edges out b (6-4 vs 2-8)")
    assert(r.getAs[Long]("n_comparisons") === 30L)
  }

  test("pageL: perfectly ordered blocks reach the maximum L = 55n, z = 2*sqrt(n)") {
    // arm at order position j gets value j in every block: R_j = n*j
    val arms = Seq("a", "b", "c", "d", "e")
    val rows = for (blk <- 1 to 4; (a, j) <- arms.zipWithIndex)
      yield (blk, a, (j + 1).toDouble)
    val df = rows.toDF("blk", "arm", "v")
    val r = StatTests.pageL(df, "blk", "arm", arms, "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") === 4L)
    assert(approxEq(r.getAs[Double]("l_stat"), 220.0, 1e-12))
    assert(approxEq(r.getAs[Double]("z"), 4.0, 1e-12))
    // reversed order scores the minimum: L = n*k(k+1)^2/4 - (L_max - E) = 140
    val rev = StatTests.pageL(df, "blk", "arm", arms.reverse, "v").collect()(0)
    assert(approxEq(rev.getAs[Double]("l_stat"), 140.0, 1e-12))
    assert(approxEq(rev.getAs[Double]("z"), -4.0, 1e-12))
  }

  test("jaro_winkler: DuckDB-pinned goldens, symmetry, SQL registry") {
    import graft.functions.JaroWinklerHelper
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinklerHelper.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    // goldens probed from DuckDB jaro_winkler_similarity this session
    val goldens = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "", 0.0), // DuckDB convention: empty is similar to nothing
      ("a", "", 0.0),
      ("abcd", "dcba", 0.5),
      ("crate", "trace", 0.7333333333333334), // jaro > 0.7 but prefix 0
      ("xy", "yx", 0.0), // window 0: no matches
      ("hello world", "world hello", 0.503030303030303),
      ("prefix match rocks", "prefix match rules", 0.9333333333333333))
    for ((a, b, want) <- goldens) {
      assert(jw(a, b) === want, s"jw($a, $b)")
      assert(jw(b, a) === jw(a, b), s"symmetry of ($a, $b)")
    }
    // registered SQL surface
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").collect()(0).getDouble(0)
    assert(got === 0.9611111111111111)
  }

  test("jonckheere: ordered 3-group golden (ties counted half)") {
    val rows = Seq("g1" -> Seq(1.0, 3, 5, 7), "g2" -> Seq(2.0, 4, 6, 8, 10),
      "g3" -> Seq(5.0, 9, 11, 13)).flatMap { case (g, vs) => vs.map((g, _)) }
    val df = rows.toDF("arm", "v")
    val r = StatTests.jonckheere(df, "arm", Seq("g1", "g2", "g3"), "v").collect()(0)
    assert(r.getAs[Long]("n") === 13L)
    assert(approxEq(r.getAs[Double]("j_stat"), 44.5, 1e-12))
    assert(approxEq(r.getAs[Double]("z"), 2.1542109924517607, 1e-12))
  }

  test("moodMedian: lower-middle order statistic and 2x2 chi2 golden") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 5.0),
      ("b", 6.0), ("b", 7.0), ("b", 8.0), ("a", 9.0))
    val df = rows.toDF("arm", "v")
    val r = StatTests.moodMedian(df, "arm", Seq("a", "b"), "v").collect()(0)
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Double]("median") === 5.0)
    assert(approxEq(r.getAs[Double]("chi2"), 2.7225, 1e-12))
  }

  test("markovEntropyRate: 2-state chain golden; deterministic chain has H = 0") {
    val seq = "aabababbbaab"
    val tr = seq.zip(seq.tail).map { case (f, t) => (f.toString, t.toString) }
      .toDF("f", "t")
    val r = StatTests.markovEntropyRate(tr, "f", "t", Seq("a", "b")).collect()(0)
    assert(r.getAs[Long]("n_transitions") === 11L)
    assert(approxEq(r.getAs[Double]("entropy_rate"), 0.6531039404377417, 1e-12))
    assert(approxEq(r.getAs[Double]("perplexity"), 1.9214957907954946, 1e-12))
    val detSeq = "ababababab"
    val det = detSeq.zip(detSeq.tail).map {
      case (f, t) => (f.toString, t.toString) }.toDF("f", "t")
    val rd = StatTests.markovEntropyRate(det, "f", "t", Seq("a", "b")).collect()(0)
    assert(approxEq(rd.getAs[Double]("entropy_rate"), 0.0, 1e-12))
  }

  test("tukeyHsd: 3-group Tukey-Kramer goldens") {
    val rows = Seq("a" -> Seq(1.0, 2, 3, 4), "b" -> Seq(2.0, 4, 6, 8),
      "c" -> Seq(10.0, 12, 14, 16)).flatMap { case (g, vs) => vs.map((g, _)) }
    val df = rows.toDF("arm", "v")
    val got = StatTests.tukeyHsd(df, "arm", Seq("a", "b", "c"), "v")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("q_stat"))).toMap
    assert(approxEq(got(("a", "b")), 2.23606797749979, 1e-9))
    assert(approxEq(got(("a", "c")), 9.391485505499116, 1e-9))
    assert(approxEq(got(("b", "c")), 7.155417527999327, 1e-9))
  }

  test("ansariBradley: extremes-vs-center golden (x disperses, AB small, z < 0)") {
    val rows = Seq(("x", 1.0), ("x", 9.0), ("x", 2.0), ("x", 8.0), ("y", 4.0),
      ("y", 5.0), ("y", 5.0), ("y", 6.0))
    val df = rows.toDF("arm", "v")
    val r = StatTests.ansariBradley(df, "arm", "x", "y", "v").collect()(0)
    assert(r.getAs[Long]("n_a") === 4L)
    assert(r.getAs[Long]("n_b") === 4L)
    assert(approxEq(r.getAs[Double]("ab_stat"), 6.0, 1e-12))
    assert(approxEq(r.getAs[Double]("z"), -2.3664319132398464, 1e-12))
  }

  test("fisherExact: 2x2 (3,1,2,4) one-sided p = 11/42 (exact-fraction golden)") {
    val rows = Seq((1, 1), (1, 1), (1, 1), (1, 0), (0, 1), (0, 1),
      (0, 0), (0, 0), (0, 0), (0, 0))
    val df = rows.toDF("fa", "fb")
    val r = StatTests.fisherExact(df, "fa", "fb").collect()(0)
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
      r.getAs[Long]("d")) === ((3L, 1L, 2L, 4L)))
    assert(approxEq(r.getAs[Double]("p_greater"), 0.2619047619047619, 1e-9))
    // the whole-table extreme: a = r1 -> p = single-term hypergeometric
    val ext = Seq((1, 1), (1, 1), (0, 0), (0, 0)).toDF("fa", "fb")
    val re = StatTests.fisherExact(ext, "fa", "fb").collect()(0)
    assert(approxEq(re.getAs[Double]("p_greater"), 1.0 / 6.0, 1e-9))
  }

  test("chapman: (60, 50, 20) golden; recapturing everything collapses to n1") {
    val units = (1 to 100).map { i =>
      (i, if (i <= 60) 1 else 0, if (i > 40 && i <= 60) 1 else if (i > 60 && i <= 90) 1 else 0)
    }
    val df = units.toDF("id", "f1", "f2")
    val r = StatTests.chapman(df, "f1", "f2").collect()(0)
    assert((r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("m")) ===
      ((60L, 50L, 20L)))
    assert(approxEq(r.getAs[Double]("n_hat"), 147.14285714285714, 1e-12))
    assert(approxEq(r.getAs[Double]("se"), 19.61597924982332, 1e-12))
    // full recapture: m = n1 = n2 -> n_hat = n1, se = 0
    val full = (1 to 30).map(i => (i, 1, 1)).toDF("id", "f1", "f2")
    val rf = StatTests.chapman(full, "f1", "f2").collect()(0)
    assert(approxEq(rf.getAs[Double]("n_hat"), 30.0, 1e-12))
    assert(rf.getAs[Double]("se") === 0.0)
  }

  test("concordance: CCC penalizes bias, Pearson does not") {
    val x = Seq(1.0, 2, 3, 4, 5, 6)
    val y = Seq(1.2, 1.9, 3.4, 3.9, 5.1, 6.3)
    val df = x.zip(y).toDF("x", "y")
    val r = StatTests.concordance(df, Nil, "x", "y").collect()(0)
    assert(approxEq(r.getAs[Double]("pearson"), 0.9942996299513437, 1e-12))
    assert(approxEq(r.getAs[Double]("ccc"), 0.9910913140311803, 1e-12))
    // constant shift: pearson unchanged at 1 for y = x + 5, ccc collapses
    val shifted = x.map(v => (v, v + 5.0)).toDF("x", "y")
    val rs = StatTests.concordance(shifted, Nil, "x", "y").collect()(0)
    assert(approxEq(rs.getAs[Double]("pearson"), 1.0, 1e-12))
    assert(rs.getAs[Double]("ccc") < 0.25)
  }

  test("textRank: tiny 3-node chain golden (hub scores highest)") {
    import graft.operators.TextAnalysis
    val df = Seq("a b a c", "b c b").toDF("text")
    val got = TextAnalysis.textRank(df, "text", topN = 3, iterations = 4)
      .collect().map(r => (r.getString(0), r.getAs[Long]("freq"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq("a", "b", "c"))
    assert(got.map(_._2).toSeq === Seq(2L, 3L, 2L))
    assert(approxEq(got(0)._3, 0.9188984567901234, 1e-9))
    assert(approxEq(got(1)._3, 1.162203086419753, 1e-9))
    assert(approxEq(got(2)._3, 0.9188984567901234, 1e-9))
  }

  test("goodTuring: freq table [1,1,1,2,2,3] gives r1* = 4/3, r2* = 3/2, p0 = 0.3") {
    import graft.operators.TextAnalysis
    // six terms with freqs 1,1,1,2,2,3 -> 10 tokens
    val df = Seq("t1 t2 t3 t4 t4 t5 t5 t6 t6 t6").toDF("text")
    val got = TextAnalysis.goodTuring(df, "text", maxR = 3)
      .collect().sortBy(_.getAs[Long]("r"))
    assert(got.map(_.getAs[Long]("n_r")).toSeq === Seq(3L, 2L, 1L))
    assert(approxEq(got(0).getAs[Double]("r_star"), 4.0 / 3.0, 1e-12))
    assert(approxEq(got(1).getAs[Double]("r_star"), 1.5, 1e-12))
    assert(got(2).isNullAt(got(2).fieldIndex("r_star"))) // N_4 = 0
    assert(approxEq(got(0).getAs[Double]("p_unseen"), 0.3, 1e-12))
  }

  test("coxStuart: strictly rising series pairs all up; flat series m = 0") {
    val rising = (1 to 10).map(i => (1L, ts(i), i.toDouble)).toDF("k", "t", "v")
    val r = StatTests.coxStuart(rising, Seq("k"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("m") === 5L)
    assert(r.getAs[Long]("s_plus") === 5L)
    assert(approxEq(r.getAs[Double]("z"), 2.23606797749979, 1e-12))
    // odd n: middle point unpaired -> floor(n/2) pairs
    val odd = (1 to 9).map(i => (1L, ts(i), i.toDouble)).toDF("k", "t", "v")
    val ro = StatTests.coxStuart(odd, Seq("k"), "t", "v").collect()(0)
    assert(ro.getAs[Long]("m") === 4L)
    val flat = (1 to 8).map(i => (1L, ts(i), 7.0)).toDF("k", "t", "v")
    val rf = StatTests.coxStuart(flat, Seq("k"), "t", "v").collect()(0)
    assert(rf.getAs[Long]("m") === 0L)
    assert(rf.isNullAt(rf.fieldIndex("z")))
  }

  test("wilcoxonSignedRank: tie-corrected golden; zero diffs dropped") {
    val x = Seq(10.0, 12, 9, 15, 11, 13, 8, 14)
    val y = Seq(8.0, 12, 7, 12, 14, 9, 8, 10)
    val df = x.zip(y).toDF("x", "y")
    val r = StatTests.wilcoxonSignedRank(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 8L)
    assert(r.getAs[Long]("n_nonzero") === 6L)
    assert(approxEq(r.getAs[Double]("w_plus"), 17.5, 1e-12))
    assert(approxEq(r.getAs[Double]("z"), 1.4798459832287318, 1e-12))
  }

  test("bartlett: 3-group variance-homogeneity golden; equal variances -> ~0") {
    val rows = Seq("a" -> Seq(1.0, 2, 3, 4, 5), "b" -> Seq(2.0, 4, 6, 8, 10),
      "c" -> Seq(1.0, 1.5, 2, 2.5, 3)).flatMap { case (g, vs) => vs.map((g, _)) }
    val df = rows.toDF("arm", "v")
    val r = StatTests.bartlett(df, "arm", Seq("a", "b", "c"), "v").collect()(0)
    assert(r.getAs[Long]("n") === 15L)
    assert(approxEq(r.getAs[Double]("chi2"), 6.0438505097025645, 1e-9))
    // identical spreads: chi2 exactly 0 up to rounding
    val eq = Seq("a", "b", "c").flatMap(g => Seq(1.0, 2, 3).map((g, _))).toDF("arm", "v")
    val re = StatTests.bartlett(eq, "arm", Seq("a", "b", "c"), "v").collect()(0)
    assert(math.abs(re.getAs[Double]("chi2")) < 1e-9)
  }

  test("amsF2: exact F2 on known counts; estimator within 3x for 8 rows") {
    import graft.operators.Sketch
    val tf = (1 to 50).map(i => (s"item$i", (i % 7 + 1).toLong)).toDF("term", "cnt")
    val r = Sketch.amsF2(tf, "term", "cnt", rows = 8).collect()(0)
    val exact = (1 to 50).map(i => { val c = (i % 7 + 1).toLong; c * c }).sum
    assert(r.getAs[Long]("n_items") === 50L)
    assert(r.getAs[Long]("f2_exact") === exact)
    // unbiased estimator, variance ~ 2F2^2/rows: loose deterministic bound
    assert(r.getAs[Double]("rel_err") < 3.0)
  }

  test("keynessG2: balanced halves give g2 ~ 0; skewed term scores high") {
    import graft.operators.TextAnalysis
    val docs = Seq((true, "x x x y"), (false, "x x x z")).toDF("fl", "text")
    val got = TextAnalysis.keynessG2(docs, "text", "fl", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getAs[Double]("g2"))).toMap
    assert(math.abs(got("x")) < 1e-12, "perfectly balanced term")
    assert(got("y") > 1.0, "y only in half A")
    val overs = TextAnalysis.keynessG2(docs, "text", "fl", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getAs[String]("over"))).toMap
    assert(overs("y") === "a" && overs("z") === "b")
  }

  test("hingeTrend: exact piecewise-linear series recovered (b0=2, b1=1, b2=3)") {
    // y = 2 + t + 3*max(t-5, 0), n = 10, knot = floor(10/2) = 5: exact fit
    val rows = (0 until 10).map { t =>
      (1L, ts(t), 2.0 + t + 3.0 * math.max(t - 5, 0))
    }
    val df = rows.toDF("k", "t", "v")
    val r = StatTests.hingeTrend(df, Seq("k"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(approxEq(r.getAs[Double]("b0"), 2.0, 1e-9))
    assert(approxEq(r.getAs[Double]("b1"), 1.0, 1e-9))
    assert(approxEq(r.getAs[Double]("b2"), 3.0, 1e-9))
    // a pure line: slope change 0
    val line = (0 until 10).map(t => (1L, ts(t), 4.0 + 2.0 * t)).toDF("k", "t", "v")
    val rl = StatTests.hingeTrend(line, Seq("k"), "t", "v").collect()(0)
    assert(approxEq(rl.getAs[Double]("b1"), 2.0, 1e-9))
    assert(approxEq(rl.getAs[Double]("b2"), 0.0, 1e-9))
  }

  test("blomqvistBeta: perfect monotone pair = 1, anti-monotone = -1") {
    val x = Seq(1.0, 2, 3, 4, 5, 6, 7)
    val up = x.map(v => (v, 2.0 * v)).toDF("x", "y")
    val r = StatTests.blomqvistBeta(up, "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 7L)
    assert(r.getAs[Long]("n_used") === 6L) // the median point sits on both
    assert(approxEq(r.getAs[Double]("beta"), 1.0, 1e-12))
    val down = x.map(v => (v, -v)).toDF("x", "y")
    val rd = StatTests.blomqvistBeta(down, "x", "y").collect()(0)
    assert(approxEq(rd.getAs[Double]("beta"), -1.0, 1e-12))
  }

  test("paretoFront: dominated points drop, ties on the front survive") {
    import graft.operators.Skyline
    val pts = Seq((1L, 5L, 1L), (2L, 4L, 2L), (3L, 3L, 3L), (4L, 2L, 2L),
      (5L, 1L, 5L), (6L, 3L, 3L), (7L, 2L, 4L))
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.paretoFront(df, "id", "x", "y")
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    // (4,2,2) dominated by (3,3,3); (2,4,2) not dominated; duplicates
    // (3,3,3)/(6,3,3) both survive; (7,2,4) survives (y=4 beats 3s)
    assert(got === Seq(1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("cramersV: 2x3 golden; perfect association gives V = 1") {
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r1", "c3")) ++ Seq.fill(30)(("r2", "c1")) ++
      Seq.fill(20)(("r2", "c2")) ++ Seq.fill(10)(("r2", "c3"))
    val df = rows.toDF("a", "b")
    val r = StatTests.cramersV(df, "a", "b").collect()(0)
    assert(r.getAs[Long]("n") === 120L)
    assert(approxEq(r.getAs[Double]("chi2"), 20.0, 1e-9))
    assert(approxEq(r.getAs[Double]("v"), 0.408248290463863, 1e-9))
    assert(approxEq(r.getAs[Double]("v_corrected"), 0.38875434853236673, 1e-9))
    val perfect = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val rp = StatTests.cramersV(perfect, "a", "b").collect()(0)
    assert(approxEq(rp.getAs[Double]("v"), 1.0, 1e-12))
  }

  test("ordinalAssociation: gamma ignores ties, Somers' D penalizes y-ties") {
    val x = Seq(1.0, 2, 2, 3, 4, 5)
    val y = Seq(1.0, 3, 2, 2, 5, 5)
    val df = x.zip(y).toDF("x", "y")
    val r = StatTests.ordinalAssociation(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("n_conc") === 11L)
    assert(r.getAs[Long]("n_disc") === 1L)
    assert(approxEq(r.getAs[Double]("gamma"), 0.8333333333333334, 1e-12))
    assert(approxEq(r.getAs[Double]("somers_d"), 0.7142857142857143, 1e-12))
  }

  test("theilU: hand 2x2 golden; independent split gives u ~ 0") {
    val rows = Seq.fill(8)(("a", "u")) ++ Seq.fill(2)(("b", "u")) ++
      Seq.fill(3)(("a", "v")) ++ Seq.fill(7)(("b", "v"))
    val df = rows.toDF("x", "y")
    val r = StatTests.theilU(df, "x", Seq("a", "b"), "y").collect()(0)
    assert(approxEq(r.getAs[Double]("h_x"), 0.6881388137135884, 1e-12))
    assert(approxEq(r.getAs[Double]("h_x_given_y"), 0.5556333627965406, 1e-12))
    assert(approxEq(r.getAs[Double]("u"), 0.19255628119851723, 1e-12))
    val indep = (Seq.fill(5)(("a", "u")) ++ Seq.fill(5)(("b", "u")) ++
      Seq.fill(5)(("a", "v")) ++ Seq.fill(5)(("b", "v"))).toDF("x", "y")
    val ri = StatTests.theilU(indep, "x", Seq("a", "b"), "y").collect()(0)
    assert(math.abs(ri.getAs[Double]("u")) < 1e-12)
  }

  test("dagostinoK2: python-replicated transform-chain golden") {
    val xs = Seq(3.0, 7, 2, 9, 4, 12, 5, 8, 6, 10, 1, 11, 15, 2, 6, 7, 9, 3, 4, 8)
    val df = xs.map(v => (1L, v)).toDF("k", "v")
    val r = StatTests.dagostinoK2(df, Seq("k"), "v").collect()(0)
    assert(r.getAs[Long]("n") === 20L)
    assert(approxEq(r.getAs[Double]("z_skew"), 0.9382613132028281, 1e-9))
    assert(approxEq(r.getAs[Double]("z_kurt"), -0.05317330451014746, 1e-9))
    assert(approxEq(r.getAs[Double]("k2"), 0.8831616921656243, 1e-9))
  }

  test("weightedKappa: perfect agreement = 1; reversal strongly negative") {
    val agree = Seq.fill(4)(("1", "1")) ++ Seq.fill(4)(("2", "2")) ++
      Seq.fill(4)(("3", "3"))
    val r = StatTests.weightedKappa(agree.toDF("a", "b"), "a", "b",
      Seq("1", "2", "3")).collect()(0)
    assert(approxEq(r.getAs[Double]("kappa_w"), 1.0, 1e-12))
    val rev = Seq.fill(4)(("1", "3")) ++ Seq.fill(4)(("2", "2")) ++
      Seq.fill(4)(("3", "1"))
    val rr = StatTests.weightedKappa(rev.toDF("a", "b"), "a", "b",
      Seq("1", "2", "3")).collect()(0)
    assert(rr.getAs[Double]("kappa_w") < -0.4)
  }

  test("senSlopeCI: rank-pick golden; pure line has zero-width CI") {
    val y = Seq(3.0, 5, 4, 7, 8, 6, 9, 11, 10, 13)
    val df = y.zipWithIndex.map { case (v, i) => (1L, ts(i), v) }.toDF("k", "t", "v")
    val r = StatTests.senSlopeCI(df, Seq("k"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_pairs") === 45L)
    assert(approxEq(r.getAs[Double]("slope"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("ci_lo"), 0.6666666666666666, 1e-12))
    assert(approxEq(r.getAs[Double]("ci_hi"), 1.3333333333333333, 1e-12))
    val line = (0 until 10).map(i => (1L, ts(i), 2.5 * i)).toDF("k", "t", "v")
    val rl = StatTests.senSlopeCI(line, Seq("k"), "t", "v").collect()(0)
    assert(approxEq(rl.getAs[Double]("slope"), 2.5, 1e-12))
    assert(approxEq(rl.getAs[Double]("ci_lo"), 2.5, 1e-12))
    assert(approxEq(rl.getAs[Double]("ci_hi"), 2.5, 1e-12))
  }

  test("robustShape: even grid is symmetric (bowley 0, moors 1)") {
    val df = (0 to 16).map(i => (1L, i.toDouble)).toDF("k", "v")
    val r = StatTests.robustShape(df, Seq("k"), "v").collect()(0)
    assert(r.getAs[Long]("n") === 17L)
    assert(r.getAs[Double]("q1") === 4.0)
    assert(r.getAs[Double]("median") === 8.0)
    assert(r.getAs[Double]("q3") === 12.0)
    assert(approxEq(r.getAs[Double]("bowley_skew"), 0.0, 1e-12))
    assert(approxEq(r.getAs[Double]("moors_kurt"), 1.0, 1e-12))
    // right-skewed data: bowley > 0
    val skewed = (Seq.fill(8)(1.0) ++ Seq(2.0, 3, 5, 9, 17, 33, 65, 129, 257))
      .map((1L, _)).toDF("k", "v")
    val rs = StatTests.robustShape(skewed, Seq("k"), "v").collect()(0)
    assert(rs.getAs[Double]("bowley_skew") > 0.0)
  }

  test("gpdFit: MoM golden; exponential-like tail gives xi near 0") {
    val ex = Seq(0.5, 1.2, 0.3, 2.5, 0.8, 1.9, 0.1, 3.2)
    val df = ex.map((1L, _)).toDF("k", "excess")
    val r = StatTests.gpdFit(df, Seq("k"), "excess").collect()(0)
    assert(r.getAs[Long]("n_exceed") === 8L)
    assert(approxEq(r.getAs[Double]("xi"), -0.18916095156450918, 1e-12))
    assert(approxEq(r.getAs[Double]("sigma"), 1.5607737489284184, 1e-12))
  }

  test("buishandRange and vonNeumann: numpy goldens on the shared series") {
    val x = Seq(3.0, 7, 2, 9, 4, 12, 5, 8, 6, 10, 1, 11)
    val df = x.zipWithIndex.map { case (v, i) => (1L, ts(i), v) }.toDF("k", "t", "v")
    val rb = StatTests.buishandRange(df, Seq("k"), "t", "v").collect()(0)
    assert(approxEq(rb.getAs[Double]("r_range"), 8.5, 1e-12))
    assert(approxEq(rb.getAs[Double]("r_scaled"), 0.7108057085060272, 1e-12))
    val rv = StatTests.vonNeumann(df, Seq("k"), "t", "v").collect()(0)
    assert(approxEq(rv.getAs[Double]("vn"), 3.062937062937063, 1e-12))
    // strong trend drives VN toward 0
    val trend = (0 until 30).map(i => (1L, ts(i), i.toDouble)).toDF("k", "t", "v")
    val rt = StatTests.vonNeumann(trend, Seq("k"), "t", "v").collect()(0)
    assert(rt.getAs[Double]("vn") < 0.1)
  }

  test("taylorLaw: exact power-law units recover slope 1.5, ln a = ln 2") {
    // construct units whose sample mean/var are exactly (m, 2 m^1.5):
    // two points m-d, m+d have mean m, sample var 2d^2 -> d = m^0.75
    val rows = Seq(2.0, 4.0, 8.0, 16.0).zipWithIndex.flatMap { case (m, u) =>
      val d = math.pow(m, 0.75)
      Seq((u.toLong, ts(0), m - d), (u.toLong, ts(1), m + d))
    }
    val df = rows.toDF("u", "t", "v")
    val r = StatTests.taylorLaw(df, Seq("u"), "v").collect()(0)
    assert(r.getAs[Long]("n_units") === 4L)
    assert(approxEq(r.getAs[Double]("slope_b"), 1.5, 1e-9))
    assert(approxEq(r.getAs[Double]("intercept_ln_a"), math.log(2.0), 1e-9))
  }

  test("lorenzAsymmetry: equal units give S = F + L with F = L = 0; skew shifts S") {
    val eq = (1 to 10).map(_ => (1L, 5L)).toDF("k", "cnt")
    val re = StatTests.lorenzAsymmetry(eq, "cnt").collect()(0)
    assert(re.getAs[Double]("s_asym") === 0.0) // nobody strictly below the mean
    // one giant: 9 units of 1 + one of 91 -> mean 10; below = 9 units, mass 9
    val sk = ((1 to 9).map(_ => (1L, 1L)) :+ ((1L, 91L))).toDF("k", "cnt")
    val rs = StatTests.lorenzAsymmetry(sk, "cnt").collect()(0)
    assert(approxEq(rs.getAs[Double]("f_below"), 0.9, 1e-12))
    assert(approxEq(rs.getAs[Double]("l_below"), 0.09, 1e-12))
    assert(approxEq(rs.getAs[Double]("s_asym"), 0.99, 1e-12))
  }

  test("kendallW: perfect agreement = 1, chi2 = m(n-1); reversal lowers W") {
    val raters = Seq("a", "b", "c")
    val perfect = for (r <- raters; i <- 1 to 4) yield (i, r, i.toDouble)
    val rp = StatTests.kendallW(perfect.toDF("item", "rater", "v"),
      "item", "rater", raters, "v").collect()(0)
    assert(rp.getAs[Long]("n_items") === 4L)
    assert(approxEq(rp.getAs[Double]("w"), 1.0, 1e-12))
    assert(approxEq(rp.getAs[Double]("chi2"), 9.0, 1e-12))
    val mixed = (for (i <- 1 to 4) yield (i, "a", i.toDouble)) ++
      (for (i <- 1 to 4) yield (i, "b", (5 - i).toDouble)) ++
      (for (i <- 1 to 4) yield (i, "c", i.toDouble))
    val rm = StatTests.kendallW(mixed.toDF("item", "rater", "v"),
      "item", "rater", raters, "v").collect()(0)
    assert(rm.getAs[Double]("w") < 0.4)
  }

  test("fleissKappa and gwetAc1: shared design goldens; AC1 > kappa here") {
    val votes = Seq(5L, 4L, 1L, 0L, 3L, 5L).map((1L, _)).toDF("k", "pos")
    val rf = StatTests.fleissKappa(votes, "pos", m = 5).collect()(0)
    assert(rf.getAs[Long]("n_items") === 6L)
    assert(approxEq(rf.getAs[Double]("p_bar"), 0.7666666666666666, 1e-12))
    assert(approxEq(rf.getAs[Double]("p_e"), 0.52, 1e-12))
    assert(approxEq(rf.getAs[Double]("kappa"), 0.5138888888888887, 1e-12))
    val rg = StatTests.gwetAc1(votes, "pos", m = 5).collect()(0)
    assert(approxEq(rg.getAs[Double]("p_e_gwet"), 0.48, 1e-12))
    assert(approxEq(rg.getAs[Double]("ac1"), 0.5512820512820512, 1e-12))
    assert(rg.getAs[Double]("ac1") > rf.getAs[Double]("kappa"))
  }

  test("signTestExact: binomial tail golden p(8 vs 2 of 10) = 0.109375") {
    val rows = (1 to 8).map(i => (10.0 + i, 5.0)) ++ Seq((1.0, 5.0), (2.0, 5.0))
    val df = rows.toDF("x", "y")
    val r = StatTests.signTestExact(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("b") === 8L)
    assert(r.getAs[Long]("c") === 2L)
    assert(approxEq(r.getAs[Double]("p_two_sided"), 0.109375, 1e-9))
    // balanced: p capped at 1
    val bal = Seq((2.0, 1.0), (1.0, 2.0)).toDF("x", "y")
    val rb = StatTests.signTestExact(bal, "x", "y").collect()(0)
    assert(approxEq(rb.getAs[Double]("p_two_sided"), 1.0, 1e-12))
  }

  test("qnScale: gaps of 1..10 pick the 15th ordered gap = 2") {
    val df = (1 to 10).map(i => (1L, i.toDouble)).toDF("k", "v")
    val r = StatTests.qnScale(df, "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_pairs") === 45L)
    assert(r.getAs[Double]("qn_raw") === 2.0)
    assert(approxEq(r.getAs[Double]("qn"), 4.4438, 1e-12))
  }

  test("cusumSquares: a variance burst pulls the split toward the burst start") {
    val calm = (0 until 20).map(i => (1L, ts(i), if (i % 2 == 0) 1.0 else -1.0))
    val burst = (20 until 30).map(i => (1L, ts(i), if (i % 2 == 0) 10.0 else -10.0))
    val df = (calm ++ burst).toDF("k", "t", "v")
    val r = StatTests.cusumSquares(df, Seq("k"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 30L)
    // before the burst C_t lags t/n maximally right at the boundary
    val splitIdx = (r.getAs[java.sql.Timestamp]("split_ts").getTime / 1000L -
      1704067200L) / 86400L
    assert(splitIdx >= 18L && splitIdx <= 21L)
    assert(r.getAs[Double]("stat") > 0.4)
  }

  test("hlShift: pairwise-difference median + Moses CI golden") {
    val rows = Seq(("a", 5.0), ("a", 7.0), ("a", 9.0), ("a", 11.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0))
    val df = rows.toDF("arm", "v")
    val r = StatTests.hlShift(df, "arm", "a", "b", "v").collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) === ((4L, 3L)))
    assert(r.getAs[Double]("shift") === 6.0)
    assert(r.getAs[Double]("ci_lo") === 2.0)
    assert(r.getAs[Double]("ci_hi") === 10.0)
  }

  test("ksUniform: clustered points D = 0.8; uniform grid D small") {
    val df = Seq(0.05, 0.1, 0.1, 0.15, 0.2).map((1L, _)).toDF("k", "u")
    val r = StatTests.ksUniform(df, "u", span = 1.0).collect()(0)
    assert(approxEq(r.getAs[Double]("d_stat"), 0.8, 1e-12))
    val grid = (1 to 100).map(i => (1L, (i - 0.5) / 100.0)).toDF("k", "u")
    val rg = StatTests.ksUniform(grid, "u", span = 1.0).collect()(0)
    assert(rg.getAs[Double]("d_stat") <= 0.005 + 1e-12)
  }

  test("circularStats: concentrated angles give resultant 1, z = n; opposed cancel") {
    val conc = Seq.fill(10)((1L, 1.25)).toDF("k", "theta")
    val r = StatTests.circularStats(conc, "theta").collect()(0)
    assert(approxEq(r.getAs[Double]("resultant"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("rayleigh_z"), 10.0, 1e-9))
    assert(approxEq(r.getAs[Double]("mean_dir"), 1.25, 1e-12))
    val opposed = (Seq.fill(5)((1L, 0.0)) ++ Seq.fill(5)((1L, math.Pi)))
      .toDF("k", "theta")
    val ro = StatTests.circularStats(opposed, "theta").collect()(0)
    assert(ro.getAs[Double]("resultant") < 1e-9)
  }

  test("medianCI: rank picks bracket the median on 1..25") {
    val df = (1 to 25).map(i => (1L, i.toDouble)).toDF("k", "v")
    val r = StatTests.medianCI(df, "v").collect()(0)
    assert(r.getAs[Double]("median") === 13.0)
    // rlo = floor((25 - 9.8)/2) = 7; rhi = ceil(1 + (25 + 9.8)/2) = 19
    assert(r.getAs[Double]("ci_lo") === 7.0)
    assert(r.getAs[Double]("ci_hi") === 19.0)
  }

  test("mmdRbf: identical distributions ~ 0, separated ones large (golden)") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 11.0), ("b", 12.0))
    val r = StatTests.mmdRbf(rows.toDF("arm", "v"), "arm", "a", "b", "v")
      .collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) === ((3L, 3L)))
    assert(r.getAs[Double]("bandwidth") === 8.0)
    assert(approxEq(r.getAs[Double]("mmd2"), 0.9144051838258709, 1e-9))
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
    val rs = StatTests.mmdRbf(same.toDF("arm", "v"), "arm", "a", "b", "v")
      .collect()(0)
    assert(math.abs(rs.getAs[Double]("mmd2")) < 1e-9)
  }

  test("brunnerMunzel: published worked example W = 3.1375, p_hat = 0.789") {
    // Brunner & Munzel's data as used in the scipy documentation
    val x1 = Seq(1.0, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1)
    val x2 = Seq(3.0, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4)
    val df = (x1.map(("a", _)) ++ x2.map(("b", _))).toDF("arm", "v")
    val r = StatTests.brunnerMunzel(df, "arm", "a", "b", "v").collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) === ((14L, 11L)))
    assert(approxEq(r.getAs[Double]("p_hat"), 0.7889610389610391, 1e-12))
    assert(approxEq(r.getAs[Double]("w_stat"), 3.137467482302951, 1e-9))
  }

  test("yuenT: trimmed means ignore the outlier Welch's t is dragged by") {
    val xa = Seq(1.0, 2, 3, 4, 5, 6, 7, 8, 9, 100)
    val xb = Seq(2.0, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    val df = (xa.map(("a", _)) ++ xb.map(("b", _))).toDF("arm", "v")
    val r = StatTests.yuenT(df, "arm", "a", "b", "v").collect()(0)
    assert((r.getAs[Long]("h_a"), r.getAs[Long]("h_b")) === ((6L, 6L)))
    assert(approxEq(r.getAs[Double]("tmean_a"), 5.5, 1e-12))
    assert(approxEq(r.getAs[Double]("tmean_b"), 6.5, 1e-12))
    assert(approxEq(r.getAs[Double]("t_stat"), -0.5940885257860046, 1e-9))
  }

  test("dixonQ: planted extreme dominates q_max") {
    val df = (Seq(1.0, 2, 3, 4, 5, 6, 7, 50)).map((1L, _)).toDF("k", "v")
    val r = StatTests.dixonQ(df, Seq("k"), "v").collect()(0)
    assert(approxEq(r.getAs[Double]("q_max"), 43.0 / 49.0, 1e-12))
    assert(approxEq(r.getAs[Double]("q_min"), 1.0 / 49.0, 1e-12))
  }

  test("harmonicFit: pure cosine profile recovered exactly") {
    // m_b = 5 + 3 cos(2 pi b/24 - 1): amplitude 3, phase 1, all variance
    val rows = for (b <- 0 until 24; d <- 1 to 3) yield
      (b, d, 5.0 + 3.0 * math.cos(2 * math.Pi * b / 24 - 1.0))
    val df = rows.toDF("hb", "d", "cnt")
    val r = StatTests.harmonicFit(df, "hb", "cnt", period = 24).collect()(0)
    assert(r.getAs[Long]("n") === 72L)
    assert(approxEq(r.getAs[Double]("mesor"), 5.0, 1e-9))
    assert(approxEq(r.getAs[Double]("amplitude"), 3.0, 1e-9))
    assert(approxEq(r.getAs[Double]("phase"), 1.0, 1e-9))
    assert(approxEq(r.getAs[Double]("var_explained"), 1.0, 1e-9))
  }

  test("icc1: strong between-group separation gives icc near 1 (golden)") {
    val rows = Seq(1L -> Seq(1.0, 2, 3), 2L -> Seq(4.0, 5, 6, 7),
      3L -> Seq(10.0, 11)).flatMap { case (g, vs) => vs.map((g, _)) }
    val df = rows.toDF("g", "v")
    val r = StatTests.icc1(df, Seq("g"), "v").collect()(0)
    assert(approxEq(r.getAs[Double]("k0"), 2.888888888888889, 1e-12))
    assert(approxEq(r.getAs[Double]("msb"), 43.361111111111114, 1e-9))
    assert(approxEq(r.getAs[Double]("msw"), 1.25, 1e-12))
    assert(approxEq(r.getAs[Double]("icc"), 0.9210206561360874, 1e-9))
  }

  test("rocAuc: midrank identity golden; perfect separation = 1") {
    val rows = Seq((1L, 0.9), (1L, 0.8), (1L, 0.8), (0L, 0.8), (0L, 0.3),
      (1L, 0.2), (0L, 0.1), (0L, 0.1))
    val r = StatTests.rocAuc(rows.toDF("y", "s"), "y", "s").collect()(0)
    assert(approxEq(r.getAs[Double]("auc"), 0.8125, 1e-12))
    val perfect = Seq((1L, 5.0), (1L, 4.0), (0L, 2.0), (0L, 1.0))
    val rp = StatTests.rocAuc(perfect.toDF("y", "s"), "y", "s").collect()(0)
    assert(approxEq(rp.getAs[Double]("auc"), 1.0, 1e-12))
  }

  test("siegelSlope: exact line recovered; one wrecked endpoint ignored") {
    val line = (1 to 5).map(x => (x.toDouble, 3.0 * x + 1.0)).toDF("x", "y")
    val r = StatTests.siegelSlope(line, "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(approxEq(r.getAs[Double]("slope"), 3.0, 1e-12))
    assert(approxEq(r.getAs[Double]("intercept"), 1.0, 1e-12))
    // y = 2x except y(9) = 100: per-point medians stay 2 (50% breakdown)
    val broken = ((1 to 8).map(x => (x.toDouble, 2.0 * x)) :+ (9.0, 100.0))
      .toDF("x", "y")
    val rb = StatTests.siegelSlope(broken, "x", "y").collect()(0)
    assert(approxEq(rb.getAs[Double]("slope"), 2.0, 1e-12))
    assert(approxEq(rb.getAs[Double]("intercept"), 0.0, 1e-12))
  }

  test("snScale: 1..10 picks lomed of himeds = 4") {
    // per-point high medians (rank 6 of 9 gaps): [6,5,4,3,3,3,3,4,5,6];
    // lomed = 5th smallest = 4
    val df = (1 to 10).map(v => Tuple1(v.toDouble)).toDF("v")
    val r = StatTests.snScale(df, "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(approxEq(r.getAs[Double]("sn_raw"), 4.0, 1e-12))
    assert(approxEq(r.getAs[Double]("sn"), 4.7704, 1e-12))
  }

  test("lmoments: 1..10 gives l1=5.5, l2=11/6, t3=t4=0 exactly") {
    val df = (1 to 10).map(v => Tuple1(v.toDouble)).toDF("v")
    val r = StatTests.lmoments(df, "v").collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(approxEq(r.getAs[Double]("l1"), 5.5, 1e-12))
    assert(approxEq(r.getAs[Double]("l2"), 11.0 / 6.0, 1e-12))
    assert(approxEq(r.getAs[Double]("t2"), 1.0 / 3.0, 1e-12))
    assert(approxEq(r.getAs[Double]("t3"), 0.0, 1e-12))
    assert(approxEq(r.getAs[Double]("t4"), 0.0, 1e-12))
  }

  test("cucconi: interleaved hand example C = 1/6; shift blows C up") {
    // A={1,4,5,8}, B={2,3,6,7}: ranks of B = 2,3,6,7; U = V =
    // (6*98 - 612)/sqrt(36720); rho = 120/1275 - 1; C = U^2/(1+rho) = 1/6
    val a = Seq(1.0, 4, 5, 8).map(("a", _))
    val b = Seq(2.0, 3, 6, 7).map(("b", _))
    val r = StatTests.cucconi((a ++ b).toDF("arm", "v"), "arm", "a", "b", "v")
      .collect()(0)
    val expU = (6.0 * 98 - 612) / math.sqrt(36720.0)
    assert(approxEq(r.getAs[Double]("u_stat"), expU, 1e-12))
    assert(approxEq(r.getAs[Double]("v_stat"), expU, 1e-12))
    assert(approxEq(r.getAs[Double]("rho"), 120.0 / 1275.0 - 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("c_stat"), 1.0 / 6.0, 1e-9))
    val shifted = (Seq(1.0, 2, 3, 4).map(("a", _)) ++
      Seq(101.0, 102, 103, 104).map(("b", _))).toDF("arm", "v")
    val rs = StatTests.cucconi(shifted, "arm", "a", "b", "v").collect()(0)
    assert(rs.getAs[Double]("c_stat") > 2.0)
  }

  test("quade: concordant blocks with ranges 2/4/6 give F = 12") {
    // within-block ranks 1,2,3 everywhere; Q = 1,2,3; A = 28, B = 24
    val rows = Seq(
      (1L, "t1", 1.0), (1L, "t2", 2.0), (1L, "t3", 3.0),
      (2L, "t1", 10.0), (2L, "t2", 12.0), (2L, "t3", 14.0),
      (3L, "t1", 100.0), (3L, "t2", 103.0), (3L, "t3", 106.0))
    val r = StatTests.quade(rows.toDF("blk", "arm", "v"), "blk", "arm", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("k") === 3L)
    assert(approxEq(r.getAs[Double]("a_term"), 28.0, 1e-12))
    assert(approxEq(r.getAs[Double]("b_term"), 24.0, 1e-12))
    assert(approxEq(r.getAs[Double]("f_stat"), 12.0, 1e-12))
  }

  test("spiegelhalterZ: two-point hand golden; perfect p=y gives z=null") {
    val df = Seq((1.0, 0.8), (0.0, 0.4)).toDF("y", "p")
    val r = StatTests.spiegelhalterZ(df, "y", "p").collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(approxEq(r.getAs[Double]("brier"), 0.1, 1e-12))
    assert(approxEq(r.getAs[Double]("z_stat"), -0.2 / math.sqrt(0.0672), 1e-12))
    // degenerate p in {0,1} matching y exactly: den = 0 -> null z
    val perfect = Seq((1.0, 1.0), (0.0, 0.0)).toDF("y", "p")
    val rp = StatTests.spiegelhalterZ(perfect, "y", "p").collect()(0)
    assert(rp.isNullAt(rp.fieldIndex("z_stat")))
  }

  test("hosmerLemeshow: two-bin hand golden 26/21") {
    // bins {0.2,0.4} O1=1 E1=0.6 and {0.6,0.8} O1=2 E1=1.4:
    // 0.16/0.42 + 0.36/0.42 = 26/21
    val df = Seq((1L, 0.0, 0.2), (2L, 1.0, 0.4), (3L, 1.0, 0.6),
      (4L, 1.0, 0.8)).toDF("id", "y", "p")
    val r = StatTests.hosmerLemeshow(df, "y", "p", "id", g = 2).collect()(0)
    assert(r.getAs[Long]("g") === 2L)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("hl_chi2"), 26.0 / 21.0, 1e-12))
  }

  test("krippendorffAlpha: unequal-rater hand golden 4/9; perfect = 1") {
    // units A {1,1}, B {0,0}, C {1,0}: So = 2, n1 = n0 = 3, N = 6
    // alpha = 1 - 5*2/(36 - 18) = 4/9
    val rows = Seq(("A", 1), ("A", 1), ("B", 0), ("B", 0), ("C", 1), ("C", 0))
    val r = StatTests.krippendorffAlpha(rows.toDF("u", "v"), "u", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_units") === 3L)
    assert(r.getAs[Long]("n_ratings") === 6L)
    assert(approxEq(r.getAs[Double]("alpha"), 4.0 / 9.0, 1e-12))
    val agree = Seq(("A", 1), ("A", 1), ("B", 0), ("B", 0), ("B", 0))
    val ra = StatTests.krippendorffAlpha(agree.toDF("u", "v"), "u", "v")
      .collect()(0)
    assert(approxEq(ra.getAs[Double]("alpha"), 1.0, 1e-12))
  }

  test("kuiperUniform: V = D+ + D- on a skewed grid") {
    // u = 0.8, 0.9 on span 1: D+ = max(1/2-0.8, 1-0.9) = 0.1,
    // D- = max(0.8-0, 0.9-0.5) = 0.8, V = 0.9
    val df = Seq(0.8, 0.9).map(Tuple1(_)).toDF("u")
    val r = StatTests.kuiperUniform(df, "u", span = 1.0).collect()(0)
    assert(approxEq(r.getAs[Double]("d_plus"), 0.1, 1e-12))
    assert(approxEq(r.getAs[Double]("d_minus"), 0.8, 1e-12))
    assert(approxEq(r.getAs[Double]("v_stat"), 0.9, 1e-12))
  }

  test("sampleEntropy: constant-increment series has entropy 0") {
    val df = (1 to 6).map(i => (ts(i), i.toDouble)).toDF("t", "v")
    val r = StatTests.sampleEntropy(df, "t", "v", rOverride = Some(1.0))
      .collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("b_pairs") === 3L)
    assert(r.getAs[Long]("a_pairs") === 3L)
    assert(approxEq(r.getAs[Double]("sampen"), 0.0, 1e-12))
    // r below every gap: B = 0 -> null sampen
    val rn = StatTests.sampleEntropy(df, "t", "v", rOverride = Some(0.5))
      .collect()(0)
    assert(rn.getAs[Long]("b_pairs") === 0L)
    assert(rn.isNullAt(rn.fieldIndex("sampen")))
  }

  test("higuchiFd: straight line has fractal dimension exactly 1") {
    val df = (1 to 30).map(i => (ts(i), i.toDouble)).toDF("t", "v")
    val r = StatTests.higuchiFd(df, "t", "v", kMax = 5).collect()(0)
    assert(r.getAs[Long]("n") === 30L)
    assert(approxEq(r.getAs[Double]("fd"), 1.0, 1e-9))
  }

  test("c3Trev: hand goldens on tiny series") {
    val line = Seq(1.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => (ts(i), v) }.toDF("t", "v")
    val r = StatTests.c3Trev(line, "t", "v").collect()(0)
    assert(approxEq(r.getAs[Double]("c3"), 6.0, 1e-12))
    assert(approxEq(r.getAs[Double]("trev"), 1.0, 1e-12))
    // alternating 1,2,1,2: diffs +1,-1,+1 -> trev = 1/3; c3 = (2+4)/2 = 3
    val alt = Seq(1.0, 2.0, 1.0, 2.0).zipWithIndex
      .map { case (v, i) => (ts(i), v) }.toDF("t", "v")
    val ra = StatTests.c3Trev(alt, "t", "v").collect()(0)
    assert(approxEq(ra.getAs[Double]("c3"), 3.0, 1e-12))
    assert(approxEq(ra.getAs[Double]("trev"), 1.0 / 3.0, 1e-12))
  }

  test("chatterjeeXi: perfect monotone n=4 hits the (n-2)/(n+1) maximum") {
    // y = x, no ties: r (x-ordered) = 1,2,3,4; sum|dr| = 3; num = 12;
    // l = 4,3,2,1 -> den = 2*(3+4+3) = 20; xi = 1 - 12/20 = 0.4 = 2/5
    val df = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 3.0, 30.0),
      (4L, 4.0, 40.0)).toDF("id", "x", "y")
    val r = StatTests.chatterjeeXi(df, "x", "y", "id").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("xi"), 0.4, 1e-12))
    // constant y: den = 0 -> null
    val c = Seq((1L, 1.0, 5.0), (2L, 2.0, 5.0), (3L, 3.0, 5.0))
      .toDF("id", "x", "y")
    val rc = StatTests.chatterjeeXi(c, "x", "y", "id").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("xi")))
  }

  test("hoeffdingD: perfect dependence n=5 gives D = 1") {
    // a=b=q = 0,1,2,3,4: D1=20, D2=184, D3=50
    // D = 30*(6*20 + 184 - 6*100... ) -> 30*(120+184-300)/120 = 1
    val df = (1 to 5).map(i => (i.toLong, i.toDouble, i.toDouble * 2))
      .toDF("id", "x", "y")
    val r = StatTests.hoeffdingD(df, "x", "y", "id").collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(approxEq(r.getAs[Double]("d_stat"), 1.0, 1e-12))
    // n = 4 < 5: null (formula divides by n-4)
    val small = (1 to 4).map(i => (i.toLong, i.toDouble, i.toDouble))
      .toDF("id", "x", "y")
    val rs = StatTests.hoeffdingD(small, "x", "y", "id").collect()(0)
    assert(rs.isNullAt(rs.fieldIndex("d_stat")))
  }

  test("distanceCorr: exact linear dependence gives dCor = 1") {
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0),
      (4L, 5.0, 10.0)).toDF("id", "x", "y")
    val r = StatTests.distanceCorr(df, "x", "y", "id").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("dcor"), 1.0, 1e-12))
    // dVar scaling: b = 2a => dvary2 = 4*dvarx2
    assert(approxEq(r.getAs[Double]("dvary2"),
      4.0 * r.getAs[Double]("dvarx2"), 1e-12))
  }

  test("transferEntropy: y lead-copies x -> hand golden in nats") {
    // x = 1,1,0,0,1,0,1,0; y(t+1) = x(t), y(1) = 0; medians 0.5
    // TE = (3 ln(4/3) + ln 3 + 2 ln 1.5 + ln 4)/7
    val x = Seq(1.0, 1, 0, 0, 1, 0, 1, 0)
    val y = Seq(0.0, 1, 1, 0, 0, 1, 0, 1)
    val df = x.indices.map(i => (ts(i), x(i), y(i))).toDF("t", "x", "y")
    val r = StatTests.transferEntropy(df, "t", "x", "y").collect()(0)
    assert(r.getAs[Long]("t") === 7L)
    val want = (3 * math.log(4.0 / 3) + math.log(3.0) +
      2 * math.log(1.5) + math.log(4.0)) / 7
    assert(approxEq(r.getAs[Double]("te_nats"), want, 1e-12))
    // y independent of everything (constant): te = 0 over 1 triple type
    val cy = x.indices.map(i => (ts(i), x(i), 0.0)).toDF("t", "x", "y")
    val rc = StatTests.transferEntropy(cy, "t", "x", "y").collect()(0)
    assert(approxEq(rc.getAs[Double]("te_nats"), 0.0, 1e-12))
  }

  test("adTwoSample: interleaved 2x2 hand golden 2/3") {
    // pooled 1A,2B,3A,4B: M = 1,1,2 -> sum = 8/3; A2 = 1*(8/3)/4 = 2/3
    val df = Seq(("a", 1.0, 1L), ("b", 2.0, 2L), ("a", 3.0, 3L),
      ("b", 4.0, 4L)).toDF("arm", "v", "id")
    val r = StatTests.adTwoSample(df, "arm", "a", "b", "v", "id")
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(approxEq(r.getAs[Double]("a2"), 2.0 / 3.0, 1e-12))
  }

  test("bartelsRank: monotone ranks 1..4 give RVN = 0.6 and Bartels z") {
    // num = 3, den = 4*15/12 = 5 -> rvn = 0.6
    // var(n=4) = 4*2*(80-8-9)/(5*4*5*9) = 0.56
    val df = Seq((ts(0), 1.0), (ts(1), 2.0), (ts(2), 3.0), (ts(3), 4.0))
      .toDF("t", "v")
    val r = StatTests.bartelsRank(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("rvn"), 0.6, 1e-12))
    assert(approxEq(r.getAs[Double]("z"), -1.4 / math.sqrt(0.56), 1e-12))
  }

  test("nadarayaWatson: symmetric pair -> midpoint mean; off-grid golden") {
    // x = 0 (y=0), x = 2 (y=2), h = 2: at g=1 weights are equal -> 1;
    // at g=0: yhat = 2e^{-1/2}/(1 + e^{-1/2})
    val df = Seq((0.0, 0.0), (2.0, 2.0)).toDF("x", "y")
    val rows = StatTests.nadarayaWatson(df, "x", "y", 2.0, Seq(0.0, 1.0))
      .collect().map(r => r.getAs[Double]("g") -> r).toMap
    assert(rows(1.0).getAs[Long]("n") === 2L)
    assert(approxEq(rows(1.0).getAs[Double]("yhat"), 1.0, 1e-12))
    val e = math.exp(-0.5)
    assert(approxEq(rows(0.0).getAs[Double]("yhat"), 2 * e / (1 + e), 1e-12))
  }

  test("gumbelPpcc: exact Gumbel reduced variates give PPCC = 1") {
    val n = 4
    val m = (1 to n).map(i =>
      -math.log(-math.log((i - 0.44) / (n + 0.12))))
    val df = m.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val r = StatTests.gumbelPpcc(df, "v", "id").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("ppcc"), 1.0, 1e-12))
  }

  test("lombScargle: pure 4-sample-period cosine gives power n/2") {
    // v = 1,0,-1,0,... daily; period 4 days; sigma^2 = 0.5 -> P = 4
    val v = Seq(1.0, 0, -1, 0, 1, 0, -1, 0)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.lombScargle(df, "t", "v", Seq(4 * 86400.0))
      .collect()(0)
    assert(r.getAs[Long]("n") === 8L)
    assert(approxEq(r.getAs[Double]("power"), 4.0, 1e-6))
  }

  test("dfa: alternating +-1 profile, boxes 4/8 -> exact F2 and alpha") {
    // Y = 1,0,1,0,...; F2(4) = 0.2, F2(8) = 5/21,
    // alpha = 0.5*ln((5/21)/0.2)/ln 2
    val df = (0 until 16).map(i => (ts(i), if (i % 2 == 0) 1.0 else -1.0))
      .toDF("t", "v")
    val rows = StatTests.dfa(df, "t", "v", Seq(4, 8)).collect()
      .map(r => r.getAs[Int]("s") -> r).toMap
    assert(rows(4).getAs[Long]("nboxes") === 4L)
    assert(approxEq(rows(4).getAs[Double]("f2"), 0.2, 1e-12))
    assert(rows(8).getAs[Long]("nboxes") === 2L)
    assert(approxEq(rows(8).getAs[Double]("f2"), 5.0 / 21, 1e-12))
    val alpha = 0.5 * math.log((5.0 / 21) / 0.2) / math.log(2.0)
    assert(approxEq(rows(4).getAs[Double]("alpha"), alpha, 1e-12))
    assert(approxEq(rows(8).getAs[Double]("alpha"), alpha, 1e-12))
  }

  test("weibullMrr: exact Weibull quantile sample recovers shape/scale") {
    val (k, lam, n) = (1.5, 2.0, 5)
    val v = (1 to n).map { i =>
      val p = (i - 0.3) / (n + 0.4)
      lam * math.pow(-math.log(1 - p), 1 / k)
    }
    val df = v.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "v")
    val r = StatTests.weibullMrr(df, "v", "id").collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(approxEq(r.getAs[Double]("shape"), k, 1e-9))
    assert(approxEq(r.getAs[Double]("scale_"), lam, 1e-9))
  }

  test("allanVariance: stepped series 1,1,2,2,3,3 at tau 1 and 2") {
    // tau=2: group means 1,2,3 -> avar = (1+1)/(2*2) = 0.5
    // tau=1: diffs 0,1,0,1,0 -> avar = 2/(2*5) = 0.2
    val v = Seq(1.0, 1, 2, 2, 3, 3)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val rows = StatTests.allanVariance(df, "t", "v", Seq(1, 2)).collect()
      .map(r => r.getAs[Int]("tau") -> r).toMap
    assert(rows(2).getAs[Long]("groups") === 3L)
    assert(approxEq(rows(2).getAs[Double]("avar"), 0.5, 1e-12))
    assert(rows(1).getAs[Long]("groups") === 6L)
    assert(approxEq(rows(1).getAs[Double]("avar"), 0.2, 1e-12))
  }

  test("variogram: 1,2,4 on consecutive days at lags 1 and 2") {
    // h=1: pairs (1,2),(2,4) -> gamma = 5/4; h=2: (1,4) -> 9/2
    val df = Seq((ts(0), 1.0), (ts(1), 2.0), (ts(2), 4.0)).toDF("t", "v")
    val rows = StatTests.variogram(df, "t", "v", Seq(1, 2)).collect()
      .map(r => r.getAs[Int]("h") -> r).toMap
    assert(rows(1).getAs[Long]("n_pairs") === 2L)
    assert(approxEq(rows(1).getAs[Double]("gamma"), 1.25, 1e-12))
    assert(rows(2).getAs[Long]("n_pairs") === 1L)
    assert(approxEq(rows(2).getAs[Double]("gamma"), 4.5, 1e-12))
  }

  test("ripleyK: times 0,1,10s at r=2 -> two ordered pairs, K = 20/9") {
    // |ti - tj| <= 2s holds for (0,1) in BOTH orientations -> P = 2;
    // K = span*P/n^2 = 10*2/9; CSR ratio = K/(2r) = 20/36
    val base = 1704067200L * 1000L
    val df = Seq(0L, 1000L, 10000L)
      .map(ms => Tuple1(new java.sql.Timestamp(base + ms))).toDF("t")
    val r = StatTests.ripleyK(df, "t", Seq(2.0)).collect()(0)
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("pairs") === 2L)
    assert(approxEq(r.getAs[Double]("k_hat"), 20.0 / 9, 1e-12))
    assert(approxEq(r.getAs[Double]("ratio"), 20.0 / 36, 1e-12))
  }

  test("epanechnikovKde: two points, h=2 -> hand golden; far grid = 0") {
    // x = {0, 1}, g=0: (0.75 + 0.75*0.75)/(2*2) = 0.328125
    val df = Seq(0.0, 1.0).map(Tuple1(_)).toDF("v")
    val rows = StatTests.epanechnikovKde(df, "v", 2.0, Seq(0.0, 9.0))
      .collect().map(r => r.getAs[Double]("g") -> r).toMap
    assert(approxEq(rows(0.0).getAs[Double]("fhat"), 0.328125, 1e-12))
    assert(approxEq(rows(9.0).getAs[Double]("fhat"), 0.0, 1e-12))
  }

  test("localLinear: exact on a global linear trend (NW is not)") {
    val df = (0 to 4).map(i => (i.toDouble, 2.0 * i + 1)).toDF("x", "y")
    val rows = StatTests.localLinear(df, "x", "y", 1.5, Seq(0.0, 2.5))
      .collect().map(r => r.getAs[Double]("g") -> r).toMap
    assert(approxEq(rows(2.5).getAs[Double]("yhat"), 6.0, 1e-9))
    assert(approxEq(rows(0.0).getAs[Double]("yhat"), 1.0, 1e-9))
  }

  test("hillEstimator: dyadic sample 16,8,4,2 with k=3 -> alpha = 1/(2 ln 2)") {
    val df = Seq(16.0, 8.0, 4.0, 2.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = StatTests.hillEstimator(df, "v", "id", 3).collect()(0)
    assert(r.getAs[Long]("n_top") === 3L)
    assert(approxEq(r.getAs[Double]("threshold"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("inv_alpha"), 2 * math.log(2.0), 1e-12))
    assert(approxEq(r.getAs[Double]("alpha"), 1 / (2 * math.log(2.0)), 1e-12))
  }

  test("cornishFisher: symmetric sample -> CF q = mean + z*sd; exact p95") {
    // {1,2,3,4,5}: skew = 0, ex_kurt = -1.3; CF reduces to
    // mean + sd*(z - (z^3-3z)*1.3/24)
    val df = (1 to 5).map(_.toDouble).map(Tuple1(_)).toDF("v")
    val z = 1.6448536269514722
    val r = StatTests.cornishFisher(df, "v", 0.95, z).collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(approxEq(r.getAs[Double]("mean"), 3.0, 1e-12))
    val sd = math.sqrt(2.0)
    assert(approxEq(r.getAs[Double]("sd"), sd, 1e-12))
    assert(approxEq(r.getAs[Double]("skew"), 0.0, 1e-12))
    assert(approxEq(r.getAs[Double]("ex_kurt"), -1.3, 1e-12))
    val want = 3.0 + sd * (z + (z * z * z - 3 * z) * (-1.3) / 24)
    assert(approxEq(r.getAs[Double]("cf_q"), want, 1e-12))
    assert(approxEq(r.getAs[Double]("exact_q"), 4.8, 1e-12))
  }

  test("rqa: period-2 series is fully order-2 deterministic") {
    // v = 10,20,10,20,10,20 with eps=0: rec pairs = same-parity i<>j
    // n=6 -> 3+3 values per class, 3*2*2=12 pairs; every pair with a
    // successor in range stays recurrent -> det2 = 1
    val v = Seq(10L, 20, 10, 20, 10, 20)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.rqa(df, "t", "v", 0L).collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("rec_pairs") === 12L)
    assert(approxEq(r.getAs[Double]("rr"), 12.0 / 36, 1e-12))
    assert(approxEq(r.getAs[Double]("det2"), 1.0, 1e-12))
  }

  test("poincareSd: alternating series -> all jitter, zero level spread") {
    // v = 0,2,0,2: diffs/sqrt2 = -r2,r2,-r2 (r2 = sqrt 2), sums/sqrt2
    // all = r2 -> sd2 = 0; sd1 = population sd of (-r2,r2,-r2)
    val v = Seq(0.0, 2, 0, 2)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.poincareSd(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 3L)
    val r2 = math.sqrt(2.0)
    val mu = -r2 / 3
    val varD = ((-r2 - mu) * (-r2 - mu) * 2 + (r2 - mu) * (r2 - mu)) / 3
    assert(approxEq(r.getAs[Double]("sd1"), math.sqrt(varD), 1e-9))
    assert(approxEq(r.getAs[Double]("sd2"), 0.0, 1e-9))
  }

  test("tkeo: geometric series has zero Teager-Kaiser energy") {
    // interior points: 2^2 - 1*4 = 0 and 4^2 - 2*8 = 0
    val v = Seq(1.0, 2, 4, 8)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.tkeo(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n_interior") === 2L)
    assert(approxEq(r.getAs[Double]("mean_tkeo"), 0.0, 1e-12))
  }

  test("archLm: lag-1 square regression matches hand sums") {
    val v = Seq(0.0, 2, 0, 4, 0, 2)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val mu = v.sum / v.length
    val sq = v.map(x => (x - mu) * (x - mu))
    val pairs = sq.init.zip(sq.tail) // (sp, s)
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val cov = sxy - sx * sy / m
    val r2 = cov * cov / ((sxx - sx * sx / m) * (syy - sy * sy / m))
    val r = StatTests.archLm(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(approxEq(r.getAs[Double]("r2"), r2, 1e-9))
    assert(approxEq(r.getAs[Double]("lm"), m * r2, 1e-9))
  }

  test("extremalIndex: clustered exceedances give theta = 16/35") {
    // exceedances at i = 1..5 and 14: gaps 1,1,1,1,9 -> big-gap branch:
    // theta = 2*8^2/(5*56) = 16/35
    val exceed = Set(1, 2, 3, 4, 5, 14)
    val df = (1 to 20).map(i =>
      (ts(i), if (exceed(i)) 9.0 else 0.0)).toDF("t", "v")
    val r = StatTests.extremalIndex(df, "t", "v", 0.5).collect()(0)
    assert(r.getAs[Long]("n_exceed") === 6L)
    assert(approxEq(r.getAs[Double]("threshold"), 0.0, 1e-12))
    assert(approxEq(r.getAs[Double]("theta"), 16.0 / 35, 1e-12))
  }

  test("meanExcess: {1,5,10} at u = 0 and 4") {
    val df = Seq(1.0, 5.0, 10.0).map(Tuple1(_)).toDF("v")
    val rows = StatTests.meanExcess(df, "v", Seq(0.0, 4.0)).collect()
      .map(r => r.getAs[Double]("u") -> r).toMap
    assert(rows(0.0).getAs[Long]("n_exceed") === 3L)
    assert(approxEq(rows(0.0).getAs[Double]("mean_excess"), 16.0 / 3, 1e-12))
    assert(rows(4.0).getAs[Long]("n_exceed") === 2L)
    assert(approxEq(rows(4.0).getAs[Double]("mean_excess"), 3.5, 1e-12))
  }

  test("qqDecomp: affine arm B = 2A + 3 recovers slope/intercept, r2 = 1") {
    val a = (1 to 5).map(v => ("a", v.toDouble))
    val b = (1 to 5).map(v => ("b", 2.0 * v + 3))
    val df = (a ++ b).toDF("arm", "v")
    val r = StatTests.qqDecomp(df, "arm", "a", "b", "v",
      Seq(0.25, 0.5, 0.75)).collect()(0)
    assert(r.getAs[Long]("n_q") === 3L)
    assert(approxEq(r.getAs[Double]("slope"), 2.0, 1e-9))
    assert(approxEq(r.getAs[Double]("intercept"), 3.0, 1e-9))
    assert(approxEq(r.getAs[Double]("r2"), 1.0, 1e-12))
  }

  test("crossSpectrum: quarter-cycle lag gives re_norm = 0, im_norm = -1") {
    val x = Seq(1.0, 0, -1, 0, 1, 0, -1, 0)
    val y = Seq(0.0, 1, 0, -1, 0, 1, 0, -1)
    val df = x.indices.map(i => (ts(i), x(i), y(i))).toDF("t", "x", "y")
    val r = StatTests.crossSpectrum(df, "t", "x", "y", Seq(4)).collect()(0)
    assert(r.getAs[Int]("period") === 4)
    assert(approxEq(r.getAs[Double]("sxx"), 16.0, 1e-9))
    assert(approxEq(r.getAs[Double]("syy"), 16.0, 1e-9))
    assert(approxEq(r.getAs[Double]("re_norm"), 0.0, 1e-9))
    assert(approxEq(r.getAs[Double]("im_norm"), -1.0, 1e-9))
  }

  test("dcca: exact linear coupling gives rho = +-1") {
    val x = Seq(1.0, 3, 1, 3, 1, 3, 1, 3)
    val df = x.indices.map(i => (ts(i), x(i), 2 * x(i)))
      .toDF("t", "x", "y")
    val r = StatTests.dcca(df, "t", "x", "y", Seq(4)).collect()(0)
    assert(r.getAs[Long]("nboxes") === 2L)
    assert(approxEq(r.getAs[Double]("rho"), 1.0, 1e-12))
    val anti = x.indices.map(i => (ts(i), x(i), 10 - 2 * x(i)))
      .toDF("t", "x", "y")
    val ra = StatTests.dcca(anti, "t", "x", "y", Seq(4)).collect()(0)
    assert(approxEq(ra.getAs[Double]("rho"), -1.0, 1e-12))
  }

  test("dispersionEntropy: monotone 1..6 with m=3 gives ln5/(2 ln3)") {
    // classes 1,1,2,2,3,3 -> 5 distinct pair patterns, each once
    val df = (1 to 6).map(i => (ts(i), i.toDouble)).toDF("t", "v")
    val r = StatTests.dispersionEntropy(df, "t", "v", 3, 2).collect()(0)
    assert(r.getAs[Long]("t") === 5L)
    assert(r.getAs[Long]("n_distinct") === 5L)
    assert(approxEq(r.getAs[Double]("h_norm"),
      math.log(5.0) / (2 * math.log(3.0)), 1e-12))
  }

  test("burstiness: constant gaps -> B = -1; two gaps 1,3 -> B = -1/3") {
    val base = 1704067200L * 1000L
    def tf(ms: Seq[Long]) =
      ms.map(m => Tuple1(new java.sql.Timestamp(base + m))).toDF("t")
    val r = StatTests.burstiness(tf(Seq(0L, 60000L, 120000L, 180000L)), "t")
      .collect()(0)
    assert(r.getAs[Long]("n_gaps") === 3L)
    assert(approxEq(r.getAs[Double]("b"), -1.0, 1e-9))
    assert(r.isNullAt(r.fieldIndex("mem"))) // zero gap variance
    val r2 = StatTests.burstiness(tf(Seq(0L, 1000L, 4000L)), "t").collect()(0)
    assert(approxEq(r2.getAs[Double]("b"), -1.0 / 3, 1e-12))
  }

  test("potClusters: run of 5 plus isolated spike -> 2 clusters") {
    val exceed = Set(1, 2, 3, 4, 5, 14)
    val df = (1 to 20).map(i =>
      (ts(i), if (exceed(i)) 9.0 else 0.0)).toDF("t", "v")
    val r = StatTests.potClusters(df, "t", "v", 0.5, 3).collect()(0)
    assert(r.getAs[Long]("n_exceed") === 6L)
    assert(r.getAs[Long]("n_clusters") === 2L)
    assert(approxEq(r.getAs[Double]("mean_size"), 3.0, 1e-12))
    assert(r.getAs[Long]("max_size") === 5L)
  }

  test("seasonalMannKendall: rising season + flat season combine") {
    // A: 1,2,3 -> S=3; B: 5,5,5 -> S=0; Var = 2*(3*2*11/18) = 22/3
    val rows = Seq(("a", ts(0), 1.0), ("b", ts(1), 5.0), ("a", ts(2), 2.0),
      ("b", ts(3), 5.0), ("a", ts(4), 3.0), ("b", ts(5), 5.0))
    val df = rows.toDF("sea", "t", "v")
    val r = StatTests.seasonalMannKendall(df, "sea", "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("n_seasons") === 2L)
    assert(r.getAs[Long]("s") === 3L)
    assert(approxEq(r.getAs[Double]("z"), 2.0 / math.sqrt(22.0 / 3), 1e-12))
  }

  test("fisherG: dominant bin significant, two equal bins give p = 1") {
    val x = Seq(1.0, 0, -1, 0, 1, 0, -1, 0)
    val df = x.indices.map(i => (ts(i), x(i))).toDF("t", "v")
    val r = StatTests.fisherG(df, "t", "v", Seq(3, 4)).collect()(0)
    val g = r.getAs[Double]("g_stat")
    assert(g > 0.8) // period-3 bin keeps some leakage power at n = 8
    // N = 2, g > 1/2: p = 2(1-g) exactly
    assert(approxEq(r.getAs[Double]("p_value"), 2 * (1 - g), 1e-12))
    val eq = (0 until 32).map(i => (ts(i),
      math.sin(2 * math.Pi * i / 4.0 + 0.3) +
        math.sin(2 * math.Pi * i / 8.0 + 0.3))).toDF("t", "v")
    val re = StatTests.fisherG(eq, "t", "v", Seq(4, 8)).collect()(0)
    assert(approxEq(re.getAs[Double]("p_value"), 1.0, 1e-6))
  }

  test("zipFit: {0,0,0,2,4} -> lambda = 7/3, pi = 17/35") {
    val df = Seq(0.0, 0, 0, 2, 4).map(Tuple1(_)).toDF("v")
    val r = StatTests.zipFit(df, "v").collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(approxEq(r.getAs[Double]("mean"), 1.2, 1e-12))
    assert(approxEq(r.getAs[Double]("var_"), 2.56, 1e-12))
    assert(approxEq(r.getAs[Double]("lambda_"), 7.0 / 3, 1e-12))
    assert(approxEq(r.getAs[Double]("pi_"), 17.0 / 35, 1e-12))
  }

  test("greyGm11: exactly grey-generated series recovers the forecast") {
    // generate x0 from the grey equation with a = 0.2, b = 10:
    // x0_k = (b - a*x1_{k-1})/(1 + a/2); OLS recovers (a, b) exactly
    val (a0, b0) = (0.2, 10.0)
    val x0 = scala.collection.mutable.ArrayBuffer(1.0)
    var x1 = 1.0
    for (_ <- 2 to 6) {
      val nxt = (b0 - a0 * x1) / (1 + a0 / 2)
      x0 += nxt; x1 += nxt
    }
    val df = x0.toSeq.zipWithIndex.map { case (v, i) => (ts(i), v) }
      .toDF("t", "v")
    val rows = graft.operators.Forecast.greyGm11(df, "t", "v", 2)
      .collect().map(r => r.getAs[Int]("step") -> r).toMap
    val n = x0.length
    def fc(h: Int) = (1 - math.exp(a0)) * (x0.head - b0 / a0) *
      math.exp(-a0 * (n + h - 1))
    assert(approxEq(rows(1).getAs[Double]("yhat"), fc(1), 1e-9))
    assert(approxEq(rows(2).getAs[Double]("yhat"), fc(2), 1e-9))
  }

  test("adiCv2: intermittent pattern 2,0,0,4,0,4") {
    val v = Seq(2.0, 0, 0, 4, 0, 4)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.adiCv2(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n_buckets") === 6L)
    assert(r.getAs[Long]("n_demand") === 3L)
    assert(approxEq(r.getAs[Double]("adi"), 2.5, 1e-9))
    assert(approxEq(r.getAs[Double]("cv2"), 0.08, 1e-9))
    assert(r.getAs[String]("label") === "intermittent")
  }

  test("generalizedHurst: pure linear trend gives H(1) = H(2) = 1") {
    val df = (1 to 20).map(i => (ts(i), i.toDouble)).toDF("t", "v")
    val r = StatTests.generalizedHurst(df, "t", "v", Seq(1, 2, 4)).collect()(0)
    assert(approxEq(r.getAs[Double]("h1"), 1.0, 1e-9))
    assert(approxEq(r.getAs[Double]("h2"), 1.0, 1e-9))
    assert(approxEq(r.getAs[Double]("mf_gap"), 0.0, 1e-9))
  }

  test("circularLinearCorr: x = cos(theta) on the quarter grid -> R2 = 1") {
    val df = Seq((0, 1.0), (6, 0.0), (12, -1.0), (18, 0.0))
      .toDF("hr", "x")
    val r = StatTests.circularLinearCorr(df, "x", "hr", 24).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("r_xc"), 1.0, 1e-9))
    assert(approxEq(r.getAs[Double]("r_cs"), 0.0, 1e-9))
    assert(approxEq(r.getAs[Double]("r2"), 1.0, 1e-9))
  }

  test("spectralRolloff: pure period-4 tone rolls off at 4") {
    val v = Seq(1.0, 0, -1, 0, 1, 0, -1, 0)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.spectralRolloff(df, "t", "v", Seq(4, 8), 0.85)
      .collect()(0)
    assert(r.getAs[Int]("rolloff_period") === 4)
    assert(r.getAs[Double]("cum_share") > 0.99)
  }

  test("corrDim: two tight level pairs at radii 2/11") {
    // values 0,1,10,11: diffs {1,10,11,9,10,1}; C(2) = 2, C(11) = 6
    val v = Seq(0L, 1, 10, 11)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.corrDim(df, "t", "v", 2L, 11L).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("c1_pairs") === 2L)
    assert(r.getAs[Long]("c2_pairs") === 6L)
    assert(approxEq(r.getAs[Double]("d2"),
      math.log(3.0) / math.log(5.5), 1e-12))
  }

  test("drawdown: 10,5,8,4 level path") {
    val v = Seq(10.0, 5, 8, 4)
    val df = v.indices.map(i => (ts(i), v(i))).toDF("t", "v")
    val r = StatTests.drawdown(df, "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("peak"), 10.0, 1e-12))
    assert(approxEq(r.getAs[Double]("max_dd"), 6.0, 1e-12))
    assert(approxEq(r.getAs[Double]("max_dd_pct"), 0.6, 1e-12))
    assert(approxEq(r.getAs[Double]("ulcer"),
      math.sqrt((0.25 + 0.04 + 0.36) / 4), 1e-12))
  }

  test("sortinoOmega: {2,-1,3,-2} changes") {
    val df = Seq(2.0, -1, 3, -2).map(Tuple1(_)).toDF("r")
    val r = StatTests.sortinoOmega(df, "r").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(approxEq(r.getAs[Double]("mean_r"), 0.5, 1e-12))
    val ddev = math.sqrt(5.0 / 4)
    assert(approxEq(r.getAs[Double]("downside_dev"), ddev, 1e-12))
    assert(approxEq(r.getAs[Double]("sortino"), 0.5 / ddev, 1e-12))
    assert(approxEq(r.getAs[Double]("omega"), 5.0 / 3, 1e-12))
  }

  test("pickands: constructed spacings give xi = 1; short sample null") {
    val df = Seq(7.0, 3.0, 2.5, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = StatTests.pickands(df, "v", "id", 1).collect()(0)
    assert(approxEq(r.getAs[Double]("x_k"), 7.0, 1e-12))
    assert(approxEq(r.getAs[Double]("x_2k"), 3.0, 1e-12))
    assert(approxEq(r.getAs[Double]("x_4k"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("xi"), 1.0, 1e-12))
    val short = Seq(1.0, 2.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rs = StatTests.pickands(short, "v", "id", 1).collect()(0)
    assert(rs.isNullAt(rs.fieldIndex("xi")))
  }

  test("momentTailEstimator: {e^2, e, 1} with k=2 -> gamma = -2.5") {
    val e = math.exp(1.0)
    val df = Seq(e * e, e, 1.0, 0.5).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = StatTests.momentTailEstimator(df, "v", "id", 2).collect()(0)
    assert(approxEq(r.getAs[Double]("threshold"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("m1"), 1.5, 1e-9))
    assert(approxEq(r.getAs[Double]("m2"), 2.5, 1e-9))
    assert(approxEq(r.getAs[Double]("gamma_"), -2.5, 1e-9))
  }

  test("lanczosGamma: known values to 1e-12 relative") {
    val df = spark.range(1).select(
      StatTests.lanczosGamma(org.apache.spark.sql.functions.lit(1.0))
        .as("g1"),
      StatTests.lanczosGamma(org.apache.spark.sql.functions.lit(1.5))
        .as("g15"),
      StatTests.lanczosGamma(org.apache.spark.sql.functions.lit(0.5))
        .as("g05"))
    val r = df.collect()(0)
    assert(approxEq(r.getAs[Double]("g1"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("g15"), math.sqrt(math.Pi) / 2, 1e-12))
    assert(approxEq(r.getAs[Double]("g05"), math.sqrt(math.Pi), 1e-12))
  }

  test("gevLmomFit: matches a plain-Scala replication of the pipeline") {
    val v = Seq(12.0, 15, 11, 20, 18, 14, 25, 13, 16, 22, 19, 17)
    val df = v.zipWithIndex.map { case (x, i) => (ts(i), x) }.toDF("t", "v")
    val rows = StatTests.gevLmomFit(df, "v", Seq(10)).collect()
    // replicate: sorted ranks -> b-moments -> Hosking GEV
    val s = v.sorted
    val n = s.length.toDouble
    def bmom(ord: Int): Double = s.zipWithIndex.map { case (x, i0) =>
      val i = i0 + 1.0
      val w = (0 until ord).map(j => (i - 1 - j) / (n - 1 - j)).product
      x * w
    }.sum / n
    val (b0, b1, b2) = (bmom(0), bmom(1), bmom(2))
    val l1 = b0; val l2 = 2 * b1 - b0; val l3 = 6 * b2 - 6 * b1 + b0
    val t3 = l3 / l2
    val c = 2.0 / (3 + t3) - math.log(2) / math.log(3)
    val kappa = 7.8590 * c + 2.9554 * c * c
    def gamma(z: Double): Double = {
      val cs = StatTests.lanczosCoeffs
      val a = cs.head + cs.zipWithIndex.tail
        .map { case (cc, i) => cc / (z - 1 + i) }.sum
      math.sqrt(2 * math.Pi) * math.pow(z + 6.5, z - 0.5) *
        math.exp(-(z + 6.5)) * a
    }
    val g1k = gamma(1 + kappa)
    val alpha = l2 * kappa / ((1 - math.pow(2, -kappa)) * g1k)
    val mu = l1 - alpha * (1 - g1k) / kappa
    val y = -math.log(1 - 0.1)
    val ret = mu + alpha * (1 - math.pow(y, kappa)) / kappa
    val r = rows(0)
    assert(approxEq(r.getAs[Double]("kappa"), kappa, 1e-9))
    assert(approxEq(r.getAs[Double]("alpha_"), alpha, 1e-9))
    assert(approxEq(r.getAs[Double]("mu_"), mu, 1e-9))
    assert(r.getAs[Int]("ret_t") === 10)
    assert(approxEq(r.getAs[Double]("ret_level"), ret, 1e-9))
  }

  test("negBinFit: {0,1,2,5} -> r = 8/3, p = 4/7") {
    val df = Seq(0.0, 1, 2, 5).map(Tuple1(_)).toDF("v")
    val r = StatTests.negBinFit(df, "v").collect()(0)
    assert(approxEq(r.getAs[Double]("mean_"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("var_"), 3.5, 1e-12))
    assert(approxEq(r.getAs[Double]("r_"), 8.0 / 3, 1e-12))
    assert(approxEq(r.getAs[Double]("p_"), 4.0 / 7, 1e-12))
    // underdispersed -> null r
    val u = Seq(1.0, 1, 1, 1).map(Tuple1(_)).toDF("v")
    val ru = StatTests.negBinFit(u, "v").collect()(0)
    assert(ru.isNullAt(ru.fieldIndex("r_")))
  }

  test("jamesStein: k=4 groups shrink by 1 - sbar/S") {
    val rows = Seq(("a", 0.0), ("a", 2.0), ("b", 2.0), ("b", 4.0),
      ("c", 4.0), ("c", 6.0), ("d", 10.0), ("d", 12.0))
    val df = rows.toDF("g", "v")
    val out = StatTests.jamesStein(df, "g", "v").collect()
      .map(r => r.getAs[String]("group") -> r).toMap
    // se2 = (pop var 1)/2 each -> sbar = 0.5; gm = 5; S = 56
    val c = 1.0 - 0.5 / 56
    assert(approxEq(out("a").getAs[Double]("raw_mean"), 1.0, 1e-12))
    assert(approxEq(out("a").getAs[Double]("shrunk"), 5 - 4 * c, 1e-12))
    assert(approxEq(out("d").getAs[Double]("shrunk"), 5 + 6 * c, 1e-12))
  }

  test("tukeyAdditivity: exact product table puts ALL residual in 1 df") {
    // m = x*y: residual = a*b/gm exactly -> ss_nonadd = ss_res, F null
    val rows = for (x <- Seq(1.0, 2.0); y <- Seq(1.0, 3.0, 4.0))
      yield (s"r$x", s"c$y", x * y)
    val df = rows.toDF("r", "c", "v")
    val r = StatTests.tukeyAdditivity(df, "r", "c", "v").collect()(0)
    assert(r.getAs[Long]("cells_") === 6L)
    val sa2 = 2 * math.pow(4.0 / 3, 2)
    val sb2 = 10.5
    val expect = sa2 * sb2 / 16.0 // gm = 4
    assert(approxEq(r.getAs[Double]("ss_res"), expect, 1e-9))
    assert(approxEq(r.getAs[Double]("ss_nonadd"), expect, 1e-9))
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  test("decisionStump: perfect split wins with full parent gain") {
    val df = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L)).toDF("x", "y")
    val rows = StatTests.decisionStump(df, "x", "y", Seq(1.5, 2.5))
      .collect().map(r => r.getAs[Double]("thr") -> r).toMap
    assert(approxEq(rows(2.5).getAs[Double]("gini_gain"), 0.5, 1e-12))
    assert(rows(2.5).getAs[Boolean]("best"))
    assert(approxEq(rows(1.5).getAs[Double]("gini_gain"), 1.0 / 6, 1e-12))
    assert(!rows(1.5).getAs[Boolean]("best"))
  }

  test("blandAltman: diffs {1,3} -> bias 2, sd 1, none outside") {
    val df = Seq((2.0, 1.0), (5.0, 2.0)).toDF("a", "b")
    val r = StatTests.blandAltman(df, "a", "b").collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(approxEq(r.getAs[Double]("bias"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("sd_d"), 1.0, 1e-12))
    assert(approxEq(r.getAs[Double]("loa_low"), 2 - 1.96, 1e-12))
    assert(approxEq(r.getAs[Double]("loa_high"), 2 + 1.96, 1e-12))
    assert(r.getAs[Long]("n_outside") === 0L)
  }

  test("newcombeCi: matches a plain-Scala Wilson/Newcombe replication") {
    val rows = Seq(("a", 1L), ("a", 0L), ("a", 1L), ("a", 0L),
      ("b", 1L), ("b", 1L), ("b", 0L))
    val df = rows.toDF("arm", "s")
    val r = StatTests.newcombeCi(df, "arm", "a", "b", "s").collect()(0)
    val z = 1.959963984540054
    def wilson(x: Double, n: Double): (Double, Double, Double) = {
      val p = x / n
      val c = p + z * z / (n * 2)
      val h = z * math.sqrt(p * (1 - p) / n + z * z / (n * n * 4))
      val d = 1 + z * z / n
      (p, (c - h) / d, (c + h) / d)
    }
    val (p1, lo1, hi1) = wilson(2, 4)
    val (p2, lo2, hi2) = wilson(2, 3)
    assert(approxEq(r.getAs[Double]("p1"), p1, 1e-12))
    assert(approxEq(r.getAs[Double]("lo1"), lo1, 1e-12))
    assert(approxEq(r.getAs[Double]("hi2"), hi2, 1e-12))
    val diff = p1 - p2
    val dLo = diff - math.sqrt(math.pow(p1 - lo1, 2) + math.pow(hi2 - p2, 2))
    val dHi = diff + math.sqrt(math.pow(hi1 - p1, 2) + math.pow(p2 - lo2, 2))
    assert(approxEq(r.getAs[Double]("diff"), diff, 1e-12))
    assert(approxEq(r.getAs[Double]("d_lo"), dLo, 1e-12))
    assert(approxEq(r.getAs[Double]("d_hi"), dHi, 1e-12))
  }

  test("deming: exact line recovers slope/intercept (lambda = 1)") {
    val df = Seq((0.0, 1.0), (1.0, 3.0), (2.0, 5.0), (3.0, 7.0))
      .toDF("x", "y")
    val r = StatTests.deming(df, "x", "y", 1.0).collect()(0)
    assert(approxEq(r.getAs[Double]("slope"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("intercept"), 1.0, 1e-12))
  }

  test("heidkePeirce: balanced 2/1/1/2 table gives PSS = HSS = 1/3") {
    val rows = Seq((1L, 1L), (1L, 1L), (0L, 1L), (1L, 0L), (0L, 0L),
      (0L, 0L))
    val df = rows.toDF("obs", "fc")
    val r = StatTests.heidkePeirce(df, "obs", "fc").collect()(0)
    assert(r.getAs[Long]("hits") === 2L)
    assert(r.getAs[Long]("false_alarms") === 1L)
    assert(r.getAs[Long]("misses") === 1L)
    assert(r.getAs[Long]("corr_neg") === 2L)
    assert(approxEq(r.getAs[Double]("pss"), 1.0 / 3, 1e-12))
    assert(approxEq(r.getAs[Double]("hss"), 1.0 / 3, 1e-12))
  }

  test("powerMeans: {1,4} ladder HM < GM < AM < QM") {
    val df = Seq(1.0, 4.0).map(Tuple1(_)).toDF("v")
    val r = StatTests.powerMeans(df, "v").collect()(0)
    assert(approxEq(r.getAs[Double]("hm"), 1.6, 1e-12))
    assert(approxEq(r.getAs[Double]("gm"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("am"), 2.5, 1e-12))
    assert(approxEq(r.getAs[Double]("qm"), math.sqrt(8.5), 1e-12))
  }

  test("youdenCut: clean separation picks the separating cut with J = 1") {
    val df = Seq((1L, 10.0), (1L, 9.0), (0L, 1.0), (0L, 2.0))
      .toDF("y", "s")
    val rows = StatTests.youdenCut(df, "y", "s", Seq(1.5, 5.0)).collect()
      .map(r => r.getAs[Double]("thr") -> r).toMap
    assert(approxEq(rows(5.0).getAs[Double]("j"), 1.0, 1e-12))
    assert(rows(5.0).getAs[Boolean]("best"))
    assert(approxEq(rows(1.5).getAs[Double]("j"), 0.5, 1e-12))
    assert(!rows(1.5).getAs[Boolean]("best"))
  }

  test("hillDiversity: two equal keys -> D1 = D2 = 2, evenness 1") {
    val df = Seq("a", "a", "b", "b").map(Tuple1(_)).toDF("k")
    val r = StatTests.hillDiversity(df, "k").collect()(0)
    assert(r.getAs[Long]("s_") === 2L)
    assert(approxEq(r.getAs[Double]("d1"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("d2"), 2.0, 1e-12))
    assert(approxEq(r.getAs[Double]("evenness"), 1.0, 1e-12))
  }

  test("turnover: {1,2} -> {2,3} -> {3} day chain") {
    val rows = Seq((ts(0), 1L), (ts(0), 2L), (ts(1), 2L), (ts(1), 3L),
      (ts(2), 3L))
    val df = rows.toDF("d", "u")
    val out = StatTests.turnover(df, "d", "u").collect()
      .map(r => r.getAs[Int]("dd") -> r).toMap
    assert(out(0).getAs[Long]("n_prev") === 2L)
    assert(out(0).getAs[Long]("n_curr") === 2L)
    assert(out(0).getAs[Long]("n_common") === 1L)
    assert(approxEq(out(0).getAs[Double]("jaccard"), 1.0 / 3, 1e-12))
    assert(out(1).getAs[Long]("n_curr") === 1L)
    assert(approxEq(out(1).getAs[Double]("jaccard"), 0.5, 1e-12))
  }

  test("bws: fully separated 2x2 hand golden 1.6875") {
    // A = {1,2}, B = {3,4}: B_A = (9/8 + 9/2)/2, B_B = (9/8)/2
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L),
      ("b", 4.0, 4L)).toDF("arm", "v", "id")
    val r = StatTests.bws(df, "arm", "a", "b", "v", "id").collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(approxEq(r.getAs[Double]("b_stat"), 1.6875, 1e-12))
  }
}
