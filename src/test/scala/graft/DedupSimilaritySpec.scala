package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Dedup / similarity-search / text-analysis / multimodal operator specs —
  * golden fixtures in the style of the reference's per-operator tests
  * (/root/reference/forecastframe/tests/, hand-computed expectations).
  */
class DedupSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat today"),
    (2L, "the cat sat on the mat today"),           // exact dup of 1
    (3L, "the cat sat on the mat yesterday"),        // near dup of 1
    (4L, "completely different words entirely here now"),
    (5L, "")                                          // empty text
  ).toDF("id", "text")

  test("exactDedup keeps min id and counts duplicates") {
    val out = Dedup.exactDedup(docs, "text", "id")
      .orderBy("keep_id").collect()
    assert(out.length === 4) // 1&2 merge; 3, 4, 5 distinct
    val first = out.head
    assert(first.getAs[Long]("keep_id") === 1L && first.getAs[Long]("dup_cnt") === 2L)
    assert(out.map(_.getAs[Long]("dup_cnt")).sum === 5L)
  }

  test("minhash: identical texts get identical signatures, empty text gets null") {
    val sigs = Dedup.minhashSignature(docs, "text", k = 4)
      .orderBy("id").collect()
    val s1 = (0 until 4).map(i => sigs(0).getAs[Long](s"mh$i"))
    val s2 = (0 until 4).map(i => sigs(1).getAs[Long](s"mh$i"))
    assert(s1 === s2)
    assert(s1.forall(_ >= 0L)) // 60-bit hashes are non-negative
    assert(sigs(4).isNullAt(sigs(4).fieldIndex("mh0")))
  }

  test("LSH near-dup finds the exact-duplicate pair with jaccard 1.0") {
    val pairs = Dedup.lshNearDupPairs(docs, "text", "id", k = 8, bands = 4, threshold = 0.9)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L
      && r.getAs[Double]("jaccard") == 1.0))
    // the unrelated doc never pairs
    assert(!pairs.exists(r => r.getAs[Long]("id_a") == 4L || r.getAs[Long]("id_b") == 4L))
  }

  test("simhash: equal texts agree; near-dup hamming < far-pair hamming") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val hs = Dedup.withSimhash(docs, "text", "sh", bits = 16)
      .select("id", "sh").orderBy("id").collect()
    val Seq(h1, h2, h3, h4) = (0 until 4).map(i => hs(i).getAs[Long]("sh"))
    assert(h1 === h2)
    assert(hamming(h1, h3) <= hamming(h1, h4),
      s"near-dup hamming ${hamming(h1, h3)} should be <= far ${hamming(h1, h4)}")
    assert(hs(4).isNullAt(1)) // empty text -> null fingerprint
  }

  test("ngramJaccardPairs computes exact shingle jaccard") {
    // doc1/doc3: 7 words -> 5 trigram shingles each; they share the first 4
    // ("the cat sat","cat sat on","sat on the","on the mat") -> J = 4/6
    val pairs = Dedup.ngramJaccardPairs(
      docs.withColumn("g", lit("x")).filter($"id".isin(1L, 3L)),
      "text", "id", groupCols = Seq("g")).collect()
    assert(pairs.length === 1)
    assert(approxEq(pairs.head.getAs[Double]("jaccard"), 4.0 / 6.0))
  }

  test("ngramJaccardPairs df-cap: non-binding cap equals exact; binding cap drops hot shingles") {
    val g = docs.withColumn("g", lit("x"))
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        math.round(r.getAs[Double]("jaccard") * 1e9))).toSet
    val exact = Dedup.ngramJaccardPairs(g, "text", "id", Seq("g")).collect()
    val nonBinding = Dedup.ngramJaccardPairs(g, "text", "id", Seq("g"),
      maxDf = Some(1000L)).collect()
    assert(key(nonBinding) === key(exact))
    assert(exact.nonEmpty)
    // tau=1 keeps only df=1 shingles — nothing can intersect, so no pairs
    val tau1 = Dedup.ngramJaccardPairs(g, "text", "id", Seq("g"), maxDf = Some(1L)).collect()
    assert(tau1.isEmpty)
  }

  test("prefixJaccardJoin equals the naive exact join at every threshold") {
    // real corpus slice: the prefix filter must drop NO qualifying pair
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        math.round(r.getAs[Double]("jaccard") * 1e9))).toSet
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val naive = Dedup.ngramJaccardPairs(
        corpus.withColumn("g", lit("x")), "text", "doc_id", Seq("g"),
        minJaccard = tau).collect()
      val ppj = Dedup.prefixJaccardJoin(corpus, "text", "doc_id", tau = tau).collect()
      assert(key(ppj) === key(naive), s"tau=$tau mismatch")
    }
    // sanity: the corpus actually exercises the path (near-dup pairs exist)
    assert(Dedup.prefixJaccardJoin(corpus, "text", "doc_id", tau = 0.5).count() > 0)
  }

  private lazy val vecs = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(2f, 0f, 0f)),      // same direction as 1 -> cos 1
    (3L, Array(0f, 1f, 0f)),      // orthogonal to 1
    (4L, Array(-1f, 0f, 0f)),     // opposite to 1
    (5L, Array(1f, 1f, 0f))       // cos(1,5) = 1/sqrt(2)
  ).toDF("vec_id", "embedding")

  test("cosine + bruteForceTopK rank neighbors correctly") {
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 1L), vecs,
      "vec_id", "embedding", k = 4).orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L, 5L, 3L, 4L))
    assert(approxEq(top(0).getAs[Double]("sim"), 1.0))
    assert(approxEq(top(1).getAs[Double]("sim"), 1.0 / math.sqrt(2)))
    assert(approxEq(top(2).getAs[Double]("sim"), 0.0))
    assert(approxEq(top(3).getAs[Double]("sim"), -1.0))
  }

  test("bucketed ANN: same-direction vectors share a bucket; near-dup pairs found") {
    val dups = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.999, bits = 3, dim = 3, tables = 2).collect()
    assert(dups.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet === Set((1L, 2L)))
    // bucketed search from query 1 finds 2 (identical direction -> identical
    // bucket); 4 = -1 flips every projection, so its bucket is the bitwise
    // complement — Hamming distance 3 > the probe radius of 1
    val ann = Similarity.bucketedTopK(vecs.filter($"vec_id" === 1L), vecs,
      "vec_id", "embedding", k = 5, bits = 3, dim = 3).collect()
    val ids = ann.map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids.contains(2L) && !ids.contains(4L))
  }

  test("bucketed ANN recall@3 >= 0.9 vs brute force on a seeded clustered corpus") {
    val rnd = new scala.util.Random(42)
    val dim = 16
    // 20 unit-ish cluster centers, 10 members each with tight noise (within-
    // cluster cos ~0.99): the regime where ANN must find the true neighbors
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 200).map { i =>
      val c = centers(i / 10)
      (i.toLong, c.map(x => x + 0.07f * rnd.nextGaussian().toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 10 === 0) // one query per cluster
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 3))
    val approx = pairs(Similarity.bucketedTopK(queries, corpus, "vec_id", "embedding",
      k = 3, bits = 8, dim = dim, probeHamming = 1))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@3 $recall < 0.9 (found ${(exact intersect approx).size}/${exact.size})")
    // IVF on the same corpus: 16 seeded centroids, 4 probes
    val ivf = pairs(Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 3, nlist = 16, nProbe = 4))
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size
    assert(ivfRecall >= 0.8, s"IVF recall@3 $ivfRecall < 0.8")
  }

  test("tokenCounts + qualityScore hand-check") {
    val d = Seq((1L, "the cat, the cat!")).toDF("id", "text")
    val t = TextAnalysis.tokenCounts(d, "text").collect().head
    assert(t.getAs[Long]("ws_tokens") === 4L)       // the | cat, | the | cat!
    assert(t.getAs[Long]("regex_tokens") === 6L)    // the cat , the cat !
    assert(t.getAs[Long]("distinct_tokens") === 3L) // the, "cat,", "cat!"
    val q = TextAnalysis.qualityScore(d, "text").collect().head
    assert(q.getAs[Long]("n_tokens") === 4L)
    assert(approxEq(q.getAs[Double]("stopword_ratio"), 0.5))          // 2x "the"
    assert(approxEq(q.getAs[Double]("punct_ratio"), 2.0 / 17.0))      // , and !
    assert(approxEq(q.getAs[Double]("type_token_ratio"), 3.0 / 4.0))
    assert(approxEq(q.getAs[Double]("quality_score"), 0.75 * (1 - 2.0 / 17.0) * (4 / 20.0)))
  }

  test("repetitionRatios hand-check incl. empty-text nulls") {
    val d = Seq((1L, "a a b"), (2L, "x y z"), (3L, "p p p p"), (4L, "  "))
      .toDF("id", "text")
    val r = TextAnalysis.repetitionRatios(d, "text").orderBy("id").collect()
    // "a a b": words [a,a,b] -> 1/3 dup; 2-grams ["a a","a b"] distinct -> 0
    assert(approxEq(r(0).getAs[Double]("rep_word"), 1.0 / 3.0))
    assert(approxEq(r(0).getAs[Double]("rep_2gram"), 0.0))
    // all-distinct text: every ratio 0
    assert(approxEq(r(1).getAs[Double]("rep_word"), 0.0))
    assert(approxEq(r(1).getAs[Double]("rep_3gram"), 0.0))
    // "p p p p": 3/4 dup words; 2-grams ["p p"×3] -> 2/3; 3-grams ×2 -> 1/2
    assert(approxEq(r(2).getAs[Double]("rep_word"), 0.75))
    assert(approxEq(r(2).getAs[Double]("rep_2gram"), 2.0 / 3.0))
    assert(approxEq(r(2).getAs[Double]("rep_3gram"), 0.5))
    // whitespace-only text: no units at any size
    assert(r(3).isNullAt(r(3).fieldIndex("rep_word")))
    assert(r(3).isNullAt(r(3).fieldIndex("rep_3gram")))
  }

  test("redactPii replaces emails then IPs and counts matches") {
    val d = Seq(
      (1L, "mail a.b+c@x-y.example.org ip 10.0.255.3 end"),
      (2L, "no pii here"),
      (3L, "two bob@a.io carl@b.co and 1.2.3.4 5.6.7.8")).toDF("id", "text")
    val r = TextAnalysis.redactPii(d, "text").orderBy("id").collect()
    assert(r(0).getAs[Int]("n_emails") === 1 && r(0).getAs[Int]("n_ips") === 1)
    assert(r(0).getAs[String]("redacted") === "mail <EMAIL> ip <IP> end")
    assert(r(1).getAs[Int]("n_emails") === 0 && r(1).getAs[Int]("n_ips") === 0)
    assert(r(1).getAs[String]("redacted") === "no pii here")
    assert(r(2).getAs[Int]("n_emails") === 2 && r(2).getAs[Int]("n_ips") === 2)
    assert(r(2).getAs[String]("redacted") === "two <EMAIL> <EMAIL> and <IP> <IP>")
  }

  test("corpusFilter assigns the first failing gate as drop_reason") {
    val d = Seq(
      (1L, "too short"),                                     // n_tokens < 3
      (2L, Seq.fill(30)("w").zipWithIndex.map(p => p._1 + p._2).mkString(" ")), // 30 distinct tokens
      (3L, Seq.fill(40)("dup dup").mkString(" ")),           // repetitive AND low ttr
      (4L, (1 to 200).map("t" + _).mkString(" "))            // too long
    ).toDF("id", "text")
    val r = TextAnalysis.corpusFilter(d, "text",
        minQuality = 0.4, maxRep3gram = 0.2, minTokens = 3L, maxTokens = 100L)
      .orderBy("id").collect()
    assert(r(0).getAs[String]("drop_reason") === "too_short" && !r(0).getAs[Boolean]("keep"))
    assert(r(1).getAs[String]("drop_reason") === null && r(1).getAs[Boolean]("keep"))
    // low_quality fires BEFORE repetitive (gate order is the contract)
    assert(r(2).getAs[String]("drop_reason") === "low_quality")
    assert(r(3).getAs[String]("drop_reason") === "too_long")
    // with the quality gate disabled the same repetitive doc falls through
    // to the repetitive gate
    val r2 = TextAnalysis.corpusFilter(d, "text",
        minQuality = 0.0, maxRep3gram = 0.2, minTokens = 3L, maxTokens = 100L)
      .orderBy("id").collect()
    assert(r2(2).getAs[String]("drop_reason") === "repetitive")
  }

  test("langId predicts the dominant language on a separable corpus") {
    val train = Seq(
      (1L, "aaa bbb aaa bbb aaa", "aa"), (2L, "aaa bbb bbb aaa aaa", "aa"),
      (3L, "zzz yyy zzz yyy zzz", "zz"), (4L, "zzz zzz yyy yyy zzz", "zz")
    ).toDF("id", "text", "lang")
    val profiles = TextAnalysis.langProfiles(train, "text", "lang", topN = 20)
    val test = Seq((10L, "aaa bbb aaa"), (11L, "yyy zzz zzz")).toDF("id", "text")
    val preds = TextAnalysis.langId(test, "id", "text", profiles)
      .orderBy("id").collect()
    assert(preds.map(_.getAs[String]("pred_lang")).toSeq === Seq("aa", "zz"))
  }

  test("fingerprint: equal texts equal sketches; sketch is bottom-k of hashes") {
    val d = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "qrstuvwxyz"), (4L, "short"))
      .toDF("id", "text")
    val fps = d.select($"id", TextAnalysis.fingerprint($"text", k = 2, n = 8).as("fp"))
      .orderBy("id").collect()
    def fp(i: Int): Seq[Long] = fps(i).getSeq[Long](1)
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
    val fp1 = fp(0)
    assert(fp1.length === 2 && fp1 === fp1.sorted) // 3 shingles -> bottom 2, asc
    assert(fps(3).isNullAt(1)) // shorter than n=8 -> null
  }

  test("minhash: native signature expression equals the declarative formulation") {
    val texts = Seq(
      "", "one two", "one two three", "one two three four five six",
      "über schnelle füchse springen über faule hunde immer wieder",
      "日本語 の テキスト で 試験 する ハッシュ 窓 比較",
      ("the quick brown fox jumps over the lazy dog " * 20).trim
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = texts.toDF("doc_id", "text")
    val nat = Dedup.minhashSignature(d, "text", k = 4)
    val dec = Dedup.minhashSignatureDeclarative(d, "text", k = 4)
    val joined = nat.toDF("doc_id", "text", "n0", "n1", "n2", "n3")
      .join(dec.toDF("doc_id", "text2", "d0", "d1", "d2", "d3"), "doc_id")
    (0 until 4).foreach { i =>
      val bad = joined.filter(
        !(col(s"n$i") <=> col(s"d$i"))).count()
      assert(bad === 0, s"mh$i mismatch")
    }
  }

  test("fingerprint: native expression equals the declarative HOF formulation") {
    // multibyte unicode, repeats (distinctness), boundary lengths, empties
    val texts = Seq(
      "", "1234567", "12345678", "123456789",
      "aaaaaaaaaaaaaaaaaaaa",                     // all windows identical
      "über längere Straßen fährt man schnell",   // 2-byte chars
      "日本語のテキストで試験する — ハッシュ窓",   // 3-byte chars + punct
      "mixed ascii és ünïcöde 混合 text windows",
      ("the quick brown fox " * 50).trim
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = texts.toDF("id", "text")
    val both = d.select($"id",
        TextAnalysis.fingerprint($"text", k = 4, n = 8).as("nat"),
        TextAnalysis.fingerprintDeclarative($"text", k = 4, n = 8).as("dec"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch for id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"fp mismatch for id ${r.getLong(0)}")
    }
  }

  test("multimodal: real javax.imageio decode round-trips synthesized PNG dims; non-image falls back") {
    val d = Seq((7L, 3, 2), (8L, 1, 5)).toDF("id", "w", "h")
      .withColumn("payload", Multimodal.pngEncodeUdf(col("w"), col("h"), col("id")))
      .withColumn("url", col("id").cast("string"))
    val out = Multimodal.extractImageFeatures(d, "url", "payload")
      .collect().sortBy(_.url)
    assert(out(0).media_type === "image" && out(0).width === 3 && out(0).height === 2)
    assert(out(1).media_type === "image" && out(1).width === 1 && out(1).height === 5)
    val notImage = Seq(("u", "just text")).toDF("url", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val fb = Multimodal.extractImageFeatures(notImage, "url", "payload").collect().head
    assert(fb.media_type === "binary" && fb.width === 0 && fb.byte_len === 9L)
  }

  test("multimodal extractFeatures: batch decode plumbing + stub determinism") {
    val d = Seq(("u1", "hello world"), ("u2", "")).toDF("url", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val out = Multimodal.extractFeatures(d, "url", "payload").collect()
      .sortBy(_.url)
    val r = out.head
    assert(r.byte_len === 11L)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expSha = md.digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.sha_hex === expSha)
    assert(r.width === 64 + 'h'.toInt % 64 && r.height === 64 + 'e'.toInt % 64)
    assert(r.n_frames === 1 + 11 % 8)
    assert(out(1).byte_len === 0L && out(1).n_frames === 1)
  }

  test("canonicalizeUrl: case, ports, paths, param order, fragments, no-scheme") {
    import graft.functions.Hier
    val cases = Seq(
      ("HTTPS://Ex.COM:443/a?b=2&a=1#x", "https://ex.com/a?a=1&b=2"),
      ("http://ex.com:80", "http://ex.com/"),
      ("http://ex.com:8080/p", "http://ex.com:8080/p"),
      ("https://ex.com:80/p", "https://ex.com:80/p"), // 80 is not https default
      ("http://EX.com/p?z=1&&y=2&", "http://ex.com/p?y=2&z=1"),
      ("ftp://Files.ex.com/f", "ftp://files.ex.com/f"),
      ("no-scheme.com/path", null),
      ("https://ex.com#only-frag", "https://ex.com/"))
    val out = cases.zipWithIndex.map { case ((u, _), i) => (i, u) }
      .toDF("i", "url")
      .withColumn("canon", Hier.canonicalizeUrl(col("url")))
      .orderBy("i").collect()
    cases.zipWithIndex.foreach { case ((u, exp), i) =>
      val got = if (out(i).isNullAt(2)) null else out(i).getString(2)
      assert(got == exp, s"$u → $got, expected $exp")
    }
    // idempotence: canon(canon(u)) == canon(u)
    val twice = cases.toDF("url", "exp")
      .withColumn("c1", Hier.canonicalizeUrl(col("url")))
      .withColumn("c2", Hier.canonicalizeUrl(col("c1")))
      .filter(col("c1").isNotNull)
      .filter(col("c1") =!= col("c2")).count()
    assert(twice == 0L, "canonicalization must be idempotent")
  }

  test("chunkDedup: first occurrence wins, reassembly ordered, empty doc kept") {
    // doc 1: chunks A B; doc 2: chunks B C (B repeats → dropped); doc 3: empty
    val a = (1 to 3).map(i => s"a$i").mkString(" ")
    val b = (1 to 3).map(i => s"b$i").mkString(" ")
    val c = (1 to 3).map(i => s"c$i").mkString(" ")
    val df = Seq((1L, s"$a $b"), (2L, s"$b $c"), (3L, "")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2) // doc 1 keeps all
    assert(out(0).getString(3) == s"$a $b")
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 1) // doc 2 loses B
    assert(out(1).getString(3) == c)
    assert(out(2).getLong(1) == 0 && out(2).getString(3) == "") // empty doc row kept
    // within-doc repeat: the SECOND occurrence in the same doc is dropped too
    val rep = Seq((1L, s"$a $a $b")).toDF("doc_id", "text")
    val r = Dedup.chunkDedup(rep, "doc_id", "text", chunkWords = 3).collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getString(3) == s"$a $b")
  }

  test("vocabulary: hand TTR/hapax; zipfSlope exactly -1 on a constructed corpus") {
    import graft.operators.TextAnalysis
    // "a a a b b c": 6 tokens, 3 types, 1 hapax (c)
    val d = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(d, "doc_id", "text").collect()(0)
    assert(v.getLong(v.fieldIndex("n_tokens")) == 6L)
    assert(v.getLong(v.fieldIndex("n_types")) == 3L)
    assert(v.getLong(v.fieldIndex("n_hapax")) == 1L)
    assert(math.abs(v.getDouble(v.fieldIndex("ttr")) - 0.5) < 1e-12)
    assert(math.abs(v.getDouble(v.fieldIndex("hapax_ratio")) - 1.0 / 3) < 1e-12)
    // freq(rank r) = 48/r: ln(freq) = ln(48) - ln(rank) exactly, so the
    // ln-ln OLS slope is exactly -1
    val words = Seq(("t1", 48), ("t2", 24), ("t3", 16), ("t4", 12))
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    val corpus = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val z = TextAnalysis.zipfSlope(corpus, "text", topK = 4).collect()(0)
    assert(math.abs(z.getDouble(z.fieldIndex("zipf_slope")) - (-1.0)) < 1e-9)
    assert(z.getLong(z.fieldIndex("n_terms")) == 4L)
    assert(z.getLong(z.fieldIndex("max_freq")) == 48L)
  }

  test("dHash: gradient goldens, identical/noisy/unrelated distances, banded near-dup pairs") {
    import graft.operators.Multimodal
    def png(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    def gray(v: Int) = { val c = math.min(255, math.max(0, v)); (c << 16) | (c << 8) | c }
    // horizontal gradient: every sampled right-neighbor is brighter -> all
    // 64 bits set; vertical gradient: constant along x -> zero
    val hGrad = png((x, _) => gray(x * 4))
    val vGrad = png((_, y) => gray(y * 4))
    assert(Multimodal.DHash.ofBytes(hGrad).get == -1L)
    assert(Multimodal.DHash.ofBytes(vGrad).get == 0L)
    // identical bytes hash identically; mild noise on a strong gradient
    // stays within a few bits; an unrelated hash-pixel image is far
    val rnd = new scala.util.Random(11)
    val noisy = png((x, _) => gray(x * 4 + rnd.nextInt(3) - 1))
    val unrelated = png((x, y) => ((x * 2654435761L + y * 40503 + 7).toInt) & 0xffffff)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h0 = Multimodal.DHash.ofBytes(hGrad).get
    assert(ham(h0, Multimodal.DHash.ofBytes(png((x, _) => gray(x * 4))).get) == 0)
    assert(ham(h0, Multimodal.DHash.ofBytes(noisy).get) <= 8)
    assert(ham(h0, Multimodal.DHash.ofBytes(unrelated).get) >= 16)
    // frame + banded candidate join: the planted near-pair survives, the
    // unrelated image does not pair with the gradients
    val df = Seq(("a", hGrad), ("b", noisy), ("c", unrelated))
      .toDF("id", "payload")
    val hashes = Multimodal.imageDHash(df, "id", "payload")
    assert(hashes.filter(col("dhash").isNull).isEmpty)
    val pairs = Multimodal.nearDupImages(hashes, "id", maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet == Set(("a", "b")))
    // undecodable payload -> null hash, dropped from pairing
    val bad = Seq(("z", Array[Byte](1, 2, 3))).toDF("id", "payload")
    assert(Multimodal.imageDHash(bad, "id", "payload")
      .filter(col("dhash").isNotNull).isEmpty)
  }

  test("dtw: identity 0, hand DP golden, shift-tolerant vs Euclidean, band binds") {
    import graft.operators.Similarity
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(Similarity.dtw(a, a, band = 2) == 0.0)
    // hand DP: a=[1,3], b=[1,2,3], L1: optimal path 1->1, 3~2? DP gives
    // |1-1| + |1-2|? ... classic result: cost 1 via (1,1)(1,2)? compute:
    // path (1,1)=0 -> (2,2)=|3-2|=1 -> (2,3)=1+|3-3|=1. total 1
    assert(Similarity.dtw(Array(1.0, 3.0), Array(1.0, 2.0, 3.0), band = 2) == 1.0)
    // a sine shifted by one step: DTW absorbs the shift, Euclidean pays it
    val base = (0 until 40).map(i => math.sin(i * 0.3)).toArray
    val shifted = (0 until 40).map(i => math.sin((i - 1) * 0.3)).toArray
    val euclid = base.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    val d = Similarity.dtw(base, shifted, band = 3)
    assert(d < euclid / 3, s"dtw $d should beat pointwise L1 $euclid")
    // band=1 forbids the warp a 3-step shift needs: distance grows
    val far = (0 until 40).map(i => math.sin((i - 3) * 0.3)).toArray
    assert(Similarity.dtw(base, far, band = 1) > Similarity.dtw(base, far, band = 5))
    // frame: per-key distance to a reference; the matching key is closest
    val ref = (1 to 10).map(_.toDouble)
    val rows = (1 to 10).flatMap { i =>
      Seq((1L, i.toLong, i.toDouble),              // equals the reference
        (2L, i.toLong, i.toDouble + 5.0),          // level-shifted
        (3L, i.toLong, 11.0 - i))                  // reversed
    }.map { case (k, t, v) =>
      (k, new java.sql.Timestamp((1704067200L + t * 60) * 1000L), v) }
    val out = Similarity.dtwToReference(rows.toDF("k", "ts", "v"), Seq("k"),
      "ts", "v", ref, band = 3).orderBy("k").collect()
    assert(out(0).getDouble(out(0).fieldIndex("dtw")) == 0.0)
    assert(out(0).getDouble(1) < out(1).getDouble(1))
    assert(out(1).getDouble(1) < out(2).getDouble(1))
  }

  test("minhashJaccardEst: identical docs estimate exactly 1; est bounded in [0,1]") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, "g", base), (2L, "g", base),                     // identical pair
      (3L, "g", base + " with a different tail entirely"),  // near-dup
      (4L, "g", "completely unrelated words nowhere near the others at all"))
      .toDF("id", "grp", "text")
    val out = Dedup.minhashJaccardEst(docs, "text", "id", Seq("grp"), k = 8)
      .collect()
    val pairs = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
      (r.getAs[Double]("jaccard"), r.getAs[Double]("est"))).toMap
    // identical docs: every signature component agrees, exact jaccard 1
    assert(pairs((1L, 2L)) === ((1.0, 1.0)))
    out.foreach { r =>
      val est = r.getAs[Double]("est")
      assert(est >= 0.0 && est <= 1.0)
      assert(r.getAs[Double]("err") === est - r.getAs[Double]("jaccard"))
    }
  }
}
