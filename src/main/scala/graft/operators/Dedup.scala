package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing._

/** Large-scale document deduplication: exact, MinHash+LSH, SimHash, and
  * n-gram Jaccard. (Embedding-cosine near-dup lives in [[Similarity]].)
  *
  * The reference has only a PK-uniqueness dedup
  * (/root/reference/forecastframe/main.py:58-69 `drop_duplicates` assertion);
  * these operators are the training-data-pipeline extensions the engine needs
  * at Common-Crawl scale.
  *
  * Scale design:
  *   - exact dedup = one hash-shuffle on a 128-bit digest (never on the full
  *     text), min-id representative via a single groupBy — map-side partial
  *     `min` applies.
  *   - MinHash: signatures are one narrow pass (shingle arrays never leave the
  *     row — higher-order functions, no explode, no shuffle). LSH banding
  *     turns the O(n²) pair space into an equi-join on (band, bucket-hash):
  *     a plain shuffle join Catalyst/AQE can size, salt-free because bucket
  *     keys are hashes (uniform by construction); candidate verification
  *     re-computes exact Jaccard only on the tiny candidate set.
  *   - SimHash: one pass, per-bit majority vote folded into a single 16-bit
  *     int per doc — groupBy-free (pure projection), dedup by equal/near
  *     fingerprints is again an equi-join on the fingerprint.
  *   - all hashes are MD5-derived ([[graft.functions.Hashing]]) so the DuckDB
  *     oracle replays the identical algorithm.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on a content digest: keeps the smallest `idCol` per distinct
    * `textCol` value. Output: one row per distinct content with
    * `keep_id, dup_cnt`. The shuffle key is md5(text) (32 bytes), not the
    * document body — at 100 TB the texts stay where they are and only
    * digests + ids move.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // -------------------------------------------------------------- MinHash

  /** MinHash signature columns `mh0 .. mh{k-1}` over word-`n`-gram shingles:
    * mh_i = min over shingles of md5Long("i:" ++ shingle); docs with no
    * shingles get null signatures. Computed entirely with array higher-order
    * functions — no explode, no shuffle, whole-stage-codegen friendly.
    */
  def minhashSignature(df: DataFrame, textCol: String, k: Int, shingleN: Int = 3): DataFrame = {
    // words and shingles staged as real columns (separate projections) so the
    // signature expression references a cheap attribute, never re-derives the
    // arrays — see Hashing.wordShingles scaladoc. The whole k-column
    // signature is ONE native pass over the shingles
    // ([[graft.functions.MinHashSigExpr]]: precomputed seed-prefix bytes,
    // thread-local digest, primitive running minima) — the declarative
    // k × array_min(transform(...)) form it is property-tested equal to
    // pays ~3k string allocations per shingle.
    val staged = df
      .withColumn("_ws", words(col(textCol)))
      .withColumn("_sh", wordShinglesOf(col("_ws"), shingleN))
      .withColumn("_sig", graft.functions.MinHashSigExpr(col("_sh"), k))
    val sigCols = (0 until k).map(i => element_at(col("_sig"), i + 1).as(s"mh$i"))
    staged.select((df.columns.map(col).toSeq ++ sigCols): _*)
  }

  /** Declarative formulation of [[minhashSignature]]'s signature columns —
    * the parity oracle for [[graft.functions.MinHashSigExpr]].
    */
  private[graft] def minhashSignatureDeclarative(df: DataFrame, textCol: String,
                                                k: Int, shingleN: Int = 3): DataFrame = {
    val staged = df
      .withColumn("_ws", words(col(textCol)))
      .withColumn("_sh", wordShinglesOf(col("_ws"), shingleN))
    val sigCols = (0 until k).map(i =>
      array_min(transform(col("_sh"), s => md5LongSeeded(i, s))).as(s"mh$i"))
    staged.select((df.columns.map(col).toSeq ++ sigCols): _*)
  }

  /** LSH band buckets: the k signature values split into `bands` bands of
    * k/bands rows each; bucket key = md5Long("band:v1,v2,.."); one output row
    * per (doc, band).
    *
    * PLAN SHAPE MATTERS HERE: the band id is exploded from a *literal*
    * sequence and the bucket hash is computed *above* the Generate from plain
    * mh attributes. Computing the bucket array first and posexploding it
    * looks equivalent, but column pruning then leaves every staged projection
    * below the Generate with exactly one reference, CollapseProject inlines
    * the whole minhash pipeline into the generator, and the lambda-internal
    * word arrays degrade to O(words²) re-splits per row (measured 40× slower).
    */
  def lshBuckets(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible into $bands bands")
    val rows = k / bands
    val bucketExpr = (0 until bands).foldLeft(lit(null).cast("long")) { (acc, b) =>
      val cat = concat_ws(",", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
      when(col("band") === b, md5Long(concat(lit(s"$b:"), cat))).otherwise(acc)
    }
    sigs.select(col("*"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", bucketExpr)
  }

  /** Near-duplicate pairs via MinHash LSH: candidate pairs share at least one
    * (band, bucket); candidates are verified with exact shingle Jaccard and
    * kept when `jaccard >= threshold`. Output: `id_a < id_b, jaccard`.
    *
    * The verify join re-attaches shingle sets only for candidate ids
    * (a semi-join-sized set), so the expensive set intersection runs on
    * |candidates|, not |docs|².
    */
  def lshNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                      k: Int = 8, bands: Int = 4, shingleN: Int = 3,
                      threshold: Double = 0.9): DataFrame = {
    // pre-filter shingle-less docs on a cheap predicate (one split per row);
    // filtering on mh0.isNotNull instead would push the entire inlined
    // minhash tree down into the scan filter
    val sigs = minhashSignature(
      df.select(col(idCol), col(textCol))
        .filter(size(words(col(textCol))) >= shingleN),
      textCol, k, shingleN)
    // materialize the NARROW bucket table (id, band, bucket — ~24 B/row,
    // |docs|×bands rows) before the self-join: the two join sides are
    // column-renamed copies of the same subtree, and Catalyst's exchange
    // reuse cannot unify them, so without materialization the full-corpus
    // shingle+digest signature pass runs TWICE. localCheckpoint, not cache():
    // blocks are GC-released (ContextCleaner), no CacheManager entry to leak
    // across repeated calls (same rationale as Similarity.nearDupPairs).
    val buckets = lshBuckets(sigs, k, bands)
      .select(col(idCol), col("band"), col("bucket"))
      .localCheckpoint()
    val a = buckets.toDF(Seq("id_a", "band", "bucket"): _*)
    val b = buckets.toDF(Seq("id_b", "band", "bucket"): _*)
    // candidate pairs referenced three times below (two id-set branches +
    // verify join); bounded small by the band/bucket construction
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .localCheckpoint()
    // verify needs shingle sets ONLY for candidate ids — a semi-join-sized
    // subset. Computing arrays for the whole corpus first would be wasted
    // work at 100 TB (candidates are a vanishing fraction of docs).
    val candIds = cand.select(col("id_a").as("_cid"))
      .unionByName(cand.select(col("id_b").as("_cid"))).distinct()
    val sh = df
      .join(candIds, col(idCol) === col("_cid"), "left_semi")
      .withColumn("_ws", words(col(textCol)))
      .select(col(idCol).as("id"),
        array_distinct(wordShinglesOf(col("_ws"), shingleN)).as("sh"))
    cand
      .join(sh.toDF("id_a", "sh_a"), Seq("id_a"))
      .join(sh.toDF("id_b", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .withColumn("jaccard", when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(null)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -------------------------------------------------------------- SimHash

  /** SimHash fingerprint over distinct words: for each of `bits` bit
    * positions j, the fingerprint bit is 1 iff the majority of word hashes
    * have bit j set (sum of ±1 votes >= 0). Pure projection — no shuffle.
    * The word-hash array is staged as a column so the `bits` vote
    * expressions read a cheap attribute (no per-bit re-hash).
    */
  def withSimhash(df: DataFrame, textCol: String, outCol: String = "simhash",
                  bits: Int = 16): DataFrame = {
    val staged = df
      .withColumn("_dw", array_distinct(words(col(textCol))))
      .withColumn("_hs", transform(col("_dw"), w => md5Long(w)))
    val bitCols = (0 until bits).map { j =>
      val votes = aggregate(col("_hs"), lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(votes >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    staged
      .withColumn(outCol, when(size(col("_dw")) === 0, lit(null).cast("long"))
        .otherwise(bitCols.reduce(_ + _)))
      .drop("_dw", "_hs")
  }

  /** n-gram Jaccard similarity of every intra-group document pair
    * (`id_a < id_b`), computed by exploding shingles and equi-joining on the
    * shingle — the distributed formulation (|A∩B| from the join,
    * |A∪B| = |A|+|B|-|A∩B| from per-doc sizes). `groupCols` bounds the pair
    * space (e.g. same lang); at web scale this is the "within-bucket" pattern
    * — never a global cross join.
    *
    * SKEW: the raw shingle is the join key, and a corpus-frequent shingle
    * ("of the and" class) with document frequency df produces ~df²/2 join
    * rows — quadratic in the hottest key. `maxDf` caps this: shingles with
    * document frequency > maxDf (within the group) are dropped from BOTH the
    * intersection and the union, bounding the self-join fan-out at
    * Σ_s min(df_s, maxDf)² and making the result the Jaccard over the
    * df≤maxDf shingle universe. With maxDf ≥ max df it equals the exact
    * Jaccard (property-tested); at web scale a small τ (100–1000) drops only
    * stop-shingles that carry no dedup signal anyway.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        groupCols: Seq[String], shingleN: Int = 3,
                        minJaccard: Double = 0.0,
                        maxDf: Option[Long] = None): DataFrame = {
    val docs = df
      .withColumn("_ws", words(col(textCol)))
      .select((groupCols.map(col) :+ col(idCol).as("id") :+
        array_distinct(wordShinglesOf(col("_ws"), shingleN)).as("sh")): _*)
      .filter(size(col("sh")) > 0)
    val exAll = docs.select((groupCols.map(col) :+ col("id") :+ explode(col("sh")).as("s")): _*)
    // df-cap: one count shuffle on (group, shingle), then a semi-join that
    // keeps only rare shingles — cheap relative to the quadratic join it
    // prevents. The uncapped path skips both (sizes come free from the array).
    val (ex, sizes) = maxDf match {
      case Some(tau) =>
        val rare = exAll.groupBy((groupCols.map(col) :+ col("s")): _*)
          .agg(count(lit(1)).as("_df")).filter(col("_df") <= tau)
          .select((groupCols.map(col) :+ col("s")): _*)
        // a using-columns join moves the join keys to the FRONT of the output
        // — reselect the canonical (group, id, s) order the positional toDF
        // renames below depend on.
        // localCheckpoint: `kept` is consumed THREE times downstream (both
        // self-join sides + the per-doc size count); without it each consumer
        // re-runs the scan→split→shingle→explode→semi-join pipeline — at
        // corpus scale that triples the most expensive stage. The
        // materialized set is only the df≤τ shingles (bounded by the cap).
        val kept = exAll.join(rare, groupCols :+ "s", "left_semi")
          .select((groupCols.map(col) :+ col("id") :+ col("s")): _*)
          .localCheckpoint()
        val n = kept.groupBy((groupCols.map(col) :+ col("id")): _*)
          .agg(count(lit(1)).as("n"))
        (kept, n)
      case None =>
        (exAll, docs.select((groupCols.map(col) :+ col("id") :+ size(col("sh")).as("n")): _*))
    }
    val inter = ex.toDF((groupCols :+ "id_a" :+ "s"): _*)
      .join(ex.toDF((groupCols :+ "id_b" :+ "s"): _*), groupCols :+ "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy((groupCols.map(col) :+ col("id_a") :+ col("id_b")): _*)
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF((groupCols :+ "id_a" :+ "n_a"): _*), groupCols :+ "id_a")
      .join(sizes.toDF((groupCols :+ "id_b" :+ "n_b"): _*), groupCols :+ "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select((groupCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("jaccard")): _*)
  }

  /** MinHash Jaccard ESTIMATE vs exact, per same-group candidate pair:
    * `est = (1/k)·Σᵢ 1[mhᵢ(a) = mhᵢ(b)]` — each signature component agrees
    * with probability exactly the Jaccard (Broder 1997), so est is an
    * unbiased k-sample estimate of the exact value. This is the calibration
    * readout for choosing k and the LSH band layout: run it on a bounded
    * sample, look at the err distribution, size k to the tolerance.
    *
    * Pairs are [[ngramJaccardPairs]]'s candidates (shared-shingle
    * equi-join — covers every pair with a non-empty intersection, which is
    * every pair where est vs exact is informative); signatures are ONE
    * native pass ([[minhashSignature]]); the agreement count is a
    * fixed-order literal fold over the k component columns — integer-exact,
    * replayable.
    */
  def minhashJaccardEst(df: DataFrame, textCol: String, idCol: String,
                        groupCols: Seq[String], k: Int, shingleN: Int = 3,
                        maxDf: Option[Long] = None): DataFrame = {
    val exact = ngramJaccardPairs(df, textCol, idCol, groupCols, shingleN,
      minJaccard = 0.0, maxDf = maxDf)
    val sigs = minhashSignature(df, textCol, k, shingleN)
      .select((groupCols.map(col) ++ Seq(col(idCol)) ++
        (0 until k).map(i => col(s"mh$i"))): _*)
    val a = sigs.toDF((groupCols ++ Seq("id_a") ++ (0 until k).map(i => s"_a$i")): _*)
    val b = sigs.toDF((groupCols ++ Seq("id_b") ++ (0 until k).map(i => s"_b$i")): _*)
    val agree = (0 until k)
      .map(i => when(col(s"_a$i") === col(s"_b$i"), 1L).otherwise(0L))
      .reduce(_ + _) // fixed left-assoc order over the literal component list
    exact
      .join(a, groupCols :+ "id_a")
      .join(b, groupCols :+ "id_b")
      .withColumn("est", agree.cast("double") / lit(k.toDouble))
      .withColumn("err", col("est") - col("jaccard"))
      .select((groupCols.map(col) :+ col("id_a") :+ col("id_b") :+
        col("jaccard") :+ col("est") :+ col("err")): _*)
  }

  /** Asymmetric shingle CONTAINMENT |Sa ∩ Sb| / |Sa| — the quote/subset
    * detector Jaccard misses: a short page wholly embedded in a long one
    * scores near 1.0 here but near |a|/|b| under Jaccard (Broder 1997's
    * containment, public paper). Emits ORDERED pairs (contained, container)
    * with containment ≥ `minContainment` and a ≠ b; both directions of a
    * pair can appear when each clears the threshold.
    *
    * Same candidate plan as [[ngramJaccardPairs]] (shared-shingle
    * self-join, optional `maxDf` hot-shingle cap — at web scale the cap is
    * MANDATORY, the scaladoc bound there applies unchanged); only the
    * final ratio differs, so intersection counts stay integer-exact and
    * the single division is the one float.
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       shingleN: Int = 3, minContainment: Double = 0.5,
                       maxDf: Option[Long] = None): DataFrame = {
    // materialized once: consumed by BOTH renamed copies of the shared-
    // shingle self-join plus the `sizes` branch — un-materialized, the
    // tokenize + shingle pass over the corpus runs three times (Catalyst's
    // exchange reuse cannot unify column-renamed copies; guide §2.4)
    val docs = df
      .withColumn("_ws", words(col(textCol)))
      .select(col(idCol).as("id"),
        array_distinct(wordShinglesOf(col("_ws"), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val exAll = docs.select(col("id"), explode(col("sh")).as("s"))
    val (ex, sizes) = maxDf match {
      case Some(tau) =>
        val rare = exAll.groupBy("s").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= tau).select("s")
        val kept = exAll.join(rare, Seq("s"), "left_semi")
          .select(col("id"), col("s")).localCheckpoint()
        (kept, kept.groupBy("id").agg(count(lit(1)).as("n")))
      case None =>
        (exAll, docs.select(col("id"), size(col("sh")).cast("long").as("n")))
    }
    ex.toDF("id_a", "s")
      .join(ex.toDF("id_b", "s"), "s")
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .withColumn("containment", col("inter").cast("double") / col("n_a").cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("containment"))
  }

  /** Prefix-filtered EXACT Jaccard similarity join (the PPJoin family —
    * Chaudhuri/Ganti/Kaushik 2006 "A Primitive Operator for Similarity
    * Joins", Xiao et al. 2008, public papers): all pairs with shingle
    * Jaccard ≥ `tau`, with NO group/bucket restriction and NO approximation
    * — same result set as [[ngramJaccardPairs]] at `minJaccard = tau`, but
    * sub-quadratic where that operator's raw shared-shingle join is df²
    * in the hottest shingle.
    *
    * Prefix-filter theorem: order every document's shingles by one GLOBAL
    * canonical order (ascending corpus document-frequency, ties by shingle
    * text — rarest first); if J(A,B) ≥ τ then A and B must share at least
    * one shingle inside their first |X| − ⌈τ·|X|⌉ + 1 shingles. So the
    * candidate join runs only on those prefixes — hot "of the and"
    * shingles sit at the END of the order and never generate candidates,
    * which is exactly the skew the raw join dies on. ⌈·⌉ is computed as
    * `ceil(τ·n − 1e-9)`: float wobble can only LENGTHEN a prefix (keeps
    * completeness; a longer prefix only adds candidates).
    *
    * Plan: one df-count shuffle on the shingle, one per-doc window to cut
    * prefixes (partitioned by doc id — bounded by doc length), the prefix
    * self-join with the τ·|A| ≤ |B| ≤ |A|/τ length filter, then exact
    * verification via `array_intersect` on the two shingle arrays
    * re-attached by id (candidates only — never all pairs).
    */
  def prefixJaccardJoin(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, tau: Double = 0.8): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val docs = df
      .withColumn("_ws", words(col(textCol)))
      .select(col(idCol).as("id"),
        array_distinct(wordShinglesOf(col("_ws"), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("n", size(col("sh")).cast("long"))
      .localCheckpoint() // consumed 3×: df counts, prefix cut, verify re-attach
    val ex = docs.select(col("id"), col("n"), explode(col("sh")).as("s"))
    val tokDf = ex.groupBy("s").agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("_df"), col("s"))
    val prefixes = ex.join(tokDf, "s")
      .withColumn("_pos", row_number().over(w))
      .filter(col("_pos") <= col("n") - ceil(col("n") * tau - 1e-9) + 1L)
      .select(col("id"), col("n"), col("s"))
    val cands = prefixes.toDF("id_a", "n_a", "s")
      .join(prefixes.toDF("id_b", "n_b", "s"), "s")
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast("double") >=
          greatest(col("n_a"), col("n_b")).cast("double") * tau - 1e-9)
      .select("id_a", "id_b").distinct()
    cands
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("na")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("nb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("inter"), col("jaccard"))
  }

  /** Prefix-filtered EXACT edit-distance join (Ed-Join — Xiao, Wang & Lin
    * 2008 "Ed-Join: an efficient algorithm for similarity joins with edit
    * distance constraints", building on Gravano et al. 2001's q-gram
    * filters; public papers): all pairs with Levenshtein distance ≤
    * `maxDist` over `strCol`, without the all-pairs DP.
    *
    * Prefix-filter theorem for edit distance: a single edit destroys at
    * most q positional q-grams, so ed(a,b) ≤ d implies a and b disagree on
    * at most q·d of their positional grams — under ANY global gram order,
    * the first q·d + 1 grams of a (rarest first) must intersect the first
    * q·d + 1 grams of b. The candidate join therefore runs ONLY on those
    * prefixes: corpus-hot grams ("th ", " an") sort to the END of the
    * rarest-first order and never generate candidates — the df² hot-key
    * blowup of a raw gram join (measured: 55 s for 5k strings, dominated
    * by hot grams) collapses to rare-gram fan-out (same run: 5 s).
    * Candidates additionally need ||a|−|b|| ≤ d; survivors are verified
    * with the exact `levenshtein` DP (codegen'd builtin).
    *
    * The filter is only guaranteed complete when each string HAS more
    * grams than a prefix, i.e. length ≥ q·(d+1); shorter strings are
    * excluded by a `require` — at web scale the caller buckets shorts
    * separately (their pair space is tiny anyway).
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val minLen = q * (maxDist + 1)
    val prefixLen = q * maxDist + 1
    val strs = df.select(col(idCol).as("id"), col(strCol).as("s"),
        length(col(strCol)).as("len"))
      .filter(col("s").isNotNull)
      .localCheckpoint() // consumed twice: gram build + verify re-attach
    val short = strs.filter(col("len") < minLen).limit(1).collect() // bounded probe
    require(short.isEmpty,
      s"editDistanceJoin needs |s| >= q*(maxDist+1) = $minLen for filter completeness; " +
        "bucket shorter strings separately")
    val grams = strs
      .select(col("id"), col("len"),
        posexplode(expr(s"transform(sequence(1, len - $q + 1), i -> substring(s, i, $q))"))
          .as(Seq("pos", "g")))
    val wOcc = org.apache.spark.sql.expressions.Window
      .partitionBy("id", "g").orderBy("pos")
    val pg = grams.withColumn("occ", row_number().over(wOcc))
      .select("id", "len", "g", "occ")
    // one GLOBAL rarest-first order on positional grams (df of the
    // (gram, occ) key, ties by the key itself) — identical for every
    // string, as the prefix theorem requires
    val gdf = pg.groupBy("g", "occ").agg(count(lit(1)).as("_df"))
    val wPrefix = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("_df"), col("g"), col("occ"))
    val prefixes = pg.join(gdf, Seq("g", "occ"))
      .withColumn("_r", row_number().over(wPrefix))
      .filter(col("_r") <= prefixLen)
      .select("id", "len", "g", "occ")
    val cands = prefixes.toDF("id_a", "len_a", "g", "occ")
      .join(prefixes.toDF("id_b", "len_b", "g", "occ"), Seq("g", "occ"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select("id_a", "id_b").distinct()
    cands
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  // -------------------------------------------- incremental (batch-vs-history)

  /** Incremental exact dedup: drop from `newBatch` every row whose `textCol`
    * content already exists in `history` — the steady-state shape of a
    * crawl pipeline, where each day's batch dedups against the full corpus.
    *
    * Semantics are EXACTLY `newBatch ANTI JOIN history ON digest` (the Bloom
    * filter has no false negatives, and its false positives are re-checked
    * by the anti-join), but the cost model is what matters at 100 TB:
    * a plain anti-join shuffles BOTH sides on the digest — including the
    * typically-huge new batch. Here a Bloom filter over the history digests
    * (built distributed via `DataFrameStatFunctions.bloomFilter`, a
    * treeAggregate — only the fixed-size bit array reaches the driver, never
    * rows) is broadcast into a narrow filter that splits the batch:
    *   - definite-new rows (bloom says absent — guaranteed correct) skip the
    *     join entirely and flow through scan-local;
    *   - only bloom-positive candidates (true dups + fpp·|batch| false
    *     positives) enter the anti-join against history.
    * With fpp = 1% and a mostly-novel batch, join input drops ~100×. The
    * history side still shuffles once; amortize across batches by storing
    * the digest column bucketed on digest so the join is shuffle-free on
    * that side (see [[graft.plans.TierPipeline]] layout notes).
    *
    * Reference anchor: the PK-duplicate assertion at ingest
    * (/root/reference/forecastframe/main.py:58-69) — generalized from
    * within-frame uniqueness to batch-vs-corpus novelty.
    *
    * @param expectedHistoryItems sizing for the Bloom filter (bits ∝ n·ln(1/fpp));
    *                             8 bits/item at fpp=3% → a 10^9-doc history is
    *                             a ~1 GB broadcast: split by digest prefix into
    *                             ranged filters at that scale (documented bound)
    * @return the surviving (novel) rows of `newBatch`, original schema
    */
  def incrementalDedup(newBatch: DataFrame, history: DataFrame, textCol: String,
                       expectedHistoryItems: Long = 1000000L,
                       fpp: Double = 0.01): DataFrame = {
    require(expectedHistoryItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedHistoryItems > 0 and 0 < fpp < 1, got $expectedHistoryItems/$fpp")
    val histDigests = history.select(md5(col(textCol)).as("content_md5"))
    val bloom = histDigests.stat.bloomFilter("content_md5", expectedHistoryItems, fpp)
    val mightContain = udf((d: String) => d != null && bloom.mightContainString(d))

    val tagged = newBatch.withColumn("_d", md5(col(textCol)))
    val definiteNew = tagged.filter(!mightContain(col("_d")))
    val candidates = tagged.filter(mightContain(col("_d")))
      .join(histDigests.withColumnRenamed("content_md5", "_d"), Seq("_d"), "left_anti")
    definiteNew.unionByName(candidates).drop("_d")
  }

  // ------------------------------------------------ cluster (connected comp.)

  /** Connected components over a near-dup pair list: the step that turns
    * pairwise similarity (e.g. [[lshNearDupPairs]]) into canonical clusters —
    * "keep one document per cluster" is the decision every dedup pipeline
    * actually ships. Output: one row per node with
    * `(id, component, cluster_size, is_canonical)`, where `component` is the
    * smallest id reachable from the node and `is_canonical = (id == component)`.
    *
    * Algorithm: iterative min-label propagation. Each round every node takes
    * the min of its own label and its neighbors' labels; the loop stops when
    * a round changes nothing. Rounds = graph diameter — for near-dup clusters
    * (dozens of docs, star/chain shaped) that is single digits, so this beats
    * the O(log² n)-round large-star/small-star alternation (Kiveris et al.,
    * "Connected Components in MapReduce") which pays more shuffles per round;
    * for adversarial long-path graphs switch to that alternation.
    *
    * Scale mechanics per round: ONE shuffle join (labels ⋈ edges on the
    * destination) + ONE partial-agg groupBy(min); both sides are
    * `(long, long)` rows — document text never enters. `localCheckpoint`
    * after every round truncates the lineage so round k's plan does not
    * re-execute rounds 1..k-1 (the classic iterative-Spark trap), and the
    * convergence check rides the same materialization (a single summed
    * `chg` flag — one scalar to the driver, never rows).
    *
    * @param edges pair list; each row is an undirected edge (direction and
    *              duplicates are normalized internally)
    * @param maxIter hard stop (diameter bound); throws if not converged,
    *                because silently-partial components would corrupt the
    *                downstream keep-list
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b", maxIter: Int = 30): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // both directions, so one join per round sees every neighbor
    val und = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .unionByName(edges.select(col(dstCol).cast("long").as("s"), col(srcCol).cast("long").as("d")))
      .distinct()
      .localCheckpoint() // reused every round: pin the blocks, drop the lineage
    var labels = und.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0L) {
      round += 1
      if (round > maxIter)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — " +
            "graph diameter exceeds the bound; raise maxIter or switch to " +
            "large-star/small-star for long-path graphs")
      // min label over each node's neighborhood ∪ its OWN label, in ONE
      // map-side-combined aggregation: the own-label rows ride the union
      // (tagged), so the old per-round join of labels against nbrMin is
      // gone. min(all) == least(own, min(nbrs)) exactly (longs), and the
      // changed flag is min(all) < own ⟺ the old nbr < comp.
      val step = und
        .join(labels.select(col("id").as("d"), col("comp").as("nc")), Seq("d"))
        .select(col("s").as("id"), col("nc"), lit(false).as("own"))
        .unionByName(labels.select(col("id"), col("comp").as("nc"),
          lit(true).as("own")))
        .groupBy("id")
        .agg(min(col("nc")).as("comp"),
          min(when(col("own"), col("nc"))).as("_ownc"))
        .select(col("id"), col("comp"),
          (col("comp") < col("_ownc")).cast("long").as("chg"))
        .localCheckpoint()
      changed = step.agg(sum(col("chg"))).first().getLong(0)
      labels = step.select("id", "comp")
    }
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("comp"))
      .select(col("id"), col("comp").as("component"), col("cluster_size"),
        (col("id") === col("comp")).as("is_canonical"))
  }

  // ------------------------------------------------------- chunk dedup

  /** Sub-document (chunk-level) dedup — the C4/CCNet-style pass that removes
    * boilerplate repeated ACROSS documents (nav bars, footers, license
    * blocks) while keeping each document's unique content. Documents are cut
    * into consecutive `chunkWords`-word chunks; the FIRST occurrence of each
    * distinct chunk corpus-wide (ordered by id, then position) is kept, every
    * later repeat is dropped; documents are reassembled from their kept
    * chunks in order.
    *
    * Output: `(idCol, n_chunks, n_kept, kept_text)` — one row per input doc
    * (empty-text docs yield n_chunks = 0, kept_text = "").
    *
    * Scale shape: the only shuffle keyed on content is the window over
    * `chunk` (uniform by construction — chunks are near-unique except the
    * boilerplate being hunted); document bodies move once into the explode
    * and once back through the reassembly groupBy on the id. The words array
    * is staged as a real column and chunks are built from a literal-sequence
    * explode (Catalyst does not CSE lambda-internal subtrees — see
    * [[graft.functions.Hashing]] scaladoc).
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 8): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val staged = df
      .select(col(idCol).as("_id"), words(col(textCol)).as("_ws"))
      .withColumn("_nc", ceil(size(col("_ws")) / lit(chunkWords.toDouble)).cast("int"))
    val chunks = staged
      .select(col("_id"), col("_ws"), col("_nc"),
        explode_outer(when(col("_nc") > 0, sequence(lit(0), col("_nc") - 1))).as("pos"))
      .withColumn("chunk",
        when(col("pos").isNotNull,
          array_join(slice(col("_ws"), col("pos") * chunkWords + 1, lit(chunkWords)), " ")))
      .drop("_ws")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk")).orderBy(col("_id"), col("pos"))
    chunks
      .withColumn("_keep", col("chunk").isNotNull && row_number().over(w) === 1)
      .groupBy(col("_id").as(idCol))
      .agg(
        count(col("pos")).as("n_chunks"),
        count(when(col("_keep"), lit(1))).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("_keep"), struct(col("pos"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("kept_text"))
  }

  /** The dedup pipeline's final decision: which document of each near-dup
    * cluster SURVIVES. Clusters come from [[connectedComponents]] over the
    * candidate pairs; within a cluster the highest `scoreCol` wins (ties →
    * smallest id), and every un-clustered document is its own singleton
    * keeper. Quality-ranked survivor selection (keep the longest / highest
    * quality copy) is what production pipelines do instead of
    * min-id-canonical — the canonical copy should be the BEST copy.
    *
    * Scale: the components pass is the bounded label propagation of
    * [[connectedComponents]]; the survivor pick is one window over
    * `component` (partition size = cluster size, never corpus size) after a
    * key join of the score — no text moves, only (id, component, score).
    *
    * @return (id, component, keep) — one row per member of `members`
    */
  def keepBest(members: DataFrame, idCol: String, scoreCol: String,
               edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
               maxIter: Int = 30): DataFrame = {
    val comp = connectedComponents(edges, srcCol, dstCol, maxIter)
      .select(col("id"), col("component"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col("_score").desc, col("id"))
    members
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("_score"))
      .join(comp, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("id"), col("component"), col("keep"))
  }
}
