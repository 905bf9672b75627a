package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Text, Vec}
import graft.multimodal.Media

/** Production-path (xxhash64) dedup, vector search, and multimodal plumbing. */
class DedupVecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep dark forest while the moon rises slowly over the hills"

  def docs = Seq(
    (1L, base),
    (2L, base.replace("lazy", "sleepy")), // near-dup of 1
    (3L, "completely different content about spark query engines and " +
      "columnar execution with vectorized readers and shuffle services")
  ).toDF("doc_id", "text")

  test("hashed MinHash+LSH finds the planted near-dup pair only") {
    val sig = Dedup.minhashSignatureHashed(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 8)
    assert(sig.count() === 24) // 3 docs x 8 hashes
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(sig, "doc_id", 2), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash: near-dups land within small hamming distance") {
    val toks = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("tok"))
    val fp = Dedup.simhash(toks, "doc_id",
      pmod(xxhash64(col("tok")), lit(Dedup.MersennePrime)), bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
    assert(ham(fp(1L), fp(2L)) <= 4)
  }

  test("ngram jaccard pairs: planted near-dup above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect()
    assert(pairs.length === 1)
    assert((pairs(0).getAs[Long]("id_a"), pairs(0).getAs[Long]("id_b")) === (1L, 2L))
    assert(pairs(0).getAs[Double]("jaccard") > 0.5)
  }

  test("fractionalDfCap: exact floor(n*ppm/1e6), floor clamp, scale-invariant") {
    // exact vs BigInt reference across magnitudes incl. overflow-prone n
    for (n <- Seq(0L, 999L, 1000000L, 1999999L, 12345678901L, Long.MaxValue / 2);
         ppm <- Seq(1L, 37L, 10000L, 999999L)) {
      val exact = (BigInt(n) * ppm / 1000000).toLong
      assert(Dedup.fractionalDfCap(n, ppm, floor = 1L) === math.max(1L, exact),
        s"n=$n ppm=$ppm")
    }
    // floor binds below it, not above
    assert(Dedup.fractionalDfCap(1000L, 10000L) === 50L) // 1% of 1k = 10 < floor
    assert(Dedup.fractionalDfCap(100000L, 10000L) === 1000L)
    // scale-invariance: 100x the corpus => 100x the cap (above the floor)
    assert(Dedup.fractionalDfCap(10000000L, 10000L) ===
      100L * Dedup.fractionalDfCap(100000L, 10000L))
    // a 20%-occupancy hub exceeds a 1% cap at ANY corpus size
    for (n <- Seq(10000L, 10000000L, 10000000000L))
      assert(n / 5 > Dedup.fractionalDfCap(n, 10000L))
  }

  test("prefix-filtered jaccard: lossless vs the uncapped inverted list") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("inter"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("jaccard"))
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    // tau = 0.5 prunes aggressively (prefix = half each set); the result
    // must STILL equal the full inverted-list join, row for row
    for (tau <- Seq(0.2, 0.5)) {
      val full = Dedup.ngramJaccardPairs(real, "doc_id", "text", 3, tau,
        dfCap = Long.MaxValue).collect().map(key).toSet
      val pref = Dedup.jaccardPairsPrefix(real, "doc_id", "text", 3, tau)
        .collect().map(key).toSet
      assert(pref === full, s"tau=$tau: ${pref.size} vs ${full.size}")
    }
    // boundary case: J = 2/6 rounds to exactly the threshold (0.333333),
    // and the shared grams have HIGHER df than each doc's unique grams,
    // so they sit last in the df-ordered prefixes — the pair is found
    // only because the prefix length arithmetic keeps one shared gram
    // on each side
    import spark.implicits._
    val edge = Seq(
      (1L, "a b c d e f"),   // 4 shingles, 2 shared with doc 2
      (2L, "a b c d x y")    // inter 2, union 6 -> J = 0.333333
    ).toDF("doc_id", "text")
    val e = Dedup.jaccardPairsPrefix(edge, "doc_id", "text", 3, 0.333333)
      .collect().map(key)
    assert(e.length === 1 && e(0)._3 === 2L && e(0)._6 === 0.333333)
  }

  test("sorted-neighborhood pairs: window adjacency in the key order, exactly once") {
    // keys sort as: d10 "aaa..", d3 "abc..", d7 "abd..", d1 "zzz.."
    val df = Seq(
      (10L, "aaa shared prefix here"),
      (3L, "abc shared prefix here"),
      (7L, "abd shared prefix here"),
      (1L, "zzz different entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(df, "doc_id",
        lower(substring(col("text"), 1, 5)), window = 3)
      .select("id_a", "id_b", "rdist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // rank order 10,3,7,1; window 3 pairs each row with its 2 successors
    assert(got === Set((10L, 3L, 1L), (10L, 7L, 2L), (3L, 7L, 1L),
      (3L, 1L, 2L), (7L, 1L, 1L)))
  }

  test("sorted-neighborhood candidate volume is exactly (w-1)*n minus the tail") {
    val df = (1L to 40L).map(i => (i, f"doc $i%02d payload")).toDF("doc_id", "text")
    val n = Dedup.sortedNeighborhoodPairs(df, "doc_id",
      substring(col("text"), 1, 8), window = 4).count()
    // each of the 40 ranks pairs with min(3, n - rank) successors
    assert(n === 3 * 40 - (1 + 2 + 3))
  }

  test("edit-distance verify keeps near pairs, drops far ones, exact dist") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown cat"), // dist 3 on the prefix
      (3L, "entirely unrelated text")
    ).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.verifyEditDistance(cand, df, "doc_id", "text",
        prefixLen = 40, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 3L)))
  }

  test("blockerRecall: orientation-proof counts and recall") {
    // candidates emitted in RANK order (reversed ids) must still match
    val cand = Seq((5L, 2L), (3L, 4L), (9L, 8L)).toDF("id_a", "id_b")
    val truth = Seq((2L, 5L), (8L, 9L), (1L, 7L)).toDF("id_a", "id_b")
    val r = Dedup.blockerRecall(cand, truth).head()
    assert(r.getAs[Long]("n_truth") === 3L)
    assert(r.getAs[Long]("n_candidates") === 3L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Double]("recall") === 0.666667)
  }

  test("blockerRecall: empty truth reports recall 1.0") {
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    val truth = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val r = Dedup.blockerRecall(cand, truth).head()
    assert(r.getAs[Long]("n_truth") === 0L)
    assert(r.getAs[Double]("recall") === 1.0)
  }

  test("sketch aggregates land within their error bounds of exact values") {
    val d = "/root/testdata/sf0.001"
    // new r8 shape: (grp, approx_parts DOUBLE, p50_est, p99_est) from the
    // house deterministic HLL + histogram sketches
    val sketch = SparkEntry.queries("q_sketch_stats")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p50"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p99"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    exact.foreach { case (flag, (n, p50, p99)) =>
      val (approx, q50, q99) = sketch(flag)
      // m = 64 registers -> ~13% standard error; 2.5 sigma bound
      assert(math.abs(approx - n) / n < 0.33,
        s"$flag: approx=$approx exact=$n")
      // histogram quantile = lower edge of the crossing 1024-wide bin:
      // within one bin width below the true order statistic
      assert(q50 <= p50 && p50 - q50 <= 1024.0,
        s"$flag: q50=$q50 p50=$p50")
      assert(q99 <= p99 && p99 - q99 <= 1024.0,
        s"$flag: q99=$q99 p99=$p99")
    }
  }

  test("tokenDict ranks the distinct vocabulary lexicographically") {
    val toks = Seq("b", "a", "c", "a", "b").toDF("tok")
    val dict = Dedup.tokenDict(toks).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dict === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("decontaminate drops exactly the docs overlapping the eval set") {
    val train = Seq(
      (10L, base),                                  // contaminated: shares 3-grams with eval doc
      (11L, "completely different content about spark query engines and " +
        "distributed columnar execution with code generation"),
      (12L, "short text")                           // < 3 tokens: no shingles, never contaminated
    ).toDF("doc_id", "text")
    val eval = Seq((1L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text")
    val out = graft.functions.Dedup.decontaminate(
        train, eval, "doc_id", "text", shingleSize = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(11L, 12L))
    // a higher tolerance keeps mild overlap
    val lax = graft.functions.Dedup.decontaminate(
        train, eval, "doc_id", "text", shingleSize = 3,
        maxSharedShingles = 1000L)
      .select("doc_id").as[Long].collect().sorted
    assert(lax === Array(10L, 11L, 12L))
  }

  test("contaminationStats grades overlap and keeps shingle-less docs") {
    val train = Seq(
      (10L, base),                                  // heavy eval overlap
      (11L, "completely different content about spark query engines and " +
        "distributed columnar execution with code generation"),
      (12L, "short text")                           // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    val eval = Seq((1L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text")
    val st = graft.functions.Dedup.contaminationStats(
        train, eval, "doc_id", "text", shingleSize = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("shared"),
          r.getAs[Double]("contam_ratio")))).toMap
    assert(st.keySet === Set(10L, 11L, 12L))
    assert(st(12L) === ((0L, 0L, 0.0)))            // reported, not dropped
    assert(st(11L)._2 === 0L && st(11L)._3 === 0.0)
    assert(st(10L)._2 > 0L && st(10L)._3 > 0.5)    // near-copy of the eval doc
    // consistency with the drop operator: shared > 0 <=> decontaminated away
    val dropped = Set(10L, 11L, 12L) --
      graft.functions.Dedup.decontaminate(train, eval, "doc_id", "text", 3)
        .select("doc_id").as[Long].collect().toSet
    assert(dropped === st.filter(_._2._2 > 0L).keySet)
  }

  test("semanticDecontaminate drops cosine-close vectors, keeps zero vectors") {
    val corpus = Seq(
      (10L, Array(0.99f, 0.1f, 0.0f)),  // near the eval direction
      (11L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (12L, Array(0.0f, 0.0f, 0.0f))    // zero norm: NULL sim, survives
    ).toDF("vec_id", "embedding")
    val evalV = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Vec.semanticDecontaminate(corpus, evalV, threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(out === Array(11L, 12L))
    // survivors keep their original columns
    assert(Vec.semanticDecontaminate(corpus, evalV, threshold = 0.9)
      .columns.toSeq === Seq("vec_id", "embedding"))
    // a lax threshold catches the orthogonal vector too
    assert(Vec.semanticDecontaminate(corpus, evalV, threshold = -1.0)
      .select("vec_id").as[Long].collect().sorted === Array(12L))
  }

  test("mrlTopK: exact when the shortlist covers the corpus, dominated otherwise") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val q = emb.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val brute = rows(Vec.bruteForceTopK(q, emb, 5))
    // Shortlist >= corpus: the funnel degenerates to exact search.
    assert(rows(Vec.mrlTopK(q, emb, 5, dPrefix = 16, shortlist = 500)) === brute)
    // Full-dim prefix: stage one is already the exact ranking.
    assert(rows(Vec.mrlTopK(q, emb, 5, dPrefix = 64, shortlist = 20)) === brute)
    // Narrow funnel: still k rows/query, and each rank-r sim is bounded by
    // the exact rank-r sim (candidates are a subset of the corpus).
    val funnel = Vec.mrlTopK(q, emb, 5, dPrefix = 16, shortlist = 20)
      .select("query_id", "rank", "sim").as[(Long, Int, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val exact = Vec.bruteForceTopK(q, emb, 5)
      .select("query_id", "rank", "sim").as[(Long, Int, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(funnel.keySet === exact.keySet)
    funnel.foreach { case (key, sim) =>
      assert(sim <= exact(key) + 1e-9, s"$key: funnel $sim > exact ${exact(key)}")
    }
  }

  test("exact dedup groups by key with smallest id kept") {
    val d = Seq((10L, "x"), (11L, "x"), (12L, "y")).toDF("id", "t")
    val g = Dedup.exactGroups(d, col("t"), col("id"))
      .collect().map(r => r.getAs[String]("dedup_key") ->
        (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toMap
    assert(g === Map("x" -> (10L, 2L), "y" -> (12L, 1L)))
  }

  test("HOF dot/norm agree with the compiled expressions") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val drift = emb.select(
      Vec.dot(col("embedding"), col("embedding")).as("hof"),
      graft.plans.VecExpressions.dotProduct(col("embedding"), col("embedding"))
        .as("native"))
      .filter(col("hof") =!= col("native"))
    assert(drift.count() === 0)
  }

  test("native rpLshBucket is bit-identical to the HOF specification") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (nBits <- Seq(2, 8, 16)) {
      val drift = emb.select(
        Vec.rpLshBucketHof(col("embedding"), nBits).as("hof"),
        Vec.rpLshBucket(col("embedding"), nBits).as("native"))
        .filter(col("hof") =!= col("native"))
      assert(drift.count() === 0, s"nBits=$nBits")
    }
    // null element -> NULL bucket (native contract)
    val n = Seq(Tuple1(Array[java.lang.Float](1.0f, null))).toDF("embedding")
      .select(Vec.rpLshBucket(col("embedding"), 4).as("b")).head()
    assert(n.isNullAt(0))
  }

  test("cosine: known geometry") {
    val v = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val sims = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Vec.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((1L, 2L)) === 0.0)
    assert(sims((1L, 3L)) === 1.0)
    assert(sims((2L, 3L)) === 0.0)
  }

  test("LSH top-k achieves decent recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Vec.bruteForceTopK(emb.filter($"vec_id" < 20), emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Vec.lshTopK(emb, 5, nBits = 2)
      .filter($"query_id" < 20)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall") // 2-bit buckets, ~1/4 of corpus scanned
  }

  test("ivfKmeansTopK: recall rises with nProbe, exact when all cells probed") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 20)
    val exact = Vec.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val got = Vec.ivfKmeansTopK(emb, queries, k = 5, nProbe = nProbe,
          kCells = 8, iters = 2)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r3 = recallAt(3); val r8 = recallAt(8)
    // monotone in probes; probing every cell IS brute force (candidate set
    // = full corpus, same rounded-sim/id ranking), so recall must hit 1.
    assert(r1 <= r3 + 1e-9 && r3 <= r8 + 1e-9, s"recall not monotone: $r1 $r3 $r8")
    assert(r8 == 1.0, s"all-cells probe not exact: $r8")
    assert(r1 > 0.2, s"1-probe recall degenerate: $r1")
  }

  test("multimodal plumbing: fromText → decodeFeatures → sampleFrames") {
    val media = Media.fromText(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName === "binary")
    val feats = Media.decodeFeatures(media)
    val rows = feats.select("media_id", "features").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getSeq[Float](1).length === Media.StubCodec.featureDim))
    // deterministic: same payload → same features
    val f2 = Media.decodeFeatures(media).select("media_id", "features").collect()
    assert(rows.map(_.toString).sorted.toSeq === f2.map(_.toString).sorted.toSeq)
    val frames = Media.sampleFrames(media, every = 2)
    assert(frames.count() > 0)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame"))
  }

  test("Text: tokenizers, ngrams, fingerprint stability") {
    val df = Seq((1L, "a  b c"), (2L, ""), (3L, "hello, world! 42")).toDF("id", "text")
    val out = df.select(col("id"),
      Text.tokenCount(col("text")).as("n"),
      Text.wordNgrams(Text.tokens(col("text")), 2).as("g2"),
      Text.charFingerprint(col("text")).as("fp"),
      Text.regexTokens(col("text")).as("rt"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[String](2), r.getLong(3), r.getSeq[String](4))).toMap
    assert(out(1L)._1 === 3)
    assert(out(1L)._2 === Seq("a b", "b c"))
    assert(out(2L)._1 === 0)
    assert(out(2L)._3 === 0L)
    assert(out(3L)._4 === Seq("hello", ",", "world", "!", "42"))
    // fingerprint differs on order
    val fp = Seq((1L, "ab"), (2L, "ba")).toDF("id", "text")
      .select(Text.charFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) !== fp(1))
  }

  test("mutualKnnPairs: reciprocated edges cluster groups, cut the bridge") {
    // Two tight groups on orthogonal axes plus a far outlier. With k=1
    // each group member reciprocates its twin; nothing reciprocates the
    // outlier even though the outlier has a nearest neighbor — mutuality
    // is what keeps it a singleton.
    val emb = Seq(
      (0L, Array(1.00f, 0.01f)), (1L, Array(1.00f, 0.02f)),
      (10L, Array(0.01f, 1.00f)), (11L, Array(0.02f, 1.00f)),
      (99L, Array(-1.00f, -0.9f))
    ).toDF("vec_id", "embedding")
    val pairs = Vec.mutualKnnPairs(emb, k = 1, kCells = 2, iters = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a < b }) // canonical orientation
    assert(pairs === Set((0L, 1L), (10L, 11L)))
    val comps = Vec.mutualKnnClusters(emb, k = 1, kCells = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("csize")))).toMap
    assert(comps(0L) === ((0L, 2L)) && comps(1L) === ((0L, 2L)))
    assert(comps(10L) === ((10L, 2L)) && comps(11L) === ((10L, 2L)))
    assert(comps(99L) === ((99L, 1L))) // singleton survives labeling
  }

  test("mutualKnnPairs are a subset of the in-cell directed top-k") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val mutual = Vec.mutualKnnPairs(emb, k = 3, kCells = 8, iters = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual.nonEmpty)
    // reconstruct the directed graph from the same cells: every mutual
    // pair must appear in BOTH directions
    val cells = Vec.kmeans(emb, 8, 2).select($"vec_id", $"cell")
    val b = emb.join(cells, "vec_id")
      .select($"cell", $"vec_id", $"embedding")
    val d = b.as("a").join(b.as("c"), col("a.cell") === col("c.cell") &&
        col("a.vec_id") =!= col("c.vec_id"))
      .select(col("a.vec_id").as("q"), col("c.vec_id").as("n"),
        Vec.cosine(col("a.embedding"), col("c.embedding")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"q")
      .orderBy($"sim".desc, $"n")
    val directed = d.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select("q", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual.forall { case (a, bb) =>
      directed((a, bb)) && directed((bb, a)) })
    // and no directed-but-unreciprocated pair leaked through
    val unreciprocated = directed.filter { case (q, n) =>
      !directed((n, q)) }
    assert(unreciprocated.forall { case (q, n) =>
      !mutual((math.min(q, n), math.max(q, n))) })
  }

  test("kCenters: hand-traced greedy selection, dup exclusion, early stop") {
    // 2D geometry where every greedy step is computable by hand; id 7
    // duplicates id 1 exactly, so it can never be selected.
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0.5f, 0f)), (3L, Seq(10f, 0f)),
      (4L, Seq(10f, 10f)), (5L, Seq(0f, 10f)), (6L, Seq(5f, 5f)),
      (7L, Seq(0f, 0f))
    ).toDF("vec_id", "embedding")
    // k exceeds the selectable-point count: early stop at 6 rows
    val sel = Vec.kCenters(pts, k = 7)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(sel.toSeq === Seq(
      (1, 1L, 0.0),      // seed: smallest id
      (2, 4L, 200.0),    // farthest corner
      (3, 3L, 100.0),    // 100 tie with id 5 → min id wins
      (4, 5L, 100.0),
      (5, 6L, 50.0),
      (6, 2L, 0.25)))    // the near-dup of the seed comes last
    // radius sequence is nonincreasing from round 2 on
    val radii = sel.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
  }

  test("kCenters matches a driver-side greedy reference on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(120)
    val got = Vec.kCenters(emb, k = 5)
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getDouble(2)))
    // independent reference: same arithmetic (double promotion, left-fold
    // dots, HALF_UP rounding to 6, min-id ties), plain Scala
    val vs = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var vv = 0.0; var vc = 0.0; var cc = 0.0
      for (i <- a.indices) {
        vv += a(i).toDouble * a(i).toDouble
        vc += a(i).toDouble * b(i).toDouble
        cc += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(math.max(0.0, vv - 2.0 * vc + cc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var chosen = Vector((vs.head._1, 0.0))
    val dmin = scala.collection.mutable.Map(vs.map(v =>
      v._1 -> Double.MaxValue): _*)
    for (_ <- 2 to 5) {
      val c = vs.find(_._1 == chosen.last._1).get._2
      vs.foreach { case (id, v) => dmin(id) = math.min(dmin(id), d2(v, c)) }
      val pick = vs.filter(v => dmin(v._1) > 0)
        .maxBy(v => (dmin(v._1), -v._1))
      chosen :+= ((pick._1, dmin(pick._1)))
    }
    assert(got.toSeq === chosen)
  }

  test("silhouette: tight separated clusters score near 1, a2/b2 match " +
      "the assignment geometry") {
    val emb = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(10f, 0f)), (4L, Array(11f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Vec.silhouette(emb, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // iters=2 ends update-then-assign: codebook is c0=(0,0) (its lone
    // member) and c1=mean(1,10,11)=(22/3,0); cells land {1,2} | {3,4}
    val cells = got.view.mapValues(_._1).toMap
    assert(cells(1L) == cells(2L) && cells(3L) == cells(4L) &&
      cells(1L) != cells(3L))
    // a2 is the assignment's own distance: vec1 sits ON its centroid
    assert(got(1L)._2 == 0.0 && got(1L)._4 == 1.0)
    assert(got(2L)._2 == 1.0, got(2L))
    for ((id, (_, a2, b2, sil)) <- got) {
      assert(b2 > a2, s"vec $id b2 $b2 <= a2 $a2")
      assert(sil > 0.88 && sil <= 1.0, s"vec $id sil $sil")
    }
  }

  test("minhashCalibration: identical docs estimate exactly 1, " +
      "overlap pairs carry exact set Jaccard and signed error") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg hh"),           // identical to 1
      (3L, "aa bb cc dd ee ff gg zz"))           // one tail token off
      .toDF("doc_id", "text")
    val got = Dedup.minhashCalibration(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // identical docs: all 8 components match, exact Jaccard 1, err 0
    val (km, ni, nu, est, exact, err) = got((1L, 2L))
    assert(km == 8L && est == 1000000L)
    assert(ni == nu && exact == 1000000L && err == 0L)
    // 6 shingles each, 5 shared (only the last window differs):
    // exact = 5/7 = 714286; the estimate is k_match/8 with the error
    // recorded, not hidden
    val (_, ni2, nu2, est2, exact2, err2) = got((1L, 3L))
    assert(ni2 == 5L && nu2 == 7L && exact2 == 714286L)
    assert(err2 == est2 - exact2)
  }

  test("mmdLinear: squared mean distance, zero for identical groups") {
    val emb = Seq(
      (1L, 0, Array(0f, 0f)), (2L, 0, Array(2f, 0f)),   // mean (1,0)
      (3L, 1, Array(4f, 0f)), (4L, 1, Array(6f, 0f)),   // mean (5,0)
      (5L, 2, Array(0f, 0f)), (6L, 2, Array(2f, 0f)))   // = group 0
      .toDF("vec_id", "label", "embedding")
    val got = Vec.mmdLinear(emb, "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got((0, 1)) == ((2L, 2L, 16.0)))   // ||(1,0)-(5,0)||^2
    assert(got((0, 2)) == ((2L, 2L, 0.0)))    // identical distribution
    assert(got((1, 2))._3 == 16.0)
    assert(got.size == 3)                      // unordered pairs only
  }

  test("clusterPurity: majority share with deterministic label ties") {
    val assigned = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1))
      .toDF("vec_id", "cell")
    val labels = Seq((1L, 7), (2L, 7), (3L, 8), (4L, 8), (5L, 8))
      .toDF("vec_id", "label")
    val got = graft.functions.Eval.clusterPurity(assigned, labels,
        "vec_id", "cell", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((3L, 7L, 2L, 666667L)))
    assert(got(1L) == ((2L, 8L, 2L, 1000000L)))
    // exact tie: the smaller label wins in both engines
    val tied = Seq((1L, 0), (2L, 0)).toDF("vec_id", "cell")
    val tl = Seq((1L, 9), (2L, 3)).toDF("vec_id", "label")
    val t = graft.functions.Eval.clusterPurity(tied, tl, "vec_id",
      "cell", "label").collect()(0)
    assert(t.getLong(2) == 3L && t.getLong(4) == 500000L)
  }

  test("nnDescent: refinement rounds strictly improve recall against " +
      "the exact kNN graph; shape invariants hold") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = 4
    val exact = Vec.bruteForceTopK(emb, emb, k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    def recallOf(rounds: Int): Double = {
      // recall@4 of a WIDER (k=16) graph truncated to the top 4 —
      // the build-wide-serve-narrow kNN-graph practice
      val g = Vec.nnDescent(emb, "vec_id", "embedding", k = 16,
          nBits = 4, rounds = rounds, ringWindow = 8)
        .filter(col("rank") <= k)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
      val hits = exact.map { case (q, ex) =>
        (g.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
      }
      hits.sum / exact.size
    }
    val r0 = recallOf(0)
    val r3 = recallOf(3)
    assert(r3 > r0, s"rounds did not help: seed=$r0 refined=$r3")
    assert(r3 >= 0.9, s"refined recall too low: $r3")
    // shape: at most k neighbors per node, ranks contiguous from 1,
    // no self-edges
    val g2 = Vec.nnDescent(emb, "vec_id", "embedding", k, 4, 2).collect()
    assert(g2.forall(r => r.getLong(0) != r.getLong(1)))
    val byNode = g2.groupBy(_.getLong(0))
    assert(byNode.values.forall(rs =>
      rs.length <= k && rs.map(_.getLong(3)).sorted.toSeq ==
        (1L to rs.length.toLong)))
  }

  test("deriveNBits: buckets stay ~targetBucket-sized, bits monotone") {
    assert(Vec.deriveNBits(500L) == 4)    // the catalog entry's setting
    assert(Vec.deriveNBits(32000L) == 10)
    // the derived width always lands the mean bucket in (target/2, target]
    for (n <- Seq(100L, 1000L, 50000L, 1000000L)) {
      val b = Vec.deriveNBits(n)
      assert((n >> b) <= 32L, s"n=$n bits=$b")
      if (b > 1) assert((n >> (b - 1)) > 32L, s"n=$n bits=$b not minimal")
    }
  }

  test("graphBeamSearch: more hops improve recall; serving beats the " +
      "exact floor; no self-results") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    val g = Vec.nnDescent(emb, "vec_id", "embedding", k = 16,
      nBits = 4, rounds = 3, ringWindow = 8)
    val exact = Vec.bruteForceTopK(queries, emb, 4)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    def recallOf(hops: Int): Double = {
      val got = Vec.graphBeamSearch(g, emb, queries, "vec_id",
          "embedding", k = 4, beam = 16, hops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
      exact.map { case (q, ex) =>
        (got.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
      }.sum / exact.size
    }
    val r1 = recallOf(1)
    val r5 = recallOf(5)
    assert(r5 >= r1, s"hops did not help: 1-hop=$r1 5-hop=$r5")
    assert(r5 >= 0.8, s"serving recall too low: $r5")
    val res = Vec.graphBeamSearch(g, emb, queries, "vec_id", "embedding",
      k = 4, beam = 16, hops = 5).collect()
    assert(res.forall(r => r.getLong(0) != r.getLong(1)))
    assert(res.groupBy(_.getLong(0)).values.forall(_.length <= 4))
  }

  test("noveltyScores: df=1 grams are novel, shared grams are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "x y"), (4L, "solo")
    ).toDF("doc_id", "text")
    val m = graft.functions.Dedup.noveltyScores(docs, "doc_id", "text",
        n = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // "a b" shared by 1 and 2; every other bigram unique
    assert(m(1L) == ((2L, 1L, 500000L)))
    assert(m(2L) == ((2L, 1L, 500000L)))
    assert(m(3L) == ((1L, 0L, 1000000L)))
    assert(!m.contains(4L)) // too short to gram
  }
}
