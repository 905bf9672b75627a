package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Scaling probe: replicate the documents corpus N× (deterministically
  * perturbed so replicas are near- but not exact duplicates) and time the
  * MinHash-LSH dedup path at each multiple. Linear wall-clock growth is
  * the evidence that the dedup plan (map-only hashing → partial-min
  * aggregate → banded bucket join) has no quadratic or single-partition
  * component — the property that must hold at 100 TB.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  /** Replicate the corpus `mult`x with injective ids and a one-token
    * perturbation per replica (near-dups, not exact dups) — the ONE
    * replication scheme every probe times, so probe curves stay
    * comparable.
    */
  private def replicate(spark: SparkSession,
      base: org.apache.spark.sql.DataFrame, mult: Int): org.apache.spark.sql.DataFrame = {
    val replicas = spark.range(mult).select(col("id").as("rep"))
    base.crossJoin(replicas)
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // FAIR scheduling: the concurrent_serving probe submits jobs from
      // many threads; FIFO would serialize a long scan ahead of every
      // short probe. No effect on the sequential probes (one job at a
      // time schedules identically under either mode).
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    // Optional comma-separated probe-name filter (first program arg):
    // run only the named probes — local iteration on one operator
    // without paying for the whole suite. No arg = full suite. Names
    // are validated up front: a typo would otherwise run NOTHING and
    // read as an instant-pass.
    val knownProbes = Set("minhash_lsh", "band_join", "rp_lsh_bucket",
      "connected_components", "simhash_pairs", "kmeans", "semdedup",
      "pq_train", "decontaminate", "span_dedup", "textrank", "bm25",
      "bpe_train", "winnow", "dsir", "kn_lm", "jaccard_prefix",
      "mutual_knn", "blocked_cc", "blocked_cc_isolated", "snm",
      "corpus_shuffle", "kcenter",
      "unigram_tv", "line_dedup", "blocklist", "events_analytics",
      "skew_join", "suffix", "edit_join", "hier_assign", "curate_full",
      "seq_pack", "ivfpq", "spearman", "graph_ann", "corpus_e2e",
      "index_compaction", "graph_rebuild", "concurrent_serving",
      "incr_dedup_fold", "dbscan", "coreset", "cdc", "eval_pairs",
      "skew_dedup")
    val only = args.headOption.map(_.split(',').filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- knownProbes
      require(unknown.isEmpty,
        s"unknown probe name(s) ${unknown.mkString(", ")}; valid: " +
          knownProbes.toSeq.sorted.mkString(", "))
    }
    def want(p: String): Boolean = only.forall(_.contains(p))

    val base = Tables.documents(spark, sfDir)
    val nBase = base.count()
    for (mult <- Seq(1, 4, 16) if want("minhash_lsh")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"), 8)
      val pairs = Dedup.lshCandidatePairs(
        Dedup.lshBands(sig, "doc_id", 2), "doc_id").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"minhash_lsh","mult":$mult,"docs":${nBase * mult},"pairs":$pairs,"sec":$sec%.2f}""")
    }

    // Band-join probe: purchases × signups within a value band, with each
    // replica shifted to a disjoint value range so the true pair count
    // (and thus honest output cost) grows linearly with the corpus — any
    // superlinear wall-clock growth would expose quadratic candidate
    // generation in the bucket blocking.
    val ev = Tables.events(spark, sfDir)
    for (mult <- Seq(1, 4, 16) if want("band_join")) {
      val reps = spark.range(mult).select(col("id").as("rep"))
      val scaled = ev.crossJoin(reps)
        .select((col("event_id") * mult + col("rep")).as("eid"),
          col("event_type"),
          (col("value") + col("rep") * lit(10000.0)).as("v"))
      val p = scaled.filter(col("event_type") === "purchase")
        .select(col("eid").as("p_id"), col("v").as("p_val"))
      val sg = scaled.filter(col("event_type") === "signup")
        .select(col("eid").as("s_id"), col("v").as("s_val"))
      val t0 = System.nanoTime()
      val pairs = graft.ops.RangeJoin.bandJoin(p, sg, "p_val", "s_val", 0.05)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"band_join","mult":$mult,"pairs":$pairs,"sec":$sec%.2f}""")
    }

    // Native vs HOF LSH bucketing: one compiled loop against nBits
    // interpreted zip_with/aggregate passes, on a 64x-replicated corpus.
    val emb = Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(64).select(col("id").as("rep")))
      .select(col("vec_id"), col("embedding"))
    for ((tag, bucket) <- Seq(
        "native" -> graft.functions.Vec.rpLshBucket(col("embedding"), 16),
        "hof" -> graft.functions.Vec.rpLshBucketHof(col("embedding"), 16))
        if want("rp_lsh_bucket")) {
      val t0 = System.nanoTime()
      emb.select(bucket.as("b")).selectExpr("sum(b)").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"rp_lsh_bucket","variant":"$tag","sec":$sec%.2f}""")
    }

    // Connected-components probe: the near-dup similarity graph of the
    // replicated corpus (LSH pairs) resolved to clusters. Rounds are
    // bounded by component diameter (replica cliques: ~2), so wall-clock
    // should track the pair volume, not blow up with corpus size.
    for (mult <- Seq(1, 4, 16) if want("connected_components")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"), 8)
      val pairs = Dedup.lshCandidatePairs(
        Dedup.lshBands(sig, "doc_id", 2), "doc_id")
      val nClusters = graft.functions.Cluster
        .connectedComponents(pairs, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id", maxIter = 30)
        .select(col("component")).distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"connected_components","mult":$mult,"docs":${nBase * mult},"clusters":$nClusters,"sec":$sec%.2f}""")
    }

    // SimHash-pairs probe: scan-stage fingerprints + pigeonhole chunk
    // blocking on the replicated corpus. Replica texts differ by one
    // token, so fingerprints land within a small hamming ball of their
    // siblings — pair output grows with planted duplication while the
    // blocking stays a linear equi-join.
    for (mult <- Seq(1, 4, 16) if want("simhash_pairs")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val fp = docs
        .filter(graft.functions.Text.tokenCount(col("text")) > 0)
        .select(col("doc_id"), Dedup.simhashScan(col("text"), 30).as("simhash"))
      val pairs = Dedup.simhashPairs(fp, "doc_id", "simhash",
        bits = 30, maxHamming = 2).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"simhash_pairs","mult":$mult,"docs":${nBase * mult},"pairs":$pairs,"sec":$sec%.2f}""")
    }

    // K-means probe: two Lloyd iterations over a replicated embedding
    // corpus. Per-iteration cost is one k-row broadcast + one corpus
    // window + one partial-aggregable centroid groupBy, so wall-clock
    // should grow linearly with the corpus and stay flat in k's shadow.
    val embBase = Tables.embeddings(spark, sfDir)
    val nEmb = embBase.count()
    for (mult <- Seq(1, 4, 16) if want("kmeans")) {
      // rep-major ids: the k smallest ids stay k DISTINCT base vectors
      // (base-major would seed every centroid with replicas of vector 0
      // and collapse the clustering).
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      val t0 = System.nanoTime()
      val cells = graft.functions.Vec.kmeans(vecs, k = 16, iters = 2)
        .select(col("cell")).distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"kmeans","mult":$mult,"vecs":${nEmb * mult},"cells":$cells,"sec":$sec%.2f}""")
    }

    // DBSCAN probe: replicas are TRANSLATED one unit apart along x (not
    // stacked in place — identical coordinates would square the in-cell
    // pair volume and measure the density blow-up, not the operator), so
    // density — DBSCAN's own operating contract — stays constant while
    // the corpus and the spatial extent grow. Wall should track the
    // corpus linearly: the eps-pair join volume per point is constant
    // and tiledComponents' remnant grows with tile count, not points.
    for (mult <- Seq(1, 4, 16) if want("dbscan")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          array(
            (element_at(col("embedding"), 1) +
              col("rep").cast("float")).cast("float"),
            element_at(col("embedding"), 2)).as("embedding"))
      val t0 = System.nanoTime()
      val out = graft.functions.Vec.dbscanGrid(vecs, eps = 0.02, minPts = 5)
      val nClusters = out.filter(col("cluster") >= 0)
        .select(col("cluster")).distinct().count()
      val nNoise = out.filter(col("role") === "noise").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"dbscan","mult":$mult,"vecs":${nEmb * mult},"clusters":$nClusters,"noise":$nNoise,"sec":$sec%.2f}""")
    }

    // Facility-location coreset probe: fixed 32-candidate pool, growing
    // universe. Each greedy round is one integer aggregate over the
    // |pool|x|universe| sims relation, so wall should track the corpus
    // linearly with k and |pool| in the constant.
    for (mult <- Seq(1, 4, 16) if want("coreset")) {
      val universe = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      val pool = embBase.filter(col("vec_id") < 32)
      val t0 = System.nanoTime()
      val picks = graft.functions.Vec
        .facilityLocationSelect(pool, universe, k = 5)
        .collect() // 5 rows — bounded model output
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"coreset","mult":$mult,"vecs":${nEmb * mult},"first_pick":${picks.head.getLong(1)},"sec":$sec%.2f}""")
    }

    // Content-defined chunking probe: the near-dup replicas share most
    // of their chunk identities (each replica differs only in its
    // appended token), so duplicated-chunk mass and savings both grow
    // with mult while the scan itself is one compiled O(len) pass +
    // one hash groupBy — wall should track the corpus linearly.
    for (mult <- Seq(1, 4, 16) if want("cdc")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val sav = graft.functions.Cdc.dedupSavings(docs, "doc_id", "text",
        w = 16, maskBits = 5).collect()(0) // one-row card
      val nDup = graft.functions.Cdc.chunkStats(docs, "doc_id", "text",
        w = 16, maskBits = 5, minOcc = 2L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"cdc","mult":$mult,"docs":${nBase * mult},"dup_chunks":$nDup,"savings_ppm":${sav.getAs[Long]("savings_ppm")},"sec":$sec%.2f}""")
    }

    // Pair-eval deck over the SNM candidates: ROUGE-2 + chrF + BLEU-4
    // + Damerau verify share ONE memoized candidate generator and each
    // runs candidates x (gram-set | prefix^2) work — the window is
    // FIXED, so candidates grow linearly with docs and the whole deck
    // must track the corpus linearly. Replicas share 30-char keys and
    // cluster inside SNM windows (worst-case adjacency), so this also
    // stresses the near-duplicate-heavy regime the deck serves.
    for (mult <- Seq(1, 4, 16) if want("eval_pairs")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
          lower(substring(col("text"), 1, 30)), window = 5)
        .select(col("id_a"), col("id_b"))
      val nPairs = cand.count()
      val nRouge = graft.functions.Eval.rougeN(cand, docs, "doc_id",
        "text", n = 2).count()
      val nChrf = graft.functions.Eval.chrF(cand, docs, "doc_id",
        "text", n = 3).count()
      val nBleu = graft.functions.Eval.bleu4(cand, docs, "doc_id",
        "text").count()
      val nDam = Dedup.verifyDamerau(cand, docs, "doc_id", "text",
        prefixLen = 80, maxDist = 40).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"eval_pairs","mult":$mult,"docs":${nBase * mult},"pairs":$nPairs,"rouge":$nRouge,"chrf":$nChrf,"bleu":$nBleu,"damerau":$nDam,"sec":$sec%.2f}""")
    }

    // End-to-end curation chain at the probe scale factor: the sf0.01
    // e2e spec's exact composition (CCNet LM reference, learnable seed
    // labels, self-contaminating eval slice) with size-scaled
    // parameters — the scale point SURVEY §8 records. Success = the
    // chain holds its monotone-shrink contract and finishes in
    // one-node time at 10x the spec corpus.
    if (want("curate_full")) {
      val docs = base.localCheckpoint(true)
      val nDocs = docs.count()
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val lm = graft.functions.LangModel.knBigramProbs(
        docs.filter(col("doc_id") % 2 === 0), "text")
      val seed = docs.filter(col("doc_id") < nDocs * 2 / 5)
        .select(col("doc_id"), col("text"),
          when(array_contains(
            graft.functions.Text.tokens(col("text")), "stream"), 1L)
            .otherwise(-1L).as("y"))
      val evalDocs = docs.filter(col("doc_id") >= nDocs - 10)
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val (_, _, stats) = graft.pipeline.CorpusPipeline.curateFull(
        docs, evalDocs, seed, emb, lm,
        minFit = 0.0005, maxContamRatio = 0.1, vocabSize = 2000,
        maxOovRate = 0.5, minKeepRatio = 0.5, semThreshold = 0.95,
        nShards = 8, blockPhrases = Seq("wholly absent phrase", "slow fast"),
        lineDedupLen = Some(10),
        domainCap = Some(("source", math.max(22L, nDocs * 22L / 500L))))
      val row = stats.head()
      val sec = (System.nanoTime() - t0) / 1e9
      val counts = stats.columns
        .map(c => s""""$c":${row.getAs[Long](c)}""").mkString(",")
      println(f"""{"probe":"curate_full","docs":$nDocs,$counts,"sec":$sec%.1f}""")
    }

    // Composed end-to-end probe: the FULL curation chain (blocklist →
    // line dedup → annotate → quality/gopher gates → domain cap → span →
    // decontaminate → oov → lm-fit → classifier → exact dedup → LSH
    // near-dedup → semantic dedup → split → shard) plus the training
    // handoff (token-budget mix → sequence pack), at 1×/4×/16× corpus,
    // with wall AND rows-out PER STAGE. Each stage is individually
    // probed elsewhere; this card proves the COMPOSITION stays linear —
    // memo interactions, checkpoint pressure, and cross-stage shuffle
    // reuse included. Emits one JSON line per multiple with the stage
    // breakdown.
    if (want("corpus_e2e")) {
      // SPARK_GRAFT_E2E_MULTS=1,4,16,64: the default ladder matches the
      // other cards; the 64× rung exists for the deeper composed-chain
      // record (scan stages linear, funnel tail output-bounded).
      val e2eMults = sys.env.get("SPARK_GRAFT_E2E_MULTS")
        .map(_.split(",").map(_.trim.toInt).filter(_ >= 1).toSeq)
        .getOrElse(Seq(1, 4, 16))
      for (mult <- e2eMults) {
        graft.functions.Memos.releaseAll() // each multiple starts cold
        // replicate WITH the source column (the domain-cap stage keys
        // on it); the shared replicate() keeps only (doc_id, text)
        val docs = base
          .crossJoin(spark.range(mult).select(col("id").as("rep")))
          .select((col("doc_id") * mult + col("rep")).as("doc_id"),
            concat(col("text"), lit(" rep"), col("rep")).as("text"),
            col("source"))
          .localCheckpoint(true)
        val nDocs = docs.count()
        val embBase = Tables.embeddings(spark, sfDir)
          .select(col("vec_id").as("doc_id"), col("embedding"))
        val reps = spark.range(mult).select(col("id").as("rep"))
        val emb = embBase.crossJoin(reps)
          .select((col("doc_id") * mult + col("rep")).as("doc_id"),
            col("embedding"))
          .localCheckpoint(true)
        val lm = graft.functions.LangModel.knBigramProbs(
          docs.filter(col("doc_id") % 2 === 0), "text")
        val seed = docs.filter(col("doc_id") < nDocs * 2 / 5)
          .select(col("doc_id"), col("text"),
            when(array_contains(
              graft.functions.Text.tokens(col("text")), "stream"), 1L)
              .otherwise(-1L).as("y"))
        val evalDocs = docs.filter(col("doc_id") >= nDocs - 10)
          .select(col("doc_id"), col("text"))
        val stages =
          scala.collection.mutable.ListBuffer.empty[(String, Double, Long)]
        val t0 = System.nanoTime()
        val (split, _, _) = graft.pipeline.CorpusPipeline.curateFull(
          docs, evalDocs, seed, emb, lm,
          minFit = 0.0005, maxContamRatio = 0.1, vocabSize = 2000,
          maxOovRate = 0.5, minKeepRatio = 0.5, semThreshold = 0.95,
          nShards = 8,
          blockPhrases = Seq("wholly absent phrase", "slow fast"),
          lineDedupLen = Some(10),
          domainCap = Some(("source", math.max(22L, nDocs * 22L / 500L))),
          onStage = Some((n, s, c) => stages += ((n, s, c))))
        // training handoff over the survivors: deterministic token-budget
        // mix per synthetic domain, then fixed-budget sequence packing
        def stage(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
          val s0 = System.nanoTime()
          val c = df.localCheckpoint(true)
          stages += ((name, (System.nanoTime() - s0) / 1e9, c.count()))
        }
        val train = split.filter(col("split") === "train")
          .withColumn("domain", pmod(col("doc_id"), lit(8L)).cast("string"))
          .withColumn("n_tok", col("n_tokens").cast("long"))
        val budgets = (0 until 8).map(i => i.toString -> 4000L * mult)
        stage("mix") {
          graft.functions.Sampling.tokenBudgetSample(
            train, "domain", "n_tok", "doc_id", budgets)
        }
        stage("pack") {
          graft.functions.Sampling.packBudget(
            train.withColumn("shard", pmod(col("doc_id"), lit(8L))),
            "doc_id", "n_tok", budget = 256L, partCols = Seq("shard"))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val stageJson = stages.map { case (n, s, c) =>
          f"""{"stage":"$n","sec":$s%.2f,"rows":$c}""" }.mkString("[", ",", "]")
        println(f"""{"probe":"corpus_e2e","mult":$mult,"docs":$nDocs,"sec":$sec%.1f,"stages":$stageJson}""")
      }
    }

    // Sequence-packing probe: the two-level prefix sum + scan-stage
    // overlap generation must scale linearly in the corpus (one range
    // exchange, a mixture-sized offset broadcast, map-only explode) —
    // superlinear growth would expose a hidden global sort.
    for (mult <- Seq(1, 4, 16) if want("seq_pack")) {
      val docs = replicate(spark, base, mult)
        .select(col("doc_id"),
          graft.plans.TextExpressions.tokenCount(col("text")).as("nt"))
      val t0 = System.nanoTime()
      val seqs = graft.functions.Pack
        .concatChunk(docs, "doc_id", "nt", seqLen = 2048)
        .select(col("seq_id")).distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"seq_pack","mult":$mult,"docs":${nBase * mult},"seqs":$seqs,"sec":$sec%.2f}""")
    }

    // Hierarchical-assignment probe: FIXED corpus, growing centroid
    // count. Flat assignment is n·k dot products; the two-level path is
    // ~n·sqrt(k)·(1+nProbe) — the curve separating the two as k grows
    // is the deriveKCells extreme-regime claim, measured. Centroids are
    // k corpus vectors (no training in the timed region — the probe
    // isolates assignment cost; hier's timed region does include its
    // k-row super-quantizer fit, which is the real serving cost).
    if (want("hier_assign")) {
      val vecs = embBase
        .crossJoin(spark.range(16).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
        .localCheckpoint(true)
      val nV = vecs.count()
      for (k <- Seq(64, 256, 1024)) {
        val cents = embBase.orderBy(col("vec_id")).limit(k)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").as("centroid"))
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val nFlat = graft.functions.Vec.assignToCentroids(vecs, cents)
          .select(col("cell")).distinct().count()
        val secFlat = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nHier = graft.functions.Vec
          .assignToCentroidsHier(vecs, cents, nProbe = 2)
          .select(col("cell")).distinct().count()
        val secHier = (System.nanoTime() - t1) / 1e9
        println(f"""{"probe":"hier_assign","k":$k,"vecs":$nV,"flat_cells":$nFlat,"hier_cells":$nHier,"flat_sec":$secFlat%.2f,"hier_sec":$secHier%.2f}""")
      }
    }

    // SemDedup probe: k-means cells + in-cell cosine pairs on the
    // replicated embedding corpus. Replicas of a base vector share its
    // cell (identical coordinates), so true dup mass grows with the
    // replication while the pair stage stays sum-of-cell-squares — the
    // wall should track pair volume, never vecs². kCells is DERIVED
    // (deriveKCells, targetCellSize=64): cells stay ~bounded at every
    // multiple, the contract a fixed kCells broke (r5: 2.8/7.0/47.9 s).
    for (mult <- Seq(1, 4, 16) if want("semdedup")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      val t0 = System.nanoTime()
      val pairs = graft.functions.Vec.semDedupPairsAuto(vecs,
        threshold = 0.7, iters = 2, targetCellSize = 64L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"semdedup","mult":$mult,"vecs":${nEmb * mult},"kcells":${graft.functions.Vec.deriveKCells(nEmb * mult, 64L)},"pairs":$pairs,"sec":$sec%.2f}""")
    }

    // PQ probe: m per-subspace k-means trainings over the replicated
    // embedding corpus. Each subspace run is the kmeans loop on
    // subDim-wide slices, so total wall should stay linear in vectors
    // (m parallel-shaped linear passes, no cross-subspace interaction).
    for (mult <- Seq(1, 4, 16) if want("pq_train")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      val t0 = System.nanoTime()
      val nCodes = graft.functions.Quant.pqCodes(vecs, m = 4, subDim = 16,
        k = 8, iters = 2).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"pq_train","mult":$mult,"vecs":${nEmb * mult},"codes":$nCodes,"sec":$sec%.2f}""")
    }

    // IVF-PQ probe: the persisted serving layout A/B — bytes at rest
    // (cell-partitioned codes vs the float corpus) and probe wall
    // (partition-pruned ADC scan vs exact brute force) as the corpus
    // grows. The claims under test: codes stay ~const-factor smaller
    // than floats at every mult, and the ADC probe's wall grows with
    // the PROBED CELLS' share, not the corpus (brute force grows with
    // the corpus).
    for (mult <- Seq(1, 4, 16) if want("ivfpq")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
        .withColumn("cell", pmod(col("vec_id"), lit(16L)).cast("int"))
      val dir = java.nio.file.Files.createTempDirectory("probe_ivfpq").toString
      def dirBytes(p: String): Long = {
        val root = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      }
      val t0 = System.nanoTime()
      graft.functions.VecIndex.writeIvfPqIndex(vecs, "cell", dir,
        m = 4, subDim = 16, kCodes = 8, iters = 2)
      val t1 = System.nanoTime()
      vecs.select(col("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(s"$dir/floats")
      val queries = embBase.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"))
      val t2 = System.nanoTime()
      val adcHits = graft.functions.VecIndex.ivfPqProbeIndexed(spark, dir,
        queries, k = 10, nProbe = 3, excludeSelf = false).count()
      val t3 = System.nanoTime()
      val exactHits = graft.functions.Vec.bruteForceTopKUncached(queries,
        vecs.select(col("vec_id"), col("embedding")), 10,
        excludeSelf = false).count()
      val t4 = System.nanoTime()
      println(f"""{"probe":"ivfpq","mult":$mult,"vecs":${nEmb * mult},""" +
        f""""code_bytes":${dirBytes(s"$dir/codes")},""" +
        f""""float_bytes":${dirBytes(s"$dir/floats")},""" +
        f""""build_sec":${(t1 - t0) / 1e9}%.2f,""" +
        f""""adc_hits":$adcHits,"adc_sec":${(t3 - t2) / 1e9}%.2f,""" +
        f""""exact_hits":$exactHits,"exact_sec":${(t4 - t3) / 1e9}%.2f}""")
    }

    // Bloom-decontamination probe: plain broadcast-semi-join decontamination
    // shuffles the FULL corpus gram stream through its distinct; the bloom
    // path cuts it at the scan, so its wall should grow with corpus size at
    // a visibly smaller slope (the gram shuffle disappears; only the scan
    // and the survivor trickle remain).
    for (mult <- Seq(1, 4, 16) if want("decontaminate")) {
      val docs = replicate(spark, base, mult)
      val evalSet = base.filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
      for ((tag, run) <- Seq(
          "plain" -> (() => Dedup.decontaminate(
            docs, evalSet, "doc_id", "text", 3).count()),
          "bloom" -> (() => graft.functions.Bloom.decontaminateBloom(
            docs, evalSet, "doc_id", "text", 3).count()))) {
        val t0 = System.nanoTime()
        val kept = run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"decontaminate","variant":"$tag","mult":$mult,"kept":$kept,"sec":$sec%.2f}""")
      }
    }

    // Span-dedup probe: replicas share their full base text as repeated
    // 8-gram runs, so the repeated-gram set and the span output grow with
    // the planted duplication while every stage stays linear (positioned
    // gram scan → partial-aggregable count → semi-join → doc-local
    // interval merge). Wall should track corpus + span volume.
    for (mult <- Seq(1, 4, 16) if want("span_dedup")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val spans = Dedup.repeatedSpans(docs, "doc_id", "text", 8).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"span_dedup","mult":$mult,"docs":${nBase * mult},"spans":$spans,"sec":$sec%.2f}""")
    }

    // Suffix-ranking probe: 5 doubling rounds, each one positional
    // equi-join + one distinct + one two-level rank over the suffix
    // stream — wall should track the suffix count (= token count)
    // linearly; nothing in the plan is quadratic in corpus size.
    for (mult <- Seq(1, 4, 16) if want("suffix")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val n = graft.functions.Suffix.suffixRanks(docs, "doc_id", "text", 5)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"suffix","mult":$mult,"suffixes":$n,"sec":$sec%.2f}""")
    }

    // Edit-join A/B probe on SYNTHETIC vocabularies (replication cannot
    // grow a corpus's word-type table): n deterministic 5-10 char words
    // whose letters are Zipf-skewed (pmod of a squared hash biases the
    // head letters) — natural-vocabulary-shaped gram frequencies with
    // real near-collisions. Compares the count-filter path (FULL posting
    // lists, mass = sum(df^2), threshold prune) against the Ed-Join
    // prefix path (only each word's q*d+1 RAREST grams indexed) — both
    // exact; the prefix path is the scale regime because hub grams leave
    // its index entirely.
    for (mult <- Seq(1, 4, 16) if want("edit_join")) {
      val n = 15000 * mult
      val words = spark.range(n).selectExpr(
        """concat_ws('', transform(sequence(1, 5 + cast(id % 6 as int)),
           i -> chr(97 + cast(pmod(xxhash64(id, i), 676) *
                              pmod(xxhash64(id, i), 676) div 17576 as int))))
           AS w""")
        .distinct().localCheckpoint(true)
      val nw = words.count()
      // the count path is the measured LOSING regime here (sum(df^2)
      // grows quadratically: 15.4 s at 1x, 241 s at 4x) — probe it only
      // while affordable; the prefix path runs the full curve
      val t0 = System.nanoTime()
      val pc = if (mult <= 4)
        graft.functions.Edit.editPairs(words, "w", "w", 1).count()
      else -1L
      val t1 = System.nanoTime()
      val pp = graft.functions.Edit.editPairsPrefix(words, "w", "w", 1).count()
      val t2 = System.nanoTime()
      require(pc < 0 || pc == pp, s"count/prefix paths disagree: $pc vs $pp")
      println(f"""{"probe":"edit_join","mult":$mult,"vocab":$nw,"pairs":$pp,"count_sec":${(t1 - t0) / 1e9}%.2f,"prefix_sec":${(t2 - t1) / 1e9}%.2f}""")
    }

    // TextRank probe: the co-occurrence edge list is a vocabulary-sized
    // aggregate of a linear pair stream, and each PageRank round joins
    // rank-table-sized frames — so wall should grow with the corpus scan
    // and stay otherwise flat (the graph itself barely grows: replica
    // marker tokens add mult nodes to a fixed vocabulary).
    for (mult <- Seq(1, 4, 16) if want("textrank")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val kws = graft.functions.Graph.textRank(docs, "text", 2, 25).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"textrank","mult":$mult,"docs":${nBase * mult},"keywords":$kws,"sec":$sec%.2f}""")
    }

    // BM25 probe: query-term tf is a scan-cut explode (the stream is
    // |query|-bounded per doc BEFORE its exchange), doc lengths are a
    // compiled scan, and the answer is one TakeOrdered — retrieval wall
    // should be a clean linear function of corpus size.
    for (mult <- Seq(1, 4, 16) if want("bm25")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      graft.functions.Rank.bm25TopDocs(docs, "doc_id", "text",
        SparkEntry.bm25Query, 20).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"bm25","mult":$mult,"docs":${nBase * mult},"sec":$sec%.2f}""")
    }

    // BPE-training probe: the corpus-sized stage is ONE word-count
    // aggregate; every round after it is vocabulary-sized (pair counts
    // over distinct words + a 1-row broadcast + a per-word rewrite), so
    // wall should grow with the corpus scan and flatten in the rounds.
    for (mult <- Seq(1, 4, 16) if want("bpe_train")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val n = graft.functions.Bpe.learnMerges(docs, "text", 3).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"bpe_train","mult":$mult,"docs":${nBase * mult},"merges":$n,"sec":$sec%.2f}""")
    }

    // Winnow probe: fingerprint selection is a scan + one doc-partitioned
    // window, so wall must track the corpus linearly; the reported
    // fingerprint count vs gram count shows the ~2/(w+1) index sparsity
    // that makes the pairing join cheaper than the full inverted list.
    // Candidate pairs are counted pre-verify (verification is the shared
    // verifyJaccard already exercised by the jaccard/LSH paths, and
    // replicas are mutual near-dups, so verified pair mass grows
    // quadratically in mult by construction — honest output, separate
    // cost).
    for (mult <- Seq(1, 4, 16) if want("winnow")) {
      val docs = replicate(spark, base, mult)
      val grams = Dedup.docShingleIds(docs, "doc_id", "text", 3).count()
      val t0 = System.nanoTime()
      val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      val nFp = fp.count()
      val secSel = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val g = fp.select(col("doc_id"), col("tid")).distinct()
      val cands = g.select(col("tid"), col("doc_id").as("id_a"))
        .join(g.select(col("tid"), col("doc_id").as("id_b")), Seq("tid"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      val secPair = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"winnow","mult":$mult,"grams":$grams,"fingerprints":$nFp,"cand_pairs":$cands,"sel_sec":$secSel%.2f,"pair_sec":$secPair%.2f}""")
    }

    // DSIR probe: importance scoring is two scan-stage token passes + a
    // B-row broadcast ratio join + one partial-aggregable per-doc sum —
    // wall must stay linear in the corpus with a flat per-doc cost.
    for (mult <- Seq(1, 4, 16) if want("dsir")) {
      val docs = replicate(spark, base, mult)
      val target = base.limit(200)
      val t0 = System.nanoTime()
      val n = graft.functions.Importance.importanceScores(
        docs, target, "doc_id", "text", nBuckets = 512).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"dsir","mult":$mult,"docs":$n,"sec":$sec%.2f}""")
    }

    // KN-LM probe: estimation is one corpus-sized pair scan into
    // vocabulary²-bounded aggregates; scoring re-scans the corpus against
    // the bigram-type-sized table. Both walls must stay linear in the
    // corpus (the LM table itself grows sublinearly — replicas add
    // counts, not types, beyond their marker tokens).
    for (mult <- Seq(1, 4, 16) if want("kn_lm")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val lm = graft.functions.LangModel.knBigramProbs(docs, "text")
      val nLm = lm.count()
      val secLm = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nSc = graft.functions.LangModel
        .knScoreDocs(docs, "doc_id", "text", lm).count()
      val secSc = (System.nanoTime() - t1) / 1e9
      // Trigram depth: train tables + the three-way backoff scoring join
      // — wall must stay linear in the corpus like the bigram pass (the
      // extra order adds type-bounded tables and one more equi-join).
      val t2 = System.nanoTime()
      val nS3 = graft.functions.LangModel
        .knScoreDocsTrigram(docs, "doc_id", "text", docs).count()
      val sec3 = (System.nanoTime() - t2) / 1e9
      println(f"""{"probe":"kn_lm","mult":$mult,"bigram_types":$nLm,"docs_scored":$nSc,"train_sec":$secLm%.2f,"score_sec":$secSc%.2f,"tri_score_sec":$sec3%.2f}""")
    }

    // Prefix-filter probe: the exact (lossless) candidate cut vs the
    // dfCap inverted list, same replicated corpus. RECORDED NEGATIVE on
    // this corpus: the tiny vocabulary makes even prefix grams hubs
    // (every replica shares its marker shingle with thousands of docs),
    // so the prefix path measured 6.6/20.5/479 s against the inverted
    // list's 5.4/10.4/92 s at 1x/4x/16x — the 16x point is skipped here
    // to keep the probe suite's wall bounded; see jaccardPairsPrefix's
    // scaladoc for the regime analysis.
    for (mult <- Seq(1, 4) if want("jaccard_prefix")) {
      val docs = replicate(spark, base, mult)
      for ((tag, run) <- Seq(
          "inverted" -> (() => Dedup.ngramJaccardPairs(
            docs, "doc_id", "text", 3, 0.2, dfCap = Long.MaxValue).count()),
          "prefix" -> (() => Dedup.jaccardPairsPrefix(
            docs, "doc_id", "text", 3, 0.2).count()))) {
        val t0 = System.nanoTime()
        val pairs = run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"jaccard_prefix","variant":"$tag","mult":$mult,"pairs":$pairs,"sec":$sec%.2f}""")
      }
    }

    // Mutual-kNN probe: same cell blocking as semdedup plus one
    // query-keyed top-k window and one edge-keyed semi-join — wall should
    // track sum-of-cell-squares (the candidate mass), never vecs².
    // Auto-derived kCells, same contract as the semdedup probe.
    for (mult <- Seq(1, 4, 16) if want("mutual_knn")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      val t0 = System.nanoTime()
      val edges = graft.functions.Vec.mutualKnnPairsAuto(vecs, k = 3,
        iters = 2, targetCellSize = 64L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"mutual_knn","mult":$mult,"vecs":${nEmb * mult},"kcells":${graft.functions.Vec.deriveKCells(nEmb * mult, 64L)},"edges":$edges,"sec":$sec%.2f}""")
    }

    // Blocked-CC probe: the grouped union-find vs the iterative label
    // loop on the SAME cell-local mutual-kNN clustering. The blocked
    // pass is one shuffle at any multiplier; the loop pays per-round
    // join barriers times log(diameter) rounds — the gap is the point.
    for (mult <- Seq(1, 4, 16) if want("blocked_cc")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      for (variant <- Seq("blocked", "loop")) {
        val t0 = System.nanoTime()
        val comps =
          if (variant == "blocked")
            graft.functions.Vec.mutualKnnClustersAuto(vecs, k = 3,
              iters = 2, targetCellSize = 64L)
              .filter(col("is_rep")).count()
          else {
            val pairs = graft.functions.Vec.mutualKnnPairsAuto(vecs, k = 3,
              iters = 2, targetCellSize = 64L)
            graft.functions.Cluster.assignClusters(pairs, "id_a", "id_b",
              vecs.select(col("vec_id")), "vec_id")
              .filter(col("is_rep")).count()
          }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"blocked_cc","variant":"$variant","mult":$mult,"vecs":${nEmb * mult},"components":$comps,"sec":$sec%.2f}""")
      }
    }

    // Isolated CC-stage probe: on the end-to-end probe above, pair
    // GENERATION dominates both variants; this one times ONLY the
    // component stage, on pre-materialized worst-case edges — 64-vertex
    // chains (diameter 63) inside each block, the shape that maximizes
    // the loop's round count (pointer jumping: ~log2(63) ≈ 6 rounds,
    // each a join barrier + checkpoint + convergence action) while the
    // grouped union-find stays one shuffle regardless.
    for (mult <- Seq(1, 4, 16) if want("blocked_cc_isolated")) {
      val n = 100000L * mult
      val verts = spark.range(n)
        .select(expr("id div 64").as("cell"), col("id"))
        .localCheckpoint(true)
      val chainEdges = spark.range(n - 1)
        .filter(expr("(id + 1) div 64 = id div 64"))
        .select(expr("id div 64").as("cell"), col("id").as("id_a"),
          (col("id") + 1).as("id_b"))
        .localCheckpoint(true)
      for (variant <- Seq("blocked", "loop")) {
        val t0 = System.nanoTime()
        val comps =
          if (variant == "blocked")
            graft.functions.Cluster.blockedAssignClusters(chainEdges,
              "cell", "id_a", "id_b", verts, "id")
              .filter(col("is_rep")).count()
          else
            graft.functions.Cluster.assignClusters(
              chainEdges.select(col("id_a"), col("id_b")), "id_a", "id_b",
              verts.select(col("id")), "id")
              .filter(col("is_rep")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"blocked_cc_isolated","variant":"$variant","mult":$mult,"verts":$n,"components":$comps,"sec":$sec%.2f}""")
      }
    }

    // SNM probe: candidate volume must be EXACTLY (w-1)·n minus the rank
    // tail at any multiplier (the sort-based blocker's linearity is by
    // construction, not distribution luck), and wall must track the
    // two-level rank's range exchange — linear, no single-task sort.
    for (mult <- Seq(1, 4, 16) if want("snm")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val pairs = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val expected = 4L * nBase * mult - 10L
      println(f"""{"probe":"snm","mult":$mult,"docs":${nBase * mult},"pairs":$pairs,"expected":$expected,"sec":$sec%.2f}""")
    }

    // Adversarial-skew probe for the dedup/blocking family: the uniform
    // replication cards hide HUB KEYS — real corpora have boilerplate
    // that lands 20% of documents in ONE band/fingerprint bucket. The
    // fixture makes every 5th document an EXACT COPY of one boilerplate
    // text (unique ids, identical content → identical minhash bands and
    // identical winnow fingerprint sets → one n/5-occupancy bucket per
    // band/fingerprint) and measures each blocker GUARDED (the
    // occupancy caps the operators ship) vs UNGUARDED (caps effectively
    // off) — walls and candidate volumes side by side. SNM has no
    // unguarded twin: its (window−1)·n candidate bound is structural,
    // so the card records its skewed wall staying linear. The guarded
    // LSH/winnow paths must neither blow up NOR silently go quadratic:
    // a bucket over the cap leaves the join entirely (boilerplate
    // carries no pair signal — the documented recall trade).
    for (mult <- Seq(1, 4) if want("skew_dedup")) {
      val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
      val hub = replicate(spark, base, mult).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5L)) === 0L, lit(boiler))
          .otherwise(col("text")).as("text"))
        .localCheckpoint(true)
      val nHub = hub.filter(col("text") === boiler).count()
      def card(name: String, f: () => Long): Unit = {
        val t0 = System.nanoTime()
        val pairs = f()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"skew_dedup","path":"$name","docs":${nBase * mult},"hub_docs":$nHub,"pairs":$pairs,"sec":$sec%.2f}""")
      }
      // LSH banding: guarded (bucketCap 500 < the 1000-doc hub
      // occupancy) vs off. One untimed warm pass first — the cards
      // compare steady-state walls, not who paid scan/JIT warm-up.
      def lshPairs(cap: Int): Long = {
        val sig = Dedup.minhashSignatureHashed(hub, "doc_id", "text", 3, 8)
        Dedup.lshCandidatePairsUncached(
          Dedup.lshBands(sig, "doc_id", 2), "doc_id", bucketCap = cap)
          .count()
      }
      lshPairs(2): Unit
      card("lsh_guarded", () => lshPairs(500))
      card("lsh_unguarded", () => lshPairs(Int.MaxValue))
      // Winnow postings: guarded (dfCap 500 < hub occupancy) vs the
      // catalog default 100000, which at THIS skew is no guard at all —
      // the card is the evidence that dfCap must sit below the hub
      // occupancy a corpus actually has, not at a comfortable constant.
      def winnowCands(dfCap: Long): Long = {
        val fp = Dedup
          .winnowFingerprintsUncached(hub, "doc_id", "text", 3, 4)
        fp.groupBy(col("tid"))
          .agg(sort_array(collect_set(col("doc_id"))).as("__ids"))
          .filter(size(col("__ids")) >= 2 &&
            size(col("__ids")) <= dfCap)
          .select(explode(expr(
            """flatten(transform(__ids, (x, i) ->
               transform(slice(__ids, i + 2, size(__ids) - i - 1), y ->
                 struct(x AS id_a, y AS id_b))))""")).as("__p"))
          .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("__nsh")).filter(col("__nsh") >= 2)
          .count()
      }
      winnowCands(1L): Unit
      card("winnow_guarded", () => winnowCands(500L))
      card("winnow_unguarded", () => winnowCands(100000L))
      // Fraction-of-corpus cap (Dedup.fractionalDfCap, 1% = 10000 ppm):
      // the DERIVED guard. The hand-tuned 500 above guards because the
      // prober knew the hub size; the fractional cap lands below any
      // >1%-occupancy hub at EVERY corpus size with no tuning — the
      // card shows it binding at both mults (cap << hub occupancy)
      // with candidate volume matching the hand-tuned path's shape.
      val fCap = Dedup.fractionalDfCap(nBase * mult, maxDfPpm = 10000L)
      println(s"""{"probe":"skew_dedup","path":"fractional_cap","docs":${nBase * mult},"hub_docs":$nHub,"cap":$fCap}""")
      card("winnow_fractional", () => winnowCands(fCap))
      card("lsh_fractional",
        () => lshPairs(math.min(fCap, Int.MaxValue.toLong).toInt))
      // SNM: the hub key collapses 20% of ranks onto one key value;
      // ties break by id and the candidate count stays (window−1)·n.
      card("snm_skewed", () => Dedup.sortedNeighborhoodPairsUncached(
        hub, "doc_id", lower(substring(col("text"), 1, 30)), window = 5)
        .count())
      // Round 11: the derived fractional cap is now the GENERATOR
      // DEFAULT — these rows call the public blockers with NO cap
      // argument at all. Bounded candidates here close round 10's gap
      // (fractionalDfCap existed but every signature still shipped a
      // fixed default the skew card had just proven was not a guard).
      card("lsh_no_caps", () => {
        val sig = Dedup.minhashSignatureHashed(hub, "doc_id", "text", 3, 8)
        val n = Dedup.lshCandidatePairs(
          Dedup.lshBands(sig, "doc_id", 2), "doc_id").count()
        Dedup.releasePairMemos()
        n
      })
      card("winnow_no_caps", () => {
        val n = Dedup.winnowPairs(hub, "doc_id", "text", n = 3, w = 4,
          minJaccard = 0.2, minShared = 2).count()
        Dedup.releasePairMemos()
        n
      })
      card("ngram_no_caps", () => {
        val n = Dedup.ngramJaccardPairs(hub, "doc_id", "text", n = 3,
          minJaccard = 0.2).count()
        Dedup.releasePairMemos()
        n
      })
    }

    // Corpus-shuffle probe: one scan-stage hash + ONE shard-keyed sort
    // exchange; wall must be linear in the corpus (this is the cheapest
    // shuffle the engine does — a regression here flags config damage).
    for (mult <- Seq(1, 4, 16) if want("corpus_shuffle")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val n = graft.functions.Sampling.shardAssign(docs, "doc_id", 32)
        .selectExpr("max(pos)").collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"corpus_shuffle","mult":$mult,"docs":${nBase * mult},"max_pos":$n,"sec":$sec%.2f}""")
    }

    // k-center probe: k−1 rounds of (1-row broadcast → map-only least
    // fold → TakeOrdered(1) argmax) over the incremental min-distance
    // state — wall must grow linearly with the corpus and the per-round
    // cost must not depend on how many centers came before (the state
    // folds ONE new center per round, never the whole chosen set).
    for (mult <- Seq(1, 4, 16) if want("kcenter")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
      val t0 = System.nanoTime()
      val sel = graft.functions.Vec.kCenters(vecs, k = 8)
        .collect() // 8 rows — bounded
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"kcenter","mult":$mult,"vecs":${nEmb * mult},"centers":${sel.length},"sec":$sec%.2f}""")
    }

    // Unigram-TV probe: one (group, token) partial-aggregable count over
    // the corpus, then a token-keyed self-join whose fan-out is bounded
    // by the GROUP count — wall must track the corpus scan linearly
    // while the pair stage stays mixture-sized (5 langs → 10 pairs at
    // every multiple).
    for (mult <- Seq(1, 4, 16) if want("unigram_tv")) {
      val reps = spark.range(mult).select(col("id").as("rep"))
      val docs = base.crossJoin(reps)
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"),
          col("lang"))
      val t0 = System.nanoTime()
      val n = graft.functions.LangModel.unigramTV(docs, "lang", "text")
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"unigram_tv","mult":$mult,"docs":${nBase * mult},"pairs":$n,"sec":$sec%.2f}""")
    }

    // Line-dedup probe: the keep-first corpus-wide line dedup must stay
    // linear — explode, partial-min groupBy, equi-join, per-doc
    // re-aggregation all scale with the line stream. Replicas share the
    // base corpus's lines (the " repN" suffix perturbs only each doc's
    // LAST line), so duplicate mass grows with the corpus — the
    // crawl-dump regime, not the clean-corpus one.
    for (mult <- Seq(1, 4, 16) if want("line_dedup")) {
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val out = graft.functions.Lines.lineDedup(docs, "doc_id", "text", 10)
      val kept = out.agg(sum(col("kept_lines"))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"line_dedup","mult":$mult,"docs":${nBase * mult},"kept_lines":$kept,"sec":$sec%.2f}""")
    }

    // Blocklist A/B: the compiled Aho-Corasick mask vs the naive
    // OR-of-contains column form, same phrases, same corpus — the
    // single-pass claim measured, and the two forms must agree on the
    // hit count (presence semantics) at every multiplier.
    for (mult <- Seq(1, 4, 16) if want("blocklist")) {
      val phrases = Seq("slow fast", "merge batch", "vector table",
        "wholly absent phrase", "agg row scan", "customer query")
      val docs = replicate(spark, base, mult)
      val t0 = System.nanoTime()
      val nAc = docs.filter(graft.plans.Blocklist
        .blocklistMask(col("text"), phrases) =!= 0L).count()
      val tAc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val naive = phrases.map(p => col("text").contains(p)).reduce(_ || _)
      val nNaive = docs.filter(naive).count()
      val tNaive = (System.nanoTime() - t1) / 1e9
      require(nAc == nNaive, s"AC $nAc != naive $nNaive")
      println(f"""{"probe":"blocklist","mult":$mult,"docs":${nBase * mult},"phrases":6,"hits":$nAc,"sec_ac":$tAc%.2f,"sec_naive":$tNaive%.2f}""")
      // phrase-count axis: the automaton's one-pass cost is invariant in
      // the phrase count while OR-of-contains rescans the text per
      // phrase — 64 entries is where the gap should open.
      val big = phrases ++ (1 to 58).map(i => s"nonexistent phrase $i")
      val t2 = System.nanoTime()
      val nAc64 = docs.filter(graft.plans.Blocklist
        .blocklistMask(col("text"), big) =!= 0L).count()
      val tAc64 = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val naive64 = big.map(p => col("text").contains(p)).reduce(_ || _)
      val nNaive64 = docs.filter(naive64).count()
      val tNaive64 = (System.nanoTime() - t3) / 1e9
      require(nAc64 == nNaive64, s"AC64 $nAc64 != naive64 $nNaive64")
      println(f"""{"probe":"blocklist","mult":$mult,"docs":${nBase * mult},"phrases":64,"hits":$nAc64,"sec_ac":$tAc64%.2f,"sec_naive":$tNaive64%.2f}""")
    }

    // Event-analytics probe: funnel + retention + SCD2 over the events
    // stream replicated with DISJOINT user spaces (each replica shifts
    // user_id), so per-user state stays constant while users multiply —
    // the fan-out axis these operators scale along. All three are
    // filtered equi-joins / partial aggregates / bounded per-user
    // windows: linear walls expected.
    for (mult <- Seq(1, 4, 16) if want("events_analytics")) {
      val ev = Tables.eventsTs(spark, sfDir)
      val maxUser = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
      val reps = spark.range(mult).select(col("id").as("rep"))
      val events = ev.crossJoin(reps)
        .select((col("user_id") + col("rep") * maxUser).as("user_id"),
          col("ts"), col("event_type"), col("value"), col("event_id"))
      val t0 = System.nanoTime()
      val nF = graft.functions.Events.funnel(events, "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase")).count()
      val t1 = System.nanoTime()
      val nR = graft.functions.Events.retention(events, "user_id", "ts",
        604800000000L).agg(sum(col("n_users"))).head().getLong(0)
      val t2 = System.nanoTime()
      val nS = graft.functions.Events.scd2(events, "user_id",
        "event_type", "ts", "event_id").count()
      val t3 = System.nanoTime()
      println(f"""{"probe":"events_analytics","mult":$mult,"funnel_users":$nF,"retained":$nR,"scd2_rows":$nS,"sec_funnel":${(t1 - t0) / 1e9}%.2f,"sec_retention":${(t2 - t1) / 1e9}%.2f,"sec_scd2":${(t3 - t2) / 1e9}%.2f}""")
    }

    // Skew probe: one hot key holding ~90% of an 8x-replicated lineitem,
    // joined to a 1000-row dim with broadcast disabled so the shuffle-join
    // skew is real. Salting must beat the plain join by spreading the hot
    // key across saltFactor reducers.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val li = Tables.lineitem(spark, sfDir)
      .crossJoin(spark.range(8).select(col("id").as("rep")))
      .select(
        when(col("l_orderkey") % 10 < 9, lit(0L))
          .otherwise(col("l_partkey") % 1000).as("k"),
        col("l_extendedprice"))
    val dim = spark.range(1000).select(col("id").as("k"),
      (col("id") * 3).as("payload"))
    for ((tag, joined) <- Seq(
        "plain" -> li.join(dim, Seq("k")),
        "salted" -> graft.ops.Scale.saltedJoin(li, dim, Seq("k"), 32))
        if want("skew_join")) {
      val t0 = System.nanoTime()
      // Global (un-keyed) aggregate so the measurement isolates the join
      // stage: a groupBy on k would re-create the hot-key skew in a second
      // shuffle that salting the JOIN cannot and should not address.
      val n = joined.agg(count(lit(1)), sum("l_extendedprice"))
        .head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"skew_join","variant":"$tag","rows":$n,"sec":$sec%.2f}""")
    }

    // Spearman probe: both rankings ride the two-level exact rank, so
    // wall-clock must grow linearly with the corpus (a global-window
    // plan would collapse to one sort task and go superlinear while
    // starving the other 31 cores).
    for (mult <- Seq(1, 4, 16) if want("spearman")) {
      val docs = replicate(spark, base, mult)
        .select(col("doc_id"),
          graft.plans.TextExpressions.tokenCount(col("text")).cast("long")
            .as("ntok"),
          length(col("text")).cast("long").as("nch"))
      val t0 = System.nanoTime()
      val rho = graft.functions.Stats.spearman(docs, "ntok", "nch",
        "doc_id").head().getLong(2)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"spearman","mult":$mult,"docs":${nBase * mult},"rho_ppm":$rho,"sec":$sec%.2f}""")
    }

    // Graph-ANN probe: NN-descent build should track n·k² candidate
    // volume (never vecs²), and the 10-query beam-search SERVE should
    // stay ~flat as the corpus replicates — the corpus-size-independent
    // serving cost that is the point of a graph index. Replicas get a
    // deterministic orthogonal-ish nudge (dim rotation by rep) so the
    // replicated corpus has real new neighborhoods, not exact clones.
    for (mult <- Seq(1, 4, 16) if want("graph_ann")) {
      val vecs = embBase
        .crossJoin(spark.range(mult).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          expr("""transform(embedding,
            (x, i) -> element_at(embedding,
              CAST((i + rep) % size(embedding) AS INT) + 1))""")
            .as("embedding"))
        .localCheckpoint(true)
      val nV = vecs.count()
      // deriveNBits keeps seed buckets ~32-sized: a fixed nBits makes
      // the seeding stage quadratic (measured 10/19/260 s at 1/4/16x)
      val bits = graft.functions.Vec.deriveNBits(nV)
      val t0 = System.nanoTime()
      val g = graft.functions.Vec.nnDescentUncached(vecs, "vec_id",
        "embedding", k = 16, nBits = bits, rounds = 3, ringWindow = 8)
        .localCheckpoint(true)
      val edges = g.count()
      val secBuild = (System.nanoTime() - t0) / 1e9
      // serve through the PERSISTED index: each hop reads only the
      // beams' adjacency buckets — the corpus-size-independent path
      // (the in-memory beam search joins the full edge list each hop)
      val path = java.nio.file.Files
        .createTempDirectory(s"gprobe$mult").toString
      val sym = g.select(col("node_id"), col("neighbor_id"), col("sim"))
      val adj = sym.unionByName(sym.select(
          col("neighbor_id").as("node_id"),
          col("node_id").as("neighbor_id"), col("sim"))).distinct()
      adj.withColumn("node_bucket", pmod(col("node_id"), lit(64L)))
        .write.partitionBy("node_bucket").mode("overwrite")
        .parquet(s"$path/adj")
      vecs.withColumn("vec_bucket", pmod(col("vec_id"), lit(64L)))
        .write.partitionBy("vec_bucket").mode("overwrite")
        .parquet(s"$path/vectors")
      vecs.select(col("vec_id").as("id"))
        .select(col("id"),
          graft.functions.Sampling.hashOrder(col("id")).as("__h"))
        .orderBy(col("__h").asc, col("id").asc).limit(1)
        .select(col("id").as("entry_id"), lit(64L).as("n_buckets"))
        .write.mode("overwrite").parquet(s"$path/meta")
      val queries = vecs.filter(col("vec_id") < 10)
      val t1 = System.nanoTime()
      val served = graft.functions.VecIndex.graphProbeIndexed(spark,
        path, queries, k = 4, beam = 16, hops = 5).count()
      val secServe = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"graph_ann","mult":$mult,"vecs":$nV,"bits":$bits,"edges":$edges,"served":$served,"build_sec":$secBuild%.2f,"serve_sec":$secServe%.2f}""")
    }

    // Concurrent-serving probe: every bench number is one-query-at-a-
    // time, but a serving layer runs many — this card runs a mixed
    // workload (BM25, IVF-PQ ADC, graph beam) of 24 indexed probes
    // sequentially and then from a 12-thread client pool against ONE
    // session (FAIR scheduler), recording per-probe p50/p95 and total
    // wall both ways. The multi-tenant realism check on the partition-
    // pruned index claims: per-probe latency may stretch under
    // contention, but total wall must drop well below the sequential
    // sum, and no probe may starve (p95 bounded by a small multiple of
    // its sequential self).
    if (want("concurrent_serving")) {
      val docs = base
      val bmPath = java.nio.file.Files
        .createTempDirectory("csbm").toString
      graft.functions.TextIndex.writePostingsIndex(docs, bmPath, 64)
      val vecs = embBase.localCheckpoint(true)
      val cells = graft.functions.Vec.kmeans(vecs, k = 16, iters = 2)
        .select(col("vec_id"), col("cell"))
      val pqPath = java.nio.file.Files
        .createTempDirectory("cspq").toString
      graft.functions.VecIndex.writeIvfPqIndex(
        vecs.join(cells, Seq("vec_id")), "cell", pqPath,
        m = 4, subDim = 16, kCodes = 8, iters = 2)
      val gPath = java.nio.file.Files
        .createTempDirectory("csg").toString
      graft.functions.VecIndex.writeGraphIndex(vecs, gPath, k = 16,
        nBits = graft.functions.Vec.deriveNBits(nEmb))
      // 24 probes, 8 per kind, disjoint query slices so no two probes
      // share a plan (nothing memo- or cache-shared between them)
      val terms = Seq("data", "stream", "model", "value", "code",
        "point", "line", "set")
      val probes: Seq[(String, () => Unit)] =
        (0 until 8).flatMap { i =>
          Seq(
            s"bm25_$i" -> (() => {
              graft.functions.TextIndex.bm25Indexed(spark, bmPath,
                Seq(terms(i), terms((i + 1) % 8)), 20).count(): Unit
            }),
            s"ivfpq_$i" -> (() => {
              graft.functions.VecIndex.ivfPqProbeIndexed(spark, pqPath,
                vecs.filter(col("vec_id") % 8 === i)
                  .filter(col("vec_id") < 64), k = 10, nProbe = 3)
                .count(): Unit
            }),
            s"graph_$i" -> (() => {
              graft.functions.VecIndex.graphProbeIndexed(spark, gPath,
                vecs.filter(col("vec_id") % 8 === i)
                  .filter(col("vec_id") < 64), k = 4, beam = 16,
                hops = 5).count(): Unit
            }))
        }
      def pct(xs: Seq[Double], p: Double): Double = {
        val s = xs.sorted
        s(math.min(s.size - 1, (p * s.size).toInt))
      }
      def run(parallelism: Int): (Seq[Double], Double) = {
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(parallelism)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val t0 = System.nanoTime()
        val futs = probes.map { case (name, f) =>
          scala.concurrent.Future {
            // One FAIR pool per client: with spark.scheduler.mode=FAIR
            // and no allocation file, every job lands in the single
            // default pool, which schedules FIFO INTERNALLY — a
            // many-small-jobs probe (graph beam) queues behind every
            // in-flight multi-second scan. Per-client pools are how a
            // real serving deployment isolates latency classes; pools
            // materialize on demand with weight 1 and FAIR sharing
            // across them.
            spark.sparkContext.setLocalProperty(
              "spark.scheduler.pool", s"probe_$name")
            val s0 = System.nanoTime()
            f()
            val sec = (System.nanoTime() - s0) / 1e9
            // SPARK_GRAFT_PROBE_LATS=1: per-probe latency lines for
            // directing tail work (not part of the card).
            if (sys.env.get("SPARK_GRAFT_PROBE_LATS").contains("1"))
              println(f"PROBELAT p$parallelism $name $sec%.2f s")
            sec
          }
        }
        val lats = futs.map(scala.concurrent.Await
          .result(_, scala.concurrent.duration.Duration.Inf))
        val total = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        (lats, total)
      }
      run(1) // warm: parquet footers, codegen for all three probe plans
      val (seqLat, seqTotal) = run(1)
      val (conLat, conTotal) = run(12)
      println(f"""{"probe":"concurrent_serving","n_probes":${probes.size},"threads":12,"seq_total_sec":$seqTotal%.2f,"con_total_sec":$conTotal%.2f,"speedup":${seqTotal / conTotal}%.2f,"seq_p50":${pct(seqLat, 0.5)}%.2f,"seq_p95":${pct(seqLat, 0.95)}%.2f,"con_p50":${pct(conLat, 0.5)}%.2f,"con_p95":${pct(conLat, 0.95)}%.2f}""")
    }

    // Band-index fold card: a long-running dedup stream leaves one
    // __batch partition per micro-batch; checkpointIndex folds the
    // committed history into the bulk partition and compaction collapses
    // its files. Card records partition/file counts before/after and the
    // per-batch step wall before/after (the probe's partition-listing
    // cost is what unbounded growth inflates).
    if (want("incr_dedup_fold")) {
      val root = java.nio.file.Files
        .createTempDirectory("incfold").toString
      val indexPath = s"$root/index"
      val nBatches = 32
      for (b <- 0 until nBatches) {
        graft.streaming.IncrementalDedup.step(
          base.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b),
          indexPath, batchId = Some(b.toLong)): Unit
      }
      def partCount = graft.ops.Maintenance
        .partitionFileCounts(spark, indexPath).size
      def fileCount = graft.ops.Maintenance
        .partitionFileCounts(spark, indexPath).values.sum
      def stepSec(id: Long): Double = {
        val probe = base.limit(200)
          .select((col("doc_id") + 1000000L * id).as("doc_id"), col("text"))
        val t = System.nanoTime()
        graft.streaming.IncrementalDedup.step(probe, indexPath,
          batchId = Some(id)).count()
        (System.nanoTime() - t) / 1e9
      }
      val partsBefore = partCount
      val filesBefore = fileCount
      val secBefore = stepSec(100L)
      val folded = graft.streaming.IncrementalDedup
        .checkpointIndex(spark, indexPath, nBatches.toLong)
      graft.ops.Maintenance.compactPartitions(spark, indexPath,
        "__batch", Seq("-1"))
      val partsAfter = partCount
      val filesAfter = fileCount
      val secAfter = stepSec(101L)
      println(f"""{"probe":"incr_dedup_fold","batches":$nBatches,"folded":${folded.size},"parts_before":$partsBefore,"parts_after":$partsAfter,"files_before":$filesBefore,"files_after":$filesAfter,"step_before_sec":$secBefore%.2f,"step_after_sec":$secAfter%.2f}""")
    }

    // Graph-rebuild drift card: index 1/16 of a replicated corpus, bulk-
    // ingest the other 15/16 through the sink's batch arithmetic (16×
    // appended volume — appended nodes carry only their weak insert-time
    // edges), then measure the rebuild-trigger statistic
    // (graphRecallDrift: recall@k of the persisted beam search vs exact,
    // deterministic resident sample) before and after the offline
    // NN-descent rebuild. The card is the policy: rebuild when the
    // drifted recall crosses the serving floor.
    if (want("graph_rebuild")) {
      val vecs = embBase
        .crossJoin(spark.range(16).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          expr("""transform(embedding,
            (x, i) -> element_at(embedding,
              CAST((i + rep) % size(embedding) AS INT) + 1))""")
            .as("embedding"))
        .localCheckpoint(true)
      val path = java.nio.file.Files
        .createTempDirectory("grebuild").toString
      graft.functions.VecIndex.writeGraphIndex(
        vecs.filter(col("vec_id") % 16 === 0), path, k = 16,
        nBits = graft.functions.Vec.deriveNBits(nEmb))
      val t0 = System.nanoTime()
      for (r <- 1 until 16)
        graft.functions.VecIndex.appendGraphBatch(spark, path,
          vecs.filter(col("vec_id") % 16 === r), k = 2, beam = 8,
          hops = 3)
      val secIngest = (System.nanoTime() - t0) / 1e9
      // beam 32 / hops 6: a 32k-node flat graph from one entry point
      // needs a wider frontier than the 2k-node serving defaults for
      // ground-truth-comparable recall — the drift RATIO is the
      // trigger either way, but the card should read near the graph's
      // real ceiling, not the frontier's
      def recallPpm: Double = graft.functions.VecIndex
        .graphRecallDrift(spark, path, k = 4, beam = 32, hops = 6,
          nQueries = 32)
        .agg(avg(col("recall_ppm"))).head().getDouble(0)
      val drifted = recallPpm
      val t1 = System.nanoTime()
      graft.functions.VecIndex.rebuildGraphIndex(spark, path, k = 16)
      val secRebuild = (System.nanoTime() - t1) / 1e9
      val rebuilt = recallPpm
      println(f"""{"probe":"graph_rebuild","vecs":${nEmb * 16},"appended":${nEmb * 15},"recall_drifted_ppm":$drifted%.0f,"recall_rebuilt_ppm":$rebuilt%.0f,"ingest_sec":$secIngest%.1f,"rebuild_sec":$secRebuild%.1f}""")
    }

    // Index-compaction probe: a streamed-into IVF index accumulates one
    // file per (batch, touched cell); OPTIMIZE must collapse them
    // WITHOUT changing what probes see or costing more than a bounded
    // rewrite of the fragmented cells. Card records file counts
    // before/after, cells rewritten, and the indexed-probe wall
    // before/after (min-of-2 each) — the wall should be flat-to-better,
    // the results are asserted byte-identical in IndexMaintenanceSpec.
    if (want("index_compaction")) {
      val vecs = embBase
        .crossJoin(spark.range(16).select(col("id").as("rep")))
        .select((col("rep") * nEmb + col("vec_id")).as("vec_id"),
          col("embedding"))
        .localCheckpoint(true)
      val cells = graft.functions.Vec.kmeans(vecs, k = 32, iters = 2)
        .select(col("vec_id"), col("cell"))
      val corpus = vecs.join(cells, Seq("vec_id"))
      val path = java.nio.file.Files
        .createTempDirectory("cmpprobe").toString
      graft.functions.VecIndex.writeIvfIndex(
        corpus.filter(col("vec_id") % 17 =!= 0), "cell", path)
      // 8 ingest rounds of the held-out slice — the streaming sink's
      // exact append arithmetic (assign to persisted centroids, anti-
      // join append per cell) without the per-batch harness cost
      val held = corpus.filter(col("vec_id") % 17 === 0)
        .localCheckpoint(true)
      val cents = spark.read.parquet(s"$path/centroids")
      for (round <- 0 until 8) {
        val slice = held.filter(col("vec_id") % 8 === round)
          .select(col("vec_id"), col("embedding"))
        val assigned = graft.functions.Vec
          .assignToCentroids(slice, cents)
          .select(col("vec_id"), col("embedding"), col("cell"))
        graft.merge.Merge.antiJoinAppend(spark, assigned,
          s"$path/data", Seq("vec_id"), "cell"): Unit
      }
      def nFiles = graft.ops.Maintenance
        .partitionFileCounts(spark, s"$path/data").values.sum
      val queries = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"))
      def probeSec: Double = (1 to 2).map { _ =>
        val t = System.nanoTime()
        graft.functions.VecIndex.ivfProbeIndexed(spark, path, queries,
          k = 5, nProbe = 3).count()
        (System.nanoTime() - t) / 1e9
      }.min
      val filesBefore = nFiles
      val secBefore = probeSec
      val t0 = System.nanoTime()
      val compacted = graft.functions.IndexMaintenance
        .compactIvf(spark, path, maxFiles = 4)("data")
      val secCompact = (System.nanoTime() - t0) / 1e9
      val filesAfter = nFiles
      val secAfter = probeSec
      println(f"""{"probe":"index_compaction","vecs":${nEmb * 16},"files_before":$filesBefore,"files_after":$filesAfter,"cells_rewritten":${compacted.size},"probe_before_sec":$secBefore%.2f,"probe_after_sec":$secAfter%.2f,"compact_sec":$secCompact%.2f}""")
    }
    spark.stop()
  }
}
