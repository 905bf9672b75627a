package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPipeline

/** End-to-end corpus curation over the real documents table. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("curate: stages shrink monotonically and kill planted near-dups") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = docs.count()
    // Plant an exact duplicate and a near-duplicate of doc 0.
    val d0 = docs.filter($"doc_id" === 0).head()
    val nearDupText = d0.getAs[String]("text").replaceFirst("the", "thee")
    assert(nearDupText !== d0.getAs[String]("text"),
      "fixture assumption: doc 0 contains 'the' so the plant is a NEAR dup")
    val planted = Seq(
      (9001L, d0.getAs[String]("text"), "xx", "plant", 0L),
      (9002L, nearDupText, "xx", "plant", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val input = docs.unionByName(planted)

    val (curated, stats) = CorpusPipeline.curate(input)
    val s = stats.head()
    val (nIn, nGated, nExact, nCur) = (s.getLong(0), s.getLong(1),
      s.getLong(2), s.getLong(3))
    assert(nIn === nDocs + 2)
    assert(nGated <= nIn)
    assert(nExact === nGated - 1) // the exact clone of doc 0 dropped
    assert(nCur < nExact) // near-dup removal bites (planted + natural dups)
    // doc 0 survives (smallest id of its dup group); plants do not.
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(0L))
    assert(!ids.contains(9001L))
    assert(!ids.contains(9002L))
    // deterministic: same input -> same output
    val (curated2, _) = CorpusPipeline.curate(input)
    assert(curated2.select("doc_id").as[Long].collect().toSet === ids)
    // every curated doc carries a held-out split, assigned AFTER dedup
    assert(curated.columns.contains("split"))
    val splits = curated.select("split").distinct()
      .as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(curated.filter($"split".isNull).count() === 0)
    // split assignment is id-deterministic across runs
    val s1 = curated.select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = curated2.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 === s2)
  }

  test("curateFull: the whole gate chain end-to-end over the real corpus") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    // CCNet composition: LM trained on the even-id half as the "clean
    // reference"; classifier seeded by a text-determined label (the
    // same learnable signal q_perceptron uses); eval set = 10 docs,
    // which the contamination gate must then remove from the corpus
    // (each is 100% contaminated with itself).
    val lm = graft.functions.LangModel.knBigramProbs(
      docs.filter($"doc_id" % 2 === 0), "text")
    val seed = docs.filter($"doc_id" < 200)
      .select($"doc_id", $"text",
        when(array_contains(graft.functions.Text.tokens($"text"), "stream"),
          1L).otherwise(-1L).as("y"))
    val evalDocs = docs.filter($"doc_id" >= 490).select($"doc_id", $"text")

    val t0 = System.nanoTime()
    val (split, shards, stats) = CorpusPipeline.curateFull(
      docs, evalDocs, seed, emb, lm,
      minFit = 0.0005, maxContamRatio = 0.1, vocabSize = 2000,
      maxOovRate = 0.5, minKeepRatio = 0.5, semThreshold = 0.95,
      nShards = 8, blockPhrases = Seq("wholly absent phrase", "slow fast"),
      lineDedupLen = Some(10), domainCap = Some(("source", 22L)))
    val s = stats.head()
    val wall = (System.nanoTime() - t0) / 1e9
    val counts = stats.columns.map(c => c -> s.getAs[Long](c)).toMap
    info(s"curateFull sf0.01 wall=${"%.1f".format(wall)}s counts=" +
      stats.columns.map(c => s"$c=${counts(c)}").mkString(" "))

    // the gate chain only ever shrinks the corpus
    val order = Seq("n_input", "n_blocklist", "n_linededup", "n_quality",
      "n_gopher", "n_domaincap", "n_span", "n_contam", "n_oov",
      "n_lmfit", "n_classifier", "n_exact", "n_neardup", "n_semantic")
    for (Seq(a, b) <- order.sliding(2))
      assert(counts(b) <= counts(a), s"$b > $a in $counts")
    assert(counts("n_input") === 500L)
    // the contamination gate removed every eval doc still in the corpus
    // (each is 100% contaminated with itself); earlier gates may have
    // cut some of the 10 already, so the bound is strict shrink here
    // plus the no-eval-survivor assertion below
    assert(counts("n_contam") < counts("n_span"))
    // a real corpus survives the chain (the gates cut, not obliterate)
    assert(counts("n_semantic") > 100L)
    // split covers every survivor; the shard handoff is exactly train
    assert(split.count() === counts("n_semantic"))
    assert(counts("n_sharded") === counts("n_train"))
    val trainIds = split.filter($"split" === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(shards.select("doc_id").as[Long].collect().toSet === trainIds)
    // shard positions are dense 0..|shard|-1 per shard (loader contract)
    val dense = shards.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"))
      .filter($"mx" =!= $"n" - 1L).count()
    assert(dense === 0L)
    // no eval doc survived anywhere
    assert(trainIds.intersect((490L to 499L).toSet) === Set.empty)
    // deterministic end to end: a rerun reproduces the exact id set
    val (split2, _, _) = CorpusPipeline.curateFull(
      docs, evalDocs, seed, emb, lm,
      minFit = 0.0005, maxContamRatio = 0.1, vocabSize = 2000,
      maxOovRate = 0.5, minKeepRatio = 0.5, semThreshold = 0.95,
      nShards = 8, blockPhrases = Seq("wholly absent phrase", "slow fast"),
      lineDedupLen = Some(10), domainCap = Some(("source", 22L)))
    assert(split2.select("doc_id").as[Long].collect().toSet ===
      split.select("doc_id").as[Long].collect().toSet)
  }

  test("clustered near-dedup keeps one representative per transitive chain") {
    import spark.implicits._
    // A transitive chain whose BRIDGE doc carries the largest id: docs 1
    // and 2 each overlap bridge doc 3 heavily but share too little with
    // each other — (1,3) and (2,3) verify, (1,2) does not. The pairwise
    // policy drops only larger ids of verified pairs, so it drops the
    // bridge and keeps BOTH chain ends {1, 2}; the clustered policy
    // resolves the component to its minimum and keeps {1} alone.
    val shared1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val shared2 = (31 to 60).map(i => s"w$i").mkString(" ")
    val input = Seq(
      (1L, s"$shared1 aa1 aa2 aa3"),
      (2L, s"$shared2 zz1 zz2 zz3"),
      (3L, s"$shared1 $shared2"), // the bridge
      (10L, (100 to 140).map(i => s"q$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    // 32 hashes / 16 bands: at J~0.46 the default 4 bands deterministically
    // miss this fixture's (1,2) bucket collision; more bands = recall.
    val cfg = CorpusPipeline.Config(numHashes = 32, jaccardThreshold = 0.4)
    val pairs = CorpusPipeline.verifiedNearDupPairs(input, cfg)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), pairs)
    assert(!pairs.contains((1L, 2L)), pairs)
    val pairwise = CorpusPipeline.nearDedup(input, cfg)
      .select("doc_id").as[Long].collect().toSet
    val clustered = CorpusPipeline.nearDedupClustered(input, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(pairwise === Set(1L, 2L, 10L))
    assert(clustered === Set(1L, 10L))
  }

  test("best-copy near-dedup keeps the fullest copy; sharding hands off train") {
    import spark.implicits._
    // Same transitive chain as above: the BRIDGE doc 3 is the longest
    // member (shared1 + shared2 = 60 tokens vs 33 for the ends). The
    // min-id policy keeps {1}; the best-copy policy must keep {3}.
    val shared1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val shared2 = (31 to 60).map(i => s"w$i").mkString(" ")
    val input = Seq(
      (1L, s"$shared1 aa1 aa2 aa3"),
      (2L, s"$shared2 zz1 zz2 zz3"),
      (3L, s"$shared1 $shared2"),
      (10L, (100 to 140).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(numHashes = 32, jaccardThreshold = 0.4)
    val annotated = CorpusPipeline.annotate(input, cfg)
    val best = CorpusPipeline.nearDedupBestCopy(annotated, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(best === Set(3L, 10L))
    // shard handoff: only train rows, dense positions per shard
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val withSplits = CorpusPipeline.assignSplits(
      CorpusPipeline.annotate(docs))
    val sharded = CorpusPipeline.shardForTraining(withSplits, nShards = 4)
    assert(sharded.count() ===
      withSplits.filter($"split" === "train").count())
    val bad = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"))
      .filter($"mx" =!= $"n" - 1L).count()
    assert(bad === 0L)
  }

  test("classifierGate: seed-trained filter keeps target-like docs only") {
    import spark.implicits._
    // seed: clean docs speak {good*}, crawl noise speaks {junk*}
    val seed = ((1L to 15L).map(i => (i, s"good1 good2 good${1 + i % 3}", 1L)) ++
      (16L to 40L).map(i => (i, s"junk1 junk2 junk${1 + i % 3}", -1L)))
      .toDF("doc_id", "text", "y")
    // corpus: unlabeled mix, ids disjoint from the seed
    val corpus = Seq(
      (100L, "good1 good3 good2"), (101L, "junk3 junk1 junk2"),
      (102L, "good2 good1"), (103L, "junk2 junk2 junk1")
    ).toDF("doc_id", "text")
    val kept = CorpusPipeline.classifierGate(corpus, seed,
        nBuckets = 32, rounds = 12)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(100L, 102L))
  }

  test("semanticDedup drops planted embedding near-dups, keeps min id") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("vec_id", "doc_id")
      .select($"doc_id", $"embedding")
    // Plant an exact embedding clone of doc 0 under a larger id: cosine 1
    // beats any threshold, and both land in the same k-means cell.
    val clone = emb.filter($"doc_id" === 0)
      .select(lit(9001L).as("doc_id"), $"embedding")
    val vecs = emb.unionByName(clone)
    val docs = vecs.select($"doc_id", lit("body").as("text"))
    val out = CorpusPipeline.semanticDedup(docs, vecs,
      threshold = 0.95, kCells = 8)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(0L) && !ids.contains(9001L))
    // drop-only-on-evidence: docs without an embedding row survive
    val orphan = Seq((7777L, "no embedding")).toDF("doc_id", "text")
    val out2 = CorpusPipeline.semanticDedup(docs.unionByName(orphan), vecs,
      threshold = 0.95, kCells = 8)
    assert(out2.filter($"doc_id" === 7777L).count() === 1)
  }

  test("spanGate drops span-saturated docs, keeps partially-duplicated ones") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"tpl$i").mkString(" ") // 12-token template
    val docs = Seq(
      (1L, shared),                                    // pure template: keep 0
      (2L, shared + " plus a few original words here"), // 12/19 dup: keep ~0.37
      (3L, shared + " " + (1 to 20).map(i => s"own$i").mkString(" ")),
      (4L, "fully original text with no repeated windows at all")
    ).toDF("doc_id", "text")                           // doc 3: 12/32 dup
    val kept = CorpusPipeline.spanGate(docs, minKeepRatio = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("contamGate drops graded overlap; oovGate drops garble docs") {
    import spark.implicits._
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta and more words"),
      (11L, "alpha beta gamma then totally different content follows here " +
        "with many extra independent words appended for dilution purposes"),
      (12L, "no overlap with the held out evaluation sentences whatsoever")
    ).toDF("doc_id", "text")
    // strict gate: any overlap drops (matches decontaminate)
    val strict = CorpusPipeline.contamGate(docs, evalSet)
      .select("doc_id").as[Long].collect().toSet
    assert(strict === Set(12L))
    // lax gate keeps the mildly-overlapping doc
    val lax = CorpusPipeline.contamGate(docs, evalSet, maxContamRatio = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(lax === Set(11L, 12L))

    val corpus = Seq(
      (1L, "common words common words common words common words"),
      (2L, "common words with zz9 qq8 xx7 vv6 kk5 jj4 garble tokens")
    ).toDF("doc_id", "text")
    val clean = CorpusPipeline.oovGate(corpus, vocabSize = 2,
        maxOovRate = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(1L))
  }

  test("lmFitGate drops garble under a clean-corpus LM, passes bigram-less docs") {
    import spark.implicits._
    val clean = Seq(
      (1L, "the cat sat on the mat and the cat ran home fast"),
      (2L, "the dog sat on the mat and the dog ran home slow")
    ).toDF("doc_id", "text")
    val lm = graft.functions.LangModel.knBigramProbs(clean, "text")
    val incoming = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "zz qq ww ee rr tt yy uu garble stream"),
      (12L, "solo")                       // no bigrams: must pass
    ).toDF("doc_id", "text")
    val kept = CorpusPipeline.lmFitGate(incoming, lm, minFit = 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L))
  }

  test("exact dedup survives a real polynomial-hash collision") {
    import spark.implicits._
    // these two distinct texts share polyHash mod 1e9+7 (= 633477840,
    // found by brute force) — single-hash dedup would silently drop one
    val input = Seq(
      (1L, "doc 1026088 text"),
      (2L, "doc 2400600 text"),
      (3L, "doc 1026088 text")) // true duplicate of 1
      .toDF("doc_id", "text")
    val out = CorpusPipeline.exactDedup(CorpusPipeline.annotate(input))
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 2L)) // collision pair both kept; dup dropped
  }

  test("stream-stream join matches events within the time window") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDF().toDF("user_c", "ts_c")
    val b = buys.toDF().toDF("user_b", "ts_b", "amount")
    val joined = graft.streaming.StreamingMedallion.streamStreamJoin(
      c, b, "ts_c", "ts_b", "10 seconds",
      expr("user_c = user_b AND ts_b >= ts_c AND ts_b <= ts_c + interval 5 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    buys.addData((1L, ts("2024-01-01 00:02:00"), 9.99),   // within window
      (2L, ts("2024-01-01 00:30:00"), 5.0))               // outside window
    q.processAllAvailable()
    val out = spark.table("ssj_out").select("user_c", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === Set((1L, 9.99)))
    q.stop()
  }
}
