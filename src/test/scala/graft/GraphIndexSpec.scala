package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Vec, VecIndex}

/** Persisted kNN-graph serving index: indexed probe parity with the
  * in-memory beam search, bucket-pruned hop reads, streaming insert
  * with exactly-once replay.
  */
class GraphIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("indexed probe equals the in-memory beam search exactly") {
    val path = java.nio.file.Files.createTempDirectory("gidx").toString
    VecIndex.writeGraphIndex(emb, path, k = 16)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._4))
    val g = Vec.nnDescent(emb, "vec_id", "embedding", k = 16)
    val mem = rows(Vec.graphBeamSearch(g, emb, queries, "vec_id",
      "embedding", k = 4, beam = 16, hops = 5))
    val idx = rows(VecIndex.graphProbeIndexed(spark, path, queries,
      k = 4, beam = 16, hops = 5))
    assert(idx.sameElements(mem))
  }

  test("batched-frontier serving loop equals the distributed bulk loop") {
    // The serving path (frontier on the driver, one job per hop) and
    // the bulk path (checkpointed executor-side beams) must produce
    // identical beams — same candidates, sims, and tie-breaks.
    val path = java.nio.file.Files.createTempDirectory("gidx4").toString
    VecIndex.writeGraphIndex(emb, path, k = 16)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._4))
    val serving = rows(VecIndex.graphProbeIndexed(spark, path, queries,
      k = 4, beam = 16, hops = 5))
    val bulk = rows(VecIndex.graphProbeIndexed(spark, path, queries,
      k = 4, beam = 16, hops = 5, frontierMax = 0L))
    assert(serving.sameElements(bulk))
  }

  test("a hop's adjacency read prunes to the beam's buckets") {
    val path = java.nio.file.Files.createTempDirectory("gidx2").toString
    VecIndex.writeGraphIndex(emb, path, k = 16, nBuckets = 16)
    // the shape of read a hop issues: bucket partition filter first
    val pruned = spark.read.parquet(s"$path/adj")
      .filter(col("node_bucket").isin(0L, 1L, 2L))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("node_bucket"),
      scan.metadata.toString)
    assert(scan.selectedPartitions.partitionCount == 3,
      s"expected 3 of 16 buckets, got ${scan.selectedPartitions.partitionCount}")
    val full = spark.read.parquet(s"$path/adj").inputFiles.length
    assert(scan.selectedPartitions.totalNumberOfFiles < full)
  }

  test("streaming insert: searched-in edges land symmetrized, " +
      "exactly once across a second run, vectors appended") {
    val path = java.nio.file.Files.createTempDirectory("gidx3").toString
    // index everything EXCEPT the two vectors we'll stream in
    VecIndex.writeGraphIndex(emb.filter(col("vec_id") >= 2), path, k = 16)
    val streamDir = java.nio.file.Files.createTempDirectory("gstream")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("gckpt").toString
    emb.filter(col("vec_id") < 2).write.mode("overwrite").parquet(streamDir)
    VecIndex.streamAppendGraph(spark, path, streamDir, ckpt,
      k = 4, beam = 16, hops = 5).awaitTermination()
    val adj = spark.read.parquet(s"$path/adj")
    // both directions present for the inserted nodes
    val out = adj.filter(col("node_id") < 2).count()
    val in = adj.filter(col("neighbor_id") < 2).count()
    assert(out >= 2 * 4 && in >= 2 * 4, s"out=$out in=$in")
    // inserted edges point at resident nodes, never batch-mates
    assert(adj.filter(col("node_id") < 2 && col("neighbor_id") < 2)
      .count() == 0)
    val vecs = spark.read.parquet(s"$path/vectors")
    assert(vecs.filter(col("vec_id") < 2).count() == 2)
    // a second AvailableNow run over the SAME input is a no-op
    val before = (adj.count(), vecs.count())
    VecIndex.streamAppendGraph(spark, path, streamDir,
      ckpt, k = 4, beam = 16, hops = 5).awaitTermination()
    val after = (spark.read.parquet(s"$path/adj").count(),
      spark.read.parquet(s"$path/vectors").count())
    assert(after == before, s"replay changed the index: $before -> $after")
    // the inserted node is now REACHABLE: probing for it from the
    // index returns its searched-in neighbors
    val probe = VecIndex.graphProbeIndexed(spark, path,
      emb.filter(col("vec_id") === 0), k = 4, beam = 16, hops = 5)
    assert(probe.count() == 4)
  }

  test("recall drift after heavy ingest is measurable; offline rebuild " +
      "recovers it") {
    val path = java.nio.file.Files.createTempDirectory("gdrift").toString
    // index a QUARTER of the corpus, then ingest the other three
    // quarters through the sink's batch arithmetic with WEAK insert
    // edges (k=2) — 3× appended volume, the drift regime the rebuild
    // policy exists for
    VecIndex.writeGraphIndex(emb.filter(col("vec_id") % 4 === 0), path,
      k = 16)
    for (r <- 1 to 3)
      VecIndex.appendGraphBatch(spark, path,
        emb.filter(col("vec_id") % 4 === r), k = 2, beam = 8, hops = 3)
    def card() = VecIndex.graphRecallDrift(spark, path, k = 4, beam = 16,
      hops = 5, nQueries = 24)
    def avgPpm(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recall_ppm"))).head.getDouble(0)
    val driftCard = card().localCheckpoint(true)
    // the drift statistic is per-query and deterministic (hash-sampled
    // resident queries): same card on a re-measure
    assert(driftCard.count() == 24)
    assert(avgPpm(card()) == avgPpm(driftCard))
    val drifted = avgPpm(driftCard)
    VecIndex.rebuildGraphIndex(spark, path, k = 16)
    val rebuilt = avgPpm(card())
    info(f"recall_ppm drifted=$drifted%.0f rebuilt=$rebuilt%.0f")
    // rebuild re-runs NN-descent over ALL residents: recall must
    // recover past the drifted index and land high in absolute terms
    assert(rebuilt > drifted,
      f"rebuild did not improve recall: $drifted%.0f -> $rebuilt%.0f")
    assert(rebuilt >= 800000.0, f"rebuilt recall too low: $rebuilt%.0f")
  }
}
