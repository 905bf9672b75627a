package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Vec, VecIndex}

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpusWithCells = {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cells = Vec.kmeans(emb, k = 8, iters = 2)
      .select(col("vec_id"), col("cell"))
    emb.select(col("vec_id"), col("embedding")).join(cells, Seq("vec_id"))
  }

  test("indexed probe matches in-memory ivfTopK exactly") {
    val corpus = corpusWithCells
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString
    VecIndex.writeIvfIndex(corpus, "cell", path)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(t => (t._1, t._4))
    val mem = rows(Vec.ivfTopK(corpus, queries, k = 5, nProbe = 3,
      cellCol = "cell"))
    val idx = rows(VecIndex.ivfProbeIndexed(spark, path, queries,
      k = 5, nProbe = 3))
    assert(idx.sameElements(mem))
  }

  test("streaming append assigns to nearest cell, exactly once, replay-safe") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(col("vec_id") >= 10)
    val cells = Vec.kmeans(base, k = 8, iters = 2)
      .select(col("vec_id"), col("cell"))
    val corpus = base.select(col("vec_id"), col("embedding"))
      .join(cells, Seq("vec_id"))
    val path = java.nio.file.Files.createTempDirectory("ivfidx3").toString
    VecIndex.writeIvfIndex(corpus, "cell", path)
    val baseCount = spark.read.parquet(s"$path/data").count()

    val streamDir = java.nio.file.Files.createTempDirectory("ivfnew").toString
    emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(streamDir)
    val ckpt = java.nio.file.Files.createTempDirectory("ivfckpt").toString

    VecIndex.streamAppend(spark, path, streamDir, ckpt)
      .awaitTermination()
    val after = spark.read.parquet(s"$path/data")
    assert(after.count() == baseCount + 10)
    // appended vectors are in their NEAREST cell: recompute the
    // assignment against the persisted centroids and compare
    val cents = spark.read.parquet(s"$path/centroids")
    val expected = Vec.assignToCentroids(
        emb.filter(col("vec_id") < 10), cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val got = after.filter(col("vec_id") < 10)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(got == expected)

    // second run, same checkpoint: nothing new to process
    VecIndex.streamAppend(spark, path, streamDir, ckpt).awaitTermination()
    assert(spark.read.parquet(s"$path/data").count() == baseCount + 10)
    // fresh checkpoint (simulated replay): the anti-join guard holds
    val ckpt2 = java.nio.file.Files.createTempDirectory("ivfckpt2").toString
    VecIndex.streamAppend(spark, path, streamDir, ckpt2).awaitTermination()
    assert(spark.read.parquet(s"$path/data").count() == baseCount + 10)
  }

  test("probe scans ONLY the probed cells' partitions") {
    val corpus = corpusWithCells
    val path = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    VecIndex.writeIvfIndex(corpus, "cell", path)
    val nCells = corpus.select("cell").distinct().count()
    assert(nCells == 8)
    // the pruned read the probe issues: a partition filter on cell
    val pruned = spark.read.parquet(s"$path/data")
      .filter(col("cell").isin(0, 1, 2))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // pruning happens at partition-listing time, not row-filter time
    assert(scan.metadata("PartitionFilters").contains("cell"),
      scan.metadata.toString)
    assert(scan.selectedPartitions.partitionCount == 3,
      s"expected 3 of $nCells partitions, got ${scan.selectedPartitions.partitionCount}")
    val full = spark.read.parquet(s"$path/data").inputFiles.length
    assert(scan.selectedPartitions.totalNumberOfFiles < full)
  }

  test("IVF-PQ persisted index: ADC probe + exact rerank equals the " +
      "in-plan ivfPqTopK chain; rebuild is idempotent") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.select(col("vec_id"), col("label"), col("embedding"))
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    VecIndex.writeIvfPqIndex(corpus, "label", path, m = 4, subDim = 16,
      kCodes = 8, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._4))
    // the persisted ADC shortlist, exact-reranked, must equal the
    // in-plan composition end to end (codebook round-trip through
    // parquet, cell partitioning, ADC arithmetic — all on the line)
    val sl = VecIndex.ivfPqProbeIndexed(spark, path, queries, k = 10,
        nProbe = 3)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val nv = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val reranked = rows(sl.join(qv, Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .withColumn("sim", Vec.cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5))
    val inPlan = rows(Vec.ivfPqTopK(corpus, queries, k = 5, nProbe = 3,
      cellCol = "label", m = 4, subDim = 16, kCodes = 8, iters = 2,
      shortlist = 10))
    assert(reranked.sameElements(inPlan))
    // rebuild over the same corpus: overwrite, probe unchanged
    VecIndex.writeIvfPqIndex(corpus, "label", path, m = 4, subDim = 16,
      kCodes = 8, iters = 2)
    val again = rows(VecIndex.ivfPqProbeIndexed(spark, path, queries,
        k = 10, nProbe = 3)
      .withColumn("rank", col("rank").cast("long")))
    val first = rows(VecIndex.ivfPqProbeIndexed(spark, path, queries,
        k = 10, nProbe = 3)
      .withColumn("rank", col("rank").cast("long")))
    assert(again.sameElements(first))
  }

  test("IVF-PQ streaming ingest: codebook encoding matches training, " +
      "exactly once, new vectors become probeable") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("label"), col("embedding"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq3").toString
    VecIndex.writeIvfPqIndex(base, "label", path, m = 4, subDim = 16,
      kCodes = 8, iters = 2)
    val baseCodes = spark.read.parquet(s"$path/codes").count()
    assert(baseCodes == base.count(), "packed: one code-array row per vector")

    // encoding consistency: re-encoding a TRAINING vector through the
    // stored codebook (the ingest path's arithmetic) reproduces its
    // stored code exactly
    val codebook = spark.read.parquet(s"$path/codebook")
    val reEnc = (0 until 4).map { ss =>
      Vec.assignToCentroids(
          base.select(col("vec_id"),
            expr(s"slice(embedding, ${ss * 16 + 1}, 16)").as("embedding")),
          codebook.filter(col("subspace") === ss)
            .select(col("code").as("cell"), col("centroid")))
        .select(col("vec_id"), lit(ss).as("subspace"),
          col("cell").as("code"))
    }.reduce(_ unionByName _)
    val stored = spark.read.parquet(s"$path/codes")
      .select(col("vec_id"),
        posexplode(col("codes")).as(Seq("subspace", "code")))
      .as[(Long, Int, Int)].collect().toSet
    val recomputed = reEnc.select($"vec_id", $"subspace", $"code")
      .as[(Long, Int, Int)].collect().toSet
    assert(recomputed == stored)

    // stream the held-out 10 vectors in; exactly once + replay-safe
    val streamDir = java.nio.file.Files.createTempDirectory("ivfpqnew").toString
    emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(streamDir)
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpqckpt").toString
    VecIndex.streamAppendPq(spark, path, streamDir, ckpt, m = 4,
      subDim = 16).awaitTermination()
    assert(spark.read.parquet(s"$path/codes").count() == baseCodes + 10)
    VecIndex.streamAppendPq(spark, path, streamDir, ckpt, m = 4,
      subDim = 16).awaitTermination()
    val ckpt2 = java.nio.file.Files.createTempDirectory("ivfpqckpt2").toString
    VecIndex.streamAppendPq(spark, path, streamDir, ckpt2, m = 4,
      subDim = 16).awaitTermination()
    assert(spark.read.parquet(s"$path/codes").count() == baseCodes + 10,
      "replay must not double-append")

    // ingested vectors landed in their L2-nearest coarse cell and are
    // probeable: with every cell probed, each streamed id shows up as
    // an ADC candidate for its own query
    val cents = spark.read.parquet(s"$path/centroids")
    val newQ = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val expectedCell = Vec.assignToCentroids(newQ, cents)
      .select($"vec_id", $"cell".cast("long")).as[(Long, Long)]
      .collect().toMap
    val gotCell = spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") < 10)
      .select($"vec_id", $"cell".cast("long")).distinct()
      .as[(Long, Long)].collect().toMap
    assert(gotCell == expectedCell)
    val selfHits = VecIndex.ivfPqProbeIndexed(spark, path, newQ, k = 1000,
        nProbe = 100, excludeSelf = false)
      .filter(col("query_id") === col("neighbor_id")).count()
    assert(selfHits == 10L,
      "every ingested vector must appear among its own query's candidates")
  }

  test("residual IVF-PQ: lower total quantization distortion than raw " +
      "PQ at the same budget; serve contract holds") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.select(col("vec_id"), col("label"), col("embedding"))
    // residual corpus: x - centroid(label)
    val cents = Vec.groupCentroids(
      corpus.select(col("label").as("cell"), col("embedding")),
      "cell", "embedding")
    val resid = corpus.select(col("vec_id"), col("label").as("cell"),
        col("embedding"))
      .join(cents, Seq("cell"))
      .select(col("vec_id"), zip_with(col("embedding"), col("centroid"),
        (x, c) => (x.cast("double") - c.cast("double")).cast("float"))
        .as("embedding"))
    def distortion(df: org.apache.spark.sql.DataFrame): Double =
      graft.functions.Quant.pqModelUncached(df, 4, 16, 8, 2)._1
        .agg(sum(col("dist2"))).head.getDouble(0)
    val rawD = distortion(corpus.select(col("vec_id"), col("embedding")))
    val resD = distortion(resid)
    // residuals concentrate near zero: the same codeword budget spends
    // its resolution on within-cell geometry - strictly less total
    // squared quantization error on this corpus
    assert(resD < rawD, s"residual distortion $resD !< raw $rawD")
    // serve contract: k rows per query, ranks 1..k, sims in [-1, 1]
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val got = Vec.ivfPqResidualTopK(corpus, queries, k = 5, nProbe = 3,
        cellCol = "label", m = 4, subDim = 16, kCodes = 8, iters = 2,
        shortlist = 10)
      .collect()
    assert(got.length == 50)
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.forall(_._2.map(_.getLong(3)).sorted.toSeq == (1L to 5L)))
    assert(got.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("IVF-PQ probe reads ONLY probed cells' code partitions") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.select(col("vec_id"), col("label"), col("embedding"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq2").toString
    VecIndex.writeIvfPqIndex(corpus, "label", path, m = 4, subDim = 16,
      kCodes = 8, iters = 2)
    val nCells = corpus.select("label").distinct().count()
    val pruned = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(0, 1, 2))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("cell"),
      scan.metadata.toString)
    assert(scan.selectedPartitions.partitionCount == 3,
      s"expected 3 of $nCells partitions, got " +
        s"${scan.selectedPartitions.partitionCount}")
    // the code payload at rest is (id, packed code array) — no floats
    val schema = spark.read.parquet(s"$path/codes").schema.fieldNames.toSet
    assert(schema == Set("vec_id", "codes", "cell"), schema)
  }

  test("rebalance splits hot cells: data preserved, sizes cut, probes exact") {
    import spark.implicits._
    // Force ONE giant cell: cluster with k=2 so one cell holds most of
    // the corpus, then demand cells of <= 150 vectors.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cells = Vec.kmeans(emb, k = 2, iters = 2)
      .select(col("vec_id"), col("cell"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .join(cells, Seq("vec_id"))
    val path = java.nio.file.Files.createTempDirectory("ivfreb").toString
    VecIndex.writeIvfIndex(corpus, "cell", path)
    val before = spark.read.parquet(s"$path/data")
      .select("vec_id").as[Long].collect().toSet
    val hotBefore = spark.read.parquet(s"$path/data")
      .groupBy("cell").count().filter($"count" > 150).count()
    assert(hotBefore >= 1) // fixture: at least one hot cell exists

    val splits = VecIndex.rebalanceCells(spark, path,
      maxCellSize = 150, splitK = 4)
    assert(splits.nonEmpty)
    val after = spark.read.parquet(s"$path/data")
    // no vector lost or duplicated; embeddings ride along unchanged
    assert(after.select("vec_id").as[Long].collect().toSet === before)
    assert(after.count() === before.size.toLong)
    // old hot cells are gone; their sub-cells exist and are smaller
    val sizesAfter = after.groupBy("cell").count()
      .collect().map(r => r.getAs[Number]("cell").longValue() -> r.getLong(1)).toMap
    for ((old, subs) <- splits) {
      assert(!sizesAfter.contains(old), s"old cell $old still present")
      assert(subs.nonEmpty && subs.forall(sizesAfter.contains), s"$subs")
      assert(subs.map(sizesAfter).sum < before.size.toLong) // split, not copied
    }
    // centroid table matches the data's cells exactly, centroids exact
    val cents = spark.read.parquet(s"$path/centroids")
    val centCells = cents.select(col("cell").cast("long"))
      .as[Long].collect().toSet
    assert(centCells === sizesAfter.keySet)
    val expected = Vec.groupCentroids(
        after.select(col("cell"), col("embedding")), "cell")
      .collect().map(r => r.getAs[Number]("cell").longValue() ->
        r.getAs[Seq[Float]]("centroid")).toMap
    val got = cents.collect().map(r => r.getAs[Number]("cell").longValue() ->
      r.getAs[Seq[Float]]("centroid")).toMap
    assert(got === expected)
    // probing EVERY cell is brute force, so rebalancing must not change
    // the full-probe answer: compare against pre-rebalance full probe
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2))
    val nAfter = sizesAfter.size
    val full = rows(VecIndex.ivfProbeIndexed(spark, path, queries,
      k = 5, nProbe = nAfter))
    val brute = rows(Vec.bruteForceTopK(queries, emb, 5))
    assert(full.map(t => (t._1, t._2)).toSet ===
      brute.map(t => (t._1, t._2)).toSet)
    // a second rebalance at the same cap converges (no hot cells left ->
    // no-op) or keeps shrinking; it must never error or lose data
    val again = VecIndex.rebalanceCells(spark, path,
      maxCellSize = 150, splitK = 4)
    val finalIds = spark.read.parquet(s"$path/data")
      .select("vec_id").as[Long].collect().toSet
    assert(finalIds === before)
    if (again.isEmpty) {
      val still = spark.read.parquet(s"$path/data").groupBy("cell").count()
        .filter($"count" > 150).count()
      assert(still === 0L)
    }
  }
}
