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
}
