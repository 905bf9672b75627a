package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{IndexMaintenance, TextIndex, Vec, VecIndex}
import graft.ops.Maintenance

/** Compaction (OPTIMIZE) over the persisted serving-index layouts:
  * streaming appends fragment bucket/cell partitions into small files;
  * [[IndexMaintenance]] collapses them. The contract under test, per
  * layout: (1) only partitions over the file threshold are rewritten,
  * (2) untouched partitions stay BYTE-identical on disk, (3) probe
  * results are byte-identical before/after compaction, (4) compacted
  * partitions end at the per-partition size target (one file here).
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  /** name -> (size, crc32) for every data file under a table dir,
    * keyed by partition-relative path. */
  private def fileMap(dir: String): Map[String, (Long, Long)] = {
    val base = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(base)) return Map.empty
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    java.nio.file.Files.walk(base).forEach { p =>
      val name = p.getFileName.toString
      if (java.nio.file.Files.isRegularFile(p) &&
          !name.startsWith("_") && !name.startsWith(".")) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        val crc = new java.util.zip.CRC32
        crc.update(bytes)
        out(base.relativize(p).toString) = (bytes.length.toLong, crc.getValue)
      }
    }
    out.toMap
  }

  private def partFiles(dir: String, partPrefix: String)
      : Map[String, (Long, Long)] =
    fileMap(dir).filter(_._1.startsWith(partPrefix))

  private def maxPartCount(dir: String, partCol: String): Int = {
    val counts = Maintenance.partitionFileCounts(spark, dir)
    if (counts.isEmpty) 0 else counts.values.max
  }

  test("IVF data: compaction collapses appended cells, probe " +
      "byte-identical, untouched cells byte-identical") {
    val base = emb.filter(col("vec_id") >= 3)
    val cells = Vec.kmeans(base, k = 8, iters = 2)
      .select(col("vec_id"), col("cell"))
    val corpus = base.select(col("vec_id"), col("embedding"))
      .join(cells, Seq("vec_id"))
    val path = TestSpark.tmpDir("ivfcmp")
    VecIndex.writeIvfIndex(corpus, "cell", path)
    val threshold = maxPartCount(s"$path/data", "cell")

    // fragment: one real streaming append of 3 vectors (≤ 3 cells touched)
    val streamDir = TestSpark.tmpDir("ivfcmps")
    emb.filter(col("vec_id") < 3).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(streamDir)
    VecIndex.streamAppend(spark, path, streamDir, TestSpark.tmpDir("ivfcmpc"))
      .awaitTermination()

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    def probe() = VecIndex.ivfProbeIndexed(spark, path, queries,
        k = 5, nProbe = 3)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq
    val before = probe()
    val filesBefore = fileMap(s"$path/data")

    val compacted = IndexMaintenance.compactIvf(spark, path,
      maxFiles = threshold)("data")
    assert(compacted.nonEmpty, "the appended cells must qualify")
    val counts = Maintenance.partitionFileCounts(spark, s"$path/data")
    compacted.foreach { v =>
      assert(counts(s"cell=$v") == 1,
        s"tiny compacted cell $v should hold one file, got ${counts(s"cell=$v")}")
    }
    // untouched partitions: every byte still in place
    val untouchedPrefixes = counts.keySet
      .filterNot(d => compacted.contains(d.stripPrefix("cell=")))
    assert(untouchedPrefixes.nonEmpty, "need at least one untouched cell")
    val filesAfter = fileMap(s"$path/data")
    untouchedPrefixes.foreach { pref =>
      assert(filesBefore.filter(_._1.startsWith(pref + "/")) ==
        filesAfter.filter(_._1.startsWith(pref + "/")),
        s"untouched partition $pref changed on disk")
    }
    assert(probe() == before, "probe must be byte-identical post-compaction")
    // idempotent: nothing qualifies on a second run
    assert(IndexMaintenance.compactIvf(spark, path,
      maxFiles = threshold)("data").isEmpty)
  }

  test("IVF-PQ codes: compaction after streaming encode, ADC probe " +
      "byte-identical") {
    val base = emb.filter(col("vec_id") >= 2)
      .select(col("vec_id"), col("label"), col("embedding"))
    val path = TestSpark.tmpDir("pqcmp")
    VecIndex.writeIvfPqIndex(base, "label", path, m = 4, subDim = 16,
      kCodes = 8, iters = 2)
    val threshold = maxPartCount(s"$path/codes", "cell")

    val streamDir = TestSpark.tmpDir("pqcmps")
    emb.filter(col("vec_id") < 2).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(streamDir)
    VecIndex.streamAppendPq(spark, path, streamDir,
      TestSpark.tmpDir("pqcmpc"), m = 4, subDim = 16).awaitTermination()

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    def probe() = VecIndex.ivfPqProbeIndexed(spark, path, queries,
        k = 10, nProbe = 3)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq
    val before = probe()
    val compacted = IndexMaintenance.compactIvfPq(spark, path,
      maxFiles = threshold)("codes")
    assert(compacted.nonEmpty)
    assert(probe() == before)
  }

  test("graph adj+vectors: compaction after streaming insert, beam " +
      "probe byte-identical, untouched buckets byte-identical") {
    val path = TestSpark.tmpDir("gcmp")
    VecIndex.writeGraphIndex(emb.filter(col("vec_id") >= 2), path, k = 16)
    val thrAdj = maxPartCount(s"$path/adj", "node_bucket")
    val thrVec = maxPartCount(s"$path/vectors", "vec_bucket")

    val streamDir = TestSpark.tmpDir("gcmps")
    emb.filter(col("vec_id") < 2).write.mode("overwrite").parquet(streamDir)
    VecIndex.streamAppendGraph(spark, path, streamDir,
      TestSpark.tmpDir("gcmpc"), k = 4, beam = 16, hops = 5)
      .awaitTermination()

    val queries = emb.filter(col("vec_id") < 10)
    def probe() = VecIndex.graphProbeIndexed(spark, path, queries,
        k = 4, beam = 16, hops = 5)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._4)).toSeq
    val before = probe()
    val adjBefore = fileMap(s"$path/adj")

    val res = IndexMaintenance.compactGraph(spark, path,
      maxFiles = math.max(thrAdj, thrVec))
    assert(res("adj").nonEmpty || res("vectors").nonEmpty,
      "streaming insert must fragment at least one layout dir")
    val adjAfter = fileMap(s"$path/adj")
    val adjCounts = Maintenance.partitionFileCounts(spark, s"$path/adj")
    adjCounts.keySet
      .filterNot(d => res("adj").contains(d.stripPrefix("node_bucket=")))
      .foreach { pref =>
        assert(adjBefore.filter(_._1.startsWith(pref + "/")) ==
          adjAfter.filter(_._1.startsWith(pref + "/")),
          s"untouched adj bucket $pref changed on disk")
      }
    assert(probe() == before)
  }

  test("BM25 postings+lens: compaction after streaming append, ranked " +
      "hits byte-identical") {
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = all.filter(col("doc_id") >= 2)
    val path = TestSpark.tmpDir("bmcmp")
    TextIndex.writePostingsIndex(base, path, nBuckets = 16)
    val thr = math.max(maxPartCount(s"$path/postings", "bucket"),
      maxPartCount(s"$path/lens", "bucket"))

    val streamDir = TestSpark.tmpDir("bmcmps")
    all.filter(col("doc_id") < 2).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(streamDir)
    TextIndex.streamAppend(spark, path, streamDir,
      TestSpark.tmpDir("bmcmpc")).awaitTermination()

    val query = Seq("data", "stream", "model")
    def probe() = TextIndex.bm25Indexed(spark, path, query, 20)
      .collect().map(_.toSeq).toSeq
    val before = probe()
    val res = IndexMaintenance.compactPostings(spark, path, maxFiles = thr)
    assert(res("postings").nonEmpty || res("lens").nonEmpty)
    assert(probe() == before)
  }

  test("winnow fingerprints+sizes: compaction after streaming admit, " +
      "screen results byte-identical") {
    import spark.implicits._
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = all.filter(col("doc_id") >= 10 && col("doc_id") < 200)
    val path = TestSpark.tmpDir("wncmp")
    graft.functions.WinnowIndex.writeWinnowIndex(corpus, path,
      nBuckets = 8, n = 3, w = 4)
    val thr = math.max(maxPartCount(s"$path/fingerprints", "bucket"),
      maxPartCount(s"$path/sizes", "bucket"))

    // admit two new docs through the streaming path (appends to both
    // layout dirs through the anti-join guard)
    val streamDir = TestSpark.tmpDir("wncmps")
    all.filter(col("doc_id") < 2).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(streamDir)
    graft.functions.WinnowIndex.streamScreenAndAdmit(spark, path,
      streamDir, TestSpark.tmpDir("wncmpc"), TestSpark.tmpDir("wncmpr"))
      .awaitTermination()

    val queries = all.filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text"))
    def probe() = graft.functions.WinnowIndex.screen(spark, path,
        queries, minShared = 1L)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val before = probe()
    val res = IndexMaintenance.compactWinnow(spark, path, maxFiles = thr)
    assert(res("fingerprints").nonEmpty || res("sizes").nonEmpty)
    assert(probe() == before)
  }
}
