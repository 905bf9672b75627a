package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Eval, TextIndex}
import graft.streaming.{CorpusStream, IncrementalCalibration, IncrementalDedup}

/** The composed streaming serving loop (CorpusStream): one microbatch
  * stream drives dedup-gate → accepted corpus → postings append →
  * calibration fold under ONE batchId. The isolated rungs are each
  * spec-green on replay; this suite is the CROSS-SINK story — a crash
  * between two sinks replays the whole batch against sinks in mixed
  * already-ran / never-ran states, and every sink must converge.
  */
class StreamingE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "runs far away into the deep dark forest while the moon rises slowly"
  private val other = "completely different content about spark query " +
    "engines and distributed columnar execution with code generation"
  private val third = "a third corpus document concerning streaming " +
    "watermarks state stores checkpoints and exactly once sinks"

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  // deterministic calibration signal over accepted rows
  private def confCol = pmod(col("doc_id"), lit(4L)) * lit(100L)
  private def okCol = pmod(col("doc_id"), lit(2L)) === 0L

  private def run(root: String, in: String): Unit =
    CorpusStream.stream(
      spark.readStream.schema(schema).parquet(in),
      root, s"$root/cp", confCol, okCol, binWidth = 100L,
      postingsBuckets = 8).awaitTermination()

  private def acceptedIds(root: String): Array[Long] =
    spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().sorted

  /** Histogram must equal the batch reliability chain over exactly the
    * accepted corpus — the parity that proves the calibration sink saw
    * each accepted doc once. */
  private def assertCalibrationParity(root: String): Unit = {
    val acc = spark.read.parquet(s"$root/accepted")
      .select(col("doc_id"), confCol.as("conf"), okCol.as("ok"))
    val streamed = IncrementalCalibration.histogram(spark, s"$root/hist")
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    val batch = Eval.reliability(acc, "conf", col("ok"), 100L)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    assert(streamed === batch)
  }

  test("composed loop end-to-end: gate, index, calibrate; restart is " +
      "a no-op; accepted docs are retrievable, duplicates are not") {
    val root = TestSpark.tmpDir("e2e_loop")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    // batch 0: base, a near-dup of base, one distinct doc
    Seq((2L, base), (3L, base.replace("lazy", "sleepy")), (4L, other))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    run(root, in)
    assert(acceptedIds(root) === Array(2L, 4L))
    // the near-dup reached NEITHER sink: not retrievable, not counted
    val hits = TextIndex.bm25Indexed(spark, s"$root/postings_index",
      Seq("quick", "fox"), k = 5).select("doc_id").as[Long].collect()
    assert(hits.contains(2L) && !hits.contains(3L))
    assertCalibrationParity(root)

    // restart with no new input: every sink unchanged
    val accBefore = acceptedIds(root).toList
    val postBefore = spark.read.parquet(s"$root/postings_index/postings")
      .count()
    run(root, in)
    assert(acceptedIds(root).toList === accBefore)
    assert(spark.read.parquet(s"$root/postings_index/postings").count()
      === postBefore)
    assertCalibrationParity(root)

    // batch 1: a cross-batch near-dup (drops) and a fresh doc (lands,
    // immediately retrievable through the index)
    Seq((5L, base.replace("moon", "sun")), (6L, third))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    run(root, in)
    assert(acceptedIds(root) === Array(2L, 4L, 6L))
    val hits2 = TextIndex.bm25Indexed(spark, s"$root/postings_index",
      Seq("watermarks"), k = 5).select("doc_id").as[Long].collect()
    assert(hits2 === Array(6L))
    assertCalibrationParity(root)
  }

  test("crash between sinks mid-batch: stream replay converges every " +
      "sink to the no-crash state") {
    val root = TestSpark.tmpDir("e2e_crash")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    Seq((2L, base), (4L, other))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    run(root, in) // batch 0 commits cleanly

    // batch 1 arrives; SIMULATED CRASH after the dedup-index write, the
    // accepted sink, and the postings append — before the calibration
    // fold and before the checkpoint commit. This is CorpusStream's own
    // per-batch sequence run partially under the batch id the stream
    // will assign on replay (1).
    val b1 = Seq((5L, base.replace("moon", "sun")), (6L, third))
      .toDF("doc_id", "text")
    val partial = IncrementalDedup
      .step(b1, s"$root/dedup_index", batchId = Some(1L))
      .localCheckpoint(true)
    partial.withColumn("__batch", lit(1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(s"$root/accepted")
    TextIndex.appendBatch(spark, s"$root/postings_index",
      partial.select(col("doc_id"), col("text")), bootstrapBuckets = 8)
    // ...crash here: calibration never ran for batch 1...

    // the stream replays batch 1 from the checkpoint: dedup index and
    // accepted overwrite their own partitions, the postings append
    // anti-joins to a no-op, calibration runs for the first time
    Seq((5L, base.replace("moon", "sun")), (6L, third))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    run(root, in)

    assert(acceptedIds(root) === Array(2L, 4L, 6L))
    // no sink double-counted: postings per (doc, term) unique, band
    // index row-unique, histogram equals the batch chain
    val post = spark.read.parquet(s"$root/postings_index/postings")
    assert(post.count() === post.select("doc_id", "term").distinct().count())
    val idx = spark.read.parquet(s"$root/dedup_index")
    assert(idx.count() === idx.distinct().count())
    assertCalibrationParity(root)
    // and the replayed batch's docs serve
    val hits = TextIndex.bm25Indexed(spark, s"$root/postings_index",
      Seq("watermarks"), k = 5).select("doc_id").as[Long].collect()
    assert(hits === Array(6L))
  }
}
