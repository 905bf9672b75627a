package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalDedup

/** Incremental near-dedup against a persistent band index: in-batch and
  * cross-batch duplicates drop, distinct docs pass, restarts are
  * exactly-once.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep dark forest while the moon rises slowly over the hills"
  val other = "completely different content about spark query engines and " +
    "distributed columnar execution with whole stage code generation"
  val third = "a third corpus document concerning streaming watermarks " +
    "state stores checkpoints and exactly once sinks in modern pipelines"

  test("step: drops in-batch and cross-batch near-dups, accepts distinct docs") {
    val root = TestSpark.tmpDir("inc_dedup")
    val indexPath = s"$root/index"

    // batch 1: base, a near-dup of base, and one distinct doc
    val b1 = Seq((1L, base), (2L, base.replace("lazy", "sleepy")),
      (3L, other)).toDF("doc_id", "text")
    val a1 = IncrementalDedup.step(b1, indexPath)
      .select("doc_id").as[Long].collect().sorted
    assert(a1 === Array(1L, 3L)) // 2 dropped against 1 within the batch

    // batch 2: another near-dup of base (cross-batch) + a new distinct doc
    val b2 = Seq((4L, base.replace("moon", "sun")), (5L, third))
      .toDF("doc_id", "text")
    val a2 = IncrementalDedup.step(b2, indexPath)
      .select("doc_id").as[Long].collect().sorted
    assert(a2 === Array(5L)) // 4 hits 1's buckets in the index

    // the index holds bands only for accepted docs
    val indexed = spark.read.parquet(indexPath)
      .select("doc_id").distinct().as[Long].collect().sorted
    assert(indexed === Array(1L, 3L, 5L))
  }

  test("step replay with the same batchId is idempotent and never self-collides") {
    val root = TestSpark.tmpDir("inc_dedup_replay")
    val indexPath = s"$root/index"
    val b1 = Seq((1L, base), (3L, other)).toDF("doc_id", "text")
    val first = IncrementalDedup.step(b1, indexPath, batchId = Some(0L))
      .select("doc_id").as[Long].collect().sorted
    assert(first === Array(1L, 3L))
    // crash-replay: the bands are already in the index under __batch=0,
    // but the probe excludes the batch's own partition, so the same rows
    // are accepted again (not dropped), and the index does not double up.
    val replay = IncrementalDedup.step(b1, indexPath, batchId = Some(0L))
      .select("doc_id").as[Long].collect().sorted
    assert(replay === Array(1L, 3L))
    val idx = spark.read.parquet(indexPath)
    assert(idx.count() === idx.distinct().count())
    // a later batch still dedups against batch 0's bands
    val next = IncrementalDedup.step(
      Seq((7L, base.replace("moon", "sun"))).toDF("doc_id", "text"),
      indexPath, batchId = Some(1L))
    assert(next.isEmpty)
  }

  test("empty batches and backfill-then-stream layouts don't wedge the index") {
    val root = TestSpark.tmpDir("inc_dedup_edge")
    val indexPath = s"$root/index"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // an EMPTY first batch leaves an index dir with no data files; the
    // schema-specified read must survive it
    assert(IncrementalDedup.step(empty, indexPath, batchId = Some(0L)).isEmpty)
    val a1 = IncrementalDedup.step(
      Seq((1L, base)).toDF("doc_id", "text"), indexPath, batchId = Some(1L))
    assert(a1.count() === 1)
    // batch-mode backfill (no batchId) writes the same partitioned layout,
    // so a later streaming batch still reads one coherent index
    val backfillIdx = s"$root/index2"
    IncrementalDedup.step(Seq((1L, base)).toDF("doc_id", "text"), backfillIdx)
    val next = IncrementalDedup.step(
      Seq((2L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text"),
      backfillIdx, batchId = Some(0L))
    assert(next.isEmpty) // near-dup of the backfilled doc drops
  }

  test("stream refuses an index bound to a different checkpoint") {
    val root = TestSpark.tmpDir("inc_dedup_binding")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    Seq((1L, base)).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    IncrementalDedup.stream(
      spark.readStream.schema(schema).parquet(in),
      s"$root/index", s"$root/accepted", s"$root/cp1").awaitTermination()
    // a FRESH checkpoint would restart batch ids at 0 and overwrite prior
    // index partitions — the binding guard must refuse
    val ex = intercept[IllegalStateException] {
      IncrementalDedup.stream(
        spark.readStream.schema(schema).parquet(in),
        s"$root/index", s"$root/accepted", s"$root/cp2")
    }
    assert(ex.getMessage.contains("bound to checkpoint"), ex.getMessage)
  }

  test("stream: exactly-once across restarts, accepted corpus stays dedup'd") {
    val root = TestSpark.tmpDir("inc_dedup_stream")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    Seq((1L, base), (2L, base.replace("lazy", "sleepy")), (3L, other))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    def run(): Unit = IncrementalDedup.stream(
      spark.readStream.schema(schema).parquet(in),
      s"$root/index", s"$root/accepted", s"$root/cp").awaitTermination()
    run()
    val got1 = spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().sorted
    assert(got1 === Array(1L, 3L))

    // restart with no new input: nothing reprocessed or duplicated
    run()
    assert(spark.read.parquet(s"$root/accepted").count() === 2)

    // new file: near-dup of an indexed doc drops, fresh doc lands
    Seq((4L, base.replace("moon", "sun")), (5L, third))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    run()
    val got3 = spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().sorted
    assert(got3 === Array(1L, 3L, 5L))
  }

  test("checkpointIndex folds committed batches into the bulk partition " +
      "without changing any dedup decision") {
    val root = TestSpark.tmpDir("inc_dedup_fold")
    val indexPath = s"$root/index"
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    // three committed batches
    ids(IncrementalDedup.step(
      Seq((1L, base), (3L, other)).toDF("doc_id", "text"),
      indexPath, batchId = Some(0L)))
    ids(IncrementalDedup.step(
      Seq((5L, third)).toDF("doc_id", "text"),
      indexPath, batchId = Some(1L)))
    ids(IncrementalDedup.step(
      Seq((6L, base.reverse)).toDF("doc_id", "text"),
      indexPath, batchId = Some(2L)))

    // control: byte-copy of the unfolded index
    val ctlPath = s"$root/index_ctl"
    val src = java.nio.file.Paths.get(indexPath)
    java.nio.file.Files.walk(src).forEach { p =>
      val dst = java.nio.file.Paths.get(ctlPath)
        .resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    }

    // fold batches 0 and 1 (committed); 2 keeps its replay partition
    val folded = IncrementalDedup.checkpointIndex(spark, indexPath, 2L)
    assert(folded === Seq(0L, 1L))
    val fs = new java.io.File(indexPath)
    val dirs = fs.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs.contains("__batch=0") && !dirs.contains("__batch=1"), dirs)
    assert(dirs.contains("__batch=-1") && dirs.contains("__batch=2"), dirs)

    // a new batch (near-dup of batch-0 content + one distinct doc)
    // dedups IDENTICALLY against the folded and the control index
    val b4 = Seq((9L, base.replace("dog", "cat")),
      (10L, "entirely novel content that matches nothing indexed before " +
        "with unique words like zirconium and palimpsest in it today"))
      .toDF("doc_id", "text")
    val aFolded = ids(IncrementalDedup.step(b4, indexPath,
      batchId = Some(3L)))
    val aControl = ids(IncrementalDedup.step(b4, ctlPath,
      batchId = Some(3L)))
    assert(aFolded === aControl)

    // the bulk partition's accumulated files compact without changing
    // a replayed probe (same batchId → idempotent, same decisions)
    graft.ops.Maintenance.compactPartitions(spark, indexPath,
      "__batch", Seq("-1"))
    val aReplay = ids(IncrementalDedup.step(b4, indexPath,
      batchId = Some(3L)))
    assert(aReplay === aFolded)

    // refold below the same bound is a no-op
    assert(IncrementalDedup.checkpointIndex(spark, indexPath, 2L).isEmpty)
  }

  test("cdcStep: verbatim long-span sharers drop, paraphrases pass, " +
      "replay is idempotent") {
    val root = TestSpark.tmpDir("inc_cdc")
    val indexPath = s"$root/index"
    // batch 1: base, a doc EMBEDDING a verbatim span of base, a distinct
    // doc, and a doc too short to chunk past minLen
    val b1 = Seq((1L, base), (2L, s"totally new head then $base tail"),
      (3L, other)).toDF("doc_id", "text")
    val a1 = IncrementalDedup.cdcStep(b1, indexPath, maskBits = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(a1 === Array(1L, 3L)) // 2 shares base's internal chunks
    // batch 2: cross-batch verbatim reuse drops; a PARAPHRASE (idea
    // overlap, no exact long span) passes — the grain that separates
    // cdcStep from the MinHash step
    val paraphrase = "the fast brown fox leaps over a sleepy dog then " +
      "sprints far off into deep dark woods while a moon climbs the hill"
    val b2 = Seq((4L, s"$base with a novel suffix appended"),
      (5L, paraphrase)).toDF("doc_id", "text")
    val a2 = IncrementalDedup.cdcStep(b2, indexPath, maskBits = 4,
        batchId = Some(1L))
      .select("doc_id").as[Long].collect().sorted
    assert(a2 === Array(5L))
    // replay of batch 1's keys cannot self-collide
    val replay = IncrementalDedup.cdcStep(
        Seq((6L, third)).toDF("doc_id", "text"), indexPath,
        maskBits = 4, batchId = Some(2L))
      .select("doc_id").as[Long].collect()
    assert(replay === Array(6L))
    val replay2 = IncrementalDedup.cdcStep(
        Seq((6L, third)).toDF("doc_id", "text"), indexPath,
        maskBits = 4, batchId = Some(2L))
      .select("doc_id").as[Long].collect()
    assert(replay2 === Array(6L))
    val idx = spark.read.parquet(indexPath)
      .select("doc_id").distinct().as[Long].collect().sorted
    assert(idx === Array(1L, 3L, 5L, 6L))
  }
}
