package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Eval
import graft.streaming.IncrementalCalibration

/** Incremental calibration histogram: replay idempotence, streamed ==
  * batch parity for the whole isotonic/ECE chain, exactly-once across
  * stream restarts.
  */
class IncrementalCalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, conf, correct): two clearly separated accuracy regimes plus a
  // mid bin, enough rows to occupy several isotonic segments.
  private def preds = (0L until 400L).map { i =>
    val conf = (i % 4L) * 100L + i % 50L
    val correct = (i % 4L) match {
      case 0L => i % 5L != 0L  // low conf, ~80%? no: 4 of 5 correct
      case 1L => i % 3L == 0L  // ~33%
      case 2L => i % 2L == 0L  // 50%
      case _  => i % 10L != 0L // 90%
    }
    (i, conf, correct)
  }.toDF("id", "conf", "correct")

  private def batchEce = Eval.ece(Eval.isotonicCalibrate(
    Eval.reliability(preds, "conf", col("correct"), binWidth = 100L)))

  test("stepped slices render the exact batch isotonic/ECE chain") {
    val hist = TestSpark.tmpDir("inccal_parity")
    for (b <- 0L until 4L)
      IncrementalCalibration.step(
        preds.filter(pmod(col("id"), lit(4L)) === b), hist, "conf",
        col("correct"), binWidth = 100L, batchId = Some(b))
    val streamed = IncrementalCalibration.eceCard(spark, hist).collect()
    val batch = batchEce.collect()
    assert(streamed.map(_.toSeq.toList).toList ===
      batch.map(_.toSeq.toList).toList)
    // the live reliability table equals the batch one bin-for-bin
    val h = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    val r = Eval.reliability(preds, "conf", col("correct"), 100L)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    assert(h === r)
  }

  test("replaying a batchId overwrites its own delta — no double count") {
    val hist = TestSpark.tmpDir("inccal_replay")
    val b0 = preds.filter(pmod(col("id"), lit(4L)) === 0L)
    IncrementalCalibration.step(b0, hist, "conf", col("correct"),
      100L, batchId = Some(0L))
    val once = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    // crash-replay of the same microbatch
    IncrementalCalibration.step(b0, hist, "conf", col("correct"),
      100L, batchId = Some(0L))
    val twice = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    assert(once === twice)
  }

  test("streaming wiring: exactly-once across restarts, card tracks input") {
    val root = TestSpark.tmpDir("inccal_stream")
    val in = s"$root/in"
    val hist = s"$root/hist"
    val ckpt = s"$root/ckpt"
    preds.filter(col("id") < 200L)
      .write.parquet(in)
    IncrementalCalibration.stream(spark, in, hist, ckpt, "conf",
      "correct", 100L).awaitTermination()
    // restart with NO new files: AvailableNow drains nothing new, the
    // histogram is unchanged
    val before = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    IncrementalCalibration.stream(spark, in, hist, ckpt, "conf",
      "correct", 100L).awaitTermination()
    val after = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    assert(before === after)
    // late-arriving files fold in; the final card equals the batch
    // chain over ALL rows
    preds.filter(col("id") >= 200L)
      .write.mode("append").parquet(in)
    IncrementalCalibration.stream(spark, in, hist, ckpt, "conf",
      "correct", 100L).awaitTermination()
    val streamed = IncrementalCalibration.eceCard(spark, hist)
      .collect().map(_.toSeq.toList).toList
    assert(streamed === batchEce.collect().map(_.toSeq.toList).toList)
  }

  test("checkpointHistogram folds committed deltas exactly — no bin moves") {
    val hist = TestSpark.tmpDir("inccal_fold")
    for (b <- 0L until 4L)
      IncrementalCalibration.step(
        preds.filter(pmod(col("id"), lit(4L)) === b), hist, "conf",
        col("correct"), binWidth = 100L, batchId = Some(b))
    val before = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    // fold batches 0..2, keep batch 3's replayable tail
    val folded = IncrementalCalibration.checkpointHistogram(spark, hist, 3L)
    assert(folded === Seq(0L, 1L, 2L))
    val after = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    assert(after === before)
    // layout is bulk + tail only
    // partition-value inference types __batch as int on a bare read
    val parts = spark.read.parquet(hist)
      .select(col("__batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(parts === Array(-1L, 3L))
    // the kept tail batch is still replay-idempotent
    IncrementalCalibration.step(
      preds.filter(pmod(col("id"), lit(4L)) === 3L), hist, "conf",
      col("correct"), binWidth = 100L, batchId = Some(3L))
    val replayed = IncrementalCalibration.histogram(spark, hist)
      .orderBy("bin").collect().map(_.toSeq.toList).toList
    assert(replayed === before)
    // a LATER batch still folds in additively
    IncrementalCalibration.step(
      preds.filter(col("id") < 40L)
        .select(col("id") + 1000L as "id", col("conf"), col("correct")),
      hist, "conf", col("correct"), binWidth = 100L, batchId = Some(4L))
    val grown = IncrementalCalibration.histogram(spark, hist)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(grown === 440L)
    // idempotent: re-running the same fold bound is a no-op
    assert(IncrementalCalibration.checkpointHistogram(spark, hist, 3L)
      === Seq.empty)
  }

  test("empty histogram renders an empty card, not a failure") {
    val hist = TestSpark.tmpDir("inccal_empty")
    assert(IncrementalCalibration.calibrated(spark, hist).count() === 0L)
  }
}
