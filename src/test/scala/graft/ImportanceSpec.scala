package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Importance

/** DSIR-style importance selection: ranking behavior + exact arithmetic
  * against an independent BigInt model of the quantized ratio pipeline.
  */
class ImportanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Independent model of the scan-stage hash: char-level polynomial hash
  // mod 1e9+7 (TextExpressions' contract), folded into B buckets.
  private def bucketOf(tok: String, b: Int): Long =
    tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L) % b

  private def toks(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  test("target-like docs outrank dissimilar docs") {
    val target = Seq(
      (1L, "physics energy momentum quantum field theory lagrangian"),
      (2L, "quantum entanglement superposition wavefunction collapse")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (10L, "quantum field theory and the lagrangian of momentum"),
      (11L, "cheap pills buy now discount offer limited time deal"),
      (12L, "energy momentum conservation in quantum systems"),
      (13L, "click here subscribe unsubscribe newsletter spam folder")
    ).toDF("doc_id", "text")
    val scores = Importance.importanceScores(raw, target, "doc_id", "text",
        nBuckets = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("score_q")).toMap
    assert(scores.keySet === Set(10L, 11L, 12L, 13L))
    assert(math.min(scores(10L), scores(12L)) >
      math.max(scores(11L), scores(13L)),
      s"physics docs must outrank spam: $scores")
  }

  test("score_q matches an independent BigInt model exactly") {
    val b = 64
    val targetDocs = Seq((1L, "alpha beta gamma alpha"), (2L, "beta delta"))
    val rawDocs = Seq((10L, "alpha beta zeta"), (11L, "omega omega psi"))
    val got = Importance.importanceScores(
        rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
        "doc_id", "text", nBuckets = b)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("score_q")))).toMap

    val tcounts = targetDocs.flatMap(d => toks(d._2)).map(bucketOf(_, b))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rcounts = rawDocs.flatMap(d => toks(d._2)).map(bucketOf(_, b))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nT = tcounts.values.sum; val nR = rcounts.values.sum
    def lrQ(bkt: Long): BigInt =
      (BigInt(tcounts.getOrElse(bkt, 0L) + 1) * BigInt(nR + b) *
        BigInt(1000000L)) /
        (BigInt(rcounts.getOrElse(bkt, 0L) + 1) * BigInt(nT + b))
    for ((id, text) <- rawDocs) {
      val bs = toks(text).map(bucketOf(_, b))
      val expect = (bs.map(lrQ).sum / BigInt(bs.size)).toLong
      assert(got(id) === ((bs.size.toLong, expect)), s"doc $id")
    }
  }

  test("importanceSelect returns a deterministic bounded top-k") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val target = docs.filter($"doc_id" < 10)
    val raw = docs.filter($"doc_id" >= 10)
    val a = Importance.importanceSelect(raw, target, "doc_id", "text", 512, 5)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = Importance.importanceSelect(raw, target, "doc_id", "text", 512, 5)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a === b)
    assert(a.size === 5)
    // scores arrive non-increasing
    val sq = Importance.importanceSelect(raw, target, "doc_id", "text", 512, 25)
      .collect().map(_.getAs[Long]("score_q")).toSeq
    assert(sq === sq.sorted.reverse)
  }

  test("effectiveSampleSize: uniform = n, concentrated ~ 1, zero NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // equal weights: ESS exactly n, ratio exactly 1
    val eq = Seq(5L, 5L, 5L, 5L).toDF("w")
    val e = Importance.effectiveSampleSize(eq, "w").collect()(0)
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
      == ((4L, 20L, 4L, 1000000L)))
    // one row owns the mass: ESS collapses toward 1
    val hot = Seq(1000L, 1L, 1L, 1L).toDF("w")
    val h = Importance.effectiveSampleSize(hot, "w").collect()(0)
    assert(h.getLong(2) == 1L) // floor((1003)^2 / 1000003) = 1
    assert(h.getLong(3) < 300000L)
    // all-zero weights carry no sample at all
    val z = Seq(0L, 0L).toDF("w")
    val zr = Importance.effectiveSampleSize(z, "w").collect()(0)
    assert(zr.isNullAt(2) && zr.isNullAt(3))
  }
}
