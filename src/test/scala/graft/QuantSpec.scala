package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Quant

class QuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round-trip error is bounded by half a quantization step") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bad = emb
      .select(col("vec_id"), col("embedding"),
        Quant.quantizeInt8(col("embedding")).as("qs"))
      .select(col("vec_id"), col("qs.scale").as("scale"),
        array_max(Quant.reconstructionError(col("embedding"), col("qs")))
          .as("max_err"))
      // half a step, plus ulp headroom for the double round-trip
      .filter(col("max_err") > col("scale") / 2.0 + 1e-12)
    assert(bad.count() == 0, bad.collect().take(3).mkString(", "))
  }

  test("codes stay in int8 range and params are finite") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val stats = emb
      .select(Quant.quantizeInt8(col("embedding")).as("qs"))
      .select(array_min(col("qs.q")).as("qmin"), array_max(col("qs.q")).as("qmax"),
        col("qs.scale").as("scale"))
      .agg(min(col("qmin")).as("lo"), max(col("qmax")).as("hi"),
        min(col("scale")).as("smin"))
      .head()
    assert(stats.getByte(0) >= -128 && stats.getByte(1) <= 127)
    assert(stats.getDouble(2) > 0.0) // real embeddings are never constant
  }

  test("constant and extreme vectors quantize deterministically") {
    val v = Seq(
      (1L, Array(2.5f, 2.5f, 2.5f)),          // scale = 0
      (2L, Array(-1.0f, 0.0f, 1.0f)),          // symmetric range
      (3L, Array(0.0f, 255.0f))                // exact step = 1
    ).toDF("vec_id", "embedding")
    val out = v.select(col("vec_id"),
        Quant.quantizeInt8(col("embedding")).as("qs"),
        Quant.dequantizeInt8(Quant.quantizeInt8(col("embedding"))).as("recon"))
      .orderBy("vec_id").collect()
    val q1 = out(0).getStruct(1).getSeq[Byte](0)
    assert(q1 == Seq(-128, -128, -128))
    assert(out(0).getSeq[Double](2) == Seq(2.5, 2.5, 2.5)) // exact recon
    val q3 = out(2).getStruct(1).getSeq[Byte](0)
    assert(q3 == Seq(-128, 127))
    assert(out(2).getSeq[Double](2) == Seq(0.0, 255.0))
  }

  test("quantized-scan shortlist + exact rerank recovers exact IVF top-5") {
    import graft.functions.Vec
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Vec.ivfTopK(emb, queries, k = 5, nProbe = 3, cellCol = "label")
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recon = emb.select(col("vec_id"), col("label"),
      Quant.dequantizeInt8(Quant.quantizeInt8(col("embedding")))
        .cast("array<float>").as("embedding"))
    val shortlisted = Vec.ivfTopK(recon, queries, k = 10, nProbe = 3,
        cellCol = "label")
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 2k-deep quantized shortlist must contain (nearly) every exact
    // top-k hit — the property that makes rerank-on-exact sound
    val recall = (exact intersect shortlisted).size.toDouble / exact.size
    assert(recall >= 0.9, s"shortlist recall $recall")
  }

  test("pqCodes: full coverage, in-range codes, distortion shrinks with k") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    def codes(k: Int) =
      Quant.pqCodes(emb, m = 4, subDim = 16, k = k, iters = 2)
    val c8 = codes(8).cache()
    assert(c8.count() == n * 4) // one row per (vector, subspace)
    assert(c8.filter(col("code") < 0 || col("code") >= 8).count() == 0)
    assert(c8.filter(col("dist2") < 0).count() == 0)
    val d8 = c8.agg(sum("dist2")).head().getDouble(0)
    val d2 = codes(2).agg(sum("dist2")).head().getDouble(0)
    assert(d8 < d2, s"8-codeword distortion $d8 not below 2-codeword $d2")
    c8.unpersist()
  }

  test("pqReconstruct rebuilds full-width vectors; ADC shortlist has recall") {
    import graft.functions.Vec
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (codes, codebook) = Quant.pqModel(emb, m = 4, subDim = 16,
      k = 8, iters = 2)
    val recon = Quant.pqReconstruct(codes, codebook)
    assert(recon.count() == emb.count())
    assert(recon.select(size(col("embedding"))).distinct().head().getInt(0) == 64)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Vec.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(m: Int, k: Int, depth: Int): Double = {
      val (cs, cb) = Quant.pqModel(emb, m, 64 / m, k, iters = 2)
      val short = Vec.bruteForceTopK(queries, Quant.pqReconstruct(cs, cb), depth)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect short).size.toDouble / exact.size
    }
    // These synthetic near-uniform embeddings are PQ's adversarial case
    // (no cluster structure to exploit), so the bar is the tunability
    // property, not a high absolute: recall must IMPROVE with a finer
    // codebook + deeper shortlist, from a non-degenerate floor.
    // Measured here: 0.28 (m=4,k=8,d=10) -> 0.60 (m=8,k=32,d=20).
    val coarse = recallOf(4, 8, 10)
    val fine = recallOf(8, 32, 20)
    assert(coarse >= 0.2, s"coarse ADC recall degenerate: $coarse")
    assert(fine >= coarse + 0.1, s"finer codebook did not help: $coarse -> $fine")
    assert(fine >= 0.5, s"fine ADC recall $fine")
  }

  test("quantized cosine tracks exact cosine (rerank stays sound)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 50)
    val rec = emb.select(col("vec_id"),
      col("embedding"),
      Quant.dequantizeInt8(Quant.quantizeInt8(col("embedding"))).as("recon"))
    val drift = rec.as("a").join(rec.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(abs(
        graft.functions.Vec.cosine(col("a.embedding"), col("b.embedding"), -1) -
        graft.functions.Vec.cosine(col("a.recon"), col("b.recon"), -1)).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(drift < 0.02, s"quantized cosine drift $drift")
  }

  test("binarize packs sign bits little-endian per 32-dim word") {
    import spark.implicits._
    // 34 dims: word 0 = bits 0..31, word 1 = remainder (2 dims).
    // Set dims 0, 2, 33 non-negative, everything else negative.
    val v = Array.tabulate(34)(i =>
      if (i == 0 || i == 2 || i == 33) 1.0f else -1.0f)
    val out = Seq(Tuple1(v.toSeq)).toDF("embedding")
      .select(Quant.binarize(col("embedding")).as("bits"))
      .as[Seq[Long]].head()
    assert(out === Seq((1L | 4L), 2L)) // bits 0,2 in word 0; bit 1 in word 1
    // zero counts as non-negative (the documented sign rule)
    val z = Seq(Tuple1(Seq(0.0f, -0.0f))).toDF("embedding")
      .select(Quant.binarize(col("embedding")).as("bits"))
      .as[Seq[Long]].head()
    assert(z === Seq(3L)) // -0.0f >= 0 is true in IEEE comparison
  }

  test("hammingDist equals the naive per-dimension disagreement count") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 40).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        Quant.binarize(col("embedding")).as("bits"))
    val got = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Quant.hammingDist(col("a.bits"), col("b.bits")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val signs = rows.map { case (id, v) => id -> v.map(_ >= 0.0f) }.toMap
    for (((a, b), h) <- got) {
      val expect = signs(a).zip(signs(b)).count { case (x, y) => x != y }
      assert(h === expect.toLong, s"pair ($a,$b)")
    }
  }

  test("hamming shortlist recalls the exact cosine top neighbors") {
    // On the real corpus (500 vectors): a 64-bit sign sketch is COARSE —
    // measured ranks of the exact top-1 inside the Hamming order are
    // {2,2,3,3,6,10,14,26,55,215}: 8/10 land in the top-30 (6% of the
    // corpus) and one near-orthogonal pair (cos 0.33, hamming 32 = the
    // random expectation) escapes entirely. The honest contract is
    // high-probability shortlist recall, not certainty — rerank depth
    // buys recall; certainty needs more bits (int8/PQ rungs).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val packed = emb.select(col("vec_id"),
      col("embedding"), Quant.binarize(col("embedding")).as("bits"))
    val q = packed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bits").as("qbits"))
    val joined = q.crossJoin(packed)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Quant.hammingDist(col("qbits"), col("bits")).as("h"),
        graft.functions.Vec.cosine(col("qv"), col("embedding"), -1).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val byH = Window.partitionBy(col("query_id"))
      .orderBy(col("h").asc, col("vec_id").asc)
    val byC = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val ranked = joined
      .withColumn("hr", row_number().over(byH))
      .withColumn("cr", row_number().over(byC))
    val hrs = ranked.filter(col("cr") === 1)
      .select(col("hr")).collect().map(_.getInt(0)).sorted.toSeq
    assert(hrs.count(_ <= 30) >= 7, s"top-1 Hamming ranks $hrs")
    assert(hrs.head <= 5, s"best-case rank must be near-exact: $hrs")
  }
}
