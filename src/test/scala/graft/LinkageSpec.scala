package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Linkage
import graft.functions.Linkage.Field

/** Fellegi-Sunter linkage scoring: weight quantization against
  * hand-computed log-likelihood ratios, additive scoring over the
  * agreement vector, the three-way decision bands, and the
  * NULL-counts-as-disagreement convention.
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("milli-bit weights match hand-computed log2 likelihood ratios") {
    val f = Field("x", lit(true), 950, 50)
    // log2(0.95/0.05) = log2(19) = 4.24793; log2(0.05/0.95) = -4.24793
    assert(f.agreeMilli === 4248L)
    assert(f.disagreeMilli === -4248L)
    val g = Field("y", lit(true), 500, 125)
    // log2(4) = 2 exactly; log2(500/875) = -0.80735
    assert(g.agreeMilli === 2000L)
    assert(g.disagreeMilli === -807L)
  }

  test("m <= u is rejected (agreement must be evidence FOR a link)") {
    intercept[IllegalArgumentException] {
      Field("bad", lit(true), 100, 500)
    }
  }

  test("scores add per-field weights and band into decisions") {
    val pairs = Seq(
      (1L, 2L, "a", "a", 10L, 11L), // both agree
      (1L, 3L, "a", "b", 10L, 12L), // src disagrees, len agrees
      (1L, 4L, "a", "b", 10L, 99L)  // both disagree
    ).toDF("id_a", "id_b", "src_a", "src_b", "n_a", "n_b")
    val fields = Seq(
      Field("src", col("src_a") === col("src_b"), 950, 50),
      Field("len", abs(col("n_a") - col("n_b")) <= 5, 900, 100))
    val out = Linkage.score(pairs, fields, upperMilli = 6000L,
        lowerMilli = 0L)
      .select("id_b", "src_agree", "len_agree", "weight_milli", "decision")
      .as[(Long, Boolean, Boolean, Long, String)]
      .collect().sortBy(_._1).toSeq
    val wSrc = 4248L; val wLen = 3170L // log2(9) = 3.16993
    assert(out === Seq(
      (2L, true, true, wSrc + wLen, "link"),
      (3L, false, true, -wSrc + wLen, "non-link"),
      (4L, false, false, -wSrc - wLen, "non-link")))
    // middle band: one strong agree alone lands in [0, 6000) = possible
    val one = Linkage.score(pairs.filter(col("id_b") === 3), fields,
      upperMilli = 8000L, lowerMilli = -2000L)
    assert(one.select("decision").as[String].head() === "possible")
  }

  test("EM recovers planted m/u from a synthetic pattern histogram") {
    // Ground truth: 20% matches, conditional independence, THREE fields —
    // the classic identifiability floor (k = 2 gives 4 pattern cells for
    // 5 free parameters and EM drifts to a different optimum; k = 3 gives
    // 7 cells for exactly 7). Histogram built from exact probabilities x
    // 100000 pairs — no sampling noise, so EM must land near the truth.
    val lambda = 0.2
    val m = Seq(0.9, 0.8, 0.85); val u = Seq(0.1, 0.2, 0.15)
    val patterns = for (a <- Seq(false, true); b <- Seq(false, true);
        c <- Seq(false, true)) yield {
      val pat = Seq(a, b, c)
      val pm = pat.zipWithIndex.map { case (x, i) =>
        if (x) m(i) else 1 - m(i) }.product
      val pu = pat.zipWithIndex.map { case (x, i) =>
        if (x) u(i) else 1 - u(i) }.product
      (pat, math.round((lambda * pm + (1 - lambda) * pu) * 100000))
    }
    val (lamHat, mu) = Linkage.emEstimate(patterns, k = 3,
      lambda0 = 0.5, m0 = 0.7, u0 = 0.3, rounds = 500)
    assert(math.abs(lamHat - lambda) < 0.02, s"lambda $lamHat")
    mu.zip(m.zip(u)).foreach { case ((mHat, uHat), (mTrue, uTrue)) =>
      assert(math.abs(mHat - mTrue) < 0.03, s"m $mHat vs $mTrue")
      assert(math.abs(uHat - uTrue) < 0.03, s"u $uHat vs $uTrue")
    }
  }

  test("histogram -> EM -> re-score composes over a DataFrame") {
    // 60 planted matching pairs (both fields agree) + 940 noise pairs
    // with independent low agreement rates, deterministically generated.
    val rows = (1 to 1000).map { i =>
      val isMatch = i <= 60
      val f1 = if (isMatch) i % 10 != 0 else i % 7 == 0
      val f2 = if (isMatch) i % 12 != 0 else i % 5 == 0
      (i.toLong, 1000L + i, f1, f2)
    }
    import spark.implicits._
    val pairs = rows.toDF("id_a", "id_b", "raw1", "raw2")
    val fields = Seq(
      Linkage.Field("f1", col("raw1"), 900, 100),
      Linkage.Field("f2", col("raw2"), 900, 100))
    val hist = Linkage.agreementHistogram(pairs, fields)
      .collect().map(r => (Seq(r.getBoolean(0), r.getBoolean(1)),
        r.getLong(2))).toSeq
    assert(hist.map(_._2).sum === 1000L)
    val (lamHat, mu) = Linkage.emEstimate(hist, k = 2, rounds = 100)
    // the planted match class is ~6% of pairs with high agreement
    assert(lamHat > 0.02 && lamHat < 0.3, s"lambda $lamHat")
    val refit = Linkage.fieldsFromEm(fields, mu)
    val scored = Linkage.score(pairs, refit,
      upperMilli = refit.map(_.agreeMilli).sum / 2, lowerMilli = 0L)
    // planted matches (agreeing on both) must score at the top band
    val links = scored.filter(col("decision") === "link")
      .select("id_a").as[Long].collect().toSet
    val planted = rows.filter(r => r._3 && r._4).map(_._1).toSet
    assert(links === planted,
      s"links ${links.size} != both-agree ${planted.size}")
  }

  test("fieldsFromEm rejects a field whose EM signal collapsed") {
    val f = Seq(Linkage.Field("x", lit(true), 900, 100))
    intercept[IllegalArgumentException] {
      Linkage.fieldsFromEm(f, Seq((0.4, 0.6)))
    }
  }

  test("NULL agreement counts as disagreement") {
    val pairs = Seq((1L, 2L, Option.empty[String], Option("a")))
      .toDF("id_a", "id_b", "src_a", "src_b")
    val out = Linkage.score(pairs,
      Seq(Field("src", col("src_a") === col("src_b"), 950, 50)),
      upperMilli = 0L, lowerMilli = 0L)
    assert(out.select("src_agree").as[Boolean].head() === false)
    assert(out.select("weight_milli").as[Long].head() === -4248L)
  }
}
