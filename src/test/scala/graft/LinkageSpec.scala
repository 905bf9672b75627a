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
