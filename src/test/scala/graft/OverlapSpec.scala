package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

/** Source-overlap matrix: Jaccard arithmetic on hand-built vocabularies,
  * full-matrix emission (zero-overlap pairs included), and the srcCap
  * ubiquitous-gram cut.
  */
class OverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shared shingles and Jaccard per source pair, full matrix") {
    // 3-gram shingles. srcA and srcB share exactly the run "x y z w"
    // (two shingles); srcC shares nothing with anyone.
    val docs = Seq(
      (1L, "A", "x y z w p q r"),
      (2L, "B", "x y z w a b c"),
      (3L, "C", "totally different words here now")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs, "source", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // each doc has 5 distinct shingles
    assert(out(("A", "B")) === ((5L, 5L, 2L, 2.0 / 8.0)))
    assert(out(("A", "C")) === ((5L, 3L, 0L, 0.0)))
    assert(out(("B", "C")) === ((5L, 3L, 0L, 0.0)))
  }

  test("minhash overlap estimate: exact at the extremes, calibrated between") {
    // identical sources estimate exactly 1; disjoint sources exactly 0
    val docs = Seq(
      (1L, "A", "p q r s t u v w"), (2L, "B", "p q r s t u v w"),
      (3L, "C", "completely different content in every single gram")
    ).toDF("doc_id", "source", "text")
    val est = Dedup.sourceOverlapMinhash(docs, "source", "text", 3, 32)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(est(("A", "B")) === 1.0)
    assert(est(("A", "C")) === 0.0 && est(("B", "C")) === 0.0)
    // corpus calibration: every pair's error within 4 sigma of the
    // k=64 binomial bound at its exact J (loose, deterministic data)
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val e = Dedup.sourceOverlapMinhash(corpus, "source", "text", 3, 64)
    val x = Dedup.sourceOverlap(corpus, "source", "text", 3)
      .select(col("src_a"), col("src_b"), col("jaccard"))
    val bad = e.join(x, Seq("src_a", "src_b"))
      .filter(abs(col("jaccard_est") - col("jaccard")) >
        lit(4.0) * sqrt(col("jaccard") * (lit(1.0) - col("jaccard")) /
          lit(64.0)) + lit(1.0 / 64.0))
      .count()
    assert(bad === 0L, s"$bad pairs outside the estimator bound")
  }

  test("srcCap drops ubiquitous grams from the pair stage only") {
    // one gram present in ALL three sources; srcCap = 2 cuts it from
    // the shared counts but NOT from the vocabulary sizes.
    val docs = Seq(
      (1L, "A", "u v w"), (2L, "B", "u v w"), (3L, "C", "u v w")
    ).toDF("doc_id", "source", "text")
    val loose = Dedup.sourceOverlap(docs, "source", "text", 3, srcCap = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    assert(loose.values.toSet === Set(1L))
    val strict = Dedup.sourceOverlap(docs, "source", "text", 3, srcCap = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2), r.getLong(4))).toSeq
    assert(strict.forall(_._3 === 0L), strict.toString)
    assert(strict.forall(_._2 === 1L), "vocab sizes must keep the gram")
  }
}
