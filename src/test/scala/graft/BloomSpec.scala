package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Bloom, Dedup}

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("bitsFor grows with items and shrinks with looser fpp") {
    assert(Bloom.bitsFor(1000, 0.01) > Bloom.bitsFor(100, 0.01))
    assert(Bloom.bitsFor(1000, 0.1) < Bloom.bitsFor(1000, 0.01))
    // ~9.6 bits/item at 1%
    assert(Bloom.bitsFor(1000, 0.01) > 9000 && Bloom.bitsFor(1000, 0.01) < 11000)
    intercept[IllegalArgumentException](Bloom.bitsFor(0, 0.01))
    intercept[IllegalArgumentException](Bloom.bitsFor(10, 1.5))
  }

  test("bitsFor clamps at maxBits (plan-Literal blob stays bounded)") {
    // 10^10 keys at 1% would want ~96 Gbit; the clamp mirrors Spark's own
    // runtime-bloom cap so the serialized Literal stays <= maxBits/8 bytes.
    assert(Bloom.bitsFor(10000000000L, 0.01) == Bloom.DefaultMaxBits)
    assert(Bloom.bitsFor(10000000000L, 0.01, maxBits = 1L << 30) == 1L << 30)
    intercept[IllegalArgumentException](Bloom.bitsFor(10, 0.01, maxBits = 8))
  }

  test("bloom has no false negatives and a sane false-positive rate") {
    val members = spark.range(0, 1000).toDF("v")
    val bloom = Bloom.buildBloom(members, col("v"), 1000, fpp = 0.01).get
    assert(members.filter(Bloom.mightContain(bloom, col("v"))).count() == 1000)
    val absent = spark.range(1000000, 1100000).toDF("v")
    val fp = absent.filter(Bloom.mightContain(bloom, col("v"))).count()
    // 100k absent keys at fpp=0.01 → ~1000 expected; 5x headroom
    assert(fp < 5000, s"false-positive count $fp out of 100000")
  }

  test("buildBloom on empty input returns None") {
    assert(Bloom.buildBloom(spark.range(0).toDF("v"), col("v"), 10).isEmpty)
  }

  test("decontaminateBloom equals the exact path") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 10)
    val evalSet = docs.filter(col("doc_id") < 10)
    for ((n, tol) <- Seq((3, 0L), (4, 1L))) {
      val exact = Dedup.decontaminate(corpus, evalSet, "doc_id", "text", n, tol)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val bloomed = Bloom.decontaminateBloom(
          corpus, evalSet, "doc_id", "text", n, tol)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(bloomed.sameElements(exact), s"n=$n tol=$tol")
      // the check must actually remove something, or it proves nothing
      assert(exact.length < corpus.count(), s"n=$n removed nothing")
    }
  }

  test("empty eval set leaves the corpus untouched") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") >= 10)
    val none = Tables.documents(spark, sf).filter(col("doc_id") < 0)
    assert(Bloom.decontaminateBloom(docs, none, "doc_id", "text", 3).count()
      == docs.count())
  }

  test("verify join carries no forced broadcast on the eval side") {
    // The exact-verify join must let Catalyst/AQE size the eval gram set:
    // a broadcast() hint would pin into driver memory exactly the
    // past-the-broadcast-budget reference sets the bloom path exists for.
    val docs = Tables.documents(spark, sf)
    val analyzed = Bloom.decontaminateBloom(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "doc_id", "text", 3)
      .queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"forced join hints in plan: $hints")
  }

  test("bloom prefilter sits on the corpus side below the aggregation") {
    val docs = Tables.documents(spark, sf)
    val plan = Bloom.decontaminateBloom(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // the membership cut must precede the distinct's exchange: the filter
    // appears DEEPER in the tree than the first Exchange on its path
    val filterIdx = plan.indexOf("might_contain")
    assert(plan.lastIndexOf("Exchange", filterIdx) >= 0,
      "no exchange above the bloom filter — prefilter not below the shuffle\n"
        + plan.take(2000))
  }
}
