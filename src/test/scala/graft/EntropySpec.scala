package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Entropy

/** Fixed-point entropy/KL: exact values on power-of-two fixtures, zero
  * and identity laws, positivity/asymmetry on skewed distributions, and
  * tolerance against driver double arithmetic.
  */
class EntropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("uniform power-of-two distribution has exact integer entropy") {
    // 8 tokens x 4 occurrences: H = log2(8) = 3 bits, exact in the
    // fixed-point arithmetic because every log argument is a power of 2
    val text = (0 until 8).flatMap(i => Seq.fill(4)(s"t$i")).mkString(" ")
    val df = Seq(("g", text)).toDF("lang", "text")
    val r = Entropy.unigramEntropy(df, "lang", "text").collect()(0)
    assert(r.getLong(1) == 8L && r.getLong(2) == 32L)
    assert(r.getLong(3) == 32L * 3 * 65536L)
    assert(r.getLong(4) == 3000000L) // exact micro-bits
    assert(r.getDouble(5) == 3.0)
  }

  test("single-token distribution has zero entropy") {
    val df = Seq(("g", "a a a a a")).toDF("lang", "text")
    val r = Entropy.unigramEntropy(df, "lang", "text").collect()(0)
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getDouble(5) == 0.0)
  }

  test("entropy tracks driver double arithmetic on random data") {
    val rnd = new scala.util.Random(9)
    val toks = Seq.fill(5000)(s"w${rnd.nextInt(40)}")
    val df = toks.grouped(100).map(g => ("g", g.mkString(" "))).toSeq
      .toDF("lang", "text")
    val got = Entropy.unigramEntropy(df, "lang", "text")
      .collect()(0).getDouble(5)
    val n = toks.size.toDouble
    val expect = toks.groupBy(identity).values
      .map(g => -g.size / n * (math.log(g.size / n) / math.log(2.0))).sum
    assert(math.abs(got - expect) < 1e-3, s"$got vs $expect")
  }

  test("KL is zero between identical distributions, positive and " +
      "asymmetric between skewed ones") {
    val mk = (a: Int, b: Int) =>
      (Seq.fill(a)("x") ++ Seq.fill(b)("y")).mkString(" ")
    val df = Seq(
      ("p", mk(30, 30)), ("q", mk(30, 30)),   // identical
      ("r", mk(55, 5))).toDF("lang", "text")  // skewed
    val kl = Entropy.unigramKL(df, "lang", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kl(("p", "q")) == 0L && kl(("q", "p")) == 0L)
    assert(kl(("p", "r")) > 0L && kl(("r", "p")) > 0L)
    assert(kl(("p", "r")) != kl(("r", "p")), "KL must be asymmetric")
  }

  test("unigramJS: identical = 0, half-overlap = exactly 1/2 bit") {
    // identical distributions -> every term log2(1) = 0 -> JS exactly 0
    val same = Seq(("p", "x y"), ("q", "x y")).toDF("lang", "text")
    val s = Entropy.unigramJS(same, "lang", "text").collect()(0)
    assert((s.getString(0), s.getString(1)) == (("p", "q")))
    assert(s.getLong(2) == 0L && s.getLong(3) == 0L && s.getLong(4) == 0L)
    // P = {x:1/2, z:1/2}, Q = {y:1/2, z:1/2}: JS = 1/2 bit EXACTLY
    // (the shared token's mixture ratio is 1 -> zero term; each
    // one-sided half contributes its 1-bit log2(2) mass) — and the q16
    // one-sided collapse (c*2^16) is exact, so no truncation anywhere.
    val half = Seq(("p", "x z"), ("q", "y z")).toDF("lang", "text")
    val h = Entropy.unigramJS(half, "lang", "text").collect()(0)
    assert(h.getLong(2) == 65536L && h.getLong(3) == 65536L)
    assert(h.getLong(4) == 500000L)
  }
}
