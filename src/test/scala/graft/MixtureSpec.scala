package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mixture

/** DoReMi multiplicative-weights reweighting: uniform-loss fixpoint,
  * excess-loss upweighting, loss-monotone ordering, round monotonicity,
  * and the ppm normalization contract.
  */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def weights(losses: Seq[(String, Long)], rounds: Int = 4,
      etaQ: Long = 65536L): Map[String, Long] =
    Mixture.doremiWeights(losses.toDF("domain", "loss_q"), "domain",
        "loss_q", rounds, etaQ)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap

  test("uniform losses are a fixpoint: equal weights, ppm sums to ~1e6") {
    val w = weights(Seq("a" -> 100L, "b" -> 100L, "c" -> 100L, "d" -> 100L))
    assert(w.values.toSet.size == 1)
    assert(math.abs(w.values.sum - 1000000L) <= 4,
      s"ppm sum ${w.values.sum}")
  }

  test("a domain with excess loss is upweighted; ordering follows loss") {
    // losses in bits*2^16: 1, 2, 4 bits
    val w = weights(Seq("lo" -> 65536L, "mid" -> 131072L,
      "hi" -> 262144L))
    assert(w("hi") > w("mid") && w("mid") >= w("lo"),
      w.toString)
    assert(w("hi") > 1000000L / 3, s"hi not upweighted: $w")
  }

  test("more rounds concentrate more weight on the lossy domain") {
    val losses = Seq("a" -> 65536L, "b" -> 327680L)
    val w1 = weights(losses, rounds = 1)
    val w4 = weights(losses, rounds = 4)
    assert(w4("b") > w1("b"), s"r1=$w1 r4=$w4")
  }

  test("eta = 0 leaves the mixture uniform regardless of losses") {
    val w = weights(Seq("a" -> 0L, "b" -> 500000L), etaQ = 0L)
    assert(w("a") == w("b"))
  }
}
