package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Eval, LangModel}

/** Fairness audits (exposure parity, equalized odds) and word2phrase
  * collocation mining against hand-computed references. */
class FairnessPhraseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ppm(num: Long, den: Long): Long =
    (math.signum(num) * ((math.abs(num) * 2000000L + den) / (2 * den)))

  test("exposureParity: shares, gaps, and the unranked-group row") {
    // 10 docs: 5 of group A, 3 of B, 2 of C; ranking holds A,A,B,A
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), (5L, "A"),
      (6L, "B"), (7L, "B"), (8L, "B"), (9L, "C"), (10L, "C"))
    val ranked = Seq((1L, 1L), (2L, 2L), (6L, 3L), (3L, 4L))
    val got = Eval.exposureParity(ranked.toDF("id", "rank"), "id", "rank",
        docs.toDF("id", "grp"), "grp")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // exposures: r1=1e6, r2=5e5, r3=333333, r4=25e4; total = 2083333
    val te = 1000000L + 500000L + 333333L + 250000L
    val aExp = 1000000L + 500000L + 250000L
    assert(got("A") === ((3L, aExp, ppm(aExp, te), ppm(5, 10),
      ppm(aExp, te) - ppm(5, 10))))
    assert(got("B") === ((1L, 333333L, ppm(333333, te), ppm(3, 10),
      ppm(333333, te) - ppm(3, 10))))
    // C never ranked: zero exposure share, real corpus share, negative gap
    assert(got("C") === ((0L, 0L, 0L, ppm(2, 10), -ppm(2, 10))))
  }

  test("equalizedOdds: per-group rates and max-min gaps, NULL-safe") {
    // group X: 3 pos (2 predicted pos), 2 neg (1 predicted pos)
    // group Y: 2 pos (2 predicted pos), 3 neg (0 predicted pos)
    // group Z: only negatives (TPR undefined -> NULL, out of the gap)
    val truth = Seq((1L, "p", "X"), (2L, "p", "X"), (3L, "p", "X"),
      (4L, "n", "X"), (5L, "n", "X"),
      (6L, "p", "Y"), (7L, "p", "Y"), (8L, "n", "Y"), (9L, "n", "Y"),
      (10L, "n", "Y"), (11L, "n", "Z"), (12L, "n", "Z"))
    val pred = Seq((1L, "p"), (2L, "p"), (3L, "n"), (4L, "p"), (5L, "n"),
      (6L, "p"), (7L, "p"), (8L, "n"), (9L, "n"), (10L, "n"),
      (11L, "n"), (12L, "p"))
    val got = Eval.equalizedOdds(pred.toDF("id", "pr"), "id", "pr",
        truth.toDF("id", "y", "grp"), "y", "grp", "p")
      .collect().map { r => r.getString(0) -> r }.toMap
    val x = got("X"); val y = got("Y"); val z = got("Z")
    assert((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)) ===
      ((2L, 1L, 1L, 1L)))
    assert(x.getLong(5) === ppm(2, 3))   // TPR_X
    assert(x.getLong(6) === ppm(1, 2))   // FPR_X
    assert(y.getLong(5) === 1000000L)    // TPR_Y = 1
    assert(y.getLong(6) === 0L)          // FPR_Y = 0
    assert(z.isNullAt(5))                // no positives in Z
    assert(z.getLong(6) === ppm(1, 2))   // FPR_Z = 1/2
    // gaps over non-null rates only: TPR gap = 1 - 2/3; FPR gap = 1/2 - 0
    assert(x.getLong(7) === 1000000L - ppm(2, 3))
    assert(x.getLong(8) === ppm(1, 2))
    assert(x.getLong(7) === y.getLong(7) && x.getLong(8) === z.getLong(8))
  }

  test("phraseMine: planted collocation wins; score matches the formula") {
    // "new york" appears 6 times adjacent; fillers keep N up and the
    // unigrams unconcentrated
    val docs = Seq(
      "new york a b c d", "new york e f g h", "new york i j k l",
      "new york m n o p", "new york q r s t", "new york u v w x",
      "a e i m q u", "b f j n r v", "c g k o s w", "d h l p t x")
    val got = LangModel.phraseMine(docs.toDF("text"), "text",
      delta = 2L, minCount = 3L, topK = 10).collect()
    val top = got.head
    assert((top.getString(0), top.getString(1)) === (("new", "york")))
    // N = 60 tokens, c_new = c_york = 6, c_ab = 6:
    // score = (6-2)*60*1e6 / 36
    assert(top.getLong(3) === (4L * 60L * 1000000L) / 36L)
    // scores are non-increasing down the list
    val scores = got.map(_.getLong(3)).toSeq
    assert(scores === scores.sortBy(-_))
  }
}
