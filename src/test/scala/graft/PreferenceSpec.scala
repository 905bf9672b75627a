package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Preference

/** Bradley-Terry MM fitting: order recovery on a dominance chain,
  * symmetric fixpoint, the zero-win floor, ppm normalization, and
  * partitioning determinism.
  */
class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fit(pairs: Seq[(Long, Long)], rounds: Int = 8) =
    Preference.bradleyTerry(pairs.toDF("winner", "loser"), "winner",
        "loser", rounds)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("a dominance chain recovers the order; strengths strictly ranked") {
    // 1 beats 2 (3x), 2 beats 3 (3x), 1 beats 3 once, plus one upset
    val pairs = Seq.fill(3)((1L, 2L)) ++ Seq.fill(3)((2L, 3L)) ++
      Seq((1L, 3L), (3L, 2L))
    val w = fit(pairs)
    assert(w(1L)._2 > w(2L)._2 && w(2L)._2 > w(3L)._2, w.toString)
    assert(w(1L)._1 == 4L && w(2L)._1 == 3L && w(3L)._1 == 1L)
    // ppm shares sum to ~1e6
    assert(math.abs(w.values.map(_._3).sum - 1000000L) <= 3)
  }

  test("a perfectly symmetric rivalry stays at equal strength") {
    val w = fit(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 1L)))
    assert(w(1L)._2 == w(2L)._2, w.toString)
  }

  test("an item with zero wins floors at strength 1, never crashes") {
    val w = fit(Seq((1L, 2L), (1L, 2L), (3L, 2L)))
    assert(w(2L)._1 == 0L && w(2L)._2 >= 1L)
    assert(w(1L)._2 > w(2L)._2 && w(3L)._2 > w(2L)._2)
  }

  /** The fixed-point MM replayed in plain BigInt arithmetic — every
    * truncating division and floor in the contract, none of the plan
    * structure. Positive operands make BigInt / identical to SQL div. */
  private def refFit(pairs: Seq[(Long, Long)],
      rounds: Int): Map[Long, (Long, Long, Long)] = {
    val Q = BigInt(1099511627776L)
    val edges = pairs.groupBy(identity).toSeq
      .map { case ((a, b), v) => (a, b, v.size.toLong) }
    val items = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val wins = edges.groupBy(_._1).map { case (a, es) =>
      a -> es.map(_._3).sum }
    val n = items.size.toLong
    var w = items.map(i => i -> (1L << 20)).toMap
    for (_ <- 1 to rounds) {
      val d = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for ((a, b, ne) <- edges) {
        val t = (BigInt(ne) * Q) / (BigInt(w(a)) + BigInt(w(b)))
        d(a) += t
        d(b) += t
      }
      val updated = items.map { i =>
        i -> ((BigInt(wins.getOrElse(i, 0L)) * Q) / d(i))
          .max(BigInt(1)).toLong
      }.toMap
      val sw = updated.values.map(BigInt(_)).sum
      w = updated.map { case (i, wq) =>
        i -> ((BigInt(wq) * n * 1048576L) / sw).max(BigInt(1)).toLong }
    }
    val sw = w.values.map(BigInt(_)).sum
    items.map(i => i -> ((wins.getOrElse(i, 0L), w(i),
      ((BigInt(w(i)) * 1000000L) / sw).toLong))).toMap
  }

  test("random tournaments match the BigInt reference bit for bit") {
    for (seed <- Seq(7, 1234)) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(200) {
        val a = rnd.nextInt(30).toLong
        val b = (a + 1 + rnd.nextInt(29)) % 30
        if (rnd.nextBoolean()) (a, b) else (b, a)
      }
      assert(fit(pairs, rounds = 4) == refFit(pairs, rounds = 4),
        s"seed $seed diverged from the reference")
    }
  }

  test("result is identical under different input partitioning") {
    val pairs = (0L until 60L).map(i => (i % 7, (i + 1) % 7))
    val df1 = pairs.toDF("winner", "loser")
    val df2 = df1.repartition(13)
    val a = Preference.bradleyTerry(df1, "winner", "loser", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = Preference.bradleyTerry(df2, "winner", "loser", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
