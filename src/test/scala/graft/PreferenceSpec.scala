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
