package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec

/** Exact KNN-Shapley against a plain-Scala replay of the staged
  * closed form, plus the efficiency property. */
class KnnShapleySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs: Seq[(Long, Seq[Float], Int)] =
    (0 until 12).map { i =>
      val ang = i * 0.5
      (i.toLong, Seq(math.cos(ang).toFloat, math.sin(ang).toFloat,
        0.1f * i, 1f), if (i % 3 == 0) 1 else 2)
    }

  private def cosE6(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    BigDecimal(dot / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** The staged closed form: rank by (sim desc, id), terms
    * sign·(1e9 div max(j,K)) with base m_N·1e9 div N, suffix sums. */
  private def ref(tests: Seq[Long], k: Int): Map[Long, (Long, Long)] = {
    val all = vecs
    val acc = scala.collection.mutable.Map[Long, Long]()
    val cnt = scala.collection.mutable.Map[Long, Long]()
    for (t <- tests) {
      val (_, tv, tl) = all.find(_._1 == t).get
      val ranked = all.filter(_._1 != t)
        .map { case (i, v, l) => (i, cosE6(tv, v), l) }
        .sortBy { case (i, s, _) => (-s, i) }
      val n = ranked.length
      val m = ranked.map { case (_, _, l) => if (l == tl) 1L else 0L }
      val terms = (0 until n).map { j =>
        if (j == n - 1) (m(j) * 1000000000L) / n
        else (m(j) - m(j + 1)) * (1000000000L / math.max(j + 1, k))
      }
      var suffix = 0L
      val s = new Array[Long](n)
      for (j <- (n - 1) to 0 by -1) { suffix += terms(j); s(j) = suffix }
      for (j <- 0 until n) {
        val id = ranked(j)._1
        acc(id) = acc.getOrElse(id, 0L) + s(j)
        cnt(id) = cnt.getOrElse(id, 0L) + 1L
      }
    }
    acc.keys.map(id => id -> ((acc(id), cnt(id)))).toMap
  }

  test("knnShapley matches the staged reference and is efficient") {
    val df = vecs.toDF("vec_id", "embedding", "label")
    val tests = Seq(0L, 1L)
    val got = Vec.knnShapley(df.filter($"vec_id" < 2), df, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val expected = ref(tests, k = 3)
    assert(got === expected)
    // efficiency (up to the staged integer rounding): for each test,
    // Σ_i s_i = v(all) = (Σ_{j<=K} m_j)/K — check the summed form over
    // both tests within N·1 units of rounding slack
    val totalGot = got.values.map(_._1).sum
    val totalRef = tests.map { t =>
      val (_, tv, tl) = vecs.find(_._1 == t).get
      val ranked = vecs.filter(_._1 != t)
        .map { case (i, v, l) => (i, cosE6(tv, v), l) }
        .sortBy { case (i, s, _) => (-s, i) }
      ranked.take(3).map { case (_, _, l) => if (l == tl) 1L else 0L }
        .sum * 1000000000L / 3
    }.sum
    // each of the ~N staged terms floors away < 1 unit, per test
    assert(math.abs(totalGot - totalRef) <= 2L * vecs.size * tests.size,
      s"efficiency violated: $totalGot vs $totalRef")
  }
}
