package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec

/** Density-relative outlier scoring (LOF over the kNN graph) and
  * margin-based bitext mining, both checked against plain-Scala
  * references on planted geometry. */
class OutlierMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two tight 2-D clusters plus one far singleton, padded to 4 dims.
    * Deterministic coordinates (no RNG — grid offsets). */
  private def plantedVecs: Seq[(Long, Seq[Float])] = {
    val cluster1 = (0 until 12).map { i =>
      (i.toLong, Seq(1f + 0.01f * (i % 4), 1f + 0.01f * (i / 4), 0f, 0f))
    }
    val cluster2 = (0 until 12).map { i =>
      (100L + i, Seq(-1f + 0.01f * (i % 4), 1.5f - 0.01f * (i / 4), 0f, 0f))
    }
    val outlier = Seq((999L, Seq(0.3f, -0.9f, 0.1f, 0f)))
    cluster1 ++ cluster2 ++ outlier
  }

  test("lofScores: cluster members sit near 1.0, the singleton far above") {
    val df = plantedVecs.toDF("vec_id", "embedding")
    val lof = Vec.lofScores(df, k = 4, nBits = 2, graphRounds = 2,
      ringWindow = 4).collect().map(r =>
      r.getLong(0) -> r.getLong(3)).toMap
    assert(lof.size === plantedVecs.size)
    // every score is defined and non-negative
    assert(lof.values.forall(_ >= 0L))
    // the far singleton's density is far below every cluster member's:
    // it carries the maximal LOF, clear of the in-cluster band (cluster
    // BOUNDARY points legitimately reach ~2.0 — LOF is relative density,
    // not distance)
    val clusterScores = lof.filter(_._1 != 999L).values
    assert(lof(999L) > clusterScores.max,
      s"outlier lof_e3=${lof(999L)} vs cluster max ${clusterScores.max}")
    assert(lof(999L) > 2500L,
      s"outlier lof_e3=${lof(999L)} should exceed 2.5")
    assert(clusterScores.forall(s => s >= 500L && s <= 2100L),
      s"cluster scores out of band: ${clusterScores.toSeq.sorted}")
  }

  test("lofScores: duplicate-heavy neighborhood is clamped, not infinite") {
    // 6 exact duplicates + 2 nearby: Sr of a duplicate is 0 pre-clamp
    val dups = (0 until 6).map(i => (i.toLong, Seq(1f, 0f, 0f, 0f))) ++
      Seq((10L, Seq(0.9f, 0.1f, 0f, 0f)), (11L, Seq(0.9f, -0.1f, 0f, 0f)))
    val lof = Vec.lofScores(dups.toDF("vec_id", "embedding"), k = 3,
      nBits = 1, graphRounds = 2, ringWindow = 3)
    // no failure, no nulls, all longs — the Sr >= 1 clamp held
    assert(lof.filter(col("lof_e3").isNull).count() === 0)
    assert(lof.count() === 8)
  }

  /** Plain-Scala margin reference replaying the integer contract. */
  private def refMargin(xs: Seq[(Long, Seq[Float])],
      ys: Seq[(Long, Seq[Float])], qIds: Set[Long], k: Int)
      : Map[Long, (Long, Long)] = {
    def cosE6(a: Seq[Float], b: Seq[Float]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      math.round(BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    }
    def topk(q: Seq[Float], side: Seq[(Long, Seq[Float])]) =
      side.map { case (i, v) => (i, cosE6(q, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(k)
    val sumY = scala.collection.mutable.Map[Long, Long]()
    val out = for ((qid, qv) <- xs if qIds(qid)) yield {
      val fwd = topk(qv, ys)
      val sx = fwd.map(_._2).sum
      val best = fwd.map { case (yid, c) =>
        val sy = sumY.getOrElseUpdate(yid,
          topk(ys.find(_._1 == yid).get._2, xs).map(_._2).sum)
        val den = sx + sy
        val m = if (den > 0) math.max(c, 0L) * 2 * k * 1000000L / den
          else Long.MinValue
        (yid, c, m)
      }.minBy { case (yid, _, m) => (-m, yid) }
      qid -> ((best._1, best._3))
    }
    out.toMap
  }

  test("bitextMarginMine: planted near-parallel pair wins with high margin") {
    // X: 8 sources; Y: 8 targets. y0 is (almost) x0 — the planted pair.
    val xs = (0 until 8).map { i =>
      (2L * i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        0.2f * i, 1f))
    }
    val ys = (0 until 8).map { i =>
      if (i == 0) (1L, Seq(xs(0)._2(0) + 0.001f, xs(0)._2(1), 0.0f, 1f))
      else (2L * i + 1, Seq(math.cos(i * 0.7 + 0.4).toFloat,
        math.sin(i * 0.7 + 0.4).toFloat, 0.15f * i, -0.5f))
    }
    val k = 3
    val got = Vec.bitextMarginMine(
        xs.toDF("vec_id", "embedding").filter(col("vec_id") < 4),
        ys.toDF("vec_id", "embedding"),
        xs.toDF("vec_id", "embedding"), k = k, acceptE6 = 1060000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    val ref = refMargin(xs, ys, Set(0L, 2L), k)
    assert(got === ref)
    // the planted pair is mined: x0 -> y(id=1), margin comfortably > 1.06
    assert(got(0L)._1 === 1L)
    assert(got(0L)._2 > 1060000L)
  }
}
