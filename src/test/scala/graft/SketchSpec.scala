package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketch
import graft.plans.PolyHash

/** Deterministic oracle-gated sketches: count-min (Aggregator) and
  * HyperLogLog (grouped max). The catalog gates the cross-engine
  * arithmetic; these specs pin the SKETCH guarantees — partitioning
  * independence (merge correctness), the one-sided count-min bound, HLL
  * union-merge = elementwise register max, and the estimator's accuracy
  * on a known-cardinality stream.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  /** Zipf-ish stream with known exact counts. */
  private def stream: Seq[String] =
    (1 to 12).flatMap(i => Seq.fill(1 << (12 - i).min(7))(s"tok$i")) ++
      (1 to 500).map(i => s"tail$i")

  private def tids(xs: Seq[String]) = xs.map(PolyHash.eval)

  test("count-min content is partitioning-independent and row sums equal N") {
    val data = new scala.util.Random(3).shuffle(stream)
    val n = data.size.toLong
    val reference = Sketch
      .cmsTable(tids(data).toDF("tid"), "tid", D, W)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (parts <- Seq(1, 5, 17)) {
      val t = tids(data).toDF("tid").repartition(parts)
      val got = Sketch.cmsTable(t, "tid", D, W)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == reference, s"parts=$parts")
    }
    // every row of the sketch counts every item exactly once
    (0 until D).foreach { i =>
      val rowSum = reference.collect { case ((r, _), c) if r == i => c }.sum
      assert(rowSum == n, s"row $i sums to $rowSum, want $n")
    }
  }

  test("count-min estimates never undercount, and exact-hit probes match") {
    val data = stream
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = data.map(s => (s, PolyHash.eval(s))).toDF("tok", "tid")
    val sketch = Sketch.cmsTable(t.select("tid"), "tid", D, W)
    val probes = t.groupBy($"tok", $"tid").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketch.cmsEstimates(sketch, probes, "tid", D, W)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    est.foreach { case (tok, (ex, e)) =>
      assert(ex == exact(tok))
      assert(e >= ex, s"$tok undercounted: est $e < exact $ex")
    }
    // the heavy head must estimate exactly or near-exactly: error bound is
    // N/w per row, and min-of-4 rows makes a large overshoot on every row
    // simultaneously unlikely — pin a loose factor-2 sanity ceiling.
    val n = data.size.toLong
    est.foreach { case (tok, (ex, e)) =>
      assert(e - ex <= 2L * (n / W + 1),
        s"$tok overcount ${e - ex} above 2N/w sanity bound")
    }
  }

  test("hll registers merge by max: union registers == elementwise max") {
    val (a, b) = stream.splitAt(stream.size / 3)
    def regs(xs: Seq[String]): Map[Long, Long] =
      Sketch.hllRegisters(
          tids(xs).map(t => ("g", t)).toDF("g", "tid"), "tid", Seq("g"))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val ra = regs(a)
    val rb = regs(b)
    val expected = (ra.keySet ++ rb.keySet).map { k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))
    }.toMap
    assert(regs(a ++ b) == expected)
  }

  test("hllMergeRegisters: any split and merge order equals full recompute") {
    def regDf(xs: Seq[String]) =
      Sketch.hllRegisters(
        tids(xs).map(t => ("g", t)).toDF("g", "tid"), "tid", Seq("g"))
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val full = toMap(regDf(stream))
    // 3-way split merged in two different association orders
    val parts = stream.grouped((stream.size + 2) / 3).toSeq
    val m1 = Sketch.hllMergeRegisters(
      Sketch.hllMergeRegisters(regDf(parts(0)), regDf(parts(1)), Seq("g")),
      regDf(parts(2)), Seq("g"))
    val m2 = Sketch.hllMergeRegisters(regDf(parts(0)),
      Sketch.hllMergeRegisters(regDf(parts(2)), regDf(parts(1)), Seq("g")),
      Seq("g"))
    assert(toMap(m1) == full)
    assert(toMap(m2) == full)
  }

  test("hll estimate is deterministic and within documented error") {
    // 4000 distinct items: raw-estimator regime (n >> 2.5 m). HLL standard
    // error is 1.04/sqrt(64) = 13%; pin a 3-sigma 40% band — this seed's
    // actual error is recorded much lower, the band guards regressions.
    val xs = (1 to 4000).map(i => s"item$i")
    val df = tids(xs).map(t => ("g", t)).toDF("g", "tid")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "tid", Seq("g")),
      Seq("g")).collect().head.getDouble(1)
    assert(math.abs(est - 4000.0) / 4000.0 < 0.40,
      s"estimate $est further than 40% from 4000")
    // repartitioning does not change the estimate (grouped max is exact)
    val est2 = Sketch.hllEstimate(
      Sketch.hllRegisters(df.repartition(13), "tid", Seq("g")),
      Seq("g")).collect().head.getDouble(1)
    assert(est == est2)
  }

  /** Driver replica of Sampling.hashOrder. */
  private def mixOf(key: Long): Long = {
    val p = 2147483647L
    val h1 = ((key % p) * 1103515245L + 12345L) % p
    val h2 = (h1 * h1 + h1) % p
    (h2 * 784588716L + 998244353L) % p
  }

  test("kmvPairOps: sketch-regime estimates match a plain-Scala replay") {
    val a = (1L to 400L).map(("a", _))
    val b = (201L to 700L).map(("b", _))
    val df = (a ++ b).toDF("g", "tid")
    val k = 16
    val r = Sketch.kmvPairOps(df, "tid", k, "g").collect()(0)
    // replay: bottom-k per group by (mv, tid), union bottom-k, count both
    def sketch(keys: Seq[Long]) =
      keys.map(t => (mixOf(t), t)).sorted.take(k)
    val sa = sketch(a.map(_._2))
    val sb = sketch(b.map(_._2))
    val uni = (sa ++ sb).distinct.sorted.take(k)
    val kth = uni.last._1
    val inBoth = uni.count(v => sa.contains(v) && sb.contains(v))
    assert(r.getAs[Long]("n_kept") == k.toLong)
    assert(r.getAs[Long]("kth_mv") == kth)
    assert(r.getAs[Long]("est_union") == (k - 1).toLong * 2147483647L / kth)
    assert(r.getAs[Long]("n_inter") == inBoth.toLong)
    // union of 700 distinct keys: the estimate should be in the right
    // decade even at k=16
    val est = r.getAs[Long]("est_union")
    assert(est > 200L && est < 2500L, s"est_union=$est")
  }

  test("kmvPairOps: groups below k turn exact (union, intersection, " +
      "jaccard are the true values)") {
    val a = (1L to 30L).map(("a", _))
    val b = (21L to 60L).map(("b", _))
    val r = Sketch.kmvPairOps((a ++ b).toDF("g", "tid"), "tid", 128, "g")
      .collect()(0)
    assert(r.getAs[Long]("n_kept") == 60L)    // |A u B|
    assert(r.getAs[Long]("est_union") == 60L)
    assert(r.getAs[Long]("n_inter") == 10L)   // |A n B|
    assert(r.getAs[Long]("est_inter") == 10L)
    assert(r.getAs[Long]("jaccard_ppm") == 166667L) // 10/60
  }

  test("amsF2: fixed-seed signed sums, exact F2, signed error") {
    val tids = Seq(1L, 1L, 1L, 2L).toDF("tid")
    val got = graft.functions.Sketch.amsF2(tids, "tid", rows = 2)
      .orderBy(col("sketch_row")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // f = {1: 3, 2: 1} -> exact F2 = 10; signs from the fixed seeds:
    // row 0: s(1) = s(2) = -1 -> Z = -4; row 1: s(1)=+1 s(2)=-1 -> Z = 2
    assert(got.toSeq == Seq(
      (0L, -4L, 16L, 10L, 600000L),
      (1L, 2L, 4L, 10L, -600000L)))
  }

  test("amsF2: mean of row estimates is unbiased-ish on a real stream") {
    val tids = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .select(graft.plans.TextExpressions.polyHash(col("tok")).as("tid"))
    val rows = graft.functions.Sketch.amsF2(tids, "tid", rows = 16)
      .collect()
    val exact = rows.head.getLong(3).toDouble
    val mean = rows.map(_.getLong(2).toDouble).sum / rows.length
    // 16-row tug-of-war on a zipfy stream: mean within 60% of exact
    assert(math.abs(mean - exact) / exact < 0.6,
      s"mean $mean vs exact $exact")
  }
}
