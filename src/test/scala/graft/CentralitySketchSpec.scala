package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Graph, Sketch, Stats}

/** Harmonic centrality, modularity, KMV distinct sketch, and
  * Kruskal–Wallis against plain-Scala references on constructed
  * inputs. */
class CentralitySketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** ppm rounding used engine-side: round-half-away num/den * 1e6. */
  private def ppm(num: BigInt, den: BigInt): Long =
    (num.signum * ((num.abs * 2000000 + den) / (2 * den))).toLong

  test("harmonicCentrality: layered BFS distances on a path + isolate") {
    // path 1-2-3-4-5, isolate 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 9L)
    val m = Graph.harmonicCentrality(edges.toDF("a", "b"),
        "a", "b", verts.toDF("id"), "id", maxHops = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // vertex 1 reaches 2(d1) 3(d2) 4(d3): 1e6 + 5e5 + 333333
    assert(m(1L) === ((3L, 1833333L)))
    // vertex 3 reaches all four others within 2 hops
    assert(m(3L) === ((4L, 3000000L)))
    // vertex 2: 1,3 at d1; 4 at d2; 5 at d3
    assert(m(2L) === ((4L, 2833333L)))
    assert(m(9L) === ((0L, 0L)))
  }

  test("modularity: two cliques with one bridge, per-community exact ppm") {
    // cliques {1,2,3} and {4,5,6}, bridge 3-4: m = 7 edges
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val comm = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L))
    val got = Graph.modularity(edges.toDF("a", "b"), "a", "b",
        comm.toDF("id", "label"), "id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // community 10: e_c=3 (intra-clique edges), d_c = 2+2+3 = 7
    // num = 4*7*3 - 49 = 35; den = 4*49 = 196
    assert(got(10L) === ((3L, 3L, 7L, ppm(35, 196))))
    assert(got(20L) === ((3L, 3L, 7L, ppm(35, 196))))
    // whole-graph Q = 2 * 35/196 = 5/14 ≈ 0.357 — positive structure
    assert(got.values.map(_._4).sum === 2 * ppm(35, 196))
  }

  test("kmvEstimate: exact below k, unbiased-ish above") {
    val small = (0 until 50).map(i => ("g", i.toLong))
    val gotSmall = Sketch.kmvEstimate(small.toDF("grp", "tid"), "tid",
        k = 128, Seq("grp")).collect().head
    assert(gotSmall.getLong(1) === 50L)  // n_kept
    assert(gotSmall.getLong(3) === 50L)  // est = exact below k
    val big = (0 until 5000).map(i => ("g", i * 7L + 3))
    val gotBig = Sketch.kmvEstimate(big.toDF("grp", "tid"), "tid",
        k = 128, Seq("grp")).collect().head
    val est = gotBig.getLong(3)
    assert(gotBig.getLong(1) === 128L)
    assert(est > 3500L && est < 6500L,
      s"KMV estimate $est for 5000 distinct out of ±30% band")
  }

  /** Plain-Scala Kruskal–Wallis replaying the exact ppm staging. */
  private def refKruskal(data: Seq[(String, Long)])
      : (Long, Long, Long, Long, Long) = {
    val n = BigInt(data.size)
    val byVal = data.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = BigInt(0)
    val contrib = scala.collection.mutable.Map[String, BigInt]()
    var t3 = BigInt(0)
    for ((v, rows) <- byVal) {
      val t = BigInt(rows.size)
      t3 += t * t * t - t
      for ((g, grp) <- rows.groupBy(_._1))
        contrib(g) = contrib.getOrElse(g, BigInt(0)) +
          BigInt(grp.size) * (2 * cum + t + 1)
      cum += t
    }
    val sizes = data.groupBy(_._1).map { case (g, r) => g -> BigInt(r.size) }
    val st = contrib.toSeq.map { case (g, s) =>
      BigInt(ppm(s * s, 4 * sizes(g) * n * (n + 1)))
    }.sum
    val hPpm = 12 * st - 3 * (n + 1) * 1000000
    val n3 = n * n * n - n
    val cPpm = ppm(n3 - t3, n3)
    val hAdj = if (cPpm <= 0) -1L else ppm(hPpm, BigInt(cPpm))
    (sizes.size.toLong, n.toLong, hPpm.toLong, cPpm, hAdj)
  }

  test("kruskalWallis: matches the staged reference; separated groups score high") {
    // three groups: two identical, one shifted — with ties everywhere
    val data = Seq.tabulate(30)(i => ("a", (i % 5).toLong)) ++
      Seq.tabulate(30)(i => ("b", (i % 5).toLong)) ++
      Seq.tabulate(30)(i => ("c", (i % 5 + 4).toLong))
    val got = Stats.kruskalWallis(data.toDF("g", "v"), "v", "g")
      .collect().head
    val (k, n, h, c, hAdj) = refKruskal(data)
    assert(got.getLong(0) === k)
    assert(got.getLong(1) === n)
    assert(got.getLong(2) === h)
    assert(got.getLong(3) === c)
    assert(got.getLong(4) === hAdj)
    // the shifted group separates: H' well above the χ²(2) 99th pct ~ 9.2
    assert(got.getLong(4) > 9210000L)
    // identical groups only → H' ~ 0
    val flat = Seq.tabulate(40)(i => (s"g${i % 4}", (i % 7).toLong))
    val gotFlat = Stats.kruskalWallis(flat.toDF("g", "v"), "v", "g")
      .collect().head
    val refFlat = refKruskal(flat)
    assert(gotFlat.getLong(4) === refFlat._5)
  }
}
