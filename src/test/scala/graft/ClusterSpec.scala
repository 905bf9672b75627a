package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cluster

/** Connected components must agree with a driver-side union-find on
  * arbitrary graphs, including the shapes iterative label propagation gets
  * wrong when buggy: long chains (diameter > default rounds would
  * under-propagate without convergence detection), singletons, multi-edge
  * pairs, and components whose min id sits at the far end of a path.
  */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: plain union-find over the same vertices/edges. */
  private def unionFind(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Min-id canonical labels (find compresses to the min because unions
    // always point the larger root at the smaller one).
    vertices.map(v => v -> find(v)).toMap
  }

  private def sparkComponents(vertices: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 20): Map[Long, Long] = {
    val vdf = vertices.toDF("id")
    val edf = edges.toDF("a", "b")
    Cluster.connectedComponents(edf, "a", "b", vdf, "id", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of length 12: min label crosses the whole diameter") {
    val vs = (0L to 12L)
    val es = (0L until 12L).map(v => (v + 1, v)) // 12->11->...->0
    assert(sparkComponents(vs, es) == vs.map(_ -> 0L).toMap)
  }

  test("two cliques, a bridge, and singletons") {
    val vs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 50L, 99L)
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (3L, 10L), (2L, 1L)) // duplicate edge both directions
    val got = sparkComponents(vs, es)
    val exp = unionFind(vs, es)
    assert(got == exp)
    assert(got(12L) == 1L && got(50L) == 50L && got(99L) == 99L)
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val vs = (0 until n).map(_ => rnd.nextLong().abs % 10000).distinct
      val es = (0 until n).map { _ =>
        (vs(rnd.nextInt(vs.size)), vs(rnd.nextInt(vs.size)))
      }.filter { case (a, b) => a != b }
      assert(sparkComponents(vs, es) == unionFind(vs, es), s"trial $trial")
    }
  }

  test("assignClusters sizes, representative flags, and representatives") {
    val vs = Seq(1L, 2L, 3L, 7L, 8L)
    val es = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val asg = Cluster.assignClusters(es.toDF("a", "b"), "a", "b",
      vs.toDF("id"), "id")
    val rows = asg.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(rows == Set((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (3L, 1L, 3L, false), (7L, 7L, 2L, true), (8L, 7L, 2L, false)))
    val docs = vs.map(v => (v, s"doc$v")).toDF("id", "text")
    val reps = Cluster.representatives(docs, "id", asg)
      .select("id").as[Long].collect().toSet
    assert(reps == Set(1L, 7L))
  }

  test("maxIter below the component diameter throws instead of returning partial labels") {
    // diameter 400: pointer jumping covers ~2^r hops in r rounds, so 3
    // rounds reach ~15 hops — far short; the guard must still throw.
    val vs = (0L to 400L)
    val es = (0L until 400L).map(v => (v + 1, v))
    val ex = intercept[IllegalStateException](sparkComponents(vs, es, maxIter = 3))
    assert(ex.getMessage.contains("did not converge"))
  }

  test("string vertex ids cluster to the lexicographic min") {
    val vs = Seq("carol", "bob", "alice", "zoe")
    val es = Seq(("carol", "bob"), ("bob", "alice"))
    val got = Cluster.connectedComponents(es.toDF("a", "b"), "a", "b",
        vs.toDF("id"), "id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("carol" -> "alice", "bob" -> "alice",
      "alice" -> "alice", "zoe" -> "zoe"))
  }

  test("pointer jumping: a 300-chain converges inside the default cap") {
    // Plain one-hop propagation would need 300 rounds; jumping needs
    // ~log2(300) ≈ 9. The default maxIter=20 must comfortably cover it,
    // and the labels must still be exactly the union-find reference.
    val vs = (0L to 300L)
    val es = (0L until 300L).map(v => (v + 1, v))
    val got = sparkComponents(vs, es) // default maxIter = 20
    assert(got === unionFind(vs, es))
    assert(got.values.toSet === Set(0L))
  }

  test("empty edge list: every vertex is its own singleton") {
    val vs = Seq(5L, 6L)
    val got = sparkComponents(vs, Nil)
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("canonicalByScore keeps exactly the best-scored member per component") {
    // components: {0,1,2} (chain), {5,6}, singleton {9}
    val vs = Seq(0L, 1L, 2L, 5L, 6L, 9L).toDF("id")
    val es = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val assign = Cluster.assignClusters(es, "a", "b", vs, "id")
    val scores = Seq((0L, 10L), (1L, 30L), (2L, 30L),
      (5L, 1L), (6L, 2L), (9L, 7L)).toDF("id", "score")
    val out = Cluster.canonicalByScore(assign, "id", scores, "score")
    // {0,1,2}: max score 30 ties between 1 and 2 -> min id 1 wins;
    // {5,6}: 6 outscores the min-id member; {9}: singleton keeps itself.
    val kept = out.filter(col("keep")).select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L, 9L))
    // exactly one keeper per component, every vertex still labeled
    assert(out.count() === 6L)
    val badComps = out.groupBy("component")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .filter(col("k") =!= 1L).count()
    assert(badComps === 0L)
    // the quality pick differs from is_rep exactly where the best copy
    // is not the min id
    val minIdKept = Cluster.representatives(vs, "id", assign)
      .select("id").as[Long].collect().toSet
    assert(minIdKept === Set(0L, 5L, 9L))
  }

  test("blockedComponents matches the iterative loop on random blocked graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nBlocks = 2 + rnd.nextInt(4)
      // disjoint id ranges per block so blocks partition the vertices
      val verts = (0 until nBlocks).flatMap { blk =>
        val n = 5 + rnd.nextInt(20)
        (0 until n).map(i => (blk.toLong, blk * 1000L + i))
      }
      val byBlock = verts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val edges = verts.flatMap { case (blk, _) =>
        val ids = byBlock(blk)
        if (ids.size < 2 || rnd.nextBoolean()) Nil
        else Seq((blk, ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
      }.filter { case (_, a, b) => a != b }
      val got = Cluster.blockedComponents(edges.toDF("cell", "a", "b"),
          "cell", "a", "b", verts.toDF("cell", "id"), "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = sparkComponents(verts.map(_._2),
        edges.map { case (_, a, b) => (a, b) })
      assert(got == exp, s"trial $trial")
    }
  }

  test("blockedAssignClusters: chains, singletons, sizes inside one block") {
    // one block holding a 5-chain + a pair + a singleton
    val verts = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (1L, 20L), (1L, 21L), (1L, 30L))
    val edges = Seq((1L, 14L, 13L), (1L, 13L, 12L), (1L, 12L, 11L),
      (1L, 11L, 10L), (1L, 20L, 21L))
    val got = Cluster.blockedAssignClusters(edges.toDF("cell", "a", "b"),
        "cell", "a", "b", verts.toDF("cell", "id"), "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      (10L, 10L, 5L, true), (11L, 10L, 5L, false), (12L, 10L, 5L, false),
      (13L, 10L, 5L, false), (14L, 10L, 5L, false),
      (20L, 20L, 2L, true), (21L, 20L, 2L, false), (30L, 30L, 1L, true)))
  }

  test("tiledComponents matches the iterative loop on random cross-tile graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      // vertices scattered over a 1-D line of tiles (tile = id / 10), so
      // random short-range edges mix intra- and cross-tile
      val n = 30 + rnd.nextInt(40)
      val verts = (0L until n.toLong).map(v => (v, v / 10L))
      val edges = (0 until n).flatMap { _ =>
        val a = rnd.nextInt(n).toLong
        val b = math.min(n - 1L, a + rnd.nextInt(15))
        if (a == b) Nil else Seq((a, b, a / 10L, b / 10L))
      }
      val got = Cluster.tiledComponents(
          edges.toDF("a", "b", "ta", "tb"), "a", "b", "ta", "tb",
          verts.toDF("id", "tile"), "id", "tile")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = sparkComponents(verts.map(_._1),
        edges.map { case (a, b, _, _) => (a, b) })
      assert(got == exp, s"trial $trial")
      // the trial must actually exercise tile-crossing edges
      assert(edges.exists { case (_, _, ta, tb) => ta != tb })
    }
  }

  test("tiledComponents: a chain spanning many tiles converges") {
    // 120-vertex chain, tiles of 8 — the percolating-eps-graph shape
    // that exhausts a small maxIter on the raw loop but crosses only
    // 15 tile boundaries after contraction
    val verts = (0L until 120L).map(v => (v, v / 8L))
    val edges = (0L until 119L).map(v => (v + 1, v, (v + 1) / 8L, v / 8L))
    val got = Cluster.tiledComponents(
        edges.toDF("a", "b", "ta", "tb"), "a", "b", "ta", "tb",
        verts.toDF("id", "tile"), "id", "tile", maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 120L).map(_ -> 0L).toMap)
  }

  test("blockedComponents rejects non-integral ids") {
    val ex = intercept[IllegalArgumentException] {
      Cluster.blockedComponents(
        Seq((1L, "a", "b")).toDF("cell", "a", "b"), "cell", "a", "b",
        Seq((1L, "a")).toDF("cell", "id"), "id")
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("dedupWeights: each cluster contributes exactly one doc's mass") {
    // components: {1,2,3} (chain), {4,5}, {6} singleton
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val verts = (1L to 6L).toDF("doc_id")
    val comp = Cluster.assignClusters(edges, "id_a", "id_b", verts,
      "doc_id")
    val toks = Seq((1L, 30L), (2L, 60L), (3L, 90L), (4L, 10L), (5L, 20L),
      (6L, 7L)).toDF("doc_id", "n_tokens")
    val got = Cluster.dedupWeights(comp, toks, "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("csize"), r.getAs[Long]("w_ppm"),
          r.getAs[Long]("eff_tokens_ppm")))).toMap
    assert(got(1L) == ((3L, 333333L, 10000000L)))  // 30/3
    assert(got(2L) == ((3L, 333333L, 20000000L)))
    assert(got(4L) == ((2L, 500000L, 5000000L)))
    assert(got(6L) == ((1L, 1000000L, 7000000L)))
    // cluster {1,2,3}: weight mass 3 * 1/3 = one document
    assert(got.filterKeys(Set(1L, 2L, 3L)).values.map(_._2).sum
      === 999999L) // 3 x 333333 — ppm floor of thirds
  }
}
