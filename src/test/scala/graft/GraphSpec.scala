package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Graph

/** TextRank: the fixed-point PageRank must reproduce hand-computed exact
  * ranks, conserve (floor-drifted) total mass, rank hubs first, and plan
  * its joins as equi-joins — never a cartesian over the edge list.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val RScale = 1000000000000L

  test("path graph a-b-c matches hand-computed fixed-point ranks") {
    // Edges: a<->b, b<->c, all weight 1. out: a=1, b=2, c=1. n=3.
    val docs = Seq("a b", "b c").toDF("text")
    val out = Graph.textRank(docs, "text", 1, 3)
      .select("token", "rank_q").as[(String, Long)].collect().toMap
    val r0 = RScale / 3                       // 333333333333
    val base = (3 * RScale) / (3 * 20)        //  50000000000
    val inA = (r0 * 1) / 2                    // half of b's mass
    val inB = (r0 * 1) / 1 + (r0 * 1) / 1     // all of a's and c's
    assert(out("a") == base + (17 * inA) / 20)
    assert(out("b") == base + (17 * inB) / 20)
    assert(out("c") == out("a")) // positional symmetry
  }

  test("rank mass is conserved up to floor drift, hub ranks first") {
    val docs = Seq("hub a", "hub b", "hub c", "hub d", "a b").toDF("text")
    val ranks = Graph.textRank(docs, "text", 3, 100)
      .select("token", "rank_q").as[(String, Long)].collect()
    val total = ranks.map(_._2).sum
    // Each of <=3 rounds floors once per edge + once per node: the drift
    // stays tiny relative to the 10^12 scale.
    assert(total <= RScale && total > RScale - 1000L * ranks.length)
    assert(ranks.maxBy(_._2)._1 == "hub")
  }

  test("edge weights aggregate repeated co-occurrence, no self-loops") {
    val docs = Seq("x y x", "x x").toDF("text")
    val edges = Graph.cooccurrenceEdges(docs, "text")
      .as[(String, String, Long)].collect().toSet
    // "x y" and "y x" from doc 1 give w=2 each way; "x x" pairs dropped.
    assert(edges == Set(("x", "y", 2L), ("y", "x", 2L)))
  }

  test("iteration joins are equi-joins: no cartesian product in the plan") {
    val docs = Seq("a b", "b c").toDF("text")
    val plan = Graph.textRank(docs, "text", 2, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("label propagation: bridged cliques stay two communities; components merge them") {
    // two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10
    val vs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val lpa = Graph.labelPropagation(es, "a", "b", vs, "id", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within each triangle labels converge to the min member; the
    // bridge cannot outvote two in-clique neighbors, so the right
    // clique keeps its own label instead of adopting 1
    assert(Set(lpa(1L), lpa(2L), lpa(3L)).size === 1)
    assert(Set(lpa(10L), lpa(11L), lpa(12L)).size === 1)
    assert(lpa(1L) !== lpa(10L), lpa.toString)
    assert(lpa(99L) === 99L) // isolated keeps its own label
    // contrast: CC merges everything reachable
    val cc = graft.functions.Cluster.connectedComponents(es, "a", "b",
        vs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(12L) === 1L)
  }

  test("triangle counts: K4 + pendant + hub star, hand-computed") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, 3 through each vertex;
    // pendant 5 attached to 1: zero; star hub 20-{21,22,23}: zero
    // (no closing edges) — the hub case the degree orientation bounds.
    val vs = (Seq(1L, 2L, 3L, 4L, 5L, 20L, 21L, 22L, 23L)).toDF("id")
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (20L, 21L), (20L, 22L), (20L, 23L))
      .toDF("a", "b")
    val got = Graph.triangleCounts(es, "a", "b", vs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 20L -> 0L, 21L -> 0L, 22L -> 0L, 23L -> 0L))
  }

  test("triangle counts are orientation-proof: duplicate/reversed edges collapse") {
    val vs = Seq(1L, 2L, 3L).toDF("id")
    // triangle given with duplicates and both orientations
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("a", "b")
    val got = Graph.triangleCounts(es, "a", "b", vs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("common neighbors: non-adjacent pairs only, hub centers cut, exact counts") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2 neighbors
    // and are non-adjacent; adjacent pairs are excluded by the anti-join
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = Graph.commonNeighbors(es, "a", "b", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 3L, 2L), (2L, 4L, 2L)))
    // degCap 1 drops every center in the square (all degree 2) -> empty
    assert(Graph.commonNeighbors(es, "a", "b", minCommon = 1L,
      degCap = 1L).isEmpty)
  }

  test("adamic-adar: exact fixed-point discounts, rare neighbor " +
      "outweighs hub, adjacency excluded") {
    // 1 and 4 share neighbors 2 (degree grows with hub fan-out) and 3
    val hub = (10L to 15L).map(k => (2L, k))
    val es = (Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)) ++ hub)
      .toDF("a", "b")
    val got = Graph.adamicAdar(es, "a", "b", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // deg(2) = 2 neighbors of {1,4} + 6 hub spokes = 8; deg(3) = 2
    val w = (d: Long) => 4294967296L / graft.plans.FixLog.log2q(d)
    assert(got((1L, 4L)) == ((2L, w(8) + w(2))), got.toString)
    // the degree-2 shared neighbor contributes ~3x the degree-8 hub
    // (1/1 vs 1/3 in log2 — up to one integer-floor ulp)
    assert(w(2) >= 3L * w(8) && w(2) <= 3L * w(8) + 3L)
    // adjacent pairs are prediction non-targets
    assert(!got.contains((1L, 2L)) && !got.contains((3L, 4L)))
  }

  test("label propagation round 1 matches the hand-computed sync update") {
    // path 1-2-3: round 1 sync majority (min tie-break):
    // 1 sees {2} -> 2; 2 sees {1,3} tie -> 1; 3 sees {2} -> 2
    val vs = Seq(1L, 2L, 3L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.labelPropagation(es, "a", "b", vs, "id", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("personalized PageRank: rank measures proximity to the seeds") {
    import org.apache.spark.sql.functions.col
    // path 1-2-3-4-5, isolated 9; seed {1}
    val vs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    // 12 rounds ≈ stationarity: the synchronous iteration OSCILLATES at
    // few rounds (the seed pushes 85% of its mass out each step — after
    // 3 rounds vertex 2 outranks the seed), so distance-monotone decay
    // is a CONVERGED property, asserted here at depth 12
    val r = Graph.personalizedPageRank(es, "a", "b", vs, "id", seeds, 12)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L) &&
      r(4L) > r(5L) && r(5L) > 0L, r.toString)
    assert(r(9L) === 0L)
    // seeded teleport differs from global PageRank: re-seeding on 5
    // mirrors the ranking from the other end
    val r5 = Graph.personalizedPageRank(es, "a", "b", vs, "id",
        Seq(5L).toDF("id"), 12)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r5(5L) > r5(4L) && r5(4L) > r5(3L))
    assert(r5(1L) === r(5L), "path symmetry under mirrored seeds")
  }

  test("personalized PageRank: an isolated SEED keeps its base mass") {
    import org.apache.spark.sql.functions.col
    val vs = Seq(1L, 2L, 3L).toDF("id")
    val es = Seq((2L, 3L)).toDF("a", "b")
    val r = Graph.personalizedPageRank(es, "a", "b", vs, "id",
        Seq(1L).toDF("id"), 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // base = (3/20)·10^12 with no incoming mass, rounds idempotent
    assert(r(1L) === 150000000000L, r.toString)
    assert(r(2L) === 0L && r(3L) === 0L)
  }

  test("hits: ubiquitous tokens are top authorities, determinism holds") {
    // t0 appears in every doc -> max authority (1e6 after normalize);
    // t9 appears only in one tiny doc -> strictly lower
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta"),
      (4L, "alpha rare")).toDF("doc_id", "text")
    val got = Graph.hitsAuthorities(docs, "doc_id", "text", iters = 2,
        k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head._1 == "alpha" && got.head._2 == 1000000L)
    val m = got.toMap
    assert(m("beta") > m("rare"), s"$m")
    assert(m("rare") < 1000000L)
    // partition-deterministic
    val again = Graph.hitsAuthorities(docs.repartition(5), "doc_id",
        "text", iters = 2, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(again.toSeq == got.toSeq)
  }

  test("clusteringCoef: triangle = 1, path center = 0, leaves NULL") {
    val verts = (1L to 4L).toDF("id")
    // triangle 1-2-3 plus pendant 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.clusteringCoef(edges, "a", "b", verts, "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // nodes 1,2: deg 2, one triangle -> cc = 2*1/(2*1) = 1 exactly
    assert(got(1L) == ((2L, 1L, Some(1000000L))))
    assert(got(2L) == ((2L, 1L, Some(1000000L))))
    // node 3: deg 3, one triangle -> cc = 2/(3*2) = 1/3
    assert(got(3L) == ((3L, 1L, Some(333333L))))
    // node 4: deg 1 -> coefficient undefined -> NULL
    assert(got(4L) == ((1L, 0L, None)))
    // duplicate/reversed edges collapse before counting
    val noisy = edges.unionAll(Seq((2L, 1L), (3L, 2L)).toDF("a", "b"))
    val again = Graph.clusteringCoef(noisy, "a", "b", verts, "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(again == got)
  }

  test("global pageRank: hand-computed star-graph ranks after 1 round") {
    // star a-{b,c}: r0 = 1e12 // 3 everywhere
    //   r1(a) = 3e12 // 60 + (17 * (2 * 333333333333)) // 20
    //   r1(b) = r1(c) = 3e12 // 60 + (17 * (333333333333 // 2)) // 20
    val es = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val vs = Seq(1L, 2L, 3L).toDF("id")
    val got = Graph.pageRank(es, "a", "b", vs, "id", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 50000000000L + (17L * 666666666666L) / 20L)
    assert(got(2L) == 50000000000L + (17L * (333333333333L / 2L)) / 20L)
    assert(got(2L) == got(3L))
    // the hub out-ranks the leaves — centrality, not seed proximity
    assert(got(1L) > got(2L))
  }

  test("degreeAssortativity: star = -1 exactly, path = -1/2, " +
      "regular graph NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val rs = Graph.degreeAssortativity(star).collect()(0)
    assert(rs.getAs[Long]("n_edges") == 3L)
    assert(rs.getAs[Long]("r_ppm") == -1000000L)
    // path 1-2-3-4: degrees 1,2,2,1 -> r = -1/2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(Graph.degreeAssortativity(path).collect()(0)
      .getAs[Long]("r_ppm") == -500000L)
    // a cycle is 2-regular: zero degree variance -> NULL
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val rc = Graph.degreeAssortativity(cycle).collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("r_ppm")))
  }

  test("conductance: exact cut/volume ratios; isolated community NULL") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 30L)).toDF("doc_id", "label")
    val m = graft.functions.Graph.conductance(edges, "id_a", "id_b",
        labels, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4))))).toMap
    // degrees 1,2,2,2,1; vol(10)=5 vol(20)=3; one crossing edge (3-4)
    assert(m(10L) == ((3L, 5L, 1L, Some(333333L))))
    assert(m(20L) == ((2L, 3L, 1L, Some(333333L))))
    // node 6 has no edges: zero volume -> NULL conductance
    assert(m(30L) == ((1L, 0L, 0L, None)))
  }
}
