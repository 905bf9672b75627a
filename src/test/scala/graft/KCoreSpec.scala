package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Graph}

/** k-core peeling: hand-graph semantics (single and multi-round
  * cascades, empty cores) and the catalog contract that the fixed round
  * count reaches the peel fixed point on the shipped corpus.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    Graph.kCore(edges.toDF("id_a", "id_b"), "id_a", "id_b", k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("triangle with a pendant chain: chain peels, triangle survives") {
    // triangle 1-2-3; chain 3-4-5-6 peels from the far end, one vertex
    // per round — rounds=3 is exactly the cascade depth
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(edges, 2, 3) == Set((1L, 2L), (2L, 2L), (3L, 2L)))
    // one round short: vertex 4 still alive with its induced degree 1
    // NOT in the output filter... the peel is monotone, so rounds=2
    // leaves 4 alive (degree 1 in the survivor graph)
    assert(core(edges, 2, 2) == Set((1L, 2L), (2L, 2L), (3L, 3L), (4L, 1L)))
  }

  test("k above the degeneracy empties the graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(core(edges, 3, 2).isEmpty)
  }

  test("clique minus an edge is still a 2-core but not a 3-core") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(core(edges, 2, 2) ==
      Set((1L, 3L), (2L, 3L), (3L, 2L), (4L, 2L)))
    assert(core(edges, 3, 3).isEmpty) // 3,4 peel, then 1,2 follow
  }

  test("catalog rounds reach the fixed point on the shipped corpus") {
    val pairs = Dedup.ngramJaccardPairs(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      n = 3, minJaccard = 0.2, dfCap = 100000L).localCheckpoint(true)
    val at3 = Graph.kCore(pairs, "id_a", "id_b", k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at4 = Graph.kCore(pairs, "id_a", "id_b", k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at3 == at4, "peel not converged within the catalog's 3 rounds")
  }
}
