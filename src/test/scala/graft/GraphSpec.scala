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
}
