package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, Dedup, Graph}

/** Regression pins for the round-11 optimization reworks: each test
  * targets the INTERNAL that changed, not just end-to-end values —
  * the partitioning of the SNM candidate checkpoint (the one-core
  * verify-stage hazard), and hit-equality of the new shared-chain
  * memos (label propagation, BPE training).
  */
class OptimizationR11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "aaa alpha beta gamma"), (2L, "aab alpha beta gamma"),
    (3L, "aac alpha beta delta"), (4L, "aad beta gamma delta"),
    (5L, "aae beta gamma alpha"), (6L, "aaf delta gamma beta"),
    (7L, "aag alpha delta beta"), (8L, "aah gamma alpha beta")
  ).toDF("doc_id", "text")

  test("SNM candidate memo is repartitioned to the session parallelism " +
      "before its checkpoint (AQE's bytes-sized coalescing must not " +
      "serialize the CPU-bound verify consumers onto one core)") {
    val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
      lower(substring(col("text"), 1, 3)), window = 3)
    assert(cand.count() > 0)
    assert(cand.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "the memoized candidate table must carry the session's " +
        "parallelism, not AQE's bytes-coalesced partition count")
  }

  test("labelPropagation memo: the hit returns the same rows as the " +
      "uncached chain, and builds only once for repeated calls") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    val verts = (1L to 8L).toDF("doc_id")
    val uncached = Graph.labelPropagationUncached(edges, "id_a", "id_b",
        verts, "doc_id", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val first = Graph.labelPropagation(edges, "id_a", "id_b", verts,
        "doc_id", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (h0, b0) = graft.functions.PlanMemo.counters
    val second = Graph.labelPropagation(edges, "id_a", "id_b", verts,
        "doc_id", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (h1, b1) = graft.functions.PlanMemo.counters
    assert(first.toSeq == uncached.toSeq)
    assert(second.toSeq == first.toSeq)
    assert(b1 == b0, "the repeated call must not rebuild")
    assert(h1 > h0, "the repeated call must hit the memo")
  }

  test("Bpe.learn memo: the hit returns the same merges/vocabulary as " +
      "the uncached training") {
    val (m0, v0) = Bpe.learnUncached(docs, "text", rounds = 2)
    val (m1, v1) = Bpe.learn(docs, "text", rounds = 2)
    val (m2, v2) = Bpe.learn(docs, "text", rounds = 2)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(m1) == rows(m0) && rows(v1) == rows(v0))
    assert(rows(m2) == rows(m1) && rows(v2) == rows(v1))
  }
}
