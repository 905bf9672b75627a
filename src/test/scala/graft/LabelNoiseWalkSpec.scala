package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec

/** Label-noise scanning and deterministic graph walks over planted
  * cluster geometry. */
class LabelNoiseWalkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two well-separated direction clusters; point 5 carries the wrong
    * label. */
  private def planted: Seq[(Long, Seq[Float], Int)] = {
    val c1 = (0 until 10).map(i =>
      (i.toLong, Seq(1f, 0.01f * i, 0f, 0f), if (i == 5) 2 else 1))
    val c2 = (0 until 10).map(i =>
      (10L + i, Seq(-0.01f * i, 1f, 0f, 0f), 2))
    c1 ++ c2
  }

  test("labelNoiseScan: the planted mislabel is the suspect") {
    val df = planted.toDF("vec_id", "embedding", "label")
    val got = Vec.labelNoiseScan(df, k = 4, nBits = 2, graphRounds = 2,
      ringWindow = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(5)))).toMap
    assert(got(5L) === ((2L, 1L, true)),
      s"mislabeled point should be flagged: ${got(5L)}")
    // every cluster-1 point except the mislabel agrees with its hood
    for (i <- 0 until 10 if i != 5)
      assert(!got(i.toLong)._3, s"clean point $i wrongly flagged")
    // agreement never exceeds neighborhood size
    val full = Vec.labelNoiseScan(df, k = 4, nBits = 2, graphRounds = 2,
      ringWindow = 4)
    assert(full.filter(col("n_agree") > col("n_nbr")).count() === 0)
  }

  test("graphWalks: valid edges, full length, deterministic") {
    val df = planted.toDF("vec_id", "embedding", "label")
    val starts = df.filter(col("vec_id") < 6)
    def run() = Vec.graphWalks(df, starts, steps = 3, k = 4, nBits = 2,
      graphRounds = 2, ringWindow = 4)
    val walks = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // step 0 is the start; every start walks the full length
    // (every node has an out-list, so no early sink)
    for (s <- 0L until 6L) {
      val w = walks.filter(_._1 == s).sortBy(_._2)
      assert(w.head === ((s, 0L, s)))
      assert(w.length === 4, s"walk from $s truncated: $w")
    }
    // every consecutive pair is a graph out-edge
    val adj = Vec.nnDescent(df, "vec_id", "embedding", k = 4, nBits = 2,
        rounds = 2, ringWindow = 4)
      .select(col("node_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (s <- 0L until 6L) {
      val w = walks.filter(_._1 == s).sortBy(_._2).map(_._3)
      w.sliding(2).foreach { case Array(a, b) =>
        assert(adj.contains((a, b)), s"walk edge ($a,$b) not in graph")
      }
    }
    // determinism: a second run reproduces the corpus exactly
    val again = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(walks.sorted.toSeq === again.sorted.toSeq)
  }
}
