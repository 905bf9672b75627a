package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Bucket-blocked range joins: identical results to the naive inequality
  * join, planned as equi-joins (no nested loop / cartesian product).
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def left = Seq((1L, 0.10), (2L, 0.149), (3L, 5.0), (4L, -0.02))
    .toDF("lid", "lx")
  def right = Seq((10L, 0.05), (11L, 0.20), (12L, 4.96), (13L, -0.07))
    .toDF("rid", "rx")

  test("bandJoin matches the naive abs-diff join, including boundary pairs") {
    val naive = left.join(right, abs($"lx" - $"rx") <= 0.05)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = RangeJoin.bandJoin(left, right, "lx", "rx", 0.05)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(banded.contains((1L, 10L))) // exactly-on-band boundary (diff = 0.05)
    assert(banded.contains((4L, 13L))) // negative values
    // each pair appears exactly once (no replication leakage)
    val rows = RangeJoin.bandJoin(left, right, "lx", "rx", 0.05).count()
    assert(rows === banded.size)
  }

  test("bandJoin on real data matches the inequality join") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"value".as("p_val"))
    val sg = ev.filter($"event_type" === "signup")
      .select($"event_id".as("s_id"), $"value".as("s_val"))
    val naive = p.join(sg, abs($"p_val" - $"s_val") <= 0.05)
      .select("p_id", "s_id").collect().map(_.toString).sorted.toSeq
    val banded = RangeJoin.bandJoin(p, sg, "p_val", "s_val", 0.05)
      .select("p_id", "s_id").collect().map(_.toString).sorted.toSeq
    assert(banded === naive)
    assert(banded.nonEmpty)
  }

  test("intervalJoin matches the naive between join across bucket spans") {
    val pts = Seq((1L, 0.5), (2L, 999.9), (3L, 1000.0), (4L, 2500.0))
      .toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 1000.0), (11L, 900.0, 2600.0), (12L, 3000.0, 3001.0))
      .toDF("ivid", "lo", "hi")
    val naive = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.intervalJoin(pts, ivs, "p", "lo", "hi", 1000.0)
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(bucketed.contains((3L, 10L))) // inclusive hi boundary
    val rows = RangeJoin.intervalJoin(pts, ivs, "p", "lo", "hi", 1000.0).count()
    assert(rows === bucketed.size) // exactly-once despite multi-bucket spans
  }

  test("range joins plan as equi-joins, not nested loops") {
    for (df <- Seq(
        RangeJoin.bandJoin(left, right, "lx", "rx", 0.05),
        RangeJoin.intervalJoin(
          Seq((1L, 0.5)).toDF("pid", "p"),
          Seq((10L, 0.0, 1000.0)).toDF("ivid", "lo", "hi"),
          "p", "lo", "hi", 1000.0))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("overlapping column names are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.bandJoin(left, left, "lx", "lx", 0.1)
    }
  }
}
