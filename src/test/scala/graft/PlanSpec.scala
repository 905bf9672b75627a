package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guards: the physical plans the engine is
  * designed around must not silently degrade (pushdown reaching the scan,
  * dimensions broadcasting, pruned read schemas, fused shingle generation).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("filters are pushed into the parquet scan") {
    val p = plan("q_filter_status")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]"), p)
  }

  test("star-join dimensions broadcast") {
    val p = plan("q_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("column pruning reaches the scan through the shingle generator") {
    val p = plan("q_minhash_sig")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.contains("hashedshingles"), p)
    // partial aggregation before the exchange (map-side combine)
    assert(p.contains("partial_min"), p)
  }

  test("selective join filters push to both fact scans") {
    val p = plan("q_shipping_priority")
    assert(p.contains("GreaterThan(l_shipdate,"), p)
    assert(p.contains("LessThan(o_orderdate,"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("wide projections read only the needed columns") {
    val p = plan("q_token_count")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }
}
