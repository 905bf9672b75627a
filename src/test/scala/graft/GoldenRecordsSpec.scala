package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.GoldenRecords

/** Entity-resolution golden records: twin absorption on the real
  * corpus, survivorship rules, decision-weight structure, and
  * no-false-merge on distinct in-block entities.
  */
class GoldenRecordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val recs =
    GoldenRecords.dirtyCustomers(
      Tables.customer(spark, "/root/testdata/sf0.001"))
      .localCheckpoint(true)

  test("every dirty twin resolves into its clean entity") {
    val n = recs.count()
    val g = GoldenRecords.golden(recs).collect()
    val nClean = Tables.customer(spark, "/root/testdata/sf0.001").count()
    assert(n > nClean, "fixture lost its dirty twins")
    assert(g.length == nClean, s"${g.length} entities vs $nClean clean")
    // twin clusters carry 2 records; everything else 1
    val twins = g.filter(_.getLong(1) == 2L)
    assert(twins.length == (n - nClean),
      s"${twins.length} twin clusters vs ${n - nClean} dirty rows")
    assert(g.forall(r => r.getLong(1) <= 2L))
    // entity ids are clean custkeys (component = min rec_id)
    assert(g.forall(_.getLong(0) < 1000000L))
  }

  test("survivorship: clean base record wins, balance repairs to min") {
    val clean = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").cast("long").as("id"), col("c_name"),
        col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getDecimal(3))).toMap
    val twins = GoldenRecords.golden(recs)
      .filter(col("n_records") === 2L).collect()
    assert(twins.nonEmpty)
    twins.foreach { r =>
      val (name, seg, bal) = clean(r.getLong(0))
      assert(r.getString(2) == name, "base name must be the clean record's")
      assert(r.getString(3) == seg, "truncated segment must not survive")
      assert(r.getLong(4) == bal.multiply(new java.math.BigDecimal(100))
        .longValueExact(), "balance must repair to the clean value (cents)")
    }
  }

  test("weights: name plus any second agreement links; no single does") {
    val f = GoldenRecords.erFields
    val Seq(name, seg, bal) = f.map(x => (x.agreeMilli, x.disagreeMilli))
    val t = GoldenRecords.linkMilli
    // no SINGLE agreement can link (disagreement evidence drags it down)
    assert(name._1 + seg._2 + bal._2 < t)
    assert(seg._1 + name._2 + bal._2 < t)
    assert(bal._1 + name._2 + seg._2 < t)
    // the name plus either corroborating field clears the threshold
    assert(name._1 + seg._1 + bal._2 >= t)
    assert(name._1 + bal._1 + seg._2 >= t)
    // the two weak fields WITHOUT the name stay below it
    assert(seg._1 + bal._1 + name._2 < t)
  }

  test("distinct in-block entities never merge") {
    // two customers sharing nation + name tail but nothing else: the
    // block pairs them, FS must refuse the link
    val rows = Seq(
      (1L, "Customer#000001111", "BUILDING", BigDecimal("10.00"), 7L),
      (2L, "Shopper#0000001111", "MACHINERY", BigDecimal("999.00"), 7L))
      .toDF("rec_id", "name", "segment", "acctbal", "nationkey")
      .withColumn("acctbal", col("acctbal").cast("decimal(18,2)"))
    val g = GoldenRecords.golden(rows).collect()
    assert(g.length == 2, s"false merge: ${g.toSeq}")
  }
}
