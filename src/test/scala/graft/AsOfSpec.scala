package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

/** As-of join semantics: inclusive match, latest-at-or-before, NULL when
  * unmatched, value columns from the same matched row.
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left row") {
    val trades = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 50L, 5.0))
      .toDF("sym", "t", "px")
    val quotes = Seq((1L, 90L, 1.0), (1L, 150L, 2.0), (1L, 200L, 3.0), (2L, 60L, 9.0))
      .toDF("sym", "t", "bid")
    val out = AsOf.asofJoin(trades, quotes, "sym", "t", "t", Seq("bid"))
      .collect()
      .map(r => (r.getAs[Long]("sym"), r.getAs[Long]("t")) ->
        (Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_bid")).map(_.toDouble)))
      .toMap
    assert(out((1L, 100L)) === (Some(90L), Some(1.0)))   // strictly before
    assert(out((1L, 200L)) === (Some(200L), Some(3.0)))  // inclusive equal-ts
    assert(out((2L, 50L)) === (None, None))              // no earlier quote
  }

  test("asofJoin: NULL keys never match each other (SQL equality semantics)") {
    import spark.implicits._
    val left = Seq((Option(1L), 12L), (Option.empty[Long], 12L))
      .toDF("k", "ts")
    val right = Seq((Option(1L), 10L, 5.0), (Option.empty[Long], 10L, 99.0))
      .toDF("k", "ts", "bid")
    val out = graft.ops.AsOf.asofJoin(left, right, "k", "ts", "ts", Seq("bid"))
      .select($"k", $"asof_bid").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(Some(1L)) === Some(5.0))
    assert(out(None) === None) // NULL key gets NO match, not the NULL-key right row
  }

  test("asofJoin matches DuckDB ASOF semantics on the events table") {
    val got = SparkEntry.queries("q_asof_join")(spark, "/root/testdata/sf0.001")
    assert(got.count() > 0)
    // every matched signup precedes-or-equals its purchase
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsTs(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val bad = got.join(ev, "event_id")
      .filter(col("signup_us").isNotNull && col("signup_us") > col("us"))
    assert(bad.count() === 0)
  }
}
