package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

/** Table profiling: null/distinct accounting, type-routed min/max
  * renderings, and the contracts (unknown column, unprofilable type).
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("b"), Some(2.5), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
    (2L, Some("a"), None, Some(Timestamp.valueOf("2024-02-02 00:00:00"))),
    (3L, None, Some(-1.0), None),
    (4L, Some("a"), Some(2.5), Some(Timestamp.valueOf("2024-01-01 00:00:00")))
  ).toDF("id", "s", "x", "ts")

  test("per-column rows, nulls, exact distinct, and min/max routing") {
    val p = Profile.profile(df, Seq("id", "s", "x", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s", "x", "ts"))
    p.values.foreach(r => assert(r.getLong(1) === 4L)) // n_rows
    // id: no nulls, 4 distinct, numeric min/max
    assert(p("id").getLong(2) === 0L)
    assert(p("id").getLong(3) === 4L)
    assert(p("id").getDouble(4) === 1.0 && p("id").getDouble(5) === 4.0)
    assert(p("id").isNullAt(6) && p("id").isNullAt(7))
    // s: one null, 2 distinct, string min/max
    assert(p("s").getLong(2) === 1L)
    assert(p("s").getLong(3) === 2L)
    assert(p("s").isNullAt(4) && p("s").isNullAt(5))
    assert(p("s").getString(6) === "a" && p("s").getString(7) === "b")
    // x: one null, 2 distinct (2.5 dedups), doubles exact
    assert(p("x").getLong(2) === 1L)
    assert(p("x").getLong(3) === 2L)
    assert(p("x").getDouble(4) === -1.0 && p("x").getDouble(5) === 2.5)
    // ts: fixed rendering
    assert(p("ts").getLong(2) === 1L)
    assert(p("ts").getString(6) === "2024-01-01 00:00:00")
    assert(p("ts").getString(7) === "2024-02-02 00:00:00")
  }

  test("contracts: unknown column and unprofilable type are rejected") {
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("nope")) }
    val arr = Seq((1L, Seq(1, 2))).toDF("id", "a")
    intercept[IllegalArgumentException] { Profile.profile(arr, Seq("a")) }
    intercept[IllegalArgumentException] { Profile.profile(df, Seq.empty) }
  }
}
