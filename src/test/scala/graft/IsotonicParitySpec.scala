package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Eval

/** The round-12 in-memory greatest-convex-minorant fit must equal the
  * relational form it replaced, value for value — chord predicate,
  * segment extrema, and fixedPointExact's half-up ppm rendering — on
  * bin tables exercising every hull shape: already-monotone, fully
  * pooled, alternating violations, single bin, large counts near the
  * decimal staging's magnitude, and negative bins.
  */
class IsotonicParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def relDf(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("bin", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("n_correct", LongType, nullable = false)))
    spark.createDataFrame(
      rows.map(t => Row(t._1, t._2, t._3)).asJava, schema)
  }

  private def run(rows: Seq[(Long, Long, Long)]): Unit = {
    def key(r: Row) = r.getLong(0)
    val local = Eval.isotonicCalibrate(relDf(rows)).collect().sortBy(key)
    val rel = Eval.isotonicCalibrateRelational(relDf(rows))
      .collect().sortBy(key)
    assert(local.length == rel.length,
      s"${local.length} vs ${rel.length} rows for $rows")
    local.zip(rel).foreach { case (a, b) =>
      (0 until 5).foreach { i =>
        assert(a.getLong(i) == b.getLong(i), s"col $i: $a vs $b ($rows)")
      }
    }
  }

  test("monotone table is its own fit") {
    run(Seq((0L, 10L, 1L), (1L, 10L, 4L), (2L, 10L, 9L)))
  }

  test("decreasing accuracy pools to one segment") {
    run(Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L)))
  }

  test("alternating violations and uneven weights") {
    run(Seq((-2L, 3L, 2L), (0L, 50L, 10L), (1L, 2L, 2L), (3L, 7L, 1L),
      (5L, 40L, 39L), (9L, 1L, 0L)))
  }

  test("single bin") {
    run(Seq((4L, 7L, 3L)))
  }

  test("large counts near the wide-decimal staging") {
    run(Seq((0L, 3000000000L, 1L), (1L, 2999999999L, 2999999999L),
      (2L, 1L, 1L)))
  }

  test("empty table") {
    run(Seq.empty)
  }
}
