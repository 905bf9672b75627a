package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Layout

/** Data-layout planning: Morton interleave bit arithmetic, z-bucket
  * locality envelopes, compaction bin packing.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: hand-computed interleaves and monotone quadrants") {
    // x=0b11, y=0b01 -> z = x0<<0 + y0<<1 + x1<<2 + y1<<3 = 1+2+4 = 7
    val df = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L))
      .toDF("x", "y")
    val got = df.select(Layout.zValue(col("x"), col("y"), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 0L, 1L, 2L, 3L))
    // quadrant ordering: the top interleaved bits ARE the quadrant id,
    // so all of quadrant (0,0) sorts before any of quadrant (1,1)
    val q00max = Layout.zValue(lit(7L), lit(7L), 4)
    val q11min = Layout.zValue(lit(8L), lit(8L), 4)
    val r = spark.range(1).select(q00max.as("a"), q11min.as("b"))
      .collect()(0)
    assert(r.getLong(0) < r.getLong(1))
  }

  test("zorderAudit: buckets are quadtree cells with tight envelopes") {
    // full 8x8 grid, 2 bits per bucket axis (shift 4 of 6 z bits)
    // -> 4 buckets, each a 4x4 quadrant: envelope width exactly 3
    val grid = (0 until 8).flatMap(x => (0 until 8).map(y => (x.toLong,
      y.toLong))).toDF("x", "y")
    val rows = Layout.zorderAudit(grid, "x", "y", bits = 3,
        bucketShift = 4)
      .orderBy(col("bucket")).collect()
    assert(rows.length == 4)
    for (r <- rows) {
      assert(r.getLong(1) == 16L)
      assert(r.getLong(3) - r.getLong(2) == 3L) // max_x - min_x
      assert(r.getLong(5) - r.getLong(4) == 3L) // max_y - min_y
    }
  }

  test("compactionPlan: size-desc next-fit packing, exact byte totals") {
    // sizes 60,30,20,10 into 2 bins of share 60: starts 0,60,90,110
    // -> bins 0,1,1,1
    val files = Seq(("a", 60L), ("b", 30L), ("c", 20L), ("d", 10L))
      .toDF("k", "sz")
    val got = Layout.compactionPlan(files, "k", "sz", bins = 2)
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 60L), (1L, 3L, 60L)))
    // ties broken by key: equal sizes pack deterministically
    val ties = Seq(("b", 10L), ("a", 10L)).toDF("k", "sz")
    val t = Layout.compactionPlan(ties, "k", "sz", bins = 2)
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t.toSeq == Seq((0L, 1L, 10L), (1L, 1L, 10L)))
    // zero-byte inventory: everything lands in bin 0, no div-by-zero
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("k", "sz")
    assert(Layout.compactionPlan(zero, "k", "sz", bins = 3)
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
  }
}
