package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range joins re-expressed as bucket-blocked equi-joins.
  *
  * Spark plans a raw inequality join (`abs(l - r) <= band`, `p BETWEEN lo
  * AND hi`) as a broadcast nested loop or cartesian product — quadratic
  * work and a non-starter on two large inputs. Both operators here block
  * candidates into fixed-width buckets so the join is a plain equi-join
  * (shuffle-hash / sort-merge, AQE-eligible), then exact-verify inside the
  * join condition. Linear in input + true output size; one shuffle per
  * side, keyed by the bucket — the same decomposition engines with native
  * range-join support (e.g. interval trees / Databricks' range-join hint)
  * perform under the hood.
  *
  * Both inputs must have disjoint column names (rename before joining);
  * the output carries every column of both sides.
  */
object RangeJoin {

  private def requireDisjoint(left: DataFrame, right: DataFrame): Unit = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"RangeJoin inputs must have disjoint column names; shared: " +
        shared.mkString(", "))
  }

  /** All (l, r) pairs with |l.xLeft - r.xRight| <= band (inclusive).
    *
    * The left side is replicated to its value's bucket and the ±2
    * neighborhood (5×); the right side keeps its single bucket. In exact
    * arithmetic a qualifying pair's buckets differ by at most one, but the
    * fp-computed `x / band` on each side can each cross an integer
    * boundary by one ulp AND the fp `abs(l-r) <= band` predicate admits a
    * true difference one ulp past the band — together a computed bucket
    * gap of 2 — so the replication covers ±2. Each pair still meets on
    * exactly one tag (the right bucket occurs once in the left row's
    * 5-tag window) — found once, no post-dedup. The exact `abs <= band`
    * predicate sits INSIDE the join condition, so only surviving pairs
    * are emitted from the join.
    */
  def bandJoin(left: DataFrame, right: DataFrame, xLeft: String,
      xRight: String, band: Double): DataFrame = {
    require(band > 0, "band must be positive")
    requireDisjoint(left, right)
    // 5× replication via a generator (not a join): stays inside the scan
    // stage, no broadcast, no extra plan nodes.
    val l = left
      .withColumn("__bl", floor(col(xLeft) / band))
      .withColumn("__boff", explode(array(
        lit(-2L), lit(-1L), lit(0L), lit(1L), lit(2L))))
      .withColumn("__bucket", col("__bl") + col("__boff"))
    val r = right.withColumn("__bucket", floor(col(xRight) / band))
    l.join(r, l("__bucket") === r("__bucket") &&
        abs(col(xLeft) - col(xRight)) <= band)
      .drop("__bl", "__boff", "__bucket")
  }

  /** All (point, interval) pairs with lo <= point <= hi (inclusive).
    *
    * Intervals are replicated across every bucket they cover
    * (`sequence(floor(lo/w), floor(hi/w))` — (span/w)+1 rows per interval),
    * points carry their single bucket; the equi-join on the bucket meets
    * each qualifying pair exactly once because the point's bucket lies in
    * the interval's covered range exactly once. Choose `bucketWidth` near
    * the typical interval span: replication factor is span/width + 1,
    * while a too-wide bucket admits more false candidates.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireDisjoint(points, intervals)
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pt = points
      .withColumn("__bucket", floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(iv, pt("__bucket") === iv("__bucket") &&
        col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bucket")
  }
}
