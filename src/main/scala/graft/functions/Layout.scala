package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DATA-LAYOUT PLANNING — the operators that decide HOW bytes land on
  * disk, the lever that makes every later scan cheap at 100 TB:
  * Z-order (Morton) interleaving for multi-dimensional clustering
  * (write with `repartitionByRange(zValue)` and parquet min/max
  * page skipping prunes on BOTH dimensions), and small-file
  * compaction planning (pack partition/file sizes into target-sized
  * output bins — the OPTIMIZE/coalesce planner's core arithmetic).
  *
  * Everything is exact integer arithmetic over builtin bitwise
  * expressions — whole-stage-codegen'd, oracle-replayable, no UDF.
  */
object Layout {

  /** The Morton (Z-order) value of two non-negative dimension keys:
    * bit i of x lands at bit 2i, bit i of y at bit 2i+1, giving the
    * space-filling curve order whose prefixes are quadtree cells —
    * rows close in z are close in BOTH x and y, so range-partitioned
    * writes cluster multi-dimensionally and min/max stats prune
    * either predicate. `bits` is per-dimension width; callers fold
    * their key into [0, 2^bits) first (e.g. `% (1 << bits)`).
    * A chain of 2·bits shift/mask terms — codegen-friendly, exact in
    * any 64-bit engine (bits <= 31 keeps everything in long range).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      val xi = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i)
      val yi = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
      (xi + yi).cast("long")
    }.reduce(_ + _)
  }

  /** The locality audit of a Z-order layout: bucket rows by the top
    * bits of their z-value (bucket = z >> shift — a quadtree cell,
    * exactly the unit a range-partitioned write would colocate) and
    * report each cell's row count and per-dimension min/max envelope.
    * Narrow envelopes on BOTH dimensions are the whole point — they
    * are precisely the parquet column min/max stats a scan with a
    * predicate on EITHER dimension prunes against. Output:
    * (bucket, cnt, min_x, max_x, min_y, max_y), bucket-ordered.
    *
    * Scale shape: scan-stage arithmetic + one partial-aggregable
    * groupBy over the bounded bucket domain.
    */
  def zorderAudit(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, bucketShift: Int = 26): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      s"bucketShift must be in [0, ${2 * bits}), got $bucketShift")
    df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .select(col("__x"), col("__y"),
        shiftright(zValue(col("__x"), col("__y"), bits), bucketShift)
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }

  /** Small-file COMPACTION PLAN — assign input files (or partitions)
    * to `bins` equal-share output bins by start offset in the
    * size-descending concatenation: order by (size DESC, key ASC),
    * bin = floor(start_offset · bins / total) — the deterministic
    * next-fit packing that keeps every bin within one max-file-size
    * of the ideal share (exactly the arithmetic behind shuffle-
    * partition coalescing and OPTIMIZE file binning: big files first
    * so stragglers pad the tail, never split a file). Output one row
    * per non-empty bin: (bin, n_files, bytes), bin-ordered.
    *
    * Scale shape: the file inventory is metadata-sized (one row per
    * file, not per record) — the single-task sort over it is the
    * planner's driver-side arithmetic made declarative; the row scan
    * that produced the sizes is partial-aggregable upstream.
    */
  def compactionPlan(df: DataFrame, keyCol: String, sizeCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__sz").desc, col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val files = df.select(col(keyCol).as("__k"),
      col(sizeCol).cast("long").as("__sz"))
    val tot = files.agg(sum(col("__sz")).as("__tot"))
    files
      .withColumn("__cum", sum(col("__sz")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("__k"), col("__sz"),
        when(col("__tot") <= 0L, lit(0L))
          .otherwise(GroupRank.intDiv(
            (col("__cum") - col("__sz")) * bins, col("__tot")))
          .as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("__sz")).as("bytes"))
  }
}
