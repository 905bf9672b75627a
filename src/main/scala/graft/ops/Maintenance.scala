package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.merge.Merge

/** Table-maintenance operations for parquet-backed medallion tables.
  *
  * Streaming sinks and frequent small batches leave partitions littered
  * with small files; at scale the file-listing and per-file open cost
  * dominates scans long before data volume does. Compaction rewrites a
  * partition's many small files into few right-sized ones — the stock-
  * parquet analog of Delta OPTIMIZE, built on the same crash-safe
  * partition-directory swap as the MERGE writeback
  * (`Merge.rewritePartitions`).
  */
object Maintenance {

  /** Number of data files currently backing each hive partition of `path`
    * (partition dir name → file count); the signal for choosing what to
    * compact.
    */
  def partitionFileCounts(spark: SparkSession, path: String)
      : Map[String, Int] = {
    val base = new org.apache.hadoop.fs.Path(path.stripSuffix("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map { dir =>
        val n = fs.listStatus(dir.getPath)
          .count(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))
        dir.getPath.getName -> n
      }.toMap
  }

  /** Compact the given partitions (hive `col=value` string values) of the
    * table at `path` so each holds ~`targetBytes` per output file,
    * estimated from the partition's current on-disk size. Untouched
    * partitions' files are never read or rewritten; readers see either
    * the old or the new files of a partition, never a mix of halves.
    */
  def compactPartitions(spark: SparkSession, path: String,
      partitionCol: String, partValues: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    if (partValues.isEmpty) return
    val base = new org.apache.hadoop.fs.Path(path.stripSuffix("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytesByPart = partValues.map { v =>
      val dir = new org.apache.hadoop.fs.Path(base, s"$partitionCol=" +
        org.apache.spark.sql.GraftBridge.escapePartitionValue(v))
      val bytes =
        if (fs.exists(dir)) fs.getContentSummary(dir).getLength else 0L
      v -> bytes
    }.toMap
    Merge.rewritePartitions(spark, path, partitionCol, partValues) { df =>
      // Bucket count is sized PER PARTITION from its own on-disk bytes: a
      // single shared count (e.g. sized for the largest partition) would
      // shatter small partitions into many sub-target files — the
      // opposite of compaction, and non-convergent (they would qualify
      // again on the next run). Rows route to (partition, bucket) via a
      // deterministic whole-row hash: the writer emits one file per
      // (task, hive-partition) pair, and task retries re-derive identical
      // buckets (a rand() key could not guarantee that).
      def filesFor(bytes: Long): Int =
        math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val filesPerCol = bytesByPart.foldLeft(lit(1)) {
        case (acc, (v, bytes)) =>
          when(col(partitionCol).cast("string") === v, lit(filesFor(bytes)))
            .otherwise(acc)
      }
      val totalBuckets = bytesByPart.values.map(filesFor).sum
      val allCols = df.columns.toIndexedSeq.map(col)
      df.withColumn("__bucket", pmod(xxhash64(allCols: _*), filesPerCol))
        .repartition(math.max(totalBuckets, 1),
          col(partitionCol), col("__bucket"))
        .drop("__bucket")
    }
  }

  /** Compact every partition whose file count exceeds `maxFiles`. Returns
    * the partition values that were compacted.
    */
  def compactSmallFilePartitions(spark: SparkSession, path: String,
      partitionCol: String, maxFiles: Int,
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] = {
    val prefix = s"$partitionCol="
    val oversplit = partitionFileCounts(spark, path)
      .collect { case (dir, n) if dir.startsWith(prefix) && n > maxFiles =>
        dir.stripPrefix(prefix)
      }
      // dir names are hive-escaped; recover the runtime values. The NULL
      // partition has no addressable value for an isin filter — skip it.
      .filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
      .map(org.apache.spark.sql.GraftBridge.unescapePartitionValue)
      .toSeq.sorted
    compactPartitions(spark, path, partitionCol, oversplit, targetBytes)
    oversplit
  }

  /** Morton (Z-order) interleave key for two numeric columns, each
    * quantized to `bits` rank buckets over [min, max]. Bit interleaving is
    * a static unrolled sum of shift/mask terms — whole-stage-codegen
    * friendly, no UDF. Values outside [min, max] clamp to the edge
    * buckets; a NULL or NaN in either column yields a NULL key (sorts
    * together).
    */
  def zorderKey(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(aMax > aMin && bMax > bMin, "degenerate [min, max] range")
    val buckets = (1L << bits) - 1
    def quant(c: Column, lo: Double, hi: Double): Column =
      least(lit(buckets), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * buckets)
          .cast("long")))
    val qa = quant(a, aMin, aMax)
    val qb = quant(b, bMin, bMax)
    val key = (0 until bits).map { i =>
      (shiftright(qa, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(qb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)
    // greatest/least SKIP nulls (greatest(0, NULL) = 0), so the quantizer
    // alone would silently map NULL to the origin bucket — propagate
    // explicitly instead, as documented. NaN rides the same path: its
    // quantized value is NaN, whose cast-to-long throws under ANSI mode.
    when(a.isNull || b.isNull ||
        isnan(a.cast("double")) || isnan(b.cast("double")),
      lit(null).cast("long")).otherwise(key)
  }

  /** Z-order layout write: cluster `df` along the Morton curve of
    * (colA, colB) into `numFiles` range-partitioned, internally sorted
    * parquet files. Files then cover compact RECTANGLES of the 2D value
    * space instead of slabs, so parquet min/max row-group stats prune
    * scans filtered on EITHER column (a single-column sort only prunes
    * its own column; at 100 TB this is the difference between reading one
    * file and reading every file for the second predicate). The min/max
    * quantization bounds come from one tiny 4-value aggregate.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // withColumn would silently REPLACE a pre-existing column of the same
    // name and drop would then delete the user's data — refuse instead.
    require(!df.columns.contains("__z"),
      "zorderWrite: input already has a __z column")
    // NaN-safe bounds: Spark's min/max return NaN if any value is NaN
    // (NaN orders above every double), which would poison the quantizer
    // with a misleading 'degenerate range' failure.
    def finite(c: String) = {
      val d = col(c).cast("double")
      when(!isnan(d), d)
    }
    val r = df.agg(
      min(finite(colA)), max(finite(colA)),
      min(finite(colB)), max(finite(colB))).head()
    require(!r.anyNull, s"z-order bounds: $colA/$colB are all-NULL/NaN or empty input")
    // A constant column contributes nothing to clustering; widen its range
    // so every row quantizes to bucket 0 and the layout degrades to
    // single-column clustering on the other axis instead of failing.
    def widen(lo: Double, hi: Double): (Double, Double) =
      if (hi > lo) (lo, hi) else (lo, lo + 1.0)
    val (aLo, aHi) = widen(r.getDouble(0), r.getDouble(1))
    val (bLo, bHi) = widen(r.getDouble(2), r.getDouble(3))
    val key = zorderKey(col(colA), aLo, aHi, col(colB), bLo, bHi, bits)
    df.withColumn("__z", key)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
