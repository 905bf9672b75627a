package graft.functions

import org.apache.spark.sql.SparkSession

import graft.ops.Maintenance

/** OPTIMIZE for the persisted serving indexes.
  *
  * Every streaming ingest path here appends per micro-batch into a
  * bucket/cell-partitioned parquet layout ([[VecIndex.streamAppend]],
  * [[VecIndex.streamAppendPq]], [[VecIndex.streamAppendGraph]],
  * [[TextIndex.streamAppend]], [[WinnowIndex.streamScreenAndAdmit]]) —
  * correct
  * and replay-safe, but each batch leaves one more small file in every
  * partition it touched. At serving scale the per-file open/footer cost
  * comes to dominate partition-pruned probes long before data volume
  * does, so a maintained index needs the same compaction story as the
  * medallion tables. These wrappers bind [[Maintenance
  * .compactSmallFilePartitions]] (crash-safe partition-directory swap,
  * per-partition output sizing) to each index's layout — which
  * subdirectories are data, and which column partitions them.
  *
  * Probe results are BYTE-IDENTICAL before and after (compaction
  * rewrites rows, never changes them) and partitions at or under
  * `maxFiles` are never read or rewritten — both asserted in
  * IndexMaintenanceSpec. Run offline like any OPTIMIZE: the swap is
  * atomic per partition, but a probe racing the swap can see a
  * partition transiently missing on non-atomic-rename filesystems.
  *
  * Each call returns, per layout subdirectory, the partition values that
  * were compacted (empty = nothing exceeded `maxFiles`, the idempotent
  * steady state).
  */
object IndexMaintenance {

  private val DefaultTarget = 128L * 1024 * 1024

  /** Compact the IVF index at `path` ([[VecIndex.writeIvfIndex]] layout:
    * `data/` partitioned by `cell`; `centroids/` is a rewritten-whole
    * model table and never fragments). */
  def compactIvf(spark: SparkSession, path: String, maxFiles: Int = 4,
      targetBytes: Long = DefaultTarget): Map[String, Seq[String]] =
    Map("data" -> Maintenance.compactSmallFilePartitions(
      spark, s"$path/data", "cell", maxFiles, targetBytes))

  /** Compact the IVF-PQ index at `path` ([[VecIndex.writeIvfPqIndex]]
    * layout: `codes/` partitioned by `cell`; `codebook/` and
    * `centroids/` are model tables). */
  def compactIvfPq(spark: SparkSession, path: String, maxFiles: Int = 4,
      targetBytes: Long = DefaultTarget): Map[String, Seq[String]] =
    Map("codes" -> Maintenance.compactSmallFilePartitions(
      spark, s"$path/codes", "cell", maxFiles, targetBytes))

  /** Compact the graph (HNSW-style) index at `path`
    * ([[VecIndex.writeGraphIndex]] layout: `adj/` partitioned by
    * `node_bucket`, `vectors/` by `vec_bucket`; `meta/` is one row). */
  def compactGraph(spark: SparkSession, path: String, maxFiles: Int = 4,
      targetBytes: Long = DefaultTarget): Map[String, Seq[String]] =
    Map(
      "adj" -> Maintenance.compactSmallFilePartitions(
        spark, s"$path/adj", "node_bucket", maxFiles, targetBytes),
      "vectors" -> Maintenance.compactSmallFilePartitions(
        spark, s"$path/vectors", "vec_bucket", maxFiles, targetBytes))

  /** Compact the BM25 postings index at `path`
    * ([[TextIndex.writePostingsIndex]] layout: `postings/` and `lens/`
    * partitioned by `bucket`; `meta/` is one row). */
  def compactPostings(spark: SparkSession, path: String, maxFiles: Int = 4,
      targetBytes: Long = DefaultTarget): Map[String, Seq[String]] =
    Map(
      "postings" -> Maintenance.compactSmallFilePartitions(
        spark, s"$path/postings", "bucket", maxFiles, targetBytes),
      "lens" -> Maintenance.compactSmallFilePartitions(
        spark, s"$path/lens", "bucket", maxFiles, targetBytes))

  /** Compact the winnow fingerprint index at `path`
    * ([[WinnowIndex.writeWinnowIndex]] layout: `fingerprints/` and `sizes/`
    * partitioned by `bucket`; `meta/` is one row). */
  def compactWinnow(spark: SparkSession, path: String, maxFiles: Int = 4,
      targetBytes: Long = DefaultTarget): Map[String, Seq[String]] =
    Map(
      "fingerprints" -> Maintenance.compactSmallFilePartitions(
        spark, s"$path/fingerprints", "bucket", maxFiles, targetBytes),
      "sizes" -> Maintenance.compactSmallFilePartitions(
        spark, s"$path/sizes", "bucket", maxFiles, targetBytes))
}
