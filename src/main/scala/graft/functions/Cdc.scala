package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level deduplication over CONTENT-DEFINED boundaries
  * ([[graft.plans.CdcScan]]) — the granularity between exact document
  * dedup (whole-text hash) and line dedup (fixed token windows):
  * landmark chunks survive insertions/deletions around them, so
  * mirrored or lightly-revised SPANS collapse to one chunk identity
  * across documents whose byte hashes (and often whose lines) differ.
  * The storage-dedup workhorse (LBFS, Venti, every backup store)
  * applied to corpus curation.
  */
object Cdc {

  /** Cross-corpus duplicated-chunk table: every content-defined chunk
    * identity occurring at least `minOcc` times, with its length and
    * document spread. Hash collisions merge identities (the engine's
    * standard hashed-key contract); `clen` reports the minimum observed
    * length under a merge.
    * Output: (chash, clen, n_occ, n_docs).
    *
    * Scale: ONE compiled scan-stage pass per document (O(len) rolling
    * hash, no arrays) then one partial-aggregable groupBy on the chunk
    * hash — the same linear shape as exact dedup, at sub-document
    * granularity. countDistinct rides the same aggregate; at petascale
    * swap it for the HLL ladder (over-reports spread, never under).
    */
  def chunkStats(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maskBits: Int, minOcc: Long): DataFrame = {
    require(minOcc >= 1, s"minOcc must be >= 1, got $minOcc")
    docs
      .select(col(idCol),
        graft.plans.CdcColumns.cdcChunks(col(textCol), w, maskBits))
      .groupBy(col("chash"))
      .agg(min(col("clen")).as("clen"),
        count(lit(1)).as("n_occ"),
        countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_occ") >= minOcc)
  }
}
