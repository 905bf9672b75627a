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

  /** Chunk-level DECONTAMINATION: corpus documents sharing at least one
    * content-defined chunk (of at least `minLen` chars — short chunks
    * carry no copying signal) with the eval set. The substring-grain
    * member of the decontamination ladder: n-gram overlap
    * (Dedup.decontaminate) fires on any phrase reuse, embedding
    * distance on paraphrase — chunk identity fires exactly on VERBATIM
    * spans long enough to be a leak, at the cost CDC already paid.
    * Output: (idCol, n_shared_chunks) for contaminated documents.
    *
    * Scale: both sides are the compiled O(len) chunk scan; the eval
    * chunk set is eval-sized (broadcast — the decontaminate contract);
    * corpus side is one scan + partial-aggregable groupBy. Linear.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, w: Int, maskBits: Int, minLen: Long): DataFrame = {
    def chunksOf(df: DataFrame) = df
      .select(col(idCol),
        graft.plans.CdcColumns.cdcChunks(col(textCol), w, maskBits))
      .filter(col("clen") >= minLen)
    val evalChunks = chunksOf(evalSet).select(col("chash")).distinct()
    chunksOf(corpus).select(col(idCol), col("chash")).distinct()
      .join(broadcast(evalChunks), Seq("chash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_chunks"))
  }

  /** One-row corpus DEDUP-SAVINGS card over content-defined chunks —
    * what a chunk store would save on this corpus: total chunk
    * occurrences and chars vs unique chunk identities and chars, and
    * the savings ratio in ppm (1 − unique/total). The capacity-planning
    * readout of [[chunkStats]]; same linear scan + groupBy, then one
    * aggregate over the chunk-identity table.
    * Output: (n_chunks, n_unique, total_chars, unique_chars,
    * savings_ppm).
    */
  def dedupSavings(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maskBits: Int): DataFrame =
    chunkStats(docs, idCol, textCol, w, maskBits, minOcc = 1L)
      .agg(sum(col("n_occ")).as("n_chunks"),
        count(lit(1)).as("n_unique"),
        sum(col("clen") * col("n_occ")).as("total_chars"),
        sum(col("clen")).as("unique_chars"))
      .select(col("n_chunks"), col("n_unique"), col("total_chars"),
        col("unique_chars"),
        graft.functions.Stats.fixedPointExact(
          col("total_chars") - col("unique_chars"), col("total_chars"))
          .as("savings_ppm"))
}
