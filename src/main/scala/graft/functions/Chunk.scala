package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-document handling: split documents into overlapping token-window
  * chunks — the step between cleaning and sequence packing when documents
  * exceed the model's context window.
  *
  * Scale design (100 TB): per-row generate (sequence + explode) with
  * builtin slice/concat_ws — no lambda HOFs, no shuffle; chunk rows leave
  * the scan stage ready for downstream packing. Chunk-count arithmetic
  * stays in non-negative integer division so the DuckDB oracle reproduces
  * it exactly (negative `div` truncates toward zero in Spark but floors
  * in DuckDB — the greatest(0, ·) guard keeps both engines on the same
  * values).
  */
object Chunk {

  /** One row per (doc, chunk): `chunk_id` (0-based), `chunk_text` (the
    * space-joined token window), `n_chunk_tokens`. Chunk i covers tokens
    * [i·stride, i·stride + chunkSize) with stride = chunkSize - overlap;
    * the last chunk may be shorter. Tokenless docs emit no rows.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = Text.tokens(col(textCol))
    // extra >= 0 before the division: ceil((n - chunkSize)/stride) as
    // floor((extra + stride - 1)/stride) — non-negative ints through one
    // double division, exact (< 2^52) and identical in both engines.
    val n = size(toks)
    val extra = greatest(lit(0), n - chunkSize)
    val nChunks =
      lit(1) + floor((extra + lit(stride - 1)) / lit(stride)).cast("int")
    // `sequence` descends when end < start (n = 0 would yield [0, -1]) —
    // emit an empty chunk list for tokenless docs instead.
    val chunkIds = when(n > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol), toks.as("__toks"), chunkIds.as("__ids"))
      .select(col(idCol), col("__toks"),
        explode(col("__ids")).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("__ct"))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__ct")).as("chunk_text"),
        size(col("__ct")).cast("long").as("n_chunk_tokens"))
  }
}
