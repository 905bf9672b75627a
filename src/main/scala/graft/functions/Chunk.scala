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

  /** TextTiling-style semantic boundary scores (Hearst 1997,
    * Computational Linguistics 23(1)): the lexical-cohesion signal under
    * SEMANTIC chunking — split where the topic shifts, not at a fixed
    * token count. Documents are cut into consecutive `blockTokens`-token
    * blocks; boundary b scores the cosine of the integer term-count
    * vectors of blocks b and b+1 (low score = vocabulary shift), and a
    * boundary is a VALLEY when strictly below both neighbors — Hearst's
    * depth-minimum, the cut candidates a RAG chunker feeds to
    * [[chunkByTokens]]-style splitting.
    *
    * Determinism: dots and squared norms are integer sums (order-free);
    * the score is round(dot/(sqrt(na²)·sqrt(nb²)), 6) of exact integers
    * — bit-identical in any IEEE engine; the valley test's lag/lead NULL
    * edges coalesce to false identically.
    *
    * Scale shape: one partial-aggregable (doc, block, term) count over
    * the exploded token stream, one adjacent-block equi-join keyed
    * (doc, block, term), integer aggregates, and one per-doc window over
    * block-count-sized partitions — nothing corpus-keyed beyond token
    * counting; no pairwise-block stage (only adjacent pairs exist).
    *
    * Output: (idCol, boundary 0-based, score, is_valley), one row per
    * interior block boundary; docs under two blocks emit nothing.
    */
  def textTileBoundaries(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 20): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    val toks = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "term")))
    val counts = toks
      .select(col(idCol),
        floor(col("pos") / lit(blockTokens)).cast("long").as("blk"),
        col("term"))
      .groupBy(col(idCol), col("blk"), col("term"))
      .agg(count(lit(1)).as("c"))
    val a = counts.select(col(idCol), col("blk"), col("term"),
      col("c").as("ca"))
    val bs = counts.select(col(idCol), (col("blk") - 1).as("blk"),
      col("term"), col("c").as("cb"))
    val dots = a.join(bs, Seq(idCol, "blk", "term"))
      .groupBy(col(idCol), col("blk"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    val norms = counts.groupBy(col(idCol), col("blk"))
      .agg(sum(col("c") * col("c")).as("n2"))
    val na = norms.select(col(idCol), col("blk"), col("n2").as("na2"))
    val nb = norms.select(col(idCol), (col("blk") - 1).as("blk"),
      col("n2").as("nb2"))
    val bounds = na.join(nb, Seq(idCol, "blk"))
      .join(dots, Seq(idCol, "blk"), "left_outer")
      .select(col(idCol), col("blk").as("boundary"),
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("na2").cast("double")) *
           sqrt(col("nb2").cast("double"))), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("boundary"))
    bounds.withColumn("is_valley",
      coalesce(lag(col("score"), 1).over(w) > col("score"), lit(false)) &&
        coalesce(lead(col("score"), 1).over(w) > col("score"), lit(false)))
  }
}
