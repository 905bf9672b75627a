package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-granular corpus hygiene: the Gopher repetition signals (Rae et
  * al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher", Table A1) and C4-style corpus-wide duplicate-line
  * removal (Raffel et al. 2020, which deduplicates three-sentence spans
  * corpus-wide keeping one occurrence; CCNet — Wenzek et al. 2019 — does
  * the same at paragraph granularity over hashes).
  *
  * The corpus has no natural newlines, so "lines" are the deterministic
  * fixed-width token windows of [[Text.tokenLines]] — the same
  * synthesized-structure idiom as q_pii_redact's dirty column. All
  * dedup/grouping keys are the rolling poly hash ([[Text.charFingerprint]],
  * mod 1e9+7) of the line text: collisions can merge distinct lines, but
  * identically in both engines — the accepted-collision contract every
  * hashed-shingle operator here shares, and at 100 TB grouping 64-bit-ish
  * hashes instead of full line strings is the only sane shuffle payload.
  */
object Lines {

  /** Per-document duplicate-line signals from a lines array, entirely
    * row-local (the whole doc's lines sit in one array cell — no shuffle,
    * scan-stage): line count, duplicate-line count (occurrences beyond
    * each line's first), and the line/char duplicate fractions. Exact
    * integer counts promoted to double only for the final divisions.
    *
    * Returns a struct(n_lines, dup_lines, dup_line_frac, dup_char_frac);
    * zero fractions for line-less docs.
    *
    * This HOF form is the REFERENCE semantics over an arbitrary lines
    * array; for the hot text path use [[lineSignalsText]] — the compiled
    * single-pass expression (the interpreted per-line lambdas here were
    * the catalog scan's worst entry at 10.8 s before it).
    */
  def lineSignals(lines: Column): Column = {
    val n  = size(lines)
    val nd = size(array_distinct(lines))
    val tc = aggregate(lines, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val dc = aggregate(array_distinct(lines), lit(0L),
      (acc, x) => acc + length(x).cast("long"))
    struct(
      n.cast("long").as("n_lines"),
      (n - nd).cast("long").as("dup_lines"),
      when(n > 0, (n - nd).cast("double") / n.cast("double"))
        .otherwise(lit(0.0)).as("dup_line_frac"),
      when(tc > 0, (tc - dc).cast("double") / tc.cast("double"))
        .otherwise(lit(0.0)).as("dup_char_frac"))
  }

  /** Compiled single-pass form of [[lineSignals]] straight from the text
    * column (tokenize → segment → hash-count in one codegen'd scan;
    * `appendFirst` folds the synthesized-dirty re-append into the same
    * pass). Same struct contract as the HOF form — LinesSpec holds the
    * two equal.
    */
  def lineSignalsText(text: Column, lineLen: Int,
      appendFirst: Int = 0): Column = {
    val sig = graft.plans.TextExpressions.lineSignals(text, lineLen,
      appendFirst)
    val n  = element_at(sig, 1)
    val dl = element_at(sig, 2)
    val tc = element_at(sig, 3)
    val dc = element_at(sig, 4)
    struct(
      n.as("n_lines"),
      dl.as("dup_lines"),
      when(n > 0, dl.cast("double") / n.cast("double"))
        .otherwise(lit(0.0)).as("dup_line_frac"),
      when(tc > 0, dc.cast("double") / tc.cast("double"))
        .otherwise(lit(0.0)).as("dup_char_frac"))
  }

  /** Gopher n-gram repetition stats: per document, the character mass of
    * the single most-repeated word 2-gram (`top2_mass` = max over
    * 2-grams with count >= 2 of count x gram length, 0 if none repeats)
    * and the total character mass inside repeated word 3-grams
    * (`dup3_mass` = sum over 3-grams with count >= 2 of count x gram
    * length), each as a fraction of the document's characters.
    *
    * Gopher's prose ("fraction of characters contained in the most
    * frequently-occurring n-gram") leaves the tie and the denominator
    * unspecified; this takes the deterministic reading — max over the
    * count x length products, document char length as denominator — and
    * the oracle mirrors it bit-for-bit.
    *
    * Shape: MAP-ONLY — one codegen'd pass per row hash-counts both gram
    * sizes (the doc's grams are row-local state, bounded by doc length),
    * so the operator runs at parquet-scan speed with zero shuffle. The
    * exploded per-(doc, gram) groupBy chain this replaced cost 5.2 s on
    * the sf0.1 catalog scan; the map-only form is the correct 100 TB
    * shape for any per-doc-bounded statistic.
    */
  def ngramRepetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val mass = graft.plans.TextExpressions.ngramRepMass(col(textCol), 2, 3)
    docs.select(col(idCol),
        coalesce(length(col(textCol)).cast("long"), lit(0L)).as("n_chars"),
        coalesce(element_at(mass, 1), lit(0L)).as("top2_mass"),
        coalesce(element_at(mass, 2), lit(0L)).as("dup3_mass"))
      .withColumn("top2_frac",
        when(col("n_chars") > 0,
          col("top2_mass").cast("double") / col("n_chars").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("dup3_frac",
        when(col("n_chars") > 0,
          col("dup3_mass").cast("double") / col("n_chars").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Corpus-wide keep-first line dedup (C4's span dedup at line
    * granularity): every line whose poly hash already occurred earlier in
    * the corpus — earlier meaning a smaller (document id, line number)
    * pair — is dropped; survivors are re-joined into the cleaned text in
    * original order. Returns (idCol, n_lines, kept_lines, clean_text);
    * a document whose every line occurred before keeps an empty string.
    *
    * Shape: one linear explode -> partial-aggregable min over the
    * first-occurrence key per line hash -> one equi-join (AQE-sized: the
    * repeated-hash table is small for clean corpora, corpus-like for
    * crawl dumps — no broadcast assumption) -> per-doc re-aggregation
    * whose partitions are bounded by document line counts. Nothing is
    * keyed corpus-globally.
    *
    * The first-occurrence key packs (id, line_no) as id * 2^20 + line_no:
    * exact while line counts stay under ~1M lines/doc and ids under 2^43
    * — both far above this corpus and asserted cheap at scan stage by the
    * caller's data contract (documented rather than runtime-checked to
    * keep the key a pure column expression).
    *
    * Shuffle payload is NUMBERS ONLY until the last step: the exploded
    * line stream is hashed at scan stage and the line TEXT never enters
    * a shuffle — first-occurrence is decided by a hash-partitioned
    * window min over (id, line_no, hash, ord) longs (one exchange; no
    * separate first-occurrence table and no join against it), the
    * per-doc re-aggregation folds the line count, the survivor count,
    * and the sorted survivor-position array into ONE groupBy, and the
    * survivors come back as per-doc line_no positions that scan-stage
    * `element_at` lookups over the doc's own lines array turn back into
    * clean text. The old form shuffled line text twice (hash join +
    * collect_list of line strings); this form shuffles corpus text
    * once, in the final doc-keyed join (measured 2.9 → 2.3 s at sf0.1).
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      lineLen: Int): DataFrame = {
    def lineArr = Text.tokenLines(Text.tokens(col(textCol)), lineLen)
    // Hash side rides the compiled fused generator (tokenize → window →
    // poly hash in one scan-stage pass, no line-string rows); the string
    // side below builds lineArr only once, for the reconstruction.
    val lines = docs
      .select(col(idCol),
        graft.plans.TextExpressions.hashedTokenLines(col(textCol), lineLen))
      .withColumn("__ord",
        col(idCol).cast("long") * lit(1048576L) + col("line_no").cast("long"))
      .withColumnRenamed("lh", "__lh")
    val w = Window.partitionBy(col("__lh"))
    // collect_list skips nulls, so when(__kept, line_no) collects
    // exactly the survivors; max(line_no)+1 is the doc's line count
    // (every doc reaching this aggregate has >= 1 line).
    val agg = lines
      .withColumn("__kept", col("__ord") === min(col("__ord")).over(w))
      .groupBy(col(idCol))
      .agg((max(col("line_no")) + 1L).cast("long").as("n_lines"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("kept_lines"),
        sort_array(collect_list(when(col("__kept"), col("line_no"))))
          .as("__keep_nos"))
    docs.select(col(idCol), lineArr.as("__la"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        // generator line_no values ARE array indices, so looking the
        // sorted survivor positions back up in the doc's own lines array
        // reproduces "survivors in line_no order" exactly — O(kept)
        // element_at lookups, not an O(lines·kept) membership filter. A
        // doc with no surviving line has a null __keep_nos → transform
        // is null → coalesce gives the empty string, same as the
        // LEFT-join miss.
        coalesce(
          array_join(transform(col("__keep_nos"),
            j => element_at(col("__la"), (j + 1).cast("int"))), " "),
          lit("")).as("clean_text"))
  }
}
