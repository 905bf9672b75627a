package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Gopher n-gram repetition stats, the grouped complement of the
    * row-local [[lineSignals]]: per document, the character mass of the
    * single most-repeated word 2-gram (`top2_mass` = max over 2-grams
    * with count >= 2 of count x gram length, 0 if none repeats) and the
    * total character mass inside repeated word 3-grams (`dup3_mass` =
    * sum over 3-grams with count >= 2 of count x gram length), each as a
    * fraction of the document's characters.
    *
    * Gopher's prose ("fraction of characters contained in the most
    * frequently-occurring n-gram") leaves the tie and the denominator
    * unspecified; this takes the deterministic reading — max over the
    * count x length products, document char length as denominator — and
    * the oracle mirrors it bit-for-bit.
    *
    * Shape: ONE exploded gram stream (2- and 3-grams union-tagged so they
    * share the shuffle) -> partial-aggregable (doc, n, gram) counts ->
    * per-doc aggregate -> left join back to the doc frame. Linear at any
    * corpus size; per-doc partitions bounded by doc gram counts.
    */
  def ngramRepetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    def gramStream(n: Int) = docs.select(col(idCol),
        lit(n).as("__n"), explode(Text.wordNgrams(toks, n)).as("__gram"))
    val grams = gramStream(2).unionByName(gramStream(3))
    val counts = grams.groupBy(col(idCol), col("__n"), col("__gram"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__mass",
        when(col("__c") >= 2, col("__c") * length(col("__gram")).cast("long"))
          .otherwise(lit(0L)))
    val perDoc = counts.groupBy(col(idCol))
      .agg(max(when(col("__n") === 2, col("__mass")).otherwise(lit(0L)))
             .as("top2_mass"),
           sum(when(col("__n") === 3, col("__mass")).otherwise(lit(0L)))
             .as("dup3_mass"))
    docs.select(col(idCol), length(col(textCol)).cast("long").as("n_chars"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_chars"),
        coalesce(col("top2_mass"), lit(0L)).as("top2_mass"),
        coalesce(col("dup3_mass"), lit(0L)).as("dup3_mass"))
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
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      lineLen: Int): DataFrame = {
    val lines = docs
      .select(col(idCol),
        posexplode(Text.tokenLines(Text.tokens(col(textCol)), lineLen)))
      .withColumnRenamed("pos", "line_no")
      .withColumnRenamed("col", "line")
      .withColumn("__lh", Text.charFingerprint(col("line")))
      .withColumn("__ord",
        col(idCol).cast("long") * lit(1048576L) + col("line_no").cast("long"))
    val first = lines.groupBy(col("__lh"))
      .agg(min(col("__ord")).as("__keep"))
    val kept = lines.join(first, Seq("__lh"))
      .filter(col("__ord") === col("__keep"))
    val keptAgg = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("kept_lines"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_no"), col("line")))),
            x => x("line")),
          " ").as("clean_text"))
    docs.select(col(idCol),
        size(Text.tokenLines(Text.tokens(col(textCol)), lineLen))
          .cast("long").as("n_lines"))
      .join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
