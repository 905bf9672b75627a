package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model signals: per-document bigram novelty
  * against the whole corpus — the cheap distributional stand-in for
  * perplexity-based quality filtering (docs whose n-grams are mostly
  * corpus-hapax are noise/garble candidates; docs of only ultra-common
  * n-grams are boilerplate candidates).
  *
  * Scale design (100 TB): bigrams are polynomial-hashed to fixed-width
  * long keys at the scan (the HashedShingles generator — no string
  * shuffle keys), corpus counts are one partial-aggregable groupBy, and
  * the count-back join is a long-keyed equi-join followed by a per-doc
  * aggregate. No windows, no driver-side state.
  *
  * Oracle-parity design: every emitted ratio is an exact integer sum
  * divided ONCE at the end (sum-of-doubles is addition-order-dependent
  * and would hash-mismatch across engines; integer sums are order-free).
  */
object LangModel {

  /** Per-document bigram novelty stats:
    * (idCol, n_bigrams, n_hapax, hapax_ratio, avg_bigram_df) where
    * n_bigrams counts bigram OCCURRENCES, n_hapax counts occurrences
    * whose bigram appears exactly once in the whole corpus, and
    * avg_bigram_df is the mean corpus frequency of the doc's bigrams.
    * Documents with fewer than two tokens emit no bigrams and drop out
    * (inner-join semantics — gate them separately with tokenCount).
    */
  def bigramStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs.select(col(idCol),
      graft.plans.TextExpressions.hashedShingles(col(textCol), 2))
    val cb = bg.groupBy(col("tid")).agg(count(lit(1)).as("__cb"))
    bg.join(cb, Seq("tid"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__cb") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("__cb")).as("__sum_df"))
      .select(col(idCol), col("n_bigrams"), col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_bigrams").cast("double"))
          .as("hapax_ratio"),
        (col("__sum_df").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_bigram_df"))
  }
}
