package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term ranking over a document corpus — the classic relevance /
  * keyword-extraction primitive (top terms per doc feed tagging, topic
  * sampling, and quality heuristics in training-data pipelines).
  *
  * Scale design (100 TB): term frequencies and document frequencies are
  * two partial-aggregable groupBys over the exploded token stream (map-side
  * combine does the heavy lifting; no distinct-before-aggregate shuffle).
  * The corpus size joins in as a broadcast 1-row aggregate — never a
  * driver-side count stitched into a literal. The per-doc top-k window
  * shuffles on doc id once; its partitions are doc-sized, not corpus-sized.
  *
  * Scoring uses the RAW tf·N/df ratio instead of a logarithmic idf: ranking
  * is order-equivalent per document (log is monotone), and exact-integer
  * double division is bit-reproducible across engines while libm log is
  * not (the repo's oracle-parity rule: no transcendentals).
  */
object Tfidf {

  /** Top-`k` terms per document by tf·N/df, ties broken lexicographically.
    * Output: (idCol, term, tf, df, tfidf, term_rank).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, term) pairs, so df is a count over them.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("__n_docs")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(nDocs)
      .withColumn("tfidf",
        (col("tf") * col("__n_docs")).cast("double") / col("df").cast("double"))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"),
        col("term_rank"))
  }
}
