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

  /** Hashing-trick featurizer (Weinberger et al. 2009): each token maps
    * to dimension polyHash(tok) mod `dims` with a ±1 sign from the next
    * hash bit, summed per (doc, dim) — the fixed-width, vocabulary-free
    * vectorization that makes linear models trainable on an unbounded
    * token stream (no dictionary build, no OOV path, the sign bit keeps
    * collisions unbiased in expectation). Exact-zero dims (sign
    * cancellation) are dropped like any sparse encoding.
    * Output: (idCol, dim, val).
    *
    * Scale: explode + one partial-aggregable groupBy — the same shape
    * as term counting; dims bounds the per-doc state, nothing is
    * corpus-keyed. The hash is the engine's shared compiled polynomial
    * (codegen'd, oracle-replayable).
    */
  def hashingTrick(docs: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    docs.select(col(idCol),
        explode(Text.tokens(col(textCol))).as("__tok"))
      .select(col(idCol),
        graft.plans.TextExpressions.polyHash(col("__tok")).as("__tid"))
      .select(col(idCol), (col("__tid") % dims).cast("long").as("dim"),
        when(expr(s"(__tid div $dims) % 2") === 0L, 1L)
          .otherwise(-1L).as("__sgn"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("__sgn")).as("val"))
      .filter(col("val") =!= 0L)
  }

  /** Class-based TF-IDF cluster labeling (the BERTopic "name the topic"
    * step, Grootendorst 2022, arXiv:2203.05794): treat each cluster as
    * ONE pseudo-document and rank its terms by cluster term count against
    * the term's corpus-wide count — the top-k terms ARE the cluster's
    * human-readable label. Scoring is ctf·T/ttf (cluster term count ×
    * total corpus tokens / corpus term count): the division-exact analog
    * of BERTopic's tf·log(1 + A/f) under the repo's no-transcendentals
    * oracle-parity rule — both weight cluster-frequent, corpus-rare terms
    * up; exact-integer double division is bit-reproducible where libm
    * log is not.
    *
    * Scale: two partial-aggregable groupBys over the exploded token
    * stream (cluster-term, then term), one broadcast 1-row total, one
    * window over per-cluster term lists — nothing corpus-keyed beyond
    * the token counting every TF-IDF pass already does.
    *
    * Output: (clusterCol, term, ctf, ttf, score, term_rank 1..k).
    */
  def clusterTerms(docs: DataFrame, clusterCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(clusterCol),
      explode(Text.tokens(col(textCol))).as("term"))
    val ctf = toks.groupBy(col(clusterCol), col("term"))
      .agg(count(lit(1)).as("ctf"))
    val ttf = ctf.groupBy(col("term")).agg(sum(col("ctf")).as("ttf"))
    val total = broadcast(toks.agg(count(lit(1)).as("__t")))
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col("score").desc, col("term").asc)
    ctf.join(ttf, Seq("term"))
      .crossJoin(total)
      .withColumn("score",
        (col("ctf") * col("__t")).cast("double") / col("ttf").cast("double"))
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
      .select(col(clusterCol), col("term"), col("ctf"), col("ttf"),
        col("score"), col("term_rank"))
  }
}
