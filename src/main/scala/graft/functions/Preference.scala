package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PAIRWISE-PREFERENCE AGGREGATION — Bradley–Terry strength fitting
  * (Bradley & Terry 1952) by the MM algorithm (Hunter 2004, "MM
  * algorithms for generalized Bradley-Terry models"): the model behind
  * RLHF reward-data aggregation and arena-style leaderboards. Given
  * comparison outcomes (winner, loser), estimate item strengths w by
  * the fixed-point iteration
  *
  *   w_i <- W_i / sum over i's comparisons n_ij / (w_i + w_j)
  *
  * (W_i = i's total wins), renormalized each round to mean 2^20.
  *
  * Fixed-point integer arithmetic throughout: strengths live at 2^20
  * scale, each pair term is (n_ij · 2^40) // (wq_i + wq_j) (one
  * truncating division — bit-identical cross-engine), the update
  * (W_i · 2^40) // D_i, and the renormalization a decimal(38,0)
  * product over the item count — so `rounds` unrolled CTE stages
  * replay it exactly in the oracle. Items floor at strength 1
  * (an item with zero wins has BT strength 0 in the limit; the floor
  * keeps later divisions defined, the standard MM guard).
  *
  * Scale: the edge frame aggregates to (pair, n) once; each round is
  * two long-keyed equi-joins + one partial-aggregable per-item sum +
  * two 1-row aggregates — no windows, no driver loops; items and
  * comparisons may both be corpus-sized. Bounds: n_ij < 2^22 and
  * W_i < 2^22 keep the 2^40-scaled products in long range (millions of
  * comparisons per PAIR/ITEM — beyond it, pre-scale n).
  *
  * Output: (item, n_wins, w_q, w_ppm) — the fitted strength at 2^20
  * scale and its exact normalized parts-per-million share.
  */
object Preference {

  def bradleyTerry(pairs: DataFrame, winCol: String, loseCol: String,
      rounds: Int = 8): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val edges = pairs
      .select(col(winCol).cast("long").as("__a"),
        col(loseCol).cast("long").as("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // re-read every round
    val und = edges.select(col("__a").as("__i"), col("__b").as("__j"),
        col("__n"))
      .unionByName(edges.select(col("__b").as("__i"), col("__a").as("__j"),
        col("__n")))
    val items = und.select(col("__i").as("item")).distinct()
    val wins = edges.groupBy(col("__a").as("item"))
      .agg(sum(col("__n")).as("n_wins"))
    var w = items.join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("n_wins"), lit(0L)).as("n_wins"),
        lit(1L << 20).as("__wq"))
      .localCheckpoint(true)
    val nItems = items.count()
    for (_ <- 1 to rounds) {
      val terms = und
        .join(w.select(col("item").as("__i"), col("__wq").as("__wi")),
          Seq("__i"))
        .join(w.select(col("item").as("__j"), col("__wq").as("__wj")),
          Seq("__j"))
        .select(col("__i").as("item"),
          expr("CAST((__n * 1099511627776) div (__wi + __wj) AS BIGINT)")
            .as("__t"))
        .groupBy(col("item")).agg(sum(col("__t")).as("__dq"))
      val updated = w.join(terms, Seq("item"))
        .select(col("item"), col("n_wins"),
          greatest(lit(1L),
            expr("""CAST((CAST(n_wins AS decimal(38,0)) * 1099511627776)
                    div CAST(__dq AS decimal(38,0)) AS BIGINT)"""))
            .as("__wq"))
      val tot = updated.agg(sum(col("__wq")).as("__sw"))
      val next = updated.crossJoin(broadcast(tot))
        .select(col("item"), col("n_wins"),
          greatest(lit(1L),
            expr(s"""CAST((CAST(__wq AS decimal(38,0)) * $nItems * 1048576)
                     div CAST(__sw AS decimal(38,0)) AS BIGINT)"""))
            .as("__wq"))
        .localCheckpoint(true)
      org.apache.spark.sql.GraftBridge.unpersistCheckpoint(w)
      w = next
    }
    val tot = w.agg(sum(col("__wq")).as("__sw"))
    w.crossJoin(broadcast(tot))
      .select(col("item"), col("n_wins"), col("__wq").as("w_q"),
        expr("""CAST((CAST(__wq AS decimal(38,0)) * 1000000)
                div CAST(__sw AS decimal(38,0)) AS BIGINT)""").as("w_ppm"))
  }
}
