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
  * Scale: the edge frame aggregates to (pair, n) once, is partitioned
  * by its join key and checkpointed, and the per-round term n/(wi+wj)
  * is computed ONCE per undirected edge (it is symmetric in i,j) and
  * fanned out to both endpoints — not once per direction. The rounds
  * run in a tuned child session ([[Serving]]) with AQE off and a
  * shuffle-partition count DERIVED from the item count (~100k items
  * per partition, so sf-sized fits run single-partition and a
  * 10^9-item corpus gets ~10k partitions), and every frame a round
  * touches is hash-partitioned on its join key with shuffle-hash
  * joins, so the static edge side and the carried weight frame never
  * re-shuffle: a round's only exchanges are the endpoint re-key of
  * the per-edge terms, the per-item fold, and the 1-row
  * renormalization total. Items and comparisons may both be
  * corpus-sized; integer sums are partitioning-independent, so the
  * fit is bit-identical in either session. Bounds: n_ij < 2^22 and
  * W_i < 2^22 keep the 2^40-scaled products in long range (millions
  * of comparisons per PAIR/ITEM — beyond it, pre-scale n).
  *
  * Output: (item, n_wins, w_q, w_ppm) — the fitted strength at 2^20
  * scale and its exact normalized parts-per-million share.
  */
object Preference {

  def bradleyTerry(pairs: DataFrame, winCol: String, loseCol: String,
      rounds: Int = 8): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark0 = pairs.sparkSession
    val edges0 = pairs
      .select(col(winCol).cast("long").as("__a"),
        col(loseCol).cast("long").as("__b"))
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val items0 = edges0.select(col("__a").as("item"))
      .unionByName(edges0.select(col("__b").as("item"))).distinct()
    val nItems = items0.count()
    // ~100k items per round partition; the cap is a driver-metadata
    // guard, not a data bound (10^9 items -> 10k partitions).
    val parts = math.max(1L, math.min(1L << 15, nItems / 100000L + 1L)).toInt
    val ts = Serving.tuned(spark0, s"bt-rounds:$parts", parts)(_ => Nil)._1
    def bind(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftBridge.dataFrame(ts,
        org.apache.spark.sql.GraftBridge.logicalPlan(df))

    // Static per-round inputs, partitioned by their round-join key and
    // checkpointed so the partitioning survives as LogicalRDD metadata
    // and every later round reuses it exchange-free.
    val edges = bind(edges0).repartition(parts, col("__a"))
      .localCheckpoint(true)
    val wins = edges.groupBy(col("__a").as("item"))
      .agg(sum(col("__n")).as("n_wins"))
    var w = bind(items0).repartition(parts, col("item"))
      .join(wins.hint("shuffle_hash"), Seq("item"), "left")
      .select(col("item"), coalesce(col("n_wins"), lit(0L)).as("n_wins"),
        lit(1L << 20).as("__wq"))
      .localCheckpoint(true)
    // items0 still scans edges0's checkpoint; free it only once w is
    // materialized (edges has its own blocks).
    org.apache.spark.sql.GraftBridge.unpersistCheckpoint(edges0)
    for (_ <- 1 to rounds) {
      // One join chain per UNDIRECTED edge: wa rides the co-partitioned
      // (__a) layout exchange-free, wb costs the round's one edge-sized
      // exchange, and the symmetric term fans out to both endpoints.
      val terms = edges
        .join(w.select(col("item").as("__a"), col("__wq").as("__wa"))
          .hint("shuffle_hash"), Seq("__a"))
        .join(w.select(col("item").as("__b"), col("__wq").as("__wb"))
          .hint("shuffle_hash"), Seq("__b"))
        .select(explode(array(
          struct(col("__a").as("item"),
            expr("CAST((__n * 1099511627776) div (__wa + __wb) AS BIGINT)")
              .as("__t")),
          struct(col("__b").as("item"),
            expr("CAST((__n * 1099511627776) div (__wa + __wb) AS BIGINT)")
              .as("__t")))).as("__e"))
        .select(col("__e.item").as("item"), col("__e.__t").as("__t"))
        .groupBy(col("item")).agg(sum(col("__t")).as("__dq"))
      val updated = w.join(terms.hint("shuffle_hash"), Seq("item"))
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
    val out = w.crossJoin(broadcast(tot))
      .select(col("item"), col("n_wins"), col("__wq").as("w_q"),
        expr("""CAST((CAST(__wq AS decimal(38,0)) * 1000000)
                div CAST(__sw AS decimal(38,0)) AS BIGINT)""").as("w_ppm"))
    org.apache.spark.sql.GraftBridge.dataFrame(spark0,
      org.apache.spark.sql.GraftBridge.logicalPlan(out))
  }
}
