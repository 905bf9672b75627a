package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** L-bounded suffix ranking by PREFIX DOUBLING (Manber & Myers 1990,
  * "Suffix arrays: a new method for on-line string searches") over the
  * per-document token streams — the suffix-array primitive behind exact
  * substring dedup (Lee et al. 2022 "Deduplicating Training Data Makes
  * Language Models Better" builds suffix arrays for exactly this), here
  * re-expressed as log2(L) rounds of the engine's two-level exact
  * ranking instead of a monolithic suffix sort.
  *
  * Round 0 ranks every suffix by its FIRST token (a vocabulary-sized
  * dense rank). Round k+1 ranks by the pair (rank_k[pos],
  * rank_k[pos + 2^k]) — one positional self-join plus one two-level
  * ranking of the DISTINCT pairs (dense: equal prefixes share a rank;
  * ranking distinct pairs keeps it deterministic), so after R rounds
  * suffixes are ordered by their first 2^R tokens. Suffixes never cross
  * document boundaries (no phantom repeats from concatenation); a
  * missing partner past the end ranks as sentinel 0, which sorts before
  * every real rank — exactly "shorter prefix first", matching list
  * lexicographic order.
  *
  * The point at scale: the sort keys are PAIRS OF LONGS at every round
  * — never the L-token windows themselves (an L-fold corpus blowup for
  * the direct window sort the DuckDB oracle runs at toy scale) — and
  * every round is one equi-join plus one distinct + two-level rank:
  * all partial-aggregable / range-exchange shapes, log2(L) of them.
  *
  * [[lcpAdjacent]] then yields the classical corollary: the longest
  * repeated substring (capped at 2^R - 1 tokens) is the maximal
  * longest-common-prefix between ADJACENT suffixes in rank order,
  * computed by the standard rank-table descent — at step k, if the two
  * suffixes' rank_k agree at their current offsets, they share those
  * 2^k tokens and both offsets advance — log2(L) chained equi-joins,
  * each over the n adjacent pairs.
  */
object Suffix {

  /** (doc_id-as-__id, __pos 0-based, __tok) token stream. */
  private def stream(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"),
        posexplode(Text.tokens(col(textCol))))
      .select(col("__id"), col("pos").cast("long").as("__pos"),
        col("col").as("__tok"))

  /** Dense rank over any frame of UNIQUE rows by `order` — two-level,
    * no single-task sort. */
  private def denseRankOf(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      as: String): DataFrame =
    GroupRank.withRankAndCount(df.withColumn("__g", lit(1)), Seq("__g"),
        order, as, "__n")
      .drop("__g", "__n")

  /** Per-round rank tables r_0 .. r_rounds: each (__id, __pos, r) with
    * r ordering suffixes by their first 2^k tokens. Returned oldest
    * first; every table is checkpointed (they are re-read by the LCP
    * descent and the next round).
    *
    * EARLY EXIT (Manber–Myers termination): once the dense pair rank is
    * a permutation — max rank equals the suffix count, i.e. every
    * suffix already distinguished by its first 2^k tokens — further
    * rounds are the identity map, so the loop stops and the remaining
    * slots alias the converged table. The alias keeps [[lcpAdjacent]]'s
    * descent contract intact: with all ranks unique, a level-k "ranks
    * agree" test on two DISTINCT suffixes can never fire (distinct
    * ranks at the converged level mean they differ within 2^c ≤ 2^k
    * tokens), so aliased levels credit nothing — exactly what the real
    * table would do. The max-rank probe is a cheap scan of the
    * just-materialized checkpoint, and on real text the deepest rounds
    * are the expensive ones (biggest distinct-pair domains), so
    * convergence at round c saves the costliest (rounds − c) builds.
    */
  /** Largest rank value whose composite `ra·(m+1)+rb` still fits a
    * long: floor(sqrt(Long.MaxValue)) − 1. Corpora under ~3e9 suffixes
    * take the composite shortcut on alternate rounds; past it every
    * round dense-ranks (the classic construction) — correctness never
    * depends on the shortcut.
    */
  private val MaxCompositeRank = 3037000498L

  def rankTables(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): Seq[DataFrame] = {
    require(rounds >= 1 && rounds <= 10, s"rounds in [1,10], got $rounds")
    val spark = docs.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val toks = stream(docs, idCol, textCol).localCheckpoint(true)
    val n = toks.count()
    // dense rank of the token stream directly (two-level, no distinct +
    // rank-the-vocabulary + join-back: that staging cost one more
    // corpus exchange and a corpus-sized sort-merge join per ranking)
    var cur = GroupRank.denseRankAll(toks, Seq("__tok"), "__r")
      .select(col("__id"), col("__pos"), col("__r"))
      .localCheckpoint(true)
    val tables = scala.collection.mutable.ArrayBuffer[DataFrame](cur)
    var span = 1L
    // max rank of the last DENSE table: the convergence probe, and the
    // composite base K below.
    var maxRank = if (n == 0L) 0L else cur.agg(max(col("__r"))).head.getLong(0)
    var converged = n == 0L || maxRank == n
    // Whether `cur` holds dense ranks (true after round 0 and every
    // ranked round) or composite order-codes (see below).
    var dense = true
    // Whether `cur`'s checkpoint is KNOWN to be laid out hash(__id) and
    // sorted (__id, __pos) — true after composite rounds, whose
    // checkpoint re-declares the window output's layout
    // (localCheckpoint under AQE records UnknownPartitioning, so
    // without the relabel every round re-exchanged and re-sorted the
    // corpus for its lead window).
    var idLaid = false
    for (r <- 1 to rounds if !converged) {
      // Partner rank by a PER-DOCUMENT window — lead(r, span) over
      // (doc, pos) is exactly "the rank span positions later in the
      // same document", the bounded-domain window kind (document
      // length). The explicit REPARTITION_BY_NUM (never AQE-coalesced,
      // so the layout stays declarable) replaces the exchange the
      // window would insert anyway; a composite-laid checkpoint skips
      // both the exchange and the sort.
      val base = if (idLaid) cur else cur.repartition(parts, col("__id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__id")).orderBy(col("__pos").asc)
      val paired = base.withColumnRenamed("__r", "__ra")
        .withColumn("__rb",
          coalesce(lead(col("__ra"), span.toInt).over(w), lit(0L)))
      // COMPOSITE round (odd rounds, while ranks fit): downstream
      // consumers need only the ORDER and EQUALITY structure of the
      // pair (ra, rb) — the next round compares/sorts them, the LCP
      // descent tests equality — and `ra·K + rb` with K > max(rb)
      // preserves both exactly (rb < K makes the map injective and
      // lexicographic; the missing-partner sentinel 0 stays strictly
      // smallest since every real code is ≥ K > 0). That removes the
      // distinct + two-level rank + join-back (≈3 exchanges + a rank)
      // from every other round; the following round's dense rank then
      // compresses the codes back under n, so composites never nest
      // (a composite of composites would need 2^80 bits). The final
      // table is ALWAYS dense-ranked — [[suffixRanks]]'s contract.
      val composite = dense && (r % 2 == 1) && r != rounds &&
        maxRank <= MaxCompositeRank
      if (composite) {
        // the select is a narrow projection of the window output, so
        // the checkpoint genuinely holds hash(__id, parts) data sorted
        // (__id, __pos) — re-declare it for the next round's window
        cur = GraftBridge.relabelCheckpointLayout(
          paired.select(col("__id"), col("__pos"),
              (col("__ra") * (maxRank + 1L) + col("__rb")).as("__r"))
            .localCheckpoint(true),
          Seq("__id"), Seq(("__id", true), ("__pos", true)), parts)
        dense = false
        idLaid = true
        // no convergence probe: max(code) == n means nothing for
        // codes; detection resumes on the next dense round (costs at
        // most one cheap extra round after actual convergence)
      } else {
        // dense rank of the paired table directly — same values as
        // ranking the distinct pair domain and joining back (dense rank
        // is tie-insensitive), minus the distinct, the domain join's
        // exchanges, and its corpus-sized sorts
        cur = GroupRank.denseRankAll(paired, Seq("__ra", "__rb"), "__r")
          .select(col("__id"), col("__pos"), col("__r"))
          .localCheckpoint(true)
        dense = true
        idLaid = false
        maxRank = cur.agg(max(col("__r"))).head.getLong(0)
        converged = maxRank == n
      }
      tables += cur
      span *= 2
    }
    // a trailing composite table would leak order-codes to
    // [[suffixRanks]]; by construction the loop never ends on one
    // (composite rounds exclude r == rounds and convergence only
    // fires on dense rounds), so this is an invariant, not a repair
    assert(dense, "rankTables ended on a composite (non-dense) table")
    while (tables.size < rounds + 1) tables += cur
    // every per-round table is eagerly materialized; the raw stream
    // checkpoint has no further reader
    GraftBridge.unpersistCheckpoint(toks)
    tables.toSeq
  }

  /** Single-slot session memo of the LAST rank-table build, keyed by
    * the canonicalized input plan + parameters + SparkContext identity
    * (via [[PlanMemo]]): [[suffixRanks]] and [[lcpAdjacent]] share one
    * prefix-doubling pipeline — the rank tables are byte-identical
    * work, and the two catalog consumers were the engine's two
    * costliest entries precisely because each rebuilt all log2(L)
    * checkpointed rounds (measured: 9.9 + 11.7 s at sf0.1 min-of-2
    * rebuilt, 9.9 + 2.8 s shared). Checkpointed tables are frozen
    * data, so reuse is sound for the same logical input under the SAME
    * context; the slot holds one build (evicting unpersists), and
    * [[releaseShared]] frees it explicitly — at 100 TB the memo is
    * log2(L) corpus-sized checkpoint files, a deliberate cache, not a
    * leak.
    */
  private val memo = PlanMemo[Seq[DataFrame]](
    _.foreach(GraftBridge.unpersistCheckpoint))

  private def sharedRankTables(docs: DataFrame, idCol: String,
      textCol: String, rounds: Int): Seq[DataFrame] =
    memo.getOrBuild(docs.sparkSession,
        Seq(GraftBridge.logicalPlan(docs).canonicalized, idCol, textCol,
          rounds)) {
      rankTables(docs, idCol, textCol, rounds)
    }

  /** Drop the shared rank-table memo and free its checkpoint storage. */
  def releaseShared(): Unit = memo.release()

  /** Suffix ranks by the first 2^rounds tokens:
    * (idCol, pos, srank) — dense, deterministic. The result is
    * checkpointed INDEPENDENTLY of the shared memo: a later build for
    * a different input evicts (and unpersists) the memo's tables, and
    * a still-lazy result referencing them would die on missing
    * checkpoint blocks — so the returned frame must own its storage.
    */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame =
    sharedRankTables(docs, idCol, textCol, rounds).last
      .select(col("__id").as(idCol), col("__pos").as("pos"),
        col("__r").as("srank"))
      .localCheckpoint(true)

  /** Adjacent-suffix LCPs (capped at 2^rounds - 1 tokens): for every
    * neighboring pair in suffix-rank order, the exact shared-prefix
    * token count by rank-table descent. Output: (id_a, pos_a, id_b,
    * pos_b, lcp).
    */
  def lcpAdjacent(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val tables = sharedRankTables(docs, idCol, textCol, rounds)
    // per-doc token counts: a rank_k match on a CLAMPED window (fewer
    // than 2^k tokens remain) means the two suffixes are identical to
    // their ends — list equality forces equal residual lengths — so the
    // step credits min(2^k, tokens remaining), not the full span
    val lens = tables.head.groupBy(col("__id"))
      .agg(count(lit(1)).as("__len"))
    val order = denseRankOf(
      tables.last.select(col("__id"), col("__pos"), col("__r")),
      Seq(col("__r").asc, col("__id").asc, col("__pos").asc), "__ord")
    val a = order.select(col("__id").as("__ida"), col("__pos").as("__posa"),
      col("__ord"))
    val b = order.select(col("__id").as("__idb"), col("__pos").as("__posb"),
      (col("__ord") - 1L).as("__ord"))
    var pairs = a.join(b, Seq("__ord"))
      .join(lens.select(col("__id").as("__ida"), col("__len").as("__lena")),
        Seq("__ida"))
      .select(col("__ida"), col("__posa"), col("__idb"), col("__posb"),
        col("__lena"))
      .withColumn("__lcp", lit(0L))
    for (k <- (rounds - 1) to 0 by -1
        // converged levels contribute nothing: tables(k+1) eq tables(k)
        // means level k's ranks are already a permutation (the early-
        // exit alias), so no DISTINCT adjacent pair can match at 2^k —
        // skip the two no-op equi-joins the level would cost
        if !(tables(k + 1) eq tables(k))) {
      val span = 1L << k
      val ra = tables(k).select(col("__id").as("__ida"),
        col("__pos").as("__pa"), col("__r").as("__rka"))
      val rb = tables(k).select(col("__id").as("__idb"),
        col("__pos").as("__pb"), col("__r").as("__rkb"))
      pairs = pairs
        .withColumn("__pa", col("__posa") + col("__lcp"))
        .withColumn("__pb", col("__posb") + col("__lcp"))
        .join(ra, Seq("__ida", "__pa"), "left")
        .join(rb, Seq("__idb", "__pb"), "left")
        .withColumn("__lcp",
          when(col("__rka").isNotNull && col("__rka") === col("__rkb"),
            col("__lcp") +
              least(lit(span), col("__lena") - col("__pa")))
          .otherwise(col("__lcp")))
        .select(col("__ida"), col("__posa"), col("__idb"), col("__posb"),
          col("__lena"), col("__lcp"))
    }
    // the rank tables stay alive in the shared memo (released on the
    // next different build or via releaseShared)
    pairs.select(col("__ida").as("id_a"), col("__posa").as("pos_a"),
      col("__idb").as("id_b"), col("__posb").as("pos_b"),
      col("__lcp").as("lcp")).localCheckpoint(true)
  }

  /** The top-`k` longest repeated token substrings (L-bounded): maximal
    * adjacent-suffix LCPs with the repeated text reconstructed from the
    * earlier occurrence. Output: (lcp, id_a, pos_a, id_b, pos_b,
    * snippet), ordered by (lcp desc, id_a, pos_a).
    */
  def longestRepeats(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, k: Int): DataFrame = {
    val lcps = lcpAdjacent(docs, idCol, textCol, rounds)
      .filter(col("lcp") >= 1L)
      .orderBy(col("lcp").desc, col("id_a").asc, col("pos_a").asc)
      .limit(k)
    val toksOf = docs.select(col(idCol).as("id_a"),
      Text.tokens(col(textCol)).as("__tk"))
    lcps.join(toksOf, Seq("id_a"))
      .withColumn("snippet", concat_ws(" ",
        expr("slice(__tk, cast(pos_a as int) + 1, cast(lcp as int))")))
      .select(col("lcp"), col("id_a"), col("pos_a"), col("id_b"),
        col("pos_b"), col("snippet"))
      .orderBy(col("lcp").desc, col("id_a").asc, col("pos_a").asc)
  }
}
