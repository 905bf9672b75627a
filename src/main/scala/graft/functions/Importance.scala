package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Importance-weighted data selection (DSIR-style): score every raw
  * document by how much its token distribution looks like a small
  * TARGET corpus relative to the raw corpus itself, then keep the top
  * scorers — the hashed-n-gram importance-resampling recipe of Xie et
  * al. 2023 ("Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169), here with unigram features hashed
  * into a fixed bucket space.
  *
  * Two deliberate departures from the paper, both documented:
  *
  *  - The paper's log-likelihood-ratio sum (a geometric-mean preference)
  *    is replaced by the ARITHMETIC mean of per-token likelihood ratios.
  *    Logs are transcendentals, and the repo's oracle-parity rule (see
  *    Rank's measured libm/DuckDB `ln` divergence) forbids them; the
  *    mean-ratio score is still monotone per token in p_target/p_raw and
  *    selects the same "looks like the target" tail in practice, but it
  *    weights outlier tokens linearly rather than logarithmically.
  *  - Gumbel-noise resampling is replaced by deterministic top-k:
  *    reproducibility is the pipeline contract here (no `rand()`
  *    anywhere in the repo), and the chosen-set diversity that noise
  *    buys can be recovered by hash-stratifying the selection.
  *
  * All ratio arithmetic is exact-integer in decimal(38,0): with B
  * buckets, target/raw occurrence counts tc/rc and totals Nt/Nr, each
  * token's Laplace-smoothed ratio is quantized by ONE integral division
  *
  *   lr_q = ((tc+1) * (Nr+B) * 10^6) div ((rc+1) * (Nt+B))
  *
  * so per-doc sums are order-free and engine-identical. Bound check:
  * at 100 TB (token totals ~10^15, bucket counts <= totals) the widest
  * product is ~(10^15)^2 * 10^6 = 10^36 — inside 38 digits.
  *
  * Scale design (100 TB): the bucket-count tables are <= B rows (B is a
  * few thousand), so the ratio table broadcasts; the raw corpus token
  * stream is one scan-stage hash pass joined map-side against that
  * broadcast, and the per-doc score is one partial-aggregable groupBy.
  * The target corpus is small by construction (it is the thing you wish
  * you had more of) but is never required to broadcast raw — only its
  * B-row bucket aggregate is. No corpus-sized shuffle anywhere.
  */
object Importance {

  private val Quant = 1000000L // 10^6: six fixed decimal places

  /** Per-raw-document importance scores against `target`'s hashed-unigram
    * distribution. Output: (idCol, n_tokens, score_q, score) where
    * `score_q` is the exact quantized integer mean likelihood ratio and
    * `score` its double rendering. Documents with zero tokens emit no
    * rows (inner-join semantics, like bigramStats — gate empty docs with
    * tokenCount separately).
    */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val dec = "decimal(38,0)"
    // Scan-stage hashed unigram stream: the fused tokenize→hash generator
    // (n = 1 grams are the tokens themselves), folded into B buckets.
    def bucketStream(docs: DataFrame): DataFrame =
      docs.select(col(idCol),
          graft.plans.TextExpressions.hashedShingles(col(textCol), 1))
        .select(col(idCol), pmod(col("tid"), lit(nBuckets.toLong)).as("bkt"))

    val rawB = bucketStream(raw)
    val rc = rawB.groupBy(col("bkt")).agg(count(lit(1)).cast("long").as("rc"))
    val tc = bucketStream(target).groupBy(col("bkt"))
      .agg(count(lit(1)).cast("long").as("tc"))
    // Totals as ONE broadcast row each — never driver-side literals.
    val totals = broadcast(rc.agg(sum(col("rc")).cast("long").as("n_r"))
      .crossJoin(tc.agg(sum(col("tc")).cast("long").as("n_t"))))
    // B-row ratio table; raw-side tokens can only hash into buckets rc
    // saw, so a left join from rc covers every lookup (absent tc rows
    // smooth to +1).
    val ratios = broadcast(rc.join(tc, Seq("bkt"), "left")
      .withColumn("tc", coalesce(col("tc"), lit(0L)))
      .crossJoin(totals)
      .withColumn("lr_q",
        expr(s"""CAST((CAST(tc + 1 AS $dec) *
                       CAST(n_r + $nBuckets AS $dec) *
                       CAST($Quant AS $dec)) div
                      (CAST(rc + 1 AS $dec) *
                       CAST(n_t + $nBuckets AS $dec)) AS BIGINT)"""))
      .select(col("bkt"), col("lr_q")))

    rawB.join(ratios, Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("lr_q")).cast("long").as("__lr_sum"))
      .withColumn("score_q", expr("__lr_sum div n_tokens"))
      .withColumn("score", col("score_q").cast("double") / lit(Quant.toDouble))
      .select(col(idCol), col("n_tokens"), col("score_q"), col("score"))
  }

  /** EFFECTIVE SAMPLE SIZE of an importance-weighted sample — the
    * Kish diagnostic every importance-sampling pipeline (DSIR
    * selection, mixture reweighting) must report: ESS = (Σw)²/Σw².
    * ESS ≈ n says the weights are near-uniform (reweighting is
    * cosmetic); ESS ≪ n says a few documents own the weighted mass —
    * the curated set behaves like a tiny corpus, whatever its row
    * count. Exact integers: ess_floor = (Σw)² div Σw², and
    * ess_ratio_ppm = ppm of ESS/n (the weighting-efficiency ratio).
    * NULL when every weight is 0. One partial-aggregable pass; one
    * row: (n, w_sum, ess_floor, ess_ratio_ppm).
    */
  def effectiveSampleSize(weights: DataFrame, wCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    weights.select(col(wCol).cast("long").as("__w"))
      .filter(col("__w").isNotNull && col("__w") >= 0L)
      .agg(count(lit(1)).as("n"), sum(col("__w")).as("w_sum"),
        sum((col("__w").cast("decimal(19,0)") * col("__w")).cast(dec))
          .cast(dec).as("__ws2"))
      .select(col("n"), col("w_sum"),
        when(col("__ws2") === 0, lit(null).cast("long"))
          .otherwise((((col("w_sum").cast("decimal(19,0)") * col("w_sum"))
            .cast(dec) - ((col("w_sum").cast("decimal(19,0)") *
              col("w_sum")).cast(dec) % col("__ws2"))) / col("__ws2"))
            .cast("long")).as("ess_floor"),
        when(col("__ws2") === 0, lit(null).cast("long"))
          .otherwise(graft.functions.Stats.fixedPointExact(
            (col("w_sum").cast("decimal(19,0)") * col("w_sum")).cast(dec),
            (col("n").cast("decimal(19,0)") * col("__ws2")).cast(dec)))
          .as("ess_ratio_ppm"))
  }

  /** Deterministic top-`k` selection by importance score — the "curated
    * slice that looks like the target" a data-mixing run feeds downstream.
    * One bounded TakeOrdered over the per-doc scores.
    */
  def importanceSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    importanceScores(raw, target, idCol, textCol, nBuckets)
      .orderBy(col("score_q").desc, col(idCol).asc)
      .limit(k)
  }
}
