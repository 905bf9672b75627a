package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.FixLog

/** Log-domain distribution diagnostics — unigram entropy and pairwise
  * KL divergence between group token distributions — built on
  * [[FixLog]]'s integer fixed-point log2, the operators the engine's
  * no-libm discipline previously could not reach (its TV distance is
  * exact rational precisely because TV needs no logarithm; entropy and
  * KL do). The data-mixing readouts next to q_mix_hhi (concentration)
  * and q_unigram_tv (metric distance): entropy = how diverse a source's
  * token usage is; KL(a||b) = how expensive it is to model source a
  * with source b's distribution — the directed divergence behind DSIR
  * importance weights and CCNet-style domain filtering.
  *
  * All arithmetic integer: entropy numerator
  * H_num = sum_t n_t * (log2q(N) - log2q(n_t)) — exactly
  * N * 2^16 * H(distribution) up to log2q truncation — and smoothed KL
  * numerator KL_num = sum_t (n_at + 1) * (L_a(t) - L_b(t)) over the
  * GLOBAL vocabulary with Laplace add-one (L_g(t) = log2q(n_gt + 1) -
  * log2q(N_g + V)), so zero-count tokens are defined on both sides.
  * The rendered bits-per-token divides by N * 2^16 (resp.
  * (N_a + V) * 2^16) in double at the very end — presentation only,
  * the gate hashes the exact numerators too.
  *
  * Scale (100 TB): counts are one partial-aggregable groupBy; the grid,
  * the log2 table, and every join after it are GROUPS x VOCABULARY —
  * aggregate data. Long audit: each term is (count+1) * Dlog2q <=
  * n * 4.1e6; numerators accumulate in decimal(38,0), the engine's
  * standard wide-sum contract.
  */
object Entropy {

  /** Exact decimal(38,0) → BIGINT rendering that FAILS LOUDLY
    * (raise_error) instead of wrapping silently once the wide sum
    * leaves the long domain — past the documented ~1e12 tokens/group
    * bound a non-ANSI cast would hand the gate a wrapped (wrong but
    * plausible-looking) value; an error is the honest outcome.
    */
  private def longExact(c: Column, what: String): Column =
    when(c > lit(Long.MaxValue) || c < lit(Long.MinValue),
      raise_error(concat(lit(s"$what exceeds the BIGINT wide-sum bound: "),
        c.cast("string"))))
      .otherwise(c.cast("long"))

  private def counts(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    docs.select(col(groupCol).as("__g"),
        explode(Text.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__g"), col("__tok"))
      .agg(count(lit(1)).as("__c"))

  /** Per-group unigram entropy:
    * (groupCol, vocab, n_tokens, h_num, h_ubits, h_bits) — h_num the
    * exact integer numerator cast to BIGINT (bounded by
    * N·log2(N)·2^16: valid to ~10^12 tokens per group, the engine's
    * documented wide-sum audit), h_ubits the exact micro-bits-per-token
    * rendering ([[Stats.fixedPointExact]] over den = N·2^16 — the
    * gated integer), h_bits the convenience double.
    */
  def unigramEntropy(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val cnt = counts(docs, groupCol, textCol)
    val tot = cnt.groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__vocab"))
    cnt.join(broadcast(tot), Seq("__g"))
      .select(col("__g"), col("__n"), col("__vocab"),
        (col("__c").cast("decimal(19,0)") *
          (FixLog.log2qCol(col("__n")) - FixLog.log2qCol(col("__c"))))
          .cast("decimal(38,0)").as("__term"))
      .groupBy(col("__g"), col("__n"), col("__vocab"))
      .agg(sum(col("__term")).cast("decimal(38,0)").as("__hnum"))
      .select(col("__g").as(groupCol), col("__vocab").as("vocab"),
        col("__n").as("n_tokens"), longExact(col("__hnum"), "h_num").as("h_num"),
        Stats.fixedPointExact(col("__hnum"),
          (col("__n").cast("decimal(19,0)") * lit(65536L))
            .cast("decimal(38,0)")).as("h_ubits"),
        round(col("__hnum").cast("double") /
          (col("__n").cast("double") * 65536.0), 6).as("h_bits"))
  }

  /** All ordered-pair smoothed KL divergences between group unigram
    * distributions: (g_a, g_b, kl_num, kl_ubits, kl_bits) — kl_num the
    * exact integer numerator as BIGINT, kl_ubits the exact
    * micro-bits-per-token rendering (den = (N_a + V)·2^16), kl_bits
    * the convenience double.
    */
  def unigramKL(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val cnt = counts(docs, groupCol, textCol)
    val tot = cnt.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val vocab = cnt.select(col("__tok")).distinct()
    val v = vocab.agg(count(lit(1)).as("__v"))
    // class x vocabulary Laplace grid with per-token smoothed log-lik
    val grid = tot.crossJoin(v).crossJoin(vocab)
      .join(cnt, Seq("__g", "__tok"), "left")
      .select(col("__g"), col("__tok"), col("__n"), col("__v"),
        coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("__l",
        FixLog.log2qCol(col("__c") + 1L) -
          FixLog.log2qCol(col("__n") + col("__v")))
    val a = grid.select(col("__tok"), col("__g").as("g_a"),
      col("__c").as("__ca"), col("__n").as("__na"), col("__v"),
      col("__l").as("__la"))
    val b = grid.select(col("__tok"), col("__g").as("g_b"),
      col("__l").as("__lb"))
    a.join(b, Seq("__tok"))
      .filter(col("g_a") =!= col("g_b"))
      .groupBy(col("g_a"), col("g_b"), col("__na"), col("__v"))
      .agg(sum(((col("__ca") + 1L).cast("decimal(19,0)") *
        (col("__la") - col("__lb"))).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("__klnum"))
      .select(col("g_a"), col("g_b"),
        longExact(col("__klnum"), "kl_num").as("kl_num"),
        Stats.fixedPointExact(col("__klnum"),
          ((col("__na") + col("__v")).cast("decimal(19,0)") * lit(65536L))
            .cast("decimal(38,0)")).as("kl_ubits"),
        round(col("__klnum").cast("double") /
          ((col("__na") + col("__v")).cast("double") * 65536.0), 6)
          .as("kl_bits"))
  }

  /** Jensen-Shannon divergence between group unigram distributions,
    * one row per UNORDERED pair (g_a < g_b) — the symmetric, bounded
    * ([0,1] bit) companion of [[unigramKL]]'s directed divergence, and
    * the standard corpus-similarity card (which sources are
    * interchangeable for mixing, which are genuinely distinct).
    *
    * NO smoothing is needed: with M = (P+Q)/2, every P-support token
    * has m > 0, and p/m = 2·c_a·n_b / (c_a·n_b + c_b·n_a) — integer
    * ratios, so each side's numerator is exact q16 FixLog arithmetic:
    *   A = sum_{t: c_a>0} c_a·(log2q(2·c_a·n_b) - log2q(c_a·n_b + c_b·n_a))
    * and A-terms where c_b = 0 collapse to c_a·2^16 (log2(2) = 1 bit
    * exactly, even in q16) — so the tokens OUTSIDE the intersection
    * need no join at all: their mass is 2^16·(n_a - sum_inner c_a).
    * JS bits = (A/n_a + B/n_b) / (2·2^16), rendered exactly in
    * micro-bits: js_ubits = ppm((A·n_b + B·n_a) / (2·2^16·n_a·n_b)).
    * Output: (g_a, g_b, jsa_num, jsb_num, js_ubits).
    *
    * Scale: one partial-aggregable count pass, ONE vocab-keyed
    * self-equi-join restricted to the intersection support (tokens in
    * only one group contribute through the group totals — no grid, no
    * anti-join), then pair-sized aggregates. Numerators accumulate in
    * decimal(38,0); the BIGINT finals ride the same loud-failure guard
    * as entropy/KL. Long audit: the log2q arguments are c·n products,
    * so the domain bound is max-count × other-group-tokens < 2^62
    * (two 1e9-token corpora with 1e8-count heads: 1e17, ample; a
    * petascale pairing should pre-bucket counts before ratioing).
    */
  def unigramJS(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cnt = counts(docs, groupCol, textCol)
    val tot = cnt.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val withTot = cnt.join(broadcast(tot), Seq("__g"))
    val a = withTot.select(col("__tok"), col("__g").as("g_a"),
      col("__c").as("__ca"), col("__n").as("__na"))
    val b = withTot.select(col("__tok"), col("__g").as("g_b"),
      col("__c").as("__cb"), col("__n").as("__nb"))
    // intersection support only; one-sided tokens enter via the totals
    val inner = a.join(b, Seq("__tok"))
      .filter(col("g_a") < col("g_b"))
      .withColumn("__s",
        col("__ca") * col("__nb") + col("__cb") * col("__na"))
      .select(col("g_a"), col("g_b"), col("__na"), col("__nb"),
        col("__ca"), col("__cb"),
        (col("__ca").cast("decimal(19,0)") *
          (FixLog.log2qCol(lit(2L) * col("__ca") * col("__nb")) -
            FixLog.log2qCol(col("__s")))).cast(dec).as("__ta"),
        (col("__cb").cast("decimal(19,0)") *
          (FixLog.log2qCol(lit(2L) * col("__cb") * col("__na")) -
            FixLog.log2qCol(col("__s")))).cast(dec).as("__tb"))
    val pairSums = inner
      .groupBy(col("g_a"), col("g_b"), col("__na"), col("__nb"))
      .agg(sum(col("__ta")).cast(dec).as("__ia"),
        sum(col("__tb")).cast(dec).as("__ib"),
        sum(col("__ca")).as("__sa"), sum(col("__cb")).as("__sb"))
    pairSums
      .select(col("g_a"), col("g_b"), col("__na"), col("__nb"),
        (col("__ia") + ((col("__na") - col("__sa")).cast("decimal(19,0)") *
          lit(65536L)).cast(dec)).cast(dec).as("__A"),
        (col("__ib") + ((col("__nb") - col("__sb")).cast("decimal(19,0)") *
          lit(65536L)).cast(dec)).cast(dec).as("__B"))
      .select(col("g_a"), col("g_b"),
        longExact(col("__A"), "jsa_num").as("jsa_num"),
        longExact(col("__B"), "jsb_num").as("jsb_num"),
        Stats.fixedPointExact(
          (col("__A") * col("__nb") + col("__B") * col("__na")).cast(dec),
          (lit(131072L).cast(dec) * col("__na") * col("__nb")).cast(dec))
          .as("js_ubits"))
  }
}
