package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969, "A Theory for
  * Record Linkage", JASA 64(328) — the decision-theoretic framework
  * behind every classical entity-resolution system, e.g. Splink or
  * JedAI): candidate pairs get a per-field AGREEMENT VECTOR, each field
  * contributes a log-likelihood-ratio weight — log2(m/u) on agreement,
  * log2((1-m)/(1-u)) on disagreement, where m = P(agree | same entity)
  * and u = P(agree | different entities) — and the summed weight is
  * thresholded into link / possible / non-link.
  *
  * Weights are quantized ONCE on the driver to integer milli-bits
  * (round(1000 * log2(ratio))) and inlined as literals, so the
  * distributed arithmetic is pure long addition — exact, associative,
  * and reproduced bit-for-bit by the oracle from the same constants.
  * The m/u parameters themselves are caller-supplied here (estimated
  * upstream by EM in full systems; clerical-review priors are the
  * textbook bootstrap) — the operator is the scoring/decision stage.
  *
  * Scale shape: a pure map over the blocker's candidate pairs — no
  * shuffle of its own; cost is entirely the upstream blocking stage,
  * which is the point of the F-S factorization (never score n²).
  */
object Linkage {

  /** One comparison field: a name, its agreement predicate over the
    * joined pair frame, and the m/u probabilities in permille.
    */
  final case class Field(name: String, agree: Column,
      mPermille: Int, uPermille: Int) {
    require(mPermille > 0 && mPermille < 1000,
      s"m must be in (0,1000) permille, got $mPermille")
    require(uPermille > 0 && uPermille < 1000,
      s"u must be in (0,1000) permille, got $uPermille")
    require(mPermille > uPermille,
      s"m <= u makes agreement evidence AGAINST a link: m=$mPermille u=$uPermille")

    private def log2(x: Double): Double = math.log(x) / math.log(2.0)

    /** Agreement weight in milli-bits: round(1000 * log2(m/u)) > 0. */
    def agreeMilli: Long =
      math.round(1000.0 * log2(mPermille.toDouble / uPermille.toDouble))

    /** Disagreement weight in milli-bits:
      * round(1000 * log2((1-m)/(1-u))) < 0.
      */
    def disagreeMilli: Long =
      math.round(1000.0 *
        log2((1000.0 - mPermille) / (1000.0 - uPermille)))
  }

  /** Agreement-pattern histogram: candidate pairs collapsed to their
    * boolean agreement vector with counts — at most 2^k rows for k
    * fields. This is the ONLY corpus-sized pass parameter estimation
    * needs: EM over the Fellegi-Sunter mixture depends on the data only
    * through these counts, so the estimator ([[emEstimate]]) runs on the
    * driver over a bounded table — the k-means-centroid/perceptron-weight
    * precedent — while the pairs themselves never leave the cluster.
    */
  def agreementHistogram(pairs: DataFrame, fields: Seq[Field]): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    val flagged = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"${f.name}_agree", coalesce(f.agree, lit(false)))
    }
    flagged.groupBy(fields.map(f => col(s"${f.name}_agree")): _*)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** EM estimates from an agreement-pattern histogram (Winkler 1988,
    * "Using the EM Algorithm for Weight Computation in the
    * Fellegi-Sunter Model of Record Linkage"): the two-class conditional-
    * independence mixture — match fraction `lambda`, per-field m and u —
    * fitted by `rounds` EM iterations from the given starts.
    *
    * Driver-side double arithmetic over the bounded histogram:
    * deterministic for fixed inputs (same JVM fp every run), never
    * touching pair-level data. Returns (lambda, per-field (m, u)) with
    * probabilities clamped to [1e-6, 1-1e-6] so degenerate histograms
    * can't push a weight to ±infinity.
    *
    * Identifiability: the two-class CI mixture has 2k+1 free parameters
    * against 2^k - 1 free pattern cells — k >= 3 fields is the classic
    * floor (k = 2 is under-identified and EM drifts to a data-equivalent
    * optimum; the spec pins both behaviors). This is a property of the
    * model, not the optimizer.
    */
  def emEstimate(patterns: Seq[(Seq[Boolean], Long)], k: Int,
      lambda0: Double = 0.1, m0: Double = 0.9, u0: Double = 0.1,
      rounds: Int = 20): (Double, Seq[(Double, Double)]) = {
    require(patterns.nonEmpty, "empty histogram")
    require(patterns.forall(_._1.size == k), s"pattern width != $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val eps = 1e-6
    def clamp(x: Double) = math.min(1.0 - eps, math.max(eps, x))
    var lambda = clamp(lambda0)
    var m = Array.fill(k)(clamp(m0))
    var u = Array.fill(k)(clamp(u0))
    val total = patterns.map(_._2).sum.toDouble
    for (_ <- 1 to rounds) {
      // E-step: P(match | pattern) per histogram row
      val resp = patterns.map { case (a, c) =>
        val pm = a.zipWithIndex.map { case (ai, i) =>
          if (ai) m(i) else 1.0 - m(i) }.product
        val pu = a.zipWithIndex.map { case (ai, i) =>
          if (ai) u(i) else 1.0 - u(i) }.product
        val w = lambda * pm / (lambda * pm + (1.0 - lambda) * pu)
        (a, c, w)
      }
      // M-step: responsibility-weighted agreement rates
      val wm = resp.map { case (_, c, w) => c * w }.sum
      val wu = resp.map { case (_, c, w) => c * (1.0 - w) }.sum
      lambda = clamp(wm / total)
      m = Array.tabulate(k) { i =>
        clamp(resp.collect { case (a, c, w) if a(i) => c * w }.sum /
          math.max(wm, eps))
      }
      u = Array.tabulate(k) { i =>
        clamp(resp.collect { case (a, c, w) if a(i) => c * (1.0 - w) }.sum /
          math.max(wu, eps))
      }
    }
    (lambda, m.toIndexedSeq.zip(u.toIndexedSeq))
  }

  /** Rebuild scoring fields from EM output: probabilities quantized to
    * permille (the [[Field]] currency) with the asymmetric clamp [1, 999]
    * and m > u enforced — a field whose EM estimates collapse (m <= u
    * carries no linkage signal) is REJECTED rather than silently scored
    * backwards.
    */
  def fieldsFromEm(fields: Seq[Field],
      em: Seq[(Double, Double)]): Seq[Field] = {
    require(fields.size == em.size, "field/estimate arity mismatch")
    fields.zip(em).map { case (f, (mProb, uProb)) =>
      def permille(p: Double): Int =
        math.min(999, math.max(1, math.round(p * 1000.0).toInt))
      f.copy(mPermille = permille(mProb), uPermille = permille(uProb))
    }
  }

  /** Score candidate pairs: adds one `<field>_agree` boolean per field,
    * the summed `weight_milli`, and the three-way `decision` ('link' at
    * or above `upperMilli`, 'non-link' below `lowerMilli`, 'possible'
    * between — the clerical-review band of the original paper).
    *
    * A NULL agreement predicate (absent field value on either side)
    * counts as disagreement — the conservative convention; callers
    * wanting missing-at-random neutrality add `coalesce(pred, lit(true))`
    * upstream.
    */
  def score(pairs: DataFrame, fields: Seq[Field],
      upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    require(upperMilli >= lowerMilli,
      s"upper ($upperMilli) must be >= lower ($lowerMilli)")
    val flagged = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"${f.name}_agree", coalesce(f.agree, lit(false)))
    }
    val weight = fields.map { f =>
      when(col(s"${f.name}_agree"), lit(f.agreeMilli))
        .otherwise(lit(f.disagreeMilli))
    }.reduce(_ + _)
    flagged
      .withColumn("weight_milli", weight)
      .withColumn("decision",
        when(col("weight_milli") >= upperMilli, lit("link"))
          .when(col("weight_milli") < lowerMilli, lit("non-link"))
          .otherwise(lit("possible")))
  }
}
