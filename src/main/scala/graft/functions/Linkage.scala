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
