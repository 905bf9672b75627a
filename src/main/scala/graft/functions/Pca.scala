package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-arithmetic distributed PCA: the dominant principal direction of
  * an embedding prefix by fixed-point power iteration — the
  * dimensionality lens of the vector layer (dominant drift direction,
  * whitening axis, the 1-D projection for ordering/binning embeddings)
  * next to its compression rungs (int8, PQ, 1-bit) and search structures
  * (IVF, MRL).
  *
  * Everything is INTEGER arithmetic end to end, in both engines:
  *
  *  1. quantize: q = round(double(x) * 10^6) per component (HALF_UP, the
  *     engine's standard float->fixed contract);
  *  2. center without division: c = n*q - S where S = per-dim sum — the
  *     centered value scaled by n, exact in long;
  *  3. covariance (scaled by n^2, which leaves eigenvectors untouched):
  *     C_ij = sum_rows c_i * c_j — long products accumulated in
  *     decimal(38,0), a partial-aggregable d^2-cell Gram aggregate;
  *  4. power iteration on the DRIVER over the collected d x d integer
  *     matrix (the bounded-model precedent of k-means centroids and BPE
  *     merge lists): v_0 = 10^6 * e_1, then t rounds of w = C.v
  *     renormalized to max|v| = 10^6 by sign-preserving truncated
  *     division (BigInt; DuckDB replays in HUGEINT with the same
  *     `sign * (|w| * 10^6 // max)` form — positive-operand floor
  *     division IS truncation, sidestepping the floor-vs-truncate
  *     divergence on negatives);
  *  5. sign canonicalization: flip so the first nonzero component is
  *     positive — power iteration's sign is otherwise arbitrary.
  *
  * Projections are then exact longs: p = sum_i q_i * v_i.
  *
  * Scale (100 TB): the Gram pass explodes n*d^2 products but map-side
  * combine collapses them to d^2 cells per partition before the
  * exchange — the standard distributed covariance shape; d is the
  * PREFIX dimension (matryoshka-style leading slice), chosen small
  * exactly because covariance is quadratic in it. Overflow audit:
  * |q| <= 10^6 requires n < ~10^9 rows for C to fit decimal(38,0)
  * (C <= n^3 * 4*10^12); beyond that drop QScale a decade per 1000x
  * rows — the scaladoc contract, same style as textRank's bound audit.
  * Iteration count is a fixed constant; each driver round is d^2 work
  * on a d x d matrix, never a corpus pass.
  */
object Pca {

  val QScale = 1000000L // component quantization: round(x * 10^6)
  val VScale = 1000000L // eigenvector fixed-point scale: max|v| = 10^6

  /** (id, __i in 1..dims, __q) quantized prefix components. */
  def quantized(vecs: DataFrame, idCol: String, vCol: String,
      dims: Int): DataFrame =
    vecs.select(col(idCol).as("__id"),
        posexplode(expr(s"slice($vCol, 1, $dims)")))
      .select(col("__id"), (col("pos") + 1).as("__i"),
        round(col("col").cast("double") * QScale, 0).cast("long").as("__q"))

  /** Exact covariance cells (i, j, m) of the centered quantized prefix,
    * scaled by n^2 — decimal(38,0), d^2 rows.
    */
  def covarianceCells(q: DataFrame): DataFrame = {
    val tot = q.groupBy(col("__i"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__nn"))
    val cen = q.join(broadcast(tot), Seq("__i"))
      .select(col("__id"),  col("__i"),
        (col("__nn") * col("__q") - col("__s")).as("__c"))
    cen.select(col("__id"), col("__i"), col("__c").as("__ci"))
      .join(cen.select(col("__id"), col("__i").as("__j"),
        col("__c").as("__cj")), Seq("__id"))
      .groupBy(col("__i"), col("__j"))
      .agg(sum((col("__ci").cast("decimal(19,0)") * col("__cj"))
        .cast("decimal(38,0)")).as("__m"))
  }

  /** Fixed-point power iteration over an integer matrix: `iters` rounds
    * of multiply + renormalize-to-VScale, then canonicalize the sign so
    * the first nonzero component is positive. Deterministic BigInt —
    * bit-identical to the oracle's HUGEINT replay.
    */
  def powerIterate(cov: Map[(Int, Int), BigInt], dims: Int,
      iters: Int): Array[BigInt] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var v = Array.tabulate(dims)(i => if (i == 0) BigInt(VScale) else BigInt(0))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims) { i =>
        (0 until dims).iterator
          .map(j => cov.getOrElse((i + 1, j + 1), BigInt(0)) * v(j)).sum
      }
      val m = w.iterator.map(_.abs).max
      require(m > 0, "zero matrix-vector product: degenerate covariance")
      v = w.map(x => (if (x.signum < 0) -1 else 1) * (x.abs * VScale / m))
    }
    val lead = v.find(_.signum != 0)
    if (lead.exists(_.signum < 0)) v.map(x => -x) else v
  }

  /** The dominant principal direction of the `dims`-long embedding
    * prefix: (dim 1.., v_q fixed-point at 10^6). Collects only the d x d
    * covariance (bounded model data).
    */
  def principalDirection(vecs: DataFrame, idCol: String, vCol: String,
      dims: Int, iters: Int): Seq[(Int, Long)] = {
    val cells = covarianceCells(quantized(vecs, idCol, vCol, dims))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger))
      .toMap
    val v = powerIterate(cells, dims, iters)
    (1 to dims).map(i => (i, v(i - 1).toLong))
  }

  /** Per-vector exact projection along the dominant direction:
    * (idCol, proj) where proj = sum_i q_i * v_i (long).
    */
  def project(vecs: DataFrame, idCol: String, vCol: String, dims: Int,
      iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dir = principalDirection(vecs, idCol, vCol, dims, iters)
      .toDF("__i", "__v")
    quantized(vecs, idCol, vCol, dims)
      .join(broadcast(dir), Seq("__i"))
      .groupBy(col("__id"))
      .agg(sum(col("__q") * col("__v")).as("proj"))
      .select(col("__id").as(idCol), col("proj"))
  }
}
