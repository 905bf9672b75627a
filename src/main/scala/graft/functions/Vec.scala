package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity operators over `array<float>` embedding columns:
  * exact cosine, brute-force top-k, and random-hyperplane LSH bucketing as
  * the approximate/scale path.
  *
  * Floats are promoted to double *before* any arithmetic so every engine
  * (and the DuckDB oracle) computes bit-identical sums: float->double is
  * exact, and the left-fold summation order is fixed by the higher-order
  * `aggregate` on both sides.
  */
object Vec {

  /** Dot product in double precision (per-row lambda, no shuffle). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to `scale` places for cross-engine
    * comparisons (pass scale < 0 to skip rounding).
    */
  def cosine(a: Column, b: Column, scale: Int = 6): Column = {
    val c = dot(a, b) / (norm(a) * norm(b))
    if (scale >= 0) round(c, scale) else c
  }

  /** Brute-force exact top-k cosine neighbors of each query vector.
    * The query set is broadcast (it is the small side by construction), so
    * the corpus streams through a single map stage — no shuffle until the
    * tiny per-query top-k window. Ranking orders by (similarity desc, id)
    * for determinism.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane sign for (component i, plane j):
    * multiplicative scrambling, ±1. Pure integer arithmetic so the oracle
    * reproduces it.
    */
  def rpSign(i: Column, j: Column): Column =
    when(((i + 1) * lit(2654435761L) + (j + 1) * lit(40503L)) % 65536 < 32768,
      lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (`nBits`-bit) per vector — the scale
    * path for ANN: vectors are bucketed in one map-only pass; search probes
    * only the query's bucket. Projection j = sum_i sign(i,j) * v_i.
    */
  def rpLshBucket(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => rpSign(i, lit(j)) * v.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed approximate top-k: brute force within each LSH bucket.
    * Recall is tunable via nBits (fewer bits = bigger buckets = higher
    * recall, more compute).
    */
  def lshTopK(vecs: DataFrame, k: Int, nBits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = vecs.select(col(idCol), col(vecCol),
      rpLshBucket(col(vecCol), nBits).as("bucket"))
    val a = b.select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = b.select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = a.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
