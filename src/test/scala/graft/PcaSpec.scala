package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pca

/** Exact-arithmetic PCA: planted-direction recovery, convergence of the
  * fixed-point iteration against a double-precision reference on the
  * same integer covariance, projection exactness, partition determinism,
  * and the sign canonicalization contract.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 8

  /** alpha * u + noise fixture: the planted direction dominates. */
  private def fixture(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val u = Array.tabulate(dims)(i => math.sin(i + 1.0)) // fixed direction
    val norm = math.sqrt(u.map(x => x * x).sum)
    val un = u.map(_ / norm)
    (0 until n).map { r =>
      val a = rnd.nextGaussian() * 2.0
      r.toLong -> Array.tabulate(dims)(i =>
        (a * un(i) + rnd.nextGaussian() * 0.1).toFloat)
    }
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("recovers a planted dominant direction") {
    val df = fixture(400, 11).toDF("vec_id", "embedding")
    val v = Pca.principalDirection(df, "vec_id", "embedding", dims, iters = 8)
      .map(_._2.toDouble).toArray
    val u = Array.tabulate(dims)(i => math.sin(i + 1.0))
    assert(math.abs(cosine(v, u)) > 0.99,
      s"cosine ${cosine(v, u)} vs planted direction")
  }

  test("fixed-point iteration matches a double-precision reference") {
    val df = fixture(300, 23).toDF("vec_id", "embedding")
    val cells = Pca.covarianceCells(
        Pca.quantized(df, "vec_id", "embedding", dims))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigInt(r.getDecimal(2).toBigInteger))
      .toMap
    val vq = Pca.powerIterate(cells, dims, iters = 8).map(_.toDouble)
    // double-precision power iteration, 60 rounds, on the same matrix
    var v = Array.tabulate(dims)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to 60) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j =>
          cells.getOrElse((i + 1, j + 1), BigInt(0)).toDouble * v(j)).sum)
      val m = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / m)
    }
    assert(math.abs(cosine(vq, v)) > 0.999,
      s"fixed-point drifted: cosine ${cosine(vq, v)}")
  }

  test("projection is the exact quantized dot product") {
    val rows = fixture(50, 5)
    val df = rows.toDF("vec_id", "embedding")
    val dir = Pca.principalDirection(df, "vec_id", "embedding", dims, 8)
      .map(_._2).toArray
    val got = Pca.project(df, "vec_id", "embedding", dims, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, emb) =>
      val expect = emb.take(dims).zip(dir).map { case (x, v) =>
        BigDecimal(x.toDouble * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong * v
      }.sum
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("partition-deterministic and sign-canonical") {
    val df = fixture(200, 31).toDF("vec_id", "embedding")
    val a = Pca.principalDirection(df, "vec_id", "embedding", dims, 8)
    val b = Pca.principalDirection(df.repartition(13), "vec_id", "embedding",
      dims, 8)
    assert(a == b)
    assert(a.map(_._2).find(_ != 0L).exists(_ > 0L),
      "first nonzero component must be positive")
  }
}
