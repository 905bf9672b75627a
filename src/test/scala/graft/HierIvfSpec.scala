package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec

/** Hierarchical (two-level) centroid assignment: full-probe exactness
  * against the flat path, cluster-separated agreement at nProbe = 1,
  * null contract, and the shape contract.
  */
class HierIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecsDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    vecsDf((0L until 300L).map { i =>
      // 3 well-separated clusters around (10,0,..), (0,10,..), (-10,-10,..)
      val base = (i % 3) match {
        case 0 => Array(10f, 0f, 0f, 0f)
        case 1 => Array(0f, 10f, 0f, 0f)
        case _ => Array(-10f, -10f, 0f, 0f)
      }
      i -> base.map(b => b + rnd.nextFloat() * 0.5f).toSeq
    }).localCheckpoint(true)
  }

  private lazy val centroids = {
    // a 24-cell flat codebook trained on the corpus
    Vec.kmeansModel(corpus, k = 24, iters = 2)._2
      .select(col("cell"), col("cvec").as("centroid"))
      .localCheckpoint(true)
  }

  test("probing every super-cell reproduces the flat assignment exactly") {
    val flat = Vec.assignToCentroids(corpus, centroids)
      .select("vec_id", "cell", "dist2").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // kSuper = ceil(sqrt(24)) = 5; nProbe = 5 probes everything
    val hier = Vec.assignToCentroidsHier(corpus, centroids, nProbe = 5)
      .select("vec_id", "cell", "dist2").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(hier == flat)
  }

  test("nProbe = 1 on separated clusters: near-total agreement, " +
      "dist2 never better than flat") {
    val flat = Vec.assignToCentroids(corpus, centroids)
      .select("vec_id", "cell", "dist2").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val hier = Vec.assignToCentroidsHier(corpus, centroids, nProbe = 1)
      .select("vec_id", "cell", "dist2").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(hier.keySet == flat.keySet)
    // the probed argmin can never beat the global argmin
    assert(hier.forall { case (id, (_, d2)) => d2 >= flat(id)._2 })
    // separated clusters: the coarse quantizer respects cluster
    // structure, so the single probe finds the true cell nearly always
    val agree = hier.count { case (id, v) => v == flat(id) }
    assert(agree * 10 >= flat.size * 9, s"only $agree/${flat.size} agree")
  }

  test("null vector elements follow the flat null contract") {
    val withNull = vecsDf(Seq(1L -> Seq(1f, 2f, 3f, 4f)))
      .union(Seq((2L, Seq(Option.empty[Float], Some(2f), Some(3f), Some(4f))))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")))
    val flat = Vec.assignToCentroids(withNull, centroids)
      .select("vec_id", "cell", "dist2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.isNullAt(2))).toSet
    val hier = Vec.assignToCentroidsHier(withNull, centroids, nProbe = 5)
      .select("vec_id", "cell", "dist2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.isNullAt(2))).toSet
    assert(hier == flat)
    assert(hier.exists { case (id, _, isNull) => id == 2L && isNull })
  }
}
