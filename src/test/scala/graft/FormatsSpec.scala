package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage: the engine reads and writes every format
  * the pipelines touch (parquet is exercised everywhere else; here:
  * csv, json-lines, multiline json, orc) with schema round-tripping.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def sample = Tables.nation(spark, "/root/testdata/sf0.001")

  test("csv round-trip with header and explicit schema") {
    val dir = TestSpark.tmpDir("fmt_csv")
    sample.write.option("header", "true").csv(s"$dir/t")
    val back = spark.read.option("header", "true").schema(sample.schema)
      .csv(s"$dir/t")
    assert(back.collect().toSet === sample.collect().toSet)
  }

  test("json-lines round-trip") {
    val dir = TestSpark.tmpDir("fmt_json")
    sample.write.json(s"$dir/t")
    val back = spark.read.schema(sample.schema).json(s"$dir/t")
    assert(back.collect().toSet === sample.collect().toSet)
  }

  test("orc round-trip") {
    val dir = TestSpark.tmpDir("fmt_orc")
    sample.write.orc(s"$dir/t")
    val back = spark.read.orc(s"$dir/t")
    assert(back.collect().toSet === sample.collect().toSet)
  }

  test("ivfTopK finds sensible neighbors probing a subset of cells") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    val exact = graft.functions.Vec.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // label is the coarse cell (10 cells); probe 5 of 10.
    val ivf = graft.functions.Vec.ivfTopK(emb, queries, k = 5, nProbe = 5,
        cellCol = "label")
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size === exact.size)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.4, s"recall=$recall")
    // probing every cell must reproduce the exact brute-force result.
    val full = graft.functions.Vec.ivfTopK(emb, queries, k = 5, nProbe = 100,
        cellCol = "label")
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
  }

  test("kmeans: deterministic across partitionings, assignments are nearest") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double)] =
      graft.functions.Vec.kmeans(df, k = 5, iters = 2).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val a = run(emb)
    val b = run(emb.repartition(13))
    assert(a == b) // bit-identical assignments under any partitioning
    val cells = a.values.map(_._1).toSet
    assert(cells.subsetOf((0 until 5).toSet), cells)
    assert(cells.size > 1, "clustering collapsed to one cell on real data")
    // Every point's recorded dist2 is minimal over the surviving cells'
    // final-iteration centroids: rebuild iteration-1 centroids and check
    // one point against all of them.
    val iter1 = graft.functions.Vec.kmeans(emb, k = 5, iters = 1)
    val cents = graft.functions.Vec.groupCentroids(
      emb.join(iter1.select(col("vec_id"), col("cell")), Seq("vec_id"))
        .select(col("cell"), col("embedding")), "cell")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    def d2(x: Seq[Float], c: Seq[Float]): Double = {
      def dot(p: Seq[Float], q: Seq[Float]) =
        p.zip(q).foldLeft(0.0) { case (acc, (u, v)) => acc + u.toDouble * v.toDouble }
      BigDecimal(dot(x, x) - 2.0 * dot(x, c) + dot(c, c))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val best = cents.map { case (cell, c) => (d2(probe, c), cell) }.min
    assert(a(0L) == ((best._2, best._1)), s"got ${a(0L)}, brute $best")
  }

  test("groupCentroids: partitioning-invariant bits, null elements skipped") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def fps(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Float]] =
      graft.functions.Vec.groupCentroids(df, "label").collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // Decimal partial sums: identical bits no matter how rows are split.
    val a = fps(emb)
    val b = fps(emb.repartition(17))
    assert(a == b)
    // A null element contributes to neither the sum nor the divisor.
    import spark.implicits._
    val withNull = Seq(
      (1, Array[java.lang.Float](2.0f, 4.0f)),
      (1, Array[java.lang.Float](4.0f, null))).toDF("label", "embedding")
    val m = fps(withNull.select(col("label"),
      col("embedding").cast("array<float>").as("embedding")))
    assert(m(1) == Seq(3.0f, 4.0f))
  }
}
