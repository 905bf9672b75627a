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
