package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

/** Scale utilities: salted joins preserve semantics; bucketed tables join
  * without a shuffle.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin matches the plain join row-for-row") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "lv")
    val right = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
    val salted = Scale.saltedJoin(left, right, Seq("k"), saltFactor = 4)
      .select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }

  test("saltedJoin left/semi/anti variants match their plain joins on a skewed key") {
    // key 1 is the hot key; key 9 has no right-side match
    val left = (Seq.fill(50)((1L, "hot")) ++ Seq((2L, "d"), (9L, "z")))
      .toDF("k", "lv")
    val right = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "rv")
    for (jt <- Seq("left", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("k"), jt)
        .collect().map(_.toString).sorted.toSeq
      val salted = Scale.saltedJoin(left, right, Seq("k"), 4, jt)
        .collect().map(_.toString).sorted.toSeq
      assert(salted === plain, s"joinType=$jt")
    }
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(left, right, Seq("k"), 4, "full_outer")
    }
  }

  test("bucketed tables join and aggregate without a shuffle exchange") {
    val wh = TestSpark.tmpDir("warehouse")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, "/root/testdata/sf0.001")
      val c = Tables.customer(spark, "/root/testdata/sf0.001")
      Scale.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_bkt", 4, Seq("o_custkey"))
      Scale.writeBucketed(c.select("c_custkey", "c_name"),
        "cust_bkt", 4, Seq("c_custkey"))

      val joined = spark.table("orders_bkt").join(
        spark.table("cust_bkt"),
        col("o_custkey") === col("c_custkey"))
      assert(joined.count() > 0)
      // The join reads co-located buckets: no Exchange in the plan.
      assert(Scale.isShuffleFree(
        joined.select("o_orderkey", "c_name")),
        joined.queryExecution.executedPlan.toString)

      // Aggregation on the bucket key is also shuffle-free.
      val agg = spark.table("orders_bkt").groupBy("o_custkey")
        .agg(sum("o_totalprice"))
      assert(agg.count() > 0)
      assert(Scale.isShuffleFree(agg),
        agg.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS cust_bkt")
    }
  }

  test("zero-norm embeddings match nothing and never win a top-k") {
    val v = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // the zero vector must not appear in any near-dup pair (NaN sim would
    // have passed every >= threshold predicate)
    val pairs = graft.functions.Vec.cosineNearDupPairs(v, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // and must not displace a real neighbor in a descending top-k
    val topk = graft.functions.Vec.bruteForceTopK(
        v.filter($"vec_id" === 1), v, k = 1)
      .select("neighbor_id").head().getLong(0)
    assert(topk === 2L) // not the zero vector
  }

  test("embedding near-dup: LSH-blocked pairs are a subset of exact pairs") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = graft.functions.Vec.cosineNearDupPairs(emb, 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.functions.Vec.lshNearDupPairs(emb, 0.3, nBits = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact))
    assert(exact.nonEmpty)
  }

  test("multi-probe LSH: recall strictly contains the single-bucket " +
      "path, stays a subset of exact, no duplicate pairs") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = pairSet(
      graft.functions.Vec.cosineNearDupPairs(emb, 0.3)).toSet
    val single = pairSet(
      graft.functions.Vec.lshNearDupPairs(emb, 0.3, nBits = 4)).toSet
    val multiSeq = pairSet(
      graft.functions.Vec.lshMultiProbePairs(emb, 0.3, nBits = 4))
    val multi = multiSeq.toSet
    assert(multiSeq.size == multi.size, "duplicate pairs emitted")
    assert(single.subsetOf(multi),
      s"multi-probe lost single-bucket pairs: ${single -- multi}")
    assert(multi.subsetOf(exact))
    assert(multi.size > single.size,
      s"no recall gain: multi ${multi.size} vs single ${single.size}")
  }
}
