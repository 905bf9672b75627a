package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPipeline

/** End-to-end corpus curation over the real documents table. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("curate: stages shrink monotonically and kill planted near-dups") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = docs.count()
    // Plant an exact duplicate and a near-duplicate of doc 0.
    val d0 = docs.filter($"doc_id" === 0).head()
    val nearDupText = d0.getAs[String]("text").replaceFirst("the", "thee")
    assert(nearDupText !== d0.getAs[String]("text"),
      "fixture assumption: doc 0 contains 'the' so the plant is a NEAR dup")
    val planted = Seq(
      (9001L, d0.getAs[String]("text"), "xx", "plant", 0L),
      (9002L, nearDupText, "xx", "plant", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val input = docs.unionByName(planted)

    val (curated, stats) = CorpusPipeline.curate(input)
    val s = stats.head()
    val (nIn, nGated, nExact, nCur) = (s.getLong(0), s.getLong(1),
      s.getLong(2), s.getLong(3))
    assert(nIn === nDocs + 2)
    assert(nGated <= nIn)
    assert(nExact === nGated - 1) // the exact clone of doc 0 dropped
    assert(nCur < nExact) // near-dup removal bites (planted + natural dups)
    // doc 0 survives (smallest id of its dup group); plants do not.
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(0L))
    assert(!ids.contains(9001L))
    assert(!ids.contains(9002L))
    // deterministic: same input -> same output
    val (curated2, _) = CorpusPipeline.curate(input)
    assert(curated2.select("doc_id").as[Long].collect().toSet === ids)
    // every curated doc carries a held-out split, assigned AFTER dedup
    assert(curated.columns.contains("split"))
    val splits = curated.select("split").distinct()
      .as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(curated.filter($"split".isNull).count() === 0)
    // split assignment is id-deterministic across runs
    val s1 = curated.select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = curated2.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 === s2)
  }

  test("exact dedup survives a real polynomial-hash collision") {
    import spark.implicits._
    // these two distinct texts share polyHash mod 1e9+7 (= 633477840,
    // found by brute force) — single-hash dedup would silently drop one
    val input = Seq(
      (1L, "doc 1026088 text"),
      (2L, "doc 2400600 text"),
      (3L, "doc 1026088 text")) // true duplicate of 1
      .toDF("doc_id", "text")
    val out = CorpusPipeline.exactDedup(CorpusPipeline.annotate(input))
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 2L)) // collision pair both kept; dup dropped
  }

  test("stream-stream join matches events within the time window") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDF().toDF("user_c", "ts_c")
    val b = buys.toDF().toDF("user_b", "ts_b", "amount")
    val joined = graft.streaming.StreamingMedallion.streamStreamJoin(
      c, b, "ts_c", "ts_b", "10 seconds",
      expr("user_c = user_b AND ts_b >= ts_c AND ts_b <= ts_c + interval 5 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    buys.addData((1L, ts("2024-01-01 00:02:00"), 9.99),   // within window
      (2L, ts("2024-01-01 00:30:00"), 5.0))               // outside window
    q.processAllAvailable()
    val out = spark.table("ssj_out").select("user_c", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out === Set((1L, 9.99)))
    q.stop()
  }
}
