package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Rank, TextIndex}

/** Postings index: indexed BM25 must be bit-identical to the scan-path
  * scorer over the same corpus, and a query must read only its terms'
  * bucket partitions (pruning at listing time — the index property).
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val query = SparkEntry.bm25Query

  test("indexed BM25 matches the scan-path scorer bit-for-bit") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val path = TestSpark.tmpDir("postings")
    TextIndex.writePostingsIndex(docs, path, nBuckets = 8)
    val indexed = TextIndex.bm25Indexed(spark, path, query, 20)
      .select("doc_id", "n_terms", "score_q", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val scanned = Rank.bm25TopDocs(docs, "doc_id", "text", query, 20)
      .select("doc_id", "n_terms", "score_q", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(indexed.nonEmpty)
    assert(indexed.toSeq == scanned.toSeq)
  }

  test("a query reads only its terms' bucket partitions") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val path = TestSpark.tmpDir("postings2")
    val nBuckets = 8
    TextIndex.writePostingsIndex(docs, path, nBuckets)
    // All buckets materialized? (31-word vocab over 8 buckets: expect
    // most; the assertion only needs MORE than the query's share.)
    val allParts = spark.read.parquet(s"$path/postings")
      .select("bucket").distinct().count()
    assert(allParts > query.size)
    val expected = query.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("b"))
      .distinct().as[Long].collect().toSet
    val pruned = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(expected.toSeq: _*))
      .filter(col("term").isin(query: _*))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("bucket"),
      scan.metadata.toString)
    assert(scan.selectedPartitions.partitionCount == expected.size,
      s"expected ${expected.size} of $allParts partitions, " +
        s"got ${scan.selectedPartitions.partitionCount}")
  }

  test("streaming append: new docs retrievable, exactly once, replay-safe") {
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = all.filter(col("doc_id") >= 10)
    val path = TestSpark.tmpDir("postidx")
    TextIndex.writePostingsIndex(base, path, nBuckets = 8)
    val basePostings = spark.read.parquet(s"$path/postings").count()
    val frozenMeta = spark.read.parquet(s"$path/meta")
      .select("n_docs", "t_tokens").as[(Long, Long)].head()

    val streamDir = TestSpark.tmpDir("postnew")
    all.filter(col("doc_id") < 10).select("doc_id", "text")
      .write.mode("overwrite").parquet(streamDir)
    val ckpt = TestSpark.tmpDir("postckpt")
    TextIndex.streamAppend(spark, path, streamDir, ckpt).awaitTermination()

    // Appended postings are exactly the new docs' tf rows.
    val after = spark.read.parquet(s"$path/postings")
    val newTf = all.filter(col("doc_id") < 10)
      .select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).count()
    assert(after.count() == basePostings + newTf)
    // New docs surface in retrieval (doc < 10 retrievable via a term it
    // contains), and meta stays frozen at build-time totals.
    val term0 = all.filter(col("doc_id") === 0)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .as[String].head()
    val hits = TextIndex.bm25Indexed(spark, path, Seq(term0), 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(hits.contains(0L))
    assert(spark.read.parquet(s"$path/meta")
      .select("n_docs", "t_tokens").as[(Long, Long)].head() == frozenMeta)

    // Same checkpoint: no-op. Fresh checkpoint: anti-join guard holds.
    TextIndex.streamAppend(spark, path, streamDir, ckpt).awaitTermination()
    assert(spark.read.parquet(s"$path/postings").count() == basePostings + newTf)
    val ckpt2 = TestSpark.tmpDir("postckpt2")
    TextIndex.streamAppend(spark, path, streamDir, ckpt2).awaitTermination()
    assert(spark.read.parquet(s"$path/postings").count() == basePostings + newTf)
    assert(spark.read.parquet(s"$path/lens").count() ==
      spark.read.parquet(s"$path/lens").select("doc_id").distinct().count())
  }

  test("df through the index equals corpus-wide document frequency") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha alpha"),
      (4L, "delta")).toDF("doc_id", "text")
    val path = TestSpark.tmpDir("postings3")
    TextIndex.writePostingsIndex(docs, path, nBuckets = 4)
    val hits = TextIndex.bm25Indexed(spark, path, Seq("alpha"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L, 3L))
    // Same ranking the scan path gives: doc 3 (tf=2, same dl) first.
    val first = TextIndex.bm25Indexed(spark, path, Seq("alpha"), 1)
      .select("doc_id").as[Long].head()
    assert(first == 3L)
  }

  test("phraseSearch: exact sequences only, overlaps count, 0-based pos") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c a b c"),  // two matches, first at 0
      (2L, "a b"),          // prefix only — no match
      (3L, "x a b c y"),    // one match at 1
      (4L, "c b a"),        // all tokens, wrong order
      (5L, "a a a"))        // phrase tokens repeat without the sequence
      .toDF("doc_id", "text")
    val got = TextIndex.phraseSearch(docs, "doc_id", "text",
        Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(1L -> ((2L, 0L)), 3L -> ((1L, 1L))))
    // overlapping occurrences all count: "a a a" vs phrase "a a"
    val over = TextIndex.phraseSearch(docs.filter(col("doc_id") === 5),
        "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(over.toSeq == Seq((2L, 0L)))
  }
}
