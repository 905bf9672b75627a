package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Pack, Text}

/** Sequence packing: hand-computed unshuffled layout, the full-sequence
  * and coverage invariants on the real corpus, determinism of the
  * shuffled order, and the zero-token drop contract.
  */
class PackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unshuffled layout is the exact concat-and-chunk arithmetic") {
    // sizes 5, 3, 4 at L=4: stream offsets 0, 5, 8
    // doc 1 [0,5) -> seq0 [0,4) tok[0,4), seq1 [4,5) tok[4,5)
    // doc 2 [5,8) -> seq1 tok[0,3) at off 1
    // doc 3 [8,12) -> seq2 tok[0,4) at off 0
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L)).toDF("id", "n")
    val got = Pack.concatChunk(docs, "id", "n", seqLen = 4,
        shuffled = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (1L, 0L) -> ((0L, 4L, 0L)),
      (1L, 1L) -> ((4L, 5L, 0L)),
      (2L, 1L) -> ((0L, 3L, 1L)),
      (3L, 2L) -> ((0L, 4L, 0L))))
  }

  test("corpus invariants: full coverage, every non-final sequence " +
      "exactly full, in-sequence spans disjoint and contiguous") {
    val L = 64L
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n"))
    val rows = Pack.concatChunk(docs, "doc_id", "n", L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nTok = docs.filter(col("n") > 0).agg(sum("n")).head().getLong(0)
    // coverage: each doc's overlap spans sum to its token count
    val byDoc = rows.groupBy(_._1).view
      .mapValues(_.map(t => t._4 - t._3).sum).toMap
    val expected = docs.filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == expected)
    // every sequence except the last is exactly full; the last holds
    // the remainder
    val bySeq = rows.groupBy(_._2).view
      .mapValues(_.map(t => t._4 - t._3).sum).toMap
    val lastSeq = bySeq.keys.max
    assert(bySeq.filterNot(_._1 == lastSeq).values.forall(_ == L),
      bySeq.filterNot(_._2 == L).toString)
    assert(bySeq(lastSeq) == (nTok - lastSeq * L))
    // in-sequence placement: spans tile [0, fill) without gap/overlap
    for ((seq, rs) <- rows.groupBy(_._2)) {
      val spans = rs.map(t => (t._5, t._5 + (t._4 - t._3))).sortBy(_._1)
      assert(spans.head._1 == 0L, s"seq $seq starts at ${spans.head._1}")
      for (w <- spans.toSeq.sliding(2) if w.length == 2)
        assert(w(0)._2 == w(1)._1, s"seq $seq gap/overlap: $w")
    }
    // deterministic: the shuffled order is a fixed permutation
    val again = Pack.concatChunk(docs, "doc_id", "n", L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.sortBy(t => (t._2, t._5)).toSeq ==
      again.sortBy(t => (t._2, t._5)).toSeq)
  }

  test("zero-token documents emit no rows") {
    val docs = Seq((1L, 0L), (2L, 3L)).toDF("id", "n")
    val got = Pack.concatChunk(docs, "id", "n", 8, shuffled = false)
      .collect()
    assert(got.map(_.getLong(0)).toSet == Set(2L))
  }
}
