package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Eval, NaiveBayes}

/** Classifier evaluation: hand-computed confusion/metrics fixtures,
  * the never-predicted-class row, reliability bucketing, and the
  * margin contract of classifyWithMargin.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val conf = Eval.confusion(
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"), (5L, "b"))
      .toDF("id", "p"),
    "id", "p",
    Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c"), (5L, "b"))
      .toDF("id", "t"),
    "t")

  test("confusion counts the joined (true, pred) cells") {
    val m = conf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "a") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 2L,
      ("c", "a") -> 1L))
  }

  test("classMetrics: exact tp/fp/fn and ppm; unpredicted class rows") {
    val m = Eval.classMetrics(conf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    // a: tp=1 fp=2 fn=0 -> p=1/3, r=1, f1=2/4
    assert(m("a") == ((1L, 2L, 0L, Some(333333L), Some(1000000L),
      Some(500000L))))
    // b: tp=2 fp=0 fn=1 -> p=1, r=2/3, f1=4/5
    assert(m("b") == ((2L, 0L, 1L, Some(1000000L), Some(666667L),
      Some(800000L))))
    // c: never predicted: tp=0 fp=0 fn=1 -> precision NULL, recall 0
    assert(m("c") == ((0L, 0L, 1L, None, Some(0L), Some(0L))))
  }

  test("reliability buckets by truncating division and drops null conf") {
    val pred = Seq((1L, 10L, true), (2L, 19L, false), (3L, 25L, true),
      (4L, 25L, true)).toDF("id", "conf", "ok")
      .union(Seq((5L, Option.empty[Long], true)).toDF("id", "conf", "ok"))
    val r = Eval.reliability(pred, "conf", col("ok"), binWidth = 10L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(1L -> ((2L, 1L, 500000L)), 2L -> ((2L, 2L, 1000000L))))
  }

  test("classifyWithMargin: margin = best minus runner-up, prediction " +
      "matches classify") {
    val docs = Seq((1L, "aa aa bb", "x"), (2L, "cc cc dd", "y"),
      (3L, "aa cc", "x")).toDF("doc_id", "text", "lang")
    val base = NaiveBayes.classify(docs, docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = NaiveBayes.classifyWithMargin(docs, docs, "doc_id", "text",
        "lang")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(3)))).toMap
    assert(m.keySet == base.keySet)
    for ((id, (p, margin)) <- m) {
      assert(p == base(id), s"doc $id prediction drifted")
      assert(margin >= 0L, s"doc $id negative margin $margin")
    }
  }
}
