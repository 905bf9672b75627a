package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NaiveBayes
import graft.plans.FixLog

/** FixLog (libm-free fixed-point log2) and the naive-Bayes classifier
  * built on it: bit-exactness of the log, weight-grid arithmetic, and
  * planted-distribution recovery with deterministic tie-breaks.
  */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("log2q: exact integer part, tight deterministic fraction") {
    // powers of two are exact
    (0 to 62).foreach { k =>
      assert(FixLog.log2q(1L << k) == k.toLong * 65536L, s"2^$k")
    }
    // accuracy: within 2^-16 + one ulp of the real log2, always below
    val rnd = new scala.util.Random(3)
    val xs = Seq(3L, 7L, 10L, 1000L, 999983L, Long.MaxValue) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 1000000000L + 1L)
    xs.foreach { x =>
      val got = FixLog.log2q(x) / 65536.0
      val real = math.log(x.toDouble) / math.log(2.0)
      assert(got <= real + 1e-9, s"x=$x overshoot: $got > $real")
      assert(real - got < 3.2e-5, s"x=$x error ${real - got}")
    }
    // monotone on a dense range
    val seq = (1L to 5000L).map(FixLog.log2q)
    assert(seq.zip(seq.tail).forall { case (a, b) => a <= b })
  }

  test("compiled column expression matches the driver arithmetic") {
    val xs = Seq(1L, 2L, 3L, 1000L, 65535L, 65536L, 999999937L)
    val got = xs.toDF("x")
      .select(FixLog.log2qCol(col("x")).as("lq"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == xs.map(FixLog.log2q))
  }

  test("weights: Laplace grid covers class x vocab with exact arithmetic") {
    val docs = Seq(
      ("a a b", "x"), ("a b", "x"),
      ("c c d", "y")).toDF("text", "lang")
    val w = NaiveBayes.weights(
        NaiveBayes.tokenClassCounts(docs, "text", "lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(w.size == 8) // 2 classes x 4 vocab
    // class x: tokens a:3 b:2, N_x=5, V=4 -> denominator 9
    assert(w(("x", "a")) ==
      (3L, FixLog.log2q(4L) - FixLog.log2q(9L)))
    assert(w(("x", "c")) ==
      (0L, FixLog.log2q(1L) - FixLog.log2q(9L)))
    // class y: c:2 d:1, N_y=3 -> denominator 7
    assert(w(("y", "c")) ==
      (2L, FixLog.log2q(3L) - FixLog.log2q(7L)))
  }

  test("classify recovers planted class distributions") {
    val rnd = new scala.util.Random(17)
    // class p emits mostly {red, blue}; class q mostly {green, gold};
    // both share filler tokens
    def doc(cls: String, n: Int): (Long, String, String) = {
      val own = if (cls == "p") Seq("red", "blue") else Seq("green", "gold")
      val toks = (1 to 12).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 6) own(rnd.nextInt(2))
        else Seq("the", "of", "and", "data")(rnd.nextInt(4))
      }
      (n.toLong, toks.mkString(" "), cls)
    }
    val rows = (0 until 60).map(i => doc(if (i % 2 == 0) "p" else "q", i))
    val df = rows.toDF("doc_id", "text", "lang")
    val pred = NaiveBayes.classify(df, df, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val correct = rows.count { case (id, _, cls) => pred(id) == cls }
    assert(correct >= 58, s"only $correct/60 recovered")
    // determinism across partitionings
    val again = NaiveBayes.classify(df.repartition(7), df.repartition(5),
        "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == pred)
  }

  test("tokenClassMi: hand-computed integer MI, class-neutral token low") {
    import graft.plans.FixLog.log2q
    // class x: a:2 c:1; class y: b:1 c:1 — N=5, n_a=2 n_b=1 n_c=2,
    // n_x=3 n_y=2
    val docs = Seq(("a a c", "x"), ("b c", "y")).toDF("text", "lang")
    val got = NaiveBayes.tokenClassMi(docs, "text", "lang", k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val miA = 2L * (log2q(2L * 5L) - log2q(2L * 3L))
    val miB = 1L * (log2q(1L * 5L) - log2q(1L * 2L))
    val miC = (log2q(1L * 5L) - log2q(2L * 3L)) +
      (log2q(1L * 5L) - log2q(2L * 2L))
    assert(got("a") == (2L, miA))
    assert(got("b") == (1L, miB))
    assert(got("c") == (2L, miC))
    // the class-exclusive tokens dominate the shared one
    assert(miA > miC && miB > miC)
  }

  test("ties break to the lexicographically smallest class") {
    // perfectly symmetric classes: every doc scores identically under
    // both -> every prediction must be the smaller class name
    val docs = Seq(("a b", "m"), ("a b", "z")).toDF("text", "lang")
    val score = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val pred = NaiveBayes.classify(docs, score, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "m", 2L -> "m"))
  }
}
