package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Classifier

/** Batch-perceptron training: separable concepts converge, arithmetic
  * matches an independent driver-side model exactly, bias covers
  * zero-token docs, and the result is partitioning-invariant.
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic stand-in for scalatestplus forAll (not on the
    * classpath; same scheme as PropertySpec): 8 fixed seeds.
    */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 8).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  test("separable disjoint-vocab classes reach zero training error") {
    // class +1 speaks {pos1..pos4}, class -1 speaks {neg1..neg4}:
    // linearly separable over presence buckets by construction
    val docs = ((1L to 20L).map(i => (i, s"pos1 pos2 pos${1 + i % 4}")) ++
      (21L to 50L).map(i => (i, s"neg1 neg2 neg${1 + i % 4}"))).toDF("doc_id", "text")
    val labels = docs.select($"doc_id",
      when($"doc_id" <= 20L, 1L).otherwise(-1L).as("y"))
    val out = Classifier.perceptronScores(docs, "doc_id", "text", labels,
      nBuckets = 32, rounds = 12)
    assert(out.count() === 50L)
    assert(out.filter($"predicted" =!= $"y").count() === 0L)
    // margins separate strictly: every positive score > 0, negative <= 0
    assert(out.filter($"y" === 1L && $"score" <= 0L).count() === 0L)
    assert(out.filter($"y" === -1L && $"score" > 0L).count() === 0L)
    // bit-identical under a different input partitioning
    val out2 = Classifier.perceptronScores(docs.repartition(7), "doc_id",
      "text", labels, nBuckets = 32, rounds = 12)
    assert(out.except(out2).count() === 0L && out2.except(out).count() === 0L)
  }

  test("zero-token docs are scored through the bias alone") {
    val docs = Seq((1L, "pos pos"), (2L, ""), (3L, "neg")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, -1L)).toDF("doc_id", "y")
    val out = Classifier.perceptronScores(docs, "doc_id", "text", labels,
      nBuckets = 8, rounds = 3)
    assert(out.count() === 3L) // the empty doc is not dropped
    assert(out.filter($"doc_id" === 2L).count() === 1L)
  }

  test("property: scores equal an independent model on fuzzed corpora") {
    def h(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val B = 16
    val corpusGen: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.choose(3, 8)
      rows <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 6)
        toks <- Gen.listOfN(len, Gen.oneOf("ape", "bee", "cat", "dog"))
        y <- Gen.oneOf(1L, -1L)
      } yield (toks.mkString(" "), y))
    } yield rows.zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
    forAll(corpusGen) { rows =>
      val docs = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
      val labels = rows.map(r => (r._1, r._3)).toDF("doc_id", "y")
      val rounds = 4
      val got = Classifier.perceptronScores(docs, "doc_id", "text", labels,
          nBuckets = B, rounds = rounds)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("y"), r.getAs[Long]("score"),
            r.getAs[Long]("predicted")))).toMap
      // independent driver-side model: presence buckets + bias(-1)
      val feats: Map[Long, Map[Long, Long]] = rows.map { case (id, t, _) =>
        val bks = t.split("\\s+").filter(_.nonEmpty)
          .map(tok => math.floorMod(h(tok), B.toLong)).toSet
        id -> (bks.map(_ -> 1L).toMap + (-1L -> 1L))
      }.toMap
      val ys = rows.map(r => r._1 -> r._3).toMap
      var w = Map.empty[Long, Long].withDefaultValue(0L)
      var done = false
      for (_ <- 1 to rounds if !done) {
        val mis = rows.map(_._1).filter { id =>
          val s = feats(id).map { case (b, c) => w(b) * c }.sum
          ys(id) * s <= 0
        }
        if (mis.isEmpty) done = true
        else for (id <- mis; (b, c) <- feats(id))
          w = w.updated(b, w(b) + ys(id) * c)
      }
      val expected = rows.map { case (id, _, y) =>
        val s = feats(id).map { case (b, c) => w(b) * c }.sum
        id -> ((y, s, if (s > 0) 1L else -1L))
      }.toMap
      assert(got === expected)
    }
  }

  test("giniStump: perfect split, hand-computed impurity, no-split row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // separable: pos {1,2} | neg {3,4} -> threshold 2, impurity 0,
    // root gini = (16-4-4)/16 = 1/2
    val sep = Seq((1L, "p"), (2L, "p"), (3L, "n"), (4L, "n"))
      .toDF("v", "c")
    val s = Classifier.giniStump(sep, "v", col("c") === "p").collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3),
      s.getLong(4)) == ((2L, 2L, 2L, 0L, 500000L)))
    // mixed: (1,p),(1,n),(2,p): only split at 1 -> nl=2 nr=1,
    // imp = (4-1-1)*1 / (3*2*1) = 1/3; root = (9-4-1)/9 = 4/9
    val mixed = Seq((1L, "p"), (1L, "n"), (2L, "p")).toDF("v", "c")
    val m = Classifier.giniStump(mixed, "v", col("c") === "p").collect()(0)
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3),
      m.getLong(4)) == ((1L, 2L, 1L, 333333L, 444444L)))
    // one distinct value: no candidate split -> the root-only row
    val const = Seq((7L, "p"), (7L, "n")).toDF("v", "c")
    val n = Classifier.giniStump(const, "v", col("c") === "p").collect()(0)
    assert(n.isNullAt(0) && n.getLong(1) == 2L && n.getLong(2) == 0L)
    assert(n.isNullAt(3) && n.getLong(4) == 500000L)
  }
}
