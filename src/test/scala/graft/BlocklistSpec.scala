package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AhoCorasick, Blocklist}

/** Aho–Corasick blocklist screening: bit-for-bit agreement with the naive
  * OR-of-contains form on the classic fail-link fixtures, randomized
  * fuzzing, and the Spark column path (codegen + null handling).
  */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveMask(s: String, ps: Seq[String]): Long =
    ps.zipWithIndex.foldLeft(0L) { case (m, (p, i)) =>
      if (s.contains(p)) m | (1L << i) else m
    }

  test("the classic he/she/his/hers fail-link case") {
    val ps = Seq("he", "she", "his", "hers")
    val ac = new AhoCorasick(ps)
    // "ushers" contains she, he, hers — but not his
    assert(ac.presenceMask("ushers") === naiveMask("ushers", ps))
    assert(ac.presenceMask("ushers") === (1L | 2L | 8L))
    assert(ac.presenceMask("this") === naiveMask("this", ps))
    assert(ac.presenceMask("") === 0L)
  }

  test("overlapping and nested phrases are all reported") {
    val ps = Seq("aba", "ba", "abab", "x")
    val ac = new AhoCorasick(ps)
    for (s <- Seq("abab", "aba", "bab", "ababab", "abba", "xx", "")) {
      assert(ac.presenceMask(s) === naiveMask(s, ps), s"text '$s'")
    }
  }

  test("fuzz: automaton equals OR-of-contains on random small strings") {
    val ps = Seq("ab", "bc", "abc", "ca", "aaa", "cb")
    val ac = new AhoCorasick(ps)
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val s = (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
      assert(ac.presenceMask(s) === naiveMask(s, ps), s"text '$s'")
    }
  }

  test("early exit returns the full mask once every phrase is seen") {
    val ps = Seq("a", "b")
    val ac = new AhoCorasick(ps)
    assert(ac.fullMask === 3L)
    assert(ac.presenceMask("ab" + "z" * 1000) === 3L)
  }

  test("phrase-count and empty-phrase contracts") {
    intercept[IllegalArgumentException] {
      new AhoCorasick(Seq.fill(65)("x"))
    }
    intercept[IllegalArgumentException] { new AhoCorasick(Seq("a", "")) }
    intercept[IllegalArgumentException] { new AhoCorasick(Seq.empty) }
  }

  test("Spark column path: codegen mask equals driver scan, null-safe") {
    val ps = Seq("quick brown", "lazy dog", "absent")
    val docs = Seq(
      (1L, Some("the quick brown fox jumps over the lazy dog")),
      (2L, Some("nothing to see")),
      (3L, Option.empty[String])
    ).toDF("id", "text")
    val got = docs.select(col("id"),
        Blocklist.blocklistMask(col("text"), ps).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -99L else r.getLong(1))).toMap
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> -99L))
  }
}
