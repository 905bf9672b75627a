package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnigramLm
import graft.plans.{UgVocab, Unigram}

/** Unigram-LM segmentation + Viterbi-EM training. The catalog gates the
  * cross-engine DP arithmetic; these specs pin the DP itself against
  * exhaustive enumeration, the deterministic tie-break, the unknown-char
  * fallback, and the trainer's ability to recover planted pieces.
  */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** All segmentations of `word` into vocab pieces (unk chars allowed),
    * as (cost, np, path) triples — exponential, test-sized words only.
    */
  private def enumerate(word: String, costs: Map[String, Long],
      unk: Long): Seq[(Long, Int, String)] = {
    if (word.isEmpty) return Seq((0L, 0, ""))
    val maxLen = costs.keys.map(_.length).max
    (1 to math.min(maxLen, word.length)).flatMap { l =>
      val piece = word.substring(0, l)
      val c = costs.getOrElse(piece, if (l == 1) unk else -1L)
      if (c < 0L) Nil
      else enumerate(word.substring(l), costs, unk).map { case (rc, rn, rp) =>
        (c + rc, rn + 1, if (rp.isEmpty) piece else piece + " " + rp)
      }
    }
  }

  test("Viterbi DP equals exhaustive lexicographic minimum") {
    val costs = UnigramLm.RefCosts
    val words = Seq("customer", "window", "stream", "value", "table",
      "group", "spark", "join", "a", "batch", "merge", "query", "small")
    val v = new UgVocab(costs, 16000L)
    words.foreach { w =>
      val best = enumerate(w, costs, 16000L)
        .minBy { case (c, n, p) => (c, n, p) }
      val (gc, gp) = v.segWord(w)
      assert((gc, gp) == ((best._1, best._3)), s"word $w")
    }
  }

  test("ties on cost and piece count break toward the smaller path") {
    // "abab": pieces "ab"=10, "ba"=10, chars a=7, b=7. Candidates with
    // cost 28, np 3: "a ba b" < "ab ab" has cost 24... construct exact
    // tie: "ab ab" (20, 2) vs char splits (28, 4): min is unique. Force a
    // true tie with two 2-piece covers of "abba": "ab"+"ba" = "ab ba" and
    // "abb"+"a"? Use vocab ab=10, ba=10, abb=13, a=7: "ab ba" cost 20,
    // "abb a" cost 20, both np=2 -> path tie-break picks "ab ba".
    val costs = Map("ab" -> 10L, "ba" -> 10L, "abb" -> 13L, "a" -> 7L,
      "b" -> 99L)
    val v = new UgVocab(costs, 16000L)
    val (c, p) = v.segWord("abba")
    assert(c == 20L)
    assert(p == "ab ba") // "ab ba" < "abb a" bytewise (' ' < 'b')
  }

  test("unknown single characters segment as themselves at unkCost") {
    val costs = Map("ab" -> 10L, "a" -> 7L, "b" -> 7L)
    val v = new UgVocab(costs, 500L)
    val (c, p) = v.segWord("axb")
    assert(p == "a x b")
    assert(c == 7L + 500L + 7L)
  }

  test("column expressions match UgVocab directly") {
    val v = new UgVocab(UnigramLm.RefCosts, 16000L)
    val words = Seq("customer", "window", "spark")
    val rows = words.toDF("w")
      .select(col("w"), Unigram.wordStats(col("w"), UnigramLm.RefCosts).as("st"),
        Unigram.wordPieces(col("w"), UnigramLm.RefCosts).as("ps"))
      .collect()
    rows.foreach { r =>
      val (c, p) = v.segWord(r.getString(0))
      val st = r.getSeq[Long](1)
      assert(st(1) == c)
      assert(r.getSeq[String](2).mkString(" ") == p)
      assert(st(0) == (if (p.isEmpty) 0L else p.count(_ == ' ') + 1L))
    }
  }

  test("Viterbi-EM recovers planted pieces and is partition-deterministic") {
    // Corpus words are concatenations of the true pieces "ab" and "cde";
    // EM must assign them dominant mass, and segmentation under the
    // learned costs must recover the planted factorization.
    val corpus = (Seq.fill(40)("abcde") ++ Seq.fill(30)("cdeab") ++
      Seq.fill(20)("ababcde") ++ Seq.fill(10)("cdecde"))
    val docs = corpus.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val learned = UnigramLm.learn(docs, "text", maxPieceLen = 3,
      vocabSize = 12, rounds = 4, seedSize = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPiece = learned.map(t => t._1 -> t._2).toMap
    val top = learned.filter(_._2 > 0L).sortBy(t => (-t._2, t._1)).map(_._1)
    assert(Set("ab", "cde").subsetOf(top.take(4).toSet),
      s"planted pieces not dominant: ${learned.toSeq}")
    assert(byPiece("ab") > byPiece.getOrElse("abc", 0L))

    val costs = learned.map(t => t._1 -> t._3).toMap
    val v = new UgVocab(costs, 16000L)
    assert(v.segWord("abcde")._2 == "ab cde")
    assert(v.segWord("ababcde")._2 == "ab ab cde")

    val learned2 = UnigramLm.learn(docs.repartition(7), "text",
      maxPieceLen = 3, vocabSize = 12, rounds = 4, seedSize = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(learned.toSeq == learned2.toSeq)
  }
}
