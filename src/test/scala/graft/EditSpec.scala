package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Edit

/** Edit-distance similarity join: the q-gram count filter must be
  * LOSSLESS (plus exact verification), so the whole operator is pinned
  * against driver-side brute force over randomized vocabularies,
  * including the short-string block and the short/long boundary.
  */
class EditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(words: Seq[String], maxDist: Int): Set[(String, String, Int)] =
    (for {
      a <- words; b <- words if a < b
      dd = lev(a, b) if dd <= maxDist
    } yield (a, b, dd)).toSet

  private def viaSpark(words: Seq[String], maxDist: Int,
      q: Int = 2): Set[(String, String, Int)] =
    Edit.editPairs(words.toDF("w"), "w", "w", maxDist, q = q)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("random vocabulary: filtered join equals brute force (d=1)") {
    val rnd = new scala.util.Random(42)
    // small alphabet concentrates near-collisions; lengths 1..9 cross the
    // short/long boundary (shortMax = 3 at q=2, d=1) repeatedly
    val words = Seq.fill(300)(
      (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString).distinct
    val expected = brute(words, 1)
    assert(expected.nonEmpty, "degenerate fixture: no close pairs")
    assert(viaSpark(words, 1) == expected)
  }

  test("random vocabulary: filtered join equals brute force (d=2, q=3)") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(150)(
      (1 to (1 + rnd.nextInt(11))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString).distinct
    val expected = brute(words, 2)
    assert(expected.exists(_._3 == 2), "degenerate fixture: no d=2 pairs")
    assert(viaSpark(words, 2, q = 3) == expected)
  }

  test("short-string block: pairs below the gram bound are not missed") {
    // every len <= 3 at q=2, d=1 — the gram filter is vacuous for all of
    // these; only the short block can find them
    val words = Seq("a", "b", "ab", "ba", "abc", "abd", "xyz")
    assert(viaSpark(words, 1) == brute(words, 1))
    // cross-boundary pair: len 3 vs len 4 must flow through the gram path
    val cross = Seq("abc", "abcd", "abed", "zzzz")
    assert(viaSpark(cross, 1) == brute(cross, 1))
  }

  test("prefix-filtered path equals count-filtered path and brute force") {
    val rnd = new scala.util.Random(71)
    val words = Seq.fill(250)(
      (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString).distinct
    val expected = brute(words, 1)
    assert(expected.nonEmpty)
    val viaPrefix = Edit.editPairsPrefix(words.toDF("w"), "w", "w", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(viaPrefix == expected)
    // d=2 as well — the prefix grows to q*d+1 = 5
    val exp2 = brute(words, 2)
    val viaPrefix2 = Edit.editPairsPrefix(words.toDF("w"), "w", "w", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(viaPrefix2 == exp2)
  }

  test("dfCap drops hub grams and is a documented recall trade") {
    // 'aa' occurs in every word; cap 2 removes it from the index — the
    // pair (aaab, aaac) then shares too few grams and is LOST, which is
    // exactly the documented trade (assert it so the contract is pinned)
    val words = Seq("aaab", "aaac", "aaba")
    val uncapped = viaSpark(words, 1)
    assert(uncapped == brute(words, 1))
    val capped = Edit.editPairs(words.toDF("w"), "w", "w", 1, dfCap = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(capped.subsetOf(uncapped))
  }

  test("damerau: true DL distances (unrestricted transpositions)") {
    import graft.plans.Damerau.distance
    assert(distance("", "") == 0)
    assert(distance("abc", "") == 3 && distance("", "abc") == 3)
    assert(distance("abc", "abc") == 0)
    assert(distance("ab", "ba") == 1)        // one transposition
    assert(distance("recieve", "receive") == 1) // lev would say 2
    // the unrestricted case OSA gets wrong: ca -> ac -> abc
    assert(distance("ca", "abc") == 2)
    assert(distance("abcdef", "abcfed") == 2)
    assert(distance("kitten", "sitting") == 3) // degenerates to lev
  }

  test("damerau: inputs past the 2^20 stamp-packing bound fail loudly") {
    import graft.plans.Damerau.distance
    // the da-table stamp packs the row index into 20 bits; an
    // out-of-contract input must throw, never return a wrong distance
    val big = "a" * (1 << 20)
    val e = intercept[IllegalArgumentException] { distance(big, "b") }
    assert(e.getMessage.contains("stamp-packing"))
    assert(intercept[IllegalArgumentException] { distance("b", big) }
      .getMessage.contains("stamp-packing"))
    // the largest in-contract length still computes (O(n) here: m = 1)
    assert(distance("a" * ((1 << 20) - 1), "a") == (1 << 20) - 2)
  }

  test("damerau column kernel: dl <= lev on every pair, gain counted") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "teh quick brown fox"),   // one transposition
      (3L, "the quick brwon fxo")    // two transpositions
    ).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val got = graft.functions.Dedup.verifyDamerau(cand, docs, "doc_id",
        "text", prefixLen = 80, maxDist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((1L, 2L)) == ((1L, 2L, 1L)))
    assert(got((1L, 3L)) == ((2L, 4L, 2L)))
    assert(got.values.forall { case (dl, lev, gain) =>
      dl <= lev && gain == lev - dl })
  }
}
