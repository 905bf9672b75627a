package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{WordPiece, WpVocab}

/** Greedy WordPiece segmentation: longest-match semantics, UNK fallback,
  * fuzz against an independent reference implementation, and the Spark
  * column path.
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seg(v: WpVocab, w: String): Seq[String] = {
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    v.segment(w, out)
    (0 until out.size).map(i => out.get(i).toString)
  }

  test("longest match wins at every cursor") {
    val v = new WpVocab(Seq("table", "ta", "ble", "b", "l", "e", "t", "a"),
      "[UNK]")
    assert(seg(v, "table") === Seq("table"))
    assert(seg(v, "tab") === Seq("ta", "b"))
    assert(seg(v, "tables") === Seq("table", "[UNK]")) // no 's' in vocab
    assert(seg(v, "bleble") === Seq("ble", "ble"))
  }

  test("UNK consumes exactly one character and scanning continues") {
    val v = new WpVocab(Seq("ab", "c"), "[UNK]")
    assert(seg(v, "zabzc") === Seq("[UNK]", "ab", "[UNK]", "c"))
    assert(seg(v, "zzz") === Seq("[UNK]", "[UNK]", "[UNK]"))
  }

  test("fuzz: greedy result reconstructs the word and matches a reference") {
    val pieces = Seq("aa", "ab", "ba", "aab", "bbb", "a", "b")
    val v = new WpVocab(pieces, "?")
    val set = pieces.toSet
    def ref(w: String): Seq[String] = {
      // independent implementation: recursion on the longest prefix
      if (w.isEmpty) Seq.empty
      else (w.length.min(3) to 1 by -1)
        .collectFirst { case l if set(w.take(l)) => w.take(l) } match {
        case Some(p) => p +: ref(w.drop(p.length))
        case None => "?" +: ref(w.tail)
      }
    }
    val rnd = new scala.util.Random(11)
    (1 to 1000).foreach { _ =>
      val w = (1 to rnd.nextInt(10)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString
      if (w.nonEmpty) {
        val got = seg(v, w)
        assert(got === ref(w), s"word '$w'")
        // non-UNK pieces concatenate back to the word's covered chars
        assert(got.map(p => if (p == "?") "#" else p).mkString.length
          === w.length, s"word '$w' length")
      }
    }
  }

  test("Spark column path tokenizes all words in order, null-safe") {
    val v = Seq("quick", "qu", "ick", "fox", "f", "o", "x")
    val df = Seq((1L, Some("quick fox qufox")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select(col("id"), WordPiece.wordpiece(col("text"), v).as("p"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(rows(1L) === Seq("quick", "fox", "qu", "fox"))
    assert(rows(2L) === null)
  }

  test("vocabulary contracts") {
    intercept[IllegalArgumentException] { new WpVocab(Seq.empty, "u") }
    intercept[IllegalArgumentException] { new WpVocab(Seq("a", ""), "u") }
    intercept[IllegalArgumentException] { new WpVocab(Seq("a", "a"), "u") }
  }
}
