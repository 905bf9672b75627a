package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Lines, Text}

/** Line-granular hygiene: the Gopher duplicate-line/n-gram repetition
  * signals against hand-computed fixtures, and corpus-wide keep-first
  * line dedup semantics (first occurrence survives, later copies drop,
  * reconstruction preserves order, fully-duplicated docs keep '').
  */
class LinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lineSignals: duplicate line and char fractions, hand-computed") {
    // lines (lineLen=2): ["a b","c d","a b","e"] — "a b" repeats once.
    // n=4, distinct=3, chars: 3+3+3+1=10, distinct chars 3+3+1=7.
    val df = Seq((1L, "a b c d a b e")).toDF("doc_id", "text")
      .select(col("doc_id"),
        Lines.lineSignals(Text.tokenLines(Text.tokens(col("text")), 2))
          .as("s"))
      .select(col("doc_id"), col("s.*"))
    val r = df.as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((1L, 4L, 1L, 0.25, 3.0 / 10.0)))
  }

  test("lineSignals: clean and empty docs are zero") {
    val df = Seq((1L, "a b c d"), (2L, "   ")).toDF("doc_id", "text")
      .select(col("doc_id"),
        Lines.lineSignals(Text.tokenLines(Text.tokens(col("text")), 2))
          .as("s"))
      .select(col("doc_id"), col("s.*"))
      .orderBy(col("doc_id"))
    assert(df.as[(Long, Long, Long, Double, Double)].collect().toSeq ==
      Seq((1L, 2L, 0L, 0.0, 0.0), (2L, 0L, 0L, 0.0, 0.0)))
  }

  test("ngramRepetitionStats: top 2-gram mass and repeated 3-gram mass") {
    // "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] → "x y"×3 (len 3,
    // mass 9), "y x"×2 (mass 6) → top2 = 9. 3-grams = [x y x, y x y,
    // x y x, y x y] → both repeat, dup3 = 2*5 + 2*5 = 20. chars = 11.
    val df = Lines.ngramRepetitionStats(
      Seq((1L, "x y x y x y"), (2L, "all distinct tokens here now"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy(col("doc_id"))
      .select("doc_id", "n_chars", "top2_mass", "dup3_mass", "top2_frac",
        "dup3_frac")
    val rows = df.as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, 11L, 9L, 20L, 9.0 / 11.0, 20.0 / 11.0),
      (2L, 28L, 0L, 0L, 0.0, 0.0)))
  }

  test("compiled lineSignalsText equals the HOF reference on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val hof = docs.select(col("doc_id"),
        Lines.lineSignals(Text.tokenLines(Text.tokens(col("text")), 10))
          .as("s"))
      .select(col("doc_id"), col("s.*"))
    val compiled = docs.select(col("doc_id"),
        Lines.lineSignalsText(col("text"), 10).as("s"))
      .select(col("doc_id"), col("s.*"))
    assert(hof.exceptAll(compiled).count() === 0L)
    assert(compiled.exceptAll(hof).count() === 0L)
    // the dirty (appendFirst) variant against the composed array form
    val dirtyHof = docs.select(col("doc_id"),
        Lines.lineSignals({
          val ln = Text.tokenLines(Text.tokens(col("text")), 10)
          when(size(ln) >= 2, concat(ln, slice(ln, 1, 2))).otherwise(ln)
        }).as("s"))
      .select(col("doc_id"), col("s.*"))
    val dirtyCompiled = docs.select(col("doc_id"),
        Lines.lineSignalsText(col("text"), 10, appendFirst = 2).as("s"))
      .select(col("doc_id"), col("s.*"))
    assert(dirtyHof.exceptAll(dirtyCompiled).count() === 0L)
    assert(dirtyCompiled.exceptAll(dirtyHof).count() === 0L)
  }

  test("compiled ngramRepMass equals the exploded groupBy reference") {
    import graft.plans.TextExpressions
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(200)
    val toks = Text.tokens(col("text"))
    def ref(n: Int) = docs
      .select(col("doc_id"), explode(Text.wordNgrams(toks, n)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .withColumn("m", col("c") * length(col("g")).cast("long"))
    val refTop2 = ref(2).groupBy("doc_id").agg(max("m").as("top2"))
      .as[(Long, Long)].collect().toMap
    val refDup3 = ref(3).groupBy("doc_id").agg(sum("m").as("dup3"))
      .as[(Long, Long)].collect().toMap
    val got = docs.select(col("doc_id"),
        TextExpressions.ngramRepMass(col("text"), 2, 3).as("m"))
      .as[(Long, Seq[Long])].collect()
    got.foreach { case (id, Seq(t2, d3)) =>
      assert(t2 === refTop2.getOrElse(id, 0L), s"top2 doc $id")
      assert(d3 === refDup3.getOrElse(id, 0L), s"dup3 doc $id")
    }
  }

  test("lineDedup keeps first occurrences corpus-wide and reconstructs") {
    // lineLen=2. doc 1: ["a b","c d"]; doc 2: ["a b","e f"] (loses "a b");
    // doc 3: ["a b","c d"] (loses everything → empty clean_text).
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b e f"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Lines.lineDedup(docs, "doc_id", "text", 2)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 2L, 0L, "")))
  }

  test("lineDedup: within-doc repeat keeps only the earlier line") {
    val docs = Seq((7L, "p q r s p q")).toDF("doc_id", "text")
    val out = Lines.lineDedup(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((7L, 3L, 2L, "p q r s")))
  }

  test("hashedTokenLines generator equals the HOF line+fingerprint chain " +
      "on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaGen = docs.select(col("doc_id"),
        graft.plans.TextExpressions.hashedTokenLines(col("text"), 10))
      .select(col("doc_id"), col("line_no"), col("lh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    val viaHof = docs.select(col("doc_id"),
        posexplode(Text.tokenLines(Text.tokens(col("text")), 10)))
      .select(col("doc_id"), col("pos").cast("long"),
        Text.charFingerprint(col("col")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    assert(viaGen == viaHof)
  }

  test("lineDedup: remainder line participates like any other") {
    // doc 1 tail "z" is its own line; doc 2's full line "z" has the same
    // text → dropped as a duplicate of doc 1's remainder.
    val docs = Seq((1L, "a b z"), (2L, "z")).toDF("doc_id", "text")
    val out = Lines.lineDedup(docs, "doc_id", "text", 2)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, "a b z"), (2L, 1L, 0L, "")))
  }
}
