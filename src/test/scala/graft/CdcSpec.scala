package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cdc
import graft.plans.{CdcColumns, CdcScan, CharGrams, PolyHash}

/** Content-defined chunking + char-gram (chrF) scans: parity with
  * first-principles replays, the boundary-locality property that is
  * CDC's whole point, and the corpus-level chunk-dedup stats.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** First-principles replay: boundary after every w-window whose
    * PolyHash (computed FROM SCRATCH per position, no rolling) has all
    * mask bits set; end of text always closes.
    */
  private def bruteChunks(s: String, w: Int, m: Int): Seq[(Long, Long, Long, Long)] = {
    if (s.isEmpty) return Seq.empty
    val mask = (1L << m) - 1
    val bs = (w to s.length).filter { i =>
      (PolyHash.eval(s.substring(i - w, i)) & mask) == mask
    }
    val all = if (bs.isEmpty || bs.last != s.length) bs :+ s.length else bs
    var prev = 0
    all.zipWithIndex.map { case (e, no) =>
      val r = (no.toLong, (prev + 1).toLong, (e - prev).toLong,
        PolyHash.eval(s.substring(prev, e)))
      prev = e
      r
    }
  }

  private def rows(s: String, w: Int, m: Int): Seq[(Long, Long, Long, Long)] =
    CdcScan.chunks(s, w, m).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("rolling scan == from-scratch window hashes on random text") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(0, 1, 7, 8, 63, 200, 1000)) {
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(rows(s, 8, 4) == bruteChunks(s, 8, 4), s"len=$len")
      assert(rows(s, 16, 5) == bruteChunks(s, 16, 5), s"len=$len w16")
    }
  }

  test("short text (< window) is one whole-text chunk") {
    val s = "tiny"
    assert(rows(s, 16, 5) ==
      Seq((0L, 1L, 4L, PolyHash.eval(s))))
  }

  test("boundary locality: a prefix insertion re-chunks one neighborhood, " +
      "fixed-width chunking re-chunks everything") {
    val rnd = new scala.util.Random(13)
    val s = (0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cdc0 = rows(s, 16, 5).map(_._4)
    val cdc1 = rows("INSERTED-HEAD-" + s, 16, 5).map(_._4)
    // every chunk of the original except (at most) the head neighborhood
    // survives the insertion with an identical identity
    val kept = cdc0.count(cdc1.toSet)
    assert(kept >= cdc0.length - 2,
      s"CDC kept $kept of ${cdc0.length} chunks")
    // the fixed-width strawman: every 32-char block shifts
    def fixed(t: String) = t.grouped(32).map(PolyHash.eval).toSeq
    val f0 = fixed(s)
    val fKept = f0.count(fixed("INSERTED-HEAD-" + s).toSet)
    assert(fKept <= f0.length / 4,
      s"fixed-width kept $fKept of ${f0.length} — should shift almost all")
  }

  test("chunkStats finds the span duplicated across documents") {
    val shared = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val docs = Seq(
      (1L, s"$shared completely different tail material here"),
      (2L, s"unrelated head content first $shared"),
      (3L, "nothing shared with the others at all in this one"))
      .toDF("doc_id", "text")
    val stats = Cdc.chunkStats(docs, "doc_id", "text", w = 16,
      maskBits = 4, minOcc = 2L).collect()
    assert(stats.nonEmpty, "shared span must yield >= 1 duplicated chunk")
    assert(stats.forall(_.getAs[Long]("n_occ") >= 2L))
    assert(stats.exists(_.getAs[Long]("n_docs") == 2L))
    // generator agrees with the scan replay doc by doc
    val g = docs.select(col("doc_id"),
        CdcColumns.cdcChunks(col("text"), 16, 4))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    val expect = Seq(1L, 2L, 3L).flatMap { id =>
      val t = docs.filter(col("doc_id") === id)
        .select(col("text")).as[String].head()
      bruteChunks(t, 16, 4).map(c => (id, c._1, c._2, c._3, c._4))
    }.toSet
    assert(g == expect)
  }

  test("CharGrams multiset packing: occurrence-indexed, sorted, " +
      "intersection = sum of least counts") {
    val a = CharGrams.gramSet("abcabc", 3).toLongArray().toSeq
    // grams: abc, bca, cab, abc -> abc twice (occ 1,2), bca, cab once
    assert(a.length == 4)
    val h = PolyHash.eval("abc")
    assert(a.count(v => v >> 20 == h) == 2)
    assert(a == a.sorted)
    // multiset intersection via array_intersect == sum(least(counts))
    val b = CharGrams.gramSet("abcabcabc", 3).toLongArray().toSeq
    assert(b.intersect(a).length == 4) // abc x2 + bca + cab... abc caps at 2
  }

  test("chrF: hand-computed 3-gram F2, whitespace stripped") {
    val docs = Seq((1L, "ab c ab"), (2L, "abcb")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = graft.functions.Eval.chrF(pairs, docs, "doc_id", "text", n = 3)
      .collect()(0)
    // cand "abcab": abc bca cab (3 grams); ref "abcb": abc bcb (2)
    // overlap = 1 (abc); P = 1/3, R = 1/2, F2 = 5*1/(4*2+3) = 5/11
    assert(r.getAs[Long]("n_cand") == 3L)
    assert(r.getAs[Long]("n_ref") == 2L)
    assert(r.getAs[Long]("n_overlap") == 1L)
    assert(r.getAs[Long]("chrf_p_ppm") == 333333L)
    assert(r.getAs[Long]("chrf_r_ppm") == 500000L)
    assert(r.getAs[Long]("chrf_ppm") == 454545L)
  }

  test("cdc decontaminate flags only verbatim long-chunk sharers") {
    val leak = "this exact evaluation passage was copied verbatim into " +
      "the training corpus by a careless crawl of the benchmark site"
    val evalSet = Seq((1L, s"benchmark question: $leak"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, s"some scraped page containing $leak and advertising"),
      (11L, "a paraphrase that copied the ideas but not one exact span " +
        "of the evaluation passage text appears here"),
      (12L, "completely unrelated training document content"))
      .toDF("doc_id", "text")
    val got = Cdc.decontaminate(corpus, evalSet, "doc_id", "text",
      w = 16, maskBits = 4, minLen = 16L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(10L), s"verbatim sharer must flag, got $got")
    assert(!got.contains(11L) && !got.contains(12L))
  }

  test("dedupSavings: duplicated corpus saves, unique corpus does not") {
    val rnd = new scala.util.Random(5)
    val base = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val dup = Seq((1L, base), (2L, base), (3L, base)).toDF("doc_id", "text")
    val r = Cdc.dedupSavings(dup, "doc_id", "text", 16, 4).collect()(0)
    assert(r.getAs[Long]("total_chars") == 1800L)
    assert(r.getAs[Long]("unique_chars") == 600L)
    assert(r.getAs[Long]("savings_ppm") == 666667L)
    // three DISTINCT random strings: virtually nothing saved
    val uniq = Seq.tabulate(3)(i => ((i + 1).toLong,
      (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
      .toDF("doc_id", "text")
    val r2 = Cdc.dedupSavings(uniq, "doc_id", "text", 16, 4).collect()(0)
    assert(r2.getAs[Long]("savings_ppm") < 50000L)
  }

  test("chrF drops pairs with a gram-less side") {
    val docs = Seq((1L, "abcdef"), (2L, "xy")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    assert(graft.functions.Eval.chrF(pairs, docs, "doc_id", "text", 3)
      .count() == 0L)
  }
}
