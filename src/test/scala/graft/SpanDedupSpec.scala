package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

/** Substring-level (repeated-span) dedup: cross-doc and intra-doc window
  * repeats must surface as exactly the intervals they cover, overlapping
  * windows must merge to maximal spans, and the positioned shingle
  * generator must agree gram-for-gram with the unpositioned one.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame, n: Int = 8) =
    Dedup.repeatedSpans(docs, "doc_id", "text", n)
      .select("doc_id", "span_start", "span_end", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("a run shared by two docs marks the interval in both") {
    val docs = Seq(
      (1L, "one two three four five six seven eight tail1"),
      (2L, "zero one two three four five six seven eight tail2"),
      (3L, "totally unrelated words that repeat nothing at all here")
    ).toDF("doc_id", "text")
    assert(spans(docs) == Set((1L, 0L, 8L, 1L), (2L, 1L, 9L, 1L)))
  }

  test("an intra-doc repeat yields both occurrences as separate spans") {
    val docs = Seq(
      (1L, "a b c d e f g h X a b c d e f g h")
    ).toDF("doc_id", "text")
    assert(spans(docs) == Set((1L, 0L, 8L, 1L), (1L, 9L, 17L, 1L)))
  }

  test("overlapping repeated windows merge into one maximal span") {
    val text = "p q r s t u v w x y" // 10 tokens, 3 overlapping 8-grams
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    assert(spans(docs) == Set((1L, 0L, 10L, 3L), (2L, 0L, 10L, 3L)))
  }

  test("stats: dup mass and keep ratio, unique docs keep 1.0") {
    val docs = Seq(
      (1L, "a b c d e f g h X a b c d e f g h"), // 17 tokens, 16 dup
      (2L, "clean doc with no repeated windows anywhere at all")
    ).toDF("doc_id", "text")
    val st = Dedup.spanDedupStats(docs, "doc_id", "text", 8)
      .select("doc_id", "n_tokens", "dup_tokens", "n_spans", "keep_ratio")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(st(1L) == ((17L, 16L, 2L, 1.0 / 17.0)))
    assert(st(2L) == ((9L, 0L, 0L, 1.0)))
  }

  test("positioned shingles agree with the unpositioned generator") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w2 w3")).toDF("doc_id", "text")
    val plain = docs.select(col("doc_id"),
        graft.plans.TextExpressions.hashedShingles(col("text"), 3))
      .as[(Long, Long)].collect().toSeq.sorted
    val positioned = docs.select(col("doc_id"),
        graft.plans.TextExpressions.hashedShinglesPos(col("text"), 3))
      .select("doc_id", "pos", "tid").as[(Long, Long, Long)].collect().toSeq
    // Positions are the 0-based gram index, dense per doc.
    assert(positioned.filter(_._1 == 1L).map(_._2).sorted == Seq(0L, 1L, 2L, 3L))
    assert(positioned.map(t => (t._1, t._3)).sorted == plain)
    // SQL surface parity for the new generator.
    graft.plans.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("span_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, pos, tid
         FROM span_docs LATERAL VIEW hashed_shingles_pos(text, 3) AS pos, tid""")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(viaSql == positioned.sorted)
  }

  // Independent winnowing model: n-gram poly hashes, min of every
  // w-window with rightmost tie-break, clipped single window when the
  // stream is shorter than w.
  private def winnowModel(text: String, n: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Set.empty
    val hs = (0 to toks.length - n)
      .map(i => graft.plans.PolyHash.eval(toks.slice(i, i + n).mkString(" ")))
    (0 to math.max(hs.length - w, 0)).map { p =>
      val win = hs.slice(p, p + w)
      val mn = win.min
      val rightmost = p + win.lastIndexOf(mn)
      (rightmost.toLong, mn)
    }.toSet
  }

  test("winnowing matches the reference model and its match guarantee") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val b = "different head words here zeta eta theta iota kappa lambda " +
      "completely other tail tokens now"
    val docs = Seq((1L, a), (2L, b),
      (3L, "tiny doc"),                 // < n tokens: no fingerprints
      (4L, "just four little tokens")   // 2 grams < w: one clipped window
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", n = 3, w = 4)
      .select("doc_id", "sel_pos", "tid").as[(Long, Long, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(fp(1L) === winnowModel(a, 3, 4))
    assert(fp(2L) === winnowModel(b, 3, 4))
    assert(!fp.contains(3L))
    assert(fp(4L) === winnowModel("just four little tokens", 3, 4)
      && fp(4L).size === 1)
    // Guarantee: docs 1 and 2 share a 6-token run (>= w + n - 1), so they
    // must share at least one fingerprint hash.
    assert(fp(1L).map(_._2).intersect(fp(2L).map(_._2)).nonEmpty)
    // Density: expected ~2/(w+1) of grams; allow a generous band.
    val grams = a.split(" ").length - 2
    assert(fp(1L).size <= grams && fp(1L).size >= grams / (4 + 1))
  }

  test("winnowPairs surfaces the planted near-dup through the sparse index") {
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep dark forest while the moon rises slowly over " +
      "the hills tonight"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")),  // long shared runs both sides
      (3L, "completely different content about spark query engines and " +
        "columnar execution with vectorized readers and shuffle services")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", n = 3, w = 4,
        minJaccard = 0.2)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // verification is the exact full-set Jaccard: must equal the
    // inverted-list path's value for the same pair
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.head._3 === full((1L, 2L)))
  }

  test("winnowPairs minShared=2: keeps multi-fingerprint dups, drops " +
      "single-fingerprint overlaps — both sides of the catalog contract") {
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep dark forest while the moon rises slowly over " +
      "the hills tonight"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")),
      // IDENTICAL short docs: 4 tokens = 2 gram hashes < w, so the
      // clipped window selects exactly ONE fingerprint per doc — a
      // Jaccard-1.0 exact duplicate pair sharing a single fingerprint,
      // which minShared=2 structurally drops (the sharpest statement of
      // the recall trade the catalog documents)
      (4L, "tiny shared fragment here"),
      (5L, "tiny shared fragment here")
    ).toDF("doc_id", "text")
    val at1 = Dedup.winnowPairs(docs, "doc_id", "text", n = 3, w = 4,
        minJaccard = 0.2, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val at2 = Dedup.winnowPairs(docs, "doc_id", "text", n = 3, w = 4,
        minJaccard = 0.2, minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(at1 === Set((1L, 2L), (4L, 5L)))
    assert(at2 === Set((1L, 2L)))
  }

  test("winnowing breaks hash ties by the rightmost position") {
    // All grams identical -> every window's min is the same hash and the
    // RIGHTMOST position of each window must be selected.
    val docs = Seq((1L, "a a a a a a a")).toDF("doc_id", "text") // 5 grams
    val sel = Dedup.winnowFingerprints(docs, "doc_id", "text", n = 3, w = 4)
      .select("sel_pos").as[Long].collect().toSet
    assert(sel === Set(3L, 4L)) // windows [0..3] and [1..4]
  }
}
