package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, LangModel}

class SimhashBigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhashPairs equals brute-force hamming pairs (pigeonhole is exhaustive)") {
    // Fingerprints engineered around the chunk boundaries of bits=12,
    // maxHamming=2 (chunks of 4 bits): differences concentrated in one
    // chunk, spread over all three, and beyond the threshold.
    val fps = Seq(
      (1L, 0x0FFL), (2L, 0x0FDL),     // hd 1
      (3L, 0x0F0L),                   // vs 1: hd 4 (out)
      (4L, 0x222L), (5L, 0x333L),     // hd 3, one bit per chunk: NO chunk
                                      // agrees AND above threshold (out) —
                                      // the spread-difference blocking case
      (6L, 0x000L), (7L, 0x801L),     // hd 2 via two chunks
      (8L, 0x000L)                    // dup of 6 -> hd 0
    ).toDF("id", "fp")
    val got = Dedup.simhashPairs(fps, "id", "fp", bits = 12, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = (for {
      (ia, fa) <- rows; (ib, fb) <- rows if ia < ib
      hd = java.lang.Long.bitCount(fa ^ fb) if hd <= 2
    } yield (ia, ib, hd.toLong)).toSet
    assert(got == exp)
    assert(exp.contains((6L, 8L, 0L)) && exp.contains((6L, 7L, 2L)))
    // The fixture must actually exercise the spread-difference regime.
    assert(!exp.exists(p => p._1 == 4L && p._2 == 5L))
  }

  test("simhashPairs rejects fingerprints outside [0, 2^bits)") {
    val bad = Seq((1L, -1L), (2L, 3L)).toDF("id", "fp")
    val ex = intercept[Exception](
      Dedup.simhashPairs(bad, "id", "fp", bits = 8, maxHamming = 1).count())
    assert(ex.getMessage.contains("fingerprint outside") ||
      Option(ex.getCause).exists(_.getMessage.contains("fingerprint outside")),
      ex.toString)
  }

  test("scan-stage simhashScan is bit-identical to the distributed groupBy form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = Dedup.simhash(
      docs.select(col("doc_id"),
        graft.plans.TextExpressions.hashedShingles(col("text"), 1)),
      "doc_id", col("tid"), bits = 24)
    val viaScan = docs.select(col("doc_id"),
      Dedup.simhashScan(col("text"), 24).as("simhash"))
    assert(viaAgg.exceptAll(viaScan).isEmpty && viaScan.exceptAll(viaAgg).isEmpty)
    // Tokenless docs: the aggregate form emits no row; the scan form
    // emits the all-zero-lane fingerprint (every lane sum is 0, no bit
    // set). Both are documented; this pins the scan form's value.
    val z = Seq("   ").toDF("text")
      .select(Dedup.simhashScan(col("text"), 8)).collect()(0)
    assert(z.getLong(0) == 0L)
  }

  test("simhashPairs bucket cap drops degenerate all-equal buckets") {
    // 50 identical fingerprints: cap 10 drops every bucket, so no pairs.
    val fps = (1L to 50L).map(i => (i, 0x5AL)).toDF("id", "fp")
    assert(Dedup.simhashPairs(fps, "id", "fp", bits = 8, maxHamming = 1,
      bucketCap = 10).count() == 0)
  }

  test("cooccurrenceLift: hand-computed lift, hub cut, min-count gate") {
    val docs = Seq(
      (1L, "x y common"),
      (2L, "x y common"),
      (3L, "x z common"),
      (4L, "z common")).toDF("id", "text")
    // dfCap 3 drops 'common' (4 docs) before pairing.
    val out = LangModel.cooccurrenceLift(docs, "id", "text",
        minPairCount = 1L, dfCap = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // c(x)=3, c(y)=2, c(z)=2, N=4; (x,y) co-occur 2x -> 4*2/(3*2)=1.333333;
    // (x,z) 1x -> 4*1/(3*2)=0.666667.
    assert(out == Set(
      ("x", "y", 3L, 2L, 2L, 1.333333),
      ("x", "z", 3L, 2L, 1L, 0.666667)))
    // minPairCount 2 keeps only the repeated pair.
    val gated = LangModel.cooccurrenceLift(docs, "id", "text",
        minPairCount = 2L, dfCap = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(gated.toSeq == Seq(("x", "y")))
  }

  test("bigramStats: hand-computed hapax and df, short docs drop out") {
    val docs = Seq(
      (1L, "a b c"),     // bigrams: "a b", "b c"
      (2L, "a b a b"),   // bigrams: "a b", "b a", "a b"
      (3L, "solo")       // no bigrams
    ).toDF("id", "text")
    val got = LangModel.bigramStats(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // Corpus: "a b" x3, "b c" x1, "b a" x1.
    assert(got == Map(
      1L -> ((2L, 1L, 0.5, 2.0)),          // df sum 3+1=4 -> avg 2.0
      2L -> ((3L, 1L, 1.0 / 3.0, 7.0 / 3.0)) // dfs 3+1+3=7
    ))
  }

  test("knBigramProbs: hand-computed Kneser-Ney rationals on a tiny corpus") {
    // tokens: x y x y x z  ->  c(x,y)=2, c(y,x)=2, c(x,z)=1
    // c_a: x=3, y=2; N1a: x=2, y=1; N1b: y=1, x=1, z=1; N_pairs=3
    // P(y|x) = (max(8-3,0)*3 + 3*2*1) / (4*3*3) = 21/36
    // P(z|x) = (max(4-3,0)*3 + 3*2*1) / 36      =  9/36
    // P(x|y) = (max(8-3,0)*3 + 3*1*1) / (4*2*3) = 18/24
    val docs = Seq((1L, "x y x y x z")).toDF("id", "text")
    def h(s: String) =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = LangModel.knBigramProbs(docs, "text")
      .collect().map(r => (r.getAs[Long]("tid_a"), r.getAs[Long]("tid_b")) ->
        ((r.getAs[Long]("c_ab"), r.getAs[Long]("pkn_q")))).toMap
    def q(num: Long, den: Long): Long =
      (BigInt(num) * 1000000000L / den).toLong
    assert(got === Map(
      (h("x"), h("y")) -> ((2L, q(21, 36))),
      (h("y"), h("x")) -> ((2L, q(18, 24))),
      (h("x"), h("z")) -> ((1L, q(9, 36)))))
    // minCount prunes the hapax bigram
    assert(LangModel.knBigramProbs(docs, "text", minCount = 2L).count() === 2)
  }

  test("jmBigramProbs: hand-computed 3/4-interpolated rationals") {
    // same corpus: c(x,y)=2, c(y,x)=2, c(x,z)=1; N=5
    // c_a: x=3, y=2; successor counts c_b: y=2, x=2, z=1
    // P(y|x) = (3*2*5 + 2*3) / (4*3*5) = 36/60
    // P(x|y) = (3*2*5 + 2*2) / (4*2*5) = 34/40
    // P(z|x) = (3*1*5 + 1*3) / 60      = 18/60
    val docs = Seq((1L, "x y x y x z")).toDF("id", "text")
    def h(s: String) =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def q(num: Long, den: Long): Long =
      (BigInt(num) * 1000000000L / den).toLong
    val got = LangModel.jmBigramProbs(docs, "text")
      .collect().map(r => (r.getAs[Long]("tid_a"), r.getAs[Long]("tid_b")) ->
        ((r.getAs[Long]("c_ab"), r.getAs[Long]("pjm_q")))).toMap
    assert(got === Map(
      (h("x"), h("y")) -> ((2L, q(36, 60))),
      (h("y"), h("x")) -> ((2L, q(34, 40))),
      (h("x"), h("z")) -> ((1L, q(18, 60)))))
    // per-context mass sums to 1 BEFORE pruning: P(y|x) + P(z|x) =
    // 36/60 + 18/60 + the unigram leak 6/60 of contexts x never
    // precedes -- here x precedes everything seen after it, so the two
    // terms plus nothing: 54/60 (the remaining 6/60 is the 1/4-weighted
    // unigram mass of successor x itself, never observed after x)
    assert(LangModel.jmBigramProbs(docs, "text", minCount = 2L).count() === 2)
  }

  test("perplexityBits: hand-computed bits under the tiny-corpus LM") {
    // same corpus as the KN test: P(y|x)=21/36, P(x|y)=18/24, P(z|x)=9/36
    // quantized at 1e9; bits per bigram = log2q(1e9) - log2q(pkn_q)
    val docs = Seq((1L, "x y x y x z")).toDF("id", "text")
    val lm = LangModel.knBigramProbs(docs, "text")
    val got = LangModel.perplexityBits(docs, "id", "text", lm).collect()
    assert(got.length == 1)
    val r = got(0)
    import graft.plans.FixLog.log2q
    def q(num: Long, den: Long): Long =
      (BigInt(num) * 1000000000L / den).toLong
    val s9 = log2q(1000000000L)
    // occurrences: (x,y) twice, (y,x) twice, (x,z) once
    val sbq = 2 * (s9 - log2q(q(21, 36))) + 2 * (s9 - log2q(q(18, 24))) +
      (s9 - log2q(q(9, 36)))
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == sbq / 5L)
    // sanity: the mean surprise sits between the best and worst bigram
    assert(r.getDouble(3) > (s9 - log2q(q(18, 24))) / 65536.0 - 1e-6)
    assert(r.getDouble(3) < (s9 - log2q(q(9, 36))) / 65536.0 + 1e-6)
  }

  test("knTrigramProbs: hand-computed interpolated rationals, short docs drop") {
    // tokens: x y x y x z -> trigrams (x,y,x) x2, (y,x,y), (y,x,z)
    // prefixes: (x,y): c=2, N1fw=1; (y,x): c=2, N1fw=2
    // bigram backoffs (from the bigram test, floor-quantized at B=1e9):
    //   q2(x|y)=floor(18e9/24)=750000000, q2(y|x)=floor(21e9/36)=583333333,
    //   q2(z|x)=floor(9e9/36)=250000000
    // p3(x|x,y) = (max(8-3,0)*B + 3*1*750000000) div 8 = 906250000
    // p3(y|y,x) = (max(4-3,0)*B + 3*2*583333333) div 8 = 562499999
    // p3(z|y,x) = (max(4-3,0)*B + 3*2*250000000) div 8 = 312500000
    val docs = Seq((1L, "x y x y x z")).toDF("id", "text")
    def h(s: String) =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = LangModel.knTrigramProbs(docs, "text")
      .collect().map(r => (r.getAs[Long]("tid_a"), r.getAs[Long]("tid_b"),
        r.getAs[Long]("tid_c")) ->
        ((r.getAs[Long]("c_abc"), r.getAs[Long]("pkn_q")))).toMap
    assert(got === Map(
      (h("x"), h("y"), h("x")) -> ((2L, 906250000L)),
      (h("y"), h("x"), h("y")) -> ((1L, 562499999L)),
      (h("y"), h("x"), h("z")) -> ((1L, 312500000L))))
    // minCount prunes the hapax trigrams
    assert(LangModel.knTrigramProbs(docs, "text", minCount = 2L).count() === 1)
    // a higher-order hit always outweighs its own backoff: seen trigrams
    // with c_abc >= 1 land above the pure continuation share
    assert(got.values.forall { case (_, q3) => q3 > 0L })
    // docs shorter than 3 tokens emit nothing
    assert(LangModel.knTrigramProbs(
      Seq((1L, "a b")).toDF("id", "text"), "text").count() === 0)
  }

  test("knScoreDocsTrigram: every backoff branch, hand-computed") {
    // train: "a b c", "a b d", "e b c" (per-doc zips, no cross-doc grams)
    // bigram q2 (B=1e9, floor): q2(c|b)=26e9/48=541666666,
    //   q2(d|b)=10e9/48=208333333, q2(b|a)=26e9/32=812500000
    // trigram table: p3(c|a,b)=(1e9+6*541666666)/8=531249999
    // continuation-only for (e,b,d): (3*1*208333333)/4=156249999
    val train = Seq((1L, "a b c"), (2L, "a b d"), (3L, "e b c"))
      .toDF("id", "text")
    val scored = Seq(
      (10L, "a b c"),   // seen trigram -> table value
      (11L, "e b d"),   // unseen trigram, seen prefix + bigram -> cont-only
      (12L, "x a b"),   // unseen prefix, seen bigram -> full bigram backoff
      (13L, "q q q"),   // nothing seen -> zero
      (14L, "a b"),     // < 3 tokens -> drops out
      (15L, "a b c d")  // mean of seen + zero: (531249999 + 0) div 2
    ).toDF("id", "text")
    val got = LangModel.knScoreDocsTrigram(scored, "id", "text", train)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Long]("n_exact"),
          r.getAs[Long]("fit_q")))).toMap
    assert(got.keySet === Set(10L, 11L, 12L, 13L, 15L))
    assert(got(10L) === ((1L, 1L, 531249999L)))
    assert(got(11L) === ((1L, 0L, 156249999L)))
    assert(got(12L) === ((1L, 0L, 812500000L)))
    assert(got(13L) === ((1L, 0L, 0L)))
    assert(got(15L) === ((2L, 1L, 265624999L)))
  }

  test("knScoreDocs: clean docs outscore garble under a clean-corpus LM") {
    val clean = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "the dog sat on the mat and the dog ran")
    ).toDF("id", "text")
    val lm = LangModel.knBigramProbs(clean, "text")
    val scored = Seq(
      (10L, "the cat sat on the mat"),     // all bigrams in-LM
      (11L, "zz qq ww ee rr tt yy uu"),    // no bigram in-LM: fit 0
      (12L, "solo")                        // no bigrams: drops out
    ).toDF("id", "text")
    val got = LangModel.knScoreDocs(scored, "id", "text", lm)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_scored"),
          r.getAs[Long]("fit_q")))).toMap
    assert(got.keySet === Set(10L, 11L))
    assert(got(10L)._1 === 5L && got(10L)._2 === 5L && got(10L)._3 > 0L)
    assert(got(11L) === ((7L, 0L, 0L)))
    // unseen bigrams dilute: a half-garbled doc scores below the clean one
    val half = Seq((20L, "the cat sat zz qq ww")).toDF("id", "text")
    val hq = LangModel.knScoreDocs(half, "id", "text", lm)
      .collect().head.getAs[Long]("fit_q")
    assert(hq > 0L && hq < got(10L)._3)
  }

  test("lmBuckets: tiers are rank-consistent and balanced within language") {
    // 7 "en" docs spanning clean -> garble, 3 "fr" docs, one bigram-less.
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran", "en"),
      (2L, "the dog sat on the mat and the dog ran", "en"),
      (3L, "the cat sat on the mat", "en"),
      (4L, "the cat zz qq on the mat", "en"),
      (5L, "zz qq ww the cat ee rr", "en"),
      (6L, "zz qq ww ee rr tt yy", "en"),
      (7L, "qq zz tt ww yy rr ee", "en"),
      (20L, "le chat dort sur le tapis", "fr"),
      (21L, "le chien dort sur le tapis", "fr"),
      (22L, "xx vv le chat nn pp", "fr"),
      (30L, "solo", "en") // no bigrams: drops out
    ).toDF("doc_id", "text", "lang")
    val lm = LangModel.knBigramProbs(docs, "text")
    val got = LangModel.lmBuckets(docs, "doc_id", "text", "lang", lm)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("fit_q"),
          r.getAs[Long]("bucket"), r.getAs[String]("tier")))).toMap
    assert(!got.contains(30L)) // bigram-less doc dropped
    // ntile balance: en 7 docs -> 3/2/2, fr 3 docs -> 1/1/1
    val enSizes = (1L to 3L).map(b => got.count {
      case (_, (l, _, bk, _)) => l == "en" && bk == b })
    assert(enSizes === Seq(3, 2, 2))
    val frSizes = (1L to 3L).map(b => got.count {
      case (_, (l, _, bk, _)) => l == "fr" && bk == b })
    assert(frSizes === Seq(1, 1, 1))
    // rank consistency: every head fit >= every middle fit >= every tail
    // fit, within each language
    for (lang <- Seq("en", "fr")) {
      val byTier = got.values.filter(_._1 == lang).toSeq
        .groupBy(_._4).view.mapValues(_.map(_._2)).toMap
      assert(byTier("head").min >= byTier("middle").max, byTier.toString)
      assert(byTier("middle").min >= byTier("tail").max, byTier.toString)
    }
    // tier names follow the bucket index
    assert(got.values.forall { case (_, _, b, t) =>
      (b == 1L) == (t == "head") && (b == 3L) == (t == "tail") })
    // the clean boilerplate docs head the ranking; pure garble tails it
    assert(got(1L)._4 == "head" && got(2L)._4 == "head")
    assert(got(6L)._4 == "tail" && got(7L)._4 == "tail")
  }

  test("lmBucketsSampled: full-sample boundaries match exact buckets; " +
      "sub-samples stay monotone and boundary-bounded") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran", "en"),
      (2L, "the dog sat on the mat and the dog ran", "en"),
      (3L, "the cat sat on the mat", "en"),
      (4L, "the cat zz qq on the mat", "en"),
      (5L, "zz qq ww the cat ee rr", "en"),
      (6L, "zz qq ww ee rr tt yy", "en"),
      (7L, "qq zz tt ww yy rr ee", "en"),
      (20L, "le chat dort sur le tapis", "fr"),
      (21L, "le chien dort sur le tapis", "fr"),
      (22L, "xx vv le chat nn pp", "fr")
    ).toDF("doc_id", "text", "lang")
    val lm = LangModel.knBigramProbs(docs, "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("fit_q"),
          r.getAs[Long]("bucket"), r.getAs[String]("tier")))).toMap
    val exact = asMap(
      LangModel.lmBuckets(docs, "doc_id", "text", "lang", lm))
    // full sample: boundaries are the exact population order statistics;
    // with tie-free fits the assignment equals exact ntile everywhere
    val full = asMap(LangModel.lmBucketsSampled(docs, "doc_id", "text",
      "lang", lm, samplePerMille = 1000))
    val fits = exact.values.groupBy(_._1).values
    assert(fits.forall(v => v.map(_._2).toSeq.distinct.size == v.size),
      "fixture must be tie-free for the equivalence leg")
    assert(full == exact)
    // a 50% hash sample: assignment stays monotone in fit within
    // language (thresholding is order-preserving by construction) and
    // at least half the docs keep their exact bucket
    val half = asMap(LangModel.lmBucketsSampled(docs, "doc_id", "text",
      "lang", lm, samplePerMille = 500))
    for (lang <- Seq("en", "fr")) {
      val rows = half.values.filter(_._1 == lang).toSeq.sortBy(-_._2)
      assert(rows.map(_._3) == rows.map(_._3).sorted,
        s"non-monotone sampled buckets for $lang: $rows")
    }
    val agree = half.count { case (id, v) => exact(id)._3 == v._3 }
    assert(agree * 2 >= exact.size, s"only $agree/${exact.size} agree")
  }

  test("lmBucketsSampled: a language absent from the sample falls back " +
      "to the exact ranking, not all-head") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran", "en"),
      (2L, "the dog sat on the mat and the dog ran", "en"),
      (3L, "the cat sat on the mat", "en"),
      (4L, "the cat zz qq on the mat", "en"),
      (5L, "zz qq ww the cat ee rr", "en"),
      (6L, "zz qq ww ee rr tt yy", "en"),
      (7L, "qq zz tt ww yy rr ee", "en"),
      (20L, "le chat dort sur le tapis", "fr"),
      (21L, "le chien dort sur le tapis", "fr"),
      (22L, "xx vv le chat nn pp", "fr")
    ).toDF("doc_id", "text", "lang")
    val lm = LangModel.knBigramProbs(docs, "text")
    val spm = 1 // essentially guarantees empty per-language samples here
    val sampledLangs = docs
      .filter(pmod(graft.functions.Sampling.hashOrder(col("doc_id")),
        lit(1000L)) < spm)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assume(sampledLangs.size < 2,
      "fixture must leave at least one language unsampled at spm=1")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("bucket")))).toMap
    val exact = asMap(
      LangModel.lmBuckets(docs, "doc_id", "text", "lang", lm))
    val got = asMap(LangModel.lmBucketsSampled(docs, "doc_id", "text",
      "lang", lm, samplePerMille = spm))
    got.foreach { case (id, (lang, bucket)) =>
      if (!sampledLangs.contains(lang))
        assert(bucket == exact(id)._2,
          s"unsampled language $lang must use the exact ranking (doc $id)")
    }
    // the pre-fix symptom: every unsampled doc silently head-bucketed
    assert(got.values.exists(_._2 != 1L),
      "fallback must not collapse everything to bucket 1")
  }

  test("oovStats: tail tokens count as OOV against the top-V vocabulary") {
    val docs = Seq(
      (1L, "a a a b b rare1"),  // corpus counts: a x4, b x3, rare* x1 each
      (2L, "a b rare2"),
      (3L, "")                  // zero tokens: drops out
    ).toDF("id", "text")
    val got = LangModel.oovStats(docs, "id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // vocab = {a, b}; rare1/rare2 are OOV
    assert(got === Map(
      1L -> ((6L, 1L, 0.166667)),
      2L -> ((3L, 1L, 0.333333))))
    // vocabSize covering every distinct token -> zero OOV everywhere
    val all = LangModel.oovStats(docs, "id", "text", vocabSize = 100)
      .collect().map(_.getAs[Long]("n_oov")).toSet
    assert(all === Set(0L))
  }

  test("unigramTV: hand-computed distances, disjoint pair, identical pair") {
    val docs = Seq(
      ("p", "a a b"),      // P: a 2/3, b 1/3
      ("q", "a b b b"),    // Q: a 1/4, b 3/4
      ("r", "a a b"),      // identical distribution to p
      ("s", "x y")         // disjoint vocabulary
    ).toDF("grp", "text")
    val got = LangModel.unigramTV(docs, "grp", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // TV(P,Q) = 1 − [min(2/3,1/4) + min(1/3,3/4)] = 1 − 7/12 = 5/12
    assert(got(("p", "q")) === ((3L, 4L, 2L, 0.416667)))
    assert(got(("p", "r")) === ((3L, 3L, 2L, 0.0)))   // same distribution
    assert(got(("q", "r")) === ((4L, 3L, 2L, 0.416667)))
    assert(got(("p", "s")) === ((3L, 2L, 0L, 1.0)))   // disjoint → TV = 1
    assert(got(("q", "s")) === ((4L, 2L, 0L, 1.0)))
    assert(got(("r", "s")) === ((3L, 2L, 0L, 1.0)))
    assert(got.size === 6) // all G(G−1)/2 ordered pairs, g_a < g_b only
    assert(got.keys.forall { case (a, b) => a < b })
  }

  test("unigramTV on real data: bounds and pair coverage") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = LangModel.unigramTV(docs, "lang", "text").collect()
    assert(rows.length === 10) // 5 languages → 10 unordered pairs
    assert(rows.forall(r => r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0))
    // the synthetic corpus's lang column is text-INDEPENDENT (the
    // generator draws all languages from one vocabulary — the same
    // property that made lang unlearnable for q_perceptron), so the
    // diagnostic must read these sub-corpora as near-interchangeable:
    // small but nonzero TV. A by-source split looks the same. Distinct
    // distributions (the hand-computed test above) are where TV grows.
    assert(rows.forall(r => r.getDouble(5) > 0.0 && r.getDouble(5) < 0.2),
      rows.map(_.getDouble(5)).mkString(","))
  }
}
