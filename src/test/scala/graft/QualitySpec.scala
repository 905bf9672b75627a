package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Quality, Sampling, Text, Tfidf}

/** Corpus-hygiene operators: quality rules, PII redaction, URL parsing,
  * TF-IDF ranking, stratified sampling.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantileNormalize: hand-mapped positions, identity on one group") {
    // group a (n=2): values 10, 20; group b (n=4): 1, 2, 3, 4; N=6.
    // pooled order: 1,2,3,4,10,20. a's r=1 -> p=ceil(6/2)=3 -> 3;
    // a's r=2 -> p=6 -> 20. b: p = ceil(r*6/4): r=1->2, 2->3, 3->5, 4->6
    // -> 2, 3, 10, 20.
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 1L),
      (4L, "b", 2L), (5L, "b", 3L), (6L, "b", 4L))
      .toDF("id", "g", "v")
    val got = Quality.quantileNormalize(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank_in_group"), r.getAs[Long]("norm_v"))).toMap
    assert(got == Map(1L -> ((1L, 3L)), 2L -> ((2L, 20L)),
      3L -> ((1L, 2L)), 4L -> ((2L, 3L)), 5L -> ((3L, 10L)),
      6L -> ((4L, 20L))))
    // single group: the pooled distribution is its own -> identity
    val one = Seq((1L, "g", 7L), (2L, "g", 3L), (3L, "g", 9L))
      .toDF("id", "g", "v")
    val ident = Quality.quantileNormalize(one, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("norm_v"))
    assert(ident.forall { case (v, nv) => v == nv })
  }

  test("repetitionRatio: distinct grams 0, repeated grams ratio, short docs 0") {
    val df = Seq(
      ("a b c d", 0.0),            // 2 grams, both distinct
      ("x y x y x y", 0.5),        // grams: xyx yxy xyx yxy -> 2 distinct of 4
      ("one two", 0.0),            // shorter than n=3 -> 0
      ("", 0.0)
    ).toDF("text", "exp")
    val rows = df.select(Quality.repetitionRatio(col("text"), 3).as("r"),
      col("exp")).collect()
    for (r <- rows) assert(r.getDouble(0) == r.getDouble(1), r)
  }

  test("keepRule gates each signal independently") {
    val keep = Quality.keepRule(col("n"), col("a"), col("s"), col("p"), col("r"))
    val rows = Seq(
      (50L, 5.0, 0.2, 0.05, 0.1, true),   // all within bounds
      (5L, 5.0, 0.2, 0.05, 0.1, false),   // too few tokens
      (50L, 13.0, 0.2, 0.05, 0.1, false), // avg token too long
      (50L, 5.0, 0.7, 0.05, 0.1, false),  // stopword-heavy
      (50L, 5.0, 0.2, 0.3, 0.1, false),   // symbol-heavy
      (50L, 5.0, 0.2, 0.05, 0.5, false)   // repetitive
    ).toDF("n", "a", "s", "p", "r", "exp")
      .select(keep.as("keep"), col("exp")).collect()
    for (r <- rows) assert(r.getBoolean(0) == r.getBoolean(1), r)
  }

  test("redactPii replaces emails, IPs, phones and counts them") {
    val dirty = "mail a.b+c@ex-1.org and 10.0.0.1 call +123456789 done"
    val r = Seq(dirty).toDF("t").select(
      Quality.redactPii(col("t")).as("clean"),
      Quality.emailCount(col("t")).as("e"),
      Quality.ipv4Count(col("t")).as("i"),
      Quality.phoneCount(col("t")).as("p")).collect()(0)
    assert(r.getString(0) == "mail <EMAIL> and <IP> call <PHONE> done")
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 1, 1)))
    // Clean text passes through untouched.
    val c = Seq("no pii here 1.2 only a float").toDF("t")
      .select(Quality.redactPii(col("t"))).collect()(0).getString(0)
    assert(c == "no pii here 1.2 only a float")
  }

  test("url parsing: full, query-less, path-less, and non-URL inputs") {
    def parts(u: String): (String, String, String, String, String) = {
      val r = Seq(u).toDF("u").select(
        Text.urlScheme(col("u")), Text.urlHost(col("u")),
        Text.urlPath(col("u")), Text.urlQuery(col("u")),
        Text.urlDomain(col("u"))).collect()(0)
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))
    }
    assert(parts("https://a.b.example.com/x/y?q=1#frag") ==
      (("https", "a.b.example.com", "/x/y", "q=1", "example.com")))
    assert(parts("http://example.com/p") ==
      (("http", "example.com", "/p", "", "example.com")))
    assert(parts("ftp://host") == (("ftp", "host", "", "", "host")))
    assert(parts("not a url") == (("", "", "", "", "")))
  }

  test("tfidf ranks rarer terms higher; ties break lexicographically") {
    // "common" is in all 3 docs (df=3); uniques have df=1.
    val docs = Seq(
      (1L, "common zebra zebra apple"),
      (2L, "common apple"),
      (3L, "common banana")).toDF("id", "text")
    val top = Tfidf.topTerms(docs, "id", "text", 2)
      .orderBy(col("id"), col("term_rank"))
      .select(col("id"), col("term"), col("tf"), col("df"), col("term_rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    assert(top.toSeq == Seq(
      (1L, "zebra", 2L, 1L, 1),  // 2*3/1 = 6.0
      (1L, "apple", 1L, 2L, 2),  // 1*3/2 = 1.5 beats common's 1*3/3 = 1.0
      (2L, "apple", 1L, 2L, 1),
      (2L, "common", 1L, 3L, 2),
      (3L, "banana", 1L, 1L, 1),
      (3L, "common", 1L, 3L, 2)))
  }

  test("stratifiedSample: quota per stratum, deterministic, null keys dropped") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "par")
    val s1 = Sampling.stratifiedSample(df, Seq("par"), "id", 7)
    val s2 = Sampling.stratifiedSample(df, Seq("par"), "id", 7)
    val g1 = s1.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g1 == s2.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    val per = s1.groupBy("par").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("even" -> 7L, "odd" -> 7L))
    val withNull = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "a")).toDF("id", "par")
    assert(Sampling.stratifiedSample(withNull, Seq("par"), "id", 5).count() == 1)
  }

  test("corpusCard aggregates the datasheet row per source") {
    val docs = Seq(
      ("s1", "the quick brown fox jumps over a lazy dog today ok"), // 11 toks
      ("s1", "tiny"),                                               // short
      ("s2", "reach me at bob@example.com for more details soon ok now")
    ).toDF("source", "text")
    val card = graft.functions.Quality.corpusCard(docs, "source", "text",
        Seq("the", "a"), minTokens = 10)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("short_docs"), r.getAs[Long]("pii_docs"),
          r.getAs[Double]("mean_quality")))).toMap
    assert(card("s1")._1 === 2L && card("s1")._2 === 12L)
    assert(card("s1")._3 === 1L && card("s1")._4 === 0L)
    assert(card("s2") === ((1L, 10L, 0L, 1L, card("s2")._5)))
    // independent model of the quantized mean for s1:
    def q(nt: Int, stops: Int): Long = {
      val stopRatio = if (nt > 0) stops.toDouble / nt else 0.0
      val score = math.min(1.0, nt / 50.0) * (1.0 - math.abs(stopRatio - 0.2))
      math.floor(score * 1e6).toLong
    }
    val expected = (q(11, 2) + q(1, 0)).toDouble / (2 * 1000000L)
    assert(math.abs(card("s1")._5 -
      BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("percentileGate keeps exactly the top floor(n·bps/10000) per group") {
    // group g has 10 docs scored by id; group h has 3
    val docs = (1 to 10).map(i => ("g", i.toLong, i.toDouble)) ++
      Seq(("h", 100L, 5.0), ("h", 101L, 5.0), ("h", 102L, 1.0))
    val df = docs.toDF("src", "id", "score")
    val kept = Quality.percentileGate(df, "src", "score", 2500, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // g: floor(10·0.25) = 2 → the two best scores (ids 9, 10);
    // h: floor(3·0.25) = 0 → nothing survives
    assert(kept === Set(("g", 9L), ("g", 10L)))
    // score ties break on the tie column: both h docs score 5.0; at 50%
    // keep floor(3·0.5) = 1 → the SMALLER id wins deterministically
    val half = Quality.percentileGate(df, "src", "score", 5000, "id")
      .filter($"src" === "h").collect().map(_.getLong(1)).toSet
    assert(half === Set(100L))
    // bps edges: 10000 keeps everything, 0 keeps nothing
    assert(Quality.percentileGate(df, "src", "score", 10000, "id")
      .count() === 13L)
    assert(Quality.percentileGate(df, "src", "score", 0, "id").count() === 0L)
    // partitioning-invariant
    val rep = Quality.percentileGate(df.repartition(7), "src", "score",
      2500, "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rep === kept)
  }

  test("percentileGateSampled: full sample equals the exact gate on " +
      "tie-free scores; unsampled groups fall back exactly") {
    val docs = (1 to 40).map(i => ("g", i.toLong, i.toDouble)) ++
      (1 to 20).map(i => ("h", (100 + i).toLong, (i * 3).toDouble))
    val df = docs.toDF("src", "id", "score")
    def keptSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = keptSet(
      Quality.percentileGate(df, "src", "score", 2500, "id"))
    val full = keptSet(Quality.percentileGateSampled(df, "src", "score",
      2500, "id", "id", samplePerMille = 1000))
    assert(full == exact)
    // a partial sample stays threshold-consistent: every kept score
    // >= every dropped score within a group
    val part = Quality.percentileGateSampled(df, "src", "score", 2500,
        "id", "id", samplePerMille = 400)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    for (g <- Seq("g", "h")) {
      val keptScores = part.filter(_._1 == g).map(_._2)
      val dropped = docs.filter(_._1 == g).map(_._3)
        .filterNot(keptScores.contains)
      if (keptScores.nonEmpty && dropped.nonEmpty)
        assert(keptScores.min >= dropped.max,
          s"$g: kept ${keptScores.sorted} dropped ${dropped.sorted}")
    }
    // a group too small to hit a 1-per-mille sample takes the exact gate
    val tiny = df.unionByName(Seq(("z", 100001L, 5.0), ("z", 100002L, 9.0),
      ("z", 100003L, 1.0), ("z", 100004L, 7.0)).toDF("src", "id", "score"))
    val spm1 = keptSet(Quality.percentileGateSampled(tiny, "src", "score",
        5000, "id", "id", samplePerMille = 1)
      .filter($"src" === "z"))
    val zExact = keptSet(Quality.percentileGate(
      tiny.filter($"src" === "z"), "src", "score", 5000, "id"))
    assert(spm1 == zExact && zExact == Set(("z", 100002L), ("z", 100004L)))
  }

  test("containment pairs catch the quoted-subset doc that Jaccard misses") {
    import graft.functions.Dedup
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val sub = (10 to 20).map(i => s"tok$i").mkString(" ") // 11 toks ⊂ long
    val docs = Seq((1L, long), (2L, sub),
      (3L, "completely unrelated content about columnar shuffle services " +
        "and vectorized parquet readers in query engines"))
      .toDF("doc_id", "text")
    // B's 9 trigram shingles all occur in A: containment = 9/9 = 1.0,
    // while jaccard = 9/(38+9−9) ≈ 0.237 — below any dedup-grade bar
    val cont = Dedup.ngramContainmentPairs(docs, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(cont.toSeq === Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    assert(jac.count() === 0L)
    // containment >= jaccard on every pair (same corpus, threshold 0 vs 0)
    val c0 = Dedup.ngramContainmentPairs(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    val j0 = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(j0.keySet === c0.keySet)
    assert(j0.forall { case (k, j) => c0(k) >= j })
  }

  test("groupCap keeps the top k per group with deterministic ties") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0)
    ).toDF("src", "id", "score")
    val out = Quality.groupCap(df, "src", "score", "id", 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // ties at 9.0 break by id asc: ids 2 (rnk 1), 3 (rnk 2); group b whole
    assert(out === Set(("a", 2L, 1L), ("a", 3L, 2L), ("b", 5L, 1L)))
    // partitioning-invariant (two-level rank is exact under any layout)
    val rep = Quality.groupCap(df.repartition(7), "src", "score", "id", 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(rep === out)
  }

  test("kAnonymity: k and l flags are independent and exact") {
    val df = Seq(
      ("a", "d1", 1L), ("a", "d1", 1L), ("a", "d1", 2L), ("a", "d1", 3L),
      ("a", "d1", 4L),                      // n=5 l=4: safe at k=5,l=3
      ("b", "d1", 1L), ("b", "d1", 1L), ("b", "d1", 1L), ("b", "d1", 1L),
      ("b", "d1", 1L),                      // n=5 l=1: k ok, l risk
      ("c", "d1", 1L), ("c", "d1", 2L), ("c", "d1", 3L))
      .toDF("qi1", "qi2", "user")
    val got = graft.functions.Quality.kAnonymity(df, Seq("qi1", "qi2"),
        "user", k = 5L, l = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(got("a") == ((5L, 4L, false, false)))
    assert(got("b") == ((5L, 1L, false, true)))
    assert(got("c") == ((3L, 3L, true, false)))  // n<k but diverse
  }

  test("hashingTrick: deterministic dims/signs, per-doc sums, zero drop") {
    val docs = Seq((1L, "aa aa bb"), (2L, "aa")).toDF("doc_id", "text")
    val got = Tfidf.hashingTrick(docs, "doc_id", "text", dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // polyHash("aa") = (97*31+97) % 1e9+7 = 3104; dim 3104%16 = 0,
    // sign bit (3104//16)%2 = 0 -> +1. polyHash("bb") = 98*31+98 = 3136;
    // dim 0, sign (196)%2 = 0 -> +1. doc 1: dim0 = 2(+aa) + 1(bb) = 3.
    assert(got((1L, 0L)) == 3L)
    assert(got((2L, 0L)) == 1L)
    assert(got.size == 2)
    // opposite-sign collision cancels to zero and the dim drops:
    // craft two tokens with equal dim, opposite sign bits under dims=2:
    // "a" = 97: dim 1, (48)%2 = 0 -> +1; "c" = 99: dim 1, (49)%2 -> -1
    val cancel = Seq((1L, "a c")).toDF("doc_id", "text")
    assert(Tfidf.hashingTrick(cancel, "doc_id", "text", dims = 2)
      .collect().isEmpty)
  }

  test("fleschReadability: hand-computed exact micro-units") {
    // "The cat sat. It ran!": 5 words, 2 sentence marks, 5 vowel groups
    // score = 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975
    val docs = Seq((1L, "The cat sat. It ran!"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Quality.fleschReadability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((5L, 2L, 5L)))
    assert(r1.getLong(4) == 119697500L)
    // empty doc: zero words -> NULL score (sentences floored at 1)
    val r2 = got(2L)
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 1L && r2.isNullAt(4))
  }

  test("charEntropy: uniform = log2(k) bits, constant = 0, empty drops") {
    // "abcd": 4 distinct chars once each -> exactly 2 bits/char
    //   h2_q = 4*log2q(4) - 4*1*log2q(1) = 4*131072 = 524288
    // "aaaa": one char -> exactly 0
    val docs = Seq((1L, "abcd"), (2L, "aaaa"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Quality.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 524288L, 2.0)))
    assert(got(2L) == ((4L, 0L, 0.0)))
    assert(!got.contains(3L)) // empty doc: no distribution, no row
  }

  test("randomizedResponse: mechanism replay and exact debias") {
    import org.apache.spark.sql.Row
    // replay the deterministic coin to build the expected tallies
    val ids = (0L until 12L).toSeq
    val flips = ids.map { id =>
      val p = 2147483647L
      val h1 = ((id % p) * 1103515245L + 12345L) % p
      val h2 = (h1 * h1 + h1) % p
      id -> (((h2 * 784588716L + 998244353L) % p) % 3L == 0L)
    }.toMap
    val rows = ids.map(id => (id, if (id % 2 == 0) "en" else "fr"))
    val df = rows.toDF("doc_id", "lang")
      .withColumn("g", lit("s"))
    val r = Quality.randomizedResponse(df, "g", "doc_id",
      col("lang") === "en", denom = 3L).collect()(0)
    val trueCnt = rows.count(_._2 == "en").toLong
    val reported = rows.count { case (id, l) =>
      (l == "en") ^ flips(id)
    }.toLong
    assert(r.getLong(1) == 12L && r.getLong(2) == trueCnt)
    assert(r.getLong(3) == reported)
    assert(r.getLong(4) == 3L * reported - 12L) // exact debias, denom 3
    assert(r.getLong(5) == r.getLong(4) - trueCnt)
  }

  test("tCloseness: exact EMD vs the global distribution; flags skew") {
    val rows = Seq(
      ("A", 0L), ("A", 0L),
      ("B", 1L), ("B", 1L)
    ).toDF("g", "v")
    val m = Quality.tCloseness(rows, Seq("g"), "v", thresholdPpm = 400000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // global cums: C(0)=2 C(1)=4, N=4, D=2.
    // A: |2*4-2*2| + |2*4-4*2| = 4; t = 4/(2*4*1) = 0.5
    assert(m("A") == ((2L, 4L, 500000L, true)))
    assert(m("B") == ((2L, 4L, 500000L, true)))
  }

  test("tCloseness: identical distributions and single-value domains -> 0") {
    val same = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g", "v")
    val r = Quality.tCloseness(same, Seq("g"), "v", 1L).collect()
    assert(r.forall(x => x.getLong(3) == 0L && !x.getBoolean(4)))
    val degen = Seq(("A", 7L), ("B", 7L)).toDF("g", "v")
    val d = Quality.tCloseness(degen, Seq("g"), "v", 1L).collect()
    assert(d.forall(x => x.getLong(3) == 0L))
  }

  test("readabilityPanel: exact milli grades on hand fixtures") {
    val docs = Seq(
      (1L, "The cat sat. A dog ran!"),
      (2L, "avocado banana"),
      (3L, "")
    ).toDF("doc_id", "text")
    val m = Quality.readabilityPanel(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)), Option(r.get(6)),
        Option(r.get(7))))).toMap
    // doc 1: 6 words, 2 sentences, 16 alnum chars, 0 complex
    // ARI = (4710*16*2 + 500*36 - 21430*12)/12 = -7370 milli exactly
    // CLI = (5880*16 - 29600*2 - 15800*6)/6 = -59920/6 -> -9987
    // Fog = 400*36/12 = 1200
    assert(m(1L) == ((6L, 2L, 16L, 0L, Some(-7370L), Some(-9987L),
      Some(1200L))))
    // doc 2: both words have >= 3 vowel groups -> complex
    val (w2, s2, c2, x2, _, _, fog2) = m(2L)
    assert((w2, s2, c2, x2) == ((2L, 1L, 13L, 2L)))
    assert(fog2 == Some(40800L)) // (400*4 + 40000*2)/2
    // doc 3: zero words -> all three NULL
    assert(m(3L)._5.isEmpty && m(3L)._6.isEmpty && m(3L)._7.isEmpty)
  }
}
