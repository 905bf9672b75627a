package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Rank

/** BM25 retrieval: the quantized rational-idf scoring must reproduce a
  * hand-computed exact value, honor the classic BM25 shape properties
  * (rare-term weighting, tf saturation, length normalization), and keep
  * its top-k as one bounded TakeOrdered — never a global sort.
  */
class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4-doc corpus: "rare" appears in exactly one doc; "common" in all. */
  private def corpus = Seq(
    (1L, "rare common x y"),            // dl 4, has the rare term
    (2L, "common common x y"),          // dl 4, tf(common)=2
    (3L, "common x y z"),               // dl 4, tf(common)=1
    (4L, "common x y z w v u t s r q p o n m l k j i h g f e d c b")
  ).toDF("doc_id", "text")              // dl 26, tf(common)=1 (long doc)

  /** The operator's exact integer score for one (tf, df, dl) given corpus
    * totals — the same cleared-denominator formula, in BigInt.
    */
  private def termQ(tf: Long, df: Long, dl: Long, n: Long, t: Long): BigInt = {
    val num = BigInt(2 * n + 2) * 44 * tf * t * 1000000L
    val den = BigInt(2 * df + 1) *
      (BigInt(20) * tf * t + BigInt(6) * t + BigInt(18) * dl * n)
    num / den
  }

  test("scores match the hand-computed exact integers") {
    val out = Rank.bm25TopDocs(corpus, "doc_id", "text",
      Seq("rare", "common"), 10)
      .select("doc_id", "n_terms", "score_q").as[(Long, Long, Long)]
      .collect().map { case (id, n, q) => id -> ((n, q)) }.toMap
    val (n, t) = (4L, 38L) // 4 docs, 4+4+4+26 tokens
    val expected = Map(
      1L -> (2L, termQ(1, 1, 4, n, t) + termQ(1, 4, 4, n, t)),
      2L -> (1L, termQ(2, 4, 4, n, t)),
      3L -> (1L, termQ(1, 4, 4, n, t)),
      4L -> (1L, termQ(1, 4, 26, n, t)))
    assert(out.keySet == expected.keySet)
    for ((id, (nt, q)) <- expected) {
      assert(out(id)._1 == nt, s"doc $id n_terms")
      assert(BigInt(out(id)._2) == q, s"doc $id score_q")
    }
  }

  test("rare term dominates; tf saturates; long docs are penalized") {
    val byDoc = Rank.bm25TopDocs(corpus, "doc_id", "text",
      Seq("rare", "common"), 10)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    // Rare-term doc outranks every common-only doc.
    assert(byDoc(1L) > byDoc(2L) && byDoc(1L) > byDoc(3L))
    // tf saturation: tf=2 scores more than tf=1 but less than 2x.
    assert(byDoc(2L) > byDoc(3L) && byDoc(2L) < 2 * byDoc(3L))
    // Length normalization: same tf(common)=1, dl 28 scores below dl 4.
    assert(byDoc(4L) < byDoc(3L))
  }

  test("docs with no query term are absent; k bounds the output") {
    val out = Rank.bm25TopDocs(corpus, "doc_id", "text", Seq("rare"), 1)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("prfExpansionTerms: tf-weighted-by-score sums, seed/stopword " +
      "exclusion, non-feedback docs contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup dup apple banana"),
      (2L, "dup apple apple"),
      (3L, "zzz zzz zzz") // no query term: outside the feedback set
    ).toDF("doc_id", "text")
    val scores = Rank.bm25TopDocs(docs, "doc_id", "text", Seq("dup"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (s1, s2) = (scores(1L), scores(2L))
    val got = Rank.prfExpansionTerms(docs, "doc_id", "text", Seq("dup"),
        kDocs = 2, kTerms = 10, stopwords = Seq("banana"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // apple: tf 1 in doc 1, tf 2 in doc 2
    assert(got == Map("apple" -> ((2L, s1 + 2L * s2))), got.toString)
    // seed term and stopword never expand; zzz is not in feedback docs
    assert(!got.contains("dup") && !got.contains("banana") &&
      !got.contains("zzz"))
  }

  test("rrfFuse matches hand-computed quantized reciprocal ranks") {
    val listA = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rnk")
    val listB = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rnk")
    val out = graft.functions.Rank
      .rrfFuse(Seq(listA, listB), "doc_id", "rnk", 60, 10)
      .select("doc_id", "n_lists", "rrf_q").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def c(rank: Long) = 1000000000L / (60L + rank)
    assert(out(10L) == ((1L, c(1))))
    assert(out(20L) == ((2L, c(2) + c(1)))) // in both lists
    assert(out(30L) == ((1L, c(3))))
    assert(out(40L) == ((1L, c(2))))
    // Consensus beats any single-list rank-1.
    assert(out(20L)._2 > out(10L)._2)
  }

  test("rrfFuse bounds output at topK in fused-rank order") {
    val listA = (1L to 30L).map(i => (i, i)).toDF("doc_id", "rnk")
    val top = graft.functions.Rank.rrfFuse(Seq(listA), "doc_id", "rnk", 60, 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("top-k plans as TakeOrdered, not a global sort") {
    val plan = Rank.bm25TopDocs(corpus, "doc_id", "text",
      Seq("rare", "common"), 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("GlobalLimit"), plan)
  }

  test("hardNegatives drops near-dups of the positive, keeps rank order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector merge dup vector merge dup vector merge dup searching"),
      (2L, "vector merge dup vector merge dup vector merge dup searcher"),
      (3L, "vector merge content about other unrelated engine topics here"),
      (4L, "dup detection with different framing and vocabulary entirely"),
      (5L, "nothing relevant to the query terms in this one at all")
    ).toDF("doc_id", "text")
    val negs = graft.functions.Rank.hardNegatives(docs, "doc_id", "text",
        Seq("dup", "vector", "merge"), k = 3, candidates = 4,
        maxJaccard = 0.5)
      .select("doc_id", "bm25_rank", "jaccard_pos")
      .as[(Long, Long, Double)].collect()
    // doc 2 is a near-copy of the positive (doc 1 or 2 wins rank 1; the
    // other is its near-dup) and must be gone
    val ids = negs.map(_._1).toSet
    assert(!(ids.contains(1L) && ids.contains(2L)), negs.mkString(", "))
    assert(ids.subsetOf(Set(1L, 2L, 3L, 4L)), negs.mkString(", "))
    // survivors arrive in ascending bm25 rank with sims under the cap
    assert(negs.map(_._2).toSeq === negs.map(_._2).sorted.toSeq)
    assert(negs.forall(_._3 <= 0.5))
    // with no jaccard cap every ranked candidate survives, including the
    // twin (doc 5 matches no query term, so only 3 candidates exist)
    val lax = graft.functions.Rank.hardNegatives(docs, "doc_id", "text",
        Seq("dup", "vector", "merge"), k = 4, candidates = 4,
        maxJaccard = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(lax.contains(1L) || lax.contains(2L))
    assert(lax.size === 3 && !lax.contains(5L))
  }

  test("rbo: hand-computed dyadic rationals, top-weighting, edge rows") {
    import spark.implicits._
    def ranking(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "neighbor_id", "rank")
    // identical 10-deep rankings score the full truncated mass 1 − 2^-10
    val ten = (1 to 10).map(r => (1L, r.toLong + 100L, r))
    val ident = Rank.rbo(ranking(ten: _*), ranking(ten: _*))
      .head()
    assert(ident.getLong(1) === 10L && ident.getDouble(2) === 0.999023)
    // two-doc lists: agreement only at rank 1 (w(1)/denom = 0.693065)
    // outweighs both docs present but swapped (2·w(2)/denom = 0.38613) —
    // the top-heaviness that makes RBO a serving metric, not recall
    val a2 = ranking((1L, 10L, 1), (1L, 11L, 2))
    val top1 = Rank.rbo(a2, ranking((1L, 10L, 1), (1L, 12L, 2))).head()
    assert(top1.getLong(1) === 1L && top1.getDouble(2) === 0.693065)
    val swap = Rank.rbo(a2, ranking((1L, 11L, 1), (1L, 10L, 2))).head()
    assert(swap.getLong(1) === 2L && swap.getDouble(2) === 0.38613)
    val ident2 = Rank.rbo(a2, a2).head()
    assert(ident2.getDouble(2) === 0.88613) // (w(1)+w(2))/denom
    // disjoint lists still emit the query's zero row
    val zero = Rank.rbo(a2, ranking((1L, 50L, 1), (1L, 51L, 2))).head()
    assert(zero.getLong(1) === 0L && zero.getDouble(2) === 0.0)
    // ranks beyond the depth are ignored, not scored
    val deep = Rank.rbo(a2,
      ranking((1L, 10L, 11), (1L, 11L, 12))).head()
    assert(deep.getLong(1) === 0L && deep.getDouble(2) === 0.0)
  }

  test("rbo grades IVF against exact cosine: more probes, higher overlap") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.filter(col("vec_id") < 10)
    val exact = graft.functions.Vec.bruteForceTopK(qs, emb, k = 10)
    def mean(nProbe: Int): Double = {
      val approx = graft.functions.Vec.ivfTopK(emb, qs, k = 10,
        nProbe = nProbe, cellCol = "label")
      val rows = Rank.rbo(exact, approx).collect()
      rows.map(_.getDouble(2)).sum / rows.length
    }
    val m1 = mean(1); val m4 = mean(4); val mAll = mean(10)
    assert(m1 <= m4 + 1e-9 && m4 <= mAll + 1e-9, s"$m1 $m4 $mAll")
    // probing every cell IS brute force: perfect rank agreement
    assert(mAll === 0.999023, s"$mAll")
  }

  test("qlDirichlet: FixLog-exact smoothed scores, unmatched-doc floor") {
    val docs = Seq(
      (1L, "a a b"), (2L, "a c c"), (3L, "b b b"), (4L, "z z z")
    ).toDF("doc_id", "text")
    val got = Rank.qlDirichletTopDocs(docs, "doc_id", "text",
        Seq("a", "b"), mu = 2L, k = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def L(x: Long): Long = graft.plans.FixLog.log2q(x)
    // C=12, cf_a=3, cf_b=4; score = pos + K0 - nq*L((dl+mu)*C)
    val base = L(2L * 3L) + L(2L * 4L) - 2L * L(5L * 12L)
    val s1 = (L(2L * 12L + 6L) - L(6L)) + (L(1L * 12L + 8L) - L(8L)) + base
    val s2 = (L(1L * 12L + 6L) - L(6L)) + base
    val s3 = (L(3L * 12L + 8L) - L(8L)) + base
    assert(got(1L) == ((2L, s1)))
    assert(got(2L) == ((1L, s2)))
    assert(got(3L) == ((1L, s3)))
    assert(got(4L) == ((0L, base))) // smoothing floor only
    // the doc matching both terms outranks single-term docs, which
    // outrank the unmatched floor
    assert(s1 > s2 && s1 > s3 && s2 > base && s3 > base)
  }

  test("qlDirichlet: longer docs dilute the smoothing floor") {
    val docs = Seq((1L, "x x"), (2L, "x x x x x x x x")).toDF("doc_id", "text")
    val r = Rank.qlDirichletTopDocs(docs, "doc_id", "text", Seq("q"),
        mu = 2L, k = 2).collect()
    // neither matches; both are pure floor -nq*L((dl+mu)*C): shorter wins
    assert(r.head.getLong(0) == 1L)
  }

  test("rakeKeywords: degree/freq phrase scores over stopword-broken runs") {
    val docs = Seq(
      (1L, "deep learning of the deep net"),
      (2L, "net")
    ).toDF("doc_id", "text")
    val got = Rank.rakeKeywords(docs, "doc_id", "text",
        stopwords = Seq("the", "of"), maxPhraseLen = 4, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // deep: freq 2 deg 4 -> 2e6; learning: 1/2 -> 2e6; net: freq 2
    // (phrases "deep net" len 2 + "net" len 1) deg 3 -> 1.5e6
    assert(got.toSeq == Seq(
      ("deep learning", 1L, 4000000L),
      ("deep net", 1L, 3500000L),
      ("net", 1L, 1500000L)))
  }

  test("rakeKeywords: runs longer than maxPhraseLen drop; dupes counted") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // one 5-run: dropped at 4
      (2L, "alpha beta"), (3L, "alpha beta")
    ).toDF("doc_id", "text")
    val got = Rank.rakeKeywords(docs, "doc_id", "text", Nil, 4, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only the two identical "alpha beta" phrases survive; each word
    // freq 2 deg 4 -> 2e6 + 2e6
    assert(got.toSeq == Seq(("alpha beta", 2L, 4000000L)))
  }
}
