package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.merge.Merge
import graft.ops.Medallion

/** Property-based invariants (SURVEY.md §5.3) over randomized inputs:
  * the clean/quarantine split partitions the input, abs-repair is
  * idempotent, merge conserves rows and statuses.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic stand-in for scalatestplus forAll (not on the
    * classpath): evaluate the generator under 8 fixed seeds.
    */
  def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 8).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }
  def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 8).foreach { i =>
      f(g1.apply(Gen.Parameters.default, Seed(i.toLong)).get,
        g2.apply(Gen.Parameters.default, Seed(i.toLong + 100)).get)
    }

  val rowsGen: Gen[List[(Long, Long, String)]] = Gen.listOfN(40,
    for {
      id <- Gen.choose(0L, 15L)
      rt <- Gen.choose(-200L, 200L)
      st <- Gen.oneOf("new", "loaded", "quarantined")
    } yield (id, rt, st))

  test("property: clean ∪ quarantine = distinct(input), clean ∩ quarantine = ∅") {
    import spark.implicits._
    forAll(rowsGen) { rows =>
      val df = rows.toDF("Id", "RunTime", "status").distinct()
      val (clean, quar) = Medallion.cleanQuarantineSplit(df, col("RunTime") >= 0)
      val c = clean.collect().toSet
      val q = quar.collect().toSet
      assert((c & q).isEmpty)
      assert((c | q) === df.collect().toSet) // RunTime never null here
    }
  }

  test("property: abs repair is idempotent and sign-erasing") {
    import spark.implicits._
    forAll(rowsGen) { rows =>
      val df = rows.toDF("Id", "RunTime", "status")
      val once = Medallion.repairAbs(df, "RunTime")
      val twice = Medallion.repairAbs(once, "RunTime")
      assert(once.filter(col("RunTime") < 0).count() === 0)
      assert(twice.exceptAll(once).count() === 0)
    }
  }

  test("property: whenMatchedUpdate conserves row count and non-key columns") {
    import spark.implicits._
    forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("Id", "RunTime", "status").dropDuplicates("Id")
      val source = s.toDF("Id", "RunTime", "status")
        .select(col("Id"), lit("loaded").as("status")).dropDuplicates("Id")
      val merged = Merge.whenMatchedUpdate(target, source, Seq("Id"), Seq("status"))
      // expected semantics computed independently in plain Scala
      val srcIds = source.select("Id").as[Long].collect().toSet
      val expected = target.collect().map { r =>
        val id = r.getAs[Long]("Id")
        (id, r.getAs[Long]("RunTime"),
          if (srcIds.contains(id)) "loaded" else r.getAs[String]("status"))
      }.toSet
      val got = merged.collect().map(r => (r.getAs[Long]("Id"),
        r.getAs[Long]("RunTime"), r.getAs[String]("status"))).toSet
      assert(got === expected)
    }
  }

  test("property: upsert is idempotent on identical source") {
    import spark.implicits._
    forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("Id", "RunTime", "status").dropDuplicates("Id")
      val source = s.toDF("Id", "RunTime", "status").dropDuplicates("Id")
      val once = Merge.upsert(target, source, Seq("Id"), Seq("RunTime", "status"))
      val twice = Merge.upsert(once, source, Seq("Id"), Seq("RunTime", "status"))
      assert(once.collect().toSet === twice.collect().toSet)
    }
  }

  val valsGen: Gen[List[(Long, Double)]] = Gen.listOfN(30,
    for {
      id <- Gen.choose(0L, 1000L)
      // grid-ish values make exact band-boundary collisions likely,
      // exercising the inclusive-edge and bucket-boundary paths
      x <- Gen.choose(-40, 40).map(_ * 0.25)
    } yield (id, x))

  test("property: token-scan kernels equal their HOF reference forms on fuzzed text") {
    import spark.implicits._
    // Strings over a hostile alphabet: every \s class member, multibyte
    // chars, an astral code point, punctuation, and marker words.
    val atom = Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r",
      "the", "and", "café", "😀", "x", "a-b", ".", "the\tand", "  ")
    val textGen = Gen.listOfN(40, atom).map(_.mkString)
    forAll(Gen.listOfN(25, textGen)) { texts =>
      val words = Seq("the", "and")
      val df = texts.toDF("text")
      val tk = graft.functions.Text.tokens(col("text"))
      val rows = df.select(
        graft.plans.TextExpressions.tokenCount(col("text")).as("nf"),
        size(tk).as("ns"),
        graft.plans.TextExpressions.tokenChars(col("text")).as("cf"),
        aggregate(tk, lit(0L), (acc, t) => acc + length(t)).as("cs"),
        graft.plans.TextExpressions.markerHits(col("text"), words).as("hf"),
        size(filter(tk, t => array_contains(array(words.map(lit): _*), t))).as("hs"),
        graft.plans.TextExpressions.repetitionRatio(col("text"), 2).as("rf"),
        when(size(graft.functions.Text.wordNgrams(tk, 2)) > 0,
          lit(1.0) - size(array_distinct(graft.functions.Text.wordNgrams(tk, 2))).cast("double") /
            size(graft.functions.Text.wordNgrams(tk, 2)).cast("double"))
          .otherwise(lit(0.0)).as("rs")
      ).collect()
      for (r <- rows) {
        assert(r.getInt(0) == r.getInt(1), s"tokenCount: $r")
        assert(r.getLong(2) == r.getLong(3), s"tokenChars: $r")
        assert(r.getInt(4) == r.getInt(5), s"markerHits: $r")
        assert(r.getDouble(6) == r.getDouble(7), s"repetitionRatio: $r")
      }
      // tokenGini vs a Scala-side reference over the same tokenization
      val ginis = df.select(col("text"),
        graft.plans.TextExpressions.tokenGini(col("text")).as("g")).collect()
      for (r <- ginis) {
        val toks = r.getString(0).split("\\s+").filter(_.nonEmpty)
        val expected = if (toks.isEmpty) 0.0 else {
          val ss = toks.groupBy(identity).values
            .map(g => g.size.toLong * g.size).sum
          1.0 - ss.toDouble / (toks.length.toDouble * toks.length.toDouble)
        }
        assert(r.getDouble(1) == expected, s"tokenGini: $r")
      }
    }
  }

  test("property: scan-stage simhash equals the aggregate form on fuzzed corpora") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "δδ", "x1", "🙂")
    val docGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.listOfN(30, docGen)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .filter(graft.functions.Text.tokenCount(col("text")) > 0)
      val viaAgg = graft.functions.Dedup.simhash(
        df.select(col("doc_id"),
          graft.plans.TextExpressions.hashedShingles(col("text"), 1)),
        "doc_id", col("tid"), bits = 20)
      val viaScan = df.select(col("doc_id"),
        graft.functions.Dedup.simhashScan(col("text"), 20).as("simhash"))
      assert(viaAgg.exceptAll(viaScan).isEmpty &&
        viaScan.exceptAll(viaAgg).isEmpty)
    }
  }

  test("property: bandJoin equals the naive inequality join") {
    import spark.implicits._
    forAll(valsGen, valsGen) { (l, r) =>
      val left = l.toDF("lid", "lx").dropDuplicates("lid")
      val right = r.toDF("rid", "rx").dropDuplicates("rid")
      val naive = left.join(right, abs(col("lx") - col("rx")) <= 0.5)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      val banded = graft.ops.RangeJoin.bandJoin(left, right, "lx", "rx", 0.5)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(banded.sorted.toSeq === naive.sorted.toSeq) // incl. multiplicity
    }
  }

  test("property: intervalJoin equals the naive between join") {
    import spark.implicits._
    val ivGen: Gen[List[(Long, Double, Double)]] = Gen.listOfN(20,
      for {
        id <- Gen.choose(0L, 1000L)
        lo <- Gen.choose(-40, 40).map(_ * 0.25)
        span <- Gen.choose(0, 12).map(_ * 0.25)
      } yield (id, lo, lo + span))
    forAll(valsGen, ivGen) { (p, iv) =>
      val pts = p.toDF("pid", "px").dropDuplicates("pid")
      val ivs = iv.toDF("ivid", "lo", "hi").dropDuplicates("ivid")
      val naive = pts.join(ivs, col("px") >= col("lo") && col("px") <= col("hi"))
        .select("pid", "ivid").collect().map(x => (x.getLong(0), x.getLong(1)))
      val bucketed = graft.ops.RangeJoin
        .intervalJoin(pts, ivs, "px", "lo", "hi", 1.0)
        .select("pid", "ivid").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(bucketed.sorted.toSeq === naive.sorted.toSeq)
    }
  }

  /** Random tiny corpora for the fixed-point scorers: 3-8 docs over a
    * 6-word vocabulary (dense enough to collide terms across docs).
    */
  val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(3, 8)
    docs <- Gen.listOfN(n,
      Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("ape", "bee", "cat", "dog", "elk", "fox"))
          .map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: BM25 equals an independent BigInt model on fuzzed corpora") {
    import spark.implicits._
    forAll(corpusGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val query = Seq("ape", "cat", "fox")
      val got = graft.functions.Rank
        .bm25TopDocs(docs, "doc_id", "text", query, 100)
        .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
      // Independent model: same formula, BigInt end to end.
      val toks = rows.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val nDocs = rows.size.toLong
      val tTok = toks.values.map(_.size.toLong).sum
      val expected = rows.flatMap { case (id, _) =>
        val dl = toks(id).size.toLong
        val perTerm = query.flatMap { term =>
          val tf = toks(id).count(_ == term).toLong
          if (tf == 0) None
          else {
            val df = toks.values.count(_.contains(term)).toLong
            val num = BigInt(2 * nDocs + 2) * 44 * tf * tTok * 1000000L
            val den = BigInt(2 * df + 1) *
              (BigInt(20) * tf * tTok + BigInt(6) * tTok +
                BigInt(18) * dl * nDocs)
            Some(num / den)
          }
        }
        if (perTerm.isEmpty) None else Some(id -> perTerm.sum.toLong)
      }.toMap
      assert(got == expected)
    }
  }

  test("property: DSIR scores equal an independent BigInt model on fuzzed corpora") {
    import spark.implicits._
    val b = 32
    def polyBucket(tok: String): Long =
      tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L) % b
    forAll(corpusGen, corpusGen) { (rawRows, targetRows) =>
      val raw = rawRows.toDF("doc_id", "text")
      val target = targetRows.map { case (i, t) => (i + 1000L, t) }
        .toDF("doc_id", "text")
      val got = graft.functions.Importance
        .importanceScores(raw, target, "doc_id", "text", nBuckets = b)
        .select("doc_id", "n_tokens", "score_q")
        .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      val rawToks = rawRows.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val rc = rawToks.values.flatten.map(polyBucket)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val tc = targetRows.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
        .map(polyBucket).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val nR = rc.values.sum; val nT = tc.values.sum
      val expected = rawToks.collect { case (id, ts) if ts.nonEmpty =>
        val lr = ts.map(polyBucket).map { bk =>
          (BigInt(tc.getOrElse(bk, 0L) + 1) * BigInt(nR + b) * 1000000L) /
            (BigInt(rc.getOrElse(bk, 0L) + 1) * BigInt(nT + b))
        }
        id -> (ts.size.toLong, (lr.sum / BigInt(ts.size)).toLong)
      }
      assert(got == expected)
    }
  }

  test("property: Kneser-Ney probs equal an independent BigInt model on fuzzed corpora") {
    import spark.implicits._
    def h(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    forAll(corpusGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val got = graft.functions.LangModel.knBigramProbs(docs, "text")
        .select("tid_a", "tid_b", "c_ab", "pkn_q")
        .as[(Long, Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
      val pairs = rows.flatMap { case (_, t) =>
        val ts = t.split("\\s+").filter(_.nonEmpty)
        ts.zip(ts.drop(1)).map { case (a, b) => (h(a), h(b)) }
      }
      val cab = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      if (cab.nonEmpty) {
        val ca = cab.groupBy(_._1._1).map { case (a, m) =>
          a -> (m.values.sum, m.size.toLong) }
        val cb = cab.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
        val np = cab.size.toLong
        val expected = cab.map { case ((a, b), c) =>
          val (sumA, n1a) = ca(a)
          val num = (BigInt(math.max(4 * c - 3, 0L)) * np +
            BigInt(3) * n1a * cb(b)) * 1000000000L
          (a, b) -> (c, (num / (BigInt(4) * sumA * np)).toLong)
        }
        assert(got == expected)
      } else assert(got.isEmpty)
    }
  }

  test("property: KN trigram probs equal an independent BigInt model on fuzzed corpora") {
    import spark.implicits._
    def h(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val B = BigInt(1000000000L)
    forAll(corpusGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val got = graft.functions.LangModel.knTrigramProbs(docs, "text")
        .select("tid_a", "tid_b", "tid_c", "c_abc", "pkn_q")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(t => (t._1, t._2, t._3) -> (t._4, t._5)).toMap
      // independent model: bigram probs first, then the trigram clear
      val toks = rows.map(_._2.split("\\s+").filter(_.nonEmpty).map(h))
      val bpairs = toks.flatMap(ts => ts.zip(ts.drop(1)))
      val cab2 = bpairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val triples = toks.flatMap(ts =>
        ts.lazyZip(ts.drop(1)).lazyZip(ts.drop(2)).map((a, b, c) => (a, b, c)))
      val cabc = triples.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      if (cabc.nonEmpty) {
        val ca2 = cab2.groupBy(_._1._1).map { case (a, m) =>
          a -> (m.values.sum, m.size.toLong) }
        val cb2 = cab2.groupBy(_._1._2).map { case (b, m) => b -> m.size.toLong }
        val np = cab2.size.toLong
        def p2(b: Long, c: Long): BigInt = {
          val cnt = cab2((b, c))
          val (sumA, n1a) = ca2(b)
          (BigInt(math.max(4 * cnt - 3, 0L)) * np +
            BigInt(3) * n1a * cb2(c)) * B / (BigInt(4) * sumA * np)
        }
        val cab3 = cabc.groupBy { case ((a, b, _), _) => (a, b) }
          .map { case (k, m) => k -> (m.values.sum, m.size.toLong) }
        val expected = cabc.map { case ((a, b, c), cnt) =>
          val (sumC, n1fw) = cab3((a, b))
          val num = BigInt(math.max(4 * cnt - 3, 0L)) * B +
            BigInt(3) * n1fw * p2(b, c)
          (a, b, c) -> (cnt, (num / (BigInt(4) * sumC)).toLong)
        }
        assert(got == expected)
      } else assert(got.isEmpty)
    }
  }

  test("property: PageRank conserves mass and keeps ranks positive on fuzzed corpora") {
    import spark.implicits._
    forAll(corpusGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val ranks = graft.functions.Graph.textRank(docs, "text", 2, 1000)
        .select("rank_q").as[Long].collect()
      if (ranks.nonEmpty) {
        assert(ranks.forall(_ > 0))
        val total = ranks.sum
        // Floors drift mass strictly down, never up, and only slightly.
        assert(total <= 1000000000000L)
        assert(total > 1000000000000L - 2000L * (ranks.length + 1) *
          (ranks.length + 1))
      }
    }
  }

  val twoSampleGen: Gen[List[(Long, Boolean)]] = Gen.listOfN(60,
    for {
      v <- Gen.choose(0L, 30L)
      side <- Gen.oneOf(true, false)
    } yield (v, side))

  test("property: Mann-Whitney z² is invariant under strictly monotone " +
      "maps; U sides are complementary") {
    import spark.implicits._
    import graft.functions.Stats
    forAll(twoSampleGen) { rows =>
      val df = rows.toDF("v", "a")
      val r = Stats.mannWhitneyU(df, "v", col("a"), !col("a")).collect()(0)
      // ranks only see order: v -> 7v + 3 changes nothing
      val mapped = rows.map { case (v, s) => (7L * v + 3L, s) }
        .toDF("v", "a")
      val m = Stats.mannWhitneyU(mapped, "v", col("a"), !col("a"))
        .collect()(0)
      assert(r.getLong(2) == m.getLong(2))
      assert(r.isNullAt(3) == m.isNullAt(3))
      if (!r.isNullAt(3)) assert(r.getLong(3) == m.getLong(3))
      // U_a + U_b = n_a * n_b (at 2x scale)
      val rb = Stats.mannWhitneyU(df, "v", !col("a"), col("a"))
        .collect()(0)
      assert(r.getLong(2) + rb.getLong(2) ==
        2L * r.getLong(0) * r.getLong(1))
    }
  }

  test("property: Wasserstein-1 is translation-invariant, scales " +
      "linearly, and vanishes iff the multisets match") {
    import spark.implicits._
    import graft.functions.Stats
    forAll(twoSampleGen) { rows =>
      val df = rows.toDF("v", "a")
      val r = Stats.wasserstein1(df, "v", col("a"), !col("a")).collect()(0)
      if (r.getLong(0) > 0 && r.getLong(1) > 0) {
        val shift = rows.map { case (v, s) => (v + 11L, s) }.toDF("v", "a")
        val sR = Stats.wasserstein1(shift, "v", col("a"), !col("a"))
          .collect()(0)
        assert(r.getLong(2) == sR.getLong(2), "translation invariance")
        val scaled = rows.map { case (v, s) => (5L * v, s) }.toDF("v", "a")
        val kR = Stats.wasserstein1(scaled, "v", col("a"), !col("a"))
          .collect()(0)
        assert(kR.getLong(2) == 5L * r.getLong(2), "positive homogeneity")
        val aSorted = rows.filter(_._2).map(_._1).sorted
        val bSorted = rows.filterNot(_._2).map(_._1).sorted
        if (aSorted == bSorted) assert(r.getLong(2) == 0L)
      }
    }
  }

  test("property: conformal sets always hold the argmax, and shrinking " +
      "alpha only grows tau, coverage, and set size") {
    import spark.implicits._
    import graft.functions.Eval
    forAll(Gen.listOfN(80, for {
      id <- Gen.choose(0L, 100000L)
      s1 <- Gen.choose(0L, 50L)
      s2 <- Gen.choose(0L, 50L)
    } yield (id, s1, s2))) { raw =>
      val rows = raw.distinctBy(_._1)
      if (rows.size >= 20) {
        val po = rows.flatMap { case (id, s1, s2) =>
          val (hi, lo) = (math.max(s1, s2), math.min(s1, s2))
          Seq((id, "a", hi, 1), (id, "b", lo, 2))
        }.toDF("doc_id", "class", "score_q", "rank")
        val truth = rows.map { case (id, _, _) =>
          (id, if (id % 2 == 0) "a" else "b")
        }.toDF("doc_id", "lang")
        def run(alphaBps: Int) = Eval.conformalSplit(po, truth,
          "doc_id", "lang", col("doc_id") % 3 === 0, alphaBps)
          .collect()(0)
        val strict = run(5000)
        val loose = run(1000)
        for (r <- Seq(strict, loose) if !r.isNullAt(2) && r.getLong(3) > 0) {
          // tau >= 0, so the argmax (nonconformity 0) is ALWAYS in the
          // set: sizes live in [1, n_classes] exactly
          assert(r.getLong(2) >= 0L)
          assert(r.getLong(6) >= 1000000L && r.getLong(6) <= 2000000L)
        }
        // smaller alpha -> higher rank -> weakly larger tau, coverage,
        // and set size (the validity/efficiency dial is monotone)
        if (!strict.isNullAt(2) && !loose.isNullAt(2)) {
          assert(loose.getLong(2) >= strict.getLong(2))
          if (strict.getLong(3) > 0) {
            assert(loose.getLong(5) >= strict.getLong(5))
            assert(loose.getLong(6) >= strict.getLong(6))
          }
        }
      }
    }
  }
}
