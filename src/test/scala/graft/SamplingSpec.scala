package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sampling

/** Deterministic sampling/split/packing: reproducible, well-mixed, and
  * shape-correct.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val ids = spark.range(20000).toDF("id")

  test("hashSample is deterministic and lands near the requested fraction") {
    val n1 = Sampling.hashSample(ids, "id", 2000).count()
    val n2 = Sampling.hashSample(ids, "id", 2000).count()
    assert(n1 === n2) // rerun-identical
    assert(math.abs(n1 - 4000.0) / 4000.0 < 0.05, s"n=$n1")
    // sequential ids must not stripe: adjacent ids rarely co-sample
    val sampled = Sampling.hashSample(ids, "id", 1000)
      .select("id").as[Long].collect().toSet
    val adjacent = sampled.count(i => sampled.contains(i + 1))
    assert(adjacent < sampled.size / 5, s"adjacent=$adjacent of ${sampled.size}")
  }

  /** Driver replica of Sampling.hashOrder. */
  private def mixOf(key: Long): Long = {
    val p = 2147483647L
    val h1 = (((key % p) * 1103515245L + 12345L) % p + p) % p
    val h2 = (h1 * h1 + h1) % p
    (h2 * 784588716L + 998244353L) % p
  }

  test("prioritySample: exact top-k by integer w/u priority") {
    val rows = (0L until 5000L).map(i => (i, 1L + i % 97))
    val df = rows.toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = rows
      .map { case (id, w) => (id, w, w * 2147483647L / (mixOf(id) + 1L)) }
      .sortBy { case (id, _, pr) => (-pr, id) }
      .take(100).sortBy(_._1)
    assert(got.sortBy(_._1).toSeq == expect)
    // partition-invariant
    val again = Sampling.prioritySample(df.repartition(17), "id", "w", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq == expect)
  }

  test("prioritySample: heavier rows are sampled at a higher rate") {
    // 2500 light (w=1) and 2500 heavy (w=50) rows; a k=500 sample must
    // be dominated by the heavy half, and zero weights never sample
    val df = (0L until 5000L).map(i => (i, if (i % 2 == 0) 50L else 1L))
      .toDF("id", "w")
    val picked = Sampling.prioritySample(df, "id", "w", k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val heavy = picked.count(_._2 == 50L)
    assert(heavy > 400, s"heavy=$heavy of 500")
    val withZero = (0L until 100L).map(i => (i, if (i < 50) 0L else 1L))
      .toDF("id", "w")
    val nz = Sampling.prioritySample(withZero, "id", "w", k = 50)
      .collect().map(_.getLong(1))
    assert(nz.forall(_ > 0L), "zero-weight rows must never be sampled")
  }

  test("split-by-cluster: no near-dup component straddles splits") {
    val rows = SparkEntry.queries("q_split_by_cluster")(spark,
      "/root/testdata/sf0.001").collect()
    val byComp = rows.groupBy(_.getLong(1)).values
    assert(byComp.forall(g => g.map(_.getString(2)).toSet.size == 1),
      "a component received two different splits")
    assert(byComp.exists(_.size > 1),
      "fixture has no multi-doc component — the guarantee is untested")
    assert(rows.map(_.getString(2)).toSet.subsetOf(
      Set("train", "val", "test")))
  }

  test("splitAssign covers every row with near-weight proportions") {
    val split = Sampling.splitAssign(ids, "id",
      Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train") - 16000.0) / 16000.0 < 0.05, counts.toString)
    assert(math.abs(counts("val") - 2000.0) / 2000.0 < 0.15, counts.toString)
    assert(math.abs(counts("test") - 2000.0) / 2000.0 < 0.15, counts.toString)
    // assignment is a function of the key: same key, same split, any run
    val a = split.filter($"id" === 42).head().getString(1)
    val b = Sampling.splitAssign(ids, "id",
      Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
      .filter($"id" === 42).head().getString(1)
    assert(a === b)
    // NULL keys get a NULL split (not silently dumped into the last label)
    val withNull = Seq(Some(1L), None).toDF("id")
    val nulls = Sampling.splitAssign(withNull, "id", Seq("train" -> 10000))
      .filter($"id".isNull)
    assert(nulls.count() === 1 && nulls.head().isNullAt(1))
    // non-positive weights are a caller bug, rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(ids, "id", Seq("a" -> -100, "b" -> 200))
    }
    // string keys would cast to NULL buckets (or crash under ANSI) —
    // rejected at call time instead
    val strKeys = Seq("doc_a", "doc_b").toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(strKeys, "id", Seq("train" -> 10000))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSample(strKeys, "id", 1000)
    }
  }

  test("packBudget: packs are contiguous, ordered, and hold ~budget tokens") {
    val docs = (1 to 300).map(i => (i.toLong, i % 3, 10L + i % 7))
      .toDF("doc_id", "shard", "n_tokens")
    val packed = Sampling.packBudget(docs, "doc_id", "n_tokens", 100L,
      partCols = Seq("shard"))
    val rows = packed.select("shard", "doc_id", "n_tokens", "pack_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((_, group) <- rows.groupBy(_._1)) {
      val ordered = group.sortBy(_._2)
      // pack ids are non-decreasing in doc order and start at 0
      assert(ordered.head._4 === 0L)
      assert(ordered.sliding(2).forall(p => p(0)._4 <= p(1)._4))
      // each pack's tokens stay within budget + one straddling doc
      for ((_, pack) <- ordered.groupBy(_._4)) {
        val total = pack.map(_._3).sum
        val maxDoc = pack.map(_._3).max
        assert(total <= 100L + maxDoc, s"pack total=$total")
      }
    }
  }

  test("tokenBudgetSample caps each group's tokens with < 1 doc overshoot") {
    import spark.implicits._
    val docs = (1L to 60L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + i % 7)).toDF("id", "src", "toks")
    val out = Sampling.tokenBudgetSample(docs, "src", "toks", "id",
      Seq("a" -> 50L, "b" -> 120L))
    val per = out.groupBy("src").agg(sum("toks").as("t"), max("toks").as("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((src, budget) <- Seq("a" -> 50L, "b" -> 120L)) {
      val (total, maxTok) = per(src)
      assert(total >= budget && total < budget + maxTok,
        s"$src: total=$total budget=$budget")
    }
    // Deterministic; groups without a budget row are dropped.
    val again = Sampling.tokenBudgetSample(docs, "src", "toks", "id",
      Seq("a" -> 50L, "b" -> 120L)).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    val onlyA = Sampling.tokenBudgetSample(docs, "src", "toks", "id",
      Seq("a" -> 50L)).select("src").distinct().as[String].collect().toSeq
    assert(onlyA == Seq("a"))
  }

  test("temperatureMix flattens the head group as T rises") {
    val docs = Seq(
      ("en", 8100L), ("en", 8100L), ("en", 8100L), // head: 24300 tokens
      ("de", 900L), ("de", 700L),                  // mid: 1600
      ("zh", 100L)                                 // tail: 100
    ).toDF("lang", "toks")
    def shares(t: Int) = Sampling.temperatureMix(docs, "lang", "toks", t)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Double]("share")).toMap
    val s1 = shares(1); val s2 = shares(2); val s4 = shares(4)
    for (s <- Seq(s1, s2, s4))
      assert(math.abs(s.values.sum - 1.0) < 1e-4, s.toString)
    // proportional at T=1
    assert(math.abs(s1("en") - 24300.0 / 26000.0) < 1e-4)
    // monotone flattening: the head share falls, the tail share rises
    assert(s1("en") > s2("en") && s2("en") > s4("en"))
    assert(s1("zh") < s2("zh") && s2("zh") < s4("zh"))
    // T=2 is exactly the sqrt mix (quantized weights)
    val w2 = Sampling.temperatureMix(docs, "lang", "toks", 2)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Long]("weight")).toMap
    assert(w2("en") === math.floor(math.sqrt(24300.0) * 1e6).toLong)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", "toks", 3)
    }
  }

  test("mixConcentration: HHI spans even mix to single-category") {
    val rows = Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s1", "fr")) ++
      Seq.fill(20)(("s2", "en")) ++
      Seq.fill(12)(("s3", "en")) ++ Seq.fill(4)(("s3", "de")) ++
      Seq.fill(4)(("s3", "zh"))
    val got = Sampling.mixConcentration(rows.toDF("source", "lang"),
        "source", "lang")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_parts"),
          r.getAs[Double]("dom_share"), r.getAs[Double]("hhi")))).toMap
    assert(got("s1") === ((20L, 2L, 0.5, 0.5)))       // even 2-way: HHI 1/2
    assert(got("s2") === ((20L, 1L, 1.0, 1.0)))       // monoculture
    // s3: shares (12,4,4)/20 -> HHI = (144+16+16)/400 = 0.44
    assert(got("s3") === ((20L, 3L, 0.6, 0.44)))
  }

  test("chunkByTokens: windows reassemble the token stream with exact overlap") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc"), (3L, ""), (4L, (1 to 64).map(i => s"u$i").mkString(" ")))
      .toDF("id", "text")
    val out = graft.functions.Chunk.chunkByTokens(docs, "id", "text", 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    // 150 tokens, stride 48: ceil((150-64)/48) = 2 extra chunks, starting
    // at 0/48/96 (the window at 96 reaches token 160 >= 150) -> 3 chunks.
    val c1 = byDoc(1L).sortBy(_._2)
    assert(c1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(c1.take(2).forall(_._4 == 64L) && c1.last._4 == 54L)
    // Consecutive chunks share exactly the 16-token overlap.
    for (Seq(a, b) <- c1.toSeq.sliding(2)) {
      val at = a._3.split(" ")
      val bt = b._3.split(" ")
      assert(at.takeRight(16).sameElements(bt.take(16)), s"${a._2}->${b._2}")
    }
    // Reassembly: dropping each successor's overlap restores the doc.
    val reassembled = (c1.head._3.split(" ") ++
      c1.tail.flatMap(_._3.split(" ").drop(16))).mkString(" ")
    assert(reassembled == text)
    // Short doc -> one whole chunk; empty doc -> none; exact fit -> one.
    assert(byDoc(2L).toSeq == Seq((2L, 0L, "short doc", 2L)))
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).map(_._2).toSeq == Seq(0L))
  }

  test("shardAssign: dense positions, near-uniform shards, order-stable") {
    val small = spark.range(5000).toDF("id")
    val a = Sampling.shardAssign(small, "id", 8).cache()
    assert(a.count() === 5000L)
    // pos is dense 0..n-1 within every shard
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("mn"),
        max($"pos").as("mx"), countDistinct($"pos").as("nd"))
      .filter($"mn" =!= 0L || $"mx" =!= $"n" - 1L || $"nd" =!= $"n")
      .count()
    assert(bad === 0L)
    // shards are near-uniform (5000/8 = 625 expected)
    val counts = a.groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length === 8 &&
      counts.forall(c => math.abs(c - 625.0) / 625.0 < 0.2),
      counts.mkString(","))
    // bit-identical under a different input partitioning
    val b = Sampling.shardAssign(small.repartition(13), "id", 8)
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
    // null keys are dropped, everything else keeps its assignment
    val withNull = small.select(when($"id" === 7L, lit(null))
      .otherwise($"id").cast("long").as("id"))
    val c = Sampling.shardAssign(withNull, "id", 8)
    assert(c.count() === 4999L)
    a.unpersist()
  }

  test("shardAssign scrambles sequential id order within a shard") {
    val a = Sampling.shardAssign(spark.range(5000).toDF("id"), "id", 1)
    // in training order (pos), formerly-adjacent ids must almost never
    // remain adjacent — the whole point of the shuffle
    val w = org.apache.spark.sql.expressions.Window.orderBy($"pos")
    val adj = a.withColumn("prev", lag($"id", 1).over(w))
      .filter(abs($"id" - $"prev") === 1L).count()
    assert(adj < 50L, s"adjacent=$adj")
  }

  // one row per (group, token-count) pair → a corpus whose per-group
  // token sums are exactly the given map
  private def corpusOf(masses: (String, Long)*) = {
    masses.toSeq.toDF("src", "n_tok")
  }

  test("unimaxAllocate: hand-computed waterfill — capped prefix, uniform rest") {
    // caps (E=2): a→20, b→40, c→200; budget 100.
    // a: 20·3 <= 100 capped; b: 40·2 <= 80 capped; c: 200 > 40 → alloc 40.
    val got = Sampling.unimaxAllocate(
        corpusOf("a" -> 10L, "b" -> 20L, "c" -> 100L),
        "src", "n_tok", budget = 100L, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("a") === ((10L, 20L, 20L, 2.0)))
    assert(got("b") === ((20L, 40L, 40L, 2.0)))
    assert(got("c") === ((100L, 200L, 40L, 0.4)))
    assert(got.values.map(_._3).sum === 100L) // budget fully spent
  }

  test("unimaxAllocate: integer remainder goes to the first uncapped groups") {
    // all uncapped (E=1, budget 11 over caps 3,10,10,10: 3·4=12 > 11):
    // base 11 div 4 = 2, remainder 3 → first three in (cap, group) order
    val got = Sampling.unimaxAllocate(
        corpusOf("w" -> 3L, "x" -> 10L, "y" -> 10L, "z" -> 10L),
        "src", "n_tok", budget = 11L, maxEpochs = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("w" -> 3L, "x" -> 3L, "y" -> 3L, "z" -> 2L))
    assert(got.values.sum === 11L)
  }

  test("unimaxAllocate: epoch cap binds — surplus budget stays unallocated") {
    val got = Sampling.unimaxAllocate(
        corpusOf("a" -> 5L, "b" -> 7L),
        "src", "n_tok", budget = 1000L, maxEpochs = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("a" -> 15L, "b" -> 21L)) // caps, not budget/2
  }

  test("unimaxAllocate invariants on real data at several budgets") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (budget <- Seq(0L, 10000L, 60000L, 100000000L)) {
      val rows = Sampling.unimaxAllocate(docs, "lang", "n_chars",
          budget, maxEpochs = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(rows.forall { case (_, n, cap, alloc) =>
        cap === n * 2 && alloc >= 0 && alloc <= cap })
      val spent = rows.map(_._4).sum
      val allCapped = rows.forall { case (_, _, cap, alloc) => alloc === cap }
      // either the budget is exactly spent, or every group hit its cap
      assert(spent === budget || (allCapped && spent <= budget),
        s"budget=$budget spent=$spent")
      // waterfill fairness: every uncapped alloc >= every capped cap,
      // and uncapped allocs differ by at most one
      val uncapped = rows.filter { case (_, _, cap, a) => a < cap }.map(_._4)
      val capped = rows.filter { case (_, _, cap, a) => a === cap }.map(_._3)
      if (uncapped.nonEmpty) {
        assert(uncapped.max - uncapped.min <= 1L)
        if (capped.nonEmpty) assert(uncapped.min >= capped.max)
      }
    }
  }

  test("curriculumOrder: dense round-robin interleave of NTILE tiers") {
    import org.apache.spark.sql.functions.col
    // 10 docs, difficulty = id (ascending); k = 4 -> tiers sized 3,3,2,2
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val out = Sampling.curriculumOrder(df.repartition(5), "id", "s", 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    // order_idx is a dense 1..n permutation
    assert(out.map(_._3).toSeq === (1L to 10L))
    // the first k positions hold one doc of EACH tier, easiest first:
    // tier starts are docs 1, 4, 7, 9
    assert(out.take(4).map(_._1).toSeq === Seq(1L, 4L, 7L, 9L))
    assert(out.take(4).map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
    // tiers partition the ranked corpus into contiguous runs 3/3/2/2
    val byTier = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byTier(1L) === Set(1L, 2L, 3L))
    assert(byTier(2L) === Set(4L, 5L, 6L))
    assert(byTier(3L) === Set(7L, 8L))
    assert(byTier(4L) === Set(9L, 10L))
    // exhausted tiers simply drop out of the tail of the rotation
    assert(out.drop(8).map(_._1).toSeq === Seq(3L, 6L))
  }

  test("neymanAllocation: volatile strata win, budget lands exactly, " +
      "degenerate fallbacks") {
    import spark.implicits._
    // a = {0,10} (w = floor(sqrt(200)) = 14), b = {5,5} (zero spread),
    // c = {7} (n < 2): the whole budget goes to the volatile stratum
    val df = Seq(("a", 0L), ("a", 10L), ("b", 5L), ("b", 5L), ("c", 7L))
      .toDF("g", "v")
    val got = Sampling.neymanAllocation(df, "g", "v", budget = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((2L, 14L, 10L)))
    assert(got("b") == ((2L, 0L, 0L)) && got("c") == ((1L, 0L, 0L)))
    assert(got.values.map(_._3).sum == 10L)
    // all-constant strata: zero total weight falls back to EQUAL
    // weights, largest-remainder still lands the budget exactly
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 3L), ("b", 3L),
      ("c", 9L), ("c", 9L)).toDF("g", "v")
    val eq = Sampling.neymanAllocation(flat, "g", "v", budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(eq.values.sum == 10L)
    // 10 over 3 equal strata: 3 each + the tie-broken extra to 'a'
    assert(eq == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("htEstimate: exact debias identity and deterministic inclusion") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, i % 7L))
    val df = rows.toDF("id", "v")
    val r = Sampling.htEstimate(df, "id", "v", bps = 1000).collect()(0)
    // replay the mixer to compute the expected sample
    def mix(x: Long): Long = {
      val p = 2147483647L
      val h1 = ((x % p) * 1103515245L + 12345L) % p
      val h2 = (h1 * h1 + h1) % p
      (h2 * 784588716L + 998244353L) % p
    }
    val in = rows.filter { case (id, _) => mix(id) % 10000L < 1000L }
    assert(r.getLong(0) == in.size.toLong)
    assert(r.getLong(1) == in.map(_._2).sum)
    assert(r.getLong(2) == in.map(_._2).sum * 10L) // exact 10% debias
    assert(r.getLong(3) == rows.map(_._2).sum)
    assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
  }

  test("paretoFront: hand case with value ties and exact duplicates") {
    val pts = Seq((1L, 1L, 5L), (2L, 1L, 7L), (3L, 2L, 9L), (4L, 2L, 9L),
      (5L, 3L, 9L), (6L, 3L, 4L), (7L, 4L, 10L), (8L, 5L, 10L))
      .toDF("id", "x", "y")
    val got = Sampling.paretoFront(pts, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    // (1,7) beats (1,5); both (2,9) duplicates survive (no strict coord);
    // x=3 rows dominated by (2,9); (4,10) in; (5,10) beaten by (4,10)
    assert(got == Set(2L, 3L, 4L, 7L))
  }

  test("spanCorruptionPlan: deterministic, near requested density, " +
      "spans = maximal masked runs") {
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val r1 = Sampling.spanCorruptionPlan(docs, "doc_id", "text", 1500L)
      .collect()(0)
    val r2 = Sampling.spanCorruptionPlan(docs, "doc_id", "text", 1500L)
      .collect()(0)
    assert(r1.toSeq == r2.toSeq) // rerun-identical
    assert(r1.getAs[Long]("n_tokens") == 400L)
    val masked = r1.getAs[Long]("n_masked")
    assert(masked > 20L && masked < 120L, s"n_masked=$masked at 15%")
    // replay the plan on the driver: spans == maximal runs
    val flags = (0 until 400).map { p =>
      val key = 7L * 1048576L + p
      mixOf(key) % 10000L < 1500L
    }
    assert(masked == flags.count(identity).toLong)
    val spans = flags.zip(false +: flags.init).count {
      case (m, prev) => m && !prev
    }
    assert(r1.getAs[Long]("n_spans") == spans.toLong)
  }

  test("paretoFront matches the quadratic definition on random points") {
    val rnd = new scala.util.Random(41)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = Sampling.paretoFront(pts.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y)
      }
    }.map(_._1).toSet
    assert(got == brute)
  }
}
