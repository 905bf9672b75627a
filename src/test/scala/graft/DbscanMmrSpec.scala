package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vec

/** Density clustering (grid-blocked DBSCAN) and diversity re-ranking
  * (MMR) against brute-force references computed in plain Scala. */
class DbscanMmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference DBSCAN: all-pairs neighborhoods (self-inclusive core
    * test), min-label components over core-core edges, min-label border
    * attach — the exact semantics dbscanGrid promises. */
  private def bruteDbscan(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (String, Long)] = {
    val nbr = pts.map { case (i, x, y) =>
      i -> pts.collect { case (j, a, b)
        if (x - a) * (x - a) + (y - b) * (y - b) <= eps * eps => j }
    }.toMap
    val core = nbr.filter(_._2.size >= minPts).keySet
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    for (c <- core; n <- nbr(c) if core(n)) {
      val (a, b) = (find(c), find(n))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val comp = core.map(c => c -> find(c)).toMap
    pts.map { case (i, _, _) =>
      if (core(i)) i -> (("core", comp(i)))
      else {
        val cn = nbr(i).filter(core)
        if (cn.nonEmpty) i -> (("border", cn.map(comp).min))
        else i -> (("noise", -1L))
      }
    }.toMap
  }

  private def runDbscan(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (String, Long)] = {
    val df = pts.map { case (i, x, y) =>
      (i, Array(x.toFloat, y.toFloat)) }.toDF("vec_id", "embedding")
    Vec.dbscanGrid(df, eps, minPts).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("dbscanGrid equals brute force on an engineered fixture") {
    val eps = 0.1
    // Cluster around the origin STRADDLING the cell boundary at x = 0
    // (the 3x3 blocking case), a border point hanging off it, a second
    // two-point dense pair that is NOT core (minPts = 4), and far noise.
    val pts = Seq(
      (1L, -0.02, 0.0), (2L, 0.02, 0.0), (3L, -0.02, 0.05),
      (4L, 0.02, 0.05), (5L, 0.0, -0.04),            // dense: all core
      (6L, 0.11, 0.0),                               // border off 2
      (7L, 2.0, 2.0), (8L, 2.05, 2.0),               // pair, not core
      (9L, -3.0, 1.0)                                // lone noise
    )
    val exp = bruteDbscan(pts, eps, minPts = 4)
    assert(runDbscan(pts, eps, minPts = 4) == exp)
    // The fixture must exercise every role.
    assert(exp(1L)._1 == "core" && exp(6L)._1 == "border" &&
      exp(9L) == (("noise", -1L)) && exp(7L)._1 == "noise")
    // Cross-boundary points share one cluster labeled by the min core id.
    assert(exp(2L) == (("core", 1L)) && exp(6L)._2 == 1L)
  }

  test("dbscanGrid equals brute force on seeded pseudo-random points") {
    val rnd = new scala.util.Random(42)
    val pts = (0L until 80L).map(i =>
      (i, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1))
    for ((eps, minPts) <- Seq((0.15, 3), (0.3, 5))) {
      val exp = bruteDbscan(pts, eps, minPts)
      assert(runDbscan(pts, eps, minPts) == exp, s"eps=$eps minPts=$minPts")
      assert(exp.values.exists(_._1 == "core") &&
        exp.values.exists(_._1 == "noise"))
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Reference MMR: plain-Scala greedy over brute-force rounded cosines. */
  private def bruteMmr(q: Array[Float], corpus: Seq[(Long, Array[Float])],
      k: Int, shortlist: Int, lambda: Double): Seq[(Long, Long)] = {
    val rel = corpus.map { case (i, v) => i -> cos6(q, v) }
      .sortBy { case (i, s) => (-s, i) }.take(shortlist).toMap
    val ids = rel.keySet.toSeq.sorted
    val vec = corpus.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to k).map { step =>
      val pick = ids.filterNot(selected.contains).map { c =>
        val pen = if (selected.isEmpty) 0.0
          else selected.map(s => cos6(vec(c), vec(s))).max
        (c, lambda * rel(c) - (1.0 - lambda) * pen)
      }.minBy { case (i, m) => (-m, i) }._1
      selected += pick
      (step.toLong, pick)
    }
  }

  test("mmrTopK equals the plain-Scala greedy and diversifies duplicates") {
    // Near-duplicate twins (10, 11) OFF the query axis plus an equally
    // relevant mirror direction (12): relevance-only top-2 is (10, 11);
    // MMR at lambda=0.6 must pick 10 then skip its twin (penalty ~1) for
    // 12 (same relevance, similarity to 10 only ~0.66). The twins sit
    // off-axis deliberately — for a twin of the query itself, every
    // candidate's penalty degenerates to its own relevance and no lambda
    // separates them.
    val corpus = Seq(
      10L -> Array(0.92f, 0.3919f, 0f, 0f),
      11L -> Array(0.92f, 0.392f, 0f, 0f),
      12L -> Array(0.9f, -0.4359f, 0f, 0f),
      13L -> Array(0.5f, 0f, 0.866f, 0f),
      14L -> Array(-1.0f, 0.1f, 0.2f, 0f),
      15L -> Array(0.85f, 0.2f, -0.4f, 0f))
    val q = Seq(1L -> Array(1.0f, 0.0f, 0f, 0f))
    val qDf = q.toDF("vec_id", "embedding")
    val cDf = corpus.toDF("vec_id", "embedding")
    val got = Vec.mmrTopK(qDf, cDf, k = 4, shortlist = 6, lambda = 0.6)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    val exp = bruteMmr(q.head._2, corpus, k = 4, shortlist = 6, lambda = 0.6)
    assert(got == exp)
    // Step 1 is the plain nearest neighbor; step 2 skips the twin for the
    // mirror direction.
    assert(got.head._2 == 10L && got(1)._2 == 12L)
  }

  /** Reference facility-location greedy on the exact 1e6-grid integers. */
  private def bruteFacility(pool: Seq[Long],
      corpus: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Long, Long)] = {
    val vec = corpus.toMap
    def s(c: Long, v: Long): Long =
      math.max(0L, math.round(cos6(vec(c), vec(v)) * 1e6))
    val cur = scala.collection.mutable.Map(
      corpus.map { case (v, _) => v -> 0L }: _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to k).map { step =>
      val (pick, gain) = pool.filterNot(selected.contains).map { c =>
        c -> corpus.map { case (v, _) => math.max(0L, s(c, v) - cur(v)) }.sum
      }.minBy { case (c, g) => (-g, c) }
      selected += pick
      corpus.foreach { case (v, _) => cur(v) = math.max(cur(v), s(pick, v)) }
      (step.toLong, pick, gain)
    }
  }

  test("facilityLocationSelect equals the plain-Scala greedy; gains shrink") {
    val rnd = new scala.util.Random(13)
    val corpus = (0L until 50L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val pool = (0L until 12L)
    val cDf = corpus.toDF("vec_id", "embedding")
    val pDf = corpus.take(12).toDF("vec_id", "embedding")
    val got = Vec.facilityLocationSelect(pDf, cDf, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = bruteFacility(pool, corpus, k = 4)
    assert(got == exp)
    // Submodularity: marginal gains are non-increasing along the greedy.
    assert(got.map(_._3) == got.map(_._3).sorted(Ordering[Long].reverse))
    // The first pick is the single best coverer, never repeated later.
    assert(got.map(_._2).distinct.size == 4)
  }

  test("labelSpread equals the plain-Scala frontier sweep on its own graph") {
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 60L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val cDf = corpus.toDF("vec_id", "embedding")
    val seeds = corpus.take(20).map { case (i, _) => (i, (i % 3).toInt) }
    val sDf = seeds.toDF("vec_id", "label")
    val got = Vec.labelSpread(cDf, sDf, spreadRounds = 2,
        k = 6, nBits = 3, graphRounds = 2, ringWindow = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // Replay: same symmetrized nnDescent graph (memo-shared), same
    // freeze-once frontier-majority rounds (count desc, label asc).
    val g = Vec.nnDescent(cDf, "vec_id", "embedding", k = 6, nBits = 3,
        rounds = 2, ringWindow = 4)
      .select("node_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = (g ++ g.map(_.swap)).distinct
    val lab = scala.collection.mutable.Map(
      seeds.map { case (i, l) => i -> l.toLong }: _*)
    for (_ <- 1 to 2) {
      val votes = e.filter { case (_, d) => lab.contains(d) }
        .groupBy(_._1).map { case (s, es) =>
          s -> es.groupBy(p => lab(p._2)).view.mapValues(_.size).toSeq
            .minBy { case (l, c) => (-c, l) }._1
        }
      votes.foreach { case (s, l) =>
        if (!lab.contains(s)) lab(s) = l
      }
    }
    val exp = corpus.map { case (i, _) =>
      val seeded = i < 20
      i -> ((lab.getOrElse(i, -1L),
        if (seeded) "seed" else if (lab.contains(i)) "spread" else "none"))
    }.toMap
    assert(got == exp)
    // The sweep must have actually spread past the seeds.
    assert(exp.values.count(_._2 == "spread") > 10)
  }

  test("textTileBoundaries: hand-checked scores and valley on a topic shift") {
    // Three 4-token blocks: A/A share all terms (cosine 1), A/B share
    // none (cosine 0), B/B' share half — the valley must land at the
    // A->B shift, not at the edges.
    val doc = (("alpha beta alpha beta " * 2) +
      "gamma delta gamma delta " + "gamma epsilon gamma zeta").trim
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val got = graft.functions.Chunk
      .textTileBoundaries(df, "doc_id", "text", blockTokens = 4)
      .orderBy("boundary").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    // counts: A=(2,2) vs A=(2,2) -> 1.0; A vs B disjoint -> 0.0;
    // B=(2,2) over {gamma,delta} vs B'=(2,1,1) over {gamma,eps,zeta}:
    // dot=4, norms sqrt(8)*sqrt(6) -> 0.57735.
    assert(got.map(_._1) == Seq(0L, 1L, 2L))
    assert(got.map(_._2) == Seq(1.0, 0.0, 0.577350))
    assert(got.map(_._3) == Seq(false, true, false))
    // A doc shorter than two blocks emits no boundaries.
    assert(graft.functions.Chunk.textTileBoundaries(
      Seq((2L, "tiny doc")).toDF("doc_id", "text"), "doc_id", "text",
      blockTokens = 20).count() == 0L)
  }

  test("mmrTopK at lambda=1 equals relevance-ordered top-k") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val queries = corpus.take(3)
    val qDf = queries.toDF("vec_id", "embedding")
    val cDf = corpus.toDF("vec_id", "embedding")
    val got = Vec.mmrTopK(qDf, cDf, k = 5, shortlist = 12, lambda = 1.0)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val top = Vec.bruteForceTopK(qDf, cDf, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1))).toSet
    assert(got == top)
  }

  test("linearCka: identity/negation/scale give 1, independent noise " +
      "gives near 0, truncation in between") {
    val rnd = new scala.util.Random(23)
    def vec(d: Int) = Array.fill(d)(rnd.nextFloat() - 0.5f)
    val rows = (1L to 120L).map(i => (i, vec(8)))
    val a = rows.toDF("id", "va")
    def cka2(b: org.apache.spark.sql.DataFrame, colB: String): Double =
      Vec.linearCka(a, b, "id", "va", colB).collect()(0)
        .getAs[Double]("cka2")
    // self: exactly 1 (all three fro2 coincide)
    assert(cka2(a.select(col("id"), col("va").as("vb")), "vb") == 1.0)
    // negation: exactly 1 (the grid rounds symmetrically, so the
    // moment matrices flip sign and the norms coincide bit for bit)
    val neg = a.select(col("id"),
      transform(col("va"), v => -v).as("vb"))
    assert(cka2(neg, "vb") == 1.0)
    // 2x scale: invariant up to grid quantization (round(2v·g) is not
    // 2·round(v·g) on half-grid points)
    val twice = a.select(col("id"),
      transform(col("va"), v => v * 2.0f).as("vb"))
    assert(cka2(twice, "vb") > 0.99999)
    // independent noise: near zero; half-truncation: strictly between
    val noise = rows.map { case (i, _) => (i, vec(8)) }.toDF("id", "vb")
    val cNoise = cka2(noise, "vb")
    assert(cNoise < 0.2, s"noise cka2=$cNoise")
    val trunc = a.select(col("id"), slice(col("va"), 1, 4).as("vb"))
    val cTr = cka2(trunc, "vb")
    assert(cTr > cNoise && cTr < 1.0, s"trunc cka2=$cTr")
  }
}
