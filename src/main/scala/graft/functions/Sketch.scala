package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic, ORACLE-GATED approximation sketches: count-min (frequency
  * overestimates) and HyperLogLog (cardinality).
  *
  * The catalog's other sketch entry (q_sketch_stats, approx_count_distinct /
  * percentile_approx) is rows-only because Spark's built-in sketches pin
  * neither their hash functions nor their merge order, so no cross-engine
  * oracle can reproduce them. These two sketches make the opposite choice:
  * every hash seed is a FIXED literal, the item hash is the engine's shared
  * rolling polynomial hash (PolyHash.eval == the DuckDB list_reduce
  * fragment), and every estimator is integer-exact up to one final IEEE
  * double division — so the full sketch CONTENT and the estimates
  * hash-match a DuckDB replay of the same arithmetic. Approximation error
  * is then a documented property of the algorithm, not an excuse to skip
  * the correctness gate.
  *
  * Scale notes (100 TB):
  *  - Count-min is a custom typed [[Aggregator]] (the custom-AGGREGATE rung
  *    of the extension ladder, alongside Freq.MisraGries): the partial
  *    state is one bounded d×w long array per partition task, merge is
  *    elementwise add — one pass, no shuffle of item rows, map-side
  *    combined like any partial aggregation.
  *  - HyperLogLog needs no custom aggregate at all: register = max(rank)
  *    IS a partial-aggregable groupBy over at most m=64 register rows per
  *    group — the idiomatic Spark form is already the mergeable-sketch
  *    form. Union-merge of two corpora is elementwise register max, which
  *    the same groupBy computes for free over the concatenation.
  */
object Sketch {
  /** Shared modulus of the engine's polynomial hash family. */
  val P: Long = 1000000007L

  // ---------------------------------------------------------------- CMS

  /** Fixed affine row-hash seeds h_i(x) = ((a_i x + b_i) mod P) mod w.
    * a_i < 2^31 and x < 2^30, so a_i*x + b_i < 2^61: no long overflow.
    */
  val CmsA: Array[Long] = Array(1103515245L, 69069L, 1664525L, 22695477L)
  val CmsB: Array[Long] = Array(12345L, 362437L, 1013904223L, 7L)

  /** Count-min sketch over item hashes (tid = PolyHash of the item), d
    * rows × w buckets. Buffer: one flat long array, row-major.
    */
  class CountMin(d: Int, w: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(d >= 1 && d <= CmsA.length, s"d must be in [1, ${CmsA.length}]")
    require(w >= 2, s"w must be >= 2, got $w")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], tid: Long): Array[Long] = {
      // normalize into [0, P) FIRST: a raw negative tid (e.g. xxhash64)
      // would index out of bounds, and a full-range one would overflow
      // CmsA(i) * tid; for the polynomial-hash domain [0, P) this is the
      // identity, so sketch contents are unchanged where they were valid
      val x = { val m = tid % P; if (m < 0) m + P else m }
      var i = 0
      while (i < d) {
        val b = ((CmsA(i) * x + CmsB(i)) % P % w).toInt
        buf(i * w + b) += 1L
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The sketch as a (sketch_row, bucket, cnt) table — the full content,
    * zero cells included (callers filter). One pass over `tidCol`, bounded
    * d·w output.
    */
  def cmsTable(df: DataFrame, tidCol: String, d: Int, w: Int): DataFrame = {
    val agg = udaf(new CountMin(d, w))
    df.agg(agg(col(tidCol)).as("__cms"))
      .select(posexplode(col("__cms")).as(Seq("__i", "cnt")))
      .select(
        (col("__i") / w).cast("long").as("sketch_row"),
        (col("__i") % w).cast("long").as("bucket"),
        col("cnt"))
  }

  /** Column: bucket of `tid` under row-hash `i` (plan-side mirror of
    * CountMin.reduce's arithmetic, for the lookup join).
    */
  def cmsBucket(tid: Column, i: Int, w: Int): Column =
    (lit(CmsA(i)) * tid + lit(CmsB(i))) % P % w

  /** Point estimates for a bounded probe set: est(x) = min_i cms[i][h_i(x)].
    * The d lookups are an equi-join against the bounded sketch table
    * (broadcast — d·w rows however large the corpus). Count-min guarantees
    * est >= true count always; overcount <= N·e/w with probability
    * 1 − e^−d per probe.
    */
  def cmsEstimates(sketch: DataFrame, probes: DataFrame, tidCol: String,
      d: Int, w: Int): DataFrame = {
    val lookups = probes.select(
      col("*"),
      explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("sketch_row"),
          cmsBucket(col(tidCol), i, w).as("bucket"))
      }: _*)).as("__l"))
      .select(col("*"), col("__l.sketch_row"), col("__l.bucket"))
      .drop("__l")
    lookups
      .join(broadcast(sketch), Seq("sketch_row", "bucket"))
      .groupBy((probes.columns.map(col)): _*)
      .agg(min(col("cnt")).as("est_cnt"))
  }

  // ---------------------------------------------------------------- AMS

  /** Fixed affine sign-hash seeds for the AMS rows (same family and
    * bounds as [[CmsA]]: a < 2^31, x < 2^30 — no overflow).
    */
  val AmsA: Array[Long] = Array(
    1103515245L, 69069L, 1664525L, 22695477L,
    134775813L, 214013L, 16807L, 48271L,
    40692L, 69621L, 40014L, 65539L,
    1220703125L, 2147437301L, 630360016L, 397204094L)
  val AmsB: Array[Long] = Array(
    12345L, 362437L, 1013904223L, 7L,
    1L, 2531011L, 0L, 11L,
    3791L, 23902L, 824L, 13L,
    71L, 453816693L, 2027L, 997L)

  /** AMS (Alon–Matias–Szegedy 1996) tug-of-war sketch of the SECOND
    * FREQUENCY MOMENT F2 = sum_x f_x^2 — the self-join size / "surprise
    * number" estimator, the moment sketch beside count-min's point
    * frequencies and HLL's cardinality: each row i folds the stream
    * into one signed counter Z_i = sum_x f_x·s_i(x) with the ±1 sign
    * s_i(x) = 1 − 2·((a_i·x + b_i) mod P mod 2), and E[Z_i^2] = F2.
    * All seeds are FIXED literals (the house gated-sketch contract:
    * approximation error is a property of the algorithm, not an excuse
    * to skip the gate), so every Z_i and estimate hash-matches the
    * oracle replay, and the per-row signed error vs the EXACT F2 is
    * part of the gated output.
    *
    * Scale shape: one wordcount-style (type, count) aggregation, then
    * a rows-wide fanout over the VOCABULARY (never the stream) into R
    * partial-aggregable signed sums — charset-discipline bounded; the
    * exact F2 rides the same count table. Estimates are decimal-
    * widened squares (Z can reach stream size; Z^2 needs 128 bits at
    * petascale).
    * Output: (sketch_row, z, est, exact_f2, err_ppm), one row per
    * sketch row, est = Z^2, err_ppm signed vs exact.
    */
  def amsF2(df: DataFrame, tidCol: String, rows: Int): DataFrame = {
    require(rows >= 1 && rows <= AmsA.length,
      s"rows must be in [1, ${AmsA.length}], got $rows")
    val dec = "decimal(38,0)"
    val counts = df.groupBy(col(tidCol).as("__x"))
      .agg(count(lit(1)).as("__m"))
    val exact = counts
      .agg(sum(col("__m").cast(dec) * col("__m").cast(dec)).as("__f2d"))
      // Same overflow gate as est below (quadratically later — Σm²
      // needs ~3e12 total tokens — but the engines DIVERGE past it:
      // DuckDB's HUGEINT→BIGINT cast throws where Spark's decimal→long
      // nulls). Explicit NULL on both keeps the replay bit-identical.
      .select(when(col("__f2d") > lit(Long.MaxValue).cast(dec),
        lit(null).cast("long"))
        .otherwise(col("__f2d").cast("long")).as("exact_f2"))
    val z = counts
      .select(col("__x"), col("__m"),
        explode(array((0 until rows).map { i =>
          struct(lit(i.toLong).as("sketch_row"),
            (lit(1L) - lit(2L) *
              ((lit(AmsA(i)) * col("__x") + lit(AmsB(i))) % P % 2L))
              .as("__s"))
        }: _*)).as("__r"))
      .groupBy(col("__r.sketch_row").as("sketch_row"))
      .agg(sum(col("__m") * col("__r.__s")).as("z"))
    // |Z| can reach stream size, so Z^2 overflows a 64-bit est at
    // ~3.04e9 tokens (isqrt(Long.MaxValue) = 3037000499); the cast
    // would silently wrap. Gate est to NULL past that bound so the
    // overflow is explicit on both engines; z and err_ppm (decimal-
    // domain arithmetic) stay exact regardless.
    val zMax = 3037000499L
    z.crossJoin(broadcast(exact))
      .select(col("sketch_row"), col("z"),
        when(abs(col("z")) > zMax, lit(null).cast("long"))
          .otherwise((col("z").cast(dec) * col("z").cast(dec))
            .cast("long")).as("est"),
        col("exact_f2"),
        graft.functions.Stats.fixedPointExact(
          col("z").cast(dec) * col("z").cast(dec) -
            col("exact_f2").cast(dec),
          col("exact_f2").cast(dec)).as("err_ppm"))
  }

  // ---------------------------------------------------------------- HLL

  /** HLL mixer: the engine's shared affine→square→affine chain mod 2^31−1
    * (Sampling.hashOrder / the duckMixOf oracle fragment). A single affine
    * map is only pairwise-independent and PRESERVES arithmetic structure —
    * consecutive-id item hashes map to arithmetic progressions whose
    * max-rank statistics are badly non-geometric (measured: a 4000-item
    * stream estimated at 1511 under the affine mix, 2.6× low). The square
    * step breaks the linearity; the same chain is what the engine's
    * hash-order sampling already relies on for dispersion.
    */
  val M31: Long = 2147483647L

  private def hllMix(tid: Column): Column = {
    // pmod, not %: a negative tid would ripple sign through the chain
    // and emit negative register indices (and NULL ranks through the
    // comparison ladder). Identity on [0, M31) — the catalog's
    // polynomial-hash domain — so existing sketches are unchanged.
    val h1 = (pmod(tid, lit(M31)) * 1103515245L + 12345L) % M31
    val h2 = (h1 * (h1 + lit(1L))) % M31
    (h2 * 784588716L + 998244353L) % M31
  }

  /** Register width: with m = 64 registers, rem = y div 64 < 2^31/64 =
    * 2^25, so ranks live in [1, W+1] with W = 25 (rank W+1 = rem == 0).
    */
  val HllW: Int = 25
  val HllM: Int = 64

  /** Column: HLL register index of a tid (y mod 64). */
  def hllReg(tid: Column): Column = hllMix(tid) % HllM

  /** Column: HLL rank of a tid — position of the leftmost 1-bit in the
    * W-bit remainder field, W+1 if the field is zero. Computed as a
    * comparison ladder (not floor(log2): double log is not exact at
    * field boundaries, and DuckDB must replay the identical arithmetic).
    */
  def hllRank(tid: Column): Column = {
    // Integer division y div 64: Column./ is double division, but y < 2^31
    // and 64 is a power of two, so the double quotient is exact and the
    // long cast truncates to exactly y div 64 (y is nonnegative).
    val rem = (hllMix(tid) / lit(HllM)).cast("long")
    // bitlen(rem) = k when 2^(k-1) <= rem < 2^k; rank = W - bitlen + 1.
    (1 to HllW).foldLeft(when(rem === 0L, lit(HllW + 1))) { (acc, k) =>
      acc.when(rem >= (1L << (k - 1)) && rem < (1L << k), lit(HllW + 1 - k))
    }.cast("long")
  }

  /** Per-group HLL registers: (groupCols..., reg, m_j = max rank). Only
    * occupied registers appear; the estimator supplies the 2^0 term for
    * the missing ones. Partial-aggregable: at most m rows of state per
    * group at every stage.
    */
  def hllRegisters(df: DataFrame, tidCol: String,
      groupCols: Seq[String]): DataFrame =
    df.select((groupCols.map(col) :+ hllReg(col(tidCol)).as("reg") :+
        hllRank(col(tidCol)).as("rank")): _*)
      .groupBy((groupCols.map(col) :+ col("reg")): _*)
      .agg(max(col("rank")).as("m_j"))

  /** Register-wise merge of two per-group HLL register tables — the
    * mergeability that makes HLL an INCREMENTAL-VIEW aggregate: union +
    * per-(group, reg) max is exactly the register state a full
    * recompute over the concatenated inputs produces (max is
    * associative/commutative), so a materialized view can absorb a
    * delta batch without revisiting history. q_mv_merge's oracle proves
    * the equality by recomputing from scratch.
    */
  def hllMergeRegisters(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("reg")): _*)
      .agg(max(col("m_j")).as("m_j"))

  /** Per-group raw HLL estimate, integer-exact up to ONE double division:
    * each register term 2^−m_j is carried as the integer 2^(W+1−m_j)
    * (missing registers contribute 2^(W+1), i.e. m_j = 0), the scaled sum
    * fits a long exactly (≤ 64·2^26 = 2^32), and
    * est = 0.709·m²·2^(W+1) / S — the constant m²·2^(W+1) = 2^38 =
    * 274877906944 in both engines:
    * the 2^38 scale is exact in double, so the only roundings are the
    * decimal literal 0.709 itself and the final division, both
    * engine-identical. RAW estimator only: valid in the n ≫ 2.5·m regime
    * (the catalog entry's corpus has thousands of distinct items per
    * group vs m = 64); the small-range linear-counting branch needs ln,
    * which is not cross-engine exact — callers in that regime should use
    * exact distinct instead.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val occupied = registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllW + 1} - CAST(m_j AS INT))"))
          .as("__s_occ"),
        count(lit(1)).as("__n_reg"))
    // missing registers: (m − n_reg) · 2^(W+1)
    occupied.select(
      (groupCols.map(col) :+
        (col("__s_occ") +
          (lit(HllM.toLong) - col("__n_reg")) * lit(1L << (HllW + 1)))
          .as("s_scaled")): _*)
      .select(
        (groupCols.map(col) :+
          (lit(0.709) * lit((HllM.toLong * HllM.toLong) << (HllW + 1)).cast("double") /
            col("s_scaled").cast("double")).as("est")): _*)
  }

  /** KMV (k-minimum-values / bottom-k) distinct sketch (Bar-Yossef et
    * al. 2002; the theta-sketch base form): keep the k smallest mixer
    * values of the distinct keys; the k-th smallest h_k estimates
    * cardinality as (k−1)·M div h_k with M = 2^31−1 the mixer modulus —
    * one integer divide, no transcendentals, so estimate and sketch are
    * both engine-exact for a given key set. The family's second
    * cardinality rung next to HLL: KMV's kept SAMPLE of values also
    * supports set-algebra estimates (intersection/Jaccard via the
    * bottom-k union trick) that registers can't answer.
    *
    * Exactly k·|groups| rows survive; groups with fewer than k distinct
    * keys are exact by construction (est = their true count). The
    * rank-k cut is a per-group window the TopKNative rule replans to a
    * bounded top-k (never a full sort at scale); the mixer is the
    * catalog-standard affine→square→affine chain ([[Sampling.hashOrder]]
    * — pairwise-independence is NOT enough here, the square step is
    * what makes consecutive-id minima geometric).
    *
    * Output: one row per group — (groupCols..., n_kept, kth_mv,
    * est_distinct).
    */
  def kmvEstimate(df: DataFrame, tidCol: String, k: Int,
      groupCols: Seq[String]): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val mixed = df.select((g :+ col(tidCol).as("__tid")): _*)
      .distinct()
      .withColumn("__mv", Sampling.hashOrder(col("__tid")))
    val w = Window.partitionBy(g: _*)
      .orderBy(col("__mv").asc, col("__tid").asc)
    mixed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__mv")).as("kth_mv"))
      .select((g :+ col("n_kept") :+ col("kth_mv") :+
        when(col("n_kept") < k, col("n_kept"))
          // a zero k-th minimum needs k mixer collisions at 0 — treat as
          // "sketch degenerate" rather than divide (DuckDB errors on //0)
          .when(col("kth_mv") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"((${k - 1}L * ${M31}L) div kth_mv)"))
          .as("est_distinct")): _*)
  }

  /** KMV SET ALGEBRA between every pair of groups — the estimate HLL
    * registers cannot answer (Beyer et al., SIGMOD 2007: bottom-k
    * sketches are uniform SAMPLES of the key space, so they compose):
    * the union sketch is the k smallest distinct mixer values of the
    * two sketches' union, estimating |A∪B| by the usual (k−1)·M div
    * h_k; the fraction ρ of union-sketch members present in BOTH input
    * sketches estimates Jaccard, and ρ·|A∪B|^ estimates the
    * intersection — all integer arithmetic on the house mixer, so
    * sketch, estimates, and oracle are engine-exact for a given key
    * set. Groups with fewer than k distinct keys degrade gracefully
    * (their sketch IS the key set; estimates turn exact).
    * Output per group pair (grp_a < grp_b): (grp_a, grp_b, n_kept,
    * kth_mv, est_union, n_inter, jaccard_ppm, est_inter).
    *
    * Scale: the per-group bottom-k is [[kmvEstimate]]'s partial-
    * aggregable window (TopKNative replans it bounded); everything
    * after runs on k·|groups| rows — sketch-sized, never key-sized.
    * The pair stage is |groups|²-bounded (mixture-sized, the
    * sourceOverlap contract).
    */
  def kmvPairOps(df: DataFrame, tidCol: String, k: Int,
      groupCol: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val mixed = df.select(col(groupCol).as("__g"), col(tidCol).as("__tid"))
      .distinct()
      .withColumn("__mv", Sampling.hashOrder(col("__tid")))
    val wg = Window.partitionBy(col("__g"))
      .orderBy(col("__mv").asc, col("__tid").asc)
    val sk = mixed.withColumn("__rn", row_number().over(wg))
      .filter(col("__rn") <= k)
      .select(col("__g"), col("__tid"), col("__mv"))
    // pairwise union of sketches: |groups|² × 2k rows, mixture-sized
    val pairs = sk.select(col("__g").as("grp_a")).distinct()
      .join(sk.select(col("__g").as("grp_b")).distinct(),
        col("grp_a") < col("grp_b"))
    val both = pairs
      .join(sk.select(col("__g").as("grp_a"), col("__tid"),
        col("__mv"), lit(1L).as("__ina")), Seq("grp_a"))
      .unionByName(pairs
        .join(sk.select(col("__g").as("grp_b"), col("__tid"),
          col("__mv"), lit(2L).as("__ina")), Seq("grp_b"))
        .select(col("grp_a"), col("grp_b"), col("__tid"), col("__mv"),
          col("__ina")))
      // one row per (pair, key): __src = 3 when the key sits in BOTH
      // sketches, 1/2 when in one
      .groupBy(col("grp_a"), col("grp_b"), col("__tid"), col("__mv"))
      .agg(sum(col("__ina")).as("__src"))
    val wp = Window.partitionBy(col("grp_a"), col("grp_b"))
      .orderBy(col("__mv").asc, col("__tid").asc)
    val unioned = both.withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= k)
    unioned.groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_kept"), max(col("__mv")).as("kth_mv"),
        sum(when(col("__src") === 3L, 1L).otherwise(0L)).as("n_inter"))
      .select(col("grp_a"), col("grp_b"), col("n_kept"), col("kth_mv"),
        when(col("n_kept") < k, col("n_kept"))
          .when(col("kth_mv") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"((${k - 1}L * ${M31}L) div kth_mv)"))
          .as("est_union"),
        col("n_inter"),
        Stats.fixedPointExact(col("n_inter"), col("n_kept"))
          .as("jaccard_ppm"))
      .withColumn("est_inter",
        when(col("est_union").isNull, lit(null).cast("long"))
          .otherwise(expr("(n_inter * est_union) div n_kept")))
  }
}
