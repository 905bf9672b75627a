package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cluster, Dedup, Quality, Text, Tfidf, Vec}
import graft.merge.Merge
import graft.ops.Medallion

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each entry in `queries` exercises one operator family from SURVEY.md §2
  * (or a training-data-pipeline extension) through the graft library, over
  * the driver test tables at `sfDir`. `oracleSql` holds the equivalent
  * DuckDB SQL; column names and value arithmetic are kept bit-compatible
  * (decimal casts for money math, double promotion before float math,
  * deterministic ORDER BY everywhere).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_agg")(spark, "/root/testdata/sf0.001")

  /** Shared constants between Spark queries and oracle SQL. */
  val stopwords: Seq[String] = Seq("the", "a")
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en"  -> Seq("the", "a", "fast", "slow"),
    "ml"  -> Seq("vector", "stream", "window", "batch"),
    "sql" -> Seq("join", "merge", "filter", "sort"))
  val numMinhashes: Int = 8

  /** BM25 demo query: one rare term (df ~5% of docs) + two common ones,
    * so the rational-idf weighting visibly reorders the hits. */
  val bm25Query: Seq[String] = Seq("dup", "vector", "merge")

  /** WordPiece vocabulary for q_wordpiece: common corpus words, their
    * fragments, and all single letters except x/z (so x/z-bearing words
    * exercise the [UNK] fallback). ONE Seq feeds both the expression and
    * the oracle's interpolated literal — bit-position/order parity is
    * structural.
    */
  val wpVocab: Seq[String] = {
    val words = Seq("table", "value", "window", "batch", "query", "spark",
      "scan", "merge", "data", "part", "row", "key", "the", "line", "hash")
    val sub = Seq("ta", "ble", "val", "ue", "win", "dow", "qu", "ery", "ba",
      "tch", "sc", "an", "me", "rge", "da", "pa", "rt", "li", "ne", "ha", "sh")
    val letters = ('a' to 'y').filterNot(_ == 'x').map(_.toString)
    words ++ sub ++ letters
  }

  /** Blocklist phrases for q_blocklist — a mix of substrings present in
    * the synthetic corpus and absent ones (bit positions = Seq order;
    * single-quote-free so the oracle can inline them verbatim).
    */
  val blockPhrases: Seq[String] = Seq(
    "slow fast", "merge batch", "vector table", "wholly absent phrase",
    "agg row scan", "customer query")

  /** The (lang, id-bucket)-blocked candidate pair frame q_fs_linkage and
    * q_fs_patterns score — a/b-suffixed document features joined on the
    * block key with id_a < id_b.
    */
  def fsCandidatePairs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      Text.tokenCount(col("text")).cast("long").as("n_toks"),
      length(col("text")).cast("long").as("n_chars"),
      element_at(Text.tokens(col("text")), 1).as("head_tok"),
      (col("doc_id") % 25).as("blk"))
    val a = base.select(base.columns.toIndexedSeq.map(c => col(c).as(c + "_a")): _*)
    val b = base.select(base.columns.toIndexedSeq.map(c => col(c).as(c + "_b")): _*)
    a.join(b,
      col("lang_a") === col("lang_b") && col("blk_a") === col("blk_b") &&
        col("doc_id_a") < col("doc_id_b"))
  }

  /** Fellegi-Sunter comparison fields for q_fs_linkage: agreement
    * predicates over the a/b-suffixed pair frame plus m/u permille
    * priors. ONE definition feeds both the Spark query and the oracle's
    * interpolated weight constants — parity is structural.
    */
  val fsFields: Seq[graft.functions.Linkage.Field] = {
    import graft.functions.Linkage.Field
    Seq(
      Field("src", col("source_a") === col("source_b"), 950, 50),
      Field("len", abs(col("n_toks_a") - col("n_toks_b")) <= 5, 900, 100),
      Field("head", col("head_tok_a") === col("head_tok_b"), 800, 50),
      Field("chars", abs(col("n_chars_a") - col("n_chars_b")) <= 30, 850, 150))
  }

  /** Discounted revenue, exact: decimal arithmetic, final double — must
    * stay bit-identical to the matching expression in the oracle SQL
    * (shared by q_agg_pricing / q_shipping_priority / q_regional_revenue).
    */
  private def discRevenue: org.apache.spark.sql.Column =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("double")

  /** DuckDB fragment: the whitespace tokenizer, identical to Text.tokens.
    * Caveat: RE2's \s is [ \t\n\f\r] while Java's adds \x0B (vertical
    * tab), so the two tokenizers diverge on VT-containing text; the
    * synthetic corpus contains none, and expressions where the difference
    * would flip oracle-checked values (punct_ratio) spell the class out
    * explicitly instead.
    */
  private def duckToks(c: String): String =
    s"list_filter(string_split_regex($c, '\\s+'), t -> t != '')"

  /** DuckDB fragment: the scale-invariant derived hub cap —
    * `Dedup.fractionalDfCap(n, DefaultMaxDfPpm=10000, floor=50)` with
    * `countSql` supplying the corpus cardinality (a scalar subquery, so
    * the twin derives from the SAME universe the Spark generator counts).
    * Integer semantics match exactly: for any BIGINT n,
    * n*10000 // 1000000 == n/1e6*10000 + n%1e6*10000/1e6 in 64-bit.
    */
  private def duckDerivedCap(countSql: String): String =
    s"(SELECT greatest(50, ($countSql) * 10000 // 1000000))"

  /** DuckDB fragment: Sampling.hashBucket's affine→quadratic→affine mixer
    * mod 2^31-1 over doc_id (h2 = h1*(h1+1) = h1²+h1).
    */
  /** DuckDB fragment: the double-promoted left-fold dot product — the
    * ONE load-bearing shape (fixed fold order, element cast to DOUBLE
    * before multiplying) every vector oracle shares; a parity fix here
    * reaches them all.
    */
  private def duckDotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len($a) + 1),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (acc, v) -> acc + v)"""

  /** DuckDB fragment: Sampling.hashOrder — the full-width mixer value. */
  private def duckMixOf(key: String): String = {
    val h1 = s"((($key % 2147483647) * 1103515245 + 12345) % 2147483647)"
    s"(((($h1 * ($h1 + 1)) % 2147483647) * 784588716 + 998244353) % 2147483647)"
  }
  private def duckBucketOf(key: String): String =
    s"${duckMixOf(key)} % 10000"
  private val duckBucket: String = duckBucketOf("doc_id")

  private def duckMarkerHits(lang: Seq[String]): String =
    s"CAST(len(list_filter(tk, t -> list_contains([${lang.map(w => s"'$w'").mkString(",")}], t))) AS BIGINT)"

  /** DuckDB CTE chain: the catalog's document quality score
    * (Quality.qualityScore replayed — length saturation at 50 tokens ×
    * stopword-ratio distance from 0.2), shared by every gate/cap/
    * curriculum oracle. `withSource` carries the source column for the
    * per-source ranked variants. Ends with `q(doc_id[, source],
    * quality)`.
    */
  private def duckQualityCte(withSource: Boolean = false): String = {
    val keys = if (withSource) "doc_id, source" else "doc_id"
    val hits = duckMarkerHits(stopwords)
    s"""t AS (SELECT $keys, ${duckToks("text")} AS tk FROM documents),
          t2 AS (SELECT $keys,
            CASE WHEN len(tk) > 0 THEN CAST($hits AS DOUBLE) / CAST(len(tk) AS DOUBLE)
                 ELSE 0.0 END AS stop_ratio, tk FROM t),
          q AS (SELECT $keys,
            least(1.0, CAST(len(tk) AS DOUBLE) / 50.0) *
              (1.0 - abs(stop_ratio - 0.2)) AS quality FROM t2)"""
  }

  /** DuckDB fragment: the rolling polynomial char hash (Dedup.polyId). */
  private def duckPolyId(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, length($c) + 1),
          ii -> CAST(ascii($c[ii]) AS BIGINT))),
        (acc, x) -> (acc * 31 + x) % 1000000007)"""

  /** DuckDB fragment: the count-min row-hash fan-out — one SELECT per
    * sketch row i with bucket = ((a_i·tid + b_i) mod P) mod w, UNION ALL'd.
    * Seeds mirror Sketch.CmsA/CmsB literal for literal. `extraCols`
    * carries probe columns through the lookup variant.
    */
  /** The catalog's count-min geometry — one pair of constants shared by
    * the Spark cmsTable calls and the DuckDB lookup fan-out so the
    * sketch and its oracle can never desynchronize.
    */
  private val CmsDepth = 4
  private val CmsWidth = 64

  private def duckCmsLookups(from: String, extraCols: String = "",
      d: Int = CmsDepth, w: Int = CmsWidth): String =
    (0 until d).map { i =>
      val a = graft.functions.Sketch.CmsA(i)
      val b = graft.functions.Sketch.CmsB(i)
      s"""SELECT $extraCols$i AS sketch_row,
          (($a * tid + $b) % 1000000007) % $w AS bucket FROM $from"""
    }.mkString("\n UNION ALL ")

  /** DuckDB fragment: HLL rank of the 25-bit remainder field — descending
    * power-of-two threshold ladder (identical semantics to Sketch.hllRank;
    * no floating log anywhere).
    */
  private def duckHllRankCase(rem: String): String = {
    val cases = (1 to 25).map { k =>
      s"WHEN $rem >= ${1L << (25 - k)} THEN $k"
    }.mkString(" ")
    s"(CASE WHEN $rem = 0 THEN 26 $cases END)"
  }

  /** DuckDB fragment chain: the unigram-LM Viterbi DP, unrolled one CTE
    * stage per prefix position (corpus words are <= 8 chars; the stage
    * count is the only corpus-shape assumption, and dfin's length filter
    * makes a too-short unroll fail loudly as missing rows, not wrong
    * ones). Stage j minimizes the lexicographic (cost, n_pieces, path)
    * triple over last-piece lengths 1..min(j, maxPieceLen) — identical
    * semantics to UgVocab.segWord. Expects `uw AS (SELECT ... word)` in
    * scope; emits `up` (the RefVocab cost VALUES) through `dfin (word,
    * cost, np, path)`.
    */
  private def duckUnigramDp(maxWordLen: Int = 8): String = {
    val vocab = graft.functions.UnigramLm.RefVocab
    val maxPieceLen = vocab.iterator.map(_._1.length).max
    val values = vocab
      .map { case (p, c) => s"('$p', CAST($c AS BIGINT))" }.mkString(", ")
    val stages = (1 to maxWordLen).map { j =>
      val cands = (1 to math.min(j, maxPieceLen)).map { l =>
        s"""SELECT prev.word AS word, prev.cost + p.cost AS cost,
            prev.np + 1 AS np,
            CASE WHEN prev.path = '' THEN p.piece
                 ELSE prev.path || ' ' || p.piece END AS path
            FROM d${j - l} prev JOIN up p
              ON p.piece = substr(prev.word, ${j - l + 1}, $l)
            WHERE length(prev.word) >= $j"""
      }.mkString("\n UNION ALL ")
      s"""d$j AS (SELECT word, cost, np, path FROM (
          SELECT word, cost, np, path,
            row_number() OVER (PARTITION BY word
              ORDER BY cost, np, path) AS rn
          FROM ($cands)) WHERE rn = 1)"""
    }.mkString(",\n")
    val fin = (1 to maxWordLen)
      .map(j => s"SELECT word, cost, np, path FROM d$j WHERE length(word) = $j")
      .mkString("\n UNION ALL ")
    s"""up AS (SELECT * FROM (VALUES $values) AS t(piece, cost)),
        d0 AS (SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS np, '' AS path
          FROM uw),
        $stages,
        dfin AS ($fin)"""
  }

  /** DuckDB fragment: Stats.fixedPointExact — exact
    * round-half-away-from-zero num/den at parts-per-million in pure
    * integer arithmetic (abs + positive `//`, which truncates, = floor
    * on positives in every DuckDB version; sign reapplied; final CAST
    * to BIGINT so no HUGEINT ever reaches a gated output — the
    * driver's comparator is only stable on BIGINT/VARCHAR/DOUBLE).
    */
  /** DuckDB fragment: Layout.zValue's Morton interleave — one
    * shift/mask term pair per dimension bit, identical arithmetic to
    * the Spark expression chain.
    */
  private def duckZ(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** DuckDB fragment: Vec.rpSign's random-hyperplane bucket id over a
    * list column — one left-fold projection per bit (the
    * q_rp_lsh_bucket arithmetic, parameterized).
    */
  private def duckRpBucket(embCol: String, nBits: Int): String =
    (0 until nBits).map { j =>
      s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, len($embCol) + 1),
            i -> (CASE WHEN (i * 2654435761 + ${j + 1} * 40503) % 65536 < 32768
                  THEN 1.0 ELSE -1.0 END) * CAST($embCol[i] AS DOUBLE))),
          (acc, x) -> acc + x) > 0 THEN ${1L << j} ELSE 0 END)"""
    }.mkString(" + ")

  /** DuckDB statement: the full q_nndescent replay — LSH-bucket
    * seeding, then `rounds` unrolled neighbor-of-neighbor stages,
    * each rescoring candidates with the load-bearing dot shape and
    * keeping top-k per node (sim DESC NULLS LAST, id — Vec.pairSim's
    * NULL-for-zero-norm and tie-break exactly).
    */
  private def duckNnDescentCtes(k: Int, nBits: Int, rounds: Int,
      ringWindow: Int): String = {
    val dot = duckDotSql _
    def simStage(r: Int): String =
      s"""s$r AS (SELECT c.s, c.d,
            CASE WHEN a.nm * b.nm = 0 THEN NULL
              ELSE round(${dot("va.embedding", "vb.embedding")} /
                (a.nm * b.nm), 6) END AS sim
            FROM c$r c JOIN v va ON va.id = c.s JOIN v vb ON vb.id = c.d
            JOIN nm a ON a.id = c.s JOIN nm b ON b.id = c.d),
          g$r AS MATERIALIZED (SELECT s, d, sim, rn FROM
            (SELECT s, d, sim, row_number() OVER (PARTITION BY s
               ORDER BY sim DESC NULLS LAST, d) AS rn FROM s$r)
            WHERE rn <= $k)"""
    def candStage(r: Int): String =
      s"""sym$r AS MATERIALIZED (SELECT s, d FROM g$r
            UNION SELECT d, s FROM g$r),
          c${r + 1} AS (SELECT x.s, y.d FROM sym$r x JOIN sym$r y
            ON y.s = x.d WHERE x.s <> y.d
          UNION SELECT s, d FROM sym$r)"""
    val stages = (0 to rounds).map { r =>
      if (r < rounds) simStage(r) + ",\n" + candStage(r)
      else simStage(r)
    }.mkString(",\n")
    s"""v AS MATERIALIZED (SELECT vec_id AS id, embedding FROM embeddings),
        nm AS MATERIALIZED (SELECT id,
          sqrt(${dot("embedding", "embedding")}) AS nm FROM v),
        bkt AS MATERIALIZED (SELECT id,
          ${duckRpBucket("embedding", nBits)} AS b FROM v),
        ord AS MATERIALIZED (SELECT id, row_number() OVER
            (ORDER BY ${duckMixOf("id")}, id) AS rn FROM v),
        ring AS (SELECT a.id AS s, b.id AS d FROM ord a JOIN ord b
            ON b.rn > a.rn AND b.rn <= a.rn + ${ringWindow - 1}
          UNION SELECT b.id, a.id FROM ord a JOIN ord b
            ON b.rn > a.rn AND b.rn <= a.rn + ${ringWindow - 1}),
        c0 AS (SELECT a.id AS s, b.id AS d FROM bkt a
            JOIN bkt b ON a.b = b.b AND a.id <> b.id
          UNION SELECT s, d FROM ring),
        $stages"""
  }

  private def duckNnDescent(k: Int, nBits: Int, rounds: Int,
      ringWindow: Int): String =
    s"""WITH ${duckNnDescentCtes(k, nBits, rounds, ringWindow)}
        SELECT s AS node_id, d AS neighbor_id, sim,
          CAST(rn AS BIGINT) AS "rank"
        FROM g$rounds ORDER BY node_id, "rank""""

  /** DuckDB statement: the q_graph_search replay — the nnDescent
    * graph CTEs, then `hops` unrolled beam stages per query (entry =
    * the hash-order minimum; candidates = beam ∪ symmetrized
    * adjacency, self excluded; top-`beam` kept, final top-`k`).
    */
  private def duckGraphSearchCtes(beam: Int, hops: Int, graphK: Int,
      nBits: Int, rounds: Int, ringWindow: Int): String = {
    val dot = duckDotSql _
    val hopsSql = (1 to hops).map { r =>
      s"""cq$r AS (SELECT q, d FROM
            (SELECT b.q, ga.d2 AS d FROM b${r - 1} b
               JOIN ga ON ga.s = b.d
             UNION SELECT q, d FROM b${r - 1})
            WHERE q <> d),
          sc$r AS (SELECT c.q, c.d,
            CASE WHEN qn.nm * dn.nm = 0 THEN NULL
              ELSE round(${dot("qv.embedding", "dv.embedding")} /
                (qn.nm * dn.nm), 6) END AS sim
            FROM cq$r c JOIN v qv ON qv.id = c.q
            JOIN v dv ON dv.id = c.d
            JOIN nm qn ON qn.id = c.q JOIN nm dn ON dn.id = c.d),
          b$r AS MATERIALIZED (SELECT q, d, sim, rn FROM
            (SELECT q, d, sim, row_number() OVER (PARTITION BY q
               ORDER BY sim DESC NULLS LAST, d) AS rn FROM sc$r)
            WHERE rn <= $beam)"""
    }.mkString(",\n")
    s"""${duckNnDescentCtes(graphK, nBits, rounds, ringWindow)},
        ga AS MATERIALIZED (SELECT s, d AS d2 FROM g$rounds
          UNION SELECT d, s FROM g$rounds),
        qs AS (SELECT id AS q FROM v WHERE id < 10),
        ent AS (SELECT id AS d FROM ord WHERE rn = 1),
        b0 AS (SELECT qs.q, ent.d FROM qs CROSS JOIN ent),
        $hopsSql"""
  }

  private def duckGraphSearch(k: Int, beam: Int, hops: Int, graphK: Int,
      nBits: Int, rounds: Int, ringWindow: Int): String =
    s"""WITH ${duckGraphSearchCtes(beam, hops, graphK, nBits, rounds,
          ringWindow)}
        SELECT q AS query_id, d AS neighbor_id, sim,
          CAST(rn AS BIGINT) AS "rank"
        FROM b$hops WHERE rn <= $k ORDER BY query_id, "rank""""

  /** DuckDB statement: q_graph_recall — the graph-search beams
    * intersected with the exact cosine top-k per query
    * (Eval.topkRecall's counting and ppm rendering).
    */
  private def duckGraphRecall(k: Int, beam: Int, hops: Int, graphK: Int,
      nBits: Int, rounds: Int, ringWindow: Int): String = {
    val dot = duckDotSql _
    s"""WITH ${duckGraphSearchCtes(beam, hops, graphK, nBits, rounds,
          ringWindow)},
        appr AS (SELECT q, d FROM b$hops WHERE rn <= $k),
        exs AS (SELECT qs.q, vv.id AS d,
          CASE WHEN qn.nm * dn.nm = 0 THEN NULL
            ELSE round(${dot("qv.embedding", "vv.embedding")} /
              (qn.nm * dn.nm), 6) END AS sim
          FROM qs JOIN v qv ON qv.id = qs.q
          JOIN nm qn ON qn.id = qs.q
          CROSS JOIN v vv JOIN nm dn ON dn.id = vv.id
          WHERE vv.id <> qs.q),
        rx AS (SELECT q, d FROM
          (SELECT q, d, row_number() OVER (PARTITION BY q
             ORDER BY sim DESC NULLS LAST, d) AS rk FROM exs)
          WHERE rk <= $k),
        rec AS (SELECT rx.q, CAST(count(*) AS BIGINT) AS k_true,
          CAST(coalesce(sum(CASE WHEN a.d IS NOT NULL THEN 1 ELSE 0 END),
            0) AS BIGINT) AS n_hit
          FROM rx LEFT JOIN appr a ON a.q = rx.q AND a.d = rx.d
          GROUP BY 1)
        SELECT q AS query_id, k_true, n_hit,
          ${duckPpm("n_hit", "k_true")} AS recall_ppm
        FROM rec ORDER BY query_id"""
  }

  /** DuckDB fragment: the full q_corr_matrix statement — one
    * aggregation row of HUGEINT power sums, then one SELECT per
    * unordered column pair replaying Stats.corrMatrix's staged
    * ppm floors.
    */
  private def duckCorrMatrix: String = {
    val cols = Seq("qty", "price_c", "disc_pct", "tax_pct")
    val sums = cols.map(c =>
      s"""CAST(sum($c) AS HUGEINT) AS s_$c,
          CAST(sum(CAST($c AS HUGEINT) * $c) AS HUGEINT) AS ss_$c""")
      .mkString(", ")
    val sps = (for { i <- cols.indices; j <- i + 1 until cols.size }
      yield s"""CAST(sum(CAST(${cols(i)} AS HUGEINT) * ${cols(j)})
          AS HUGEINT) AS sp_${cols(i)}_${cols(j)}""").mkString(", ")
    val pairSelects = (for { i <- cols.indices; j <- i + 1 until cols.size }
      yield {
        val (x, y) = (cols(i), cols(j))
        val cov = s"(n * sp_${x}_$y - s_$x * s_$y)"
        val vx = s"(n * ss_$x - s_$x * s_$x)"
        val vy = s"(n * ss_$y - s_$y * s_$y)"
        val a = duckPpm(cov, vx)
        s"""SELECT '$x' AS x_col, '$y' AS y_col, CAST(n AS BIGINT) AS n,
            CAST(CASE WHEN $cov > 0 THEN 1 WHEN $cov < 0 THEN -1
              ELSE 0 END AS BIGINT) AS r_sign,
            CASE WHEN $vx <= 0 OR $vy <= 0 THEN NULL
              ELSE ${duckPpm(s"CAST($a AS HUGEINT) * $cov", vy)}
            END AS r2_pptr
            FROM agg"""
      }).mkString("\n UNION ALL ")
    s"""WITH t AS (SELECT CAST(round(l_quantity, 0) AS BIGINT) AS qty,
          CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
          CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct,
          CAST(round(l_tax * 100, 0) AS BIGINT) AS tax_pct
          FROM lineitem),
        agg AS (SELECT CAST(count(*) AS HUGEINT) AS n, $sums, $sps FROM t)
        SELECT * FROM ($pairSelects) ORDER BY x_col, y_col"""
  }

  /** DuckDB fragment: the q_image_dhash statement — gradient-sign
    * bits over the 4x4 thumbnail grid replayed arithmetically through
    * the text-as-PNG sampling contract (grid cell i reads the char at
    * (i div 4)·64 + (i mod 4)·4, the q_image_thumb formula).
    */
  private def duckDhash: String = {
    def pxi(i: Int): String = {
      val pos = (i / 4) * 64 + (i % 4) * 4
      s"(CASE WHEN $pos < length(text) THEN ascii(text[${pos + 1}]) ELSE 0 END)"
    }
    val hbits = (for { r <- 0 until 4; c <- 0 until 3 } yield
      s"""CASE WHEN ${pxi(r * 4 + c)} > ${pxi(r * 4 + c + 1)}
          THEN ${1L << (r * 3 + c)} ELSE 0 END""").mkString(" + ")
    val vbits = (for { cc <- 0 until 4; r <- 0 until 3 } yield
      s"""CASE WHEN ${pxi(r * 4 + cc)} > ${pxi((r + 1) * 4 + cc)}
          THEN ${1L << (cc * 3 + r)} ELSE 0 END""").mkString(" + ")
    s"""SELECT doc_id AS media_id, CAST($hbits AS BIGINT) AS dhash_h,
        CAST($vbits AS BIGINT) AS dhash_v
        FROM documents ORDER BY media_id"""
  }

  private def duckPpm(num: String, den: String,
      scale: Long = 1000000L): String =
    s"""(CASE WHEN ($num) < 0 THEN -1 ELSE 1 END) *
        CAST(((${2 * scale} * abs($num) + ($den)) // (2 * ($den)))
          AS BIGINT)"""

  /** DuckDB CTE prefix: per-document content-defined chunks
    * `ck (doc_id, clen, chash)` — [[graft.plans.CdcScan]]'s landmark
    * chunking replayed POSITIONALLY (the window hash recomputed from
    * scratch at every char position, no rolling), shared by every
    * CDC-family oracle so chunker and oracles can never desynchronize.
    */
  private def duckCdcCk(w: Int = 16, maskBits: Int = 5): String = {
    val mask = 1L << maskBits
    s"""pos AS (SELECT doc_id, text,
          unnest(range($w, length(text) + 1)) AS i FROM documents),
        b AS (SELECT doc_id, CAST(i AS BIGINT) AS i FROM pos
          WHERE ${duckPolyId(
            s"substr(text, CAST(i - ${w - 1} AS INTEGER), $w)")}
            % $mask = ${mask - 1}),
        be AS (SELECT doc_id, i FROM b
          UNION
          SELECT doc_id, CAST(length(text) AS BIGINT) AS i
          FROM documents WHERE length(text) > 0),
        ch AS (SELECT doc_id, text, i AS e,
          coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
            AS sprev
          FROM be JOIN documents USING (doc_id)),
        ck AS (SELECT doc_id, e - sprev AS clen,
          ${duckPolyId(
            "substr(text, CAST(sprev + 1 AS INTEGER), CAST(e - sprev AS INTEGER))")}
            AS chash FROM ch)"""
  }

  /** DuckDB fragment chain replaying FixLog.exp2q bit for bit over a
    * one-column NONNEGATIVE value table `ex$sfx (x)` (negative
    * exponents would need floor-division bit surgery; every catalog
    * consumer clips at zero): 16 unrolled fraction-bit stages
    * multiplying by the integer-sqrt-derived Exp2C ladder, then the
    * exact integer-part shift. Emits `e2t$sfx (x, v)`.
    */
  private def duckExp2Chain(sfx: String): String = {
    val stages = (0 until 16).map { k =>
      s"""h$sfx${k + 1} AS (SELECT x, e,
          CASE WHEN ((x >> ${15 - k}) & 1) = 1
            THEN (acc * ${graft.plans.FixLog.Exp2C(k)}) >> 20
            ELSE acc END AS acc
          FROM h$sfx$k)"""
    }.mkString(",\n")
    s"""h${sfx}0 AS (SELECT x, x >> 16 AS e,
          CAST(1048576 AS BIGINT) AS acc FROM ex$sfx),
        $stages,
        e2t$sfx AS MATERIALIZED (SELECT x, acc << e AS v FROM h${sfx}16)"""
  }

  /** DuckDB fragment chain replaying FixLog.log2q bit for bit over a
    * one-column value table `lx (x)`: MSB position via integer binary
    * formatting (no libm), 20-bit mantissa normalization, 16 unrolled
    * squaring stages. Emits `lgt (x, lq)`.
    */
  private def duckLog2Chain: String = {
    val stages = (1 to 16).map { i =>
      s"""g$i AS (SELECT x, e,
            CASE WHEN ((m * m) >> 20) >= 2097152 THEN ((m * m) >> 21)
                 ELSE ((m * m) >> 20) END AS m,
            f * 2 + (CASE WHEN ((m * m) >> 20) >= 2097152 THEN 1 ELSE 0 END)
              AS f
            FROM g${i - 1})"""
    }.mkString(",\n")
    s"""g0 AS (SELECT x,
          length(bin(x)) - 1 AS e,
          CASE WHEN length(bin(x)) - 1 >= 20
            THEN x >> (length(bin(x)) - 1 - 20)
            ELSE x << (20 - (length(bin(x)) - 1)) END AS m,
          CAST(0 AS BIGINT) AS f
          FROM lx),
        $stages,
        lgt AS MATERIALIZED (SELECT x, e * 65536 + f AS lq FROM g16)"""
  }

  /** DuckDB fragment chain: the naive-Bayes model over documents —
    * token-class counts, the class x vocabulary Laplace grid, the log2
    * table over every needed argument, weights, and priors. Emits
    * `td (doc_id, lang, token)`, `wts (class, token, n, w_q)`,
    * `pri (class, nd)`, and `lgt`.
    */
  private def duckNbChain: String =
    s"""td AS MATERIALIZED (SELECT doc_id, lang, t.word AS token
          FROM (SELECT doc_id, lang, unnest(${duckToks("text")}) AS word
                FROM documents) t
          WHERE regexp_matches(t.word, '^[a-z]+$$')),
        cnt AS MATERIALIZED (SELECT lang AS class, token,
            CAST(count(*) AS BIGINT) AS n
          FROM td GROUP BY 1, 2),
        cls AS (SELECT class, sum(n) AS nc FROM cnt GROUP BY 1),
        voc AS (SELECT DISTINCT token FROM cnt),
        vct AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
        grid AS MATERIALIZED (SELECT c.class, w.token,
            coalesce(ct.n, CAST(0 AS BIGINT)) AS n, c.nc, vct.v
          FROM cls c CROSS JOIN voc w CROSS JOIN vct
          LEFT JOIN cnt ct ON ct.class = c.class AND ct.token = w.token),
        pri AS (SELECT lang AS class, CAST(count(*) AS BIGINT) AS nd
          FROM documents GROUP BY 1),
        lx AS (SELECT DISTINCT x FROM (
          SELECT n + 1 AS x FROM grid
          UNION SELECT nc + v FROM grid
          UNION SELECT nd FROM pri)),
        $duckLog2Chain,
        wts AS MATERIALIZED (SELECT grid.class, grid.token, grid.n,
            ln1.lq - ld.lq AS w_q
          FROM grid
          JOIN lgt ln1 ON ln1.x = grid.n + 1
          JOIN lgt ld ON ld.x = grid.nc + grid.v)"""

  /** DuckDB fragment chain: the NB margin reliability table and its
    * exact PAV isotonic fit (greatest-convex-minorant characterization,
    * replaying [[graft.functions.Eval.isotonicCalibrate]] bit for bit).
    * Emits `iso (bin, n, nc, acc_ppm, cal_ppm)` — shared by the
    * q_calibrated gate and the q_brier_decomp decomposition so fit and
    * consumers can never desynchronize.
    */
  private def duckIsoCalCte: String =
    s"""$duckNbChain,
        sc AS (SELECT td.doc_id, w.class, sum(w.w_q) AS s
          FROM td JOIN wts w ON w.token = td.token GROUP BY 1, 2),
        fin AS MATERIALIZED (SELECT sc.doc_id, sc.class,
            sc.s + lp.lq AS score_q,
            row_number() OVER (PARTITION BY sc.doc_id
              ORDER BY sc.s + lp.lq DESC, sc.class ASC) AS rn
          FROM sc JOIN pri ON pri.class = sc.class
          JOIN lgt lp ON lp.x = pri.nd),
        mg AS (SELECT f1.doc_id, f1.class AS pred_class,
            CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
          FROM fin f1 JOIN fin f2
            ON f2.doc_id = f1.doc_id AND f2.rn = 2
          WHERE f1.rn = 1),
        rel AS MATERIALIZED (SELECT mg.margin_q // 65536 AS bin,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN mg.pred_class = dd.lang THEN 1 ELSE 0 END)
            AS BIGINT) AS nc
          FROM mg JOIN documents dd USING (doc_id) GROUP BY 1),
        cumpts AS MATERIALIZED (SELECT bin, n, nc,
          CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
          CAST(sum(nc) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS BIGINT) AS cs
          FROM rel),
        pts AS MATERIALIZED (SELECT cw, cs FROM cumpts
          UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        viol AS (SELECT DISTINCT m.cw FROM pts m
          JOIN pts j ON j.cw < m.cw JOIN pts k ON k.cw > m.cw
          WHERE CAST(m.cs - j.cs AS HUGEINT) * (k.cw - j.cw) >
            CAST(k.cs - j.cs AS HUGEINT) * (m.cw - j.cw)),
        hull AS MATERIALIZED (SELECT * FROM pts
          WHERE cw NOT IN (SELECT cw FROM viol)),
        sa AS (SELECT c.bin, h.cw AS wa, h.cs AS sa,
          row_number() OVER (PARTITION BY c.bin ORDER BY h.cw DESC)
            AS rn
          FROM cumpts c JOIN hull h ON h.cw < c.cw),
        sb AS (SELECT c.bin, h.cw AS wb, h.cs AS sb,
          row_number() OVER (PARTITION BY c.bin ORDER BY h.cw ASC)
            AS rn
          FROM cumpts c JOIN hull h ON h.cw >= c.cw),
        iso AS MATERIALIZED (SELECT r.bin, r.n, r.nc,
          ${duckPpm("r.nc", "r.n")} AS acc_ppm,
          ${duckPpm("sb.sb - sa.sa", "sb.wb - sa.wa")} AS cal_ppm
          FROM rel r
          JOIN sa ON sa.bin = r.bin AND sa.rn = 1
          JOIN sb ON sb.bin = r.bin AND sb.rn = 1)"""

  /** DuckDB fragment chain replaying Pca exactly in HUGEINT: quantize →
    * division-free centering → Gram cells → `iters` power-iteration
    * stages (sign-preserving truncated division — positive-operand `//`
    * is truncation) → sign canonicalization. Emits `qv (vec_id, i, q)`
    * and `pv (i, v)`.
    */
  private def duckPcaChain(dims: Int = 16, iters: Int = 8): String = {
    // MATERIALIZED: each stage is referenced twice downstream — default
    // CTE inlining would re-expand the whole chain exponentially
    val stages = (1 to iters).map { r =>
      s"""w$r AS MATERIALIZED (SELECT cov.i AS i, sum(cov.m * vv.v) AS w
            FROM cov JOIN v${r - 1} vv ON vv.i = cov.j GROUP BY 1),
          m$r AS (SELECT max(abs(w)) AS m FROM w$r),
          v$r AS MATERIALIZED (SELECT i,
            CASE WHEN w < 0 THEN -((-w) * 1000000 // m)
            ELSE w * 1000000 // m END AS v FROM w$r, m$r)"""
    }.mkString(",\n")
    s"""qv AS (SELECT vec_id, r.i,
          CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000, 0) AS BIGINT)
            AS q
          FROM embeddings, range(1, ${dims + 1}) r(i)),
        tot AS (SELECT i, sum(q) AS s, CAST(count(*) AS BIGINT) AS n
          FROM qv GROUP BY i),
        cen AS (SELECT vec_id, qv.i, t.n * qv.q - t.s AS c
          FROM qv JOIN tot t ON t.i = qv.i),
        cov AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
            sum(CAST(a.c AS HUGEINT) * b.c) AS m
          FROM cen a JOIN cen b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        v0 AS (SELECT r.i,
          CAST(CASE WHEN r.i = 1 THEN 1000000 ELSE 0 END AS HUGEINT) AS v
          FROM range(1, ${dims + 1}) r(i)),
        $stages,
        fz AS (SELECT min(i) AS fi FROM v$iters WHERE v <> 0),
        sg AS (SELECT CASE WHEN vf.v < 0 THEN -1 ELSE 1 END AS s
          FROM v$iters vf, fz WHERE vf.i = fz.fi),
        pv AS (SELECT vv.i, vv.v * sg.s AS v FROM v$iters vv, sg)"""
  }

  /** DuckDB fragment: one BPE round — weighted adjacent-pair counts over
    * `prev`'s symbol lists, deterministic top-1 (`t`), double-space-safe
    * rewrite into `next`. Shared by q_bpe_merges and q_bpe_encode.
    */
  private def duckBpeRound(prev: String, p: String, t: String,
      next: String): String =
    s"""$p AS (SELECT sym_a, sym_b, CAST(sum(wc) AS BIGINT) AS pair_count
          FROM (SELECT wc, unnest(s[1:len(s)-1]) AS sym_a,
                  unnest(s[2:len(s)]) AS sym_b
                FROM (SELECT wc, list_filter(string_split(rep, '  '),
                        x -> x != '') AS s FROM $prev)
                WHERE len(s) >= 2)
          GROUP BY 1, 2),
        $t AS (SELECT * FROM $p
          ORDER BY pair_count DESC, sym_a ASC, sym_b ASC LIMIT 1),
        $next AS (SELECT word, wc,
          replace(rep, ' ' || sym_a || '  ' || sym_b || ' ',
                       ' ' || sym_a || sym_b || ' ') AS rep
          FROM $prev CROSS JOIN $t)"""

  /** DuckDB CTE chain: word counts → double-space symbol
    * representation → three greedy BPE merge rounds
    * ([[duckBpeRound]] ×3) — the shared corpus chain of every BPE
    * oracle. Ends with round-3 state: `t1/t2/t3` (the merges) and
    * `r3` (the re-segmented types).
    */
  private def duckBpeChain: String =
    s"""w AS (SELECT word, CAST(count(*) AS BIGINT) AS wc
            FROM (SELECT unnest(${duckToks("text")}) AS word FROM documents)
            GROUP BY 1),
          r0 AS (SELECT word, wc, '  ' ||
            array_to_string(list_filter(string_split(word, ''),
              c -> c != ''), '  ') || '  ' AS rep FROM w),
          ${duckBpeRound("r0", "p1", "t1", "r1")},
          ${duckBpeRound("r1", "p2", "t2", "r2")},
          ${duckBpeRound("r2", "p3", "t3", "r3")}"""

  /** DuckDB CTE chain for the BM25 scorer over `bm25Query` — the exact
    * integer-quantized pipeline of Rank.bm25TopDocs. Ends with
    * `agg(doc_id, n_terms, score_q)`; shared by q_bm25 and q_rrf_fuse.
    */
  private def duckBm25Cte: String = {
    val terms = bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH lens AS (SELECT doc_id,
          CAST(len(${duckToks("text")}) AS BIGINT) AS dl FROM documents),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(dl) AS BIGINT) AS t_tokens FROM lens),
        toks AS (SELECT doc_id, unnest(${duckToks("text")}) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE term IN ($terms) GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        sc AS (SELECT doc_id,
          (CAST(2 AS HUGEINT) * n_docs + 2) * 44 * tf * t_tokens * 1000000
          // ((CAST(2 AS HUGEINT) * df + 1) *
             (CAST(20 AS HUGEINT) * tf * t_tokens
              + CAST(6 AS HUGEINT) * t_tokens
              + CAST(18 AS HUGEINT) * dl * n_docs)) AS term_q
          FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id)
          CROSS JOIN tot),
        agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
          CAST(sum(term_q) AS BIGINT) AS score_q FROM sc GROUP BY 1)
        """
  }

  /** DuckDB CTE chain for span dedup: positioned hashed n-grams over the
    * documents table, the repeated-gram semi-join, and the gaps-and-
    * islands numbering. Ends with `sid(doc_id, pos, span_id)`; `tk` stays
    * visible for consumers needing doc lengths.
    */
  private def duckSpanCte(n: Int): String = {
    val gram = duckPolyId(s"array_to_string(tk[i:i+${n - 1}], ' ')")
    s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
        g AS (SELECT doc_id,
          unnest(range(0, len(tk) - $n + 1)) AS pos,
          unnest(list_transform(range(1, len(tk) - $n + 2),
            i -> $gram)) AS tid
          FROM tk WHERE len(tk) >= $n),
        rep AS (SELECT tid FROM g GROUP BY tid HAVING count(*) > 1),
        h AS (SELECT doc_id, pos FROM g SEMI JOIN rep USING (tid)),
        m AS (SELECT doc_id, pos, max(pos + $n) OVER (PARTITION BY doc_id
            ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS pme FROM h),
        s AS (SELECT doc_id, pos,
          CASE WHEN pos > coalesce(pme, -1) THEN 1 ELSE 0 END AS ns FROM m),
        sid AS (SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id
            ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS span_id FROM s)
        """
  }

  /** DuckDB fragment: Text.tokenLines over a token list `tk` — space-
    * joined fixed-width windows of `lineLen` tokens, last line keeps the
    * remainder, empty list for token-less docs (floor((0-1)/L) = -1 makes
    * the range empty, matching the Spark guard).
    */
  private def duckLines(lineLen: Int): String =
    s"""list_transform(range(0, CAST(floor((len(tk) - 1) / $lineLen.0) AS INT) + 1),
        i -> array_to_string(tk[i*$lineLen+1:i*$lineLen+$lineLen], ' '))"""

  /** DuckDB CTE chain reproducing MinHash-LSH candidate pairs over the
    * documents table (3-gram shingles, `numMinhashes` permutations, bands
    * of 2, bucket cap 1000) — the body shared by q_minhash_lsh and
    * q_neardup_cluster. Ends with `lsh_pairs(id_a, id_b)`.
    */
  private def duckLshPairsCte: String = {
    val perms = (0 until numMinhashes)
      .map(j => s"(${j}, ${Dedup.permA(j)}, ${Dedup.permB(j)})").mkString(", ")
    s"""tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
        sh0 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
          THEN list_transform(range(1, len(tk) - 1),
            i -> array_to_string(tk[i:i+2], ' '))
          ELSE [] END) AS gram FROM tk),
        sh AS (SELECT DISTINCT doc_id, gram FROM sh0),
        ids AS (SELECT doc_id, ${duckPolyId("gram")} AS tid FROM sh),
        perms AS (SELECT * FROM (VALUES $perms) p(j, a, b)),
        sig AS (SELECT doc_id, j, min((tid * a + b) % ${Dedup.MersennePrime}) AS mh
          FROM ids CROSS JOIN perms GROUP BY doc_id, j),
        bands AS (SELECT doc_id, j // 2 AS band,
          sum(CASE WHEN j % 2 = 0 THEN mh ELSE 0 END * 2147483648 +
              CASE WHEN j % 2 = 1 THEN mh ELSE 0 END) AS band_val
          FROM sig GROUP BY doc_id, band),
        caps AS (SELECT band, band_val, count(*) AS c FROM bands GROUP BY 1, 2),
        capped AS (SELECT bands.doc_id, bands.band, bands.band_val
          FROM bands JOIN caps USING (band, band_val) WHERE c <= ${duckDerivedCap("SELECT count(DISTINCT doc_id) FROM bands")}),
        lsh_pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM capped a JOIN capped b USING (band, band_val)
          WHERE a.doc_id < b.doc_id)"""
  }

  /** DuckDB CTE chain: decimal-exact dimension-wise centroids of the
    * embeddings table grouped by label (exposed as `alias`), matching
    * Vec.groupCentroids bit-for-bit — shared by q_embed_centroid and
    * q_ivf_topk. The element is widened REAL -> DOUBLE before the decimal
    * cast: DuckDB's direct REAL -> DECIMAL quantizes the float's SHORTEST
    * string ("0.1" for 0.1f) while Spark widens to double and keeps the
    * binary expansion (0.1000000015) — the double hop makes both engines
    * quantize the same value. Ends with `cl(alias, centroid)`.
    */
  private def duckCentroidCte(alias: String): String =
    duckCentroidStages("embeddings", "label", alias, "ex", "cent", "cl")

  /** Generalized form: centroids of `src`(.., embedding) grouped by
    * `groupCol` (exposed as `alias`), with caller-chosen CTE stage names
    * so several centroid computations can coexist in one WITH chain
    * (k-means recomputes centroids per unrolled iteration). Ends with
    * `clN(alias, centroid)`.
    */
  private def duckCentroidStages(src: String, groupCol: String, alias: String,
      exN: String, centN: String, clN: String): String =
    s"""$exN AS (
          SELECT $groupCol AS $alias, s.i AS dim, s.x AS x FROM (
            SELECT $groupCol, unnest(list_transform(range(1, len(embedding) + 1),
              i -> {'i': i, 'x': embedding[i]})) AS s
            FROM $src)),
        $centN AS (
          SELECT $alias, dim,
            CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / COUNT(x) AS m
          FROM $exN GROUP BY $alias, dim),
        $clN AS (
          SELECT $alias, list(CAST(m AS REAL) ORDER BY dim) AS centroid
          FROM $centN GROUP BY $alias)"""

  /** DuckDB CTE chain reproducing Vec.kmeans(k=8, iters=2) over the
    * embeddings table: smallest-id init (c0), two unrolled
    * assign→update stages, identical rounded-distance / tie-break /
    * decimal-centroid arithmetic. Ends with `a2(vec_id, embedding, cell,
    * dist2)` — shared by q_kmeans, q_diverse_sample, q_semdedup,
    * q_ivf_kmeans.
    */
  private def duckKmeansCte: String = duckKmeansStages("embeddings", "", 8)

  /** [[duckKmeansCte]] with kCells DERIVED from the corpus size — the
    * SQL twin of `Vec.deriveKCells(count, 64)` (ceil(n/64), via a
    * LIMIT subquery), so the *Auto catalog entries (q_semdedup,
    * q_mutual_knn) hash-match at EVERY scale factor: at sf0.01 the
    * derivation yields the same 8 cells as the fixed-k chain; at sf0.1
    * both engines derive 32. A literal k here was the one
    * scale-pinned constant in the catalog (found by the round-9
    * full-catalog sf0.1 cross-check).
    */
  private def duckKmeansCteAuto: String =
    duckKmeansStages("embeddings", "",
      "(SELECT (count(*) + 63) // 64 FROM embeddings)")

  /** Generalized form: Vec.kmeans(k, iters=2) over CTE/table `src`
    * (vec_id, embedding), every stage name prefixed with `p` so several
    * unrolled k-means runs coexist in one WITH chain (product
    * quantization trains one per subspace). Ends with `${p}a2(vec_id,
    * embedding, cell, dist2)`.
    */
  private def duckKmeansStages(src: String, p: String, k: Int): String =
    duckKmeansStages(src, p, k.toString)

  /** `k` as raw SQL — a literal, or a scalar subquery for the derived-
    * kCells form ([[duckKmeansCteAuto]]). */
  private def duckKmeansStages(src: String, p: String, k: String): String = {
    val dotSql = duckDotSql _
    val dotSqlEE = dotSql("e.embedding", "e.embedding")
    // one unrolled assignment stage against centroid CTE `cent`
    def assign(cent: String, pN: String, aN: String): String =
      s"""$pN AS (SELECT e.vec_id, e.embedding, c.cell,
            round(greatest(0.0, ($dotSqlEE - 2 * ${dotSql("e.embedding", "c.cvec")})
              + ${dotSql("c.cvec", "c.cvec")}), 6) AS dist2
          FROM $src e CROSS JOIN $cent c),
          $aN AS (SELECT vec_id, embedding, cell, dist2 FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY dist2, cell) AS rn FROM $pN) WHERE rn = 1)"""
    s"""${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
            embedding AS cvec
          FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $k)),
        ${assign(s"${p}c0", s"${p}a1p", s"${p}a1")},
        ${duckCentroidStages(s"${p}a1", "cell", "cell", s"${p}ex1", s"${p}ct1", s"${p}cl1")},
        ${p}c1 AS (SELECT cell, centroid AS cvec FROM ${p}cl1),
        ${assign(s"${p}c1", s"${p}a2p", s"${p}a2")}"""
  }

  /** DuckDB CTE chain reproducing Vec.kCenters(k) over the embeddings
    * table: smallest-id seed, then k−1 unrolled farthest-point rounds.
    * The incremental `least`-fold Spark maintains equals the min over
    * the full chosen set (rounding happens per-center before the fold),
    * so the SQL can use the set-min formulation directly. Ends with the
    * final SELECT (sel_round, vec_id, radius2).
    */
  private def duckKCenterSql(k: Int): String = {
    val dotSql = duckDotSql _
    val dEE = dotSql("e.embedding", "e.embedding")
    def dist(sN: String, dN: String): String =
      s"""$dN AS (SELECT e.vec_id, e.embedding,
            min(round(greatest(0.0, ($dEE - 2 * ${dotSql("e.embedding", "c.cvec")})
              + ${dotSql("c.cvec", "c.cvec")}), 6)) AS dmin
          FROM embeddings e CROSS JOIN $sN c
          GROUP BY e.vec_id, e.embedding)"""
    val rounds = (2 to k).map { r =>
      s"""${dist(s"s${r - 1}", s"d${r - 1}")},
          p$r AS (SELECT vec_id, embedding, dmin FROM d${r - 1}
            WHERE dmin > 0 ORDER BY dmin DESC, vec_id LIMIT 1),
          s$r AS (SELECT vec_id, cvec FROM s${r - 1}
            UNION ALL SELECT vec_id, embedding AS cvec FROM p$r)"""
    }.mkString(",\n")
    val picks = (2 to k).map(r =>
      s"SELECT CAST($r AS INT) AS sel_round, vec_id, dmin AS radius2 FROM p$r")
      .mkString("\n UNION ALL ")
    s"""WITH s1 AS (SELECT vec_id, embedding AS cvec
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 1)),
        $rounds
        SELECT CAST(1 AS INT) AS sel_round, vec_id,
          CAST(0.0 AS DOUBLE) AS radius2 FROM s1
        UNION ALL $picks ORDER BY sel_round"""
  }

  /** DuckDB CTE chain reproducing 16-bit SimHash fingerprints over the
    * documents table (token-occurrence hashing, Dedup.simhash arithmetic) —
    * shared by q_simhash and q_simhash_pairs. Ends with
    * `fps(doc_id, simhash)`.
    */

  /** DuckDB CTE chain: the persisted-IVF probe every ranked-retrieval
    * oracle shares — 10 fixed queries (vec_id < 10), decimal-exact
    * centroid ranking, nProbe = 3 pruning, candidate cosine over probed
    * cells. Ends with `cand(query_id, neighbor_id, sim)`; `q` stays
    * visible for exact-side twins. `simTail` appends e.g. " + 0.0"
    * (the -0.0 normalizer) where the sim VALUE is output rather than
    * only ranked; `withQ=false` + `qFrom` ride a caller-supplied query
    * CTE instead. The quantized-index twins probe the same chain over a
    * DIFFERENT corpus: `corpus`/`cellCol` redirect the candidate join
    * (reconstructed `rce`/`rc`, k-means `a2`), and a non-empty
    * `centroidRel` rides a caller-built centroid relation (e.g. `clq`)
    * instead of emitting `duckCentroidCte` over embeddings. One shared
    * body so an IVF-probe arithmetic fix edits one place (the round-11
    * builder-extraction directive: the energy-distance defect survived
    * five rounds inside a hand-replayed twin).
    */
  private def duckIvfProbeCte(simTail: String = "", withQ: Boolean = true,
      qFrom: String = "q", corpus: String = "embeddings",
      cellCol: String = "label", centroidRel: String = ""): String = {
    val dotSql = duckDotSql _
    val qCte = if (withQ)
      """q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 10),
          """
    else ""
    val cenCte = if (centroidRel.isEmpty) s"""${duckCentroidCte("cell")},
          """
    else ""
    val cenRel =
      if (centroidRel.isEmpty || centroidRel == "cl") "cl"
      else s"$centroidRel cl"
    s"""$cenCte${qCte}pc AS (SELECT q.query_id, q.qv, cl.cell,
            round(${dotSql("q.qv", "cl.centroid")} /
              (sqrt(${dotSql("q.qv", "q.qv")}) *
               sqrt(${dotSql("cl.centroid", "cl.centroid")})), 6) AS cell_sim
            FROM $qFrom CROSS JOIN $cenRel),
          pr AS (SELECT query_id, qv, cell,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cell_sim DESC, cell) AS cell_rank FROM pc),
          probed AS (SELECT query_id, qv, cell FROM pr WHERE cell_rank <= 3),
          cand AS (SELECT p.query_id, e.vec_id AS neighbor_id,
            round(${dotSql("p.qv", "e.embedding")} /
              (sqrt(${dotSql("p.qv", "p.qv")}) *
               sqrt(${dotSql("e.embedding", "e.embedding")})), 6)$simTail AS sim
            FROM probed p JOIN $corpus e ON e.$cellCol = p.cell
            WHERE e.vec_id <> p.query_id)"""
  }

  /** DuckDB CTE pair: the EXACT-cosine top-5 ground truth over the same
    * `q` queries — px scores every vector, rx keeps the top 5 per query
    * (MATERIALIZED: metric oracles re-read it per rank position).
    * `graded=true` carries the 6−rank relevance grade the graded
    * metrics (nDCG/ERR) consume; ids-only otherwise.
    */
  private def duckExactTopkCte(graded: Boolean): String = {
    val dotSql = duckDotSql _
    val sel = if (graded)
      """query_id, neighbor_id,
            6 - rk AS rel FROM (
            SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM px)"""
    else
      """query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM px)"""
    s"""px AS (SELECT query_id, e.vec_id AS neighbor_id,
            round(${dotSql("qv", "e.embedding")} /
              (sqrt(${dotSql("qv", "qv")}) *
               sqrt(${dotSql("e.embedding", "e.embedding")})), 6) AS sim
            FROM q, embeddings e WHERE e.vec_id <> q.query_id),
          rx AS MATERIALIZED (SELECT $sel
            WHERE rk <= 5)"""
  }

  /** DuckDB CTE pair: the sorted-neighborhood candidate graph (window 5
    * over the 30-char lowercased prefix rank) that the SNM listing, the
    * eval-pair metrics, and the whole graph-analytics family share.
    * Ends with `cand(id_a, id_b)`; `r` (doc_id, rn) stays visible.
    */
  private def duckSnmCandCte: String =
    """r AS (SELECT doc_id,
        row_number() OVER (ORDER BY lower(substring(text, 1, 30)),
          doc_id) AS rn FROM documents),
        cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4)"""

  /** DuckDB CTE pair: Naive-Bayes per-(doc, class) scores folded into
    * the ranked prediction relation `fin` (rides $duckNbChain's
    * td/wts/pri/lgt). `sel` appends to the fin projection (e.g. the
    * score for margin/threshold consumers); `mat` marks fin
    * MATERIALIZED for oracles that re-read it per threshold.
    */
  private def duckNbPredCte(sel: String = "", mat: Boolean = false): String = {
    val m = if (mat) "MATERIALIZED " else ""
    s"""sc AS (SELECT td.doc_id, w.class, sum(w.w_q) AS s
            FROM td JOIN wts w ON w.token = td.token GROUP BY 1, 2),
          fin AS $m(SELECT sc.doc_id, sc.class$sel,
              row_number() OVER (PARTITION BY sc.doc_id
                ORDER BY sc.s + lp.lq DESC, sc.class ASC) AS rn
            FROM sc JOIN pri ON pri.class = sc.class
            JOIN lgt lp ON lp.x = pri.nd)"""
  }

  /** DuckDB CTE chain: the df-capped word-3-gram inverted postings and
    * the intersection pair counts behind every n-gram near-dup oracle
    * (Jaccard, containment, k-core, blocker recall) — tokens, distinct
    * hashed shingles, the DERIVED hub cap, sizes, and the id-ordered
    * pair intersection. Ends with `ip(id_a, id_b, inter)`; `gg` and
    * `sizes` stay visible for the verify ratios.
    */
  private def duckNgramPairsCte: String =
    s"""tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
        gr AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
          THEN list_transform(range(1, len(tk) - 1),
            i -> array_to_string(tk[i:i+2], ' '))
          ELSE [] END) AS gram FROM tk),
        g AS (SELECT DISTINCT doc_id, ${duckPolyId("gram")} AS tid FROM gr),
        rare AS (SELECT tid FROM g GROUP BY tid
          HAVING count(*) <= ${duckDerivedCap("SELECT count(*) FROM documents")}),
        gg AS (SELECT g.doc_id, g.tid FROM g JOIN rare USING (tid)),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM gg GROUP BY doc_id),
        ip AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(count(*) AS BIGINT) AS inter
          FROM gg a JOIN gg b ON a.tid = b.tid AND a.doc_id < b.doc_id
          GROUP BY 1, 2)"""

  /** DuckDB RECURSIVE CTE chain: connected components over the shared
    * MinHash-LSH candidate pairs (symmetrized edges, min-reachable-id
    * label per doc) — the clustering base of every near-dup-cluster
    * oracle. Rides [[duckLshPairsCte]]'s `lsh_pairs`; ends with
    * `comp(doc_id, component)`. Must run under WITH RECURSIVE.
    */
  private def duckCcCompCte: String =
    """e AS (SELECT id_a AS s, id_b AS t FROM lsh_pairs
            UNION SELECT id_b, id_a FROM lsh_pairs),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.t, reach.r FROM e JOIN reach ON e.s = reach.id),
        comp AS (SELECT id AS doc_id, min(r) AS component
                   FROM reach GROUP BY id)"""

  /** DuckDB CTE chain: adjacent-bigram counts with left/right
    * continuation fan-outs over the documents table — the shared base
    * of the Kneser-Ney / bigram-LM oracles. Ends with `cb`; `cab`
    * (pair counts), `ca` (left totals + n1a) stay visible.
    */
  private def duckBigramCountsCte: String =
    s"""tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
        dp AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS a,
                     unnest(tk[2:len(tk)]) AS b
          FROM tk WHERE len(tk) >= 2),
        dids AS (SELECT doc_id, ${duckPolyId("a")} AS tid_a,
          ${duckPolyId("b")} AS tid_b FROM dp),
        cab AS (SELECT tid_a, tid_b, CAST(count(*) AS BIGINT) AS c_ab
          FROM dids GROUP BY 1, 2),
        ca AS (SELECT tid_a, CAST(sum(c_ab) AS BIGINT) AS c_a,
          CAST(count(*) AS BIGINT) AS n1a FROM cab GROUP BY 1),
        cb AS (SELECT tid_b, CAST(count(*) AS BIGINT) AS n1b
          FROM cab GROUP BY 1),"""

  /** DuckDB CTE chain: the interpolated-Kneser-Ney bigram probability
    * (d = 0.75 as the exact rational 3/4, ppb-quantized) over
    * [[duckBigramCountsCte]]'s counts — the shared scorer of every
    * KN-smoothed LM oracle. Ends with `lm(tid_a, tid_b, pkn_q)`.
    */
  private def duckKnLmCte: String =
    """np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM cab),
        lm AS (SELECT tid_a, tid_b,
            CAST((CAST(greatest(4 * c_ab - 3, 0) AS HUGEINT) * np
                  + CAST(3 AS HUGEINT) * n1a * n1b) * 1000000000
                 // (CAST(4 AS HUGEINT) * c_a * np) AS BIGINT) AS pkn_q
            FROM cab JOIN ca USING (tid_a) JOIN cb USING (tid_b)
            CROSS JOIN np),"""

  /** DuckDB CTE chain: shortlist-rescore — top-10 approximate
    * candidates per query (from a caller-built `cand(query_id,
    * neighbor_id, sim)`) re-scored with EXACT cosine over the raw
    * embeddings and re-ranked; the shared tail of every quantized-index
    * oracle (PQ/ADC/residual variants differ only in how `cand`
    * approximates). Ends with `fin(query_id, neighbor_id, sim, rank)`.
    */
  private def duckRescoreCte: String = {
    val dotSql = duckDotSql _
    s"""sl AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM cand)
            WHERE rk <= 10),
        rr AS (SELECT s.query_id, s.neighbor_id,
            round(${dotSql("a.embedding", "b.embedding")} /
              (sqrt(${dotSql("a.embedding", "a.embedding")}) *
               sqrt(${dotSql("b.embedding", "b.embedding")})), 6) + 0.0 AS sim
            FROM sl s
            JOIN embeddings a ON a.vec_id = s.query_id
            JOIN embeddings b ON b.vec_id = s.neighbor_id),
        fin AS (SELECT query_id, neighbor_id, sim,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank" FROM rr)"""
  }

  /** DuckDB CTE chain: two rounds of deterministic synchronous label
    * propagation (majority neighbor label, min tie-break) over the SNM
    * candidate graph — the shared community base of the label-prop /
    * conductance / modularity oracles. Rides [[duckSnmCandCte]]'s
    * `cand`; ends with `p2` (the callers define their own final `l2`
    * fold — plain, or MATERIALIZED/cast where re-read per cut).
    */
  private def duckLabelPropCte: String =
    """sym AS (SELECT id_a AS src, id_b AS dst FROM cand
            UNION SELECT id_b, id_a FROM cand),
        l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM documents),
        c1 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
            FROM sym e JOIN l0 l ON l.id = e.src GROUP BY 1, 2),
        p1 AS (SELECT id, lbl FROM (SELECT id, lbl, row_number()
              OVER (PARTITION BY id ORDER BY c DESC, lbl ASC) AS rn2
            FROM c1) WHERE rn2 = 1),
        l1 AS (SELECT v.id, coalesce(p.lbl, v.lbl) AS lbl
            FROM l0 v LEFT JOIN p1 p USING (id)),
        c2 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
            FROM sym e JOIN l1 l ON l.id = e.src GROUP BY 1, 2),
        p2 AS (SELECT id, lbl FROM (SELECT id, lbl, row_number()
              OVER (PARTITION BY id ORDER BY c DESC, lbl ASC) AS rn2
            FROM c2) WHERE rn2 = 1),"""

  private def duckSimhashCte(nBits: Int): String = {
    val bits = (0 until nBits).map(k => s"($k, ${1L << k})").mkString(", ")
    s"""tkall AS (SELECT doc_id, unnest(${duckToks("text")}) AS tok FROM documents),
        ids AS (SELECT doc_id, ${duckPolyId("tok")} AS tid FROM tkall),
        bits AS (SELECT * FROM (VALUES $bits) b(k, pow2)),
        lanes AS (SELECT doc_id, k, pow2,
          sum(CASE WHEN CAST(floor(((tid * ${Dedup.permA(0)} + ${Dedup.permB(0)}) % ${Dedup.MersennePrime}) / pow2) AS BIGINT) % 2 = 1
              THEN 1 ELSE -1 END) AS lane
          FROM ids CROSS JOIN bits
          GROUP BY doc_id, k, pow2),
        fps AS (SELECT doc_id, CAST(sum(CASE WHEN lane > 0 THEN pow2 ELSE 0 END) AS BIGINT) AS simhash
          FROM lanes GROUP BY doc_id)"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-family + decimal-exact aggregation (TPC-H Q1 shape; SURVEY §2.5).
    "q_agg_pricing" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          SparkEntry.discRevenue.as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // P5 — status equality filter, pushed to the parquet scan.
    "q_filter_status" -> { (s, d) =>
      Medallion.filterStatus(
        Tables.orders(s, d).withColumnRenamed("o_orderstatus", "status"), "O")
        .select(col("o_orderkey"), col("status"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // P6 — clean/quarantine split; this query returns the quarantined side.
    "q_quarantine_split" -> { (s, d) =>
      val (_, quarantined) = Medallion.cleanQuarantineSplit(
        Tables.lineitem(s, d), col("l_quantity") >= 25)
      quarantined.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // A1 — distinct projection (hash aggregate; the pipeline's only shuffle).
    "q_distinct_proj" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // O1 — global sort (range partition + per-partition sort).
    "q_orderby" -> { (s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_name"))
    },

    // P4 — conditional floor rewrite (budget-floor analog).
    "q_when_floor" -> { (s, d) =>
      Medallion.withFloor(Tables.orders(s, d), "o_totalprice", 50000L)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // P10 — abs repair.
    "q_abs_repair" -> { (s, d) =>
      Medallion.repairAbs(
        Tables.events(s, d).withColumn("value", col("value") - lit(100.0)),
        "value")
        .select(col("event_id"), col("value"))
        .orderBy(col("event_id"))
    },

    // P1/P9/P11 — metadata enrichment with deterministic literals.
    "q_enrich" -> { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          lit("documents.parquet").as("datasource"),
          lit("new").as("status"),
          to_date(lit("2026-01-01")).as("p_ingestdate"))
        .orderBy(col("doc_id"))
    },

    // J2 — left-anti "when not matched" (customers with no big orders).
    "q_left_anti" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J1 — merge whenMatchedUpdate emulation (status writeback shape).
    "q_status_writeback" -> { (s, d) =>
      val target = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val source = Tables.orders(s, d)
        .filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), lit("flagged").as("o_orderstatus"))
      Merge.whenMatchedUpdate(target, source,
          Seq("o_orderkey"), Seq("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // A2 — count(*) grouped by status.
    "q_count_by_status" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // Join + aggregate across the star schema; dims broadcast.
    "q_join_agg" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },

    // TPC-H Q3 shape: 3-way join with selective filters on both fact
    // tables, revenue aggregation, top-10. Filters push to the scans;
    // customer broadcasts.
    "q_shipping_priority" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(SparkEntry.discRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: 5-way star join through the region hierarchy,
    // grouped revenue per nation. All dims broadcast.
    "q_regional_revenue" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(SparkEntry.discRevenue.as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Skew-salted fact-dim join: lineitem x orders through
    // Scale.saltedJoin (salt the probe side, explode the build side
    // saltFactor ways) — identical rows to the plain equi-join, but a
    // hot orderkey's row group is spread over 8 reducers instead of
    // one straggler; the manual fallback when AQE's skew split can't
    // see the key (pre-shuffle aggregates, bucketed inputs). Gated
    // against the PLAIN SQL join — salting must be invisible in the
    // result.
    "q_salted_join" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.Scale.saltedJoin(l, o, Seq("l_orderkey"), saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(SparkEntry.discRevenue.as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    // G1 — explode an array column (one row per vector element).
    "q_explode_array" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), explode(col("embedding")).as("component"))
        .orderBy(col("vec_id"), col("component"))
    },

    // P2 — struct build + star-expansion flatten.
    "q_struct_flatten" -> { (s, d) =>
      val nested = Tables.orders(s, d)
        .select(struct(col("o_orderkey"), col("o_totalprice")).as("value"))
      Medallion.flattenStruct(nested, "value")
        .drop("value")
        .orderBy(col("o_orderkey"))
    },

    // The native bounded top-k physical operator (TopKPerKeyNode →
    // TopKPartial/TopKFinal, truncation below the exchange) under the
    // oracle gate: top-2 lineitems per supplier by price.
    "q_topk_native" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .withColumn("tie", col("l_orderkey") * 10 + col("l_linenumber"))
      graft.plans.TopKNative.topKPerKey(li, Seq("l_suppkey"),
          "l_extendedprice", "tie", k = 2, descending = true)
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"), col("rank"))
        .orderBy(col("l_suppkey"), col("rank"))
    },

    // Window function — top-3 orders per customer (generalized engine op).
    "q_window_topn" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Window analytics beyond ranking: lag/lead offsets, ntile buckets,
    // cumulative distribution — one partitioned sort, no extra shuffles.
    "q_window_funcs" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Running total per key (ROWS UNBOUNDED PRECEDING frame); decimal
    // accumulation for cross-engine exactness, surfaced as double.
    "q_running_sum" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Set intersection (the one set op q_except/q_union_tagged don't cover).
    "q_intersect" -> { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    },

    // Sketch aggregates: HyperLogLog++ distinct count and approximate
    // quantiles — the constant-memory cardinality/quantile path for 100 TB
    // (exact countDistinct shuffles every distinct value; these don't).
    // Approximation results are engine-specific, so this entry has no
    // Sketch-based stats report, per return flag: approximate distinct
    // parts from the HOUSE deterministic HLL (integer-exact registers,
    // one final double division — q_hll_card's estimator) and
    // approximate price quantiles from an equi-width HISTOGRAM sketch
    // (bin width 1024 — a power of two, so the double division and
    // floor are bit-exact in both engines; estimate = lower edge of
    // the first bin whose cumulative count reaches ceil(q·n), integer
    // comparison only). Re-expressed in round 8 from Spark's built-in
    // approx_count_distinct / percentile_approx — whose internal
    // HLL++/KLL states can't be replayed cross-engine — so this entry
    // now HASH-GATES like everything else (the built-ins stay covered
    // by SketchSpec's error-bound asserts). Scale shape: registers and
    // bins are partial-aggregable groupBys; the cumulative window
    // rides the ~103-bin bounded domain, never corpus rows.
    "q_sketch_stats" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
        col("l_partkey").cast("long").as("tid"), col("l_extendedprice"))
      val regs = graft.functions.Sketch.hllRegisters(
        li.select(col("grp"), col("tid")), "tid", Seq("grp"))
      val est = graft.functions.Sketch.hllEstimate(regs, Seq("grp"))
        .select(col("grp"), round(col("est"), 6).as("approx_parts"))
      val binned = li
        .withColumn("bin", floor(col("l_extendedprice") / 1024.0).cast("long"))
        .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("c"))
      val tot = binned.groupBy(col("grp")).agg(sum(col("c")).as("n"))
      val cum = binned.join(tot, Seq("grp"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("grp")).orderBy(col("bin"))))
      def qEst(pct: Long, as: String) = cum
        .filter(col("cum") * 100L >= col("n") * pct)
        .groupBy(col("grp")).agg((min(col("bin")) * 1024L).as(as))
      est.join(qEst(50L, "p50_est"), Seq("grp"))
        .join(qEst(99L, "p99_est"), Seq("grp"))
        .orderBy(col("grp"))
    },

    // Count-min sketch CONTENT (d=4 rows × w=64 buckets over the corpus
    // token stream) — the deterministic counterpoint to q_sketch_stats:
    // with the hash seeds pinned to literals and the item hash the
    // engine's shared polynomial hash, the full sketch table hash-matches
    // a DuckDB replay. One pass, bounded d·w state per task (custom
    // Aggregator — the same extension rung as Misra-Gries).
    "q_cms_sketch" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .select(graft.plans.TextExpressions.polyHash(col("tok")).as("tid"))
      graft.functions.Sketch.cmsTable(toks, "tid", d = CmsDepth, w = CmsWidth)
        .where(col("cnt") > 0L)
        .orderBy(col("sketch_row"), col("bucket"))
    },

    // Count-min point estimates for the exact top-20 tokens: est(x) =
    // min_i cms[i][h_i(x)] — always >= the true count (the sketch's
    // one-sided guarantee, checked per row by the oracle). The lookup is
    // a broadcast join against the 256-row sketch.
    "q_cms_estimate" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .select(col("tok"),
          graft.plans.TextExpressions.polyHash(col("tok")).as("tid"))
      val sketch = graft.functions.Sketch.cmsTable(toks, "tid", CmsDepth,
        CmsWidth)
      val probes = toks.groupBy(col("tok"), col("tid"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok").asc)
        .limit(20)
      graft.functions.Sketch.cmsEstimates(sketch, probes, "tid", 4, 64)
        .select(col("tok"), col("exact_cnt"), col("est_cnt"),
          (col("est_cnt") - col("exact_cnt")).as("overcount"))
        .orderBy(col("tok"))
    },

    // AMS tug-of-war sketch of F2 (the self-join size / "surprise
    // number") over the token stream — the moment sketch beside
    // count-min and HLL: 16 fixed-seed signed counters, each estimate
    // Z^2 gated WITH its signed error vs the exact F2. Vocabulary-
    // bounded fanout, never stream-sized.
    "q_ams_f2" -> { (s, d) =>
      val tids = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .select(graft.plans.TextExpressions.polyHash(col("tok")).as("tid"))
      graft.functions.Sketch.amsF2(tids, "tid", rows = 16)
        .orderBy(col("sketch_row"))
    },

    // Deterministic HyperLogLog cardinality of l_partkey per return flag —
    // registers are a partial-aggregable groupBy max over <= 64 rows per
    // group, and the raw estimator is integer-exact up to one final double
    // division, so unlike q_sketch_stats the ESTIMATE itself is
    // oracle-gated. err_bp = relative error in basis points vs the exact
    // distinct count. lineitem (not documents): thousands of distinct keys
    // per group keep the raw estimator in its n >> 2.5·m validity regime —
    // the documents per-source vocabulary (~31 tokens) is linear-counting
    // territory where the raw estimator reads ~2x high.
    // KMV bottom-k distinct sketch beside q_hll_card's register form —
    // (k−1)·M div h_k over the catalog mixer's k smallest values; the
    // kept sample additionally supports set-algebra estimates registers
    // can't. Exact integer estimator, window replanned to bounded top-k.
    "q_kmv_distinct" -> { (s, d) =>
      val keys = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"),
          col("l_partkey").cast("long").as("tid"))
      val est = graft.functions.Sketch.kmvEstimate(keys, "tid", k = 128,
        Seq("grp"))
      val exact = keys.groupBy(col("grp"))
        .agg(countDistinct(col("tid")).as("n_exact"))
      exact.join(est, Seq("grp"))
        .select(col("grp"), col("n_exact"), col("n_kept"), col("kth_mv"),
          col("est_distinct"))
        .orderBy(col("grp"))
    },

    "q_hll_card" -> { (s, d) =>
      val keys = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"),
          col("l_partkey").cast("long").as("tid"))
      val regs = graft.functions.Sketch.hllRegisters(keys, "tid", Seq("grp"))
      val est = graft.functions.Sketch.hllEstimate(regs, Seq("grp"))
      val exact = keys.groupBy(col("grp"))
        .agg(countDistinct(col("tid")).as("n_exact"))
      exact.join(est, Seq("grp"))
        .select(col("grp"), col("n_exact"),
          round(col("est"), 6).as("est"),
          floor(abs(col("est") - col("n_exact").cast("double")) /
            col("n_exact").cast("double") * 10000.0).cast("long").as("err_bp"))
        .orderBy(col("grp"))
    },

    // CUBE — all grouping combinations.
    "q_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // Exact covariance via decimal sums: the built-in covar_pop folds
    // doubles in partition order (non-deterministic across engines); the
    // explicit (sum(xy) - sum(x)*sum(y)/n)/n form over decimal sums is
    // bit-stable and partition-order independent.
    "q_covar" -> { (s, d) =>
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(x * y).as("sxy"), sum(x).as("sx"), sum(y).as("sy"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          ((col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double") /
              col("n").cast("double")) / col("n").cast("double"))
            .as("covar_qty_price"),
          col("n"))
        .orderBy(col("l_returnflag"))
    },

    // Exact distinct-count aggregation.
    "q_count_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    },

    // NULL-handling scalars: nullif / coalesce / null-aware count.
    "q_null_funcs" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag_or_null"))
        .withColumn("flag_filled", coalesce(col("flag_or_null"), lit("none")))
        .groupBy(col("flag_filled"))
        .agg(count(col("flag_or_null")).as("n_nonnull"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("flag_filled"))
    },

    // PIVOT — wide aggregation keyed by a categorical column.
    "q_pivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .orderBy(col("l_linestatus"))
    },

    // Exact median (interpolating percentile) per group.
    "q_median" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Array scalar functions over the embedding column.
    "q_array_stats" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          array_min(col("embedding")).as("min_c"),
          array_max(col("embedding")).as("max_c"))
        .orderBy(col("vec_id"))
    },

    // ----------------------------------------------------------------
    // Training-data pipeline operators (documents / embeddings / events)
    // ----------------------------------------------------------------

    // Token counting (whitespace tokenizer).
    "q_token_count" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // Text quality scoring: lengths, stopword ratio, rational-arithmetic
    // quality score (no transcendentals — cross-engine determinism).
    "q_text_quality" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_obs"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"),
          Text.avgTokenLen(col("text")).as("avg_tok_len"),
          Text.stopwordRatio(col("text"), SparkEntry.stopwords).as("stop_ratio"),
          Text.qualityScore(col("text"), SparkEntry.stopwords).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Boilerplate screen per source: the share of docs opening with
    // the source's modal 8-token prefix — crawl sources with shared
    // header/navigation templates score high and earn a
    // prefix-stripping pass before training.
    "q_boilerplate" -> { (s, d) =>
      graft.functions.Quality.boilerplateShare(
          Tables.documents(s, d), "source", "text", n = 8)
        .orderBy(col("source"))
    },

    // k-anonymity / l-diversity audit of the event log: (event_type,
    // day) quasi-identifier groups with under 5 records are linkable;
    // groups whose records span under 3 distinct users leak the user
    // even at k — the release screen beside q_pii_redact's scrubbing.
    "q_k_anon" -> { (s, d) =>
      graft.functions.Quality.kAnonymity(
        Tables.eventsTs(s, d)
          .select(col("event_type"),
            date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("user_id")),
        Seq("event_type", "day"), "user_id", k = 5L, l = 3L)
        .orderBy(col("event_type"), col("day"))
    },

    // t-closeness over the same (event_type, day) quasi-identifier
    // groups — the distributional leak k/l miss: groups whose spend-band
    // distribution sits far (EMD > 0.2) from the table's let an observer
    // sharpen beliefs about members. Bounded-domain cumulative scans.
    "q_t_closeness" -> { (s, d) =>
      graft.functions.Quality.tCloseness(
        Tables.eventsTs(s, d)
          .select(col("event_type"),
            date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            least(floor(col("value") / lit(50.0)), lit(9L)).as("band")),
        Seq("event_type", "day"), "band", thresholdPpm = 200000L)
        .orderBy(col("event_type"), col("day"))
    },

    // Flesch reading ease per document — the classic readability card
    // beside the Gopher-style quality score: words/sentences/syllable
    // (vowel-group) counts collapsed to one exact rational in
    // micro-units; scan-stage regex arithmetic, no shuffle.
    "q_readability" -> { (s, d) =>
      graft.functions.Quality.fleschReadability(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // The grade-level panel beside Flesch ease: ARI (char-counting),
    // Coleman-Liau, and Gunning fog as exact milli-graded integers —
    // the three disagree exactly where difficulty is channel-specific
    // (long words vs long sentences). Scan-stage, no shuffle.
    "q_readability_panel" -> { (s, d) =>
      graft.functions.Quality.readabilityPanel(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // Relative quality gate: keep the top 25% of each source by quality
    // score — the percentile twin of the absolute q_quality_rules
    // threshold gate, exact-integer keep rule, deterministic ties.
    "q_quality_gate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          Text.qualityScore(col("text"), SparkEntry.stopwords).as("quality"))
      graft.functions.Quality.percentileGate(docs, "source", "quality",
          keepBps = 2500, tieCol = "doc_id")
        .orderBy(col("doc_id"))
    },

    // Sampled-threshold quality gate — the 100 TB path: the per-source
    // keep cutoff fitted as an order statistic of a 40% deterministic
    // hash sample, every doc gated scan-stage against the broadcast
    // threshold table (no corpus-wide rank). Mixer, ceil-rank cutoff,
    // >= keep rule, and the empty-sample exact fallback replay exactly
    // in the oracle.
    "q_quality_gate_sampled" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          Text.qualityScore(col("text"), SparkEntry.stopwords).as("quality"))
      graft.functions.Quality.percentileGateSampled(docs, "source",
          "quality", keepBps = 2500, tieCol = "doc_id", idCol = "doc_id",
          samplePerMille = 400)
        .orderBy(col("doc_id"))
    },

    // Curriculum ordering: quality-ranked NTILE difficulty tiers,
    // round-robin interleaved into a dense deterministic training order
    // — one two-level ranking pass, tier + position in closed form.
    "q_curriculum" -> { (s, d) =>
      graft.functions.Sampling.curriculumOrder(
          Tables.documents(s, d).select(col("doc_id"),
            Text.qualityScore(col("text"), SparkEntry.stopwords)
              .as("quality")),
          "doc_id", "quality", 4)
        .orderBy(col("order_idx"))
    },

    // WordPiece greedy segmentation (tokenizer INFERENCE for a given
    // vocab — BPE covers training): longest-match pieces per word with
    // [UNK] single-char fallback, one compiled pass, map-only; fertility
    // (pieces per word) is the tokenizer-quality headline stat.
    "q_wordpiece" -> { (s, d) =>
      val pieces = graft.plans.WordPiece.wordpiece(col("text"),
        SparkEntry.wpVocab)
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(pieces, " ").as("pieces"),
          size(pieces).cast("long").as("n_pieces"),
          Text.tokenCount(col("text")).cast("long").as("n_words"))
        .withColumn("fertility",
          when(col("n_words") > 0,
            col("n_pieces").cast("double") / col("n_words").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy(col("doc_id"))
    },

    // Unigram-LM (SentencePiece) Viterbi segmentation per doc — the third
    // subword family next to BPE (merge replay) and WordPiece (greedy
    // longest match): minimum-total-cost piece sequence under the fixed
    // RefVocab milli-nat cost table, exact integer DP with a total
    // (cost, n_pieces, path) tie-break that DuckDB replays as an unrolled
    // stage-per-position chain. Segmentation runs on the DISTINCT word
    // types and joins back to token occurrences — the 100 TB plan (types
    // are vocabulary-bounded; tokens are the corpus).
    "q_unigram_encode" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
        .where(col("word").rlike("^[a-z]+$"))
      val types = toks.select(col("word")).distinct()
        .select(col("word"),
          graft.plans.Unigram.wordStats(col("word"),
            graft.functions.UnigramLm.RefCosts).as("st"))
        .select(col("word"), col("st")(0).as("np"), col("st")(1).as("cost"))
      toks.join(broadcast(types), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("np")).as("n_pieces"),
          sum(col("cost")).as("cost_milli"),
          round(sum(col("np")).cast("double") /
            count(lit(1)).cast("double"), 6).as("fertility"))
        .orderBy(col("doc_id"))
    },

    // Corpus-wide unigram piece histogram: Viterbi pieces of each word
    // TYPE weighted by the type's token count.
    "q_unigram_pieces" -> { (s, d) =>
      val wc = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("word"))
        .where(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      wc.select(col("wc"),
          explode(graft.plans.Unigram.wordPieces(col("word"),
            graft.functions.UnigramLm.RefCosts)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("piece"))
    },

    // L-bounded suffix ranking by prefix doubling (the suffix-array
    // primitive of exact substring dedup): suffixes ordered by their
    // first 32 tokens in 5 rounds of pair-ranking — sort keys stay
    // (long, long) pairs at every round, never 32-token windows (the
    // L-fold blowup the toy-scale oracle pays).
    "q_suffix_rank" -> { (s, d) =>
      graft.functions.Suffix.suffixRanks(Tables.documents(s, d),
          "doc_id", "text", rounds = 5)
        .orderBy(col("doc_id"), col("pos"))
    },

    // The classical corollary: top-10 longest repeated token substrings
    // (31-token cap) as maximal adjacent-suffix LCPs by rank-table
    // descent, with the repeated text reconstructed.
    "q_longest_repeat" -> { (s, d) =>
      graft.functions.Suffix.longestRepeats(Tables.documents(s, d),
          "doc_id", "text", rounds = 5, k = 10)
    },

    // Edit-distance similarity join over the merged word TYPES of the
    // document corpus and the part-name vocabulary — the typo/variant
    // detector: all pairs within Levenshtein distance 2 by Ed-Join
    // prefix filtering (each word indexes only its q·d+1 globally
    // rarest grams — lossless candidates, exact threshold-DP verify;
    // short strings through the alphabet-bounded block). The count-
    // filter twin editPairs is the recorded A/B loser at scale
    // (ScaleProbe edit_join: 15.4 s vs 2.9 s at 15k words, 241 s vs
    // 5.5 s at 60k). The vocabulary is aggregate data — types, never
    // tokens — so the join runs orders below corpus size at any scale.
    "q_edit_pairs" -> { (s, d) =>
      val types = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("word"))
        .unionByName(Tables.part(s, d)
          .select(explode(split(col("p_name"), " ")).as("word")))
        .where(col("word").rlike("^[a-z]+$"))
        .distinct()
      graft.functions.Edit.editPairsPrefix(types, "word", "word",
          maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ANALYZE-style table profile: one aggregation pass over orders emits
    // the per-column datasheet (rows/nulls/exact distinct/min/max with
    // type-routed renderings) — the stats row a CBO or catalog publishes.
    "q_profile" -> { (s, d) =>
      graft.ops.Profile.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"))
        .orderBy(col("col_name"))
    },

    // Blocklist screening: one compiled Aho-Corasick pass per doc yields
    // the phrase-presence bitmask; count and boolean gates derive from it
    // for free. Scan-stage, no shuffle — the C4/RefinedWeb banned-phrase
    // filter at parquet-scan speed.
    "q_blocklist" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.plans.Blocklist.blocklistMask(col("text"),
            SparkEntry.blockPhrases).as("block_mask"))
        .withColumn("n_blocked", bit_count(col("block_mask")).cast("long"))
        .withColumn("blocked", col("block_mask") =!= 0L)
        .orderBy(col("doc_id"))
    },

    // Fellegi-Sunter probabilistic record linkage: candidate pairs from a
    // cheap (lang, id-bucket) block get per-field agreement flags and the
    // summed milli-bit log-likelihood weight -> link/possible/non-link.
    // Pure map over the blocker's pairs; weights are driver-quantized
    // integer literals (the oracle interpolates the SAME constants).
    "q_fs_linkage" -> { (s, d) =>
      graft.functions.Linkage.score(SparkEntry.fsCandidatePairs(s, d),
          SparkEntry.fsFields, upperMilli = 6000L, lowerMilli = 0L)
        .select(col("doc_id_a").as("id_a"), col("doc_id_b").as("id_b"),
          col("src_agree"), col("len_agree"), col("head_agree"),
          col("chars_agree"), col("weight_milli"), col("decision"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // End-to-end entity resolution: deterministic dirty twins of the
    // customer table → blocking → Fellegi-Sunter link decisions →
    // connected components → survivorship (most-complete base record +
    // cluster-MIN balance repair — the un-drifted clean value; the twin
    // drifts +0.50). One golden record per resolved entity — the
    // master-data composition of the linkage layer.
    "q_er_golden" -> { (s, d) =>
      graft.pipeline.GoldenRecords.golden(
          graft.pipeline.GoldenRecords.dirtyCustomers(Tables.customer(s, d)))
        .orderBy(col("entity_id"))
    },

    // Agreement-pattern histogram — the bounded (<= 2^k rows) table EM
    // parameter estimation consumes; the only corpus-sized pass the
    // estimator needs (Linkage.emEstimate runs driver-side over it).
    "q_fs_patterns" -> { (s, d) =>
      graft.functions.Linkage.agreementHistogram(
          SparkEntry.fsCandidatePairs(s, d), SparkEntry.fsFields)
        .orderBy(col("src_agree"), col("len_agree"), col("head_agree"),
          col("chars_agree"))
    },

    // Per-domain cap (RefinedWeb-style): at most 10 docs per source, best
    // quality first, doc_id tie-break — the anti-domination gate before
    // mixing, on GroupRank's two-level plan (never one sort per domain).
    "q_domain_cap" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          Text.qualityScore(col("text"), SparkEntry.stopwords).as("quality"))
      graft.functions.Quality.groupCap(docs, "source", "quality", "doc_id", 10L)
        .orderBy(col("doc_id"))
    },

    // Language ID by marker-word voting.
    // Hard-negative mining: BM25 rank-1 is the positive; the next 20
    // candidates survive as negatives only below 0.5 Jaccard vs the
    // positive (near-dups are false negatives) — top 10 kept.
    "q_hard_negatives" -> { (s, d) =>
      graft.functions.Rank.hardNegatives(Tables.documents(s, d),
        "doc_id", "text", SparkEntry.bm25Query, k = 10, candidates = 20,
        maxJaccard = 0.5)
    },

    // Per-source data card: the datasheet row a release publishes —
    // doc/token mass, short and PII-bearing doc counts, mean quality
    // (quantized-then-summed so the mean is order-free).
    "q_corpus_card" -> { (s, d) =>
      Quality.corpusCard(Tables.documents(s, d), "source", "text",
          SparkEntry.stopwords, minTokens = 10)
        .orderBy(col("source"))
    },

    "q_lang_id" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Text.langId(col("text"), SparkEntry.langMarkers).as("lang_pred"),
          Text.markerHits(col("text"), SparkEntry.langMarkers(0)._2).cast("long").as("h_en"),
          Text.markerHits(col("text"), SparkEntry.langMarkers(1)._2).cast("long").as("h_ml"),
          Text.markerHits(col("text"), SparkEntry.langMarkers(2)._2).cast("long").as("h_sql"))
        .orderBy(col("doc_id"))
    },

    // Rolling polynomial document fingerprint (order-sensitive char hash).
    "q_doc_fingerprint" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Text.charFingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // Per-doc 8-gram novelty vs the REST of the corpus — the
    // selection/curriculum signal gopher's within-doc stats and the
    // pairwise containment miss: low novelty = assembled from corpus
    // boilerplate, high = fresh text. Hashed-gram wordcount shape.
    "q_novelty" -> { (s, d) =>
      Dedup.noveltyScores(Tables.documents(s, d), "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))
    },

    // Exact dedup: representative id + group size per 60-char text prefix.
    "q_dedup_exact" -> { (s, d) =>
      Dedup.exactGroups(Tables.documents(s, d),
          substring(col("text"), 1, 60), col("doc_id"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    },

    // Near-dup pairs by word-3-gram Jaccard (inverted-list self-join).
    "q_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, minJaccard = 0.2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Graph density: the 2-core of the n-gram-Jaccard near-dup graph —
    // synchronous degree peeling (3 fixed rounds, fixed point asserted in
    // KCoreSpec). Chains and trees of borderline matches peel away;
    // what survives is the dense duplicate hull worth clustering.
    "q_kcore" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id",
        "text", n = 3, minJaccard = 0.2)
      graft.functions.Graph.kCore(pairs, "id_a", "id_b", k = 2, rounds = 3)
        .orderBy(col("id"))
    },

    // Asymmetric containment pairs: |A∩B|/min — the subset detector a
    // Jaccard threshold structurally misses (short doc quoted inside a
    // long one). Same inverted-list blocking as q_ngram_jaccard.
    "q_containment" -> { (s, d) =>
      Dedup.ngramContainmentPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, minContainment = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Sorted-neighborhood blocking (Hernández & Stolfo): rank by a
    // 30-char lowercased prefix key (two-level exact rank — no global
    // sort task) and pair each doc with its 4 rank-successors. The
    // SORT-based blocking family: candidate volume is (w−1)·n by
    // construction, whatever the key distribution.
    "q_snm_pairs" -> { (s, d) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, d), "doc_id",
          lower(substring(col("text"), 1, 30)), window = 5)
        .select(col("id_a"), col("id_b"), col("rdist"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Record-linkage verify stage: Levenshtein over bounded 80-char
    // prefixes decides the match on the SNM candidates — candidates ×
    // prefix² cost, never corpus × full-text².
    "q_editdist_verify" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      Dedup.verifyEditDistance(cand, docs, "doc_id", "text",
          prefixLen = 80, maxDist = 40)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Damerau-Levenshtein verify over the same SNM candidates — the
    // transposition-aware metric beside q_editdist_verify's plain
    // Levenshtein; transposition_gain counts the single-op swaps the
    // plain metric double-charges (the dominant real typo class).
    "q_damerau_verify" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      Dedup.verifyDamerau(cand, docs, "doc_id", "text",
          prefixLen = 80, maxDist = 40)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ROUGE-2 over the SNM candidate pairs (memo-shared generator):
    // clipped bigram-multiset overlap with precision/recall/F in exact
    // ppm — the standard generation/summary eval metric as a verify
    // stage (clipping is what set-Jaccard misses: repeating one shared
    // phrase fifty times credits it once).
    "q_rouge2" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
          lower(substring(col("text"), 1, 30)), window = 5)
        .select(col("id_a"), col("id_b"))
      graft.functions.Eval.rougeN(cand, docs, "doc_id", "text", n = 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Sentence BLEU-4 over the SNM candidates — the classic MT metric
    // completing the generation-eval deck beside q_rouge2 and q_chrf:
    // clipped 1..4-gram precisions, add-1 smoothing above unigrams,
    // brevity penalty; gated in the division-free log domain
    // (4*log2 BLEU in 2^16 units), FixLog logs, one pair join.
    "q_bleu4" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
          lower(substring(col("text"), 1, 30)), window = 5)
        .select(col("id_a"), col("id_b"))
      graft.functions.Eval.bleu4(cand, docs, "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))
    },

    // Blocking-quality report: the SNM window-5 candidates graded
    // against the verified n-gram-Jaccard truth pairs — the recall a
    // blocker swap must hold (recall lost at blocking is unrecoverable
    // downstream). One row: (n_truth, n_candidates, n_hit, recall).
    "q_blocker_recall" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.2)
      Dedup.blockerRecall(cand, truth)
        .select(col("n_truth"), col("n_candidates"), col("n_hit"),
          col("recall"), col("precision"))
    },

    // Community detection: 2 rounds of deterministic synchronous label
    // propagation (majority neighbor label, min tie-break) over the SNM
    // window-5 candidate graph — communities, unlike components, do not
    // merge across a single bridge edge.
    "q_label_prop" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.labelPropagation(cand, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id", rounds = 2)
        .orderBy(col("doc_id"))
    },

    // Conductance of the label-propagation communities over the same
    // SNM graph — the cut-quality score beside q_modularity's null-model
    // one: low phi keeps edges inside, phi = 1e6 means every edge
    // leaves (catches label prop gluing strangers). Exact counts, ppm.
    "q_conductance" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      val labels = graft.functions.Graph.labelPropagation(cand, "id_a",
        "id_b", docs.select(col("doc_id")), "doc_id", rounds = 2)
      graft.functions.Graph.conductance(cand, "id_a", "id_b",
          labels, "doc_id")
        .orderBy(col("label"))
    },

    // Personalized PageRank from a 5-doc seed set over the SNM candidate
    // graph — seeded-teleport proximity ("expand the seed batch"), ranks
    // bit-exact under the 2-round unrolled oracle. Top 25 by rank.
    "q_ppr" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.personalizedPageRank(cand, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id",
          docs.filter(col("doc_id") < 5).select(col("doc_id")), iters = 2)
        .orderBy(col("rank_q").desc, col("doc_id").asc)
        .limit(25)
    },

    // Global PageRank over the same candidate graph (memo-shared
    // neighborhood pairs): uniform teleport = centrality, where
    // q_ppr's seeded teleport = seed proximity; top-25 by the exact
    // fixed-point rank.
    "q_pagerank" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.pageRank(cand, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id", iters = 2)
        .orderBy(col("rank_q").desc, col("doc_id").asc)
        .limit(25)
    },

    // HITS authorities over the doc-term bipartite graph — the
    // mutual-reinforcement centrality next to PageRank/PPR: top-20
    // authoritative tokens after 2 synchronous rounds, fixed-point
    // integer normalization (2-round unrolled oracle).
    "q_hits" -> { (s, d) =>
      graft.functions.Graph.hitsAuthorities(Tables.documents(s, d),
        "doc_id", "text", iters = 2, k = 20)
    },

    // Bounded-hop harmonic centrality over the SNM candidate graph —
    // the closeness-family readout that stays defined on disconnected
    // graphs (unreached docs contribute 0): Σ 1e6 div d over the 3-hop
    // ego set, layered BFS so every pair carries its true distance once.
    "q_harmonic" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.harmonicCentrality(cand, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id", maxHops = 3)
        .orderBy(col("doc_id"))
    },

    // Newman modularity of the 2-round label-prop communities over the
    // same graph — the partition-quality audit (which communities carry
    // the structure), per-community exact rational (4m·e_c − d_c²)/4m²
    // in signed ppm; whole-graph Q is the column sum.
    "q_modularity" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      val comm = graft.functions.Graph.labelPropagation(cand, "id_a",
        "id_b", docs.select(col("doc_id")), "doc_id", rounds = 2)
      graft.functions.Graph.modularity(cand, "id_a", "id_b", comm,
          "doc_id", "label")
        .orderBy(col("label"))
    },

    // Graph cohesion: per-doc triangle support in the SNM candidate
    // graph (degree-oriented enumeration — wedge volume O(m^1.5)
    // whatever the hubs). Triangle-dense neighborhoods are genuine
    // content clusters; triangle-free chains are borderline-match
    // artifacts — the edge-quality signal before cutting a graph.
    "q_triangles" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.triangleCounts(cand, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id"))
    },

    // Local clustering coefficient over the same SNM candidate graph —
    // per-node triangle density normalized for degree
    // (2t/(deg*(deg-1)) in exact ppm): the cut signal that separates
    // coherent content clusters (cc ~ 1) from chains of borderline
    // matches (cc ~ 0 at high degree); deg < 2 renders NULL.
    "q_clustering_coef" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.clusteringCoef(cand, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id"))
    },

    // Link prediction: non-adjacent doc pairs sharing >= 2 neighbors in
    // the SNM graph — the blocker's likeliest misses, the recall-repair
    // pass before clustering (common-neighbors score; hub centers cut
    // at degree 10000 like every inverted-list path).
    "q_common_neighbors" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.commonNeighbors(cand, "id_a", "id_b",
          minCommon = 2L)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Adamic-Adar link prediction over the SNM candidate graph — the
    // log-discounted refinement of q_common_neighbors (rare shared
    // block-mates predict links; hubs are discounted by 1/log2(deg)),
    // contributions as exact 2^32 div log2q(deg) integers.
    "q_adamic_adar" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
        lower(substring(col("text"), 1, 30)), window = 5)
      graft.functions.Graph.adamicAdar(cand, "id_a", "id_b",
          minCommon = 2L)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Benchmark decontamination: docs sharing ANY 3-gram with the eval
    // set (doc_id < 10) drop from the training corpus — broadcast
    // semi-join, linear in the corpus.
    "q_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
          "doc_id", "text", shingleSize = 3)
        .select(col("doc_id")).orderBy(col("doc_id"))
    },

    // Bloom-prefiltered decontamination: same exact semantics through a
    // scan-stage bloom membership cut, so the corpus gram stream never
    // shuffles in full — the contamination check that still works when the
    // eval gram set outgrows the broadcast budget. 4-gram, tolerance 1.
    "q_bloom_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Bloom.decontaminateBloom(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
          "doc_id", "text", shingleSize = 4, maxSharedShingles = 1L)
        .select(col("doc_id")).orderBy(col("doc_id"))
    },

    // Graded contamination report: per training doc, distinct 3-gram
    // shingles, eval-shared shingles, shared fraction — decontaminate's
    // audit twin (evidence, not a drop).
    "q_contam_fraction" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.contaminationStats(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
          "doc_id", "text", shingleSize = 3)
        .orderBy(col("doc_id"))
    },

    // Winnowing fingerprints (Schleimer et al. 2003): per-doc minimum of
    // every 4-hash window over the 3-gram hash stream, rightmost ties —
    // the MOSS local fingerprinting scheme.
    "q_winnow" -> { (s, d) =>
      Dedup.winnowFingerprints(Tables.documents(s, d), "doc_id", "text",
          n = 3, w = 4)
        .orderBy(col("doc_id"), col("sel_pos"))
    },

    // Winnow-indexed near-dup pairs: candidates share at least TWO
    // fingerprints (minShared = 2), verified by full-set Jaccard — same
    // 0.2 threshold as q_ngram_jaccard for comparability. The >=2 rule
    // is a measured candidate-mass cut (r6, sf0.1: candidates
    // 337,125 -> 8,374, verified pairs 256 -> 256 — zero recall loss,
    // wall 5.7 -> 2.7 s warm): a 0.2-Jaccard overlap on real documents
    // spans many >= w+n-1-token runs and therefore many fingerprints;
    // only pairs whose whole overlap selects ONE fingerprint (two
    // sub-w-hash documents) are structurally dropped, a contract the
    // oracle's HAVING mirrors exactly (DedupSpec pins both sides of it).
    "q_winnow_pairs" -> { (s, d) =>
      Dedup.winnowPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, w = 4, minJaccard = 0.2, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Per-doc out-of-vocabulary rate against the corpus top-500 tokens.
    "q_oov_rate" -> { (s, d) =>
      graft.functions.LangModel.oovStats(Tables.documents(s, d),
          "doc_id", "text", vocabSize = 500)
        .orderBy(col("doc_id"))
    },

    // DSIR-style importance selection (Xie et al. 2023): hashed-unigram
    // likelihood ratios against a small target corpus, exact-integer
    // quantized, deterministic top-25. Target = docs < 10, raw = rest.
    "q_dsir_select" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Importance.importanceSelect(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "doc_id", "text", nBuckets = 512, k = 25)
    },

    // MinHash signatures over word-3-gram shingles. Token ids are per-row
    // polynomial hashes (shuffle-free, dictionary-free — the 100 TB design)
    // that the oracle reproduces arithmetically; the xxhash64 production
    // variant is covered in the scalatest suite.
    "q_minhash_sig" -> { (s, d) =>
      val sh = Dedup.docShingleIds(Tables.documents(s, d), "doc_id", "text", 3)
      Dedup.minhashSignature(sh, "doc_id", col("tid"),
          SparkEntry.numMinhashes)
        .select(col("doc_id"), col("j").cast("long").as("j"), col("mh"))
        .orderBy(col("doc_id"), col("j"))
    },

    // MinHash-LSH candidate pairs (bands of 2 rows, bucket-join).
    "q_minhash_lsh" -> { (s, d) =>
      val sh = Dedup.docShingleIds(Tables.documents(s, d), "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"),
        SparkEntry.numMinhashes)
      Dedup.lshCandidatePairs(Dedup.lshBands(sig, "doc_id", 2), "doc_id")
        .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // MinHash calibration: per LSH candidate pair, the k=8 sketch's
    // Jaccard estimate vs the exact shingle-set Jaccard with signed
    // error — the estimator-quality card that justifies the sketch
    // before a corpus-scale dedup trusts it (same memoized chain).
    "q_minhash_calib" -> { (s, d) =>
      Dedup.minhashCalibration(Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, numHashes = SparkEntry.numMinhashes,
          rowsPerBand = 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Near-dup clustering: connected components over the MinHash-LSH
    // candidate pairs (iterative min-label propagation); every document
    // labeled with its cluster id (min reachable doc_id), cluster size,
    // and the canonical-representative flag.
    "q_neardup_cluster" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"),
        SparkEntry.numMinhashes)
      val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(sig, "doc_id", 2),
        "doc_id")
      Cluster.assignClusters(pairs, "id_a", "id_b",
          docs.select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id"))
    },

    // Quality-ranked canonical selection: among each near-dup cluster keep
    // the doc with the most tokens (id tie-break) — the RefinedWeb/Dolma
    // "keep the best copy" rule, composed from the MinHash-LSH clusters.
    "q_canonical_docs" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"),
        SparkEntry.numMinhashes)
      val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(sig, "doc_id", 2),
        "doc_id")
      val assign = Cluster.assignClusters(pairs, "id_a", "id_b",
        docs.select(col("doc_id")), "doc_id")
      val scores = docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      Cluster.canonicalByScore(assign, "doc_id", scores, "n_tokens")
        .orderBy(col("doc_id"))
    },

    // Gopher/C4-style quality gating: five scan-stage signals + the keep
    // decision, all per-row arithmetic at parquet-scan speed.
    "q_quality_rules" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"),
          Text.avgTokenLen(col("text")).as("avg_tok_len"),
          Text.stopwordRatio(col("text"), SparkEntry.stopwords).as("stop_ratio"),
          Text.punctRatio(col("text")).as("punct_ratio"),
          Quality.repetitionRatio(col("text"), 3).as("rep3"))
        .withColumn("keep", Quality.keepRule(col("n_tokens"),
          col("avg_tok_len"), col("stop_ratio"), col("punct_ratio"),
          col("rep3")))
        .orderBy(col("doc_id"))
    },

    // PII redaction: the corpus has no natural PII, so a deterministic
    // dirty column (email + phone + IPv4 appended to every third doc)
    // exercises the real redaction operators; counts audit the original.
    "q_pii_redact" -> { (s, d) =>
      val dirty = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or +1415555"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.as("__dirty"))
        .select(col("doc_id"),
          Quality.redactPii(col("__dirty")).as("clean_text"),
          Quality.emailCount(col("__dirty")).cast("long").as("n_emails"),
          Quality.ipv4Count(col("__dirty")).cast("long").as("n_ips"),
          Quality.phoneCount(col("__dirty")).cast("long").as("n_phones"))
        .orderBy(col("doc_id"))
    },

    // URL component extraction (scheme/host/path/query/domain) over a
    // deterministically synthesized URL column — regex-subset parsing that
    // both engines reproduce span-for-span.
    "q_url_parse" -> { (s, d) =>
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/d/"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0, concat(lit("?lang="), col("lang")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), url.as("__url"))
        .select(col("doc_id"),
          Text.urlScheme(col("__url")).as("scheme"),
          Text.urlHost(col("__url")).as("host"),
          Text.urlPath(col("__url")).as("path"),
          Text.urlQuery(col("__url")).as("query"),
          Text.urlDomain(col("__url")).as("domain"))
        .orderBy(col("doc_id"))
    },

    // TF-IDF top-3 terms per document (raw tf·N/df ranking — monotone with
    // log-idf, bit-reproducible without libm).
    "q_tfidf" -> { (s, d) =>
      Tfidf.topTerms(Tables.documents(s, d), "doc_id", "text", 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("tfidf"), col("term_rank").cast("long").as("term_rank"))
        .orderBy(col("doc_id"), col("term_rank"))
    },

    // Hashing-trick featurization (1024 dims, signed): the
    // vocabulary-free fixed-width vectorizer for linear models over an
    // unbounded token stream — no dictionary build, no OOV path; signed
    // collisions stay unbiased; exact-zero dims drop like any sparse
    // encoding.
    "q_feature_hash" -> { (s, d) =>
      Tfidf.hashingTrick(Tables.documents(s, d), "doc_id", "text",
          dims = 1024)
        .orderBy(col("doc_id"), col("dim"))
    },

    // BPE merge learning: 3 greedy rounds of most-frequent-adjacent-pair
    // fusion over the word-count table (the tokenizer-training primitive,
    // vocabulary-sized per round, bit-exact under the unrolled oracle).
    "q_bpe_merges" -> { (s, d) =>
      graft.functions.Bpe.learnMerges(Tables.documents(s, d), "text", 3)
        .orderBy(col("round"))
    },

    // Tokenizer fertility histogram after 3 BPE rounds: word types and
    // token mass per symbols-per-word bin.
    "q_bpe_fertility" -> { (s, d) =>
      graft.functions.Bpe.fertilityStats(Tables.documents(s, d), "text", 3)
        .orderBy(col("n_syms"))
    },

    // BPE serving: segment the corpus with the 3 learned merges through
    // the vocabulary join (chain replay only for unseen words).
    "q_bpe_encode" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val (merges, vocab) = graft.functions.Bpe.learn(docs, "text", 3)
      graft.functions.Bpe.encodeByVocab(
          docs.select(col("doc_id"), col("text")), "doc_id", "text",
          merges, vocab)
        .select(col("doc_id"), col("n_words"), col("n_subwords"),
          concat_ws(" ", col("subwords")).as("subword_text"))
        .orderBy(col("doc_id"))
    },

    // Lexical diversity: scan-stage Gini impurity over token counts —
    // the log-free alternative to token entropy.
    "q_token_gini" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"),
          Text.tokenGini(col("text")).as("gini"))
        .orderBy(col("doc_id"))
    },

    // CDC snapshot diff: fingerprint-compared corpus versions — emits
    // only the added/removed/changed keys (change-sized, never corpus-
    // sized). Snapshot B derives deterministically from the table.
    "q_snapshot_diff" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val old = docs.select(col("doc_id"),
        Text.charFingerprint(col("text")).as("fp"))
      val neu = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), Text.charFingerprint(
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("fp"))
        .unionByName(docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000L).as("doc_id"),
            Text.charFingerprint(concat(lit("new "), col("text"))).as("fp")))
      Merge.diffSnapshots(old, neu, "doc_id", Seq("fp"))
        .orderBy(col("doc_id"), col("change"))
    },

    // Robust per-source outlier gate: median/MAD on token counts with
    // sort-based exact medians (no per-group value buffering), |x-med| >
    // 3*MAD flags.
    "q_outlier_docs" -> { (s, d) =>
      graft.functions.Robust.outlierStats(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens")),
          "source", "n_tokens", 3.0)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("med"), col("mad"), col("is_outlier"))
        .orderBy(col("doc_id"))
    },

    // Pairwise source-overlap matrix: shared distinct 3-gram shingles and
    // vocabulary Jaccard per source pair — the "which sources re-crawl
    // each other" governance report, full matrix (|S|²/2 rows, bounded by
    // the mixture whatever the corpus).
    "q_source_overlap" -> { (s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", 3)
        .orderBy(col("src_a"), col("src_b"))
    },

    // Burrows' Delta stylometric distance per source pair — function-
    // word usage standardized across sources, mean |z_a - z_b| over the
    // top-50 corpus words: the governance twin of the shingle-overlap
    // matrix on ORTHOGONAL evidence (style, not content) — a low-Delta
    // pair flags a re-crawl even when topics differ.
    "q_burrows_delta" -> { (s, d) =>
      graft.functions.Stats.burrowsDelta(Tables.documents(s, d),
          "source", "text", topK = 50)
        .orderBy(col("source_a"), col("source_b"))
    },

    // Sketch-vs-exact calibration: the MinHash (k=64) estimate of the
    // source-overlap Jaccard matrix joined against the exact matrix with
    // the absolute error per pair — the report that justifies replacing
    // the per-gram pair join with one signature per source at scale.
    "q_source_overlap_mh" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val est = Dedup.sourceOverlapMinhash(docs, "source", "text", 3, 64)
      val exact = Dedup.sourceOverlap(docs, "source", "text", 3)
        .select(col("src_a"), col("src_b"), col("jaccard"))
      est.join(exact, Seq("src_a", "src_b"))
        .withColumn("abs_err", abs(col("jaccard_est") - col("jaccard")))
        .orderBy(col("src_a"), col("src_b"))
    },

    // Exact per-source token-count quantiles (p25/p50/p99) by rank
    // selection — percentile_disc semantics from ONE two-level ranking
    // pass, never a per-group sort task or value buffer.
    "q_group_quantiles" -> { (s, d) =>
      graft.functions.Robust.groupQuantiles(
          Tables.documents(s, d).select(col("source"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens")),
          "source", "n_tokens", Seq(2500, 5000, 9900))
        .orderBy(col("source"), col("q_bps"))
    },

    // Substring-level dedup (Lee et al. 2022): maximal token spans
    // covered by 8-gram windows occurring more than once corpus-wide.
    "q_span_dedup" -> { (s, d) =>
      Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // Span-dedup filter stage: per-doc duplicated-token mass + keep ratio.
    "q_span_stats" -> { (s, d) =>
      Dedup.spanDedupStats(Tables.documents(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id"))
    },

    // Gopher duplicate-line signals (Rae et al. 2021 Table A1) over the
    // deterministic 10-token line segmentation, entirely row-local (the
    // doc's lines live in one array cell — scan-stage, no shuffle). The
    // corpus has no natural within-doc line repeats, so every third doc
    // gets its first two lines re-appended — the q_pii_redact synthesized-
    // dirty-column idiom — and the oracle applies the same dirtying.
    "q_gopher_lines" -> { (s, d) =>
      // compiled single-pass form; the >= 2-lines append guard lives
      // inside the scanner, matching the oracle's len(ls) >= 2 branch
      val sig = when(col("doc_id") % 3 === 0,
        graft.functions.Lines.lineSignalsText(col("text"), 10, appendFirst = 2))
        .otherwise(
          graft.functions.Lines.lineSignalsText(col("text"), 10))
      Tables.documents(s, d)
        .select(col("doc_id"), sig.as("__s"))
        .select(col("doc_id"), col("__s.*"))
        .orderBy(col("doc_id"))
    },

    // Gopher n-gram repetition: char mass of the most-repeated 2-gram and
    // total char mass in repeated 3-grams, per doc — one union-tagged gram
    // stream, two partial-aggregable groupBys, linear at any corpus size.
    "q_gopher_ngrams" -> { (s, d) =>
      graft.functions.Lines
        .ngramRepetitionStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // C4-style corpus-wide keep-first line dedup: lines whose poly hash
    // occurred earlier (smaller (doc_id, line_no)) anywhere in the corpus
    // are dropped; survivors re-join into the cleaned text in order.
    "q_line_dedup" -> { (s, d) =>
      graft.functions.Lines
        .lineDedup(Tables.documents(s, d), "doc_id", "text", 10)
        .orderBy(col("doc_id"))
    },

    // TextRank keyword extraction: fixed-point weighted PageRank (2
    // rounds, d=17/20) over the token co-occurrence graph — the iterative
    // graph-centrality operator, bit-exact under the unrolled oracle CTE.
    "q_textrank" -> { (s, d) =>
      graft.functions.Graph.textRank(Tables.documents(s, d), "text", 2, 25)
        .orderBy(col("rank_q").desc, col("token").asc)
    },

    // RAKE corpus keyphrases: degree-over-frequency scoring of maximal
    // content-word runs (stopwords/punct break phrases) — the cheap
    // co-occurrence keyword miner beside q_textrank's random-walk one;
    // exact ppm word scores summed per phrase, corpus-level stats.
    "q_rake" -> { (s, d) =>
      graft.functions.Rank.rakeKeywords(Tables.documents(s, d),
        "doc_id", "text", stopwords, maxPhraseLen = 4, k = 25)
    },

    // BM25 retrieval (rational idf, exact integer-quantized scoring): top
    // 20 docs for a 3-term query mixing one rare and two common terms.
    "q_bm25" -> { (s, d) =>
      graft.functions.Rank.bm25TopDocs(Tables.documents(s, d), "doc_id",
          "text", bm25Query, 20)
        .orderBy(col("score_q").desc, col("doc_id").asc)
    },

    // Query-likelihood retrieval with Dirichlet smoothing over the same
    // query — the language-modeling scorer beside BM25's probabilistic-
    // relevance one; rank disagreements between the two are the standard
    // retrieval-stack diagnostic. FixLog logs, broadcast corpus stats,
    // TakeOrdered top-k — no corpus shuffle.
    "q_ql_dirichlet" -> { (s, d) =>
      graft.functions.Rank.qlDirichletTopDocs(Tables.documents(s, d),
          "doc_id", "text", bm25Query, mu = 64L, k = 20)
        .orderBy(col("score_q").desc, col("doc_id").asc)
    },

    // Exposure parity of the BM25 top-20 by source (fairness of
    // exposure): each group's share of total 1/rank exposure vs its
    // corpus share, signed ppm gap — the audit that catches a retrieval
    // stack systematically amplifying one source. Groups with no ranked
    // doc still emit their row.
    "q_exposure_parity" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val ranked = graft.functions.Rank.bm25TopDocs(docs, "doc_id",
          "text", bm25Query, 20)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_q").desc, col("doc_id").asc)))
      graft.functions.Eval.exposureParity(
          ranked.select(col("doc_id"), col("rank")), "doc_id", "rank",
          docs, "source")
        .orderBy(col("source"))
    },

    // Equalized-odds audit of the NB language gate binarized on 'en',
    // by source (Hardt et al. 2016): per-group TPR/FPR in exact ppm and
    // the max−min gaps — a corpus filter whose TPR differs by group
    // throttles that group's data. Rides the memoized NB chain.
    "q_eo_gap" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Eval.equalizedOdds(
          graft.functions.NaiveBayes.classify(docs, docs, "doc_id",
            "text", "lang"),
          "doc_id", "pred_class", docs, "lang", "source", "en")
        .orderBy(col("source"))
    },

    // Pseudo-relevance-feedback query expansion (RM1/RM3 family): the
    // BM25 top-10 feedback docs weight candidate terms by
    // sum(tf * score_q); seed terms and stopwords excluded. The
    // retrieval loop's second hop — what a curation team expands a
    // corpus-slicing query with.
    "q_prf_expand" -> { (s, d) =>
      graft.functions.Rank.prfExpansionTerms(Tables.documents(s, d),
        "doc_id", "text", bm25Query, kDocs = 10, kTerms = 10,
        stopwords = stopwords)
    },

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 hit list with
    // a document-quality prior ranking (k=60) — scales never compared,
    // only ranks; contributions quantized to exact integers.
    "q_rrf_fuse" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      // Both rank windows run AFTER a bounded TakeOrdered: 50-row inputs,
      // so the global row_number is a k-sized pass, not a corpus sort.
      val lexical = graft.functions.Rank
        .bm25TopDocs(docs, "doc_id", "text", bm25Query, 50)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("score_q").desc, col("doc_id").asc)).cast("long"))
        .select("doc_id", "rnk")
      val prior = docs
        .select(col("doc_id"),
          Text.qualityScore(col("text"), stopwords).as("quality"))
        .orderBy(col("quality").desc, col("doc_id").asc).limit(50)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("quality").desc, col("doc_id").asc)).cast("long"))
        .select("doc_id", "rnk")
      graft.functions.Rank.rrfFuse(Seq(lexical, prior), "doc_id", "rnk", 60, 20)
        .orderBy(col("rrf_q").desc, col("doc_id").asc)
    },

    // Deterministic per-(lang, source) quota sample: first 5 docs of each
    // stratum ranked by the portable hash bucket.
    "q_stratified_sample" -> { (s, d) =>
      graft.functions.Sampling.stratifiedSample(Tables.documents(s, d),
          Seq("lang", "source"), "doc_id", 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // Token-budget corpus mixing: three sources capped at different token
    // budgets (the data-mixture step), deterministic by hash order.
    "q_mix_budget" -> { (s, d) =>
      graft.functions.Sampling.tokenBudgetSample(
          Tables.documents(s, d)
            .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long")),
          "source", "n_tokens", "doc_id",
          budgets = Seq("src0" -> 2000L, "src1" -> 1000L, "src5" -> 500L))
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // Temperature-scaled mixture weights over languages (T=2): the
    // multilingual rebalancing step. sqrt is IEEE-correctly-rounded in
    // every engine (unlike pow), so the quantized weights hash-match.
    "q_temp_mix" -> { (s, d) =>
      graft.functions.Sampling.temperatureMix(
          Tables.documents(s, d)
            .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long")),
          "lang", "n_tokens", temperature = 2)
        .orderBy(col("lang"))
    },

    // Per-source language-mix concentration (HHI): the log-free
    // composition diagnostic temperature mixing is judged by.
    "q_mix_hhi" -> { (s, d) =>
      graft.functions.Sampling.mixConcentration(
          Tables.documents(s, d), "source", "lang")
        .orderBy(col("source"))
    },

    // UniMax mixture allocation (epoch-capped uniform waterfill): the
    // principled alternative to temperature sampling — exact-integer
    // closed form, every branch (capped prefix, uniform remainder,
    // one-extra-token distribution) under the oracle gate.
    "q_unimax" -> { (s, d) =>
      graft.functions.Sampling.unimaxAllocate(
          Tables.documents(s, d), "lang", "n_chars",
          budget = 120000L, maxEpochs = 1)
        .orderBy(col("lang"))
    },

    // Pairwise unigram total-variation distance between language
    // sub-corpora: the log-free distributional-distinctness diagnostic
    // (TV = 1 − Σ min(p,q), exact integer min-mass sum, one division).
    "q_unigram_tv" -> { (s, d) =>
      graft.functions.LangModel.unigramTV(
          Tables.documents(s, d), "lang", "text")
        .orderBy(col("g_a"), col("g_b"))
    },

    // Per-source unigram token entropy in fixed-point bits (FixLog —
    // the log-domain diversity card the no-libm discipline could not
    // previously reach). Gated on the exact integer numerator and the
    // exact micro-bits rendering (h_bits' rounded double is UX only).
    "q_source_entropy" -> { (s, d) =>
      graft.functions.Entropy.unigramEntropy(
          Tables.documents(s, d), "source", "text")
        .select(col("source"), col("vocab"), col("n_tokens"),
          col("h_num"), col("h_ubits"))
        .orderBy(col("source"))
    },

    // Directed smoothed KL divergence between language unigram
    // distributions — the asymmetric companion of q_unigram_tv's exact
    // TV metric (KL(a||b): the modeling cost of a under b's
    // distribution, the quantity behind DSIR-style importance and
    // domain filtering).
    "q_unigram_kl" -> { (s, d) =>
      graft.functions.Entropy.unigramKL(
          Tables.documents(s, d), "lang", "text")
        .select(col("g_a"), col("g_b"), col("kl_num"), col("kl_ubits"))
        .orderBy(col("g_a"), col("g_b"))
    },

    // Jensen-Shannon divergence per unordered language pair — the
    // symmetric, bounded corpus-similarity card beside TV (exact
    // metric) and KL (directed cost); smoothing-free (the mixture is
    // positive on every support token), one intersection-support
    // equi-join, exact q16 numerators and micro-bit rendering.
    "q_unigram_js" -> { (s, d) =>
      graft.functions.Entropy.unigramJS(
          Tables.documents(s, d), "lang", "text")
        .orderBy(col("g_a"), col("g_b"))
    },

    // Overlapping token-window chunking (context-window splitting for
    // long docs): 64-token chunks, 16-token overlap.
    "q_doc_chunk" -> { (s, d) =>
      graft.functions.Chunk.chunkByTokens(Tables.documents(s, d),
          "doc_id", "text", chunkSize = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // TextTiling semantic boundaries (Hearst 1997): adjacent 20-token
    // blocks scored by integer term-count cosine; valleys (strict local
    // minima) are the topic-shift cut candidates for semantic chunking.
    "q_text_tiling" -> { (s, d) =>
      graft.functions.Chunk.textTileBoundaries(Tables.documents(s, d),
          "doc_id", "text", blockTokens = 20)
        .orderBy(col("doc_id"), col("boundary"))
    },

    // Banded range join: |purchase.value - signup.value| <= 0.05, planned
    // as a bucket-blocked equi-join (one shuffle per side) instead of the
    // quadratic nested loop Spark gives a raw inequality join.
    "q_band_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("value").as("p_val"))
      val sg = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("value").as("s_val"))
      graft.ops.RangeJoin.bandJoin(p, sg, "p_val", "s_val", band = 0.05)
        .select(col("p_id"), col("s_id"), col("p_val"), col("s_val"))
        .orderBy(col("p_id"), col("s_id"))
    },

    // Point-in-interval join via interval bucketing: each order's price
    // against [price, price+1000] intervals of a key subset.
    "q_interval_join" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val iv = o.filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey").as("iv_id"), col("o_totalprice").as("lo"),
          (col("o_totalprice") + 1000.0).as("hi"))
      val pts = o.select(col("o_orderkey").as("pt_id"),
        col("o_totalprice").as("pt"))
      graft.ops.RangeJoin.intervalJoin(pts, iv, "pt", "lo", "hi",
          bucketWidth = 1000.0)
        .select(col("pt_id"), col("iv_id"), col("pt"), col("lo"))
        .orderBy(col("pt_id"), col("iv_id"))
    },

    // Deterministic 20% corpus sample by key hash: a scan-stage filter
    // (reproducible across runs/engines/cluster sizes), never rand().
    "q_hash_sample" -> { (s, d) =>
      graft.functions.Sampling.hashSample(Tables.documents(s, d), "doc_id",
          bps = 2000)
        .select(col("doc_id")).orderBy(col("doc_id"))
    },

    // Weight-proportional sample without replacement (priority /
    // sequential Poisson sampling): top-50 by exact-integer w/u priority,
    // weights = token counts — heavy documents oversampled, one scan +
    // one TakeOrdered, never rand().
    "q_priority_sample" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), Text.tokenCount(col("text")).as("ntok"))
      graft.functions.Sampling.prioritySample(docs, "doc_id", "ntok", k = 50)
        .orderBy(col("doc_id"))
    },

    // Deterministic train/val/test split assignment (80/10/10) by key
    // hash — the held-out-split primitive of a training-data pipeline.
    "q_split_assign" -> { (s, d) =>
      graft.functions.Sampling.splitAssign(Tables.documents(s, d), "doc_id",
          Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id"))
    },

    // Quantile normalization across sources: every doc's length score
    // mapped onto the POOLED distribution at its within-source relative
    // rank — cross-source calibration so one global threshold treats
    // heterogeneous sources fairly. Both rankings on the two-level
    // plan; exact ceil-division position arithmetic.
    "q_quantile_norm" -> { (s, d) =>
      graft.functions.Quality.quantileNormalize(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("n_chars")),
          "source", "n_chars", "doc_id")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("rank_in_group"), col("norm_v"))
        .orderBy(col("doc_id"))
    },

    // LEAKAGE-SAFE split assignment: near-duplicate clusters (LSH pairs
    // → connected components) are split as UNITS — the component id,
    // not the doc id, feeds the hash split, so no near-dup pair ever
    // straddles train/test (the contamination mode plain per-doc
    // splitting cannot prevent).
    "q_split_by_cluster" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"),
        SparkEntry.numMinhashes)
      val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(sig, "doc_id", 2),
        "doc_id")
      val comp = graft.functions.Cluster.connectedComponents(
        pairs, "id_a", "id_b", docs.select(col("doc_id")), "doc_id")
      graft.functions.Sampling.splitAssign(comp, "component",
          Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
        .select(col("doc_id"), col("component"), col("split"))
        .orderBy(col("doc_id"))
    },

    // Deterministic corpus shuffle + sharding: (shard, pos) per doc from
    // the exact-arithmetic mixer — the reproducible training-order
    // handoff to the data loader (no rand(), rerun- and engine-stable).
    "q_corpus_shuffle" -> { (s, d) =>
      graft.functions.Sampling.shardAssign(Tables.documents(s, d),
          "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    },

    // Budget-quantized sequence packing: docs (sharded, in id order) pack
    // into ~256-token groups via the exclusive prefix sum.
    "q_seq_pack" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("shard", pmod(col("doc_id"), lit(4L)))
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
      graft.functions.Sampling.packBudget(docs, "doc_id", "n_tokens",
          budget = 256L, partCols = Seq("shard"))
        .select(col("doc_id"), col("shard"), col("n_tokens"), col("pack_id"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish regex pre-tokenization: letter runs, digit runs, single
    // punctuation — count + joined head as the cross-engine fingerprint.
    "q_regex_tokens" -> { (s, d) =>
      val rt = Text.regexTokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(rt).cast("long").as("n_rtokens"),
          concat_ws("|", slice(rt, 1, 5)).as("head_toks"))
        .orderBy(col("doc_id"))
    },

    // Multimodal frame sampling: every 2nd frame of each document's
    // payload (text bytes through the stub codec — the slicing arithmetic
    // and row-per-frame plumbing are the real, oracle-checked part).
    "q_frame_sample" -> { (s, d) =>
      val media = graft.multimodal.Media.fromText(
        Tables.documents(s, d), "doc_id", "text")
      graft.multimodal.Media.sampleFrames(media, every = 2)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          octet_length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // Token dictionary: distinct vocabulary numbered by lexicographic rank
    // (range-partitioned sort + zipWithIndex — row_number semantics without
    // the single-partition window bottleneck).
    "q_token_dict" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      graft.functions.Dedup.tokenDict(toks).orderBy(col("tok"))
    },

    // SimHash 16-bit fingerprints (token occurrences, polynomial-hash ids;
    // hashedShingles with n=1 is the fused hashed tokenizer).
    "q_simhash" -> { (s, d) =>
      val all = Tables.documents(s, d).select(col("doc_id"),
        graft.plans.TextExpressions.hashedShingles(col("text"), 1))
      Dedup.simhash(all, "doc_id", col("tid"), bits = 16)
        .orderBy(col("doc_id"))
    },

    // SimHash near-dup pairs: pigeonhole chunk blocking (3 chunks cover
    // hamming <= 2 on 30-bit fingerprints) + exact hamming verification —
    // the bit-fingerprint complement to MinHash-LSH banding. 30 bits, not
    // q_simhash's 16: pair discrimination (and candidate-bucket fan-out)
    // needs fingerprint width to grow with corpus homogeneity, and the
    // lane arithmetic is exact to 31 bits.
    // Fingerprints come from the scan-stage SimhashExpr (bit-identical to
    // the Dedup.simhash groupBy form, zero shuffle before blocking).
    // Tokenless docs are filtered BEFORE fingerprinting: a no-signal doc's
    // fp (all-zero lanes) is meaningless for similarity, and the oracle's
    // aggregate form never emits rows for them — the filter keeps both
    // engines on the same universe.
    "q_simhash_pairs" -> { (s, d) =>
      val fp = Tables.documents(s, d)
        .filter(Text.tokenCount(col("text")) > 0)
        .select(col("doc_id"), Dedup.simhashScan(col("text"), 30).as("simhash"))
      Dedup.simhashPairs(fp, "doc_id", "simhash", bits = 30, maxHamming = 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Exact heavy hitters via the Misra-Gries Aggregator: bounded-memory
    // sketch pass for candidates (guaranteed superset above N/(k+1)), then
    // exact counts of the <= k candidates — deterministic output.
    "q_heavy_hitters" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
      graft.functions.Freq.heavyHitters(toks, "tok", k = 40)
        .orderBy(col("tok"))
    },

    // Token co-occurrence lift (PMI's ratio, no libm): distinct tokens per
    // doc, hub cut, pair counts, N*c_ab/(c_a*c_b) rounded to 6.
    "q_cooccur_lift" -> { (s, d) =>
      graft.functions.LangModel.cooccurrenceLift(Tables.documents(s, d),
          "doc_id", "text", minPairCount = 5L)
        .orderBy(col("tok_a"), col("tok_b"))
    },

    // word2phrase collocation mining — ADJACENT-bigram discounted lift
    // (c_ab−δ)·N div (c_a·c_b), the phrase pass that fuses multiword
    // units before tokenizer/embedding training; q_cooccur_lift's
    // document-level cousin finds topics, this finds units. Top-40.
    "q_phrase_mine" -> { (s, d) =>
      graft.functions.LangModel.phraseMine(Tables.documents(s, d),
          "text", delta = 2L, minCount = 3L, topK = 40)
        .orderBy(col("score_e6").desc, col("tok_a"), col("tok_b"))
    },

    // Corpus bigram novelty: occurrence counts, corpus-hapax ratio, and
    // mean bigram document frequency — the distributional stand-in for
    // perplexity filtering, in order-free exact arithmetic.
    // Kneser-Ney bigram LM table (d = 3/4, exact rational arithmetic):
    // bigrams seen at least twice with their smoothed probabilities.
    "q_kn_bigram" -> { (s, d) =>
      graft.functions.LangModel.knBigramProbs(
          Tables.documents(s, d), "text", minCount = 2L)
        .orderBy(col("tid_a"), col("tid_b"))
    },

    // Interpolated KN trigram LM: one backoff order above q_kn_bigram,
    // same exact rational arithmetic (two discounts, one division).
    "q_kn_trigram" -> { (s, d) =>
      graft.functions.LangModel.knTrigramProbs(
          Tables.documents(s, d), "text", minCount = 2L)
        .orderBy(col("tid_a"), col("tid_b"), col("tid_c"))
    },

    // Jelinek-Mercer interpolated bigram LM (λ = 3/4): the
    // fixed-weight mixture smoother beside KN's absolute discounting —
    // dyadic λ collapses it to one exact rational per bigram, gated in
    // the same q9 fixed point.
    "q_jm_bigram" -> { (s, d) =>
      graft.functions.LangModel.jmBigramProbs(
          Tables.documents(s, d), "text", minCount = 2L)
        .orderBy(col("tid_a"), col("tid_b"))
    },

    // LM-fit scoring (CCNet-style, log-free): every doc scored by the
    // mean KN probability of its bigrams under the corpus's own table.
    "q_lm_fit" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.LangModel.knScoreDocs(docs, "doc_id", "text",
          graft.functions.LangModel.knBigramProbs(docs, "text"))
        .orderBy(col("doc_id"))
    },

    // Trigram LM-fit with the full backoff chain, trained on the even-id
    // HALF and scoring everything — so the held-out half exercises every
    // backoff branch (seen trigram / continuation-only / bigram / zero)
    // under the oracle gate, not just the all-seen diagonal.
    "q_lm_fit3" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.LangModel.knScoreDocsTrigram(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0))
        .orderBy(col("doc_id"))
    },

    "q_bigram_stats" -> { (s, d) =>
      graft.functions.LangModel.bigramStats(Tables.documents(s, d),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // Batch-perceptron classifier: integer-exact training under a
    // 12-round budget with convergence early-exit (Classifier.scala —
    // training stops at the first round with zero misclassifications;
    // w0 = 0, so round 1's update is the class-difference vector),
    // every doc scored under the final weights
    // — supervised classifier training under the oracle gate. The label
    // (does the doc contain the token "stream") is text-determined, so
    // the training demonstrably finds the signal (the lang column is
    // text-independent in this corpus — unlearnable by construction).
    "q_perceptron" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val labels = docs.select(col("doc_id"),
        when(array_contains(Text.tokens(col("text")), "stream"), 1L)
          .otherwise(-1L).as("y"))
      graft.functions.Classifier.perceptronScores(docs, "doc_id", "text",
          labels, nBuckets = 64, rounds = 12)
        .orderBy(col("doc_id"))
    },

    // Naive-Bayes training grid: Laplace-smoothed per-(lang, token)
    // log-likelihood weights with ALL log arithmetic in the fixed-point
    // integer log2 (FixLog — libm-free, bit-identical cross-engine).
    // The model is class × vocabulary: aggregate data from one
    // partial-aggregable count.
    "q_nb_weights" -> { (s, d) =>
      graft.functions.NaiveBayes.weights(
          graft.functions.NaiveBayes.tokenClassCounts(
            Tables.documents(s, d), "text", "lang"))
        .orderBy(col("class"), col("token"))
    },

    // Incremental materialized-view maintenance: the per-event-type
    // stats MV (count/sum/max + HLL user registers) absorbs a delta
    // batch by ALGEBRAIC merge — full-outer combine for the scalars,
    // register-wise max for the sketch — and the oracle recomputes from
    // scratch, so the hash gate PROVES merge == recompute. The split
    // (even vs odd days) stands in for base snapshot + incoming batch.
    "q_mv_merge" -> { (s, d) =>
      import graft.functions.Sketch
      val ev = Tables.eventsTs(s, d).select(col("event_type").as("grp"),
        col("user_id").cast("long").as("tid"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        expr("unix_micros(ts) div 86400000000").as("__day"))
      val base = ev.filter(col("__day") % 2 === 0)
      val delta = ev.filter(col("__day") % 2 =!= 0)
      def stats(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          max(col("cents")).as("m"))
      val merged = stats(base).toDF("grp", "n1", "s1", "m1")
        .join(stats(delta).toDF("grp", "n2", "s2", "m2"),
          Seq("grp"), "full_outer")
        .select(col("grp"),
          (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
            .as("n_events"),
          // sum merge must stay NULL when BOTH halves are null (an
          // all-null-valued group) — coalescing to 0 would diverge from
          // the oracle's from-scratch recompute, the very invariant
          // this query proves; greatest already skips null operands
          when(col("s1").isNull && col("s2").isNull,
            lit(null).cast("long"))
            .otherwise(coalesce(col("s1"), lit(0L)) +
              coalesce(col("s2"), lit(0L))).as("sum_cents"),
          greatest(col("m1"), col("m2")).as("max_cents"))
      val regs = Sketch.hllMergeRegisters(
        Sketch.hllRegisters(base, "tid", Seq("grp")),
        Sketch.hllRegisters(delta, "tid", Seq("grp")), Seq("grp"))
      merged.join(Sketch.hllEstimate(regs, Seq("grp")), Seq("grp"))
        .select(col("grp"), col("n_events"), col("sum_cents"),
          col("max_cents"), round(col("est"), 6).as("users_est"))
        .orderBy(col("grp"))
    },

    // Recency-weighted (exponentially decayed) per-user engagement:
    // half-life = 1 day over day buckets, horizon 30 days — weight
    // 2^(30 - age) is an exact integer, so the decayed count is an
    // exact long scaled by 2^30 (no exp/pow), partial-aggregable.
    "q_decay_count" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000")
          .as("__day"))
      val horizon = ev.agg(max(col("__day")).as("__maxd"))
      ev.crossJoin(broadcast(horizon))
        .withColumn("__age", col("__maxd") - col("__day"))
        .filter(col("__age") <= 30)
        .withColumn("__w", expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - __age AS INT))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("__w")).as("decayed_q"))
        .withColumn("decayed",
          round(col("decayed_q").cast("double") / (1L << 30).toDouble, 6))
        .orderBy(col("user_id"))
    },

    // Order-free per-source content fingerprint: bit_xor of per-row
    // polynomial hashes — the merkle-style table fingerprint an
    // incremental pipeline compares to detect changed partitions
    // without diffing rows. XOR is commutative: any row order, any
    // partitioning, same fingerprint.
    "q_content_hash" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          graft.plans.TextExpressions.polyHash(
            concat_ws("|", col("doc_id"), col("lang"), col("text")))
            .as("__rh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(__rh)").as("content_hash"))
        .orderBy(col("source"))
    },

    // Data-quality expectations report (the dbt-test / expectations
    // shape): every declared constraint checked in ONE aggregation
    // pass with conditional sums — no per-constraint scan.
    "q_dq_report" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val agg = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("pk_duplicates"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
          .as("pk_nulls"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("nonpositive_price"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("bad_status"),
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L))
          .as("null_orderdate"),
        sum(when(length(col("o_orderpriority")) === 0, 1L).otherwise(0L))
          .as("empty_priority"))
      agg.unpivot(Array.empty[org.apache.spark.sql.Column],
          agg.columns.map(col), "check_name", "n_violations")
        .orderBy(col("check_name"))
    },

    // Zipf exponent of the corpus: OLS slope of log2(freq) on
    // log2(rank) over the frequency-ranked vocabulary — three session
    // primitives composed (FixLog log domain, deterministic ranking,
    // exact closed-form OLS); gated on the exact integer ppm renderings
    // (never the decimal numerators or round()ed doubles — the driver's
    // comparator is only stable on BIGINT/DOUBLE-free-of-ties outputs);
    // slope ~ -1e6 ppm for natural text.
    // Heaps'-law vocabulary-growth exponent — the companion diagnostic
    // to q_zipf_slope: beta near 0.4-0.6 reads as natural text,
    // beta -> 0 flags template floods, beta -> 1 id/hash floods. Exact
    // ppm slope over log2q checkpoints; the global token index is the
    // two-level rank, the cumulative vocabulary rides the 20-point
    // grid only.
    "q_heaps" -> { (s, d) =>
      graft.functions.Stats.heapsFit(Tables.documents(s, d), "doc_id",
        "text")
    },

    "q_zipf_slope" -> { (s, d) =>
      val freqs = Tables.documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("token"))
        .where(col("token").rlike("^[a-z]+$"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      val ranked = graft.functions.GroupRank.withRankAndCount(
        freqs.withColumn("__all", lit(1)), Seq("__all"),
        Seq(col("freq").desc, col("token").asc), "__zr", "__zn")
      graft.functions.Stats.groupOls(
          ranked.select(lit("corpus").as("g"),
            graft.plans.FixLog.log2qCol(col("__zr")).as("x"),
            graft.plans.FixLog.log2qCol(col("freq")).as("y")),
          "g", "x", "y")
        .select(col("g"), col("n"), col("slope_ppm"), col("intercept_ppm"))
    },

    // Yule's characteristic K per source — the length-invariant
    // repeat-rate diversity constant beside q_zipf_slope's rank-law fit
    // and q_heaps' growth exponent: template floods push K up, id
    // floods pull it toward 0. One wordcount shuffle, group-sized out.
    "q_yule_k" -> { (s, d) =>
      graft.functions.Stats.yuleK(Tables.documents(s, d), "source", "text")
        .orderBy(col("source"))
    },

    // Gini coefficient of the source-size mixture — the inequality
    // readout next to q_mix_hhi's concentration: exact rational
    // G_num/G_den from the rank-weighted sum over sizes sorted
    // ascending (mixture-sized arithmetic).
    "q_mix_gini" -> { (s, d) =>
      graft.functions.Stats.gini(
          Tables.documents(s, d)
            .groupBy(col("source")).agg(count(lit(1)).as("sz")),
          "sz", "source")
        .withColumnRenamed("n", "n_sources")
    },

    // Token burstiness: variance-to-mean ratio of per-document counts
    // (zeros included) — the corpus-linguistics dispersion signal that
    // separates topical tokens (bursty: absent mostly, dense where
    // present) from function words (VMR ≈ const). Exact rational
    // VMR = (N·Σc² − S²)/(N·S) with the numerator/denominator hashed;
    // top-20 by the rendered ratio, token tie-break.
    "q_burstiness" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("__nd"))
      val perDoc = docs.select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("token"))
        .where(col("token").rlike("^[a-z]+$"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("__c"))
      perDoc.groupBy(col("token"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__c")).as("__s"),
          sum(col("__c") * col("__c")).as("__s2"))
        .crossJoin(broadcast(n))
        .select(col("token"), col("n_docs"),
          col("__s").as("total"),
          (col("__nd") * col("__s2") - col("__s") * col("__s"))
            .as("vmr_num"),
          (col("__nd") * col("__s")).as("vmr_den"))
        .withColumn("vmr",
          round(col("vmr_num").cast("double") /
            col("vmr_den").cast("double"), 6))
        .orderBy(col("vmr").desc, col("token").asc)
        .limit(20)
    },

    // Per-source geometric mean of document length, log-domain (FixLog):
    // log2(gmean) = mean log2q — exact integer mean hashed; the linear
    // rendering 2^x would need pow (libm), so the log2 value IS the
    // deliverable, the house convention.
    "q_log_gmean" -> { (s, d) =>
      Tables.documents(s, d)
        .where(col("n_chars") >= 1)
        .select(col("source"),
          graft.plans.FixLog.log2qCol(col("n_chars").cast("long"))
            .as("__lq"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__lq")).as("__slq"))
        .withColumn("log2_gmean_q", expr("__slq div n_docs"))
        .withColumn("log2_gmean",
          round(col("log2_gmean_q").cast("double") / 65536.0, 6))
        .select(col("source"), col("n_docs"), col("log2_gmean_q"),
          col("log2_gmean"))
        .orderBy(col("source"))
    },

    // Two-sample Kolmogorov-Smirnov distance between the en and de
    // document-length distributions — exact rational D = d_num/(n_a·n_b),
    // the cumulative scan over the bounded DISTINCT length domain; gated
    // on the exact integer columns (d_ppm, not the rounded double).
    "q_ks_test" -> { (s, d) =>
      graft.functions.Stats.ksTest(Tables.documents(s, d), "n_chars",
          col("lang") === "en", col("lang") === "de")
        .select(col("n_a"), col("n_b"), col("d_num"), col("d_ppm"))
    },

    // Bucketized KS over a CONTINUOUS domain — purchase vs signup value
    // distributions through 64 fixed-width bins: the bounded-domain
    // form whose cumulative scan never rides a distinct-value window
    // (the exact form's continuous-domain gap, closed).
    "q_ks_binned" -> { (s, d) =>
      graft.functions.Stats.ksTestBinned(Tables.events(s, d), "value",
        col("event_type") === "purchase", col("event_type") === "signup",
        nBins = 64)
    },

    // Chi-square independence of token vs language — the frequentist
    // companion of q_feature_mi: quantized exact cell mass over the
    // class × vocabulary grid, one row with dof.
    // Population stability index of the source mixture between the
    // even- and odd-id halves — the drift monitor a deployed pipeline
    // tracks between snapshots; exact ppm shares, base-2 FixLog terms.
    "q_psi" -> { (s, d) =>
      graft.functions.Stats.psi(Tables.documents(s, d), "source",
        col("doc_id") % 2 === 0, col("doc_id") % 2 === 1)
    },

    "q_chi2" -> { (s, d) =>
      graft.functions.Stats.chi2Independence(Tables.documents(s, d),
        "text", "lang")
    },

    // Cramér's V between the corpus's two categorical axes (lang x
    // source) — the [0,1]-normalized association strength q_chi2's raw
    // statistic can't give (chi2 grows with n); category-domain-sized
    // contingency, exact quantized-cell arithmetic end to end.
    "q_cramers_v" -> { (s, d) =>
      graft.functions.Stats.cramersV(Tables.documents(s, d),
        "lang", "source")
    },

    // Mutual information lang<->source in BITS — the information-
    // theoretic member of the association trio (chi2 significance,
    // Cramér's V effect size, MI budget units); FixLog log2 ladder,
    // populated cells only.
    "q_mi_cat" -> { (s, d) =>
      graft.functions.Stats.categoricalMi(Tables.documents(s, d),
        "lang", "source")
    },

    // Per-event-type OLS trend of value (cents) on the hour index —
    // closed-form normal equations, every product exact decimal; gated
    // on the exact integer ppm slope/intercept (the decimal numerators
    // and rounded doubles stay function-level, never hashed).
    "q_group_ols" -> { (s, d) =>
      graft.functions.Stats.groupOls(
          Tables.eventsTs(s, d)
            .select(col("event_type"),
              expr("unix_micros(ts) div 3600000000").as("hr"),
              round(col("value") * 100, 0).cast("long").as("cents")),
          "event_type", "hr", "cents")
        .select(col("event_type"), col("n"), col("slope_ppm"),
          col("intercept_ppm"))
        .orderBy(col("event_type"))
    },

    // Spearman rank correlation between token count and char count
    // over documents — monotone association without Pearson's
    // linearity assumption; the doc_id tie-break makes both engines'
    // ranks identical permutations, so the classic 1 - 6*sum(d^2) /
    // (n(n^2-1)) form is exact rational (two-level ranks, no global
    // window).
    "q_spearman" -> { (s, d) =>
      graft.functions.Stats.spearman(
        Tables.documents(s, d)
          .select(col("doc_id"), Text.tokenCount(col("text")).as("ntok"),
            col("n_chars")),
        "ntok", "n_chars", "doc_id")
    },

    // Lag-1 autoregression of the daily event-count series — the
    // burst/trend persistence readout beside q_burstiness's dispersion:
    // slope of x_{t+1} on x_t over the bounded calendar-day domain,
    // exact OLS rational in ppm.
    "q_autocorr" -> { (s, d) =>
      graft.functions.Stats.lagSlope(
        Tables.eventsTs(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events")),
        "day", "n_events")
    },

    // Benford first-digit audit of order totals (in cents) — the
    // fabricated/truncated-data screen for financial columns: observed
    // vs log10(1+1/d) expected ppm per digit, signed excess; the digit
    // from the portable integer decimal rendering, no log10 anywhere.
    "q_benford" -> { (s, d) =>
      graft.functions.Stats.benford(
        Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long")
            .as("cents")),
        "cents")
        .orderBy(col("digit"))
    },

    // Deterministic Poisson bootstrap (64 replicates) for the mean
    // doc token count — the map-reduce bootstrap: per-row Poisson(1)
    // multiplicities from the engine-shared hash, so the uncertainty
    // interval needs no resample materialization and no RNG; CI =
    // ranks 2/63 of the replicate means.
    "q_bootstrap_ci" -> { (s, d) =>
      graft.functions.Stats.poissonBootstrapCi(
        Tables.documents(s, d)
          .select(col("doc_id"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", "doc_id", reps = 64, loRank = 2, hiRank = 63)
    },

    // Delete-one-SOURCE jackknife of the mean doc token count — the
    // clustered-data uncertainty card beside q_bootstrap_ci's row-level
    // resampling (rows within a source are correlated; deleting whole
    // sources is the honest resampling unit). Exact ppm arithmetic,
    // integer-corrected square root for the SE.
    "q_jackknife" -> { (s, d) =>
      graft.functions.Stats.jackknifeGroups(
        Tables.documents(s, d)
          .select(col("source"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "source", "ntok")
    },

    // Wasserstein-1 (earth mover's) distance between en and fr doc
    // token-count distributions — the transport-cost drift metric that
    // prices broad small shifts KS under-reports; exact integer sums
    // over the bounded distinct-length domain.
    "q_wasserstein" -> { (s, d) =>
      graft.functions.Stats.wasserstein1(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", col("lang") === "en", col("lang") === "fr")
    },

    // Decision stump by exact Gini impurity: the best single token-
    // count threshold separating English docs from the rest — the
    // split-finder inner loop of every distributed tree learner,
    // candidate thresholds riding the bounded distinct-length domain.
    "q_stump" -> { (s, d) =>
      graft.functions.Classifier.giniStump(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", col("lang") === "en")
    },

    // Z-order (Morton) layout audit over lineitem's two join keys —
    // the multi-dimensional clustering a range-partitioned write by
    // z-value gives: every z-bucket (quadtree cell) has a narrow
    // min/max envelope on BOTH dimensions, exactly the parquet stats
    // a scan with a predicate on either key prunes against.
    "q_zorder" -> { (s, d) =>
      graft.functions.Layout.zorderAudit(
          Tables.lineitem(s, d)
            .select((col("l_partkey") % 1024L).as("px"),
              (col("l_suppkey") % 1024L).as("sy")),
          "px", "sy", bits = 10, bucketShift = 14)
        .orderBy(col("bucket"))
    },

    // Small-file compaction plan: pack the corpus's (source, lang)
    // partition byte sizes into 6 equal-share output bins, biggest
    // first — the OPTIMIZE/coalesce planner's arithmetic as a gated
    // table (per-bin file count and byte fill).
    "q_compaction_plan" -> { (s, d) =>
      graft.functions.Layout.compactionPlan(
          Tables.documents(s, d)
            .groupBy(concat(col("source"), lit("/"), col("lang"))
              .as("part"))
            .agg(sum(col("n_chars")).cast("long").as("bytes")),
          "part", "bytes", bins = 6)
        .orderBy(col("bin"))
    },

    // Quantile-based shape card per language: Bowley skewness + Moors
    // kurtosis of the token-count distribution — the heavy-tail-proof
    // alternative to moment skew/kurtosis (whose 3rd/4th-power sums
    // overflow exact arithmetic and follow three giant docs).
    "q_robust_shape" -> { (s, d) =>
      graft.functions.Robust.shapeStats(
          Tables.documents(s, d)
            .select(col("lang"), Text.tokenCount(col("text")).cast("long")
              .as("ntok")),
          "lang", "ntok")
        .orderBy(col("lang"))
    },

    // Brown-Forsythe variance-homogeneity test across the language
    // groups' token counts — the robust Levene variant (median
    // centers) that gates every pooled-variance analysis; F in exact
    // ppm via the chi2 quantized-floor discipline.
    "q_levene" -> { (s, d) =>
      graft.functions.Stats.brownForsythe(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "lang", "ntok")
    },

    // Positional phrase search: exact-sequence match over term-
    // filtered postings — the query bag-of-words BM25 can't answer;
    // the scan prunes to the phrase's three posting lists before any
    // join (the selective-term pushdown that keeps phrase queries
    // cheap at corpus scale).
    "q_phrase_search" -> { (s, d) =>
      graft.functions.TextIndex.phraseSearch(Tables.documents(s, d),
          "doc_id", "text", Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id"))
    },

    // Per-slice (per-language) accuracy of the NB classifier — the
    // fairness/robustness audit the aggregate accuracy hides; same
    // memo-shared scoring chain, exact counts per slice.
    "q_slice_accuracy" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classify(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.sliceAccuracy(pred, "lang",
          col("pred_class") === col("lang"))
        .orderBy(col("lang"))
    },

    // Pairwise Pearson correlation matrix over lineitem's four
    // quantized measures in ONE aggregation pass — sign + sqrt-free
    // r² per pair (staged floors keep corpus-scale cent sums inside
    // decimal(38)); the redundancy card a feature audit opens with.
    "q_corr_matrix" -> { (s, d) =>
      graft.functions.Stats.corrMatrix(
          Tables.lineitem(s, d).select(
            round(col("l_quantity"), 0).cast("long").as("qty"),
            round(col("l_extendedprice") * 100, 0).cast("long")
              .as("price_c"),
            round(col("l_discount") * 100, 0).cast("long").as("disc_pct"),
            round(col("l_tax") * 100, 0).cast("long").as("tax_pct")),
          Seq("qty", "price_c", "disc_pct", "tax_pct"))
        .orderBy(col("x_col"), col("y_col"))
    },

    // Perceptual difference-hash (dHash) of every synthesized image's
    // 4x4 thumbnail — gradient-sign bits that survive re-encoding
    // where byte hashes break; horizontal + vertical 12-bit pair per
    // image, replayed arithmetically by the oracle through the
    // text-as-PNG contract.
    "q_image_dhash" -> { (s, d) =>
      val thumbs = graft.multimodal.Media.thumbnailsOfText(
        Tables.documents(s, d), "doc_id", "text", 16, 16, 4)
      val px = transform(col("thumb"), p =>
        round(p.cast("double") * 255.0, 0).cast("long"))
      thumbs.select(col("media_id"),
          graft.multimodal.Media.dHashH(px, 4).as("dhash_h"),
          graft.multimodal.Media.dHashV(px, 4).as("dhash_v"))
        .orderBy(col("media_id"))
    },

    // Entropy rate of the per-user event stream — the predictability
    // ceiling of the behavior q_markov tabulates: bits the next event
    // carries given the current one; FixLog ladder, |types|²-bounded
    // term table.
    "q_entropy_rate" -> { (s, d) =>
      graft.functions.Events.entropyRate(Tables.eventsTs(s, d),
        "user_id", "event_type", "ts", "event_id")
    },

    // Wald-Wolfowitz runs test on the above/below-mean daily event
    // pattern — IS the series random, where q_autocorr reads
    // persistence and q_cusum drift: too few runs = clustering, too
    // many = oscillation; exact sqrt-free z².
    "q_runs_test" -> { (s, d) =>
      val daily = Tables.eventsTs(s, d)
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val mean = daily.agg(
        expr("sum(n_events) div count(*)").as("__k"))
      graft.functions.Stats.runsTest(
        daily.crossJoin(broadcast(mean))
          .select(col("day"), (col("n_events") > col("__k")).as("__f")),
        "day", col("__f"))
    },

    // McNemar's paired test: does halving the NB training data
    // SIGNIFICANTLY hurt? Discordant-pair χ² between the full-trained
    // and half-trained classifiers on the same documents — the
    // ablation-significance card an unpaired accuracy diff overstates.
    "q_mcnemar" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val a = graft.functions.NaiveBayes.classify(docs, docs,
          "doc_id", "text", "lang")
        .select(col("doc_id"), col("pred_class").as("__pa"))
      val b = graft.functions.NaiveBayes.classify(
          docs.filter(col("doc_id") % 2 === 0), docs,
          "doc_id", "text", "lang")
        .select(col("doc_id"), col("pred_class").as("__pb"))
      graft.functions.Eval.mcnemar(
        docs.select(col("doc_id"), col("lang"))
          .join(a, Seq("doc_id"), "left")
          .join(b, Seq("doc_id"), "left"),
        col("__pa") === col("lang"), col("__pb") === col("lang"))
    },

    // Good-Turing missing mass: the probability the next token is an
    // unseen type — what chao1 counts, p0 weighs; the mass every
    // unsmoothed LM misassigns.
    "q_good_turing" -> { (s, d) =>
      graft.functions.Stats.goodTuringMass(Tables.documents(s, d), "text")
    },

    // Turing-smoothed adjusted counts r* over the TRIGRAM count-of-
    // counts (unigram counts are all huge in this corpus — trigrams
    // have the low-frequency spectrum the correction exists for):
    // the Katz-backoff adjustment and the empirical reading behind
    // Kneser-Ney's fixed discount.
    "q_sgt_counts" -> { (s, d) =>
      graft.functions.Stats.turingCounts(Tables.documents(s, d), "text",
          maxR = 10, gram = 3)
        .orderBy(col("r"))
    },

    // Day-of-week seasonality chi-square over the full 7-day grid —
    // is event volume actually uniform across the week; dof = 6,
    // 5% critical value 12.59e6.
    "q_seasonality" -> { (s, d) =>
      graft.functions.Stats.dowSeasonality(Tables.eventsTs(s, d), "ts")
    },

    // Chao1 unseen-vocabulary estimate from singleton/doubleton type
    // counts — "how big is the vocabulary REALLY": far above d_obs
    // means keep scaling data; the one-snapshot answer to what
    // q_heaps reads longitudinally.
    "q_chao1" -> { (s, d) =>
      graft.functions.Stats.chao1Richness(Tables.documents(s, d), "text")
    },

    // Kish effective sample size of the DSIR importance weights — the
    // diagnostic every importance-sampled curation must report: ESS
    // far below n says a few documents own the weighted mass.
    "q_ess" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Importance.effectiveSampleSize(
        graft.functions.Importance.importanceScores(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
          "doc_id", "text", nBuckets = 512),
        "score_q")
    },

    // Hill tail-index of the doc-length distribution over the top-100
    // order statistics — HOW heavy the tail is (the Pareto alpha),
    // the quantitative case for caps/winsorization; FixLog ladder,
    // two-level rank selection, exact ppm alpha.
    "q_hill_tail" -> { (s, d) =>
      graft.functions.Stats.hillTail(
        Tables.documents(s, d)
          .select(Text.tokenCount(col("text")).cast("long").as("ntok")),
        "ntok", k = 100)
    },

    // Neyman (optimal) allocation of a 100-doc sample budget across
    // sources — n_h ∝ N_h·S_h, so big AND volatile strata get the
    // samples where proportional allocation spends on size alone;
    // exact largest-remainder rounding lands the budget exactly.
    "q_neyman_alloc" -> { (s, d) =>
      graft.functions.Sampling.neymanAllocation(
          Tables.documents(s, d)
            .select(col("source"), Text.tokenCount(col("text"))
              .cast("long").as("ntok")),
          "source", "ntok", budget = 100L)
        .orderBy(col("source"))
    },

    // Horvitz-Thompson total-token estimate from the 10% deterministic
    // hash sample — the audit card that makes hash sampling
    // quantitatively honest: exact inclusion probability by
    // construction, unbiased debias, gated sampling error.
    "q_ht_estimate" -> { (s, d) =>
      graft.functions.Sampling.htEstimate(
        Tables.documents(s, d)
          .select(col("doc_id"), Text.tokenCount(col("text"))
            .cast("long").as("ntok")),
        "doc_id", "ntok", bps = 1000)
    },

    // Fano factor of each event type's daily arrival counts —
    // Poisson-like (≈1) vs bursty (>1) dispersion, the formal reading
    // beside q_burstiness; one exact rational per type.
    "q_overdispersion" -> { (s, d) =>
      graft.functions.Stats.fanoFactor(
          Tables.eventsTs(s, d)
            .groupBy(col("event_type"),
              date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
            .agg(count(lit(1)).as("x")),
          "event_type", "x")
        .orderBy(col("event_type"))
    },

    // Per-document character entropy (bits/char) — the deterministic
    // compressibility proxy of the quality suite: template floods
    // score near zero, natural text ~4 bits; FixLog ladder, exact
    // integer h2_q gated per doc.
    "q_char_entropy" -> { (s, d) =>
      graft.functions.Quality.charEntropy(Tables.documents(s, d),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // At-most-one-change estimation over the daily event-count series
    // — WHERE the level shifted (argmax of the scale-free between-
    // segment statistic), beside q_cusum's THAT-it-drifted chart;
    // day-domain-bounded scan, earliest-split tie-break.
    "q_changepoint" -> { (s, d) =>
      graft.functions.Stats.changePoint(
        Tables.eventsTs(s, d)
          .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd")
            .as("day"))
          .agg(count(lit(1)).as("n_events")),
        "day", "n_events")
    },

    // Top event-type trigrams by distinct-user support — the
    // PrefixSpan-core sequential patterns beside q_markov's one-step
    // matrix; user-partitioned windows, pattern-domain top-k.
    "q_seq_patterns" -> { (s, d) =>
      graft.functions.Events.seqPatterns(Tables.eventsTs(s, d),
        "user_id", "event_type", "ts", "event_id", k = 3, topK = 10)
    },

    // Theil-Sen robust trend of the daily event-count series — the
    // median of pairwise slopes (29% breakdown) beside q_group_ols'
    // least squares; quadratic only in the bounded day domain.
    "q_theil_sen" -> { (s, d) =>
      graft.functions.Stats.theilSen(
        Tables.eventsTs(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n_events")),
        "day", "n_events")
    },

    // Split conformal prediction sets over the NB posteriors: τ
    // calibrated on even doc_ids at α = 10%, coverage + mean set size
    // audited on the odd half — distribution-free validity made
    // measurable, on the same memo-shared scoring chain.
    "q_conformal" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Eval.conformalSplit(
        graft.functions.NaiveBayes.posteriors(docs, docs, "doc_id",
          "text", "lang"),
        docs, "doc_id", "lang", col("doc_id") % 2 === 0,
        alphaBps = 1000)
    },

    // Area under the precision-recall curve of the NB margin as a
    // correctness scorer — the imbalance-native companion of q_auc
    // (same margin chain): one PR point per distinct margin,
    // quantized-term exact AP.
    "q_pr_auc" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.prAuc(pred, "margin_q",
        col("pred_class") === col("lang"))
    },

    // Randomized-response (Warner) English-share estimation per source
    // — the local-DP mechanism with the deterministic mixer as its
    // replayable coin: reported tallies debiased back to honest
    // estimates, gated next to the true counts they approximate.
    "q_rand_response" -> { (s, d) =>
      graft.functions.Quality.randomizedResponse(
          Tables.documents(s, d), "source", "doc_id",
          col("lang") === "en", denom = 3L)
        .orderBy(col("source"))
    },

    // Welch's t² (unequal-variance mean test, sqrt-free) between en
    // and fr per-doc token counts — "are the groups' means genuinely
    // apart relative to their spreads": one exact rational over
    // integer sums, the inference card beside q_ks_test's
    // distribution-shape distance.
    "q_welch_t2" -> { (s, d) =>
      graft.functions.Stats.welchT2(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", col("lang") === "en", col("lang") === "fr")
    },

    // Mantel-Haenszel pooled odds ratio of the same length gate,
    // STRATIFIED BY SOURCE, reported beside the crude OR — the
    // confounder-adjusted pair: when the exposure mix differs by
    // stratum the crude OR can invert against every stratum (Simpson's
    // paradox); the two columns disagreeing IS the finding.
    "q_mh_odds" -> { (s, d) =>
      graft.functions.Stats.mantelHaenszel(
        Tables.documents(s, d)
          .filter(col("lang").isin("en", "fr"))
          .select(col("source"), col("lang"),
            Text.tokenCount(col("text")).cast("long").as("ntok")),
        "source", col("lang") === "en", col("ntok") >= 128L)
    },

    // Odds ratio of clearing the 128-token length gate, en vs fr, with
    // the Haldane-corrected log-domain Wald 95% CI — the ablation/
    // cohort card: the CI excluding zero (in log2) is the significance
    // read without any p-value machinery. Exact integers end to end.
    "q_odds_ratio" -> { (s, d) =>
      graft.functions.Stats.oddsRatio(
        Tables.documents(s, d)
          .filter(col("lang").isin("en", "fr"))
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        col("lang") === "en", col("ntok") >= 128L)
    },

    // Energy distance between the same two groups — the distribution
    // metric sensitive to ALL moments where KS saturates on the CDF
    // gap: pairwise |difference| sums collapsed to bounded-domain
    // cumulative scans (the wasserstein shape), exact milli.
    "q_energy_dist" -> { (s, d) =>
      graft.functions.Stats.energyDistance(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", col("lang") === "en", col("lang") === "fr")
    },

    // Cronbach's alpha over the readability item battery (tokens,
    // alnum chars, syllables, sentences) — the measurement-theory
    // card: alpha near 1 says the sub-scores measure one construct and
    // a composite gate is safe; low alpha says a composite threshold
    // mixes incompatible signals. One exact decimal rational.
    "q_cronbach" -> { (s, d) =>
      val items = Tables.documents(s, d).select(
        Text.tokenCount(col("text")).cast("long").as("i_tokens"),
        length(regexp_replace(col("text"), "[^A-Za-z0-9]", ""))
          .cast("long").as("i_alnum"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"),
          lit(0))).cast("long").as("i_syll"),
        greatest(lit(1L), size(regexp_extract_all(col("text"),
          lit("[.!?]+"), lit(0))).cast("long")).as("i_sent"))
      graft.functions.Stats.cronbachAlpha(items,
        Seq("i_tokens", "i_alnum", "i_syll", "i_sent"))
    },

    // Cohen's d effect size between the same two groups — the MAGNITUDE
    // companion of q_welch_t2's significance (a huge corpus makes any
    // difference "significant"; d says whether it matters). Pooled
    // sigma through the exact integer square root, d in milli.
    "q_cohens_d" -> { (s, d) =>
      graft.functions.Stats.cohensD(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", col("lang") === "en", col("lang") === "fr")
    },

    // Mann-Whitney U rank test between the same two groups — the
    // nonparametric companion of q_welch_t2: rank-based, so the
    // location reading is immune to the token-count tail that drives
    // the means; tie-corrected z² in exact ppm, sqrt-free.
    "q_mann_whitney" -> { (s, d) =>
      graft.functions.Stats.mannWhitneyU(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", col("lang") === "en", col("lang") === "fr")
    },

    // Kruskal–Wallis H across ALL languages (the k-sample rank test
    // q_mann_whitney generalizes to): do token-count distributions
    // differ anywhere in the mixture — one ppm-staged exact statistic
    // with tie correction, same bounded-value-domain rank machinery.
    "q_kruskal" -> { (s, d) =>
      graft.functions.Stats.kruskalWallis(
        Tables.documents(s, d)
          .select(col("lang"), Text.tokenCount(col("text")).cast("long")
            .as("ntok")),
        "ntok", "lang")
    },

    // CUSUM surge detection over the daily event-count series — the
    // sequential change chart beside q_autocorr's persistence readout:
    // closed-form two-window plan over the bounded day domain (never a
    // row recurrence), reference = floored daily mean, alarm at 2x.
    "q_cusum" -> { (s, d) =>
      graft.functions.Stats.cusum(
        Tables.eventsTs(s, d)
          .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd")
            .as("day"))
          .agg(count(lit(1)).as("n_events")),
        "day", "n_events", hMult = 2L)
        .orderBy(col("day"))
    },

    // Kendall tau-a between the two natural source rankings (by doc
    // count vs by token volume) — "do the mixture metrics order the
    // sources the same way": exact concordant/discordant counts over
    // the bounded source domain, tau in exact ppm.
    "q_kendall" -> { (s, d) =>
      graft.functions.Stats.kendallTau(
        Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(Text.tokenCount(col("text")).cast("long")).as("n_tokens")),
        "source", "n_docs", "n_tokens")
    },

    // Feature selection for the classifier family: top-20 tokens by
    // exact-integer mutual information with the language class —
    // which tokens carry class signal at all (the NB companion score).
    "q_feature_mi" -> { (s, d) =>
      graft.functions.NaiveBayes.tokenClassMi(Tables.documents(s, d),
          "text", "lang", k = 20)
    },

    // Naive-Bayes language ID: every document classified to its argmax
    // class under the self-trained multinomial model — training is two
    // counts, scoring one equi-join + per-doc sum, the argmax a
    // class-count-bounded window. The statistical sibling of the
    // marker-list q_lang_id.
    "q_nb_lang" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.NaiveBayes.classify(docs, docs, "doc_id", "text",
          "lang")
        .orderBy(col("doc_id"))
    },

    // NB classification with the CONFIDENCE MARGIN (argmax minus
    // runner-up) — the selective-classification signal: route
    // low-margin documents to a stronger model / human review.
    "q_nb_margin" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.NaiveBayes.classifyWithMargin(docs, docs, "doc_id",
          "text", "lang")
        .orderBy(col("doc_id"))
    },

    // Per-class precision/recall/F1 of the self-trained language
    // classifier against the true labels — confusion matrix counts and
    // exact-integer ppm metrics (the eval table every gate's classifier
    // ships with).
    "q_class_metrics" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Eval.classMetrics(
          graft.functions.Eval.confusion(
            graft.functions.NaiveBayes.classify(docs, docs, "doc_id",
              "text", "lang"),
            "doc_id", "pred_class", docs, "lang"))
        .orderBy(col("class"))
    },

    // One-row averaged metrics (the model-card summary): accuracy and
    // sklearn's macro / support-weighted means over the per-class ppm
    // table — same NB confusion chain as q_class_metrics (memo-shared).
    "q_macro_metrics" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Eval.macroMetrics(
        graft.functions.Eval.confusion(
          graft.functions.NaiveBayes.classify(docs, docs, "doc_id",
            "text", "lang"),
          "doc_id", "pred_class", docs, "lang"))
    },

    // Cohen's kappa of the NB classifier vs gold labels — the
    // chance-corrected agreement card beside accuracy (which the
    // class-imbalanced corpus inflates); same memo-shared NB confusion
    // chain, one exact rational: (N*agree - pe_num)/(N^2 - pe_num).
    "q_kappa" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Eval.cohenKappa(
        graft.functions.Eval.confusion(
          graft.functions.NaiveBayes.classify(docs, docs, "doc_id",
            "text", "lang"),
          "doc_id", "pred_class", docs, "lang"))
    },

    // Matthews correlation of the NB classifier's en-vs-rest
    // binarization — the imbalance-honest single number beside kappa
    // and F1 (all four confusion cells must be good for MCC to be
    // high); same memo-shared NB confusion chain, sqrt-free exact
    // rendering (sign in mcc_num, magnitude as MCC² ppm).
    "q_mcc" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Eval.mcc(
        graft.functions.Eval.confusion(
          graft.functions.NaiveBayes.classify(docs, docs, "doc_id",
            "text", "lang"),
          "doc_id", "pred_class", docs, "lang"), "en")
    },

    // Reliability (calibration) table: accuracy per 1-bit margin
    // bucket — rising accuracy with the bucket index is what a
    // calibrated confidence looks like; the gate hashes the exact
    // bucket counts.
    "q_reliability" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.reliability(pred, "margin_q",
          col("pred_class") === col("lang"), binWidth = 65536L)
        .orderBy(col("bin"))
    },

    // Selective-prediction risk/coverage curve over the same margin
    // bins — accept only predictions above each bin threshold and read
    // (coverage, selective risk) top-down: the operating-point card
    // for deploying the classifier at a target error rate.
    "q_selective_risk" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.selectiveRisk(pred, "margin_q",
          col("pred_class") === col("lang"), binWidth = 65536L)
        .orderBy(col("bin"))
    },

    // Average precision of the margin ranking (the PR-curve summary
    // next to q_auc's ROC): per-positive precision@rank quantized once
    // to exact ppm, two-level rank + prefix sum — deterministic under
    // the id tie-break, no global sort.
    "q_avg_precision" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.averagePrecision(pred, "margin_q", "doc_id",
        col("pred_class") === col("lang"))
    },

    // Exact ROC-AUC of the margin as a correctness ranker — Mann-
    // Whitney 2U over per-score counts and a two-level prefix sum: no
    // pairwise join, no global sort; the single-row rational rendered
    // in exact ppm.
    "q_auc" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.aucExact(pred, "margin_q",
        col("pred_class") === col("lang"))
    },

    // EXACT isotonic calibration of the reliability table: weighted PAV
    // by its greatest-convex-minorant characterization — hull
    // membership is an integer chord predicate (a triple join over the
    // model-sized bin table), calibrated accuracy the hull-segment
    // slope in exact ppm, monotone by construction. No sequential
    // pooling loop, no floats — the fit replays relationally in the
    // oracle.
    "q_calibrated" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.isotonicCalibrate(
          graft.functions.Eval.reliability(pred, "margin_q",
            col("pred_class") === col("lang"), binWidth = 65536L))
        .orderBy(col("bin"))
    },

    // Expected calibration error over the calibrated reliability table
    // — the L1 twin of q_brier_decomp's quadratic REL and the single
    // number calibration dashboards report. One exact ppm mean.
    "q_ece" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.ece(
        graft.functions.Eval.isotonicCalibrate(
          graft.functions.Eval.reliability(pred, "margin_q",
            col("pred_class") === col("lang"), binWidth = 65536L)))
    },

    // The STREAMED form of q_ece: the same scored predictions arrive
    // as four disjoint microbatches, each folded into the persisted
    // per-bin reliability histogram (the foreachBatch serving loop,
    // replay-idempotent __batch partitions), and the live card
    // re-renders the isotonic/ECE chain from the bounded histogram —
    // hash-equal to the batch chain because reliability counts are
    // additive over disjoint row sets. The ORACLE IS q_ece's: the gate
    // proves streamed == batch.
    "q_incr_calibration" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .localCheckpoint(true) // sliced four times below
      val hist = java.nio.file.Files
        .createTempDirectory("incrcal").toString
      for (b <- 0L until 4L)
        graft.streaming.IncrementalCalibration.step(
          pred.filter(pmod(col("doc_id"), lit(4L)) === b), hist,
          "margin_q", col("pred_class") === col("lang"),
          binWidth = 65536L, batchId = Some(b))
      graft.streaming.IncrementalCalibration.eceCard(s, hist)
    },

    // Murphy decomposition of the Brier score over the calibrated
    // reliability table — REL (residual miscalibration after PAV) vs
    // RES (discrimination) vs UNC (base rate), the card separating
    // "scores can't rank" from "probabilities are off". One row, exact
    // ppm^2 integers, bin-domain-sized arithmetic end to end.
    "q_brier_decomp" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pred = graft.functions.NaiveBayes.classifyWithMargin(docs, docs,
          "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      graft.functions.Eval.brierDecomposition(
        graft.functions.Eval.isotonicCalibrate(
          graft.functions.Eval.reliability(pred, "margin_q",
            col("pred_class") === col("lang"), binWidth = 65536L)))
    },

    // TRUE per-doc perplexity (bits per scored bigram) under the
    // self-trained KN bigram LM — the log-domain reading of q_lm_fit's
    // mean-probability surrogate, bit-exact cross-engine via FixLog.
    "q_perplexity" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.LangModel.perplexityBits(docs, "doc_id", "text",
          graft.functions.LangModel.knBigramProbs(docs, "text"))
        .orderBy(col("doc_id"))
    },

    // CCNet head/middle/tail bucketing: within-language exact rank of the
    // LM-fit score cut into three tiers — the keep-head-and-middle
    // perplexity filter, completed from q_lm_fit's scores.
    "q_lm_buckets" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.LangModel.lmBuckets(docs, "doc_id", "text", "lang",
          graft.functions.LangModel.knBigramProbs(docs, "text"))
        .orderBy(col("doc_id"))
    },

    // CCNet's ACTUAL composition — one independent KN LM per language,
    // each doc scored under its own language's model (Wenzek et al.
    // 2020), then bucketed within language. The per-language LM table
    // carries `lang`, which lmBuckets detects and threads through the
    // scoring join keys; every count (c_ab, c_a, N1+, N_pairs) is
    // tallied within the language, so each language's slice equals a
    // standalone table trained on its rows alone (GroupRankSpec).
    "q_lm_buckets_perlang" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.LangModel.lmBuckets(docs, "doc_id", "text", "lang",
          graft.functions.LangModel.knBigramProbs(docs, "text",
            minCount = 1L, groupCols = Seq("lang")))
        .orderBy(col("doc_id"))
    },

    // CCNet's ACTUAL threshold mechanics at scale: head/middle/tail
    // cutoffs fitted on a 40% deterministic hash sample per language,
    // every doc assigned scan-stage against the broadcast boundary
    // table — per-doc cost flat in corpus size (no corpus-wide rank).
    // The mixer, boundary order statistics, and strict-less assignment
    // replay exactly in the oracle.
    "q_lm_buckets_sampled" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.LangModel.lmBucketsSampled(docs, "doc_id", "text",
          "lang", graft.functions.LangModel.knBigramProbs(docs, "text"),
          nBuckets = 3, samplePerMille = 400)
        .orderBy(col("doc_id"))
    },

    // Deterministic Lloyd's k-means (k=8, 2 iterations): smallest-id
    // init, rounded-distance assignment with cell tie-break, decimal-
    // exact centroid updates — iterative clustering under the oracle gate.
    "q_kmeans" -> { (s, d) =>
      Vec.kmeans(Tables.embeddings(s, d), k = 8, iters = 2)
        .withColumn("cell", col("cell").cast("long"))
        .orderBy(col("vec_id"))
    },

    // Simplified (centroid-based) silhouette over the same k-means
    // model — per-point cluster-quality: (b2-a2)/max(a2,b2) from the
    // assignment's own rounded distances; negative = closer to a
    // foreign centroid. Linear (point x k centroids), never pairwise.
    "q_silhouette" -> { (s, d) =>
      Vec.silhouette(Tables.embeddings(s, d), k = 8, iters = 2)
        .orderBy(col("vec_id"))
    },

    // Cluster purity of the k-means cells against the reference label
    // column — the external clustering grade beside q_silhouette's
    // internal one: per-cell majority-label share in exact ppm.
    "q_cluster_purity" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.functions.Eval.clusterPurity(
          Vec.kmeans(emb, k = 8, iters = 2), emb,
          "vec_id", "cell", "label")
        .orderBy(col("cell"))
    },

    // Linear-kernel MMD between label groups' embedding distributions
    // — first-moment drift in embedding space (the retraining trigger
    // beside the token layer's PSI): ||mean_a - mean_b||^2 from the
    // order-free decimal centroids, bounded group-pair cross only.
    "q_mmd" -> { (s, d) =>
      Vec.mmdLinear(Tables.embeddings(s, d), "label")
        .withColumn("g_a", col("g_a").cast("long"))
        .withColumn("g_b", col("g_b").cast("long"))
        .orderBy(col("g_a"), col("g_b"))
    },

    // Greedy k-center selection (farthest-point-first): the coverage-
    // maximizing coreset selector — deterministic seed, incremental
    // min-distance state, one bounded argmax per round.
    "q_kcenter" -> { (s, d) =>
      Vec.kCenters(Tables.embeddings(s, d), k = 6)
        .orderBy(col("sel_round"))
    },

    // Diversity sampling: k-means cells as strata, deterministic per-cell
    // quotas — the embedding-space-coverage sampler (rare clusters keep
    // representation a uniform sample would starve).
    "q_diverse_sample" -> { (s, d) =>
      val cells = Vec.kmeans(Tables.embeddings(s, d), k = 8, iters = 2)
        .select(col("vec_id"), col("cell"))
      graft.functions.Sampling.stratifiedSample(cells, Seq("cell"), "vec_id", 12)
        .withColumn("cell", col("cell").cast("long"))
        .orderBy(col("vec_id"))
    },

    // c-TF-IDF cluster labeling (BERTopic's naming step): each k-means
    // cell becomes one pseudo-document; its top-5 terms by ctf·T/ttf
    // (cluster-frequent, corpus-rare) are the cell's human-readable
    // label. Rides the memoized k-means chain shared with
    // q_diverse_sample/q_semdedup.
    "q_cluster_keywords" -> { (s, d) =>
      val cells = Vec.kmeans(Tables.embeddings(s, d), k = 8, iters = 2)
        .select(col("vec_id").as("doc_id"), col("cell"))
      val docs = Tables.documents(s, d).join(cells, Seq("doc_id"))
      graft.functions.Tfidf.clusterTerms(docs, "cell", "text", k = 5)
        .withColumn("cell", col("cell").cast("long"))
        .orderBy(col("cell"), col("term_rank"))
    },

    // Per-label embedding centroids (decimal-exact order-free sums) with
    // group sizes — pooling for prototypes / coarse quantizers. The
    // centroid is emitted EXPLODED to (dim, cval) scalar rows: the
    // harness comparator sorts result columns with pandas, which cannot
    // hash an array-typed cell, so an array column would abort the gate
    // even with identical values. The array form stays spec-covered
    // (DedupVecSpec); cval widens the stored float back to double the
    // same way both engines quantized it.
    "q_embed_centroid" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.groupCentroids(emb, "label", "embedding")
        .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "cval")))
        .join(emb.groupBy(col("label")).agg(count(lit(1)).as("n_vecs")),
          Seq("label"))
        .select(col("label"), col("dim").cast("long").as("dim"),
          col("cval").cast("double").as("cval"), col("n_vecs"))
        .orderBy(col("label"), col("dim"))
    },

    // Brute-force exact cosine top-5 neighbors for query vectors (the
    // correctness baseline for ANN; the LSH bucket below is the scale path).
    "q_cosine_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Binary-quantized ANN: sign-bit vectors packed to 32-dim long words
    // (32x at rest), Hamming = xor + popcount — pure integer arithmetic,
    // the coarsest rung of the compression ladder (float32 -> int8 -> PQ
    // -> 1-bit). Top-5 per query by (hamming, id); exact rerank on the
    // shortlist is the established IVF/ADC pattern.
    "q_bit_hamming" -> { (s, d) =>
      val packed = Tables.embeddings(s, d)
        .select(col("vec_id"),
          graft.functions.Quant.binarize(col("embedding")).as("bits"))
      val q = packed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("bits").as("qbits"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming").asc, col("neighbor_id").asc)
      q.crossJoin(packed).filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          graft.functions.Quant.hammingDist(col("qbits"), col("bits"))
            .as("hamming"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // Embedding-cosine near-dup pairs — the exact QUADRATIC baseline,
    // deliberately BOUNDED to the first 500 vectors so the benched entry
    // is a fixed-size correctness probe (≤500² pairs at any SF), never a
    // plan that grows quadratically with the corpus. q_embed_neardup_lsh
    // below is the unbounded scale path; ScaleSpec holds the exact-vs-LSH
    // subset property between them.
    "q_embed_neardup" -> { (s, d) =>
      Vec.cosineNearDupPairs(
          Tables.embeddings(s, d).filter(col("vec_id") < 500), threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Random-hyperplane LSH bucket per vector (8-bit) — map-only ANN
    // bucketing.
    "q_rp_lsh_bucket" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), Vec.rpLshBucket(col("embedding"), 8).as("bucket"))
        .orderBy(col("vec_id"))
    },

    // NN-descent approximate kNN GRAPH (the structure under graph ANN
    // and mutual-kNN dedup): LSH + hash-ring seeded, three neighbor-
    // of-neighbor refinement rounds at k=16 — 0.96 recall@4 vs the
    // exact graph (DedupVecSpec) at O(n·k²) candidates per round
    // where brute force is O(n²).
    "q_nndescent" -> { (s, d) =>
      Vec.nnDescent(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 16, nBits = 4, rounds = 3, ringWindow = 8)
        .orderBy(col("node_id"), col("rank"))
    },

    // Greedy beam search over the NN-descent graph — the serving half
    // of graph ANN (the HNSW query loop at fixed hop count):
    // deterministic entry node, 5 hops at beam 16 over the memo-shared
    // k=16 graph, 0.95 recall@4 at O(hops·beam·degree) per query —
    // corpus-size-independent serving cost.
    "q_graph_search" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val g = Vec.nnDescent(emb, "vec_id", "embedding", k = 16,
        nBits = 4, rounds = 3, ringWindow = 8)
      Vec.graphBeamSearch(g, emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 4, beam = 16, hops = 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // Recall@4 of the graph serving path against the exact cosine
    // top-4 — the per-query quality card every ANN deployment ships
    // (the q_ann_recall/q_ivfpq_recall pattern for the graph rung).
    "q_graph_recall" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val g = Vec.nnDescent(emb, "vec_id", "embedding", k = 16,
        nBits = 4, rounds = 3, ringWindow = 8)
      graft.functions.Eval.topkRecall(
          Vec.graphBeamSearch(g, emb, qs, "vec_id", "embedding",
            k = 4, beam = 16, hops = 5),
          Vec.bruteForceTopK(qs, emb, k = 4),
          "query_id", "neighbor_id")
        .orderBy(col("query_id"))
    },

    // Frontier majority-vote label densification over the memo-shared
    // NN-descent graph: 200 seed labels spread to the corpus in 2
    // monotone rounds (labels freeze once assigned; integer votes, exact
    // ties) — the weak-supervision step that tags the unlabeled bulk.
    "q_label_spread" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.labelSpread(emb, emb.filter(col("vec_id") < 200),
          spreadRounds = 2)
        .orderBy(col("vec_id"))
    },

    // Matryoshka funnel search: 16-dim-prefix shortlist of 20, exact
    // 64-dim rerank to top-5 (Kusupati et al. 2022).
    "q_mrl_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.mrlTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
          dPrefix = 16, shortlist = 20)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Grid-blocked DBSCAN over the 2-D matryoshka prefix plane — the
    // density rung of the clustering family (k-means partitions all
    // points; DBSCAN finds arbitrary-shape dense regions and calls the
    // rest noise). Cell side = eps, so the 3x3-cell join enumerates every
    // eps-pair exactly once and the result is EXACT while the all-pairs
    // join never happens; cores cluster via the checkpointed min-label
    // components, borders take their smallest core neighbor's label.
    "q_dbscan" -> { (s, d) =>
      Vec.dbscanGrid(Tables.embeddings(s, d), eps = 0.02, minPts = 5)
        .orderBy(col("vec_id"))
    },

    // Maximal Marginal Relevance top-k (Carbonell & Goldstein 1998):
    // diversity-aware re-rank of the cosine shortlist — at each of 5
    // greedy steps pick argmax 0.7·rel − 0.3·max-sim-to-selected. The
    // shortlist pass rides the memoized brute-force top-k; the greedy
    // loop sees only |queries|·shortlist rows (corpus-size-independent).
    "q_mmr_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.mmrTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
          shortlist = 20, lambda = 0.7)
        .orderBy(col("query_id"), col("rank"))
    },

    // Facility-location greedy coreset: pick the 5 candidates (of a
    // 32-candidate pool) maximizing corpus COVERAGE Σ_v max_s sim(v,s) —
    // the submodular data-selection objective (1−1/e greedy), integer
    // 1e6-grid arithmetic so ties are exact in both engines.
    "q_coreset_select" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.facilityLocationSelect(emb.filter(col("vec_id") < 32), emb, k = 5)
        .orderBy(col("rank"))
    },

    // Exact KNN-Shapley data valuation (Jia et al. 2019): the Shapley
    // value of every training vector for the 5-NN classifier against a
    // 10-vector probe set — the closed-form suffix sum, integer-staged,
    // never 2^N coalitions. Negative-value vectors are what a curation
    // pass drops first.
    "q_knn_shapley" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.knnShapley(emb.filter(col("vec_id") < 10), emb, k = 5)
        .orderBy(col("vec_id"))
    },

    // kNN label-noise scan (confident-learning style): vectors whose
    // neighborhood majority label disagrees with their own — the label-
    // error detector before a labeled set trains any gate. Integer
    // votes over the memo-shared NN-descent out-lists.
    "q_label_noise" -> { (s, d) =>
      Vec.labelNoiseScan(Tables.embeddings(s, d))
        .orderBy(col("vec_id"))
    },

    // Deterministic DeepWalk-style walk corpus: 4-hop walks from 100
    // start nodes over the memo-shared kNN graph, next hop picked by
    // the catalog mixer mod out-degree — reproducible skip-gram
    // training data without an RNG.
    "q_graph_walks" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.graphWalks(emb, emb.filter(col("vec_id") < 100), steps = 4)
        .orderBy(col("start_id"), col("step"))
    },

    // Local Outlier Factor over the memo-shared NN-descent graph — the
    // density-relative embedding outlier score (Breunig et al. 2000):
    // ~1000 (e3) inside any cluster, >1000 where local density lags the
    // neighbors'. Distances, reach sums, and both divides are exact
    // integers on the 1e6 grid, so the score is engine-independent.
    "q_lof" -> { (s, d) =>
      Vec.lofScores(Tables.embeddings(s, d))
        .orderBy(col("vec_id"))
    },

    // Margin-based bitext mining (Artetxe & Schwenk 2019): even-id
    // vectors play the source language, odd-id the target; each of the
    // 50 probe sources keeps its argmax RATIO-margin candidate —
    // cos(x,y) normalized by the two neighborhoods' average top-8
    // cosine. Both kNN passes ride the memoized brute-force rung (the
    // ANN ladder at scale); margins are one positive integer divide.
    "q_bitext_margin" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val x = emb.filter(col("vec_id") % 2 === 0)
      val y = emb.filter(col("vec_id") % 2 === 1)
      Vec.bitextMarginMine(x.filter(col("vec_id") < 100), y, x,
          k = 8, acceptE6 = 1060000L)
        .orderBy(col("query_id"))
    },

    // Exact-arithmetic PCA: the dominant principal direction of the
    // 16-dim matryoshka prefix by fixed-point power iteration — integer
    // quantization, division-free centering (n·q − S), decimal(38,0)
    // Gram cells, 8 driver rounds over the collected 16×16 matrix
    // (bounded model data), sign-canonicalized. The oracle replays the
    // identical chain in HUGEINT.
    "q_pca_dir" -> { (s, d) =>
      import s.implicits._
      graft.functions.Pca.principalDirection(Tables.embeddings(s, d),
          "vec_id", "embedding", dims = 16, iters = 8)
        .toDF("dim", "v_q")
        .orderBy(col("dim"))
    },

    // Per-vector exact projection along the dominant direction — the
    // 1-D embedding ordering (drift axis, equi-depth binning key).
    "q_pca_project" -> { (s, d) =>
      graft.functions.Pca.project(Tables.embeddings(s, d),
          "vec_id", "embedding", dims = 16, iters = 8)
        .orderBy(col("vec_id"))
    },

    // Embedding-space decontamination: drop corpus vectors within cosine
    // 0.4 of any eval vector (vec_id < 50) — the semantic complement of
    // q_decontaminate for paraphrased eval leakage.
    "q_embed_decontam" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.semanticDecontaminate(emb.filter(col("vec_id") >= 50),
          emb.filter(col("vec_id") < 50), threshold = 0.4)
        .select(col("vec_id")).orderBy(col("vec_id"))
    },

    // The SCALE path for embedding near-dup, oracle-gated: candidates
    // restricted to pairs sharing a 4-bit RP-LSH bucket, then
    // exact-cosine-verified — linear for bounded bucket occupancy, vs the
    // quadratic q_embed_neardup baseline above.
    "q_embed_neardup_lsh" -> { (s, d) =>
      Vec.lshNearDupPairs(Tables.embeddings(s, d), threshold = 0.4, nBits = 4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Multi-probe LSH (Lv et al. 2007): candidates at Hamming <= 1
    // between sign-bucket codes — B explodes its nBits 1-bit flips, the
    // candidate stage stays one equi-join; recall strictly contains the
    // single-bucket path at ~(nBits+1)x candidates instead of 2^nBits
    // extra tables.
    "q_embed_neardup_mp" -> { (s, d) =>
      Vec.lshMultiProbePairs(Tables.embeddings(s, d), threshold = 0.4,
          nBits = 4)
        .orderBy(col("id_a"), col("id_b"))
    },

    // IVF ANN under the oracle gate: `label` is the coarse cell (any
    // clustering/domain partition works); probe the 3 most-similar cells
    // per query by centroid cosine, brute-force only within them.
    "q_ivf_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5, nProbe = 3,
          cellCol = "label")
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    },

    // NDCG@5 of the IVF ranking judged by the exact cosine top-5
    // (graded: exact rank r earns relevance 6-r) — the graded-ranking
    // completion of the metric set, discounts through FixLog's log2q,
    // per-term exact ppm quantization.
    "q_ndcg" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val judged = Vec.bruteForceTopK(qs, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (lit(6L) - col("rank")).as("rel"))
      graft.functions.Eval.ndcg(
          Vec.ivfTopK(emb, qs, k = 5, nProbe = 3, cellCol = "label"),
          judged, "query_id", "neighbor_id", "rank", "rel", k = 5)
        .orderBy(col("query_id"))
    },

    // Expected reciprocal rank @5 of the IVF ranking under the cascade
    // user model — the diminishing-returns serving grade beside NDCG
    // (a satisfying early hit absorbs the later mass): exact dyadic
    // stop-mass products, per-term ppm quantization, one codegen'd
    // fold per query.
    "q_err" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val judged = Vec.bruteForceTopK(qs, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (lit(6L) - col("rank")).as("rel"))
      graft.functions.Eval.errAtK(
          Vec.ivfTopK(emb, qs, k = 5, nProbe = 3, cellCol = "label"),
          judged, "query_id", "neighbor_id", "rank", "rel", k = 5,
          gmax = 5)
        .orderBy(col("query_id"))
    },

    // Recall@5 of the IVF (nProbe=3) index against the exact cosine
    // top-5 — the set-overlap serving-quality number next to q_rbo's
    // rank-aware one: per query |approx ∩ exact| / k in exact ppm.
    "q_ann_recall" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      graft.functions.Eval.topkRecall(
          Vec.ivfTopK(emb, qs, k = 5, nProbe = 3, cellCol = "label"),
          Vec.bruteForceTopK(qs, emb, k = 5),
          "query_id", "neighbor_id")
        .orderBy(col("query_id"))
    },

    // AP@5 per query of the IVF ranking against the exact cosine
    // top-5 — the area-under-PR serving grade beside q_mrr's first-hit
    // and q_ann_recall's set view; exact lcm-scaled precision terms.
    "q_map" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      graft.functions.Eval.mapAtK(
          Vec.ivfTopK(emb, qs, k = 5, nProbe = 3, cellCol = "label"),
          Vec.bruteForceTopK(qs, emb, k = 5),
          "query_id", "neighbor_id", "rank", k = 5)
        .orderBy(col("query_id"))
    },

    // MRR@5 of the IVF ranking against the exact cosine top-5 — the
    // first-relevant-hit serving metric beside recall/NDCG/RBO; exact
    // lcm(1..5)-scaled reciprocal ranks, total misses emit rr 0.
    "q_mrr" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      graft.functions.Eval.mrrAtK(
          Vec.ivfTopK(emb, qs, k = 5, nProbe = 3, cellCol = "label"),
          Vec.bruteForceTopK(qs, emb, k = 5),
          "query_id", "neighbor_id", "rank", k = 5)
        .orderBy(col("query_id"))
    },

    // Rank-biased overlap between the exact cosine top-10 and the IVF
    // (nProbe=3) top-10 — the rank-aware serving-quality metric for the
    // ANN layer, exact dyadic-rational arithmetic at p = 1/2.
    "q_rbo" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      graft.functions.Rank.rbo(
          Vec.bruteForceTopK(qs, emb, k = 10),
          Vec.ivfTopK(emb, qs, k = 10, nProbe = 3, cellCol = "label"),
          depth = 10)
        .orderBy(col("query_id"))
    },

    // IVF with a LEARNED coarse quantizer: k-means(k=8, 2 iters) cells
    // replace the domain partition — train, assign, probe the 3 best
    // cells, brute-force inside them. The full real-world IVF build
    // under the oracle gate (the unrolled k-means CTE feeds the same
    // centroid/probe SQL as q_ivf_topk).
    "q_ivf_kmeans" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.ivfKmeansTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
          nProbe = 3, kCells = 8, iters = 2)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    },

    // SemDedup: semantic (embedding-cluster) dedup — cosine near-dup
    // pairs WITHIN k-means cells only, clustered into dup groups with
    // min-id representatives. The scale-safe alternative to pairwise
    // embedding dedup: compute is sum-of-cell-squares, never corpus².
    // kCells is DERIVED from the corpus (Vec.deriveKCells: cells stay
    // ~64 vectors at any scale); at the sf0.01 oracle scale the
    // derivation yields ceil(500/64) = 8 — the value the oracle SQL's
    // unrolled k-means uses.
    "q_semdedup" -> { (s, d) =>
      Vec.semDedupAuto(Tables.embeddings(s, d), threshold = 0.3,
          iters = 2, targetCellSize = 64L)
        .orderBy(col("vec_id"))
    },

    // k-NN classification by retrieval: every vector classified by the
    // majority label of its IVF (k-means cells, excludeSelf) top-5
    // neighbors — the label-propagation primitive for weakly-labeled
    // corpora, and the leave-self-out check that labels are recoverable
    // from the embedding geometry at all.
    "q_knn_classify" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.functions.Eval.knnClassify(
          Vec.ivfKmeansTopK(emb, emb, k = 5, nProbe = 3, kCells = 8,
            iters = 2),
          emb, "query_id", "neighbor_id", "vec_id", "label")
        .orderBy(col("query_id"))
    },

    // Threshold-free semantic clustering: connected components over the
    // mutual-kNN graph (reciprocated in-cell top-3 preferences) — hub
    // chaining cut by reciprocity, no cosine threshold to tune. Same
    // derived kCells as q_semdedup (8 at the oracle scale).
    "q_mutual_knn" -> { (s, d) =>
      Vec.mutualKnnClustersAuto(Tables.embeddings(s, d), k = 3,
          iters = 2, targetCellSize = 64L)
        .orderBy(col("vec_id"))
    },

    // Int8 affine embedding quantization: per-vector (lo, scale) codes,
    // exploded to scalar (vec_id, dim, qval, err) rows — the 4× storage
    // compression path for vector indexes, with the per-element
    // reconstruction error surfaced (bounded by scale/2; QuantSpec).
    "q_embed_quant" -> { (s, d) =>
      val qz = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          graft.functions.Quant.quantizeInt8(col("embedding")).as("qs"))
      qz.select(col("vec_id"),
          posexplode(arrays_zip(
            col("qs.q").cast("array<bigint>").as("qv"),
            graft.functions.Quant.reconstructionError(
              col("embedding"), col("qs")).as("ev"))).as(Seq("dim", "z")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          col("z.qv").as("qval"), round(col("z.ev"), 6).as("err"))
        .orderBy(col("vec_id"), col("dim"))
    },

    // Product quantization: 4 subspaces × 16 dims, 8-codeword codebooks
    // trained per subspace with the deterministic k-means — code +
    // squared subspace reconstruction error per (vector, subspace).
    // The codebook-compression path (m·log2 k bits/vector) beside the
    // affine path's fixed 4×.
    "q_pq_codes" -> { (s, d) =>
      graft.functions.Quant.pqCodes(Tables.embeddings(s, d), m = 4,
          subDim = 16, k = 8, iters = 2)
        .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
          col("code").cast("long").as("code"), col("dist2"))
        .orderBy(col("vec_id"), col("subspace"))
    },

    // PQ-ADC search: queries score against PQ RECONSTRUCTIONS (codes →
    // broadcast codebook lookup → concatenated centroids), top-10
    // shortlist, exact-cosine rerank to top-5 — the codebook analog of
    // q_ivf_quant's int8 layout. At scale the corpus at rest is m·log2 k
    // bits/vector; only the shortlist ever touches exact floats.
    "q_pq_adc" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (codes, codebook) = graft.functions.Quant.pqModel(emb, m = 4,
        subDim = 16, k = 8, iters = 2)
      val recon = graft.functions.Quant.pqReconstruct(codes, codebook)
      val shortlist = Vec.bruteForceTopK(emb.filter(col("vec_id") < 10),
          recon, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val qv = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val nv = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      shortlist.join(qv, Seq("query_id")).join(nv, Seq("neighbor_id"))
        .withColumn("sim", Vec.cosine(col("qe"), col("ne")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Quantized-scan IVF with exact rerank — the int8 serving layout:
    // the corpus is scanned as int8 RECONSTRUCTIONS (4× less IO at
    // scale), probing and shortlisting (top-10) run on recon vectors,
    // and only the shortlist is reranked with exact float cosine
    // (top-5). Exactness degrades gracefully: the rerank repairs any
    // quantization-induced ordering drift inside the shortlist.
    "q_ivf_quant" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // recon stored as float32 — the type a serving stack dequantizes
      // int8 into; double→float here and the oracle's CAST(.. AS REAL)
      // are the same IEEE conversion, and it keeps query/corpus/centroid
      // element types matched for the compiled dot product.
      val recon = emb.select(col("vec_id"), col("label"),
        graft.functions.Quant.dequantizeInt8(
            graft.functions.Quant.quantizeInt8(col("embedding")))
          .cast("array<float>").as("embedding"))
      val shortlist = Vec.ivfTopK(recon, emb.filter(col("vec_id") < 10),
          k = 10, nProbe = 3, cellCol = "label")
        .select(col("query_id"), col("neighbor_id"))
      val qv = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val nv = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      shortlist.join(qv, Seq("query_id")).join(nv, Seq("neighbor_id"))
        .withColumn("sim", Vec.cosine(col("qe"), col("ne")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // IVF-PQ — the composed 100 TB ANN serving layout (FAISS IVFPQ,
    // Jégou et al. 2011), in-plan form under the hash gate: coarse
    // probe prunes to 3 cells, ADC scores the PQ reconstructions
    // inside them (4 subspaces × 16 dims, 8 codewords, 2 k-means
    // iters), top-10 ADC shortlist, exact-cosine rerank to top-5. The
    // PERSISTED form (codes partitioned by cell, probes read only
    // probed partitions through the broadcast codebook) is
    // VecIndex.writeIvfPqIndex/ivfPqProbeIndexed, spec-verified in
    // IvfIndexSpec against this chain's ADC ranks.
    "q_ivfpq_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
          nProbe = 3, cellCol = "label", m = 4, subDim = 16, kCodes = 8,
          iters = 2, shortlist = 10)
        .orderBy(col("query_id"), col("rank"))
    },

    // RESIDUAL-encoded IVF-PQ (the FAISS default): codebooks trained
    // on x − centroid(cell) — the codewords spend their resolution on
    // within-cell geometry instead of re-encoding the coarse position;
    // reconstruction adds the centroid back. Same serve tail as
    // q_ivfpq_topk; both float truncation points are engine-identical
    // REAL casts, so the full chain hash-gates.
    "q_ivfpq_res_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Vec.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
          nProbe = 3, cellCol = "label", m = 4, subDim = 16, kCodes = 8,
          iters = 2, shortlist = 10)
        .orderBy(col("query_id"), col("rank"))
    },

    // Recall@5 of the full IVF-PQ ladder against the exact cosine
    // top-5 — the serving-quality grade for the composed index, beside
    // q_ann_recall's IVF-flat number: what the cell pruning AND the
    // code quantization together cost in recall.
    "q_ivfpq_recall" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      graft.functions.Eval.topkRecall(
          Vec.ivfPqTopK(emb, qs, k = 5, nProbe = 3, cellCol = "label",
            m = 4, subDim = 16, kCodes = 8, iters = 2, shortlist = 10),
          Vec.bruteForceTopK(qs, emb, k = 5),
          "query_id", "neighbor_id")
        .orderBy(col("query_id"))
    },

    // Multimodal plumbing: opaque binary payload + typed metadata (byte
    // length here; decode/feature-extraction is exercised in the test
    // suite with a stubbed decoder).
    "q_binary_meta" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .orderBy(col("doc_id"))
    },

    // REAL image decode under the hash gate: each document's first 256
    // bytes become a 16x16 grayscale PNG (ImageCodec.grayToPng), the
    // payload is decoded back with the real javax.imageio codec, and
    // the gated output is the decoded header + EXACT integer luma sum.
    // PNG is lossless, so the decoded statistics equal ascii-code sums
    // of the source text — which is how a DuckDB oracle verifies a
    // decoder it cannot run: any decode defect breaks the hash.
    "q_image_decode" -> { (s, d) =>
      graft.multimodal.Media.imageMeta(
          graft.multimodal.Media.textAsPng(
            Tables.documents(s, d), "doc_id", "text"))
        .orderBy(col("media_id"))
    },

    // Decode + nearest-neighbor 4x4 thumbnail over the same real PNG
    // payloads, exploded to exact integer pixels (thumb value * 255
    // rounds back to the source byte exactly): the media -> vector
    // bridge, oracle-checked via the nearest-neighbor index arithmetic
    // sx = x*4, sy = y*4 over the source bytes.
    "q_image_thumb" -> { (s, d) =>
      graft.multimodal.Media.thumbnailsOfText(
          Tables.documents(s, d), "doc_id", "text", 16, 16, 4)
        .select(col("media_id"),
          posexplode(col("thumb")).as(Seq("px_idx", "__pxf")))
        .select(col("media_id"), col("px_idx").cast("long").as("px_idx"),
          round(col("__pxf").cast("double") * 255.0, 0).cast("long")
            .as("px"))
        .orderBy(col("media_id"), col("px_idx"))
    },

    // REAL audio decode under the hash gate: each document's chars
    // become 16-bit PCM samples ((byte-64)*256), WAV-encoded, decoded
    // back with the real javax.sound.sampled codec; gated on the
    // decoded header + EXACT integer energy and zero-crossing counts,
    // which PCM losslessness makes equal to ascii-code functions the
    // oracle computes directly.
    "q_audio_decode" -> { (s, d) =>
      graft.multimodal.Media.audioMeta(
          graft.multimodal.Media.textAsWav(
            Tables.documents(s, d), "doc_id", "text"))
        .orderBy(col("media_id"))
    },

    // Frame-level exact energy series over the same real WAV payloads
    // (64-sample frames, last partial kept) — the audio feature series,
    // oracle-checked frame by frame.
    "q_audio_frames" -> { (s, d) =>
      graft.multimodal.Media.audioFrameEnergies(
          graft.multimodal.Media.textAsWav(
            Tables.documents(s, d), "doc_id", "text"), frameLen = 64)
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // Winsorization: per-event-type 5%/95% order-statistic clipping of
    // the value (cents) — the robust pre-aggregation treatment for
    // heavy-tailed metrics; thresholds by the exact ceil-rank
    // convention, clip scan-stage.
    "q_winsorize" -> { (s, d) =>
      graft.functions.Robust.winsorize(
          Tables.events(s, d).select(col("event_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents")),
          "event_type", "cents", loBps = 500, hiBps = 9500)
        .select(col("event_id"), col("event_type"), col("cents"),
          col("lo_clip"), col("hi_clip"), col("winsorized"))
        .orderBy(col("event_id"))
    },

    // Sampled-threshold winsorization — the 100 TB path: clip
    // boundaries fitted as order statistics of a 40% deterministic
    // hash sample per event type, every row clipped scan-stage against
    // the broadcast threshold table (no corpus-wide rank). Mixer,
    // ceil-rank boundaries, and the empty-sample exact fallback replay
    // exactly in the oracle.
    "q_winsorize_sampled" -> { (s, d) =>
      graft.functions.Robust.winsorizeSampled(
          Tables.events(s, d).select(col("event_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents")),
          "event_type", "cents", "event_id",
          loBps = 500, hiBps = 9500, samplePerMille = 400)
        .select(col("event_id"), col("event_type"), col("cents"),
          col("lo_clip"), col("hi_clip"), col("winsorized"))
        .orderBy(col("event_id"))
    },

    // Bradley-Terry preference fitting (the RLHF reward-data /
    // leaderboard model): deterministic comparisons synthesized from
    // the corpus (doc i vs i+50, longer text wins, ties to the lower
    // id) chained into 50 ladders, six MM rounds in fixed-point integer
    // arithmetic — strengths recover the within-ladder length order.
    "q_bradley_terry" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val a = docs.select(col("doc_id").as("__ia"), col("n_chars").as("__ca"))
      val b = docs.select(col("doc_id").as("__ib"), col("n_chars").as("__cb"))
      val pairs = a.join(b, col("__ib") === col("__ia") + 50L)
        .select(
          when(col("__ca") >= col("__cb"), col("__ia"))
            .otherwise(col("__ib")).as("winner"),
          when(col("__ca") >= col("__cb"), col("__ib"))
            .otherwise(col("__ia")).as("loser"))
      graft.functions.Preference.bradleyTerry(pairs, "winner", "loser",
          rounds = 6)
        .orderBy(col("item"))
    },

    // DoReMi-style data-mixture reweighting (Xie et al. 2023): domain =
    // source, loss = mean KN perplexity bits; four multiplicative-
    // weights rounds, each upweighting domains with excess loss over
    // the current weighted mixture mean through the fixed-point exp2 —
    // the exponential side of the FixLog discipline, oracle-replayed
    // stage for stage.
    "q_doremi" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pp = graft.functions.LangModel.perplexityBits(docs, "doc_id",
        "text", graft.functions.LangModel.knBigramProbs(docs, "text"))
      val lossBySrc = pp
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(expr("CAST(sum(bits_q) div count(1) AS BIGINT)").as("loss_q"))
      graft.functions.Mixture.doremiWeights(lossBySrc, "source", "loss_q",
          rounds = 4, etaQ = 16384L)
        .orderBy(col("source"))
    },

    // Sequence packing — the corpus-to-training-run hop: documents
    // concatenated in the deterministic hash-shuffled order and cut
    // into 128-token training sequences (concat-and-chunk: zero
    // padding waste, docs span cuts). One exact two-level prefix sum
    // plus scan-stage arithmetic; the mixer, offsets, and overlap rows
    // replay exactly in the oracle.
    "q_seq_pack" -> { (s, d) =>
      graft.functions.Pack.concatChunk(
          Tables.documents(s, d).select(col("doc_id"),
            graft.plans.TextExpressions.tokenCount(col("text")).as("__nt")),
          "doc_id", "__nt", seqLen = 128)
        .orderBy(col("seq_id"), col("seq_off"))
    },

    // Media -> dedup bridge: pHash-style content grouping — every
    // payload decoded with the REAL codec, reduced to its 4x4
    // thumbnail, and grouped EXACTLY on the decoded pixel vector
    // (perceptual-hash dedup at reduced resolution; 20 multi-doc
    // groups in the sf0.01 corpus). The thumbnail pixels are decode +
    // nearest-neighbor output, so the grouping verifies the whole
    // media path end to end.
    "q_image_dup_groups" -> { (s, d) =>
      val thumbs = graft.multimodal.Media.thumbnailsOfText(
        Tables.documents(s, d), "doc_id", "text", 16, 16, 4)
      val keyed = thumbs.select(col("media_id"),
        transform(col("thumb"), p =>
          round(p.cast("double") * 255.0, 0).cast("long")).as("__key"))
      val groups = keyed.groupBy(col("__key"))
        .agg(min(col("media_id")).as("rep_id"),
          count(lit(1)).as("gsize"))
      keyed.join(groups, Seq("__key"))
        .select(col("media_id"), col("rep_id"), col("gsize"))
        .orderBy(col("media_id"))
    },

    // REAL multi-frame (video-tier) decode under the hash gate: each
    // document becomes an ANIMATED GIF (frame f = chars [f*64, f*64+64)
    // as an 8x8 gray image, up to 4 frames), decoded back frame by
    // frame with the real javax.imageio GIF reader; gray-in-GIF is
    // palette-lossless, so per-frame luma equals the ascii window sum
    // the oracle computes directly.
    "q_video_frames" -> { (s, d) =>
      graft.multimodal.Media.videoFrameLuma(
          graft.multimodal.Media.textAsGif(
            Tables.documents(s, d), "doc_id", "text"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // Hopping (sliding) window aggregation — 1-hour windows every 15
    // minutes, each event in 4 overlapping windows — completing the
    // window-shape set next to tumbling (q_event_window) and session
    // (q_session_window). The oracle expands the 4 hops explicitly.
    "q_hopping_window" -> { (s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("n_events"), col("sum_value"))
        .orderBy(col("window_start"))
    },

    // Tumbling-window aggregation over the event stream (batch form; the
    // streaming form with watermark runs in the test suite).
    "q_event_window" -> { (s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("n_events"), col("sum_value"))
        .orderBy(col("window_start"))
    },

    // Recursive CTE (Spark 4's WITH RECURSIVE): depth labeling of the
    // implicit binary-heap hierarchy over doc ids (parent of n > 0 is
    // (n-1) div 2) — tree recursion has unique paths, so UNION ALL (the
    // only recursive combinator Spark supports; UNION dedup is not yet
    // in) stays linear, and the per-depth rollup rides on top.
    "q_recursive" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"))
        .createOrReplaceTempView("__rec_docs")
      s.sql("""
        WITH RECURSIVE tree(doc_id, depth) AS (
          SELECT doc_id, 0 FROM __rec_docs WHERE doc_id = 0
          UNION ALL
          SELECT d.doc_id, t.depth + 1
          FROM __rec_docs d JOIN tree t ON (d.doc_id - 1) DIV 2 = t.doc_id
          WHERE d.doc_id > 0)
        SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
          min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM tree GROUP BY depth ORDER BY depth""")
    },

    // Arbitrary GROUPING SETS with grouping_id — the general form under
    // rollup/cube (q_rollup/q_cube cover the prefix/powerset shapes).
    "q_grouping_sets" -> { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    },

    // UNPIVOT/melt: the four lineitem measures into (metric, value) rows
    // — the wide-to-long reshape dual of q_pivot.
    "q_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .withColumn("l_linenumber", col("l_linenumber").cast("long"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    },

    // GROUP BY + HAVING (post-aggregation filter).
    "q_having" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_spent"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    },

    // Correlated EXISTS — semi join with a compound, row-dependent
    // condition (an order 10x the customer's account balance).
    "q_exists_correlated" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
            o("o_totalprice") > c("c_acctbal") * 100,
          "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // Correlated LATERAL subquery with LIMIT — per-nation top-2
    // customers by balance as a lateral derived table, the SQL-surface
    // form of the window-top-n idiom (Catalyst decorrelates it into a
    // ranked join; DuckDB runs the same ANSI text verbatim).
    "q_lateral_topn" -> { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    },

    // Correlated SCALAR subqueries — parts priced >=1% above their
    // brand's average, with the average expressed as exact decimal
    // sum/count subqueries (price*cnt*100 > sum*101) so both engines
    // compare identical decimals. Catalyst decorrelates both subqueries
    // into one aggregate join — the plan a hand-written join would give.
    "q_scalar_subquery" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("__sq_part")
      s.sql("""
        SELECT p_partkey, p_brand,
          CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM __sq_part p
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) *
            (SELECT count(*) FROM __sq_part p2
             WHERE p2.p_brand = p.p_brand) * 100 >
          (SELECT sum(CAST(p2.p_retailprice AS DECIMAL(18,2)))
           FROM __sq_part p2 WHERE p2.p_brand = p.p_brand) * 101
        ORDER BY p_partkey""")
    },

    // Calendar-interval RANGE window frame — per-customer trailing
    // 30-day spend. Value-based frames have no tie ambiguity, and the
    // decimal sum keeps the money math exact in both engines.
    "q_range_frame" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("__rf_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_orderdate,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_30d
        FROM __rf_orders ORDER BY o_orderkey""")
    },

    // CDC changelog materialization: last-writer-wins per key by the
    // monotone event_id LSN, 'error' events as tombstones — one
    // partial-aggregable max_by pass, the Delta-CDF apply shape without
    // a per-key window sort.
    "q_cdc_apply" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(col("event_type"), col("event_id")).as("__op"),
          max_by(col("value"), col("event_id")).as("last_value"),
          max(col("event_id")).as("last_event_id"),
          count(lit(1)).as("n_changes"))
        .filter(col("__op") =!= "error")
        .select(col("user_id"), col("last_event_id"), col("last_value"),
          col("n_changes"))
        .orderBy(col("user_id"))
    },

    // SCD type-2 dimension history (Kimball): three order-status
    // versions folded through Merge.scd2Apply — changed keys close
    // their interval and open a new one, no-op changes leave no empty
    // intervals, history stays queryable by validity interval. The
    // MERGE family's history-preserving member beside q_status_writeback
    // (type-1 overwrite) and q_cdc_apply (last-write collapse).
    "q_scd2" -> { (s, d) =>
      val orders = Tables.orders(s, d)
      val keys = Seq("o_orderkey")
      val vals = Seq("o_orderstatus")
      val h1 = graft.merge.Merge.scd2Init(
        orders.select(col("o_orderkey"), col("o_orderstatus")), keys, vals, 1L)
      val c2 = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"))
      val h2 = graft.merge.Merge.scd2Apply(h1, c2, keys, vals, 2L)
      val c3 = orders.filter(col("o_orderkey") % 21 === 0)
        .select(col("o_orderkey"), lit("Y").as("o_orderstatus"))
      graft.merge.Merge.scd2Apply(h2, c3, keys, vals, 3L)
        .orderBy(col("o_orderkey"), col("valid_from"))
    },

    // Left-semi join (EXISTS) — customers with at least one big order.
    "q_semi_join" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Union of two tagged projections.
    "q_union_tagged" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val big = o.filter(col("o_totalprice") > 250000)
        .select(col("o_orderkey"), lit("big").as("tag"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("tag"))
      big.unionByName(urgent).orderBy(col("o_orderkey"), col("tag"))
    },

    // EXCEPT (set difference, distinct).
    "q_except" -> { (s, d) =>
      val o = Tables.orders(s, d)
      o.select(col("o_custkey")).except(
          o.filter(col("o_totalprice") > 150000).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    },

    // ROLLUP aggregation (subtotal + grand-total rows).
    "q_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // String scalar functions.
    "q_string_funcs" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_up"),
          lower(col("p_brand")).as("brand_lo"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          substring(col("p_name"), 1, 10).as("name10"),
          length(col("p_name")).cast("long").as("name_len"),
          reverse(col("p_brand")).as("brand_rev"))
        .orderBy(col("p_partkey"))
    },

    // Date-part extraction + date arithmetic.
    "q_date_parts" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
            .as("due_date"))
        .orderBy(col("o_orderkey"))
    },

    // JSON field extraction from the events props payload.
    "q_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },

    // As-of join: each purchase matched to the user's latest signup at or
    // before it (DuckDB has native ASOF JOIN as the oracle).
    "q_asof_join" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("us"))
      graft.ops.AsOf.asofJoin(purchases, signups, "user_id", "us", "us")
        .select(col("event_id"), col("user_id"), col("asof_ts").as("signup_us"))
        .orderBy(col("event_id"))
    },

    // Gap-based sessionization (30-min inactivity) via window functions.
    // Ordered-step funnel: earliest strictly-ordered signup -> click ->
    // purchase per user; one filtered join + partial-min per step.
    "q_funnel" -> { (s, d) =>
      graft.functions.Events.funnel(Tables.eventsTs(s, d), "user_id",
          "event_type", "ts", Seq("signup", "click", "purchase"))
        .orderBy(col("user_id"))
    },

    // Weekly cohort retention: users bucketed by first-event week,
    // counted once per active (cohort, offset) cell.
    "q_retention" -> { (s, d) =>
      graft.functions.Events.retention(Tables.eventsTs(s, d), "user_id",
          "ts", 604800000000L)
        .orderBy(col("cohort"), col("period_offset"))
    },

    // Kaplan-Meier survival over user lifetimes (days first→last
    // event), users active on the final observed day right-censored —
    // the bias correction naive retention curves miss; log-domain
    // product through the FixLog ladders, one row per death time.
    "q_kaplan_meier" -> { (s, d) =>
      graft.functions.Events.kaplanMeier(Tables.eventsTs(s, d),
          "user_id", "ts")
        .orderBy(col("t_days"))
    },

    // A/B proportion test: users hash-split into two variants, did
    // they ever purchase — exact 2x2 chi-square (= z² of the
    // two-proportion test) in one rational, per-variant rates in ppm.
    "q_ab_test" -> { (s, d) =>
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("__bkt",
          graft.functions.Sampling.hashBucket(col("user_id")))
      graft.functions.Stats.abTest(perUser,
        col("__bkt") < 5000L, col("__bkt") >= 5000L,
        col("converted") === 1L)
    },

    // First-order Markov transitions over each user's event-type
    // sequence — the behavioral what-follows-what card with exact
    // row-normalized probabilities; types²-sized output.
    "q_markov" -> { (s, d) =>
      graft.functions.Events.markovTransitions(Tables.eventsTs(s, d),
          "user_id", "event_type", "ts", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    },

    // Daily gap-filled resampling: dense per-user day grid, zero-count
    // gaps, forward-filled value sums.
    "q_resample" -> { (s, d) =>
      graft.functions.Events.resampleFill(Tables.eventsTs(s, d), "user_id",
          "ts", "value", 86400000000L)
        .orderBy(col("user_id"), col("bucket"))
    },

    // SCD Type-2 intervalization of each user's event-type stream:
    // consecutive repeats collapse, each change carries its validity
    // interval, NULL valid_to = current.
    "q_scd2" -> { (s, d) =>
      graft.functions.Events.scd2(Tables.eventsTs(s, d), "user_id",
          "event_type", "ts", "event_id")
        .orderBy(col("user_id"), col("valid_from_us"))
    },

    // Native session_window aggregation — Spark's built-in gap-session
    // operator, cross-checked against the first-principles gaps-and-
    // islands SQL (q_sessionize's manual form). Boundary semantics: a
    // gap of EXACTLY the 30-minute window starts a new session (the
    // event lands at the previous session's exclusive end), so the
    // oracle's split rule is >=, not >.
    "q_session_window" -> { (s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },

    "q_sessionize" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.eventsTs(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800000000L, lit(1L)).otherwise(lit(0L)))
        .withColumn("session_id", sum(col("is_new")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(timestamp_micros(min(col("us"))), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"))
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("session_start"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // CUPED variance-reduced A/B effect — per-user pre-period value
    // (Jan 1-15, cents) as the covariate, post-period value as the
    // metric, arms by the deterministic hash bucket; θ and both deltas
    // exact rationals in ppm (Stats.cuped scaladoc for the θ-ppm
    // composition contract).
    "q_cuped" -> { (s, d) =>
      val cut = lit("2024-01-16").cast("timestamp")
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val perUser = Tables.eventsTs(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < cut, cents).otherwise(0L)).as("x"),
          sum(when(col("ts") >= cut, cents).otherwise(0L)).as("y"))
        .withColumn("__bkt",
          graft.functions.Sampling.hashBucket(col("user_id")))
      graft.functions.Stats.cuped(perUser,
        col("__bkt") < 5000L, col("__bkt") >= 5000L, "x", "y")
    },

    // Difference-in-differences over the same 2x2 (hash-bucket arm x
    // Jan-16 period split) at event grain — the parallel-trends causal
    // card next to q_ab_test (outcome lift) and q_cuped (variance
    // reduction).
    "q_did" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d)
        .withColumn("__bkt",
          graft.functions.Sampling.hashBucket(col("user_id")))
        .withColumn("__cents",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
      graft.functions.Stats.diffInDiff(ev, col("__bkt") < 5000L,
        col("ts") >= lit("2024-01-16").cast("timestamp"), "__cents")
    },

    // Exact 2-D Pareto frontier (skyline) under "shortest at each
    // lexical-richness level": minimize n_chars, maximize distinct
    // token count. Linear two-level prefix-max shape (Sampling
    // .paretoFront); the oracle is the quadratic NOT EXISTS definition.
    "q_pareto_front" -> { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          size(array_distinct(graft.functions.Text.tokens(col("text"))))
            .cast("long").as("n_vocab"))
      graft.functions.Sampling.paretoFront(t, "doc_id", "n_chars",
          "n_vocab")
        .orderBy(col("n_chars"), col("doc_id"))
    },

    // Content-defined chunking dedup: landmark chunks (16-char rolling
    // window, 2^5-char expected length) duplicated across the corpus —
    // span-level duplicate mass that exact/doc and line dedup both
    // miss (Cdc scaladoc). The oracle recomputes every window hash
    // positionally.
    "q_cdc_chunks" -> { (s, d) =>
      graft.functions.Cdc.chunkStats(Tables.documents(s, d), "doc_id",
          "text", w = 16, maskBits = 5, minOcc = 2L)
        .orderBy(col("chash"))
    },

    // chrF (char 3-gram F_2) over the SNM window-5 candidate pairs —
    // the tokenizer-robust generation/MT eval next to q_rouge2's word
    // bigrams; same multiset-overlap machinery at character level.
    "q_chrf" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = Dedup.sortedNeighborhoodPairs(docs, "doc_id",
          lower(substring(col("text"), 1, 30)), window = 5)
        .select(col("id_a"), col("id_b"))
      graft.functions.Eval.chrF(cand, docs, "doc_id", "text", n = 3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // KMV set algebra between sources — sketch-estimated union /
    // intersection / Jaccard of the 3-gram vocabularies from 128-value
    // bottom-k sketches: the composable-sketch rung of the source-
    // overlap ladder (exact q_source_overlap, MinHash
    // q_source_overlap_mh), exact-replayable in both engines.
    "q_source_overlap_kmv" -> { (s, d) =>
      val grams = Tables.documents(s, d)
        .select(col("source"),
          graft.plans.TextExpressions.hashedShingles(col("text"), 3))
      graft.functions.Sketch.kmvPairOps(grams, "tid", k = 128, "source")
        .orderBy(col("grp_a"), col("grp_b"))
    },

    // Chunk-grain decontamination: corpus docs sharing a >= 24-char
    // content-defined chunk with the eval split (doc_id < 50 — wider
    // than q_decontaminate's so the verbatim-span signal is non-vacuous
    // at every tested scale) — the verbatim-span member of the
    // decontamination ladder next to n-gram (q_decontaminate), Bloom,
    // and embedding variants.
    "q_cdc_decontam" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.functions.Cdc.decontaminate(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "doc_id", "text", w = 16, maskBits = 5, minLen = 24L)
        .orderBy(col("doc_id"))
    },

    // One-row chunk-store savings card: unique vs total chunk chars
    // under CDC — what a dedup store saves on this corpus.
    "q_cdc_savings" -> { (s, d) =>
      graft.functions.Cdc.dedupSavings(Tables.documents(s, d), "doc_id",
        "text", w = 16, maskBits = 5)
    },

    // Post-stratified treatment effect: the q_cuped cohort re-analyzed
    // with pre-period activity BANDS as strata (least(x div 5000.00, 4))
    // — treated-weighted within-stratum differences vs the raw gap;
    // their difference is the measured confounding.
    "q_strat_att" -> { (s, d) =>
      val cut = lit("2024-01-16").cast("timestamp")
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val perUser = Tables.eventsTs(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < cut, cents).otherwise(0L)).as("x"),
          sum(when(col("ts") >= cut, cents).otherwise(0L)).as("y"))
        .withColumn("__bkt",
          graft.functions.Sampling.hashBucket(col("user_id")))
        .withColumn("stratum", expr("least(x div 500000, 4)"))
      graft.functions.Stats.stratifiedEffect(perUser,
        col("__bkt") < 5000L, "stratum", "y")
    },

    // Deterministic T5-style span-corruption plan (15% noise, adjacent
    // masks merge) — per-doc mask/span statistics, hash-mixer
    // reproducible (Sampling.spanCorruptionPlan scaladoc).
    "q_span_corrupt" -> { (s, d) =>
      graft.functions.Sampling.spanCorruptionPlan(Tables.documents(s, d),
          "doc_id", "text", noiseBps = 1500L)
        .orderBy(col("doc_id"))
    },

    // Duplicate-aware training weights: every near-dup cluster member
    // weighted 1/csize (SemDeDup/D4 downweighting — each cluster
    // counts once toward the mixture without dropping rows), with the
    // per-doc effective token mass; rides the memoized components.
    "q_dedup_weights" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"),
        SparkEntry.numMinhashes)
      val pairs = Dedup.lshCandidatePairs(
        Dedup.lshBands(sig, "doc_id", 2), "doc_id")
      val comp = Cluster.assignClusters(pairs, "id_a", "id_b",
        docs.select(col("doc_id")), "doc_id")
      val toks = docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.functions.Cluster.dedupWeights(comp, toks, "doc_id")
        .orderBy(col("doc_id"))
    },

    // The one-row corpus readout of q_dedup_weights: duplicate-aware
    // EFFECTIVE token count and the inflation factor raw/effective —
    // "the crawl is X tokens but trains like Y".
    "q_effective_tokens" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.docShingleIds(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignature(sh, "doc_id", col("tid"),
        SparkEntry.numMinhashes)
      val pairs = Dedup.lshCandidatePairs(
        Dedup.lshBands(sig, "doc_id", 2), "doc_id")
      val comp = Cluster.assignClusters(pairs, "id_a", "id_b",
        docs.select(col("doc_id")), "doc_id")
      val toks = docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      val w = graft.functions.Cluster.dedupWeights(comp, toks, "doc_id")
      val agg = w.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("component")).as("n_clusters"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("eff_tokens_ppm")).as("eff_tokens_ppm"))
      agg.select(col("n_docs"), col("n_clusters"), col("total_tokens"),
        col("eff_tokens_ppm"),
        when(col("eff_tokens_ppm") > 0,
          graft.functions.Stats.fixedPointExact(
            lit(1000000L).cast("decimal(38,0)") * col("total_tokens"),
            col("eff_tokens_ppm")))
          .as("inflation_ppm"))
    },

    // Degree assortativity of the SNM candidate graph — do well-
    // connected docs pair with each other (assortative template
    // families) or with singletons; Newman's r as one exact signed
    // rational over edge-degree moments.
    "q_assortativity" -> { (s, d) =>
      val cand = Dedup.sortedNeighborhoodPairs(Tables.documents(s, d),
          "doc_id", lower(substring(col("text"), 1, 30)), window = 5)
        .select(col("id_a"), col("id_b"))
      graft.functions.Graph.degreeAssortativity(cand)
    },

    // Linear CKA between the full 64-dim embedding and its 32-dim
    // matryoshka truncation — the representation-fidelity scalar (does
    // the half-width view preserve the geometry the ANN/cluster layer
    // runs on); exact integer moment matrices, one double ratio.
    "q_cka" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.functions.Vec.linearCka(emb,
        emb.select(col("vec_id"), slice(col("embedding"), 1, 32)
          .as("emb32")),
        "vec_id", "embedding", "emb32")
    },

    // Log-rank survival test between the hash-bucket arms — do they
    // churn at the same hazard (the inference companion of
    // q_kaplan_meier's curve, same lifetime/censoring model).
    "q_logrank" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d)
        .withColumn("arm",
          (graft.functions.Sampling.hashBucket(col("user_id")) < 5000L)
            .cast("long"))
      graft.functions.Events.logRank(ev, "user_id", "arm", "ts")
    },

    // Mann-Kendall trend test on the daily event-count series — the
    // IS-there-a-trend card next to q_theil_sen's slope and
    // q_runs_test's randomness; day-domain-bounded pair statistic.
    "q_mann_kendall" -> { (s, d) =>
      val daily = Tables.eventsTs(s, d)
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"))
      graft.functions.Stats.mannKendall(daily, "day", "n_events")
    },

    // Cliff's delta ordinal effect size on per-user event counts
    // between the hash-bucket arms — HOW MUCH one arm dominates, next
    // to q_mann_whitney's whether; Romano et al. magnitude bands.
    "q_cliffs_delta" -> { (s, d) =>
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .withColumn("__bkt",
          graft.functions.Sampling.hashBucket(col("user_id")))
      graft.functions.Stats.cliffsDelta(perUser, "n_ev",
        col("__bkt") < 5000L, col("__bkt") >= 5000L)
    },

    // Quantile treatment effects: exact per-arm order statistics of
    // per-user post-period spend at 25/50/75 — WHERE in the outcome
    // distribution the q_cuped/q_ab_test effect lives (tail vs median),
    // on groupQuantiles' ceil-rank convention.
    "q_qte" -> { (s, d) =>
      val cut = lit("2024-01-16").cast("timestamp")
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val perUser = Tables.eventsTs(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") >= cut, cents).otherwise(0L)).as("y"))
        .withColumn("arm",
          when(graft.functions.Sampling.hashBucket(col("user_id")) < 5000L,
            "a").otherwise("b"))
      val q = graft.functions.Robust.groupQuantiles(
        perUser.select(col("arm"), col("y")), "arm", "y",
        Seq(2500, 5000, 7500))
      q.filter(col("arm") === "a")
        .select(col("q_bps"), col("value").as("q_a"))
        .join(q.filter(col("arm") === "b")
          .select(col("q_bps"), col("value").as("q_b")), Seq("q_bps"))
        .select(col("q_bps"), col("q_a"), col("q_b"),
          (col("q_a") - col("q_b")).as("qte"))
        .orderBy(col("q_bps"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_filter_status" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_totalprice
         FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey""",
    "q_quarantine_split" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT (l_quantity >= 25) ORDER BY l_orderkey, l_linenumber""",
    "q_distinct_proj" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_orderby" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name""",
    "q_when_floor" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice < 50000 THEN 50000 ELSE o_totalprice END AS o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q_abs_repair" ->
      """SELECT event_id, ABS("value" - 100.0) AS "value"
         FROM events ORDER BY event_id""",
    "q_enrich" ->
      """SELECT doc_id, 'documents.parquet' AS datasource, 'new' AS status,
         DATE '2026-01-01' AS p_ingestdate
         FROM documents ORDER BY doc_id""",
    "q_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
         ORDER BY c_custkey""",
    "q_status_writeback" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 200000 THEN 'flagged' ELSE o_orderstatus END AS o_orderstatus
         FROM orders ORDER BY o_orderkey""",
    "q_count_by_status" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_join_agg" ->
      """SELECT n_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, order_date
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q_regional_revenue" ->
      """SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    // the PLAIN join: salting must be invisible in the result
    "q_salted_join" ->
      """SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_explode_array" ->
      """SELECT vec_id, UNNEST(embedding) AS component FROM embeddings
         ORDER BY vec_id, component""",
    "q_struct_flatten" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey""",
    "q_topk_native" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, "rank" FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS "rank"
           FROM lineitem) t
         WHERE "rank" <= 2 ORDER BY l_suppkey, "rank"""",

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q_cms_sketch" ->
      s"""WITH toks AS (SELECT unnest(${duckToks("text")}) AS tok FROM documents),
          t AS (SELECT ${duckPolyId("tok")} AS tid FROM toks),
          l AS (${duckCmsLookups("t")})
          SELECT CAST(sketch_row AS BIGINT) AS sketch_row,
            CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS cnt
          FROM l GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_ams_f2" -> {
      val seedRows = (0 until 16).map(i =>
        s"(${i}, ${graft.functions.Sketch.AmsA(i)}, " +
          s"${graft.functions.Sketch.AmsB(i)})").mkString(", ")
      s"""WITH ids AS (SELECT ${duckPolyId("tok")} AS x
            FROM (SELECT unnest(${duckToks("text")}) AS tok
                  FROM documents)),
          cnt AS (SELECT x, CAST(count(*) AS BIGINT) AS m
            FROM ids GROUP BY 1),
          ex AS (SELECT CASE
              WHEN sum(CAST(m AS HUGEINT) * m) > 9223372036854775807
              THEN NULL
              ELSE CAST(sum(CAST(m AS HUGEINT) * m) AS BIGINT)
            END AS exact_f2 FROM cnt),
          rws AS (SELECT * FROM (VALUES $seedRows) r(i, a, b)),
          zz AS (SELECT CAST(r.i AS BIGINT) AS sketch_row,
            CAST(sum(c.m * (1 - 2 *
              ((CAST(r.a AS BIGINT) * c.x + r.b) % 1000000007 % 2)))
              AS BIGINT) AS z
            FROM cnt c CROSS JOIN rws r GROUP BY 1)
          SELECT zz.sketch_row, zz.z,
            CASE WHEN abs(zz.z) > 3037000499 THEN NULL
              ELSE CAST(CAST(zz.z AS HUGEINT) * zz.z AS BIGINT)
            END AS est,
            ex.exact_f2,
            ${duckPpm("CAST(zz.z AS HUGEINT) * zz.z - ex.exact_f2",
              "ex.exact_f2")} AS err_ppm
          FROM zz CROSS JOIN ex ORDER BY sketch_row"""
    },

    "q_cms_estimate" ->
      s"""WITH toks AS (SELECT unnest(${duckToks("text")}) AS tok FROM documents),
          t AS (SELECT tok, ${duckPolyId("tok")} AS tid FROM toks),
          cms AS (SELECT sketch_row, bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM (${duckCmsLookups("t")}) GROUP BY 1, 2),
          probes AS (SELECT tok, tid, CAST(count(*) AS BIGINT) AS exact_cnt
            FROM t GROUP BY tok, tid
            ORDER BY exact_cnt DESC, tok ASC LIMIT 20),
          lk AS (${duckCmsLookups("probes", extraCols = "tok, exact_cnt, ")}),
          j AS (SELECT lk.tok, lk.exact_cnt, min(cms.cnt) AS est_cnt
            FROM lk JOIN cms USING (sketch_row, bucket)
            GROUP BY 1, 2)
          SELECT tok, exact_cnt, est_cnt, est_cnt - exact_cnt AS overcount
          FROM j ORDER BY tok""",

    "q_kmv_distinct" ->
      s"""WITH t AS (SELECT DISTINCT l_returnflag AS grp,
            CAST(l_partkey AS BIGINT) AS tid FROM lineitem),
          h AS (SELECT grp, tid, ${duckMixOf("tid")} AS mv FROM t),
          rk AS (SELECT grp, tid, mv, row_number() OVER
            (PARTITION BY grp ORDER BY mv ASC, tid ASC) AS rn FROM h),
          kept AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_kept,
            CAST(max(mv) AS BIGINT) AS kth_mv
            FROM rk WHERE rn <= 128 GROUP BY 1),
          ex AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_exact
            FROM t GROUP BY 1)
          SELECT ex.grp, ex.n_exact, kept.n_kept, kept.kth_mv,
            CASE WHEN kept.n_kept < 128 THEN kept.n_kept
                 WHEN kept.kth_mv = 0 THEN NULL
                 ELSE CAST((CAST(127 AS BIGINT) * 2147483647)
                   // kept.kth_mv AS BIGINT)
            END AS est_distinct
          FROM ex JOIN kept USING (grp)
          ORDER BY grp""",

    "q_hll_card" ->
      s"""WITH t AS (SELECT l_returnflag AS grp, CAST(l_partkey AS BIGINT) AS tid
            FROM lineitem),
          h AS (SELECT grp, tid, ${duckMixOf("tid")} AS y FROM t),
          r AS (SELECT grp, y % 64 AS reg, y // 64 AS rem FROM h),
          rk AS (SELECT grp, reg, ${duckHllRankCase("rem")} AS rank FROM r),
          regs AS (SELECT grp, reg, max(rank) AS m_j FROM rk GROUP BY 1, 2),
          occ AS (SELECT grp,
            SUM(CAST(1 AS BIGINT) << (26 - m_j)) AS s_occ,
            CAST(count(*) AS BIGINT) AS n_reg FROM regs GROUP BY 1),
          s AS (SELECT grp,
            s_occ + (64 - n_reg) * (CAST(1 AS BIGINT) << 26) AS s_scaled
            FROM occ),
          ex AS (SELECT grp, CAST(count(DISTINCT tid) AS BIGINT) AS n_exact
            FROM t GROUP BY 1)
          SELECT ex.grp, n_exact,
            round(0.709 * 274877906944.0 / CAST(s_scaled AS DOUBLE), 6) AS est,
            CAST(floor(abs(0.709 * 274877906944.0 / CAST(s_scaled AS DOUBLE)
                - CAST(n_exact AS DOUBLE))
              / CAST(n_exact AS DOUBLE) * 10000.0) AS BIGINT) AS err_bp
          FROM ex JOIN s USING (grp) ORDER BY grp""",

    "q_sketch_stats" ->
      s"""WITH t AS (SELECT l_returnflag AS grp, CAST(l_partkey AS BIGINT) AS tid,
              l_extendedprice FROM lineitem),
          h AS (SELECT grp, tid, ${duckMixOf("tid")} AS y FROM t),
          r AS (SELECT grp, y % 64 AS reg, y // 64 AS rem FROM h),
          rk AS (SELECT grp, reg, ${duckHllRankCase("rem")} AS rank FROM r),
          regs AS (SELECT grp, reg, max(rank) AS m_j FROM rk GROUP BY 1, 2),
          occ AS (SELECT grp,
            SUM(CAST(1 AS BIGINT) << (26 - m_j)) AS s_occ,
            CAST(count(*) AS BIGINT) AS n_reg FROM regs GROUP BY 1),
          s AS (SELECT grp,
            s_occ + (64 - n_reg) * (CAST(1 AS BIGINT) << 26) AS s_scaled
            FROM occ),
          b AS (SELECT grp,
            CAST(floor(l_extendedprice / 1024.0) AS BIGINT) AS bin,
            CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
          n AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM b GROUP BY 1),
          cm AS (SELECT grp, bin,
            CAST(SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS BIGINT) AS cum
            FROM b),
          q50 AS (SELECT cm.grp, min(bin) * 1024 AS p50_est
            FROM cm JOIN n USING (grp) WHERE cum * 100 >= n * 50 GROUP BY 1),
          q99 AS (SELECT cm.grp, min(bin) * 1024 AS p99_est
            FROM cm JOIN n USING (grp) WHERE cum * 100 >= n * 99 GROUP BY 1)
          SELECT s.grp,
            round(0.709 * 274877906944.0 / CAST(s_scaled AS DOUBLE), 6)
              AS approx_parts,
            p50_est, p99_est
          FROM s JOIN q50 USING (grp) JOIN q99 USING (grp) ORDER BY grp""",

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q_covar" ->
      """WITH a AS (SELECT l_returnflag,
           SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS covar_qty_price,
           n
         FROM a ORDER BY l_returnflag""",

    "q_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_null_funcs" ->
      """SELECT coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_filled,
           COUNT(nullif(l_returnflag, 'N')) AS n_nonnull,
           COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_pivot" ->
      """SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q_median" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty, COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(cume_dist() OVER w, 6) AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q_running_sum" ->
      """SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS run_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q_intersect" ->
      """SELECT c_custkey AS k FROM customer
         INTERSECT
         SELECT o_custkey AS k FROM orders
         ORDER BY k""",

    "q_array_stats" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
           list_min(embedding) AS min_c, list_max(embedding) AS max_c
         FROM embeddings ORDER BY vec_id""",

    "q_token_count" ->
      s"""SELECT doc_id, CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
          FROM documents ORDER BY doc_id""",

    "q_hard_negatives" -> (duckBm25Cte +
      s""", rk AS (SELECT doc_id, score_q, CAST(row_number() OVER
            (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS bm25_rank
            FROM (SELECT * FROM agg ORDER BY score_q DESC, doc_id ASC
                  LIMIT 21)),
          tkg AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr0 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tkg),
          gsets AS (SELECT DISTINCT doc_id, ${duckPolyId("gram")} AS tid
            FROM gr0),
          gsel AS (SELECT g.doc_id, g.tid FROM gsets g
            SEMI JOIN rk USING (doc_id)),
          pos AS (SELECT doc_id FROM rk WHERE bm25_rank = 1),
          ps AS (SELECT tid FROM gsel SEMI JOIN pos USING (doc_id)),
          np AS (SELECT CAST(count(*) AS BIGINT) AS n_p FROM ps),
          cs AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN ps.tid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS inter
            FROM (SELECT doc_id, tid FROM gsel
              WHERE doc_id NOT IN (SELECT doc_id FROM pos)) c
            LEFT JOIN ps ON c.tid = ps.tid GROUP BY 1),
          neg AS (SELECT rk.doc_id, rk.bm25_rank, rk.score_q,
              coalesce(round(CAST(cs.inter AS DOUBLE) /
                CAST(cs.n + np.n_p - cs.inter AS DOUBLE), 6), 0.0)
                AS jaccard_pos
            FROM rk CROSS JOIN np LEFT JOIN cs ON cs.doc_id = rk.doc_id
            WHERE rk.bm25_rank > 1)
          SELECT doc_id, bm25_rank, score_q,
            CAST(score_q AS DOUBLE) / 1000000.0 AS score, jaccard_pos
          FROM neg WHERE jaccard_pos <= 0.5
          ORDER BY bm25_rank ASC LIMIT 10"""),

    "q_corpus_card" -> {
      val hits = duckMarkerHits(stopwords)
      val email = Quality.EmailRe
      val ip = Quality.Ipv4Re
      val phone = Quality.PhoneRe
      s"""WITH t AS (SELECT source, text, ${duckToks("text")} AS tk
            FROM documents),
          r AS (SELECT source,
            CAST(len(tk) AS BIGINT) AS nt,
            CAST(floor((least(1.0, CAST(len(tk) AS DOUBLE) / 50.0) *
              (1.0 - abs((CASE WHEN len(tk) > 0
                THEN CAST($hits AS DOUBLE) / CAST(len(tk) AS DOUBLE)
                ELSE 0.0 END) - 0.2))) * 1000000.0) AS BIGINT) AS q,
            (len(regexp_extract_all(text, '$email')) +
             len(regexp_extract_all(text, '$ip')) +
             len(regexp_extract_all(text, '$phone')) > 0) AS pii
            FROM t)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(nt) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN nt < 10 THEN 1 ELSE 0 END) AS BIGINT)
              AS short_docs,
            CAST(sum(CASE WHEN pii THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
            round(CAST(sum(q) AS DOUBLE) /
              CAST(count(*) * 1000000 AS DOUBLE), 6) AS mean_quality
          FROM r GROUP BY source ORDER BY source"""
    },

    "q_text_quality" -> {
      val hits = duckMarkerHits(stopwords)
      s"""WITH t AS (SELECT doc_id, text, ${duckToks("text")} AS tk FROM documents),
          t2 AS (SELECT doc_id, text, tk,
            CASE WHEN len(tk) > 0 THEN CAST($hits AS DOUBLE) / CAST(len(tk) AS DOUBLE)
                 ELSE 0.0 END AS stop_ratio FROM t)
          SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars_obs,
            CAST(len(tk) AS BIGINT) AS n_tokens,
            CASE WHEN len(tk) > 0 THEN
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(tk, x -> CAST(length(x) AS BIGINT))),
                (acc, x) -> acc + x) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS avg_tok_len,
            stop_ratio,
            least(1.0, CAST(len(tk) AS DOUBLE) / 50.0) *
              (1.0 - abs(stop_ratio - 0.2)) AS quality
          FROM t2 ORDER BY doc_id"""
    },

    "q_boilerplate" ->
      s"""WITH p AS (SELECT source,
            ${duckPolyId(s"""array_to_string((${duckToks("text")})[1:8], ' ')""")}
              AS ph
            FROM documents),
          c AS (SELECT source, ph, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2),
          t AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs
            FROM c GROUP BY 1),
          r AS (SELECT source, ph, n, row_number() OVER
            (PARTITION BY source ORDER BY n DESC, ph ASC) AS rn FROM c)
          SELECT t.source, t.n_docs, r.ph AS top_prefix_hash,
            r.n AS n_top, ${duckPpm("r.n", "t.n_docs")} AS share_ppm
          FROM t JOIN r ON r.source = t.source AND r.rn = 1
          ORDER BY t.source""",

    "q_k_anon" ->
      s"""SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS l,
           count(*) < 5 AS k_risk,
           count(DISTINCT user_id) < 3 AS l_risk
         FROM events GROUP BY 1, 2 ORDER BY event_type, day""",

    "q_t_closeness" ->
      s"""WITH rws AS (SELECT event_type,
            strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
            CAST(least(floor("value" / 50.0), 9.0) AS BIGINT) AS v
          FROM events),
          cnt AS (SELECT event_type, day, v,
            CAST(count(*) AS BIGINT) AS c FROM rws GROUP BY 1, 2, 3),
          gcnt AS (SELECT v, CAST(count(*) AS BIGINT) AS cg
            FROM rws GROUP BY 1),
          dom AS (SELECT v, CAST(sum(cg) OVER (ORDER BY v ROWS BETWEEN
            UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumg
            FROM gcnt),
          tot AS (SELECT CAST(sum(cg) AS BIGINT) AS n_all,
            CAST(count(*) AS BIGINT) AS d FROM gcnt),
          grp AS (SELECT event_type, day, CAST(sum(c) AS BIGINT) AS ng
            FROM cnt GROUP BY 1, 2),
          grid AS (SELECT g.event_type, g.day, g.ng, dm.v, dm.cumg,
            coalesce(c.c, CAST(0 AS BIGINT)) AS c
            FROM grp g CROSS JOIN dom dm
            LEFT JOIN cnt c ON c.event_type = g.event_type
              AND c.day = g.day AND c.v = dm.v),
          cum AS (SELECT event_type, day, ng, v, cumg,
            CAST(sum(c) OVER (PARTITION BY event_type, day ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cgrp
            FROM grid),
          agg AS (SELECT event_type, day, max(ng) AS n,
            max(tot.n_all) AS n_all, max(tot.d) AS d,
            sum(abs(CAST(cgrp AS HUGEINT) * tot.n_all
              - CAST(cumg AS HUGEINT) * ng)) AS tnum
            FROM cum CROSS JOIN tot GROUP BY 1, 2),
          fin AS (SELECT event_type, day, n,
            CAST(tnum AS BIGINT) AS t_num,
            CASE WHEN d <= 1 THEN CAST(0 AS BIGINT)
              ELSE ${duckPpm("tnum",
                "CAST(n AS HUGEINT) * n_all * (d - 1)")} END AS t_ppm
            FROM agg)
          SELECT event_type, day, n, t_num, t_ppm,
            t_ppm > 200000 AS t_risk
          FROM fin ORDER BY event_type, day""",

    "q_readability" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_words,
            greatest(CAST(1 AS BIGINT),
              CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
              AS n_sentences,
            CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS n_syllables
            FROM documents)
          SELECT doc_id, n_words, n_sentences, n_syllables,
            CASE WHEN n_words = 0 THEN NULL
              ELSE ${duckPpm(
                "206835 * n_sentences * n_words - 1015 * n_words * n_words" +
                  " - 84600 * n_syllables * n_sentences",
                "1000 * n_sentences * n_words")}
            END AS flesch_ppm
          FROM t ORDER BY doc_id""",

    "q_readability_panel" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_words,
            greatest(CAST(1 AS BIGINT),
              CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
              AS n_sentences,
            CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
              AS BIGINT) AS n_chars_an,
            CAST(len(list_filter(${duckToks("lower(text)")},
              w -> regexp_matches(w, '([aeiouy]+[^aeiouy]*){3}')))
              AS BIGINT) AS n_complex
            FROM documents)
          SELECT doc_id, n_words, n_sentences, n_chars_an, n_complex,
            CASE WHEN n_words = 0 THEN NULL
              ELSE ${duckPpm(
                "4710 * n_chars_an * n_sentences + 500 * n_words * n_words" +
                  " - 21430 * n_words * n_sentences",
                "n_words * n_sentences", 1)}
            END AS ari_milli,
            CASE WHEN n_words = 0 THEN NULL
              ELSE ${duckPpm(
                "5880 * n_chars_an - 29600 * n_sentences - 15800 * n_words",
                "n_words", 1)}
            END AS cli_milli,
            CASE WHEN n_words = 0 THEN NULL
              ELSE ${duckPpm(
                "400 * n_words * n_words + 40000 * n_complex * n_sentences",
                "n_words * n_sentences", 1)}
            END AS fog_milli
          FROM t ORDER BY doc_id""",

    "q_quality_gate" -> {
      s"""WITH ${duckQualityCte(withSource = true)},
          r AS (SELECT doc_id, source, quality,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n FROM q)
          SELECT doc_id, source, quality FROM r
          WHERE rn * 10000 <= n * 2500 ORDER BY doc_id"""
    },

    "q_quality_gate_sampled" -> {
      s"""WITH ${duckQualityCte(withSource = true)},
          smp AS (SELECT * FROM q WHERE ${duckMixOf("doc_id")} % 1000 < 400),
          r AS (SELECT doc_id, source, quality,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM smp),
          th AS (SELECT source,
            max(CASE WHEN rn = (n * 2500) // 10000 THEN quality END) AS thr
            FROM r GROUP BY 1),
          cov AS (SELECT q.doc_id, q.source, q.quality
            FROM q JOIN th USING (source) WHERE q.quality >= th.thr),
          rx AS (SELECT q.doc_id, q.source, q.quality,
            CAST(row_number() OVER (PARTITION BY q.source
              ORDER BY q.quality DESC, q.doc_id) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY q.source) AS BIGINT) AS n
            FROM q WHERE q.source NOT IN (SELECT source FROM th)),
          mex AS (SELECT doc_id, source, quality FROM rx
            WHERE rn * 10000 <= n * 2500)
          SELECT doc_id, source, quality FROM cov
          UNION ALL SELECT doc_id, source, quality FROM mex
          ORDER BY doc_id"""
    },

    "q_curriculum" -> {
      s"""WITH ${duckQualityCte()},
          r AS (SELECT doc_id, quality,
            CAST(row_number() OVER (ORDER BY quality, doc_id) AS BIGINT) AS rn,
            CAST(count(*) OVER () AS BIGINT) AS n,
            CAST(ntile(4) OVER (ORDER BY quality, doc_id) AS BIGINT) AS bucket
            FROM q)
          SELECT doc_id, quality, bucket,
            (rn - ((bucket - 1) * (n // 4) + least(bucket - 1, n % 4)) - 1)
              * 4 + bucket AS order_idx
          FROM r ORDER BY order_idx"""
    },

    "q_wordpiece" -> {
      val vocabLits = wpVocab.map(p => s"'$p'").mkString(", ")
      val longest = """(SELECT v.piece FROM vocab v
        WHERE starts_with(rem, v.piece)
        ORDER BY len(v.piece) DESC LIMIT 1)"""
      s"""WITH RECURSIVE vocab(piece) AS (SELECT unnest([$vocabLits])),
          tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          words AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS wi,
            unnest(tk) AS w FROM tk WHERE len(tk) > 0),
          rec(doc_id, wi, done, rem) AS (
            SELECT doc_id, wi, CAST('' AS VARCHAR), w FROM words
            UNION ALL
            SELECT doc_id, wi,
              done || ' ' || coalesce($longest, '[UNK]'),
              CASE WHEN $longest IS NULL THEN rem[2:]
                   ELSE rem[len($longest) + 1:] END
            FROM rec WHERE rem != ''),
          fin AS (SELECT doc_id, wi, trim(done) AS wp FROM rec
            WHERE rem = ''),
          agg AS (SELECT doc_id,
            string_agg(wp, ' ' ORDER BY wi) AS pieces,
            CAST(sum(len(string_split(wp, ' '))) AS BIGINT) AS n_pieces
            FROM fin GROUP BY 1),
          n AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words FROM tk)
          SELECT n.doc_id, coalesce(pieces, '') AS pieces,
            CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces, n_words,
            CASE WHEN n_words > 0 THEN CAST(coalesce(n_pieces, 0) AS DOUBLE)
                 / CAST(n_words AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
              AS fertility
          FROM n LEFT JOIN agg USING (doc_id) ORDER BY n.doc_id"""
    },

    "q_unigram_encode" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${duckToks("text")}) AS word
            FROM documents),
          tok AS (SELECT doc_id, word FROM tk
            WHERE regexp_matches(word, '^[a-z]+$$')),
          uw AS (SELECT DISTINCT word FROM tok),
          ${duckUnigramDp()}
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(np) AS BIGINT) AS n_pieces,
            CAST(sum(cost) AS BIGINT) AS cost_milli,
            round(CAST(sum(np) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
              AS fertility
          FROM tok JOIN dfin USING (word)
          GROUP BY doc_id ORDER BY doc_id""",

    "q_unigram_pieces" ->
      s"""WITH tk AS (SELECT unnest(${duckToks("text")}) AS word
            FROM documents),
          tok AS (SELECT word FROM tk
            WHERE regexp_matches(word, '^[a-z]+$$')),
          wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM tok
            GROUP BY 1),
          uw AS (SELECT word FROM wc),
          ${duckUnigramDp()}
          SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt
          FROM (SELECT wc.wc, unnest(string_split(d.path, ' ')) AS piece
                FROM wc JOIN dfin d USING (word))
          GROUP BY piece ORDER BY piece""",

    "q_suffix_rank" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          s AS (SELECT doc_id, u.i, tk[u.i : u.i + 31] AS w
            FROM t, unnest(range(1, len(tk) + 1)) AS u(i))
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
            CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS srank
          FROM s ORDER BY doc_id, pos""",

    "q_longest_repeat" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          s AS (SELECT doc_id, u.i, tk[u.i : u.i + 31] AS w
            FROM t, unnest(range(1, len(tk) + 1)) AS u(i)),
          r AS MATERIALIZED (SELECT doc_id, i, w,
            row_number() OVER (ORDER BY w, doc_id, i) AS rn FROM s),
          p AS (SELECT a.doc_id AS id_a, a.i - 1 AS pos_a,
            b.doc_id AS id_b, b.i - 1 AS pos_b,
            coalesce(list_max(list_filter(
              range(1, least(least(len(a.w), len(b.w)), 31) + 1),
              j -> a.w[1:j] = b.w[1:j])), 0) AS lcp
            FROM r a JOIN r b ON b.rn = a.rn + 1),
          top AS (SELECT * FROM p WHERE lcp >= 1
            ORDER BY lcp DESC, id_a, pos_a LIMIT 10)
          SELECT CAST(top.lcp AS BIGINT) AS lcp, top.id_a,
            CAST(top.pos_a AS BIGINT) AS pos_a, top.id_b,
            CAST(top.pos_b AS BIGINT) AS pos_b,
            array_to_string(t.tk[top.pos_a + 1 : top.pos_a + top.lcp], ' ')
              AS snippet
          FROM top JOIN t ON t.doc_id = top.id_a
          ORDER BY lcp DESC, id_a, pos_a""",

    "q_edit_pairs" ->
      s"""WITH tk AS (SELECT unnest(${duckToks("text")}) AS word
            FROM documents
            UNION ALL
            SELECT unnest(string_split(p_name, ' ')) AS word FROM part),
          w AS (SELECT DISTINCT word FROM tk
            WHERE regexp_matches(word, '^[a-z]+$$'))
          SELECT a.word AS id_a, b.word AS id_b,
            CAST(levenshtein(a.word, b.word) AS INT) AS dist
          FROM w a JOIN w b
            ON a.word < b.word
            AND abs(length(a.word) - length(b.word)) <= 2
          WHERE levenshtein(a.word, b.word) <= 2
          ORDER BY id_a, id_b""",

    "q_profile" -> {
      // kind: n = numeric, s = string, t = timestamp
      val specs = Seq("o_orderkey" -> 'n', "o_custkey" -> 'n',
        "o_orderstatus" -> 's', "o_totalprice" -> 'n',
        "o_orderdate" -> 't', "o_orderpriority" -> 's')
      val parts = specs.map { case (c, kind) =>
        val (mn, mx, ms, xs) = kind match {
          case 'n' => (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
          case 's' => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"min($c)", s"max($c)")
          case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
            s"strftime(max($c), '%Y-%m-%d %H:%M:%S')")
        }
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
            FROM orders"""
      }
      parts.mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    "q_blocklist" -> {
      val mask = blockPhrases.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN contains(text, '$p') THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH m AS (SELECT doc_id, CAST($mask AS BIGINT) AS block_mask
            FROM documents)
          SELECT doc_id, block_mask,
            CAST(bit_count(block_mask) AS BIGINT) AS n_blocked,
            block_mask != 0 AS blocked
          FROM m ORDER BY doc_id"""
    },

    "q_er_golden" -> {
      val f = graft.pipeline.GoldenRecords.erFields
      val wExpr =
        s"""(CASE WHEN upper(a.name) = upper(b.name)
              THEN ${f(0).agreeMilli} ELSE ${f(0).disagreeMilli} END) +
            (CASE WHEN substr(a.segment, 1, 4) = substr(b.segment, 1, 4)
              THEN ${f(1).agreeMilli} ELSE ${f(1).disagreeMilli} END) +
            (CASE WHEN abs(a.acctbal - b.acctbal) < 1
              THEN ${f(2).agreeMilli} ELSE ${f(2).disagreeMilli} END)"""
      s"""WITH RECURSIVE
          clean AS (SELECT CAST(c_custkey AS BIGINT) AS rec_id,
            c_name AS name, c_mktsegment AS segment,
            CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
            CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
          dirty AS (SELECT rec_id + 1000000 AS rec_id,
            upper(name) AS name, substr(segment, 1, 4) AS segment,
            CAST(acctbal + 0.5 AS DECIMAL(18,2)) AS acctbal, nationkey
            FROM clean WHERE rec_id % 5 = 0),
          recs AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
          blk AS (SELECT *, concat(CAST(nationkey AS VARCHAR), '|',
            upper(substr(name, length(name) - 3, 4))) AS bk FROM recs),
          links AS (SELECT a.rec_id AS s, b.rec_id AS t
            FROM blk a JOIN blk b ON a.bk = b.bk AND a.rec_id < b.rec_id
            WHERE ($wExpr) >= ${graft.pipeline.GoldenRecords.linkMilli}),
          e AS (SELECT s, t FROM links UNION SELECT t, s FROM links),
          reach(id, r) AS (SELECT rec_id, rec_id FROM recs
            UNION SELECT e.t, reach.r FROM e JOIN reach ON e.s = reach.id),
          comp AS (SELECT id AS rec_id, min(r) AS component
            FROM reach GROUP BY id),
          member AS (SELECT recs.*, comp.component FROM recs
            JOIN comp USING (rec_id)),
          base AS (SELECT *, row_number() OVER (PARTITION BY component
            ORDER BY length(segment) DESC, rec_id ASC) AS rn FROM member),
          agg AS (SELECT component, CAST(count(*) AS BIGINT) AS n_records,
            min(acctbal) AS acctbal FROM member GROUP BY 1)
          SELECT base.component AS entity_id, agg.n_records, base.name,
            base.segment, CAST(agg.acctbal * 100 AS BIGINT) AS acctbal_cents
          FROM base JOIN agg USING (component)
          WHERE rn = 1 ORDER BY entity_id"""
    },

    "q_fs_linkage" -> {
      val w = fsFields.map(f => f.name -> (f.agreeMilli, f.disagreeMilli)).toMap
      def term(n: String) =
        s"(CASE WHEN ${n}_agree THEN ${w(n)._1} ELSE ${w(n)._2} END)"
      s"""WITH t AS (SELECT doc_id, lang, source,
            CAST(len(tk) AS BIGINT) AS n_toks,
            CAST(length(text) AS BIGINT) AS n_chars,
            tk[1] AS head_tok, doc_id % 25 AS blk
            FROM (SELECT *, ${duckToks("text")} AS tk FROM documents)),
          p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            a.source = b.source AS src_agree,
            abs(a.n_toks - b.n_toks) <= 5 AS len_agree,
            a.head_tok = b.head_tok AS head_agree,
            abs(a.n_chars - b.n_chars) <= 30 AS chars_agree
            FROM t a JOIN t b ON a.lang = b.lang AND a.blk = b.blk
              AND a.doc_id < b.doc_id),
          sc AS (SELECT id_a, id_b, src_agree, len_agree, head_agree,
            chars_agree,
            CAST(${term("src")} + ${term("len")} + ${term("head")} +
              ${term("chars")} AS BIGINT) AS weight_milli FROM p)
          SELECT *, CASE WHEN weight_milli >= 6000 THEN 'link'
                         WHEN weight_milli < 0 THEN 'non-link'
                         ELSE 'possible' END AS decision
          FROM sc ORDER BY id_a, id_b"""
    },

    "q_fs_patterns" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
            CAST(len(tk) AS BIGINT) AS n_toks,
            CAST(length(text) AS BIGINT) AS n_chars,
            tk[1] AS head_tok, doc_id % 25 AS blk
            FROM (SELECT *, ${duckToks("text")} AS tk FROM documents)),
          p AS (SELECT a.source = b.source AS src_agree,
            abs(a.n_toks - b.n_toks) <= 5 AS len_agree,
            a.head_tok = b.head_tok AS head_agree,
            abs(a.n_chars - b.n_chars) <= 30 AS chars_agree
            FROM t a JOIN t b ON a.lang = b.lang AND a.blk = b.blk
              AND a.doc_id < b.doc_id)
          SELECT src_agree, len_agree, head_agree, chars_agree,
            CAST(count(*) AS BIGINT) AS n_pairs
          FROM p GROUP BY 1, 2, 3, 4
          ORDER BY src_agree, len_agree, head_agree, chars_agree""",

    "q_domain_cap" -> {
      s"""WITH ${duckQualityCte(withSource = true)},
          r AS (SELECT doc_id, source, quality,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id) AS BIGINT) AS rnk FROM q)
          SELECT doc_id, source, quality, rnk FROM r
          WHERE rnk <= 10 ORDER BY doc_id"""
    },

    "q_lang_id" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          h AS (SELECT doc_id,
            ${duckMarkerHits(langMarkers(0)._2)} AS h_en,
            ${duckMarkerHits(langMarkers(1)._2)} AS h_ml,
            ${duckMarkerHits(langMarkers(2)._2)} AS h_sql FROM t)
          SELECT doc_id,
            CASE WHEN greatest(h_en, h_ml, h_sql) = 0 THEN 'und'
                 WHEN h_en >= h_ml AND h_en >= h_sql THEN 'en'
                 WHEN h_ml >= h_sql THEN 'ml' ELSE 'sql' END AS lang_pred,
            h_en, h_ml, h_sql
          FROM h ORDER BY doc_id""",

    "q_doc_fingerprint" ->
      """SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(text) + 1),
               i -> CAST(ascii(text[i]) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",

    "q_novelty" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk
            FROM documents),
          sh0 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
            THEN list_transform(range(1, len(tk) - 6),
              i -> array_to_string(tk[i:i+7], ' '))
            ELSE [] END) AS gram FROM tk),
          ids AS (SELECT DISTINCT doc_id, ${duckPolyId("gram")} AS tid
            FROM sh0),
          dfq AS (SELECT tid, CAST(count(*) AS BIGINT) AS df
            FROM ids GROUP BY 1),
          agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
            CAST(sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_shared
            FROM ids JOIN dfq USING (tid) GROUP BY 1)
          SELECT doc_id, n_grams, n_shared,
            ${duckPpm("n_grams - n_shared", "n_grams")} AS novelty_ppm
          FROM agg ORDER BY doc_id""",

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY substr(text, 1, 60) ORDER BY keep_id""",

    "q_decontaminate" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tk),
          g AS (SELECT DISTINCT doc_id, ${duckPolyId("gram")} AS tid FROM gr),
          ev AS (SELECT DISTINCT tid FROM g WHERE doc_id < 10),
          bad AS (SELECT g.doc_id FROM g JOIN ev USING (tid)
            WHERE g.doc_id >= 10 GROUP BY g.doc_id HAVING count(*) > 0)
          SELECT doc_id FROM documents
          WHERE doc_id >= 10 AND doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id""",

    // The bloom prefilter is performance-transparent (no false negatives +
    // exact verify), so the oracle is the plain exact form at 4-gram /
    // tolerance 1 — any bloom-induced row loss would hash-mismatch here.
    "q_bloom_decontaminate" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 4
            THEN list_transform(range(1, len(tk) - 2),
              i -> array_to_string(tk[i:i+3], ' '))
            ELSE [] END) AS gram FROM tk),
          g AS (SELECT DISTINCT doc_id, ${duckPolyId("gram")} AS tid FROM gr),
          ev AS (SELECT DISTINCT tid FROM g WHERE doc_id < 10),
          bad AS (SELECT g.doc_id FROM g JOIN ev USING (tid)
            WHERE g.doc_id >= 10 GROUP BY g.doc_id HAVING count(*) > 1)
          SELECT doc_id FROM documents
          WHERE doc_id >= 10 AND doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id""",

    "q_contam_fraction" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tk),
          g AS (SELECT DISTINCT doc_id, ${duckPolyId("gram")} AS tid FROM gr),
          ev AS (SELECT DISTINCT tid FROM g WHERE doc_id < 10),
          st AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
            CAST(sum(CASE WHEN ev.tid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS shared
            FROM (SELECT doc_id, tid FROM g WHERE doc_id >= 10) t
            LEFT JOIN ev ON t.tid = ev.tid GROUP BY t.doc_id)
          SELECT d.doc_id,
            CAST(coalesce(st.n_shingles, 0) AS BIGINT) AS n_shingles,
            CAST(coalesce(st.shared, 0) AS BIGINT) AS shared,
            CASE WHEN coalesce(st.n_shingles, 0) = 0 THEN 0.0
              ELSE round(CAST(st.shared AS DOUBLE) /
                CAST(st.n_shingles AS DOUBLE), 6) END AS contam_ratio
          FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
          WHERE d.doc_id >= 10 ORDER BY d.doc_id""",

    "q_winnow" -> {
      val gram = duckPolyId(s"array_to_string(tk[i:i+2], ' ')")
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          g AS (SELECT doc_id,
            unnest(range(0, len(tk) - 2)) AS pos,
            unnest(list_transform(range(1, len(tk) - 1), i -> $gram)) AS tid
            FROM tk WHERE len(tk) >= 3),
          w AS (SELECT doc_id, pos,
            min(tid * 2147483648 + (2147483647 - pos)) OVER
              (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
            count(*) OVER (PARTITION BY doc_id) AS m FROM g)
          SELECT DISTINCT doc_id,
            2147483647 - (sel % 2147483648) AS sel_pos,
            sel // 2147483648 AS tid
          FROM w WHERE pos <= greatest(m - 4, 0)
          ORDER BY doc_id, sel_pos"""
    },

    "q_winnow_pairs" -> {
      val gram = duckPolyId(s"array_to_string(tk[i:i+2], ' ')")
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          g AS (SELECT doc_id,
            unnest(range(0, len(tk) - 2)) AS pos,
            unnest(list_transform(range(1, len(tk) - 1), i -> $gram)) AS tid
            FROM tk WHERE len(tk) >= 3),
          w AS (SELECT doc_id, pos,
            min(tid * 2147483648 + (2147483647 - pos)) OVER
              (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
            count(*) OVER (PARTITION BY doc_id) AS m FROM g),
          f AS (SELECT DISTINCT doc_id, sel // 2147483648 AS tid
            FROM w WHERE pos <= greatest(m - 4, 0)),
          rare AS (SELECT tid FROM f GROUP BY tid
            HAVING count(*) <= ${duckDerivedCap("SELECT count(*) FROM documents")}),
          ff AS (SELECT doc_id, tid FROM f JOIN rare USING (tid)),
          cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ff a JOIN ff b USING (tid) WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2),
          gs AS (SELECT DISTINCT doc_id, tid FROM g),
          sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM gs GROUP BY 1),
          ip AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
            FROM cand c JOIN gs x ON x.doc_id = c.id_a
            JOIN gs y ON y.doc_id = c.id_b AND y.tid = x.tid
            GROUP BY 1, 2)
          SELECT id_a, id_b,
            round(CAST(inter AS DOUBLE) /
              CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
          FROM ip JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(CAST(inter AS DOUBLE) /
            CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.2
          ORDER BY id_a, id_b"""
    },

    "q_oov_rate" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          toks AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
          t AS (SELECT doc_id, ${duckPolyId("tok")} AS tid FROM toks),
          v AS (SELECT tid FROM (SELECT tid, count(*) AS c FROM t GROUP BY 1
            ORDER BY c DESC, tid ASC LIMIT 500)),
          j AS (SELECT t.doc_id, CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END
              AS oov
            FROM t LEFT JOIN v ON t.tid = v.tid)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(oov) AS BIGINT) AS n_oov,
            round(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
              AS oov_rate
          FROM j GROUP BY doc_id ORDER BY doc_id""",

    "q_dsir_select" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          toks AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
          b AS (SELECT doc_id, ${duckPolyId("tok")} % 512 AS bkt FROM toks),
          rc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS rc FROM b
            WHERE doc_id >= 10 GROUP BY 1),
          tc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS tc FROM b
            WHERE doc_id < 10 GROUP BY 1),
          tot AS (SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM b WHERE doc_id >= 10) AS n_r,
            (SELECT CAST(count(*) AS BIGINT) FROM b WHERE doc_id < 10) AS n_t),
          r AS (SELECT rc.bkt,
            CAST((CAST(coalesce(tc.tc, 0) + 1 AS HUGEINT) * (n_r + 512)
                    * 1000000)
                 // (CAST(rc.rc + 1 AS HUGEINT) * (n_t + 512)) AS BIGINT)
              AS lr_q
            FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tot),
          sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(lr_q) AS BIGINT) AS lr_sum
            FROM b JOIN r USING (bkt) WHERE b.doc_id >= 10 GROUP BY 1)
          SELECT doc_id, n_tokens,
            CAST(lr_sum // n_tokens AS BIGINT) AS score_q,
            CAST(lr_sum // n_tokens AS DOUBLE) / 1000000.0 AS score
          FROM sc ORDER BY score_q DESC, doc_id ASC LIMIT 25""",

    "q_ngram_jaccard" ->
      s"""WITH $duckNgramPairsCte
          SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
            round(CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
          FROM ip JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.2
          ORDER BY id_a, id_b""",

    "q_kcore" -> {
      val peel = (1 to 3).map { r =>
        s"""a$r AS (SELECT s AS id FROM sym
            JOIN a${r - 1} x ON x.id = sym.s
            JOIN a${r - 1} y ON y.id = sym.t
            GROUP BY s HAVING count(*) >= 2)"""
      }.mkString(",\n")
      s"""WITH $duckNgramPairsCte,
          pr AS (SELECT id_a, id_b FROM ip
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(CAST(inter AS DOUBLE) /
              CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.2),
          sym AS (SELECT id_a AS s, id_b AS t FROM pr WHERE id_a <> id_b
            UNION SELECT id_b, id_a FROM pr WHERE id_a <> id_b),
          a0 AS (SELECT DISTINCT s AS id FROM sym),
          $peel
          SELECT s AS id, CAST(count(*) AS BIGINT) AS degree FROM sym
          JOIN a3 x ON x.id = sym.s
          JOIN a3 y ON y.id = sym.t
          GROUP BY s ORDER BY id"""
    },

    "q_containment" ->
      s"""WITH $duckNgramPairsCte
          SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
            round(CAST(inter AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE), 6) AS containment
          FROM ip JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(CAST(inter AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE), 6) >= 0.4
          ORDER BY id_a, id_b""",

    "q_snm_pairs" ->
      """WITH r AS (SELECT doc_id, lower(substring(text, 1, 30)) AS key,
            row_number() OVER (ORDER BY lower(substring(text, 1, 30)),
              doc_id) AS rn
          FROM documents)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(b.rn - a.rn AS BIGINT) AS rdist
          FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
          ORDER BY id_a, id_b""",

    "q_rouge2" ->
      s"""WITH $duckSnmCandCte,
          tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
            i -> tk[i] || ' ' || tk[i + 1])) AS gram
            FROM tk WHERE len(tk) >= 2),
          g AS (SELECT doc_id, ${duckPolyId("gram")} AS g FROM gr),
          gc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
            FROM g GROUP BY 1, 2),
          tt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t
            FROM gc GROUP BY 1),
          ov AS (SELECT c.id_a, c.id_b,
            CAST(sum(least(ga.c, gb.c)) AS BIGINT) AS n_overlap
            FROM cand c
            JOIN gc ga ON ga.doc_id = c.id_a
            JOIN gc gb ON gb.doc_id = c.id_b AND gb.g = ga.g
            GROUP BY 1, 2),
          fin AS (SELECT c.id_a, c.id_b,
            coalesce(ov.n_overlap, 0) AS n_overlap,
            ta.t AS n_cand, tb.t AS n_ref
            FROM cand c
            JOIN tt ta ON ta.doc_id = c.id_a
            JOIN tt tb ON tb.doc_id = c.id_b
            LEFT JOIN ov ON ov.id_a = c.id_a AND ov.id_b = c.id_b)
          SELECT id_a, id_b, n_overlap, n_cand, n_ref,
            ${duckPpm("n_overlap", "n_cand")} AS rouge_p_ppm,
            ${duckPpm("n_overlap", "n_ref")} AS rouge_r_ppm,
            ${duckPpm("2 * n_overlap", "n_cand + n_ref")} AS rouge_f_ppm
          FROM fin ORDER BY id_a, id_b""",

    "q_bleu4" -> {
      val bp = s"""CASE WHEN k.c >= k.r THEN 0
        ELSE -${duckPpm("(k.r - k.c) * 378192", "k.c", 1)} END"""
      val gramStreams = (1 to 4).map { nn =>
        s"""SELECT doc_id, $nn AS n,
            unnest(list_transform(range(1, len(tk) + ${2 - nn}),
              i -> array_to_string(tk[i:i+${nn - 1}], ' '))) AS gram
            FROM tk WHERE len(tk) >= $nn"""
      }.mkString("\n            UNION ALL ")
      val mCols = (1 to 4).map(nn =>
        s"max(CASE WHEN pp.n = $nn THEN pp.m END) AS m$nn").mkString(", ")
      s"""WITH $duckSnmCandCte,
          tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr AS ($gramStreams),
          g AS (SELECT doc_id, n, ${duckPolyId("gram")} AS g FROM gr),
          gc AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS c
            FROM g GROUP BY 1, 2, 3),
          tt AS (SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS t
            FROM gc GROUP BY 1, 2),
          ov AS (SELECT c.id_a, c.id_b, ga.n,
            CAST(sum(least(ga.c, gb.c)) AS BIGINT) AS m
            FROM cand c
            JOIN gc ga ON ga.doc_id = c.id_a
            JOIN gc gb ON gb.doc_id = c.id_b AND gb.n = ga.n
              AND gb.g = ga.g
            GROUP BY 1, 2, 3),
          pp AS (SELECT c.id_a, c.id_b, ta.n,
            coalesce(ov.m, CAST(0 AS BIGINT)) AS m,
            CASE WHEN ta.n = 1 THEN coalesce(ov.m, CAST(0 AS BIGINT))
              ELSE coalesce(ov.m, CAST(0 AS BIGINT)) + 1 END AS num,
            CASE WHEN ta.n = 1 THEN ta.t ELSE ta.t + 1 END AS den
            FROM cand c
            JOIN tt ta ON ta.doc_id = c.id_a
            LEFT JOIN ov ON ov.id_a = c.id_a AND ov.id_b = c.id_b
              AND ov.n = ta.n),
          keep AS MATERIALIZED (SELECT c.id_a, c.id_b,
            ca.t AS c, rb.t AS r
            FROM cand c
            JOIN tt ca ON ca.doc_id = c.id_a AND ca.n = 1
            JOIN tt rb ON rb.doc_id = c.id_b AND rb.n = 1
            JOIN pp p1 ON p1.id_a = c.id_a AND p1.id_b = c.id_b
              AND p1.n = 1
            WHERE ca.t >= 4 AND rb.t >= 1 AND p1.m >= 1),
          lx AS (SELECT DISTINCT x FROM (
            SELECT num AS x FROM pp SEMI JOIN keep USING (id_a, id_b)
            UNION
            SELECT den FROM pp SEMI JOIN keep USING (id_a, id_b))),
          $duckLog2Chain,
          sq AS (SELECT pp.id_a, pp.id_b,
            CAST(sum(l1.lq - l2.lq) AS BIGINT) AS s, $mCols
            FROM pp SEMI JOIN keep USING (id_a, id_b)
            JOIN lgt l1 ON l1.x = pp.num
            JOIN lgt l2 ON l2.x = pp.den
            GROUP BY 1, 2)
          SELECT k.id_a, k.id_b, k.c, k.r, sq.m1, sq.m2, sq.m3, sq.m4,
            CAST(sq.s + $bp AS BIGINT) AS bleu_log2x4_q,
            CAST(sq.s + $bp AS DOUBLE) / 262144.0 AS bleu_log2
          FROM keep k JOIN sq ON sq.id_a = k.id_a AND sq.id_b = k.id_b
          ORDER BY k.id_a, k.id_b"""
    },

    "q_editdist_verify" ->
      """WITH r AS (SELECT doc_id, lower(substring(text, 1, 30)) AS key,
            row_number() OVER (ORDER BY lower(substring(text, 1, 30)),
              doc_id) AS rn
          FROM documents),
          cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4),
          p AS (SELECT doc_id, substring(text, 1, 80) AS pfx FROM documents)
          SELECT c.id_a, c.id_b,
            CAST(levenshtein(pa.pfx, pb.pfx) AS BIGINT) AS dist
          FROM cand c JOIN p pa ON pa.doc_id = c.id_a
          JOIN p pb ON pb.doc_id = c.id_b
          WHERE levenshtein(pa.pfx, pb.pfx) <= 40
          ORDER BY id_a, id_b""",

    "q_damerau_verify" ->
      """WITH r AS (SELECT doc_id, lower(substring(text, 1, 30)) AS key,
            row_number() OVER (ORDER BY lower(substring(text, 1, 30)),
              doc_id) AS rn
          FROM documents),
          cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4),
          p AS (SELECT doc_id, substring(text, 1, 80) AS pfx FROM documents)
          SELECT c.id_a, c.id_b,
            CAST(damerau_levenshtein(pa.pfx, pb.pfx) AS BIGINT) AS dist,
            CAST(levenshtein(pa.pfx, pb.pfx) AS BIGINT) AS lev_dist,
            CAST(levenshtein(pa.pfx, pb.pfx)
              - damerau_levenshtein(pa.pfx, pb.pfx) AS BIGINT)
              AS transposition_gain
          FROM cand c JOIN p pa ON pa.doc_id = c.id_a
          JOIN p pb ON pb.doc_id = c.id_b
          WHERE damerau_levenshtein(pa.pfx, pb.pfx) <= 40
          ORDER BY id_a, id_b""",

    "q_blocker_recall" ->
      s"""WITH $duckNgramPairsCte,
          tnorm AS (SELECT id_a, id_b FROM ip
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.2),
          r AS (SELECT doc_id,
            row_number() OVER (ORDER BY lower(substring(text, 1, 30)),
              doc_id) AS rn FROM documents),
          cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
              greatest(a.doc_id, b.doc_id) AS id_b
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4),
          hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
            FROM tnorm t JOIN cand c USING (id_a, id_b))
          SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM tnorm) AS n_truth,
            (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
            n_hit,
            CASE WHEN (SELECT count(*) FROM tnorm) = 0 THEN 1.0
              ELSE round(CAST(n_hit AS DOUBLE) /
                (SELECT CAST(count(*) AS DOUBLE) FROM tnorm), 6) END AS recall,
            CASE WHEN (SELECT count(*) FROM cand) = 0 THEN 1.0
              ELSE round(CAST(n_hit AS DOUBLE) /
                (SELECT CAST(count(*) AS DOUBLE) FROM cand), 6) END AS precision
          FROM hit""",

    "q_label_prop" ->
      s"""WITH $duckSnmCandCte,
          $duckLabelPropCte
          l2 AS (SELECT v.id, coalesce(p.lbl, v.lbl) AS lbl
            FROM l1 v LEFT JOIN p2 p USING (id))
          SELECT id AS doc_id, CAST(lbl AS BIGINT) AS label
          FROM l2 ORDER BY doc_id""",

    "q_conductance" ->
      s"""WITH $duckSnmCandCte,
          $duckLabelPropCte
          l2 AS MATERIALIZED (SELECT v.id,
            CAST(coalesce(p.lbl, v.lbl) AS BIGINT) AS lbl
            FROM l1 v LEFT JOIN p2 p USING (id)),
          deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
            FROM sym GROUP BY 1),
          vol AS (SELECT l.lbl, CAST(count(*) AS BIGINT) AS n_vertices,
            CAST(sum(coalesce(d.deg, 0)) AS BIGINT) AS vol
            FROM l2 l LEFT JOIN deg d USING (id) GROUP BY 1),
          tot AS (SELECT CAST(sum(vol) AS BIGINT) AS volall FROM vol),
          cut AS (SELECT la.lbl, CAST(count(*) AS BIGINT) AS cut
            FROM sym e
            JOIN l2 la ON la.id = e.src
            JOIN l2 lb ON lb.id = e.dst
            WHERE la.lbl <> lb.lbl GROUP BY 1)
          SELECT v.lbl AS label, v.n_vertices, v.vol,
            coalesce(c.cut, CAST(0 AS BIGINT)) AS cut,
            CASE WHEN least(v.vol, tot.volall - v.vol) = 0 THEN NULL
              ELSE ${duckPpm("coalesce(c.cut, CAST(0 AS BIGINT))",
                "least(v.vol, tot.volall - v.vol)")}
            END AS phi_ppm
          FROM vol v LEFT JOIN cut c ON c.lbl = v.lbl CROSS JOIN tot
          ORDER BY label""",

    // Layered-BFS replay: hop h = distinct neighbors of hop h−1 minus
    // everything nearer (NOT EXISTS per earlier layer), reciprocals on
    // the 1e6 integer grid.
    "q_harmonic" ->
      s"""WITH $duckSnmCandCte,
          sym AS (SELECT id_a AS src, id_b AS dst FROM cand
            WHERE id_a <> id_b
            UNION SELECT id_b, id_a FROM cand WHERE id_a <> id_b),
          h1 AS MATERIALIZED (SELECT src AS u, dst AS v FROM sym),
          h2 AS MATERIALIZED (SELECT DISTINCT h.u, e.dst AS v
            FROM h1 h JOIN sym e ON e.src = h.v
            WHERE e.dst <> h.u AND NOT EXISTS
              (SELECT 1 FROM h1 x WHERE x.u = h.u AND x.v = e.dst)),
          h3 AS (SELECT DISTINCT h.u, e.dst AS v
            FROM h2 h JOIN sym e ON e.src = h.v
            WHERE e.dst <> h.u AND NOT EXISTS
              (SELECT 1 FROM h1 x WHERE x.u = h.u AND x.v = e.dst)
            AND NOT EXISTS
              (SELECT 1 FROM h2 x WHERE x.u = h.u AND x.v = e.dst)),
          allr AS (SELECT u, v, 1 AS d FROM h1
            UNION ALL SELECT u, v, 2 FROM h2
            UNION ALL SELECT u, v, 3 FROM h3),
          ag AS (SELECT u, CAST(count(*) AS BIGINT) AS n_reached,
            CAST(sum(1000000 // d) AS BIGINT) AS harmonic_e6
            FROM allr GROUP BY 1)
          SELECT d.doc_id,
            coalesce(ag.n_reached, CAST(0 AS BIGINT)) AS n_reached,
            coalesce(ag.harmonic_e6, CAST(0 AS BIGINT)) AS harmonic_e6
          FROM documents d LEFT JOIN ag ON ag.u = d.doc_id
          ORDER BY doc_id""",

    // The q_label_prop CTE chain (same 2 rounds), then exact per-
    // community modularity contributions in signed ppm.
    "q_modularity" -> {
      val num = "4 * mm.m * coalesce(ie.n_edges_in, 0) - " +
        "coalesce(ds.deg_sum, 0) * coalesce(ds.deg_sum, 0)"
      s"""WITH $duckSnmCandCte,
          $duckLabelPropCte
          l2 AS (SELECT v.id, coalesce(p.lbl, v.lbl) AS lbl
            FROM l1 v LEFT JOIN p2 p USING (id)),
          und AS (SELECT DISTINCT least(id_a, id_b) AS a,
              greatest(id_a, id_b) AS b
            FROM cand WHERE id_a <> id_b),
          mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
          lab AS (SELECT id, CAST(lbl AS BIGINT) AS lbl FROM l2),
          ie AS (SELECT la.lbl AS label,
              CAST(count(*) AS BIGINT) AS n_edges_in
            FROM und JOIN lab la ON la.id = und.a
            JOIN lab lb ON lb.id = und.b
            WHERE la.lbl = lb.lbl GROUP BY 1),
          ds AS (SELECT l.lbl AS label, CAST(count(*) AS BIGINT) AS deg_sum
            FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und) e
            JOIN lab l ON l.id = e.id GROUP BY 1),
          mem AS (SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n_vertices
            FROM lab GROUP BY 1)
          SELECT mem.label, mem.n_vertices,
            coalesce(ie.n_edges_in, CAST(0 AS BIGINT)) AS n_edges_in,
            coalesce(ds.deg_sum, CAST(0 AS BIGINT)) AS deg_sum,
            ${duckPpm(num, "4 * mm.m * mm.m")} AS q_c_ppm
          FROM mem LEFT JOIN ie USING (label) LEFT JOIN ds USING (label)
          CROSS JOIN mm
          ORDER BY label"""
    },

    "q_ppr" ->
      s"""WITH $duckSnmCandCte,
          sym AS (SELECT id_a AS src, id_b AS dst FROM cand
            WHERE id_a <> id_b
            UNION SELECT id_b, id_a FROM cand WHERE id_a <> id_b),
          deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM sym
            GROUP BY 1),
          seeds AS (SELECT doc_id FROM documents WHERE doc_id < 5),
          ns AS (SELECT count(*) AS n FROM seeds),
          r0 AS (SELECT d.doc_id,
            CASE WHEN s.doc_id IS NOT NULL
              THEN CAST(1000000000000 AS HUGEINT) // n ELSE 0 END AS rq
            FROM documents d LEFT JOIN seeds s USING (doc_id) CROSS JOIN ns),
          c1 AS (SELECT e.dst AS doc_id, sum(r.rq // d.dg) AS inm
            FROM sym e JOIN r0 r ON r.doc_id = e.src
            JOIN deg d ON d.src = e.src GROUP BY 1),
          r1 AS (SELECT v.doc_id,
            (CASE WHEN s.doc_id IS NOT NULL
               THEN CAST(3000000000000 AS HUGEINT) // (n * 20) ELSE 0 END)
              + (17 * coalesce(c.inm, 0)) // 20 AS rq
            FROM documents v LEFT JOIN seeds s USING (doc_id) CROSS JOIN ns
            LEFT JOIN c1 c ON c.doc_id = v.doc_id),
          c2 AS (SELECT e.dst AS doc_id, sum(r.rq // d.dg) AS inm
            FROM sym e JOIN r1 r ON r.doc_id = e.src
            JOIN deg d ON d.src = e.src GROUP BY 1),
          r2 AS (SELECT v.doc_id,
            (CASE WHEN s.doc_id IS NOT NULL
               THEN CAST(3000000000000 AS HUGEINT) // (n * 20) ELSE 0 END)
              + (17 * coalesce(c.inm, 0)) // 20 AS rq
            FROM documents v LEFT JOIN seeds s USING (doc_id) CROSS JOIN ns
            LEFT JOIN c2 c ON c.doc_id = v.doc_id)
          SELECT doc_id, CAST(rq AS BIGINT) AS rank_q,
            CAST(rq AS DOUBLE) / 1000000000000.0 AS score
          FROM r2 ORDER BY rank_q DESC, doc_id ASC LIMIT 25""",

    "q_pagerank" ->
      s"""WITH $duckSnmCandCte,
          sym AS (SELECT id_a AS src, id_b AS dst FROM cand
            WHERE id_a <> id_b
            UNION SELECT id_b, id_a FROM cand WHERE id_a <> id_b),
          deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM sym
            GROUP BY 1),
          ns AS (SELECT count(*) AS n FROM documents),
          r0 AS (SELECT d.doc_id,
            CAST(1000000000000 AS HUGEINT) // n AS rq
            FROM documents d CROSS JOIN ns),
          c1 AS (SELECT e.dst AS doc_id, sum(r.rq // d.dg) AS inm
            FROM sym e JOIN r0 r ON r.doc_id = e.src
            JOIN deg d ON d.src = e.src GROUP BY 1),
          r1 AS (SELECT v.doc_id,
            CAST(3000000000000 AS HUGEINT) // (n * 20)
              + (17 * coalesce(c.inm, 0)) // 20 AS rq
            FROM documents v CROSS JOIN ns
            LEFT JOIN c1 c ON c.doc_id = v.doc_id),
          c2 AS (SELECT e.dst AS doc_id, sum(r.rq // d.dg) AS inm
            FROM sym e JOIN r1 r ON r.doc_id = e.src
            JOIN deg d ON d.src = e.src GROUP BY 1),
          r2 AS (SELECT v.doc_id,
            CAST(3000000000000 AS HUGEINT) // (n * 20)
              + (17 * coalesce(c.inm, 0)) // 20 AS rq
            FROM documents v CROSS JOIN ns
            LEFT JOIN c2 c ON c.doc_id = v.doc_id)
          SELECT doc_id, CAST(rq AS BIGINT) AS rank_q,
            CAST(rq AS DOUBLE) / 1000000000000.0 AS score
          FROM r2 ORDER BY rank_q DESC, doc_id ASC LIMIT 25""",

    // The oracle enumerates triangles canonically (a < b < c over the
    // undirected edge set) — orientation-free, so it matches whatever
    // enumeration order the Spark side's degree orientation uses.
    "q_hits" ->
      s"""WITH ed AS MATERIALIZED (SELECT DISTINCT doc_id AS doc, word AS tok
            FROM (SELECT doc_id, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(word, '^[a-z]+$$')),
          h0 AS (SELECT DISTINCT doc, CAST(1000000 AS BIGINT) AS h FROM ed),
          ar1 AS (SELECT tok, sum(h) AS ar FROM ed JOIN h0 USING (doc)
            GROUP BY 1),
          am1 AS (SELECT max(ar) AS am FROM ar1),
          a1 AS MATERIALIZED (SELECT tok,
            CAST((CAST(ar AS HUGEINT) * 1000000) // am AS BIGINT) AS a
            FROM ar1, am1),
          hr1 AS (SELECT doc, sum(a) AS hr FROM ed JOIN a1 USING (tok)
            GROUP BY 1),
          hm1 AS (SELECT max(hr) AS hm FROM hr1),
          h1 AS MATERIALIZED (SELECT doc,
            CAST((CAST(hr AS HUGEINT) * 1000000) // hm AS BIGINT) AS h
            FROM hr1, hm1),
          ar2 AS (SELECT tok, sum(h) AS ar FROM ed JOIN h1 USING (doc)
            GROUP BY 1),
          am2 AS (SELECT max(ar) AS am FROM ar2),
          a2 AS (SELECT tok,
            CAST((CAST(ar AS HUGEINT) * 1000000) // am AS BIGINT) AS a
            FROM ar2, am2)
          SELECT tok AS token, a AS auth_q FROM a2
          ORDER BY auth_q DESC, token LIMIT 20""",

    "q_triangles" ->
      s"""WITH $duckSnmCandCte,
          es AS (SELECT DISTINCT least(id_a, id_b) AS a,
              greatest(id_a, id_b) AS b FROM cand WHERE id_a <> id_b),
          tri AS (SELECT x.a, x.b, y.b AS c
            FROM es x JOIN es y ON y.a = x.b
            JOIN es z ON z.a = x.a AND z.b = y.b),
          pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
              SELECT a AS v FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
            GROUP BY 1)
          SELECT d.doc_id, CAST(coalesce(pv.t, 0) AS BIGINT) AS n_triangles
          FROM documents d LEFT JOIN pv ON pv.v = d.doc_id
          ORDER BY d.doc_id""",

    "q_clustering_coef" ->
      s"""WITH $duckSnmCandCte,
          es AS (SELECT DISTINCT least(id_a, id_b) AS a,
              greatest(id_a, id_b) AS b FROM cand WHERE id_a <> id_b),
          tri AS (SELECT x.a, x.b, y.b AS c
            FROM es x JOIN es y ON y.a = x.b
            JOIN es z ON z.a = x.a AND z.b = y.b),
          pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
              SELECT a AS v FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
            GROUP BY 1),
          dg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
              SELECT a AS v FROM es UNION ALL SELECT b FROM es)
            GROUP BY 1)
          SELECT d.doc_id,
            CAST(coalesce(dg.deg, 0) AS BIGINT) AS degree,
            CAST(coalesce(pv.t, 0) AS BIGINT) AS n_triangles,
            CASE WHEN coalesce(dg.deg, 0) < 2 THEN NULL
              ELSE ${duckPpm("2 * coalesce(pv.t, 0)",
                "dg.deg * (dg.deg - 1)")}
            END AS cc_ppm
          FROM documents d LEFT JOIN pv ON pv.v = d.doc_id
          LEFT JOIN dg ON dg.v = d.doc_id
          ORDER BY d.doc_id""",

    "q_common_neighbors" ->
      s"""WITH $duckSnmCandCte,
          es AS (SELECT DISTINCT least(id_a, id_b) AS a,
              greatest(id_a, id_b) AS b FROM cand WHERE id_a <> id_b),
          sym AS (SELECT a AS z, b AS n FROM es
            UNION ALL SELECT b, a FROM es),
          deg AS (SELECT z, count(*) AS d FROM sym GROUP BY 1),
          ctr AS (SELECT s.z, s.n FROM sym s
            JOIN deg ON deg.z = s.z AND deg.d <= 10000),
          cn AS (SELECT x.n AS id_a, y.n AS id_b,
              CAST(count(*) AS BIGINT) AS n_common
            FROM ctr x JOIN ctr y ON y.z = x.z AND x.n < y.n
            GROUP BY 1, 2 HAVING count(*) >= 2)
          SELECT cn.id_a, cn.id_b, cn.n_common
          FROM cn ANTI JOIN es ON es.a = cn.id_a AND es.b = cn.id_b
          ORDER BY cn.id_a, cn.id_b""",

    "q_adamic_adar" ->
      s"""WITH $duckSnmCandCte,
          es AS (SELECT DISTINCT least(id_a, id_b) AS a,
              greatest(id_a, id_b) AS b FROM cand WHERE id_a <> id_b),
          sym AS (SELECT a AS z, b AS n FROM es
            UNION ALL SELECT b, a FROM es),
          deg AS (SELECT z, CAST(count(*) AS BIGINT) AS d
            FROM sym GROUP BY 1),
          lx AS (SELECT DISTINCT d AS x FROM deg
            WHERE d >= 2 AND d <= 10000),
          $duckLog2Chain,
          disc AS (SELECT deg.z, CAST(4294967296 // lgt.lq AS BIGINT) AS w
            FROM deg JOIN lgt ON lgt.x = deg.d),
          ctr AS (SELECT s.z, s.n, disc.w FROM sym s
            JOIN disc ON disc.z = s.z),
          cn AS (SELECT x.n AS id_a, y.n AS id_b,
              CAST(count(*) AS BIGINT) AS n_common,
              CAST(sum(x.w) AS BIGINT) AS aa_q
            FROM ctr x JOIN ctr y ON y.z = x.z AND x.n < y.n
            GROUP BY 1, 2 HAVING count(*) >= 2)
          SELECT cn.id_a, cn.id_b, cn.n_common, cn.aa_q,
            round(CAST(cn.aa_q AS DOUBLE) / 65536.0, 6) AS aa
          FROM cn ANTI JOIN es ON es.a = cn.id_a AND es.b = cn.id_b
          ORDER BY cn.id_a, cn.id_b""",

    "q_minhash_sig" -> {
      val perms = (0 until numMinhashes)
        .map(j => s"(${j}, ${Dedup.permA(j)}, ${Dedup.permB(j)})").mkString(", ")
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          sh0 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tk),
          sh AS (SELECT DISTINCT doc_id, gram FROM sh0),
          ids AS (SELECT doc_id, ${duckPolyId("gram")} AS tid FROM sh),
          perms AS (SELECT * FROM (VALUES $perms) p(j, a, b))
          SELECT doc_id, CAST(j AS BIGINT) AS j,
            min((tid * a + b) % ${Dedup.MersennePrime}) AS mh
          FROM ids CROSS JOIN perms
          GROUP BY doc_id, j ORDER BY doc_id, j"""
    },

    "q_minhash_lsh" ->
      s"""WITH $duckLshPairsCte
          SELECT id_a AS doc_a, id_b AS doc_b FROM lsh_pairs
          ORDER BY doc_a, doc_b""",

    "q_minhash_calib" ->
      s"""WITH $duckLshPairsCte,
          est AS (SELECT p.id_a, p.id_b,
            CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
              AS k_match
            FROM lsh_pairs p
            JOIN sig a ON a.doc_id = p.id_a
            JOIN sig b ON b.doc_id = p.id_b AND b.j = a.j
            GROUP BY 1, 2),
          sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS z FROM ids
            GROUP BY 1),
          iv AS (SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS ni
            FROM lsh_pairs p
            JOIN ids a ON a.doc_id = p.id_a
            JOIN ids b ON b.doc_id = p.id_b AND b.tid = a.tid
            GROUP BY 1, 2),
          f AS (SELECT e.id_a, e.id_b, e.k_match,
            coalesce(iv.ni, 0) AS n_inter,
            za.z + zb.z - coalesce(iv.ni, 0) AS n_union
            FROM est e LEFT JOIN iv USING (id_a, id_b)
            JOIN sz za ON za.doc_id = e.id_a
            JOIN sz zb ON zb.doc_id = e.id_b),
          g AS (SELECT id_a, id_b, k_match,
            CAST(n_inter AS BIGINT) AS n_inter,
            CAST(n_union AS BIGINT) AS n_union,
            ${duckPpm("k_match", numMinhashes.toString)} AS est_ppm,
            CASE WHEN n_union = 0 THEN NULL
              ELSE ${duckPpm("n_inter", "n_union")} END AS exact_ppm
            FROM f)
          SELECT id_a, id_b, k_match, n_inter, n_union, est_ppm,
            exact_ppm, CAST(est_ppm - exact_ppm AS BIGINT) AS err_ppm
          FROM g ORDER BY id_a, id_b""",

    "q_neardup_cluster" ->
      s"""WITH RECURSIVE $duckLshPairsCte,
          $duckCcCompCte,
          csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                     FROM comp GROUP BY component)
          SELECT c.doc_id, c.component, z.csize,
                 (c.doc_id = c.component) AS is_rep
          FROM comp c JOIN csizes z USING (component)
          ORDER BY c.doc_id""",

    "q_canonical_docs" ->
      s"""WITH RECURSIVE $duckLshPairsCte,
          $duckCcCompCte,
          csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                     FROM comp GROUP BY component),
          toks AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
            FROM documents),
          rk AS (SELECT c.doc_id, c.component, z.csize, t.n_tokens,
            row_number() OVER (PARTITION BY c.component
              ORDER BY t.n_tokens DESC, c.doc_id) AS rn
            FROM comp c JOIN csizes z USING (component)
            JOIN toks t USING (doc_id))
          SELECT doc_id, component, csize, n_tokens, (rn = 1) AS keep
          FROM rk ORDER BY doc_id""",

    "q_quality_rules" -> {
      val hits = duckMarkerHits(stopwords)
      s"""WITH t AS (SELECT doc_id, text, ${duckToks("text")} AS tk FROM documents),
          g AS (SELECT doc_id, text, tk,
            CASE WHEN len(tk) >= 3
              THEN list_transform(range(1, len(tk) - 1),
                i -> array_to_string(tk[i:i+2], ' '))
              ELSE [] END AS grams FROM t),
          sig AS (SELECT doc_id,
            CAST(len(tk) AS BIGINT) AS n_tokens,
            CASE WHEN len(tk) > 0 THEN
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(tk, x -> CAST(length(x) AS BIGINT))),
                (acc, x) -> acc + x) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
              ELSE 0.0 END AS avg_tok_len,
            CASE WHEN len(tk) > 0 THEN CAST($hits AS DOUBLE) / CAST(len(tk) AS DOUBLE)
                 ELSE 0.0 END AS stop_ratio,
            CASE WHEN length(text) > 0 THEN
              CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
            CASE WHEN len(grams) > 0 THEN
              1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
              ELSE 0.0 END AS rep3
          FROM g)
          SELECT doc_id, n_tokens, avg_tok_len, stop_ratio, punct_ratio, rep3,
            (n_tokens BETWEEN 10 AND 100000 AND avg_tok_len BETWEEN 2.0 AND 12.0
             AND stop_ratio <= 0.6 AND punct_ratio <= 0.2 AND rep3 <= 0.3) AS keep
          FROM sig ORDER BY doc_id"""
    },

    "q_pii_redact" -> {
      val email = Quality.EmailRe
      val ip = Quality.Ipv4Re
      val phone = Quality.PhoneRe
      s"""WITH dirty AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN
            text || ' contact user' || doc_id::VARCHAR || '@example.com or +1415555' ||
            lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
            ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7'
            ELSE text END AS t FROM documents)
          SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(t,
              '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
              '$phone', '<PHONE>', 'g') AS clean_text,
            CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
            CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones
          FROM dirty ORDER BY doc_id"""
    },

    "q_url_parse" -> {
      val re = "^([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)"
      s"""WITH u AS (SELECT doc_id,
            'https://' || source || '.example.com/d/' || doc_id::VARCHAR ||
            CASE WHEN doc_id % 2 = 0 THEN '?lang=' || lang ELSE '' END AS url
          FROM documents),
          p AS (SELECT doc_id,
            regexp_extract(url, '$re', 1) AS scheme,
            regexp_extract(url, '$re', 2) AS host,
            regexp_extract(url, '$re', 3) AS path,
            regexp_extract(url, '$re', 4) AS query
          FROM u),
          hp AS (SELECT *, string_split(host, '.') AS parts FROM p)
          SELECT doc_id, scheme, host, path, query,
            CASE WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
                 ELSE host END AS domain
          FROM hp ORDER BY doc_id"""
    },

    "q_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(tk) AS term
            FROM (SELECT doc_id, ${duckToks("text")} AS tk FROM documents)),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM toks GROUP BY 1, 2),
          dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          sc AS (SELECT doc_id, term, tf, df,
            CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf
            FROM tf JOIN dfq USING (term) CROSS JOIN n),
          r AS (SELECT *, row_number() OVER
            (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS term_rank
            FROM sc)
          SELECT doc_id, term, tf, df, tfidf, CAST(term_rank AS BIGINT) AS term_rank
          FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""",

    "q_feature_hash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${duckToks("text")}) AS tok
            FROM documents),
          h AS (SELECT doc_id, ${duckPolyId("tok")} AS tid FROM toks),
          f AS (SELECT doc_id, tid % 1024 AS dim,
            CASE WHEN ((tid // 1024) % 2) = 0 THEN 1 ELSE -1 END AS sgn
            FROM h),
          v AS (SELECT doc_id, CAST(dim AS BIGINT) AS dim,
            CAST(sum(sgn) AS BIGINT) AS val FROM f GROUP BY 1, 2)
          SELECT doc_id, dim, val FROM v WHERE val <> 0
          ORDER BY doc_id, dim""",

    "q_bpe_merges" -> {
      s"""WITH $duckBpeChain
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS round, sym_a, sym_b, pair_count FROM t1
            UNION ALL
            SELECT CAST(2 AS BIGINT) AS round, sym_a, sym_b, pair_count FROM t2
            UNION ALL
            SELECT CAST(3 AS BIGINT) AS round, sym_a, sym_b, pair_count FROM t3)
          ORDER BY round"""
    },

    "q_bpe_fertility" -> {
      s"""WITH $duckBpeChain
          SELECT CAST(len(list_filter(string_split(rep, '  '),
              x -> x != '')) AS BIGINT) AS n_syms,
            CAST(count(*) AS BIGINT) AS n_types,
            CAST(sum(wc) AS BIGINT) AS total_wc
          FROM r3 GROUP BY 1 ORDER BY 1"""
    },

    "q_bpe_encode" -> {
      val rep = s"""'  ' || array_to_string(list_filter(string_split(w, ''),
          c -> c != ''), '  ') || '  '"""
      val chain = s"""replace(replace(replace($rep,
          ' ' || t1.sym_a || '  ' || t1.sym_b || ' ',
          ' ' || t1.sym_a || t1.sym_b || ' '),
          ' ' || t2.sym_a || '  ' || t2.sym_b || ' ',
          ' ' || t2.sym_a || t2.sym_b || ' '),
          ' ' || t3.sym_a || '  ' || t3.sym_b || ' ',
          ' ' || t3.sym_a || t3.sym_b || ' ')"""
      s"""WITH $duckBpeChain,
          enc AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          seg AS (SELECT doc_id, tk,
            flatten(list_transform(tk, w ->
              list_filter(string_split($chain, '  '), s -> s != ''))) AS sub
            FROM enc CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3)
          SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words,
            CAST(len(sub) AS BIGINT) AS n_subwords,
            array_to_string(sub, ' ') AS subword_text
          FROM seg ORDER BY doc_id"""
    },

    "q_token_gini" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          g AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY 1, 2),
          s AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS ss,
            CAST(sum(c) AS BIGINT) AS n FROM g GROUP BY 1)
          SELECT t.doc_id, coalesce(n, 0) AS n_tokens,
            CASE WHEN n IS NULL OR n = 0 THEN CAST(0 AS DOUBLE)
                 ELSE CAST(1 AS DOUBLE)
                      - CAST(ss AS DOUBLE) / CAST(n * n AS DOUBLE) END
              AS gini
          FROM t LEFT JOIN s USING (doc_id) ORDER BY doc_id""",

    "q_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, ${duckPolyId("text")} AS fp FROM documents),
          nsrc AS (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t
            FROM documents WHERE doc_id % 13 != 0
            UNION ALL SELECT doc_id + 100000 AS doc_id, 'new ' || text AS t
            FROM documents WHERE doc_id < 20),
          n AS (SELECT doc_id, ${duckPolyId("t")} AS fp FROM nsrc),
          j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
            CASE WHEN o.doc_id IS NULL THEN 'added'
                 WHEN n.doc_id IS NULL THEN 'removed'
                 WHEN o.fp != n.fp THEN 'changed' END AS change
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
          SELECT doc_id, change FROM j WHERE change IS NOT NULL
          ORDER BY doc_id, change""",

    "q_outlier_docs" ->
      s"""WITH t AS (SELECT doc_id, source,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
            FROM documents),
          m AS (SELECT source, median(n_tokens) AS med FROM t GROUP BY 1),
          d AS (SELECT t.*, med,
            abs(CAST(n_tokens AS DOUBLE) - med) AS adev
            FROM t JOIN m USING (source)),
          md AS (SELECT source, median(adev) AS mad FROM d GROUP BY 1)
          SELECT doc_id, source, n_tokens, med, mad,
            adev > 3.0 * mad AS is_outlier
          FROM d JOIN md USING (source) ORDER BY doc_id""",

    "q_source_overlap_mh" -> {
      val perms = (0 until 64)
        .map(j => s"(${j}, ${Dedup.permA(j)}, ${Dedup.permB(j)})")
        .mkString(", ")
      s"""WITH tk AS (SELECT source, ${duckToks("text")} AS tk FROM documents),
          sh0 AS (SELECT source, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tk),
          ids AS (SELECT source, ${duckPolyId("gram")} AS tid FROM sh0),
          perms AS (SELECT * FROM (VALUES $perms) p(j, a, b)),
          sig AS (SELECT source, j,
            min((tid * a + b) % ${Dedup.MersennePrime}) AS mh
            FROM ids CROSS JOIN perms GROUP BY source, j),
          est AS (SELECT a.source AS src_a, b.source AS src_b,
            CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
              AS matching_mins
            FROM sig a JOIN sig b USING (j) WHERE a.source < b.source
            GROUP BY 1, 2),
          sh AS (SELECT DISTINCT source, ${duckPolyId("gram")} AS tid
            FROM sh0),
          sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh
            GROUP BY 1),
          keep AS (SELECT tid FROM sh GROUP BY tid HAVING count(*) <= 1000),
          c AS (SELECT sh.* FROM sh SEMI JOIN keep USING (tid)),
          p AS (SELECT a.source AS src_a, b.source AS src_b,
            CAST(count(*) AS BIGINT) AS shared_grams
            FROM c a JOIN c b USING (tid) WHERE a.source < b.source
            GROUP BY 1, 2),
          m AS (SELECT a.source AS src_a, b.source AS src_b,
            a.sz AS n_a, b.sz AS n_b
            FROM sz a, sz b WHERE a.source < b.source),
          ex AS (SELECT src_a, src_b,
            CAST(coalesce(shared_grams, 0) AS DOUBLE) /
              CAST(n_a + n_b - coalesce(shared_grams, 0) AS DOUBLE)
              AS jaccard
            FROM m LEFT JOIN p USING (src_a, src_b))
          SELECT src_a, src_b, matching_mins,
            CAST(matching_mins AS DOUBLE) / 64.0 AS jaccard_est,
            jaccard,
            abs(CAST(matching_mins AS DOUBLE) / 64.0 - jaccard) AS abs_err
          FROM est JOIN ex USING (src_a, src_b)
          ORDER BY src_a, src_b"""
    },

    "q_burrows_delta" ->
      s"""WITH cnt AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT source, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1, 2),
          ng AS (SELECT source, CAST(sum(c) AS BIGINT) AS ntok
            FROM cnt GROUP BY 1),
          topw AS (SELECT word FROM (SELECT word, sum(c) AS tot
            FROM cnt GROUP BY 1 ORDER BY tot DESC, word ASC LIMIT 50)),
          consts AS (SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM ng) AS gcnt,
            (SELECT CAST(count(*) AS BIGINT) FROM topw) AS kw),
          grid AS (SELECT ng.source, w.word,
            ${duckPpm("coalesce(c.c, CAST(0 AS BIGINT))", "ng.ntok")} AS f
            FROM ng CROSS JOIN topw w
            LEFT JOIN cnt c ON c.source = ng.source AND c.word = w.word),
          mu0 AS (SELECT word, CAST(sum(f) AS BIGINT) AS sf
            FROM grid GROUP BY 1),
          mu AS (SELECT word, ${duckPpm("sf", "gcnt", 1)} AS mean_f
            FROM mu0 CROSS JOIN consts),
          sd0 AS (SELECT g.word, CAST(sum(
            CAST(g.f - m.mean_f AS HUGEINT) * (g.f - m.mean_f))
              AS HUGEINT) AS ssd
            FROM grid g JOIN mu m USING (word) GROUP BY 1),
          vr AS (SELECT word, ${duckPpm("ssd", "gcnt", 1)} AS v
            FROM sd0 CROSS JOIN consts),
          sg0 AS (SELECT vr.word, mu.mean_f, v,
            CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS s0
            FROM vr JOIN mu USING (word)),
          sg1 AS (SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= v
            THEN s0 + 1 ELSE s0 END AS s1 FROM sg0),
          sg AS (SELECT word, mean_f,
            CASE WHEN s1 * s1 > v THEN s1 - 1 ELSE s1 END AS sig
            FROM sg1),
          z AS (SELECT g.word, g.source,
            CASE WHEN s.sig = 0 THEN CAST(0 AS BIGINT)
              ELSE ${duckPpm("g.f - s.mean_f", "s.sig", 1000)} END AS z
            FROM grid g JOIN sg s USING (word)),
          pr AS (SELECT a.source AS source_a, b.source AS source_b,
            CAST(sum(abs(a.z - b.z)) AS BIGINT) AS sd
            FROM z a JOIN z b ON b.word = a.word AND a.source < b.source
            GROUP BY 1, 2)
          SELECT source_a, source_b, consts.kw AS n_words,
            ${duckPpm("pr.sd", "consts.kw", 1)} AS delta_milli
          FROM pr CROSS JOIN consts ORDER BY source_a, source_b""",

    "q_source_overlap" ->
      s"""WITH tk AS (SELECT source, ${duckToks("text")} AS tk FROM documents),
          sh0 AS (SELECT source, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tk),
          sh AS (SELECT DISTINCT source, ${duckPolyId("gram")} AS tid
            FROM sh0),
          sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh
            GROUP BY 1),
          keep AS (SELECT tid FROM sh GROUP BY tid HAVING count(*) <= 1000),
          c AS (SELECT sh.* FROM sh SEMI JOIN keep USING (tid)),
          p AS (SELECT a.source AS src_a, b.source AS src_b,
            CAST(count(*) AS BIGINT) AS shared_grams
            FROM c a JOIN c b USING (tid) WHERE a.source < b.source
            GROUP BY 1, 2),
          m AS (SELECT a.source AS src_a, b.source AS src_b,
            a.sz AS n_a, b.sz AS n_b
            FROM sz a, sz b WHERE a.source < b.source)
          SELECT src_a, src_b, n_a, n_b,
            CAST(coalesce(shared_grams, 0) AS BIGINT) AS shared_grams,
            CAST(coalesce(shared_grams, 0) AS DOUBLE) /
              CAST(n_a + n_b - coalesce(shared_grams, 0) AS DOUBLE) AS jaccard
          FROM m LEFT JOIN p USING (src_a, src_b)
          ORDER BY src_a, src_b""",

    "q_group_quantiles" ->
      s"""WITH t AS (SELECT source,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
            FROM documents),
          r AS (SELECT source, n_tokens,
            row_number() OVER (PARTITION BY source ORDER BY n_tokens) AS rn,
            count(*) OVER (PARTITION BY source) AS n FROM t),
          qs AS (SELECT CAST(unnest([2500, 5000, 9900]) AS BIGINT) AS q_bps)
          SELECT source, q_bps, n_tokens AS value
          FROM r CROSS JOIN qs
          WHERE rn = greatest(1, (n * q_bps + 9999) // 10000)
          ORDER BY source, q_bps""",

    "q_span_dedup" -> (duckSpanCte(8) +
      s"""SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
            CAST(max(pos) + 8 AS BIGINT) AS span_end,
            CAST(count(*) AS BIGINT) AS n_grams
          FROM sid GROUP BY doc_id, span_id ORDER BY doc_id, span_start"""),

    "q_span_stats" -> (duckSpanCte(8) +
      s""", spans AS (SELECT doc_id, min(pos) AS span_start,
            max(pos) + 8 AS span_end FROM sid GROUP BY doc_id, span_id),
          agg AS (SELECT doc_id,
            CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens,
            CAST(count(*) AS BIGINT) AS n_spans FROM spans GROUP BY 1),
          lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM tk)
          SELECT doc_id, n_tokens,
            coalesce(dup_tokens, 0) AS dup_tokens,
            coalesce(n_spans, 0) AS n_spans,
            CASE WHEN n_tokens = 0 THEN CAST(1 AS DOUBLE)
                 ELSE CAST(n_tokens - coalesce(dup_tokens, 0) AS DOUBLE)
                      / CAST(n_tokens AS DOUBLE) END AS keep_ratio
          FROM lens LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""),

    "q_gopher_lines" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          ls0 AS (SELECT doc_id, ${duckLines(10)} AS ls FROM tk),
          ls AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 AND len(ls) >= 2
            THEN list_concat(ls, ls[1:2]) ELSE ls END AS ls FROM ls0),
          m AS (SELECT doc_id, len(ls) AS n, len(list_distinct(ls)) AS nd,
            CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
              AS BIGINT) AS tc,
            CAST(coalesce(list_sum(list_transform(list_distinct(ls),
              x -> length(x))), 0) AS BIGINT) AS dc
            FROM ls)
          SELECT doc_id, CAST(n AS BIGINT) AS n_lines,
            CAST(n - nd AS BIGINT) AS dup_lines,
            CASE WHEN n > 0 THEN CAST(n - nd AS DOUBLE) / CAST(n AS DOUBLE)
                 ELSE CAST(0 AS DOUBLE) END AS dup_line_frac,
            CASE WHEN tc > 0 THEN CAST(tc - dc AS DOUBLE) / CAST(tc AS DOUBLE)
                 ELSE CAST(0 AS DOUBLE) END AS dup_char_frac
          FROM m ORDER BY doc_id""",

    "q_gopher_ngrams" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          g2 AS (SELECT doc_id, 2 AS n, unnest(list_transform(
              range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' ')))
              AS gram FROM tk),
          g3 AS (SELECT doc_id, 3 AS n, unnest(list_transform(
              range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))
              AS gram FROM tk),
          g AS (SELECT * FROM g2 UNION ALL SELECT * FROM g3),
          c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
          mass AS (SELECT doc_id, n,
            CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END AS mass FROM c),
          p AS (SELECT doc_id,
            max(CASE WHEN n = 2 THEN mass ELSE 0 END) AS top2_mass,
            sum(CASE WHEN n = 3 THEN mass ELSE 0 END) AS dup3_mass
            FROM mass GROUP BY 1),
          dd AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
            FROM documents)
          SELECT dd.doc_id, n_chars,
            CAST(coalesce(top2_mass, 0) AS BIGINT) AS top2_mass,
            CAST(coalesce(dup3_mass, 0) AS BIGINT) AS dup3_mass,
            CASE WHEN n_chars > 0 THEN CAST(coalesce(top2_mass, 0) AS DOUBLE)
                / CAST(n_chars AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
              AS top2_frac,
            CASE WHEN n_chars > 0 THEN CAST(coalesce(dup3_mass, 0) AS DOUBLE)
                / CAST(n_chars AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
              AS dup3_frac
          FROM dd LEFT JOIN p USING (doc_id) ORDER BY doc_id""",

    "q_line_dedup" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          lns AS (SELECT doc_id, ${duckLines(10)} AS ls FROM tk),
          l AS (SELECT doc_id, unnest(range(0, len(ls))) AS line_no,
            unnest(ls) AS line FROM lns WHERE len(ls) > 0),
          h AS (SELECT doc_id, line_no, line, ${duckPolyId("line")} AS lh,
            doc_id * 1048576 + line_no AS ord FROM l),
          k AS (SELECT lh, min(ord) AS keep FROM h GROUP BY 1),
          kept AS (SELECT h.* FROM h JOIN k
            ON h.lh = k.lh AND h.ord = k.keep),
          ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_lines,
            string_agg(line, ' ' ORDER BY line_no) AS clean_text
            FROM kept GROUP BY 1),
          n AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines FROM lns)
          SELECT n.doc_id, n_lines,
            CAST(coalesce(kept_lines, 0) AS BIGINT) AS kept_lines,
            coalesce(clean_text, '') AS clean_text
          FROM n LEFT JOIN ka USING (doc_id) ORDER BY doc_id""",

    "q_textrank" -> {
      // One damped-update round: contributions from `prev`, then
      // base + 17/20 of the incoming mass — all HUGEINT integral ops,
      // mirroring Graph.textRank's decimal(38,0) div chain.
      def round(prev: String, c: String, r: String): String =
        s"""$c AS (SELECT e.dst AS token, sum((p.rank_q * e.w) // o.out_w) AS inm
              FROM edges e JOIN $prev p ON e.src = p.token
              JOIN outw o ON e.src = o.src GROUP BY 1),
            $r AS (SELECT p.token,
              CAST(3000000000000 AS HUGEINT) // (n_nodes * 20)
                + (17 * coalesce(c.inm, 0)) // 20 AS rank_q
              FROM (SELECT token FROM $prev) p
              LEFT JOIN $c c USING (token) CROSS JOIN n)"""
      s"""WITH tk AS (SELECT ${duckToks("text")} AS tk FROM documents),
          pr0 AS (SELECT unnest(tk[1:len(tk)-1]) AS src,
            unnest(tk[2:len(tk)]) AS dst FROM tk WHERE len(tk) >= 2),
          prs AS (SELECT src, dst FROM pr0 WHERE src != dst
            UNION ALL SELECT dst AS src, src AS dst FROM pr0 WHERE src != dst),
          edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
            FROM prs GROUP BY 1, 2),
          outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w
            FROM edges GROUP BY 1),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM outw),
          r0 AS (SELECT src AS token,
            CAST(1000000000000 AS HUGEINT) // n_nodes AS rank_q
            FROM outw CROSS JOIN n),
          ${round("r0", "c1", "r1")},
          ${round("r1", "c2", "r2")}
          SELECT token, CAST(rank_q AS BIGINT) AS rank_q,
            CAST(rank_q AS DOUBLE) / 1000000000000.0 AS score
          FROM r2 ORDER BY rank_q DESC, token ASC LIMIT 25"""
    },

    "q_rake" -> {
      val stops = stopwords.map(t => s"'$t'").mkString(", ")
      s"""WITH tk AS (SELECT doc_id, ${duckToks("lower(text)")} AS tk
            FROM documents),
          tok AS (SELECT doc_id, unnest(tk) AS tok,
            unnest(range(1, len(tk) + 1)) AS pos FROM tk),
          kept AS (SELECT doc_id, pos, tok FROM tok
            WHERE regexp_matches(tok, '^[a-z]+$$')
              AND tok NOT IN ($stops)),
          isl AS (SELECT doc_id, pos, tok,
            pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
              AS grp FROM kept),
          ph AS (SELECT doc_id, grp,
            string_agg(tok, ' ' ORDER BY pos) AS phrase,
            CAST(count(*) AS BIGINT) AS plen
            FROM isl GROUP BY 1, 2),
          php AS (SELECT * FROM ph WHERE plen <= 4),
          pw AS (SELECT doc_id, grp, phrase, plen,
            unnest(string_split(phrase, ' ')) AS w FROM php),
          ws AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
            CAST(sum(plen) AS BIGINT) AS degree FROM pw GROUP BY 1),
          psc AS (SELECT pw.doc_id, pw.grp, pw.phrase,
            CAST(sum(${duckPpm("ws.degree", "ws.freq")}) AS BIGINT)
              AS score_ppm
            FROM pw JOIN ws USING (w) GROUP BY 1, 2, 3),
          fin AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n,
            max(score_ppm) AS score_ppm FROM psc GROUP BY 1)
          SELECT phrase, n, score_ppm FROM fin
          ORDER BY score_ppm DESC, phrase ASC LIMIT 25"""
    },

    "q_bm25" -> (duckBm25Cte +
      s"""SELECT doc_id, n_terms, score_q,
            CAST(score_q AS DOUBLE) / 1000000.0 AS score
          FROM agg ORDER BY score_q DESC, doc_id ASC LIMIT 20"""),

    "q_ql_dirichlet" -> (duckBm25Cte +
      s""", cfq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf
            FROM tf GROUP BY 1),
          lx AS (SELECT DISTINCT x FROM (
            SELECT tf.tf * tot.t_tokens + 64 * cfq.cf AS x
              FROM tf JOIN cfq USING (term) CROSS JOIN tot
            UNION SELECT 64 * cf FROM cfq
            UNION SELECT (lens.dl + 64) * tot.t_tokens
              FROM lens CROSS JOIN tot)),
          $duckLog2Chain,
          pos AS (SELECT tf.doc_id, CAST(count(*) AS BIGINT) AS n_terms,
              CAST(sum(l1.lq - l2.lq) AS BIGINT) AS p
            FROM tf JOIN cfq USING (term) CROSS JOIN tot
            JOIN lgt l1 ON l1.x = tf.tf * tot.t_tokens + 64 * cfq.cf
            JOIN lgt l2 ON l2.x = 64 * cfq.cf
            GROUP BY 1),
          k0 AS (SELECT CAST(sum(lg.lq) AS BIGINT) AS k0,
              CAST(count(*) AS BIGINT) AS nq
            FROM cfq JOIN lgt lg ON lg.x = 64 * cfq.cf),
          scq AS (SELECT lens.doc_id,
              coalesce(pos.n_terms, CAST(0 AS BIGINT)) AS n_terms,
              CAST(coalesce(pos.p, 0) + k0.k0 - k0.nq * ld.lq AS BIGINT)
                AS score_q
            FROM lens CROSS JOIN tot CROSS JOIN k0
            JOIN lgt ld ON ld.x = (lens.dl + 64) * tot.t_tokens
            LEFT JOIN pos ON pos.doc_id = lens.doc_id)
          SELECT doc_id, n_terms, score_q,
            CAST(score_q AS DOUBLE) / 65536.0 AS score
          FROM scq ORDER BY score_q DESC, doc_id ASC LIMIT 20"""),

    "q_exposure_parity" -> (duckBm25Cte +
      s""", top AS (SELECT doc_id, row_number() OVER
            (ORDER BY score_q DESC, doc_id ASC) AS rnk
            FROM (SELECT * FROM agg ORDER BY score_q DESC, doc_id ASC
                  LIMIT 20)),
          ex AS (SELECT d.source,
            CAST(1000000 AS BIGINT) // t.rnk AS e
            FROM top t JOIN documents d USING (doc_id)),
          ge AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ranked,
            CAST(sum(e) AS BIGINT) AS es FROM ex GROUP BY 1),
          tote AS (SELECT CAST(sum(e) AS BIGINT) AS te FROM ex),
          cs AS (SELECT source, CAST(count(*) AS BIGINT) AS nd
            FROM documents GROUP BY 1),
          totd AS (SELECT CAST(count(*) AS BIGINT) AS ndall
            FROM documents),
          fin AS (SELECT cs.source,
            coalesce(ge.n_ranked, CAST(0 AS BIGINT)) AS n_ranked,
            coalesce(ge.es, CAST(0 AS BIGINT)) AS exp_sum_e6,
            ${duckPpm("coalesce(ge.es, CAST(0 AS BIGINT))", "tote.te")}
              AS exp_share_ppm,
            ${duckPpm("cs.nd", "totd.ndall")} AS corpus_share_ppm
            FROM cs LEFT JOIN ge USING (source)
            CROSS JOIN tote CROSS JOIN totd)
          SELECT source, n_ranked, exp_sum_e6, exp_share_ppm,
            corpus_share_ppm,
            exp_share_ppm - corpus_share_ppm AS parity_gap_ppm
          FROM fin ORDER BY source"""),

    "q_prf_expand" -> (duckBm25Cte + {
      val excluded = (bm25Query ++ stopwords).distinct
        .map(t => s"'$t'").mkString(", ")
      s""", fb AS (SELECT doc_id, score_q FROM agg
            ORDER BY score_q DESC, doc_id LIMIT 10),
          ptf AS (SELECT t.term, t.doc_id, fb.score_q,
            CAST(count(*) AS BIGINT) AS tf
            FROM toks t JOIN fb USING (doc_id)
            WHERE regexp_full_match(t.term, '[a-z]+')
              AND t.term NOT IN ($excluded)
            GROUP BY 1, 2, 3),
          w AS (SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CAST(tf AS HUGEINT) * score_q) AS BIGINT) AS w_q
            FROM ptf GROUP BY 1)
          SELECT term, n_docs, w_q FROM w
          ORDER BY w_q DESC, term ASC LIMIT 10"""
    }),

    "q_rrf_fuse" -> (duckBm25Cte +
      s""", ra AS (SELECT doc_id, row_number() OVER
            (ORDER BY score_q DESC, doc_id ASC) AS rnk
            FROM (SELECT * FROM agg ORDER BY score_q DESC, doc_id ASC
                  LIMIT 50)),
          qt AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          qs AS (SELECT doc_id, least(1.0,
              CAST(len(tk) AS DOUBLE) / 50.0) *
              (1.0 - abs(CASE WHEN len(tk) > 0
                 THEN CAST(${duckMarkerHits(stopwords)} AS DOUBLE)
                      / CAST(len(tk) AS DOUBLE)
                 ELSE 0.0 END - 0.2)) AS quality FROM qt),
          rb AS (SELECT doc_id, row_number() OVER
            (ORDER BY quality DESC, doc_id ASC) AS rnk
            FROM (SELECT * FROM qs ORDER BY quality DESC, doc_id ASC
                  LIMIT 50)),
          u AS (SELECT doc_id,
              CAST(1000000000 AS BIGINT) // (60 + rnk) AS c FROM ra
            UNION ALL SELECT doc_id,
              CAST(1000000000 AS BIGINT) // (60 + rnk) AS c FROM rb),
          f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
            CAST(sum(c) AS BIGINT) AS rrf_q FROM u GROUP BY 1)
          SELECT doc_id, n_lists, rrf_q,
            CAST(rrf_q AS DOUBLE) / 1000000000.0 AS rrf
          FROM f ORDER BY rrf_q DESC, doc_id ASC LIMIT 20"""),

    "q_stratified_sample" ->
      s"""WITH b AS (SELECT doc_id, lang, source, $duckBucket AS bkt FROM documents),
          r AS (SELECT doc_id, lang, source, row_number() OVER
            (PARTITION BY lang, source ORDER BY bkt, doc_id) AS rn FROM b)
          SELECT doc_id, lang, source FROM r WHERE rn <= 5 ORDER BY doc_id""",

    "q_mix_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens,
            $duckBucket AS bkt FROM documents),
          b AS (SELECT * FROM (VALUES ('src0', 2000), ('src1', 1000),
            ('src5', 500)) b(source, budget)),
          c AS (SELECT doc_id, t.source, n_tokens, budget,
            SUM(n_tokens) OVER (PARTITION BY t.source ORDER BY bkt, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t JOIN b USING (source))
          SELECT doc_id, source, n_tokens FROM c
          WHERE cum - n_tokens < budget ORDER BY doc_id""",

    "q_mix_hhi" ->
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(c * c) AS BIGINT) AS sumsq,
           CAST(max(c) AS BIGINT) AS maxc FROM c GROUP BY 1)
         SELECT source, n_rows, n_parts,
           round(CAST(maxc AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
             AS dom_share,
           round(CAST(sumsq AS DOUBLE) / CAST(n_rows * n_rows AS DOUBLE), 6)
             AS hhi
         FROM g ORDER BY source""",

    "q_temp_mix" ->
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
            FROM documents),
          g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
          w AS (SELECT lang, n_docs, n_tokens,
            CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)
              AS weight FROM g),
          tot AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w)
          SELECT lang, n_docs, n_tokens, weight,
            round(CAST(weight AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
          FROM w, tot ORDER BY lang""",

    "q_unimax" ->
      s"""WITH g AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang),
          f AS (SELECT lang, n_tokens, n_tokens * 1 AS cap,
            CAST(row_number() OVER w AS BIGINT) AS i,
            COALESCE(CAST(SUM(n_tokens * 1) OVER (ORDER BY n_tokens * 1, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
              0) AS bef,
            CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM g WINDOW w AS (ORDER BY n_tokens * 1, lang)),
          ff AS (SELECT *, CAST(cap AS HUGEINT) * (n - i + 1) <=
            CAST(120000 - bef AS HUGEINT) AS capped FROM f),
          t AS (SELECT
            CAST(sum(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS csum,
            CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT) AS u
            FROM ff)
          SELECT lang, n_tokens, cap,
            CAST(CASE WHEN capped THEN cap ELSE
              (120000 - csum) // NULLIF(u, 0) +
                (CASE WHEN i - (n - u) <= (120000 - csum) % NULLIF(u, 0)
                 THEN 1 ELSE 0 END) END AS BIGINT) AS alloc,
            round(CAST(CASE WHEN capped THEN cap ELSE
              (120000 - csum) // NULLIF(u, 0) +
                (CASE WHEN i - (n - u) <= (120000 - csum) % NULLIF(u, 0)
                 THEN 1 ELSE 0 END) END AS DOUBLE)
              / CAST(n_tokens AS DOUBLE), 6) AS epochs
          FROM ff, t ORDER BY lang""",

    "q_unigram_tv" ->
      s"""WITH tk AS (SELECT lang AS g, unnest(${duckToks("text")}) AS tok
            FROM documents),
          c AS (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY g, tok),
          t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY g),
          ov AS (SELECT a.g AS g_a, b.g AS g_b,
            CAST(count(*) AS BIGINT) AS shared_vocab,
            sum(least(CAST(a.c AS HUGEINT) * tb2.n,
                      CAST(b.c AS HUGEINT) * ta2.n)) AS minsum
            FROM c a JOIN c b USING (tok)
            JOIN t ta2 ON ta2.g = a.g JOIN t tb2 ON tb2.g = b.g
            WHERE a.g < b.g GROUP BY 1, 2),
          p AS (SELECT ta.g AS g_a, tb.g AS g_b, ta.n AS n_a, tb.n AS n_b
            FROM t ta, t tb WHERE ta.g < tb.g)
          SELECT g_a, g_b, n_a, n_b,
            COALESCE(shared_vocab, 0) AS shared_vocab,
            round(1.0 - CAST(COALESCE(minsum, 0) AS DOUBLE) /
              (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS tv
          FROM p LEFT JOIN ov USING (g_a, g_b) ORDER BY g_a, g_b""",

    "q_source_entropy" ->
      s"""WITH tk AS (SELECT source AS g, unnest(${duckToks("text")}) AS tok
            FROM documents),
          c AS MATERIALIZED (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
          t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS vocab FROM c GROUP BY 1),
          lx AS (SELECT DISTINCT x FROM (
            SELECT c AS x FROM c UNION SELECT n FROM t)),
          $duckLog2Chain,
          h AS (SELECT c.g, sum(c.c * (lt.lq - lc.lq)) AS hnum
            FROM c JOIN t ON t.g = c.g
            JOIN lgt lt ON lt.x = t.n
            JOIN lgt lc ON lc.x = c.c
            GROUP BY 1)
          SELECT t.g AS source, t.vocab, t.n AS n_tokens,
            CAST(h.hnum AS BIGINT) AS h_num,
            ${duckPpm("h.hnum", "t.n * 65536")} AS h_ubits
          FROM t JOIN h ON h.g = t.g ORDER BY source""",

    "q_unigram_kl" ->
      s"""WITH tk AS (SELECT lang AS g, unnest(${duckToks("text")}) AS tok
            FROM documents),
          c AS MATERIALIZED (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
          t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
          voc AS (SELECT DISTINCT tok FROM c),
          vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
          grid AS MATERIALIZED (SELECT t.g, voc.tok, t.n, vv.v,
            coalesce(c.c, CAST(0 AS BIGINT)) AS c
            FROM t CROSS JOIN voc CROSS JOIN vv
            LEFT JOIN c ON c.g = t.g AND c.tok = voc.tok),
          lx AS (SELECT DISTINCT x FROM (
            SELECT c + 1 AS x FROM grid UNION SELECT n + v FROM grid)),
          $duckLog2Chain,
          lt AS MATERIALIZED (SELECT grid.g, grid.tok, grid.c, grid.n,
            grid.v, l1.lq - l2.lq AS l
            FROM grid JOIN lgt l1 ON l1.x = grid.c + 1
            JOIN lgt l2 ON l2.x = grid.n + grid.v),
          kl AS (SELECT a.g AS g_a, b.g AS g_b, a.n AS na, a.v AS v,
            sum((a.c + 1) * (a.l - b.l)) AS klnum
            FROM lt a JOIN lt b ON b.tok = a.tok AND a.g <> b.g
            GROUP BY 1, 2, 3, 4)
          SELECT g_a, g_b, CAST(klnum AS BIGINT) AS kl_num,
            ${duckPpm("klnum", "(na + v) * 65536")} AS kl_ubits
          FROM kl ORDER BY g_a, g_b""",

    "q_unigram_js" ->
      s"""WITH tk AS (SELECT lang AS g, unnest(${duckToks("text")}) AS tok
            FROM documents),
          c AS MATERIALIZED (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
          t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
          iw AS MATERIALIZED (SELECT a.g AS g_a, b.g AS g_b,
              ta.n AS na, tb.n AS nb, a.c AS ca, b.c AS cb
            FROM c a JOIN c b ON b.tok = a.tok AND a.g < b.g
            JOIN t ta ON ta.g = a.g JOIN t tb ON tb.g = b.g),
          lx AS (SELECT DISTINCT x FROM (
            SELECT 2 * ca * nb AS x FROM iw
            UNION SELECT ca * nb + cb * na FROM iw
            UNION SELECT 2 * cb * na FROM iw)),
          $duckLog2Chain,
          sums AS (SELECT g_a, g_b, na, nb,
              sum(ca * (la.lq - ls.lq)) AS ia,
              sum(cb * (lb.lq - ls.lq)) AS ib,
              CAST(sum(ca) AS BIGINT) AS sa,
              CAST(sum(cb) AS BIGINT) AS sb
            FROM iw
            JOIN lgt la ON la.x = 2 * iw.ca * iw.nb
            JOIN lgt ls ON ls.x = iw.ca * iw.nb + iw.cb * iw.na
            JOIN lgt lb ON lb.x = 2 * iw.cb * iw.na
            GROUP BY 1, 2, 3, 4),
          fin AS (SELECT g_a, g_b, na, nb,
            ia + 65536 * (na - sa) AS a,
            ib + 65536 * (nb - sb) AS b FROM sums)
          SELECT g_a, g_b, CAST(a AS BIGINT) AS jsa_num,
            CAST(b AS BIGINT) AS jsb_num,
            ${duckPpm("a * nb + b * na", "131072 * na * nb")} AS js_ubits
          FROM fin ORDER BY g_a, g_b""",

    "q_doc_chunk" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          n AS (SELECT doc_id, tk, len(tk) AS n FROM t),
          c AS (SELECT doc_id, tk, unnest(CASE WHEN n > 0
            THEN range(0, 1 + CAST(floor((greatest(0, n - 64) + 47) / 48.0) AS INT))
            ELSE [] END) AS chunk_id FROM n)
          SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
            array_to_string(tk[chunk_id*48 + 1 : chunk_id*48 + 64], ' ') AS chunk_text,
            CAST(len(tk[chunk_id*48 + 1 : chunk_id*48 + 64]) AS BIGINT) AS n_chunk_tokens
          FROM c ORDER BY doc_id, chunk_id""",

    // TextTiling: positional tokens via the range-unnest idiom, integer
    // dot/norm aggregates per adjacent block pair, the same rounded
    // sqrt-cosine, lag/lead valley test with coalesce(false) edges.
    "q_text_tiling" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          tok AS (SELECT doc_id,
            CAST((i - 1) // 20 AS BIGINT) AS blk, tk[i] AS term FROM
            (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM t)),
          cnt AS (SELECT doc_id, blk, term, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2, 3),
          dots AS (SELECT a.doc_id, a.blk,
            CAST(sum(a.c * b.c) AS BIGINT) AS dot
            FROM cnt a JOIN cnt b ON b.doc_id = a.doc_id
              AND b.blk = a.blk + 1 AND b.term = a.term
            GROUP BY 1, 2),
          n2 AS (SELECT doc_id, blk, CAST(sum(c * c) AS BIGINT) AS n2
            FROM cnt GROUP BY 1, 2),
          bnd AS (SELECT na.doc_id, na.blk AS boundary,
            round(CAST(coalesce(d.dot, 0) AS DOUBLE) /
              (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
              6) AS score
            FROM n2 na JOIN n2 nb ON nb.doc_id = na.doc_id
              AND nb.blk = na.blk + 1
            LEFT JOIN dots d ON d.doc_id = na.doc_id AND d.blk = na.blk),
          fin AS (SELECT doc_id, boundary, score,
            coalesce(lag(score) OVER w > score, false) AND
            coalesce(lead(score) OVER w > score, false) AS is_valley
            FROM bnd WINDOW w AS (PARTITION BY doc_id ORDER BY boundary))
          SELECT doc_id, boundary, score, is_valley
          FROM fin ORDER BY doc_id, boundary""",

    "q_token_dict" ->
      s"""WITH toks AS (SELECT DISTINCT unnest(${duckToks("text")}) AS tok
            FROM documents)
          SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tid
          FROM toks ORDER BY tok""",

    "q_hash_sample" ->
      s"""WITH b AS (SELECT doc_id, $duckBucket AS bkt FROM documents)
          SELECT doc_id FROM b WHERE bkt < 2000 ORDER BY doc_id""",

    "q_priority_sample" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS w FROM documents),
          h AS (SELECT doc_id, w,
            (w * 2147483647) // (${duckMixOf("doc_id")} + 1) AS priority
            FROM t),
          top AS (SELECT * FROM h ORDER BY priority DESC, doc_id LIMIT 50)
          SELECT doc_id, w, priority FROM top ORDER BY doc_id""",

    "q_quantile_norm" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
            row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS rg,
            count(*) OVER (PARTITION BY source) AS n FROM documents),
          p AS (SELECT n_chars AS norm_v,
            row_number() OVER (ORDER BY n_chars, source, doc_id) AS pr
            FROM documents),
          t AS (SELECT count(*) AS nn FROM documents)
          SELECT r.doc_id, r.source, r.n_chars,
            CAST(r.rg AS BIGINT) AS rank_in_group, p.norm_v
          FROM r CROSS JOIN t
          JOIN p ON p.pr = (r.rg * t.nn + r.n - 1) // r.n
          ORDER BY r.doc_id""",

    "q_split_by_cluster" ->
      s"""WITH RECURSIVE $duckLshPairsCte,
          $duckCcCompCte,
          b AS (SELECT doc_id, component,
            ${duckBucketOf("component")} AS bkt FROM comp)
          SELECT doc_id, component,
            CASE WHEN bkt < 8000 THEN 'train'
                 WHEN bkt < 9000 THEN 'val'
                 ELSE 'test' END AS split
          FROM b ORDER BY doc_id""",

    "q_split_assign" ->
      s"""WITH b AS (SELECT doc_id, $duckBucket AS bkt FROM documents)
          SELECT doc_id,
            CASE WHEN bkt < 8000 THEN 'train'
                 WHEN bkt < 9000 THEN 'val'
                 ELSE 'test' END AS split
          FROM b ORDER BY doc_id""",

    "q_corpus_shuffle" ->
      s"""WITH h AS (SELECT doc_id, ${duckMixOf("doc_id")} AS mix
            FROM documents WHERE doc_id IS NOT NULL)
          SELECT doc_id, CAST(mix % 8 AS BIGINT) AS shard,
            CAST(row_number() OVER (PARTITION BY mix % 8
              ORDER BY mix, doc_id) - 1 AS BIGINT) AS pos
          FROM h ORDER BY doc_id""",

    "q_seq_pack" ->
      s"""WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
          FROM documents),
          c AS (SELECT doc_id, shard, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
          SELECT doc_id, shard, n_tokens,
            CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id
          FROM c ORDER BY doc_id""",

    "q_regex_tokens" ->
      """WITH rt AS (SELECT doc_id,
           regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]') AS toks
         FROM documents)
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_rtokens,
           array_to_string(toks[1:5], '|') AS head_toks
         FROM rt ORDER BY doc_id""",

    "q_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id,
             octet_length(encode(text)) AS len,
             octet_length(encode(text)) % 16 + 1 AS nf
           FROM documents
           WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
         f AS (SELECT media_id, len, nf,
             greatest(1, len // nf) AS fl FROM m),
         k AS (SELECT media_id, len, fl,
             unnest(range(0, nf, 2)) AS kk FROM f),
         s AS (SELECT media_id, kk,
             CAST(row_number() OVER (PARTITION BY media_id ORDER BY kk) - 1
               AS BIGINT) AS frame_idx,
             CAST(greatest(0, least((kk + 1) * fl, len) - least(kk * fl, len))
               AS BIGINT) AS frame_bytes
           FROM k)
         SELECT media_id, frame_idx, frame_bytes FROM s
         ORDER BY media_id, frame_idx""",

    "q_band_join" ->
      """SELECT a.event_id AS p_id, b.event_id AS s_id,
           a."value" AS p_val, b."value" AS s_val
         FROM events a JOIN events b
           ON a.event_type = 'purchase' AND b.event_type = 'signup'
          AND abs(a."value" - b."value") <= 0.05
         ORDER BY p_id, s_id""",

    "q_interval_join" ->
      """WITH iv AS (SELECT o_orderkey AS iv_id, o_totalprice AS lo,
             o_totalprice + 1000.0 AS hi
           FROM orders WHERE o_orderkey < 1000)
         SELECT p.o_orderkey AS pt_id, iv.iv_id, p.o_totalprice AS pt, iv.lo
         FROM orders p JOIN iv
           ON p.o_totalprice >= iv.lo AND p.o_totalprice <= iv.hi
         ORDER BY pt_id, iv_id""",

    "q_simhash" ->
      s"""WITH ${duckSimhashCte(16)}
          SELECT doc_id, simhash FROM fps ORDER BY doc_id""",

    "q_simhash_pairs" -> {
      val chunks = Dedup.chunkSpec(30, 2)
        .map { case (k, cp, cm) => s"($k, $cp, $cm)" }.mkString(", ")
      s"""WITH ${duckSimhashCte(30)},
          ch AS (SELECT * FROM (VALUES $chunks) c(ck, cp, cmod)),
          keyed AS (SELECT doc_id, ck, (simhash // cp) % cmod AS cv
            FROM fps CROSS JOIN ch),
          caps AS (SELECT ck, cv, count(*) AS c FROM keyed GROUP BY 1, 2),
          capped AS (SELECT keyed.* FROM keyed JOIN caps USING (ck, cv)
            WHERE c <= ${duckDerivedCap("SELECT count(DISTINCT doc_id) FROM fps")}),
          cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM capped a JOIN capped b USING (ck, cv)
            WHERE a.doc_id < b.doc_id)
          SELECT id_a, id_b,
            CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hd
          FROM cands
          JOIN fps fa ON fa.doc_id = id_a
          JOIN fps fb ON fb.doc_id = id_b
          WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 2
          ORDER BY id_a, id_b"""
    },

    "q_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(${duckToks("text")}) AS tok FROM documents),
          n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks)
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt
          FROM toks CROSS JOIN n
          GROUP BY tok, total HAVING count(*) * 41 > total
          ORDER BY tok""",

    // Adjacent-bigram discounted lift, one positive integer divide
    // (minCount > δ keeps the numerator positive, so // = div).
    "q_phrase_mine" ->
      s"""WITH tk AS (SELECT ${duckToks("text")} AS tk FROM documents),
          uni AS (SELECT unnest(tk) AS tok FROM tk),
          cu AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
            FROM uni GROUP BY 1),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
          bg AS (SELECT unnest(CASE WHEN len(tk) >= 2
            THEN list_transform(range(1, len(tk)),
              i -> struct_pack(a := tk[i], b := tk[i + 1]))
            ELSE [] END) AS p FROM tk),
          cb AS (SELECT p.a AS tok_a, p.b AS tok_b,
            CAST(count(*) AS BIGINT) AS c_ab
            FROM bg GROUP BY 1, 2 HAVING count(*) >= 3),
          sc AS (SELECT tok_a, tok_b, c_ab,
            CAST(((c_ab - 2) * nn.n * 1000000) // (ca.c * cbb.c)
              AS BIGINT) AS score_e6
            FROM cb JOIN cu ca ON ca.tok = tok_a
            JOIN cu cbb ON cbb.tok = tok_b CROSS JOIN nn)
          SELECT tok_a, tok_b, c_ab, score_e6 FROM
            (SELECT *, row_number() OVER
              (ORDER BY score_e6 DESC, tok_a, tok_b) AS rn FROM sc)
          WHERE rn <= 40
          ORDER BY score_e6 DESC, tok_a, tok_b""",

    "q_cooccur_lift" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(${duckToks("text")}) AS tok
            FROM documents),
          counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks
            GROUP BY tok HAVING count(*) <= 100000),
          t AS (SELECT doc_id, toks.tok, c FROM toks JOIN counts USING (tok)),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, a.c AS c_a, b.c AS c_b,
            CAST(count(*) AS BIGINT) AS c_ab
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5)
          SELECT tok_a, tok_b, c_a, c_b, c_ab,
            round((CAST(n_docs AS DOUBLE) * c_ab) /
              (CAST(c_a AS DOUBLE) * c_b), 6) AS lift
          FROM p CROSS JOIN n ORDER BY tok_a, tok_b""",

    "q_kn_bigram" ->
      s"""WITH tk AS (SELECT ${duckToks("text")} AS tk FROM documents),
          p AS (SELECT unnest(tk[1:len(tk)-1]) AS a,
                       unnest(tk[2:len(tk)]) AS b
            FROM tk WHERE len(tk) >= 2),
          ids AS (SELECT ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b FROM p),
          cab AS (SELECT tid_a, tid_b, CAST(count(*) AS BIGINT) AS c_ab
            FROM ids GROUP BY 1, 2),
          ca AS (SELECT tid_a, CAST(sum(c_ab) AS BIGINT) AS c_a,
            CAST(count(*) AS BIGINT) AS n1a FROM cab GROUP BY 1),
          cb AS (SELECT tid_b, CAST(count(*) AS BIGINT) AS n1b
            FROM cab GROUP BY 1),
          np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM cab),
          q AS (SELECT tid_a, tid_b, c_ab,
            CAST((CAST(greatest(4 * c_ab - 3, 0) AS HUGEINT) * np
                  + CAST(3 AS HUGEINT) * n1a * n1b) * 1000000000
                 // (CAST(4 AS HUGEINT) * c_a * np) AS BIGINT) AS pkn_q
            FROM cab JOIN ca USING (tid_a) JOIN cb USING (tid_b)
            CROSS JOIN np)
          SELECT tid_a, tid_b, c_ab, pkn_q,
            CAST(pkn_q AS DOUBLE) / 1000000000.0 AS pkn
          FROM q WHERE c_ab >= 2 ORDER BY tid_a, tid_b""",

    "q_jm_bigram" ->
      s"""WITH tk AS (SELECT ${duckToks("text")} AS tk FROM documents),
          p AS (SELECT unnest(tk[1:len(tk)-1]) AS a,
                       unnest(tk[2:len(tk)]) AS b
            FROM tk WHERE len(tk) >= 2),
          ids AS (SELECT ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b FROM p),
          cab AS (SELECT tid_a, tid_b, CAST(count(*) AS BIGINT) AS c_ab
            FROM ids GROUP BY 1, 2),
          ca AS (SELECT tid_a, CAST(sum(c_ab) AS BIGINT) AS c_a
            FROM cab GROUP BY 1),
          cb AS (SELECT tid_b, CAST(sum(c_ab) AS BIGINT) AS c_b
            FROM cab GROUP BY 1),
          np AS (SELECT CAST(sum(c_ab) AS BIGINT) AS np FROM cab),
          q AS (SELECT tid_a, tid_b, c_ab,
            CAST((CAST(3 AS HUGEINT) * c_ab * np
                  + CAST(c_b AS HUGEINT) * c_a) * 1000000000
                 // (CAST(4 AS HUGEINT) * c_a * np) AS BIGINT) AS pjm_q
            FROM cab JOIN ca USING (tid_a) JOIN cb USING (tid_b)
            CROSS JOIN np)
          SELECT tid_a, tid_b, c_ab, pjm_q,
            CAST(pjm_q AS DOUBLE) / 1000000000.0 AS pjm
          FROM q WHERE c_ab >= 2 ORDER BY tid_a, tid_b""",

    "q_kn_trigram" ->
      s"""WITH tk AS (SELECT ${duckToks("text")} AS tk FROM documents),
          p AS (SELECT unnest(tk[1:len(tk)-1]) AS a,
                       unnest(tk[2:len(tk)]) AS b
            FROM tk WHERE len(tk) >= 2),
          ids AS (SELECT ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b FROM p),
          cab2 AS (SELECT tid_a, tid_b, CAST(count(*) AS BIGINT) AS c_ab
            FROM ids GROUP BY 1, 2),
          ca2 AS (SELECT tid_a, CAST(sum(c_ab) AS BIGINT) AS c_a,
            CAST(count(*) AS BIGINT) AS n1a FROM cab2 GROUP BY 1),
          cb2 AS (SELECT tid_b, CAST(count(*) AS BIGINT) AS n1b
            FROM cab2 GROUP BY 1),
          np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM cab2),
          lm2 AS (SELECT tid_a AS tid_b, tid_b AS tid_c,
            CAST((CAST(greatest(4 * c_ab - 3, 0) AS HUGEINT) * np
                  + CAST(3 AS HUGEINT) * n1a * n1b) * 1000000000
                 // (CAST(4 AS HUGEINT) * c_a * np) AS BIGINT) AS pkn2_q
            FROM cab2 JOIN ca2 USING (tid_a) JOIN cb2 USING (tid_b)
            CROSS JOIN np),
          t AS (SELECT unnest(tk[1:len(tk)-2]) AS a,
                       unnest(tk[2:len(tk)-1]) AS b,
                       unnest(tk[3:len(tk)]) AS c
            FROM tk WHERE len(tk) >= 3),
          tids AS (SELECT ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b, ${duckPolyId("c")} AS tid_c FROM t),
          cabc AS (SELECT tid_a, tid_b, tid_c,
            CAST(count(*) AS BIGINT) AS c_abc FROM tids GROUP BY 1, 2, 3),
          cab3 AS (SELECT tid_a, tid_b, CAST(sum(c_abc) AS BIGINT) AS c_ab,
            CAST(count(*) AS BIGINT) AS n1fw FROM cabc GROUP BY 1, 2),
          q AS (SELECT x.tid_a, x.tid_b, x.tid_c, x.c_abc,
            CAST((CAST(greatest(4 * x.c_abc - 3, 0) AS HUGEINT) * 1000000000
                  + CAST(3 AS HUGEINT) * f.n1fw * l.pkn2_q)
                 // (CAST(4 AS HUGEINT) * f.c_ab) AS BIGINT) AS pkn_q
            FROM cabc x
            JOIN cab3 f ON x.tid_a = f.tid_a AND x.tid_b = f.tid_b
            JOIN lm2 l ON x.tid_b = l.tid_b AND x.tid_c = l.tid_c)
          SELECT tid_a, tid_b, tid_c, c_abc, pkn_q,
            CAST(pkn_q AS DOUBLE) / 1000000000.0 AS pkn
          FROM q WHERE c_abc >= 2 ORDER BY tid_a, tid_b, tid_c""",

    "q_lm_fit" ->
      s"""WITH $duckBigramCountsCte
          $duckKnLmCte
          sc AS (SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
            CAST(sum(CASE WHEN lm.pkn_q IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_scored,
            CAST(sum(coalesce(lm.pkn_q, 0)) AS BIGINT) AS sum_q
            FROM dids d LEFT JOIN lm
            ON d.tid_a = lm.tid_a AND d.tid_b = lm.tid_b
            GROUP BY 1)
          SELECT doc_id, n_bigrams, n_scored,
            CAST(sum_q // n_bigrams AS BIGINT) AS fit_q,
            CAST(sum_q // n_bigrams AS DOUBLE) / 1000000000.0 AS fit
          FROM sc ORDER BY doc_id""",

    "q_perplexity" ->
      s"""WITH $duckBigramCountsCte
          $duckKnLmCte
          j AS MATERIALIZED (SELECT d.doc_id,
            greatest(lm.pkn_q, 1) AS pq
            FROM dids d JOIN lm USING (tid_a, tid_b)),
          lx AS (SELECT DISTINCT pq AS x FROM j
            UNION SELECT 1000000000),
          $duckLog2Chain,
          sc AS (SELECT j.doc_id, CAST(count(*) AS BIGINT) AS n_scored,
            sum(g9.lq - lp.lq) AS sbq
            FROM j JOIN lgt lp ON lp.x = j.pq
            CROSS JOIN (SELECT lq FROM lgt WHERE x = 1000000000) g9
            GROUP BY 1)
          SELECT doc_id, n_scored, CAST(sbq // n_scored AS BIGINT) AS bits_q,
            round(CAST(sbq // n_scored AS DOUBLE) / 65536.0, 6) AS bits
          FROM sc ORDER BY doc_id""",

    "q_lm_fit3" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          trn AS (SELECT tk FROM tk WHERE doc_id % 2 = 0),
          p AS (SELECT unnest(tk[1:len(tk)-1]) AS a,
                       unnest(tk[2:len(tk)]) AS b
            FROM trn WHERE len(tk) >= 2),
          ids AS (SELECT ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b FROM p),
          cab2 AS (SELECT tid_a, tid_b, CAST(count(*) AS BIGINT) AS c_ab
            FROM ids GROUP BY 1, 2),
          ca2 AS (SELECT tid_a, CAST(sum(c_ab) AS BIGINT) AS c_a,
            CAST(count(*) AS BIGINT) AS n1a FROM cab2 GROUP BY 1),
          cb2 AS (SELECT tid_b, CAST(count(*) AS BIGINT) AS n1b
            FROM cab2 GROUP BY 1),
          np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM cab2),
          lm2 AS (SELECT tid_a AS tid_b, tid_b AS tid_c,
            CAST((CAST(greatest(4 * c_ab - 3, 0) AS HUGEINT) * np
                  + CAST(3 AS HUGEINT) * n1a * n1b) * 1000000000
                 // (CAST(4 AS HUGEINT) * c_a * np) AS BIGINT) AS pkn2_q
            FROM cab2 JOIN ca2 USING (tid_a) JOIN cb2 USING (tid_b)
            CROSS JOIN np),
          t AS (SELECT unnest(tk[1:len(tk)-2]) AS a,
                       unnest(tk[2:len(tk)-1]) AS b,
                       unnest(tk[3:len(tk)]) AS c
            FROM trn WHERE len(tk) >= 3),
          tids AS (SELECT ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b, ${duckPolyId("c")} AS tid_c FROM t),
          cabc AS (SELECT tid_a, tid_b, tid_c,
            CAST(count(*) AS BIGINT) AS c_abc FROM tids GROUP BY 1, 2, 3),
          cab3 AS (SELECT tid_a, tid_b, CAST(sum(c_abc) AS BIGINT) AS c_ab,
            CAST(count(*) AS BIGINT) AS n1fw FROM cabc GROUP BY 1, 2),
          lm3 AS (SELECT x.tid_a, x.tid_b, x.tid_c,
            CAST((CAST(greatest(4 * x.c_abc - 3, 0) AS HUGEINT) * 1000000000
                  + CAST(3 AS HUGEINT) * f.n1fw * l.pkn2_q)
                 // (CAST(4 AS HUGEINT) * f.c_ab) AS BIGINT) AS pkn3_q
            FROM cabc x
            JOIN cab3 f ON x.tid_a = f.tid_a AND x.tid_b = f.tid_b
            JOIN lm2 l ON x.tid_b = l.tid_b AND x.tid_c = l.tid_c),
          dt AS (SELECT doc_id, unnest(tk[1:len(tk)-2]) AS a,
                       unnest(tk[2:len(tk)-1]) AS b,
                       unnest(tk[3:len(tk)]) AS c
            FROM tk WHERE len(tk) >= 3),
          dtids AS (SELECT doc_id, ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b, ${duckPolyId("c")} AS tid_c FROM dt),
          sc AS (SELECT d.doc_id,
            CAST(count(*) AS BIGINT) AS n_trigrams,
            CAST(sum(CASE WHEN l3.pkn3_q IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_exact,
            CAST(sum(CASE
              WHEN l3.pkn3_q IS NOT NULL THEN l3.pkn3_q
              WHEN f.c_ab IS NOT NULL AND l2.pkn2_q IS NOT NULL THEN
                CAST((CAST(3 AS HUGEINT) * f.n1fw * l2.pkn2_q)
                     // (CAST(4 AS HUGEINT) * f.c_ab) AS BIGINT)
              WHEN l2.pkn2_q IS NOT NULL THEN l2.pkn2_q
              ELSE 0 END) AS BIGINT) AS sum_q
            FROM dtids d
            LEFT JOIN lm3 l3 ON d.tid_a = l3.tid_a AND d.tid_b = l3.tid_b
              AND d.tid_c = l3.tid_c
            LEFT JOIN cab3 f ON d.tid_a = f.tid_a AND d.tid_b = f.tid_b
            LEFT JOIN lm2 l2 ON d.tid_b = l2.tid_b AND d.tid_c = l2.tid_c
            GROUP BY 1)
          SELECT doc_id, n_trigrams, n_exact,
            CAST(sum_q // n_trigrams AS BIGINT) AS fit_q,
            CAST(sum_q // n_trigrams AS DOUBLE) / 1000000000.0 AS fit
          FROM sc ORDER BY doc_id""",

    "q_nb_weights" ->
      s"""WITH $duckNbChain
          SELECT class, token, n, w_q FROM wts ORDER BY class, token""",

    "q_mv_merge" ->
      s"""WITH e AS (SELECT event_type AS grp,
            CAST(user_id AS BIGINT) AS tid,
            CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
          st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(cents) AS BIGINT) AS sum_cents,
            max(cents) AS max_cents FROM e GROUP BY 1),
          h AS (SELECT grp, ${duckMixOf("tid")} AS y FROM e),
          r AS (SELECT grp, y % 64 AS reg, y // 64 AS rem FROM h),
          rk AS (SELECT grp, reg, ${duckHllRankCase("rem")} AS rank FROM r),
          regs AS (SELECT grp, reg, max(rank) AS m_j FROM rk GROUP BY 1, 2),
          occ AS (SELECT grp,
            SUM(CAST(1 AS BIGINT) << (26 - m_j)) AS s_occ,
            CAST(count(*) AS BIGINT) AS n_reg FROM regs GROUP BY 1),
          sc AS (SELECT grp,
            s_occ + (64 - n_reg) * (CAST(1 AS BIGINT) << 26) AS s_scaled
            FROM occ)
          SELECT st.grp, st.n_events, st.sum_cents, st.max_cents,
            round(0.709 * 274877906944.0 / CAST(sc.s_scaled AS DOUBLE), 6)
              AS users_est
          FROM st JOIN sc USING (grp) ORDER BY grp""",

    "q_decay_count" ->
      """WITH e AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day FROM events),
          m AS (SELECT max(day) AS maxd FROM e),
          w AS (SELECT user_id,
            (CAST(1 AS BIGINT) << CAST(30 - (m.maxd - day) AS INT)) AS wgt
            FROM e, m WHERE m.maxd - day <= 30)
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(wgt) AS BIGINT) AS decayed_q,
            round(CAST(sum(wgt) AS DOUBLE) / 1073741824.0, 6) AS decayed
          FROM w GROUP BY 1 ORDER BY user_id""",

    "q_content_hash" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(bit_xor(${duckPolyId("concat_ws('|', doc_id, lang, text)")})
              AS BIGINT) AS content_hash
          FROM documents GROUP BY 1 ORDER BY source""",

    "q_dq_report" ->
      """WITH a AS (SELECT
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
              AS pk_duplicates,
            CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS pk_nulls,
            CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nonpositive_price,
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
              THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
            CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS null_orderdate,
            CAST(sum(CASE WHEN length(o_orderpriority) = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS empty_priority
          FROM orders)
          SELECT k AS check_name, v AS n_violations FROM (
            SELECT unnest(['bad_status','empty_priority','nonpositive_price',
                'null_orderdate','pk_duplicates','pk_nulls']) AS k,
              unnest([bad_status, empty_priority, nonpositive_price,
                null_orderdate, pk_duplicates, pk_nulls]) AS v FROM a)
          ORDER BY check_name""",

    "q_heaps" ->
      s"""WITH tkk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          st AS (SELECT doc_id, s.i AS p, s.t AS tok FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
              i -> {'i': i, 't': tk[i]})) AS s FROM tkk)),
          flt AS (SELECT doc_id, p, tok FROM st
            WHERE regexp_matches(tok, '^[a-z]+$$')),
          r AS (SELECT tok,
            CAST(row_number() OVER (ORDER BY doc_id, p) AS BIGINT) AS gp,
            CAST(count(*) OVER () AS BIGINT) AS nn FROM flt),
          fp AS (SELECT tok, min(gp) AS fp, max(nn) AS n FROM r GROUP BY 1),
          pi AS (SELECT ((fp * 20 - 1) // n) + 1 AS i,
            CAST(count(*) AS BIGINT) AS v, max(n) AS n FROM fp GROUP BY 1),
          nt AS (SELECT max(n) AS N FROM pi),
          gr AS (SELECT CAST(t.i AS BIGINT) AS i FROM range(1, 21) t(i)),
          cum AS (SELECT gr.i,
            CAST(sum(coalesce(pi.v, 0)) OVER (ORDER BY gr.i) AS BIGINT) AS V,
            (gr.i * nt.N) // 20 AS prefix
            FROM gr LEFT JOIN pi ON pi.i = gr.i CROSS JOIN nt),
          pts AS (SELECT prefix, V FROM cum WHERE V > 0 AND prefix > 0),
          lx AS (SELECT DISTINCT prefix AS x FROM pts
            UNION SELECT DISTINCT V FROM pts),
          $duckLog2Chain,
          xy AS (SELECT la.lq AS x, lv.lq AS y FROM pts
            JOIN lgt la ON la.x = pts.prefix
            JOIN lgt lv ON lv.x = pts.V),
          sm AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
            CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy FROM xy)
          SELECT n,
            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("n * sxy - sx * sy", "n * sxx - sx * sx")}
            END AS slope_ppm,
            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("sy * sxx - sx * sxy", "n * sxx - sx * sx")}
            END AS intercept_ppm
          FROM sm""",

    "q_zipf_slope" ->
      s"""WITH f AS (SELECT word AS token, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1),
          r AS MATERIALIZED (SELECT token, freq,
            row_number() OVER (ORDER BY freq DESC, token) AS zr FROM f),
          lx AS (SELECT DISTINCT x FROM (
            SELECT zr AS x FROM r UNION SELECT freq FROM r)),
          $duckLog2Chain,
          pts AS (SELECT la.lq AS x, lf.lq AS y FROM r
            JOIN lgt la ON la.x = r.zr
            JOIN lgt lf ON lf.x = r.freq),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
            CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
            FROM pts)
          SELECT 'corpus' AS g, n,
            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("n * sxy - sx * sy", "n * sxx - sx * sx")}
            END AS slope_ppm,
            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("sy * sxx - sx * sxy", "n * sxx - sx * sx")}
            END AS intercept_ppm
          FROM s""",

    "q_yule_k" ->
      s"""WITH tf AS (SELECT source, word,
            CAST(count(*) AS BIGINT) AS m
            FROM (SELECT source, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1, 2),
          agg AS (SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS n_types,
            sum(CAST(m AS HUGEINT) * m) AS s2
            FROM tf GROUP BY 1)
          SELECT source, n_tokens, n_types, CAST(s2 AS BIGINT) AS sum_m2,
            ${duckPpm("10000 * (s2 - n_tokens)",
              "CAST(n_tokens AS HUGEINT) * n_tokens", 1000)}
              AS yule_k_milli
          FROM agg ORDER BY source""",

    "q_mix_gini" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
            FROM documents GROUP BY 1),
          r AS (SELECT sz,
            row_number() OVER (ORDER BY sz, source) AS gr FROM s),
          a AS (SELECT CAST(count(*) AS BIGINT) AS ns,
            CAST(sum(sz) AS BIGINT) AS tot,
            CAST(sum(gr * sz) AS BIGINT) AS ws FROM r)
          SELECT ns AS n_sources,
            CAST(2 * ws - (ns + 1) * tot AS BIGINT) AS gini_num,
            CAST(ns * tot AS BIGINT) AS gini_den,
            round(CAST(2 * ws - (ns + 1) * tot AS DOUBLE) /
              CAST(ns * tot AS DOUBLE), 6) AS gini
          FROM a""",

    "q_burstiness" ->
      s"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
          pd AS (SELECT doc_id, word AS token, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(word, '^[a-z]+$$')
            GROUP BY 1, 2),
          agg AS (SELECT token, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(c) AS BIGINT) AS total,
            CAST(sum(c * c) AS BIGINT) AS s2 FROM pd GROUP BY 1)
          SELECT token, n_docs, total,
            CAST(nd.nn * s2 - total * total AS BIGINT) AS vmr_num,
            CAST(nd.nn * total AS BIGINT) AS vmr_den,
            round(CAST(nd.nn * s2 - total * total AS DOUBLE) /
              CAST(nd.nn * total AS DOUBLE), 6) AS vmr
          FROM agg, nd
          ORDER BY vmr DESC, token LIMIT 20""",

    "q_log_gmean" ->
      s"""WITH lx AS (SELECT DISTINCT CAST(n_chars AS BIGINT) AS x
            FROM documents WHERE n_chars >= 1),
          $duckLog2Chain,
          j AS (SELECT d.source, lgt.lq FROM documents d
            JOIN lgt ON lgt.x = d.n_chars WHERE d.n_chars >= 1)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(lq) // count(*) AS BIGINT) AS log2_gmean_q,
            round(CAST(sum(lq) // count(*) AS DOUBLE) / 65536.0, 6)
              AS log2_gmean
          FROM j GROUP BY 1 ORDER BY source""",

    "q_ks_test" ->
      s"""WITH c AS (SELECT n_chars AS v,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia,
            CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS ib
          FROM documents WHERE n_chars IS NOT NULL),
          g AS (SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
            CAST(sum(ib) AS BIGINT) AS cb FROM c GROUP BY 1),
          cm AS (SELECT v,
            sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS cca,
            sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS ccb FROM g),
          t AS (SELECT CAST(max(cca) AS BIGINT) AS n_a,
            CAST(max(ccb) AS BIGINT) AS n_b FROM cm)
          SELECT t.n_a, t.n_b,
            CAST(max(abs(cm.cca * t.n_b - cm.ccb * t.n_a)) AS BIGINT)
              AS d_num,
            ${duckPpm("max(abs(cm.cca * t.n_b - cm.ccb * t.n_a))",
              "t.n_a * t.n_b")} AS d_ppm
          FROM cm, t GROUP BY t.n_a, t.n_b""",

    "q_ks_binned" ->
      s"""WITH c AS (SELECT CAST("value" AS DOUBLE) AS v,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
            CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS ib
          FROM events WHERE "value" IS NOT NULL),
          f AS (SELECT * FROM c WHERE ia = 1 OR ib = 1),
          ext AS (SELECT min(v) AS mn, max(v) AS mx FROM f),
          bb AS (SELECT CASE WHEN ext.mx = ext.mn THEN 0
              ELSE least(63, CAST(floor((v - mn) * 64 / (mx - mn))
                AS BIGINT)) END AS b, ia, ib
            FROM f, ext),
          g AS (SELECT b, CAST(sum(ia) AS BIGINT) AS ca,
            CAST(sum(ib) AS BIGINT) AS cb FROM bb GROUP BY 1),
          cm AS (SELECT b,
            sum(ca) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS cca,
            sum(cb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS ccb FROM g),
          t AS (SELECT CAST(max(cca) AS BIGINT) AS n_a,
            CAST(max(ccb) AS BIGINT) AS n_b FROM cm)
          SELECT t.n_a, t.n_b, CAST(64 AS BIGINT) AS n_bins,
            CAST(max(abs(cm.cca * t.n_b - cm.ccb * t.n_a)) AS BIGINT)
              AS d_num,
            ${duckPpm("max(abs(cm.cca * t.n_b - cm.ccb * t.n_a))",
              "t.n_a * t.n_b")} AS d_ppm
          FROM cm, t GROUP BY t.n_a, t.n_b""",

    "q_chi2" ->
      s"""WITH td AS (SELECT lang, t.word AS token
            FROM (SELECT lang, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(t.word, '^[a-z]+$$')),
          cnt AS MATERIALIZED (SELECT lang AS class, token,
            CAST(count(*) AS BIGINT) AS n FROM td GROUP BY 1, 2),
          bt AS (SELECT token, sum(n) AS nt FROM cnt GROUP BY 1),
          bc AS (SELECT class, sum(n) AS nc FROM cnt GROUP BY 1),
          tt AS (SELECT sum(n) AS nn FROM cnt),
          grid AS (SELECT bt.token, bc.class, bt.nt, bc.nc, tt.nn,
            coalesce(cnt.n, 0) AS n
            FROM bt CROSS JOIN bc CROSS JOIN tt
            LEFT JOIN cnt ON cnt.token = bt.token AND cnt.class = bc.class),
          cells AS (SELECT nn,
            (CAST(n * nn - nt * nc AS HUGEINT) *
             CAST(n * nn - nt * nc AS HUGEINT) * 1000000)
              // (CAST(nt AS HUGEINT) * nc) AS cell
            FROM grid),
          agg AS (SELECT nn, sum(cell) AS s FROM cells GROUP BY 1)
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM bt) AS n_tokens,
            (SELECT CAST(count(*) AS BIGINT) FROM bc) AS n_classes,
            ((SELECT count(*) FROM bt) - 1) *
              ((SELECT count(*) FROM bc) - 1) AS dof,
            CAST(s // nn AS BIGINT) AS chi2_q,
            round(CAST(s // nn AS DOUBLE) / 1000000.0, 6) AS chi2
          FROM agg""",

    "q_cramers_v" ->
      s"""WITH cells AS (SELECT lang AS x, source AS y,
            CAST(count(*) AS BIGINT) AS n FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
          bx AS (SELECT x, sum(n) AS nx FROM cells GROUP BY 1),
          my AS (SELECT y, sum(n) AS ny FROM cells GROUP BY 1),
          tt AS (SELECT sum(n) AS nn FROM cells),
          grid AS (SELECT bx.x, my.y, bx.nx, my.ny, tt.nn,
            coalesce(cells.n, 0) AS n
            FROM bx CROSS JOIN my CROSS JOIN tt
            LEFT JOIN cells ON cells.x = bx.x AND cells.y = my.y),
          cellv AS (SELECT nn,
            (CAST(n * nn - nx * ny AS HUGEINT) *
             CAST(n * nn - nx * ny AS HUGEINT) * 1000000)
              // (CAST(nx AS HUGEINT) * ny) AS cell
            FROM grid),
          agg AS (SELECT nn, sum(cell) AS s FROM cellv GROUP BY 1),
          chi AS (SELECT nn, CAST(s // nn AS BIGINT) AS chi2_q FROM agg),
          kx AS (SELECT CAST(count(*) AS BIGINT) AS n_x FROM bx),
          ky AS (SELECT CAST(count(*) AS BIGINT) AS n_y FROM my)
          SELECT CAST(nn AS BIGINT) AS n, n_x, n_y, chi2_q,
            CASE WHEN least(n_x, n_y) <= 1 THEN NULL
              ELSE ${duckPpm("chi2_q", "nn * (least(n_x, n_y) - 1)")}
            END AS v2_pptr
          FROM chi CROSS JOIN kx CROSS JOIN ky""",

    "q_mi_cat" ->
      s"""WITH cells AS (SELECT lang AS x, source AS y,
            CAST(count(*) AS BIGINT) AS c FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
          bx AS (SELECT x, CAST(sum(c) AS BIGINT) AS nx FROM cells
            GROUP BY 1),
          my AS (SELECT y, CAST(sum(c) AS BIGINT) AS ny FROM cells
            GROUP BY 1),
          tt AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
          args AS (SELECT cells.c, tt.nn, bx.nx, my.ny
            FROM cells JOIN bx USING (x) JOIN my USING (y) CROSS JOIN tt),
          lx AS (SELECT DISTINCT c * nn AS x FROM args
            UNION SELECT DISTINCT nx * ny FROM args),
          $duckLog2Chain,
          terms AS (SELECT a.c * (l1.lq - l2.lq) AS t, a.nn FROM args a
            JOIN lgt l1 ON l1.x = a.c * a.nn
            JOIN lgt l2 ON l2.x = a.nx * a.ny)
          SELECT CAST(max(nn) AS BIGINT) AS n,
            (SELECT CAST(count(*) AS BIGINT) FROM bx) AS n_x,
            (SELECT CAST(count(*) AS BIGINT) FROM my) AS n_y,
            CAST(sum(t) AS BIGINT) AS mi2_q,
            round(CAST(sum(t) AS DOUBLE) /
              (CAST(max(nn) AS DOUBLE) * 65536.0), 6) AS mi2
          FROM terms""",

    "q_psi" ->
      s"""WITH c AS (SELECT source AS cat,
            CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
            FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
            CAST(sum(cb) AS BIGINT) AS nb FROM c),
          p AS (SELECT cat, greatest(${duckPpm("ca", "na")}, 1) AS pa,
            greatest(${duckPpm("cb", "nb")}, 1) AS pb
            FROM c CROSS JOIN t),
          lx AS (SELECT DISTINCT pa AS x FROM p
            UNION SELECT DISTINCT pb FROM p),
          $duckLog2Chain,
          terms AS (SELECT (p.pa - p.pb) * (la.lq - lb.lq) AS t FROM p
            JOIN lgt la ON la.x = p.pa
            JOIN lgt lb ON lb.x = p.pb)
          SELECT CAST(count(*) AS BIGINT) AS n_cats,
            CAST(sum(t) AS BIGINT) AS psi2_q,
            round(CAST(sum(t) AS DOUBLE) / 65536.0 / 1000000.0, 6) AS psi2
          FROM terms""",

    "q_group_ols" ->
      s"""WITH e AS (SELECT event_type,
            epoch_us(ts) // 3600000000 AS x,
            CAST(round(value * 100, 0) AS BIGINT) AS y FROM events),
          s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
            CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
            FROM e GROUP BY 1)
          SELECT event_type, n,
            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("n * sxy - sx * sy", "n * sxx - sx * sx")}
            END AS slope_ppm,
            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("sy * sxx - sx * sxy", "n * sxx - sx * sx")}
            END AS intercept_ppm
          FROM s ORDER BY event_type""",

    "q_spearman" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS x,
            n_chars AS y FROM documents),
          r AS (SELECT doc_id,
            row_number() OVER (ORDER BY x, doc_id) AS rx,
            row_number() OVER (ORDER BY y, doc_id) AS ry FROM t),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS d2_sum FROM r)
          SELECT n, d2_sum,
            CASE WHEN n < 2 THEN NULL
              ELSE ${duckPpm("n * (n * n - 1) - 6 * d2_sum",
                "n * (n * n - 1)")}
            END AS rho_ppm
          FROM s""",

    "q_autocorr" ->
      s"""WITH dc AS (SELECT CAST(ts AS DATE) AS day,
            CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
          p AS (SELECT lag(y) OVER (ORDER BY day) AS x, y FROM dc),
          q AS (SELECT x, y FROM p WHERE x IS NOT NULL),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x * y) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx FROM q)
          SELECT n_pairs, sx, sy, sxy, sxx,
            CASE WHEN n_pairs * sxx - sx * sx = 0 THEN NULL
              ELSE ${duckPpm("n_pairs * sxy - sx * sy",
                "n_pairs * sxx - sx * sx")}
            END AS slope_ppm
          FROM s""",

    "q_benford" ->
      s"""WITH dd AS (SELECT CAST(substr(CAST(CAST(round(
              o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
              AS digit
            FROM orders WHERE round(o_totalprice * 100) > 0),
          c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
            FROM dd GROUP BY 1),
          t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM c),
          e AS (SELECT digit, n_obs,
            ${duckPpm("n_obs", "n")} AS obs_ppm,
            CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
              WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
              WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
              ELSE 45757 END AS exp_ppm
            FROM c CROSS JOIN t)
          SELECT digit, n_obs, obs_ppm, CAST(exp_ppm AS BIGINT) AS exp_ppm,
            CAST(obs_ppm - exp_ppm AS BIGINT) AS excess_ppm
          FROM e ORDER BY digit""",

    "q_jackknife" ->
      s"""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(len(${duckToks("text")}) AS BIGINT))
              AS BIGINT) AS s
            FROM documents GROUP BY 1),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
            CAST(sum(s) AS BIGINT) AS ss,
            CAST(count(*) AS BIGINT) AS g FROM per),
          loo AS (SELECT
            ${duckPpm("tot.ss - per.s", "tot.nn - per.n")} AS t
            FROM per CROSS JOIN tot),
          ts AS (SELECT CAST(sum(t) AS BIGINT) AS ts FROM loo),
          hd AS (SELECT tot.g, tot.nn AS n,
            ${duckPpm("tot.ss", "tot.nn")} AS theta_ppm,
            ${duckPpm("ts.ts", "tot.g", 1)} AS jk_mean_ppm
            FROM tot CROSS JOIN ts),
          ssq AS (SELECT CAST(sum(
            CAST(loo.t - hd.jk_mean_ppm AS HUGEINT)
              * (loo.t - hd.jk_mean_ppm)) AS HUGEINT) AS ss2
            FROM loo CROSS JOIN hd),
          vr AS (SELECT hd.g, hd.n, hd.theta_ppm, hd.jk_mean_ppm,
            (hd.g - 1) * (hd.jk_mean_ppm - hd.theta_ppm) AS jk_bias_ppm,
            ${duckPpm("(hd.g - 1) * ssq.ss2", "hd.g", 1)} AS jk_var_ppm2
            FROM hd CROSS JOIN ssq),
          sq0 AS (SELECT *, CAST(floor(sqrt(CAST(jk_var_ppm2 AS DOUBLE)))
            AS BIGINT) AS s0 FROM vr),
          sq1 AS (SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= jk_var_ppm2
            THEN s0 + 1 ELSE s0 END AS s1 FROM sq0)
          SELECT g, n, theta_ppm, jk_mean_ppm, jk_bias_ppm, jk_var_ppm2,
            CASE WHEN s1 * s1 > jk_var_ppm2 THEN s1 - 1 ELSE s1 END
              AS jk_se_ppm
          FROM sq1""",

    "q_bootstrap_ci" ->
      s"""WITH t AS (SELECT doc_id AS id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS x FROM documents),
          bb AS (SELECT unnest(range(0, 64)) AS b),
          u AS (SELECT bb.b, t.x,
            ${duckMixOf("(t.id * 64 + bb.b)")} % 1000000 AS u
            FROM t CROSS JOIN bb),
          w AS (SELECT b, x,
            CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
              WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
              WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
              WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
              WHEN u < 999999 THEN 8 ELSE 9 END AS w FROM u),
          m AS (SELECT b, CAST(sum(w) AS BIGINT) AS n,
            CAST(sum(CAST(w AS HUGEINT) * x) AS HUGEINT) AS s
            FROM w GROUP BY 1),
          mm AS (SELECT b, CASE WHEN n = 0 THEN NULL
            ELSE ${duckPpm("s", "n")} END AS m FROM m),
          r AS (SELECT m, row_number() OVER
            (ORDER BY m ASC NULLS FIRST, b ASC) AS rk FROM mm),
          p AS (SELECT CASE WHEN count(*) = 0 THEN NULL
            ELSE ${duckPpm("sum(x)", "count(*)")} END AS point_ppm FROM t)
          SELECT CAST(64 AS BIGINT) AS b_reps, p.point_ppm,
            lo.m AS lo_ppm, hi.m AS hi_ppm
          FROM p
          CROSS JOIN (SELECT m FROM r WHERE rk = 2) lo
          CROSS JOIN (SELECT m FROM r WHERE rk = 63) hi""",

    "q_wasserstein" ->
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v FROM documents
            WHERE lang IN ('en', 'fr')),
          c AS (SELECT v,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
            FROM t GROUP BY 1),
          cm AS (SELECT v,
            sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS cca,
            sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS ccb,
            lead(v) OVER (ORDER BY v) AS nv
            FROM c),
          tt AS (SELECT CAST(max(cca) AS BIGINT) AS n_a,
            CAST(max(ccb) AS BIGINT) AS n_b FROM cm),
          nm AS (SELECT CAST(coalesce(sum(CAST(nv - v AS HUGEINT) *
            abs(cca * tt.n_b - ccb * tt.n_a)), 0) AS HUGEINT) AS num
            FROM cm CROSS JOIN tt WHERE nv IS NOT NULL)
          SELECT tt.n_a, tt.n_b, CAST(nm.num AS BIGINT) AS w1_num,
            CASE WHEN tt.n_a = 0 OR tt.n_b = 0 THEN NULL
              ELSE ${duckPpm("nm.num", "CAST(tt.n_a AS HUGEINT) * tt.n_b")}
            END AS w1_ppm
          FROM tt CROSS JOIN nm""",

    "q_stump" ->
      s"""WITH t AS (SELECT CAST(len(${duckToks("text")}) AS BIGINT) AS v,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p FROM documents),
          c AS (SELECT v, CAST(sum(p) AS BIGINT) AS pv,
            CAST(sum(1 - p) AS BIGINT) AS qv FROM t GROUP BY 1),
          cum AS (SELECT v,
            sum(pv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS pl,
            sum(qv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS ql
            FROM c),
          tot AS (SELECT CAST(coalesce(max(pl), 0) AS BIGINT) AS tp,
            CAST(coalesce(max(ql), 0) AS BIGINT) AS tq FROM cum),
          root AS (SELECT tp, tq, tp + tq AS n,
            CASE WHEN tp + tq = 0 THEN NULL
              ELSE ${duckPpm(
                """CAST(tp + tq AS HUGEINT) * (tp + tq) -
                   CAST(tp AS HUGEINT) * tp - CAST(tq AS HUGEINT) * tq""",
                "CAST(tp + tq AS HUGEINT) * (tp + tq)")} END AS root_ppm
            FROM tot),
          cand AS (SELECT cum.v, root.root_ppm,
              pl + ql AS nl, root.n - pl - ql AS nr,
              (CAST(pl + ql AS HUGEINT) * (pl + ql) -
               CAST(pl AS HUGEINT) * pl - CAST(ql AS HUGEINT) * ql) *
                (root.n - pl - ql) +
              (CAST(root.n - pl - ql AS HUGEINT) * (root.n - pl - ql) -
               CAST(root.tp - pl AS HUGEINT) * (root.tp - pl) -
               CAST(root.tq - ql AS HUGEINT) * (root.tq - ql)) *
                (pl + ql) AS num,
              CAST(root.n AS HUGEINT) * (pl + ql) * (root.n - pl - ql)
                AS den
            FROM cum CROSS JOIN root
            WHERE pl + ql < root.n),
          scored AS (SELECT v, nl, nr, ${duckPpm("num", "den")}
              AS imp_ppm, root_ppm FROM cand),
          best AS (SELECT CAST(v AS BIGINT) AS threshold,
              CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
              imp_ppm, root_ppm
            FROM scored ORDER BY imp_ppm, v LIMIT 1),
          nosplit AS (SELECT CAST(NULL AS BIGINT) AS threshold,
              CAST(n AS BIGINT) AS n_left, CAST(0 AS BIGINT) AS n_right,
              CAST(NULL AS BIGINT) AS imp_ppm, root_ppm
            FROM root WHERE (SELECT count(*) FROM cand) = 0)
          SELECT * FROM best UNION ALL SELECT * FROM nosplit""",

    "q_zorder" ->
      s"""WITH t AS (SELECT CAST(l_partkey % 1024 AS BIGINT) AS px,
            CAST(l_suppkey % 1024 AS BIGINT) AS sy FROM lineitem),
          z AS (SELECT px, sy, (${duckZ("px", "sy", 10)}) >> 14 AS bucket
            FROM t)
          SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
            CAST(min(px) AS BIGINT) AS min_x, CAST(max(px) AS BIGINT)
              AS max_x,
            CAST(min(sy) AS BIGINT) AS min_y, CAST(max(sy) AS BIGINT)
              AS max_y
          FROM z GROUP BY 1 ORDER BY bucket""",

    "q_compaction_plan" ->
      s"""WITH f AS (SELECT source || '/' || lang AS k,
            CAST(sum(n_chars) AS BIGINT) AS sz FROM documents GROUP BY 1),
          tt AS (SELECT CAST(sum(sz) AS BIGINT) AS tot FROM f),
          c AS (SELECT k, sz,
            sum(sz) OVER (ORDER BY sz DESC, k ASC ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS cum
            FROM f)
          SELECT CASE WHEN tot <= 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(((cum - sz) * 6) // tot AS BIGINT) END AS bin,
            CAST(count(*) AS BIGINT) AS n_files,
            CAST(sum(sz) AS BIGINT) AS bytes
          FROM c CROSS JOIN tt GROUP BY 1 ORDER BY bin""",

    "q_robust_shape" ->
      s"""WITH t AS (SELECT lang AS g,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v FROM documents
            WHERE lang IS NOT NULL),
          r AS (SELECT g, v,
            row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
            count(*) OVER (PARTITION BY g) AS n FROM t),
          qs AS (SELECT CAST(unnest([1250, 2500, 3750, 5000, 6250, 7500,
            8750]) AS BIGINT) AS q),
          e AS (SELECT g, q, v FROM r CROSS JOIN qs
            WHERE rn = greatest(1, (n * q + 9999) // 10000)),
          p AS (SELECT g,
            max(CASE WHEN q = 1250 THEN v END) AS e1,
            max(CASE WHEN q = 2500 THEN v END) AS e2,
            max(CASE WHEN q = 3750 THEN v END) AS e3,
            max(CASE WHEN q = 5000 THEN v END) AS e4,
            max(CASE WHEN q = 6250 THEN v END) AS e5,
            max(CASE WHEN q = 7500 THEN v END) AS e6,
            max(CASE WHEN q = 8750 THEN v END) AS e7
            FROM e GROUP BY 1)
          SELECT g AS lang,
            CASE WHEN e6 = e2 THEN NULL
              ELSE ${duckPpm("e6 + e2 - 2 * e4", "e6 - e2")}
            END AS bowley_ppm,
            CASE WHEN e6 = e2 THEN NULL
              ELSE ${duckPpm("(e7 - e5) + (e3 - e1)", "e6 - e2")}
            END AS moors_ppm
          FROM p ORDER BY lang""",

    "q_levene" ->
      s"""WITH t AS (SELECT lang AS g,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v FROM documents),
          r AS (SELECT g, v,
            row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
            count(*) OVER (PARTITION BY g) AS n FROM t),
          md AS (SELECT g, v AS med FROM r
            WHERE rn = greatest(1, (n * 5000 + 9999) // 10000)),
          z AS (SELECT t.g, abs(t.v - md.med) AS zv
            FROM t JOIN md USING (g)),
          per AS (SELECT g, CAST(count(*) AS BIGINT) AS ni,
            CAST(sum(zv) AS BIGINT) AS si,
            CAST(sum(CAST(zv AS HUGEINT) * zv) AS HUGEINT) AS ti
            FROM z GROUP BY 1),
          pa AS (SELECT ni, si, ti,
            (CAST(si AS HUGEINT) * si * 1000000) // ni AS ai FROM per),
          ag AS (SELECT CAST(sum(ni) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS k,
            CAST(sum(si) AS HUGEINT) AS s, sum(ai) AS a,
            sum(ti * 1000000 - ai) AS ssw FROM pa),
          fin AS (SELECT n, k,
            greatest(a - (s * s * 1000000) // n, 0) AS ssb, ssw
            FROM ag)
          SELECT n, k,
            CASE WHEN k < 2 OR n <= k OR ssw <= 0 THEN NULL
              ELSE ${duckPpm("(n - k) * ssb", "(k - 1) * ssw")}
            END AS f_ppm
          FROM fin""",

    "q_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk
            FROM documents),
          hits AS (SELECT doc_id, i - 1 AS p FROM
            (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
             FROM tk)
            WHERE tk[i] = 'slow' AND tk[i + 1] = 'hash'
              AND tk[i + 2] = 'batch')
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
            CAST(min(p) AS BIGINT) AS first_pos
          FROM hits GROUP BY 1 ORDER BY doc_id""",

    "q_slice_accuracy" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte()},
          pr AS (SELECT f.doc_id, f.class AS pc, dd.lang
            FROM fin f JOIN documents dd USING (doc_id) WHERE f.rn = 1),
          a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(CASE WHEN pc = lang THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_correct
            FROM pr GROUP BY 1)
          SELECT lang, n, n_correct, ${duckPpm("n_correct", "n")}
            AS acc_ppm
          FROM a ORDER BY lang""",

    "q_corr_matrix" -> duckCorrMatrix,

    "q_image_dhash" -> duckDhash,

    "q_entropy_rate" ->
      s"""WITH e AS (SELECT user_id, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS nxt
            FROM events),
          p AS (SELECT event_type AS f, nxt AS t,
            CAST(count(*) AS BIGINT) AS c
            FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
          ft AS (SELECT f, CAST(sum(c) AS BIGINT) AS ci FROM p
            GROUP BY 1),
          lx AS (SELECT DISTINCT c AS x FROM p
            UNION SELECT DISTINCT ci FROM ft),
          $duckLog2Chain,
          terms AS (SELECT p.c, p.c * (li.lq - lc.lq) AS t
            FROM p JOIN ft USING (f)
            JOIN lgt li ON li.x = ft.ci
            JOIN lgt lc ON lc.x = p.c)
          SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_transitions,
            (SELECT CAST(count(*) AS BIGINT) FROM ft) AS n_states,
            CAST(sum(t) AS BIGINT) AS h2_q,
            CASE WHEN coalesce(sum(c), 0) = 0 THEN NULL
              ELSE round(CAST(sum(t) AS DOUBLE) /
                (CAST(sum(c) AS DOUBLE) * 65536.0), 6) END AS h_bits
          FROM terms""",

    "q_runs_test" ->
      s"""WITH dc AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
            CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
          kk AS (SELECT CAST(sum(y) // count(*) AS BIGINT) AS k FROM dc),
          s AS (SELECT day, y > kk.k AS f FROM dc CROSS JOIN kk),
          p AS (SELECT day, f, lag(f) OVER (ORDER BY day) AS pf FROM s),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(CASE WHEN f THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_true,
            CAST(1 + coalesce(sum(CASE WHEN pf IS NOT NULL AND f <> pf
              THEN 1 ELSE 0 END), 0) AS BIGINT) AS runs
            FROM p)
          SELECT n, n_true, runs,
            CASE WHEN 2 * n_true * (n - n_true) <= n THEN NULL
              ELSE ${duckPpm(
                """(CAST(runs AS HUGEINT) * n - n -
                    2 * n_true * (n - n_true)) *
                   (CAST(runs AS HUGEINT) * n - n -
                    2 * n_true * (n - n_true)) * (n - 1)""",
                """CAST(2 * n_true AS HUGEINT) * (n - n_true) *
                   (2 * n_true * (n - n_true) - n)""")}
            END AS z2_ppm
          FROM a""",

    "q_mcnemar" ->
      s"""WITH td AS MATERIALIZED (SELECT doc_id, lang, t.word AS token
            FROM (SELECT doc_id, lang, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(t.word, '^[a-z]+$$')),
          cnt AS MATERIALIZED (SELECT lang AS class, token,
            CAST(count(*) AS BIGINT) AS n FROM td GROUP BY 1, 2),
          cls AS (SELECT class, sum(n) AS nc FROM cnt GROUP BY 1),
          voc AS (SELECT DISTINCT token FROM cnt),
          vct AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
          grid AS MATERIALIZED (SELECT c.class, w.token,
              coalesce(ct.n, CAST(0 AS BIGINT)) AS n, c.nc, vct.v
            FROM cls c CROSS JOIN voc w CROSS JOIN vct
            LEFT JOIN cnt ct ON ct.class = c.class AND ct.token = w.token),
          pri AS (SELECT lang AS class, CAST(count(*) AS BIGINT) AS nd
            FROM documents GROUP BY 1),
          cnt2 AS MATERIALIZED (SELECT lang AS class, token,
            CAST(count(*) AS BIGINT) AS n FROM td
            WHERE doc_id % 2 = 0 GROUP BY 1, 2),
          cls2 AS (SELECT class, sum(n) AS nc FROM cnt2 GROUP BY 1),
          voc2 AS (SELECT DISTINCT token FROM cnt2),
          vct2 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc2),
          grid2 AS MATERIALIZED (SELECT c.class, w.token,
              coalesce(ct.n, CAST(0 AS BIGINT)) AS n, c.nc, vct2.v
            FROM cls2 c CROSS JOIN voc2 w CROSS JOIN vct2
            LEFT JOIN cnt2 ct ON ct.class = c.class
              AND ct.token = w.token),
          pri2 AS (SELECT lang AS class, CAST(count(*) AS BIGINT) AS nd
            FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
          lx AS (SELECT DISTINCT x FROM (
            SELECT n + 1 AS x FROM grid
            UNION SELECT nc + v FROM grid
            UNION SELECT nd FROM pri
            UNION SELECT n + 1 FROM grid2
            UNION SELECT nc + v FROM grid2
            UNION SELECT nd FROM pri2)),
          $duckLog2Chain,
          wts AS MATERIALIZED (SELECT grid.class, grid.token,
              ln1.lq - ld.lq AS w_q
            FROM grid JOIN lgt ln1 ON ln1.x = grid.n + 1
            JOIN lgt ld ON ld.x = grid.nc + grid.v),
          wts2 AS MATERIALIZED (SELECT grid2.class, grid2.token,
              ln1.lq - ld.lq AS w_q
            FROM grid2 JOIN lgt ln1 ON ln1.x = grid2.n + 1
            JOIN lgt ld ON ld.x = grid2.nc + grid2.v),
          ${duckNbPredCte()},
          sc2 AS (SELECT td.doc_id, w.class, sum(w.w_q) AS s
            FROM td JOIN wts2 w ON w.token = td.token GROUP BY 1, 2),
          fin2 AS (SELECT sc2.doc_id, sc2.class,
              row_number() OVER (PARTITION BY sc2.doc_id
                ORDER BY sc2.s + lp.lq DESC, sc2.class ASC) AS rn
            FROM sc2 JOIN pri2 ON pri2.class = sc2.class
            JOIN lgt lp ON lp.x = pri2.nd),
          pa AS (SELECT doc_id, class AS p FROM fin WHERE rn = 1),
          pb AS (SELECT doc_id, class AS p FROM fin2 WHERE rn = 1),
          pp AS (SELECT dd.doc_id,
            coalesce(pa.p = dd.lang, false) AS ra,
            coalesce(pb.p = dd.lang, false) AS rb
            FROM documents dd LEFT JOIN pa USING (doc_id)
            LEFT JOIN pb USING (doc_id)),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END),
              0) AS BIGINT) AS b,
            CAST(coalesce(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END),
              0) AS BIGINT) AS c FROM pp)
          SELECT n, b, c,
            CASE WHEN b + c = 0 THEN NULL
              ELSE ${duckPpm("(b - c) * (b - c)", "b + c")}
            END AS chi2_ppm
          FROM ag""",

    "q_good_turing" ->
      s"""WITH tk AS (SELECT unnest(${duckToks("text")}) AS w
            FROM documents),
          c AS (SELECT w, count(*) AS n FROM tk GROUP BY 1),
          a AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
            CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 END), 0) AS BIGINT)
              AS f1
            FROM c)
          SELECT n_tokens, f1,
            CASE WHEN n_tokens = 0 THEN NULL
              ELSE ${duckPpm("f1", "n_tokens")} END AS p0_ppm
          FROM a""",

    "q_sgt_counts" ->
      s"""WITH tks AS (SELECT ${duckToks("text")} AS tk FROM documents),
          sh0 AS (SELECT unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tks),
          tk AS (SELECT ${duckPolyId("gram")} AS w FROM sh0),
          c AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM tk
            GROUP BY 1),
          fr AS (SELECT r, CAST(count(*) AS BIGINT) AS f_r FROM c
            WHERE r <= 11 GROUP BY 1),
          nx AS (SELECT r, f_r,
            CASE WHEN lead(r) OVER (ORDER BY r) = r + 1
              THEN lead(f_r) OVER (ORDER BY r) ELSE 0 END AS fn
            FROM fr)
          SELECT r, f_r, ${duckPpm("(r + 1) * fn", "f_r")} AS rstar_ppm
          FROM nx WHERE r <= 10 ORDER BY r""",

    "q_seasonality" ->
      s"""WITH dw AS (SELECT isodow(CAST(ts AS DATE)) - 1 AS d
            FROM events),
          c AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM dw
            GROUP BY 1),
          g AS (SELECT CAST(gs.d AS BIGINT) AS d, coalesce(c.c, 0) AS c
            FROM (SELECT unnest(range(0, 7)) AS d) gs
            LEFT JOIN c ON c.d = gs.d),
          t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
          cells AS (SELECT t.n,
            (CAST(7 * g.c - t.n AS HUGEINT) * (7 * g.c - t.n) * 1000000)
              // (7 * CAST(t.n AS HUGEINT)) AS cell
            FROM g CROSS JOIN t)
          SELECT n, CAST(sum(cell) AS BIGINT) AS chi2_q
          FROM cells GROUP BY 1""",

    "q_chao1" ->
      s"""WITH tk AS (SELECT unnest(${duckToks("text")}) AS w
            FROM documents),
          c AS (SELECT w, count(*) AS n FROM tk GROUP BY 1),
          a AS (SELECT CAST(count(*) AS BIGINT) AS d_obs,
            CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 END), 0) AS BIGINT)
              AS f1,
            CAST(coalesce(sum(CASE WHEN n = 2 THEN 1 END), 0) AS BIGINT)
              AS f2
            FROM c)
          SELECT d_obs, f1, f2,
            CAST(d_obs + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
              AS chao1
          FROM a""",

    "q_ess" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk
            FROM documents),
          toks AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
          b AS (SELECT doc_id, ${duckPolyId("tok")} % 512 AS bkt FROM toks),
          rc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS rc FROM b
            WHERE doc_id >= 10 GROUP BY 1),
          tc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS tc FROM b
            WHERE doc_id < 10 GROUP BY 1),
          tot AS (SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM b WHERE doc_id >= 10) AS n_r,
            (SELECT CAST(count(*) AS BIGINT) FROM b WHERE doc_id < 10) AS n_t),
          r AS (SELECT rc.bkt,
            CAST((CAST(coalesce(tc.tc, 0) + 1 AS HUGEINT) * (n_r + 512)
                    * 1000000)
                 // (CAST(rc.rc + 1 AS HUGEINT) * (n_t + 512)) AS BIGINT)
              AS lr_q
            FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tot),
          sc AS (SELECT b.doc_id,
            CAST(sum(lr_q) AS BIGINT) AS lr_sum,
            CAST(count(*) AS BIGINT) AS n_tokens
            FROM b JOIN r USING (bkt) WHERE b.doc_id >= 10 GROUP BY 1),
          wts AS (SELECT CAST(lr_sum // n_tokens AS BIGINT) AS w FROM sc
            WHERE lr_sum // n_tokens >= 0),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(w) AS BIGINT) AS w_sum,
            CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS ws2 FROM wts)
          SELECT n, w_sum,
            CASE WHEN ws2 = 0 THEN NULL
              ELSE CAST((CAST(w_sum AS HUGEINT) * w_sum) // ws2 AS BIGINT)
            END AS ess_floor,
            CASE WHEN ws2 = 0 THEN NULL
              ELSE ${duckPpm("CAST(w_sum AS HUGEINT) * w_sum", "n * ws2")}
            END AS ess_ratio_ppm
          FROM a""",

    "q_hill_tail" ->
      s"""WITH t AS (SELECT CAST(len(${duckToks("text")}) AS BIGINT) AS x
            FROM documents WHERE len(${duckToks("text")}) >= 1),
          r AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn
            FROM t),
          top AS (SELECT x FROM r WHERE rn <= 100),
          thr AS (SELECT x AS xt FROM r WHERE rn = 101),
          lx AS (SELECT DISTINCT x FROM top
            UNION SELECT xt FROM thr),
          $duckLog2Chain,
          agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
            CAST(sum(l.lq) AS BIGINT) AS sl
            FROM top JOIN lgt l ON l.x = top.x),
          tl AS (SELECT thr.xt, l.lq AS lt FROM thr
            JOIN lgt l ON l.x = thr.xt)
          SELECT agg.k, tl.xt AS x_threshold,
            CAST(agg.sl - agg.k * tl.lt AS BIGINT) AS hill2_q,
            CASE WHEN agg.sl - agg.k * tl.lt <= 0 THEN NULL
              ELSE ${duckPpm("agg.k * 65536", "agg.sl - agg.k * tl.lt")}
            END AS alpha_ppm
          FROM agg CROSS JOIN tl""",

    "q_neyman_alloc" ->
      s"""WITH t AS (SELECT source AS g,
            CAST(len(${duckToks("text")}) AS BIGINT) AS x FROM documents),
          per AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS t2
            FROM t GROUP BY 1),
          wq AS (SELECT g, n_rows,
            CASE WHEN n_rows < 2 THEN 0
              ELSE CAST(floor(sqrt(
                CAST(n_rows * t2 - CAST(s AS HUGEINT) * s AS DOUBLE) *
                CAST(n_rows AS DOUBLE) / CAST(n_rows - 1 AS DOUBLE)))
                AS BIGINT) END AS w_q
            FROM per),
          tot AS (SELECT CAST(sum(w_q) AS BIGINT) AS w,
            CAST(count(*) AS BIGINT) AS k FROM wq),
          sh AS (SELECT g, n_rows, w_q,
            CASE WHEN tot.w = 0 THEN 1 ELSE w_q END AS we,
            CASE WHEN tot.w = 0 THEN tot.k ELSE tot.w END AS weff
            FROM wq CROSS JOIN tot),
          base AS (SELECT g, n_rows, w_q,
            (100 * we) // weff AS b, (100 * we) % weff AS rem FROM sh),
          sb AS (SELECT CAST(sum(b) AS BIGINT) AS sum_base FROM base),
          rk AS (SELECT g, n_rows, w_q, b, sum_base,
            row_number() OVER (ORDER BY rem DESC, g ASC) AS r
            FROM base CROSS JOIN sb)
          SELECT g AS source, n_rows, w_q,
            CAST(b + CASE WHEN r <= 100 - sum_base THEN 1 ELSE 0 END
              AS BIGINT) AS alloc
          FROM rk ORDER BY source""",

    "q_ht_estimate" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v,
            (${duckBucketOf("doc_id")} < 1000) AS inc FROM documents),
          a AS (SELECT
            CAST(coalesce(sum(CASE WHEN inc THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_sampled,
            CAST(coalesce(sum(CASE WHEN inc THEN v ELSE 0 END), 0)
              AS BIGINT) AS sample_total,
            CAST(coalesce(sum(v), 0) AS BIGINT) AS true_total FROM t)
          SELECT n_sampled, sample_total,
            CAST((sample_total * 10000) // 1000 AS BIGINT) AS est_total,
            true_total,
            CAST((sample_total * 10000) // 1000 - true_total AS BIGINT)
              AS err
          FROM a""",

    "q_overdispersion" ->
      s"""WITH dc AS (SELECT event_type,
            strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
          a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS t
            FROM dc GROUP BY 1)
          SELECT event_type, n,
            CASE WHEN n < 2 OR s <= 0 THEN NULL
              ELSE ${duckPpm("n * t - CAST(s AS HUGEINT) * s",
                "(n - 1) * CAST(s AS HUGEINT)")}
            END AS fano_ppm
          FROM a ORDER BY event_type""",

    "q_char_entropy" ->
      s"""WITH ch AS (SELECT doc_id,
            substr(text, CAST(i AS INTEGER), 1) AS ch FROM
            (SELECT doc_id, text,
              unnest(range(1, length(text) + 1)) AS i FROM documents)),
          cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
            FROM ch GROUP BY 1, 2),
          nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
            FROM cc GROUP BY 1),
          lx AS (SELECT DISTINCT c AS x FROM cc
            UNION SELECT DISTINCT n FROM nn),
          $duckLog2Chain,
          sl AS (SELECT cc.doc_id, CAST(sum(cc.c * l.lq) AS BIGINT) AS sl
            FROM cc JOIN lgt l ON l.x = cc.c GROUP BY 1)
          SELECT nn.doc_id, nn.n AS n_chars_h,
            CAST(nn.n * ln.lq - sl.sl AS BIGINT) AS h2_q,
            round(CAST(nn.n * ln.lq - sl.sl AS DOUBLE) /
              (CAST(nn.n AS DOUBLE) * 65536.0), 6) AS bits_per_char
          FROM nn JOIN lgt ln ON ln.x = nn.n JOIN sl USING (doc_id)
          ORDER BY doc_id""",

    "q_changepoint" ->
      s"""WITH dc AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d')
              AS day,
            CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
          p AS (SELECT day, y,
            sum(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS st,
            row_number() OVER (ORDER BY day) AS t FROM dc),
          tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(y) AS BIGINT) AS s FROM dc),
          c AS (SELECT day, t, st, n, s,
            CASE WHEN s = 0 THEN 0
              ELSE (CAST(st * n - s * t AS HUGEINT) *
                (st * n - s * t) * 1000000)
                // (CAST(t AS HUGEINT) * (n - t) * s * s) END AS gq
            FROM p CROSS JOIN tt WHERE t < n)
          SELECT n, day AS change_at, CAST(gq AS BIGINT) AS g_q,
            ${duckPpm("st", "t")} AS mean_left_ppm,
            ${duckPpm("s - st", "n - t")} AS mean_right_ppm
          FROM c ORDER BY gq DESC, day LIMIT 1""",

    "q_seq_patterns" ->
      s"""WITH e AS (SELECT user_id, event_type,
            lead(event_type, 1) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS n1,
            lead(event_type, 2) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS n2
            FROM events),
          g AS (SELECT event_type || '->' || n1 || '->' || n2 AS pattern,
            user_id FROM e WHERE n1 IS NOT NULL AND n2 IS NOT NULL),
          a AS (SELECT pattern,
            CAST(count(DISTINCT user_id) AS BIGINT) AS support,
            CAST(count(*) AS BIGINT) AS n_occurrences
            FROM g GROUP BY 1)
          SELECT * FROM a ORDER BY support DESC, pattern LIMIT 10""",

    "q_theil_sen" ->
      s"""WITH dc AS (SELECT CAST(datediff('day', DATE '1970-01-01',
              CAST(ts AS DATE)) AS BIGINT) AS x,
            CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
          p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
            FROM dc a JOIN dc b ON a.x < b.x),
          s AS (SELECT ${duckPpm("y2 - y1", "x2 - x1")} AS sl FROM p),
          r AS (SELECT sl, row_number() OVER (ORDER BY sl) AS rn,
            count(*) OVER () AS np FROM s),
          m AS (SELECT sl AS slope_med_ppm, CAST(np AS BIGINT) AS n_pairs
            FROM r WHERE rn = (np * 5000 + 9999) // 10000),
          c AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM dc)
          SELECT c.n_points,
            CAST(coalesce(m.n_pairs, 0) AS BIGINT) AS n_pairs,
            m.slope_med_ppm
          FROM c LEFT JOIN m ON true""",

    "q_conformal" ->
      s"""WITH $duckNbChain,
          sc AS (SELECT td.doc_id, w.class, sum(w.w_q) AS s
            FROM td JOIN wts w ON w.token = td.token GROUP BY 1, 2),
          po AS MATERIALIZED (SELECT sc.doc_id, sc.class,
              sc.s + lp.lq AS score
            FROM sc JOIN pri ON pri.class = sc.class
            JOIN lgt lp ON lp.x = pri.nd),
          tp AS (SELECT doc_id, max(score) AS top FROM po GROUP BY 1),
          at AS (SELECT tp.doc_id,
              CAST(tp.top - po.score AS BIGINT) AS a,
              (tp.doc_id % 2 = 0) AS cal
            FROM tp JOIN documents dd USING (doc_id)
            LEFT JOIN po ON po.doc_id = tp.doc_id
              AND po.class = dd.lang),
          cc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
            CAST(count(a) AS BIGINT) AS m_cal FROM at WHERE cal),
          tu AS (SELECT a AS tau_q FROM
            (SELECT a, row_number() OVER (ORDER BY a) AS rn
             FROM at WHERE cal AND a IS NOT NULL) rr CROSS JOIN cc
            WHERE rn = (n_cal * 9000 + 9999) // 10000),
          ev AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
            CAST(coalesce(sum(CASE WHEN at.a IS NOT NULL
              AND at.a <= tu.tau_q THEN 1 ELSE 0 END), 0) AS BIGINT)
              AS covered
            FROM at LEFT JOIN tu ON true WHERE NOT at.cal),
          sz AS (SELECT CAST(count(*) AS BIGINT) AS sizes
            FROM po JOIN tp USING (doc_id) CROSS JOIN tu
            WHERE tp.doc_id % 2 = 1 AND tp.top - po.score <= tu.tau_q)
          SELECT cc.n_cal, cc.m_cal, tu.tau_q, ev.n_eval, ev.covered,
            CASE WHEN ev.n_eval = 0 OR tu.tau_q IS NULL THEN NULL
              ELSE ${duckPpm("ev.covered", "ev.n_eval")}
            END AS coverage_ppm,
            CASE WHEN ev.n_eval = 0 OR tu.tau_q IS NULL THEN NULL
              ELSE ${duckPpm("sz.sizes", "ev.n_eval")}
            END AS avg_set_ppm
          FROM cc CROSS JOIN ev CROSS JOIN sz LEFT JOIN tu ON true""",

    "q_pr_auc" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(",\n              sc.s + lp.lq AS score_q", mat = true)},
          mg AS (SELECT f1.doc_id, f1.class AS pred_class,
              CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
            FROM fin f1 JOIN fin f2
              ON f2.doc_id = f1.doc_id AND f2.rn = 2
            WHERE f1.rn = 1),
          lab AS (SELECT mg.margin_q AS scv,
            CASE WHEN mg.pred_class = dd.lang THEN 1 ELSE 0 END AS p
            FROM mg JOIN documents dd USING (doc_id)
            WHERE mg.margin_q IS NOT NULL),
          ps AS (SELECT scv, CAST(sum(p) AS BIGINT) AS np,
            CAST(count(*) - sum(p) AS BIGINT) AS nn
            FROM lab GROUP BY 1),
          cum AS (SELECT *,
            CAST(coalesce(sum(np) OVER (ORDER BY scv DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
              AS BIGINT) AS tpc,
            CAST(coalesce(sum(np + nn) OVER (ORDER BY scv DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
              AS BIGINT) AS ctc FROM ps),
          terms AS (SELECT np, nn,
            (CAST(tpc AS HUGEINT) * np * 1000000) // ctc AS t FROM cum),
          agg AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
            CAST(sum(nn) AS BIGINT) AS n_neg,
            CAST(coalesce(sum(t), 0) AS HUGEINT) AS sm FROM terms)
          SELECT n_pos, n_neg,
            CASE WHEN n_pos = 0 THEN NULL
              ELSE ${duckPpm("sm", "CAST(n_pos AS HUGEINT) * 1000000")}
            END AS ap_ppm
          FROM agg""",

    "q_rand_response" ->
      s"""WITH t AS (SELECT source,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b,
            CASE WHEN ${duckMixOf("doc_id")} % 3 = 0 THEN 1 ELSE 0 END
              AS f
            FROM documents),
          a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(b) AS BIGINT) AS true_cnt,
            CAST(sum((b + f) % 2) AS BIGINT) AS reported_cnt
            FROM t GROUP BY 1)
          SELECT source, n, true_cnt, reported_cnt,
            CAST((3 * reported_cnt - n) // 1 AS BIGINT) AS est_cnt,
            CAST((3 * reported_cnt - n) // 1 - true_cnt AS BIGINT) AS err
          FROM a ORDER BY source""",

    "q_mh_odds" ->
      s"""WITH t AS (SELECT source, lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS ntok
            FROM documents WHERE lang IN ('en', 'fr')),
          cells AS (SELECT source,
            CAST(sum(CASE WHEN lang = 'en' AND ntok >= 128
              THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN lang = 'en' AND ntok < 128
              THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN lang = 'fr' AND ntok >= 128
              THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN lang = 'fr' AND ntok < 128
              THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM t GROUP BY 1),
          w AS (SELECT *, a + b + c + d AS n FROM cells),
          agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
            CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
            CAST(sum(c) AS BIGINT) AS sc, CAST(sum(d) AS BIGINT) AS sd,
            CAST(sum(${duckPpm("CAST(a AS HUGEINT) * d", "n")})
              AS BIGINT) AS mhn,
            CAST(sum(${duckPpm("CAST(b AS HUGEINT) * c", "n")})
              AS BIGINT) AS mhd
            FROM w)
          SELECT n_strata,
            CASE WHEN sb * sc = 0 THEN NULL
              ELSE ${duckPpm("CAST(sa AS HUGEINT) * sd",
                "CAST(sb AS HUGEINT) * sc", 1000)} END
              AS or_crude_milli,
            CASE WHEN mhd = 0 THEN NULL
              ELSE ${duckPpm("mhn", "mhd", 1000)} END AS or_mh_milli
          FROM agg""",

    "q_odds_ratio" -> {
      val se2 = Seq("a", "b", "c", "d").map(x =>
        duckPpm("2", s"2 * $x + 1", 1000000000000L)).mkString(" + ")
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS ntok
            FROM documents WHERE lang IN ('en', 'fr')),
          cells AS (SELECT
            CAST(sum(CASE WHEN lang = 'en' AND ntok >= 128
              THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN lang = 'en' AND ntok < 128
              THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN lang = 'fr' AND ntok >= 128
              THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN lang = 'fr' AND ntok < 128
              THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM t),
          lx AS (SELECT DISTINCT x FROM (
            SELECT (2 * a + 1) * (2 * d + 1) AS x FROM cells
            UNION SELECT (2 * b + 1) * (2 * c + 1) FROM cells)),
          $duckLog2Chain,
          se AS (SELECT cells.*, ($se2) AS se2 FROM cells),
          q0 AS (SELECT *, CAST(floor(sqrt(CAST(se2 AS DOUBLE)))
            AS BIGINT) AS s0 FROM se),
          q1 AS (SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= se2
            THEN s0 + 1 ELSE s0 END AS s1 FROM q0),
          q2 AS (SELECT *, CASE WHEN s1 * s1 > se2 THEN s1 - 1
            ELSE s1 END AS sev FROM q1),
          fin AS (SELECT q2.*,
            CAST(l1.lq - l2.lq AS BIGINT) AS lor2_q,
            ${duckPpm("sev * 185315", "1000000", 1)} AS dq
            FROM q2
            JOIN lgt l1 ON l1.x = (2 * a + 1) * (2 * d + 1)
            JOIN lgt l2 ON l2.x = (2 * b + 1) * (2 * c + 1))
          SELECT a, b, c, d,
            CASE WHEN b * c = 0 THEN NULL
              ELSE ${duckPpm("CAST(a AS HUGEINT) * d",
                "CAST(b AS HUGEINT) * c", 1000)} END AS or_milli,
            lor2_q, CAST(lor2_q - dq AS BIGINT) AS ci_lo2_q,
            CAST(lor2_q + dq AS BIGINT) AS ci_hi2_q
          FROM fin"""
    },

    "q_energy_dist" ->
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v
            FROM documents WHERE lang IN ('en', 'fr')),
          cnt AS (SELECT v,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
            FROM t GROUP BY 1),
          cum AS (SELECT v, ca, cb,
            CAST(sum(ca) OVER win AS BIGINT) AS qa,
            CAST(sum(cb) OVER win AS BIGINT) AS qb,
            CAST(sum(CAST(ca AS HUGEINT) * v) OVER win AS HUGEINT) AS ra,
            CAST(sum(CAST(cb AS HUGEINT) * v) OVER win AS HUGEINT) AS rb
            FROM cnt WINDOW win AS (ORDER BY v ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW)),
          tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
            CAST(sum(cb) AS BIGINT) AS nb,
            CAST(sum(CAST(ca AS HUGEINT) * v) AS HUGEINT) AS rat,
            CAST(sum(CAST(cb AS HUGEINT) * v) AS HUGEINT) AS rbt
            FROM cnt),
          sums AS (SELECT
            CAST(sum(CAST(ca AS HUGEINT) *
              ((CAST(v AS HUGEINT) * qb - rb) + (tot.rbt - rb)
                - CAST(v AS HUGEINT) * (tot.nb - qb))) AS HUGEINT)
              AS sab,
            CAST(sum(CAST(ca AS HUGEINT) *
              ((CAST(v AS HUGEINT) * qa - ra) + (tot.rat - ra)
                - CAST(v AS HUGEINT) * (tot.na - qa))) AS HUGEINT)
              AS saa,
            CAST(sum(CAST(cb AS HUGEINT) *
              ((CAST(v AS HUGEINT) * qb - rb) + (tot.rbt - rb)
                - CAST(v AS HUGEINT) * (tot.nb - qb))) AS HUGEINT)
              AS sbb
            FROM cum CROSS JOIN tot)
          SELECT tot.na AS n_a, tot.nb AS n_b,
            CASE WHEN tot.na = 0 OR tot.nb = 0 THEN NULL
              ELSE ${duckPpm(
                "2 * sums.sab * tot.na * tot.nb" +
                  " - sums.saa * CAST(tot.nb AS HUGEINT) * tot.nb" +
                  " - sums.sbb * CAST(tot.na AS HUGEINT) * tot.na",
                "CAST(tot.na AS HUGEINT) * tot.na * tot.nb * tot.nb",
                1000)}
            END AS e_milli
          FROM tot CROSS JOIN sums""",

    "q_cronbach" -> {
      val items = Seq(
        s"CAST(len(${duckToks("text")}) AS BIGINT)",
        "CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT)",
        "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)",
        """greatest(CAST(1 AS BIGINT),
          CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))""")
      val defs = items.zipWithIndex
        .map { case (e, i) => s"$e AS i${i + 1}" }.mkString(",\n            ")
      val qs = (1 to 4).map(i =>
        s"""CAST(sum(i$i) AS BIGINT) AS s$i,
            CAST(sum(CAST(i$i AS HUGEINT) * i$i) AS HUGEINT) AS q$i""")
        .mkString(",\n            ")
      val itemNum = (1 to 4).map(i =>
        s"(n * q$i - CAST(s$i AS HUGEINT) * s$i)").mkString(" + ")
      s"""WITH t0 AS (SELECT $defs FROM documents),
          t AS (SELECT *, i1 + i2 + i3 + i4 AS it FROM t0),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            $qs,
            CAST(sum(it) AS BIGINT) AS st,
            CAST(sum(CAST(it AS HUGEINT) * it) AS HUGEINT) AS qt
            FROM t)
          SELECT n, CAST(4 AS BIGINT) AS k,
            CASE WHEN (n * qt - CAST(st AS HUGEINT) * st) <= 0 THEN NULL
              ELSE ${duckPpm(
                s"4 * ((n * qt - CAST(st AS HUGEINT) * st) - ($itemNum))",
                "3 * (n * qt - CAST(st AS HUGEINT) * st)", 1000)}
            END AS alpha_milli
          FROM s"""
    },

    "q_cohens_d" -> {
      val sq0 = "CAST(floor(sqrt(CAST(v12 AS DOUBLE))) AS BIGINT)"
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS x FROM documents),
          s AS (SELECT
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS na,
            CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
              AS nb,
            CAST(sum(CASE WHEN lang = 'en' THEN x ELSE 0 END) AS BIGINT)
              AS sa,
            CAST(sum(CASE WHEN lang = 'fr' THEN x ELSE 0 END) AS BIGINT)
              AS sb,
            CAST(sum(CASE WHEN lang = 'en' THEN x * x ELSE 0 END)
              AS HUGEINT) AS ssa,
            CAST(sum(CASE WHEN lang = 'fr' THEN x * x ELSE 0 END)
              AS HUGEINT) AS ssb
            FROM t),
          f AS (SELECT na, nb,
            CASE WHEN na = 0 THEN NULL ELSE ${duckPpm("sa", "na")} END
              AS mean_a_ppm,
            CASE WHEN nb = 0 THEN NULL ELSE ${duckPpm("sb", "nb")} END
              AS mean_b_ppm,
            (CAST(na AS HUGEINT) * ssa - CAST(sa AS HUGEINT) * sa) * nb +
            (CAST(nb AS HUGEINT) * ssb - CAST(sb AS HUGEINT) * sb) * na
              AS pnum,
            CAST(na AS HUGEINT) * nb * (na + nb - 2) AS pden
            FROM s),
          v AS (SELECT *, CASE WHEN na < 2 OR nb < 2 OR pnum < 0
            THEN NULL ELSE ${duckPpm("pnum", "pden", 1000000000000L)}
            END AS v12 FROM f),
          q0 AS (SELECT *, $sq0 AS s0 FROM v),
          q1 AS (SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= v12
            THEN s0 + 1 ELSE s0 END AS s1 FROM q0),
          q2 AS (SELECT na, nb, mean_a_ppm, mean_b_ppm, v12,
            CASE WHEN v12 IS NULL THEN NULL
              WHEN s1 * s1 > v12 THEN s1 - 1 ELSE s1 END AS sp_ppm
            FROM q1)
          SELECT na AS n_a, nb AS n_b, mean_a_ppm, mean_b_ppm, sp_ppm,
            CASE WHEN sp_ppm IS NULL OR sp_ppm = 0 THEN NULL
              ELSE ${duckPpm("mean_a_ppm - mean_b_ppm", "sp_ppm", 1000)}
            END AS d_milli
          FROM q2"""
    },

    "q_welch_t2" ->
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS x FROM documents),
          s AS (SELECT
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS na,
            CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
              AS nb,
            CAST(sum(CASE WHEN lang = 'en' THEN x ELSE 0 END) AS BIGINT)
              AS sa,
            CAST(sum(CASE WHEN lang = 'fr' THEN x ELSE 0 END) AS BIGINT)
              AS sb,
            CAST(sum(CASE WHEN lang = 'en' THEN x * x ELSE 0 END)
              AS HUGEINT) AS ssa,
            CAST(sum(CASE WHEN lang = 'fr' THEN x * x ELSE 0 END)
              AS HUGEINT) AS ssb
            FROM t),
          f AS (SELECT na, nb,
            CASE WHEN na = 0 THEN NULL ELSE ${duckPpm("sa", "na")} END
              AS mean_a_ppm,
            CASE WHEN nb = 0 THEN NULL ELSE ${duckPpm("sb", "nb")} END
              AS mean_b_ppm,
            (CAST(na AS HUGEINT) * ssa - CAST(sa AS HUGEINT) * sa) *
              (CAST(nb AS HUGEINT) * nb * (nb - 1)) +
            (CAST(nb AS HUGEINT) * ssb - CAST(sb AS HUGEINT) * sb) *
              (CAST(na AS HUGEINT) * na * (na - 1)) AS den,
            (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na) *
              (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na) *
              (CAST(na - 1 AS HUGEINT) * (nb - 1)) AS num
            FROM s)
          SELECT na AS n_a, nb AS n_b, mean_a_ppm, mean_b_ppm,
            CASE WHEN na < 2 OR nb < 2 OR den <= 0 THEN NULL
              ELSE ${duckPpm("num", "den")} END AS t2_ppm
          FROM f""",

    "q_mann_whitney" ->
      s"""WITH t AS (SELECT lang,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v FROM documents
            WHERE lang IN ('en', 'fr')),
          c AS (SELECT v,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
            FROM t GROUP BY 1),
          cm AS (SELECT v, ca, cb, ca + cb AS tv,
            sum(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS cc
            FROM c),
          s AS (SELECT
            CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_a,
            CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_b,
            CAST(coalesce(sum(CAST(ca AS HUGEINT) *
              (2 * (cc - tv) + tv + 1)), 0) AS HUGEINT) AS r2a,
            CAST(coalesce(sum(CAST(tv AS HUGEINT) * tv * tv - tv), 0)
              AS HUGEINT) AS ties3
            FROM cm),
          f AS (SELECT n_a, n_b,
            r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2a,
            r2a - CAST(n_a AS HUGEINT) * (n_a + 1) -
              CAST(n_a AS HUGEINT) * n_b AS dev,
            CAST(n_a + n_b AS HUGEINT) AS n, ties3 FROM s)
          SELECT n_a, n_b, CAST(u2a AS BIGINT) AS u2_a,
            CASE WHEN n_a = 0 OR n_b = 0
                OR n * n * n - n - ties3 = 0 THEN NULL
              ELSE ${duckPpm("3 * n * (n - 1) * dev * dev",
                "CAST(n_a AS HUGEINT) * n_b * (n * n * n - n - ties3)")}
            END AS z2_ppm
          FROM f""",

    // The mannWhitney rank machinery over ALL langs: ppm stages in the
    // pinned order (per-group S_i²/(4·n_i·N(N+1)), linear combination,
    // one H/C divide) — HUGEINT intermediates, BIGINT gate columns.
    "q_kruskal" -> {
      val t1ppm = duckPpm("CAST(s_i AS HUGEINT) * s_i",
        "CAST(4 AS HUGEINT) * n_i * tot.n * (tot.n + 1)")
      s"""WITH t AS (SELECT lang AS g,
            CAST(len(${duckToks("text")}) AS BIGINT) AS v FROM documents
            WHERE lang IS NOT NULL),
          c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
            FROM t GROUP BY 1, 2),
          dom AS (SELECT v, CAST(sum(c) AS BIGINT) AS tv
            FROM c GROUP BY 1),
          dc2 AS (SELECT v, tv,
            sum(tv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS cc FROM dom),
          grp AS (SELECT c.g, CAST(sum(c.c) AS BIGINT) AS n_i,
            CAST(sum(CAST(c.c AS HUGEINT) *
              (2 * (dc2.cc - dc2.tv) + dc2.tv + 1)) AS BIGINT) AS s_i
            FROM c JOIN dc2 ON dc2.v = c.v GROUP BY 1),
          tot AS (SELECT CAST(sum(tv) AS BIGINT) AS n,
            CAST(sum(CAST(tv AS HUGEINT) * tv * tv - tv) AS HUGEINT) AS t3
            FROM dom),
          t1 AS (SELECT grp.g, $t1ppm AS t1
            FROM grp CROSS JOIN tot),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
            CAST(sum(t1) AS BIGINT) AS st FROM t1),
          fin AS (SELECT ag.k_groups, tot.n,
            CAST(12 * ag.st - 3 * (tot.n + 1) * 1000000 AS BIGINT)
              AS h_ppm,
            ${duckPpm(
        "CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n - tot.t3",
        "CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n")} AS c_ppm
            FROM ag CROSS JOIN tot)
          SELECT k_groups, n, h_ppm, c_ppm,
            CASE WHEN c_ppm <= 0 THEN NULL
              ELSE ${duckPpm("h_ppm", "c_ppm")} END AS h_adj_ppm
          FROM fin"""
    },

    "q_cusum" ->
      s"""WITH dc AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
            CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
          kk AS (SELECT CAST(sum(n_events) // count(*) AS BIGINT) AS k
            FROM dc),
          p AS (SELECT day, n_events,
            sum(n_events - kk.k) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
            kk.k FROM dc CROSS JOIN kk),
          m AS (SELECT day, n_events, p, k,
            least(CAST(0 AS BIGINT), min(p) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS mn
            FROM p)
          SELECT day, n_events, CAST(p - mn AS BIGINT) AS cusum,
            (p - mn) > 2 * k AS alarm
          FROM m ORDER BY day""",

    "q_kendall" ->
      s"""WITH m AS (SELECT source, CAST(count(*) AS BIGINT) AS nd,
            CAST(sum(len(${duckToks("text")})) AS BIGINT) AS nt
            FROM documents GROUP BY 1),
          p AS (SELECT sign(b.nd - a.nd) * sign(b.nt - a.nt) AS s
            FROM m a JOIN m b ON a.source < b.source),
          c AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(coalesce(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS concordant,
            CAST(coalesce(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS discordant FROM p)
          SELECT n_pairs, concordant, discordant,
            CASE WHEN n_pairs = 0 THEN NULL
              ELSE ${duckPpm("concordant - discordant", "n_pairs")}
            END AS tau_ppm
          FROM c""",

    "q_feature_mi" ->
      s"""WITH td AS (SELECT doc_id, lang, t.word AS token
            FROM (SELECT doc_id, lang, unnest(${duckToks("text")}) AS word
                  FROM documents) t
            WHERE regexp_matches(t.word, '^[a-z]+$$')),
          cnt AS MATERIALIZED (SELECT lang AS class, token,
            CAST(count(*) AS BIGINT) AS n FROM td GROUP BY 1, 2),
          bt AS (SELECT token, sum(n) AS nt FROM cnt GROUP BY 1),
          bc AS (SELECT class, sum(n) AS nc FROM cnt GROUP BY 1),
          tt AS (SELECT sum(n) AS nn FROM cnt),
          lx AS (SELECT DISTINCT x FROM (
            SELECT cnt.n * tt.nn AS x FROM cnt, tt
            UNION SELECT bt.nt * bc.nc
              FROM cnt JOIN bt USING (token) JOIN bc USING (class))),
          $duckLog2Chain,
          mi AS (SELECT cnt.token, bt.nt, tt.nn,
            sum(cnt.n * (la.lq - lb.lq)) AS mi_num
            FROM cnt JOIN bt USING (token) JOIN bc USING (class)
            CROSS JOIN tt
            JOIN lgt la ON la.x = cnt.n * tt.nn
            JOIN lgt lb ON lb.x = bt.nt * bc.nc
            GROUP BY 1, 2, 3)
          SELECT token, CAST(nt AS BIGINT) AS n_t,
            CAST(mi_num AS BIGINT) AS mi_num,
            round(CAST(mi_num AS DOUBLE) / (CAST(nn AS DOUBLE) * 65536.0),
              6) AS mi_bits
          FROM mi ORDER BY mi_num DESC, token LIMIT 20""",

    "q_nb_lang" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(", sc.s + lp.lq AS score_q")}
          SELECT doc_id, class AS pred_class,
            CAST(score_q AS BIGINT) AS score_q FROM fin
          WHERE rn = 1 ORDER BY doc_id""",

    "q_nb_margin" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(",\n              sc.s + lp.lq AS score_q", mat = true)}
          SELECT f1.doc_id, f1.class AS pred_class,
            CAST(f1.score_q AS BIGINT) AS score_q,
            CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
          FROM fin f1 LEFT JOIN fin f2
            ON f2.doc_id = f1.doc_id AND f2.rn = 2
          WHERE f1.rn = 1 ORDER BY f1.doc_id""",

    // The NB prediction chain binarized on 'en', grouped by source:
    // per-group confusion cells, ppm TPR/FPR, max−min gaps repeated.
    "q_eo_gap" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte()},
          pr AS (SELECT doc_id, class AS pred FROM fin WHERE rn = 1),
          j AS (SELECT d.source,
            CASE WHEN p.pred = 'en' THEN 1 ELSE 0 END AS pp,
            CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS yy
            FROM pr p JOIN documents d USING (doc_id)),
          g AS (SELECT source,
            CAST(sum(pp * yy) AS BIGINT) AS tp,
            CAST(sum(pp * (1 - yy)) AS BIGINT) AS fp,
            CAST(sum((1 - pp) * yy) AS BIGINT) AS fn,
            CAST(sum((1 - pp) * (1 - yy)) AS BIGINT) AS tn
            FROM j GROUP BY 1),
          r AS (SELECT source, tp, fp, fn, tn,
            CASE WHEN tp + fn = 0 THEN NULL
              ELSE ${duckPpm("tp", "tp + fn")} END AS tpr_ppm,
            CASE WHEN fp + tn = 0 THEN NULL
              ELSE ${duckPpm("fp", "fp + tn")} END AS fpr_ppm
            FROM g),
          gp AS (SELECT
            CAST(max(tpr_ppm) - min(tpr_ppm) AS BIGINT) AS eo_tpr_gap_ppm,
            CAST(max(fpr_ppm) - min(fpr_ppm) AS BIGINT) AS eo_fpr_gap_ppm
            FROM r)
          SELECT r.source, r.tp, r.fp, r.fn, r.tn, r.tpr_ppm, r.fpr_ppm,
            gp.eo_tpr_gap_ppm, gp.eo_fpr_gap_ppm
          FROM r CROSS JOIN gp ORDER BY source""",

    "q_class_metrics" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte()},
          cm AS MATERIALIZED (SELECT dd.lang AS tc, f.class AS pc,
              CAST(count(*) AS BIGINT) AS n
            FROM fin f JOIN documents dd USING (doc_id)
            WHERE f.rn = 1 GROUP BY 1, 2),
          clz AS (SELECT DISTINCT tc AS class FROM cm
            UNION SELECT DISTINCT pc FROM cm),
          tpv AS (SELECT tc AS class, n AS tp FROM cm WHERE tc = pc),
          fpv AS (SELECT pc AS class, CAST(sum(n) AS BIGINT) AS fp
            FROM cm WHERE tc <> pc GROUP BY 1),
          fnv AS (SELECT tc AS class, CAST(sum(n) AS BIGINT) AS fn
            FROM cm WHERE tc <> pc GROUP BY 1),
          m AS (SELECT clz.class, coalesce(tp, 0) AS tp,
            coalesce(fp, 0) AS fp, coalesce(fn, 0) AS fn
            FROM clz LEFT JOIN tpv USING (class)
            LEFT JOIN fpv USING (class) LEFT JOIN fnv USING (class))
          SELECT class, tp, fp, fn,
            CASE WHEN tp + fp = 0 THEN NULL
              ELSE ${duckPpm("tp", "tp + fp")} END AS precision_ppm,
            CASE WHEN tp + fn = 0 THEN NULL
              ELSE ${duckPpm("tp", "tp + fn")} END AS recall_ppm,
            CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
              ELSE ${duckPpm("2 * tp", "2 * tp + fp + fn")} END AS f1_ppm
          FROM m ORDER BY class""",

    "q_macro_metrics" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte()},
          cm AS MATERIALIZED (SELECT dd.lang AS tc, f.class AS pc,
              CAST(count(*) AS BIGINT) AS n
            FROM fin f JOIN documents dd USING (doc_id)
            WHERE f.rn = 1 GROUP BY 1, 2),
          clz AS (SELECT DISTINCT tc AS class FROM cm
            UNION SELECT DISTINCT pc FROM cm),
          tpv AS (SELECT tc AS class, n AS tp FROM cm WHERE tc = pc),
          fpv AS (SELECT pc AS class, CAST(sum(n) AS BIGINT) AS fp
            FROM cm WHERE tc <> pc GROUP BY 1),
          fnv AS (SELECT tc AS class, CAST(sum(n) AS BIGINT) AS fn
            FROM cm WHERE tc <> pc GROUP BY 1),
          m AS (SELECT clz.class, coalesce(tp, 0) AS tp,
            coalesce(fp, 0) AS fp, coalesce(fn, 0) AS fn
            FROM clz LEFT JOIN tpv USING (class)
            LEFT JOIN fpv USING (class) LEFT JOIN fnv USING (class)),
          pm AS (SELECT class, tp, fn,
            CASE WHEN tp + fp = 0 THEN NULL
              ELSE ${duckPpm("tp", "tp + fp")} END AS precision_ppm,
            CASE WHEN tp + fn = 0 THEN NULL
              ELSE ${duckPpm("tp", "tp + fn")} END AS recall_ppm,
            CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
              ELSE ${duckPpm("2 * tp", "2 * tp + fp + fn")} END AS f1_ppm
            FROM m),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
            CAST(sum(coalesce(precision_ppm, 0)) AS BIGINT) AS sp,
            CAST(sum(coalesce(recall_ppm, 0)) AS BIGINT) AS sr,
            CAST(sum(coalesce(f1_ppm, 0)) AS BIGINT) AS sf,
            CAST(sum(CAST(tp + fn AS HUGEINT)
              * coalesce(f1_ppm, 0)) AS HUGEINT) AS swf,
            CAST(sum(tp + fn) AS BIGINT) AS supp FROM pm),
          ac AS (SELECT
            CAST(sum(CASE WHEN tc = pc THEN n ELSE 0 END) AS BIGINT) AS diag,
            CAST(sum(n) AS BIGINT) AS tot FROM cm)
          SELECT n_classes,
            ${duckPpm("diag", "tot")} AS accuracy_ppm,
            ${duckPpm("sp", "n_classes", 1L)} AS macro_precision_ppm,
            ${duckPpm("sr", "n_classes", 1L)} AS macro_recall_ppm,
            ${duckPpm("sf", "n_classes", 1L)} AS macro_f1_ppm,
            ${duckPpm("swf", "supp", 1L)} AS weighted_f1_ppm
          FROM ag CROSS JOIN ac""",

    "q_kappa" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte()},
          cm AS MATERIALIZED (SELECT dd.lang AS tc, f.class AS pc,
              CAST(count(*) AS BIGINT) AS n
            FROM fin f JOIN documents dd USING (doc_id)
            WHERE f.rn = 1 GROUP BY 1, 2),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
            CAST(coalesce(sum(CASE WHEN tc = pc THEN n END), 0) AS BIGINT)
              AS agree FROM cm),
          rt AS (SELECT tc AS c, CAST(sum(n) AS BIGINT) AS r
            FROM cm GROUP BY 1),
          cc AS (SELECT pc AS c, CAST(sum(n) AS BIGINT) AS q
            FROM cm GROUP BY 1),
          pe AS (SELECT CAST(coalesce(sum(CAST(r AS HUGEINT) * q), 0)
            AS BIGINT) AS pe_num FROM rt JOIN cc USING (c))
          SELECT tot.n, tot.agree, pe.pe_num,
            CASE WHEN tot.n * tot.n - pe.pe_num = 0 THEN NULL
              ELSE ${duckPpm("tot.n * tot.agree - pe.pe_num",
                "tot.n * tot.n - pe.pe_num")}
            END AS kappa_ppm
          FROM tot CROSS JOIN pe""",

    "q_mcc" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte()},
          cm AS (SELECT dd.lang AS tc, f.class AS pc,
              CAST(count(*) AS BIGINT) AS n
            FROM fin f JOIN documents dd USING (doc_id)
            WHERE f.rn = 1 GROUP BY 1, 2),
          cl AS (SELECT
            CAST(coalesce(sum(CASE WHEN tc = 'en' AND pc = 'en'
              THEN n END), 0) AS BIGINT) AS tp,
            CAST(coalesce(sum(CASE WHEN tc <> 'en' AND pc = 'en'
              THEN n END), 0) AS BIGINT) AS fp,
            CAST(coalesce(sum(CASE WHEN tc = 'en' AND pc <> 'en'
              THEN n END), 0) AS BIGINT) AS fn,
            CAST(coalesce(sum(CASE WHEN tc <> 'en' AND pc <> 'en'
              THEN n END), 0) AS BIGINT) AS tn
            FROM cm),
          d AS (SELECT tp, fp, fn, tn,
            CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS num,
            CAST(tp + fp AS HUGEINT) * (tp + fn) AS m1,
            CAST(tn + fp AS HUGEINT) * (tn + fn) AS m2
            FROM cl)
          SELECT tp, fp, fn, tn, CAST(num AS BIGINT) AS mcc_num,
            CASE WHEN m1 = 0 OR m2 = 0 THEN NULL
              ELSE ${duckPpm("num * num", "m1 * m2")} END AS mcc2_ppm
          FROM d""",

    "q_reliability" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(",\n              sc.s + lp.lq AS score_q", mat = true)},
          mg AS (SELECT f1.doc_id, f1.class AS pred_class,
              CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
            FROM fin f1 JOIN fin f2
              ON f2.doc_id = f1.doc_id AND f2.rn = 2
            WHERE f1.rn = 1),
          r AS (SELECT mg.margin_q // 65536 AS bin,
            CASE WHEN mg.pred_class = dd.lang THEN 1 ELSE 0 END AS c
            FROM mg JOIN documents dd USING (doc_id))
          SELECT CAST(bin AS BIGINT) AS bin,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(c) AS BIGINT) AS n_correct,
            ${duckPpm("sum(c)", "count(*)")} AS acc_ppm
          FROM r GROUP BY 1 ORDER BY bin""",

    "q_selective_risk" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(",\n              sc.s + lp.lq AS score_q", mat = true)},
          mg AS (SELECT f1.doc_id, f1.class AS pred_class,
              CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
            FROM fin f1 JOIN fin f2
              ON f2.doc_id = f1.doc_id AND f2.rn = 2
            WHERE f1.rn = 1),
          r AS (SELECT mg.margin_q // 65536 AS bin,
            CASE WHEN mg.pred_class = dd.lang THEN 1 ELSE 0 END AS c
            FROM mg JOIN documents dd USING (doc_id)),
          rel AS (SELECT CAST(bin AS BIGINT) AS bin,
            CAST(count(*) AS BIGINT) AS n_bin,
            CAST(sum(c) AS BIGINT) AS nc FROM r GROUP BY 1),
          t AS (SELECT CAST(sum(n_bin) AS BIGINT) AS tot FROM rel),
          cm AS (SELECT bin, n_bin,
            CAST(sum(n_bin) OVER (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_accepted,
            CAST(sum(nc) OVER (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_correct
            FROM rel)
          SELECT bin, n_bin, n_accepted, n_correct,
            ${duckPpm("n_accepted", "tot")} AS coverage_ppm,
            ${duckPpm("n_accepted - n_correct", "n_accepted")} AS risk_ppm
          FROM cm CROSS JOIN t ORDER BY bin""",

    "q_avg_precision" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(",\n              sc.s + lp.lq AS score_q", mat = true)},
          mg AS (SELECT f1.doc_id, f1.class AS pred_class,
              CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
            FROM fin f1 JOIN fin f2
              ON f2.doc_id = f1.doc_id AND f2.rn = 2
            WHERE f1.rn = 1),
          lab AS (SELECT mg.doc_id, mg.margin_q AS scv,
            CASE WHEN mg.pred_class = dd.lang THEN 1 ELSE 0 END AS p
            FROM mg JOIN documents dd USING (doc_id)
            WHERE mg.margin_q IS NOT NULL),
          rk AS (SELECT p,
            CAST(row_number() OVER (ORDER BY scv DESC, doc_id)
              AS BIGINT) AS rk,
            CAST(sum(p) OVER (ORDER BY scv DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cpos
            FROM lab),
          terms AS (SELECT ${duckPpm("cpos", "rk")} AS prec
            FROM rk WHERE p = 1),
          agg AS (SELECT CAST(sum(prec) AS BIGINT) AS ap_sum_ppm,
            CAST(count(*) AS BIGINT) AS n_pos FROM terms),
          nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lab)
          SELECT agg.n_pos, nr.n_rows, agg.ap_sum_ppm,
            CAST(agg.ap_sum_ppm // agg.n_pos AS BIGINT) AS ap_ppm
          FROM agg, nr
          WHERE agg.n_pos > 0""",

    "q_auc" ->
      s"""WITH $duckNbChain,
          ${duckNbPredCte(",\n              sc.s + lp.lq AS score_q", mat = true)},
          mg AS (SELECT f1.doc_id, f1.class AS pred_class,
              CAST(f1.score_q - f2.score_q AS BIGINT) AS margin_q
            FROM fin f1 JOIN fin f2
              ON f2.doc_id = f1.doc_id AND f2.rn = 2
            WHERE f1.rn = 1),
          lab AS (SELECT mg.margin_q AS scv,
            CASE WHEN mg.pred_class = dd.lang THEN 1 ELSE 0 END AS p
            FROM mg JOIN documents dd USING (doc_id)
            WHERE mg.margin_q IS NOT NULL),
          ps AS (SELECT scv, CAST(sum(p) AS BIGINT) AS np,
            CAST(count(*) - sum(p) AS BIGINT) AS nn
            FROM lab GROUP BY 1),
          cum AS (SELECT *, CAST(coalesce(sum(nn) OVER (ORDER BY scv
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS below FROM ps),
          agg AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
            CAST(sum(nn) AS BIGINT) AS n_neg,
            CAST(sum(np * (2 * below + nn)) AS BIGINT) AS u2 FROM cum)
          SELECT n_pos, n_neg, u2,
            CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
              ELSE ${duckPpm("u2", "2 * n_pos * n_neg")} END AS auc_ppm
          FROM agg""",

    // The reliability chain, then the greatest-convex-minorant hull
    // over the cumulative (weight, correct) points: chord predicate in
    // HUGEINT, segment slopes in exact ppm.
    "q_calibrated" ->
      s"""WITH $duckIsoCalCte
          SELECT bin, n, nc AS n_correct, acc_ppm, cal_ppm
          FROM iso ORDER BY bin""",

    "q_ece" ->
      s"""WITH $duckIsoCalCte,
          l1 AS (SELECT CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(abs(cal_ppm - acc_ppm) * n) AS BIGINT) AS lsum
            FROM iso)
          SELECT n, ${duckPpm("lsum", "n", 1)} AS ece_ppm FROM l1""",

    // Streamed == batch: the incremental histogram chain must land on
    // exactly the batch ECE, so the oracle is q_ece's verbatim.
    "q_incr_calibration" ->
      s"""WITH $duckIsoCalCte,
          l1 AS (SELECT CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(abs(cal_ppm - acc_ppm) * n) AS BIGINT) AS lsum
            FROM iso)
          SELECT n, ${duckPpm("lsum", "n", 1)} AS ece_ppm FROM l1""",

    "q_brier_decomp" ->
      s"""WITH $duckIsoCalCte,
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
              CAST(sum(nc) AS BIGINT) AS nnc FROM iso),
          ob AS (SELECT nn, ${duckPpm("nnc", "nn")} AS obar FROM tot),
          ag AS (SELECT
              sum(CAST(n AS HUGEINT) * (cal_ppm - acc_ppm)
                * (cal_ppm - acc_ppm)) AS relnum,
              sum(CAST(n AS HUGEINT) * (acc_ppm - ob.obar)
                * (acc_ppm - ob.obar)) AS resnum
            FROM iso CROSS JOIN ob)
          SELECT ob.nn AS n, ob.obar AS base_ppm,
            ${duckPpm("ag.relnum", "ob.nn", 1)} AS rel_ppm2,
            ${duckPpm("ag.resnum", "ob.nn", 1)} AS res_ppm2,
            ${duckPpm("ob.obar * (1000000 - ob.obar)", "1000000", 1)}
              AS unc_ppm2,
            ${duckPpm("ag.relnum", "ob.nn", 1)}
              - ${duckPpm("ag.resnum", "ob.nn", 1)}
              + ${duckPpm("ob.obar * (1000000 - ob.obar)", "1000000", 1)}
              AS brier_ppm2
          FROM ob CROSS JOIN ag""",

    "q_perceptron" -> {
      // Unrolled training rounds, generated: round r scores under
      // w{r-1}, collects the misclassified set, and folds its y-weighted
      // feature sums into w{r}. w0 is the empty (all-zero) table. The
      // empty-misclassified fixpoint makes extra rounds no-ops, so the
      // full 12-round unroll equals Spark's early-exited loop exactly.
      val rounds = 12
      val roundCtes = (1 to rounds).map { r =>
        s"""s$r AS (SELECT x.doc_id, min(x.y) AS y,
              CAST(sum(coalesce(w.w, 0) * x.cnt) AS BIGINT) AS s
              FROM x LEFT JOIN w${r - 1} w USING (bkt) GROUP BY 1),
            m$r AS (SELECT doc_id FROM s$r WHERE y * s <= 0),
            d$r AS (SELECT x.bkt, CAST(sum(x.y * x.cnt) AS BIGINT) AS d
              FROM x JOIN m$r USING (doc_id) GROUP BY 1),
            w$r AS MATERIALIZED (SELECT coalesce(a.bkt, b.bkt) AS bkt,
              CAST(coalesce(a.w, 0) + coalesce(b.d, 0) AS BIGINT) AS w
              FROM w${r - 1} a FULL JOIN d$r b ON a.bkt = b.bkt)"""
      }.mkString(",\n            ")
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          tok AS (SELECT doc_id, unnest(tk) AS t FROM tk),
          f0 AS (SELECT DISTINCT doc_id, ${duckPolyId("t")} % 64 AS bkt
            FROM tok),
          lab AS (SELECT doc_id,
            CAST(CASE WHEN list_contains(tk, 'stream') THEN 1 ELSE -1 END
              AS BIGINT) AS y FROM tk),
          f AS (SELECT doc_id, bkt, CAST(1 AS BIGINT) AS cnt FROM f0
                UNION ALL SELECT doc_id, -1, 1 FROM lab),
          x AS MATERIALIZED (SELECT f.doc_id, f.bkt, f.cnt, lab.y
            FROM f JOIN lab USING (doc_id)),
          w0 AS (SELECT CAST(NULL AS BIGINT) AS bkt,
            CAST(0 AS BIGINT) AS w WHERE false),
          $roundCtes,
          fin AS (SELECT x.doc_id, min(x.y) AS y,
            CAST(sum(coalesce(w.w, 0) * x.cnt) AS BIGINT) AS s
            FROM x LEFT JOIN w$rounds w USING (bkt) GROUP BY 1)
          SELECT doc_id, y, s AS score,
            CAST(CASE WHEN s > 0 THEN 1 ELSE -1 END AS BIGINT) AS predicted
          FROM fin ORDER BY doc_id"""
    },

    "q_lm_buckets" ->
      s"""WITH $duckBigramCountsCte
          $duckKnLmCte
          sc AS (SELECT d.doc_id,
            CAST(sum(coalesce(lm.pkn_q, 0)) // count(*) AS BIGINT) AS fit_q
            FROM dids d LEFT JOIN lm
            ON d.tid_a = lm.tid_a AND d.tid_b = lm.tid_b
            GROUP BY 1),
          bk AS (SELECT sc.doc_id, dd.lang, sc.fit_q,
            CAST(ntile(3) OVER (PARTITION BY dd.lang
              ORDER BY sc.fit_q DESC, sc.doc_id) AS BIGINT) AS bucket
            FROM sc JOIN documents dd USING (doc_id))
          SELECT doc_id, lang, fit_q, bucket,
            CASE WHEN bucket = 1 THEN 'head'
                 WHEN bucket = 3 THEN 'tail' ELSE 'middle' END AS tier
          FROM bk ORDER BY doc_id""",

    // The sampled-threshold variant: same KN fit chain, then boundary
    // order statistics off the 40% hash sample and the strict-less
    // threshold count — the scan-stage assignment replayed exactly.
    "q_lm_buckets_sampled" ->
      s"""WITH $duckBigramCountsCte
          $duckKnLmCte
          sc AS (SELECT d.doc_id,
            CAST(sum(coalesce(lm.pkn_q, 0)) // count(*) AS BIGINT) AS fit_q
            FROM dids d LEFT JOIN lm
            ON d.tid_a = lm.tid_a AND d.tid_b = lm.tid_b
            GROUP BY 1),
          sall AS (SELECT sc.doc_id, dd.lang, sc.fit_q
            FROM sc JOIN documents dd USING (doc_id)),
          smp AS (SELECT * FROM sall
            WHERE ${duckMixOf("doc_id")} % 1000 < 400),
          rkd AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
              ORDER BY fit_q DESC, doc_id) AS BIGINT) AS sr,
            CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS sn
            FROM smp),
          bnd AS (SELECT lang, fit_q AS b FROM rkd, range(1, 3) j(j)
            WHERE sr = greatest(1, j.j * (sn // 3) + least(j.j, sn % 3))),
          asg AS (SELECT s.doc_id, s.lang, s.fit_q,
            1 + CAST(count(CASE WHEN s.fit_q < b.b THEN 1 END) AS BIGINT)
              AS bucket
            FROM sall s LEFT JOIN bnd b ON b.lang = s.lang
            GROUP BY 1, 2, 3)
          SELECT doc_id, lang, fit_q, bucket,
            CASE WHEN bucket = 1 THEN 'head'
                 WHEN bucket = 3 THEN 'tail' ELSE 'middle' END AS tier
          FROM asg ORDER BY doc_id""",

    // q_lm_buckets with every LM count keyed by the doc's language —
    // one independent KN table per language, scoring joined on
    // (lang, tid_a, tid_b).
    "q_lm_buckets_perlang" ->
      s"""WITH tk AS (SELECT doc_id, lang, ${duckToks("text")} AS tk
            FROM documents),
          dp AS (SELECT doc_id, lang, unnest(tk[1:len(tk)-1]) AS a,
                       unnest(tk[2:len(tk)]) AS b
            FROM tk WHERE len(tk) >= 2),
          dids AS (SELECT doc_id, lang, ${duckPolyId("a")} AS tid_a,
            ${duckPolyId("b")} AS tid_b FROM dp),
          cab AS (SELECT lang, tid_a, tid_b,
            CAST(count(*) AS BIGINT) AS c_ab FROM dids GROUP BY 1, 2, 3),
          ca AS (SELECT lang, tid_a, CAST(sum(c_ab) AS BIGINT) AS c_a,
            CAST(count(*) AS BIGINT) AS n1a FROM cab GROUP BY 1, 2),
          cb AS (SELECT lang, tid_b, CAST(count(*) AS BIGINT) AS n1b
            FROM cab GROUP BY 1, 2),
          np AS (SELECT lang, CAST(count(*) AS BIGINT) AS np
            FROM cab GROUP BY 1),
          lm AS (SELECT lang, tid_a, tid_b,
            CAST((CAST(greatest(4 * c_ab - 3, 0) AS HUGEINT) * np
                  + CAST(3 AS HUGEINT) * n1a * n1b) * 1000000000
                 // (CAST(4 AS HUGEINT) * c_a * np) AS BIGINT) AS pkn_q
            FROM cab JOIN ca USING (lang, tid_a)
            JOIN cb USING (lang, tid_b) JOIN np USING (lang)),
          sc AS (SELECT d.doc_id, d.lang,
            CAST(sum(coalesce(lm.pkn_q, 0)) // count(*) AS BIGINT) AS fit_q
            FROM dids d LEFT JOIN lm
            ON d.lang = lm.lang AND d.tid_a = lm.tid_a
              AND d.tid_b = lm.tid_b
            GROUP BY 1, 2),
          bk AS (SELECT doc_id, lang, fit_q,
            CAST(ntile(3) OVER (PARTITION BY lang
              ORDER BY fit_q DESC, doc_id) AS BIGINT) AS bucket
            FROM sc)
          SELECT doc_id, lang, fit_q, bucket,
            CASE WHEN bucket = 1 THEN 'head'
                 WHEN bucket = 3 THEN 'tail' ELSE 'middle' END AS tier
          FROM bk ORDER BY doc_id""",

    "q_bigram_stats" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
          gr AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
            THEN list_transform(range(1, len(tk)),
              i -> array_to_string(tk[i:i+1], ' '))
            ELSE [] END) AS gram FROM tk),
          g AS (SELECT doc_id, ${duckPolyId("gram")} AS tid FROM gr),
          cb AS (SELECT tid, CAST(count(*) AS BIGINT) AS cb FROM g GROUP BY tid)
          SELECT doc_id,
            CAST(count(*) AS BIGINT) AS n_bigrams,
            CAST(sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
            CAST(sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS hapax_ratio,
            CAST(sum(cb) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bigram_df
          FROM g JOIN cb USING (tid)
          GROUP BY doc_id ORDER BY doc_id""",

    "q_bit_hamming" -> {
      val pack = """list_transform(range(0,
          CAST(ceil(len(embedding) / 32.0) AS INT)), w ->
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(list_reverse(embedding[w*32+1 : w*32+32]),
            x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END)),
          (a, b) -> a * 2 + b))"""
      s"""WITH bits AS (SELECT vec_id, $pack AS bits FROM embeddings),
          q AS (SELECT vec_id AS query_id, bits AS qbits FROM bits
            WHERE vec_id < 10),
          p AS (SELECT query_id, b.vec_id AS neighbor_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, len(qbits) + 1),
                i -> CAST(bit_count(xor(qbits[i], b.bits[i])) AS BIGINT))),
              (a, x) -> a + x) AS hamming
            FROM q, bits b WHERE b.vec_id <> q.query_id),
          r AS (SELECT query_id, neighbor_id, hamming,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY hamming ASC, neighbor_id ASC) AS BIGINT) AS "rank"
            FROM p)
          SELECT query_id, neighbor_id, hamming, "rank" FROM r
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_cosine_topk" -> {
      val dotSql = duckDotSql _
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 10),
          p AS (SELECT query_id, e.vec_id AS neighbor_id,
            ${dotSql("qv", "e.embedding")} AS dp,
            ${dotSql("qv", "qv")} AS nq,
            ${dotSql("e.embedding", "e.embedding")} AS nc
            FROM q, embeddings e WHERE e.vec_id <> q.query_id),
          sc AS (SELECT query_id, neighbor_id,
            round(dp / (sqrt(nq) * sqrt(nc)), 6) + 0.0 AS sim FROM p),
          r AS (SELECT query_id, neighbor_id, sim,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank" FROM sc)
          SELECT query_id, neighbor_id, sim, "rank" FROM r
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_embed_neardup" -> {
      val dotSql = duckDotSql _
      s"""WITH e AS (SELECT * FROM embeddings WHERE vec_id < 500),
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ${dotSql("a.embedding", "b.embedding")} AS dp,
            ${dotSql("a.embedding", "a.embedding")} AS na,
            ${dotSql("b.embedding", "b.embedding")} AS nb
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
          SELECT id_a, id_b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS sim
          FROM p WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.4
          ORDER BY id_a, id_b"""
    },

    "q_rp_lsh_bucket" ->
      s"""SELECT vec_id, CAST(${duckRpBucket("embedding", 8)} AS BIGINT)
            AS bucket
          FROM embeddings ORDER BY vec_id""",

    "q_nndescent" -> duckNnDescent(k = 16, nBits = 4, rounds = 3,
      ringWindow = 8),

    "q_graph_search" -> duckGraphSearch(k = 4, beam = 16, hops = 5,
      graphK = 16, nBits = 4, rounds = 3, ringWindow = 8),

    "q_graph_recall" -> duckGraphRecall(k = 4, beam = 16, hops = 5,
      graphK = 16, nBits = 4, rounds = 3, ringWindow = 8),

    // Label spreading: the nnDescent graph CTEs, then 2 unrolled
    // frontier-majority rounds (same freeze/tie contract as the Spark
    // loop).
    "q_label_spread" -> {
      val rounds = 2
      val steps = (1 to rounds).map { i =>
        s"""v$i AS (SELECT e.s AS id, l.label, count(*) AS c
              FROM e JOIN l${i - 1} l ON l.id = e.d GROUP BY 1, 2),
            m$i AS (SELECT id, label FROM
              (SELECT *, row_number() OVER (PARTITION BY id
                 ORDER BY c DESC, label) AS rn FROM v$i) WHERE rn = 1),
            l$i AS (SELECT id, label FROM l${i - 1}
              UNION ALL SELECT id, label FROM m$i
              WHERE id NOT IN (SELECT id FROM l${i - 1}))"""
      }.mkString(",\n")
      s"""WITH ${duckNnDescentCtes(16, 4, 3, 8)},
          e AS (SELECT s, d FROM g3 UNION SELECT d, s FROM g3),
          l0 AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label
            FROM embeddings WHERE vec_id < 200),
          $steps
          SELECT em.vec_id, coalesce(l.label, CAST(-1 AS BIGINT)) AS label,
            CASE WHEN em.vec_id < 200 THEN 'seed'
                 WHEN l.label IS NOT NULL THEN 'spread'
                 ELSE 'none' END AS src
          FROM embeddings em LEFT JOIN l$rounds l ON l.id = em.vec_id
          ORDER BY em.vec_id"""
    },

    "q_pca_dir" ->
      s"""WITH ${duckPcaChain()}
          SELECT i AS dim, CAST(v AS BIGINT) AS v_q FROM pv ORDER BY dim""",

    "q_pca_project" ->
      s"""WITH ${duckPcaChain()}
          SELECT qv.vec_id, CAST(sum(qv.q * pv.v) AS BIGINT) AS proj
          FROM qv JOIN pv ON pv.i = qv.i
          GROUP BY 1 ORDER BY vec_id""",

    "q_mrl_topk" -> {
      val dotSql = duckDotSql _
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
            embedding[1:16] AS qt FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id, embedding, embedding[1:16] AS et
            FROM embeddings),
          tp AS (SELECT query_id, c.vec_id AS neighbor_id,
            ${dotSql("qt", "et")} AS dp,
            ${dotSql("qt", "qt")} AS nq,
            ${dotSql("et", "et")} AS nc
            FROM q, c WHERE c.vec_id <> q.query_id),
          ts AS (SELECT query_id, neighbor_id,
            round(dp / (sqrt(nq) * sqrt(nc)), 6) + 0.0 AS sim FROM tp),
          sl AS (SELECT query_id, neighbor_id FROM
            (SELECT query_id, neighbor_id, row_number() OVER
              (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS r
             FROM ts) WHERE r <= 20),
          fp AS (SELECT s.query_id, s.neighbor_id,
            ${dotSql("q.qv", "c.embedding")} AS dp,
            ${dotSql("q.qv", "q.qv")} AS nq,
            ${dotSql("c.embedding", "c.embedding")} AS nc
            FROM sl s JOIN q ON q.query_id = s.query_id
            JOIN c ON c.vec_id = s.neighbor_id),
          fs AS (SELECT query_id, neighbor_id,
            round(dp / (sqrt(nq) * sqrt(nc)), 6) + 0.0 AS sim FROM fp),
          r AS (SELECT query_id, neighbor_id, sim,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank" FROM fs)
          SELECT query_id, neighbor_id, sim, "rank" FROM r
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_embed_decontam" -> {
      val dotSql = duckDotSql _
      s"""WITH ev AS (SELECT embedding AS ve FROM embeddings
            WHERE vec_id < 50),
          c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50),
          bad AS (SELECT DISTINCT c.vec_id FROM c JOIN ev ON
            round(${dotSql("c.embedding", "ve")} /
              (sqrt(${dotSql("c.embedding", "c.embedding")}) *
               sqrt(${dotSql("ve", "ve")})), 6) >= 0.4)
          SELECT vec_id FROM c
          WHERE vec_id NOT IN (SELECT vec_id FROM bad)
          ORDER BY vec_id"""
    },

    // DBSCAN over (embedding[1], embedding[2]): the oracle does the plain
    // all-pairs eps-join (fine at oracle scale; the Spark side's grid is
    // blocking only, so the pair set is identical), the same
    // self-inclusive core test, reachable-min-label components over
    // core-core edges, min-label border attach.
    "q_dbscan" ->
      s"""WITH RECURSIVE p AS (SELECT vec_id AS id,
            CAST(embedding[1] AS DOUBLE) AS x,
            CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
          nbr AS (SELECT a.id AS ia, b.id AS ib FROM p a JOIN p b
            ON (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 0.02*0.02),
          core AS (SELECT ia AS id FROM nbr GROUP BY ia
            HAVING count(*) >= 5),
          ce AS (SELECT n.ia AS s, n.ib AS t FROM nbr n
            JOIN core ca ON ca.id = n.ia JOIN core cb ON cb.id = n.ib
            WHERE n.ia <> n.ib),
          reach(id, r) AS (SELECT id, id FROM core
            UNION SELECT ce.t, reach.r FROM ce JOIN reach ON ce.s = reach.id),
          comp AS (SELECT id, min(r) AS cl FROM reach GROUP BY id),
          border AS (SELECT n.ia AS id, min(c.cl) AS cl
            FROM nbr n JOIN comp c ON c.id = n.ib
            WHERE n.ia NOT IN (SELECT id FROM core) GROUP BY n.ia),
          lab AS (SELECT id, 'core' AS role, cl FROM comp
            UNION ALL SELECT id, 'border' AS role, cl FROM border)
          SELECT p.id AS vec_id, coalesce(l.role, 'noise') AS role,
            CAST(coalesce(l.cl, -1) AS BIGINT) AS cluster
          FROM p LEFT JOIN lab l ON l.id = p.id
          ORDER BY vec_id""",

    // MMR: the oracle unrolls the 5 greedy steps verbatim — same rounded
    // cosine inputs, same fixed-shape double score, same id tie-break.
    "q_mmr_topk" -> {
      val dotSql = duckDotSql _
      val k = 5
      val steps = (1 to k).map { i =>
        val prev = s"sel${i - 1}"
        s"""cand$i AS (SELECT r.* FROM rel r WHERE NOT EXISTS
              (SELECT 1 FROM $prev s WHERE s.query_id = r.query_id
                 AND s.neighbor_id = r.neighbor_id)),
            pen$i AS (SELECT c.query_id, c.neighbor_id, max(p.psim) AS mx
              FROM cand$i c JOIN $prev s ON s.query_id = c.query_id
              JOIN ps p ON p.query_id = c.query_id
                AND p.id_a = c.neighbor_id AND p.id_b = s.neighbor_id
              GROUP BY 1, 2),
            sc$i AS (SELECT c.query_id, c.neighbor_id, c.sim,
              0.7 * c.sim - (1.0 - 0.7) * coalesce(p.mx, 0.0) AS mmr
              FROM cand$i c LEFT JOIN pen$i p
                ON p.query_id = c.query_id
                 AND p.neighbor_id = c.neighbor_id),
            win$i AS (SELECT query_id, neighbor_id, sim, mmr FROM
              (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY mmr DESC, neighbor_id) AS rn FROM sc$i)
              WHERE rn = 1),
            sel$i AS (SELECT query_id, neighbor_id FROM $prev
              UNION ALL SELECT query_id, neighbor_id FROM win$i)"""
      }.mkString(",\n")
      val finals = (1 to k).map { i =>
        s"""SELECT query_id, CAST($i AS BIGINT) AS "rank", neighbor_id,
            sim AS rel,
            CAST(round(mmr * 10000000.0) AS BIGINT) AS mmr_e7 FROM win$i"""
      }.mkString(" UNION ALL ")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id, embedding FROM embeddings),
          sc0 AS (SELECT query_id, c.vec_id AS neighbor_id,
            round(${dotSql("qv", "c.embedding")} /
              (sqrt(${dotSql("qv", "qv")}) *
               sqrt(${dotSql("c.embedding", "c.embedding")})), 6) AS sim
            FROM q JOIN c ON c.vec_id <> q.query_id),
          rel AS (SELECT query_id, neighbor_id, sim FROM
            (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rn FROM sc0)
            WHERE rn <= 20),
          ps AS (SELECT a.query_id, a.neighbor_id AS id_a,
            b.neighbor_id AS id_b,
            round(${dotSql("ea.embedding", "eb.embedding")} /
              (sqrt(${dotSql("ea.embedding", "ea.embedding")}) *
               sqrt(${dotSql("eb.embedding", "eb.embedding")})), 6) AS psim
            FROM rel a JOIN rel b ON a.query_id = b.query_id
              AND a.neighbor_id <> b.neighbor_id
            JOIN c ea ON ea.vec_id = a.neighbor_id
            JOIN c eb ON eb.vec_id = b.neighbor_id),
          sel0 AS (SELECT CAST(NULL AS BIGINT) AS query_id,
            CAST(NULL AS BIGINT) AS neighbor_id WHERE 1 = 0),
          $steps
          SELECT * FROM ($finals) ORDER BY query_id, "rank""""
    },

    // Facility location: the oracle unrolls the same 5 greedy rounds over
    // the identical clipped 1e6-grid integer similarities — gains are
    // exact integers, so argmax ties resolve identically.
    "q_coreset_select" -> {
      val dotSql = duckDotSql _
      val k = 5
      val steps = (1 to k).map { i =>
        s"""gain$i AS (SELECT s.c,
              CAST(sum(GREATEST(s.s - cur.cur, 0)) AS BIGINT) AS g
              FROM sims s JOIN cur${i - 1} cur ON cur.v = s.v
              WHERE s.c NOT IN (SELECT c FROM sel${i - 1})
              GROUP BY s.c),
            win$i AS (SELECT c, g, CAST($i AS BIGINT) AS "rank" FROM
              (SELECT *, row_number() OVER (ORDER BY g DESC, c) AS rn
               FROM gain$i) WHERE rn = 1),
            sel$i AS (SELECT c FROM sel${i - 1}
              UNION ALL SELECT c FROM win$i),
            cur$i AS (SELECT cur.v, GREATEST(cur.cur, coalesce(w.s, 0))
                AS cur
              FROM cur${i - 1} cur LEFT JOIN
                (SELECT s.v, s.s FROM sims s JOIN win$i ON s.c = win$i.c)
                w ON w.v = cur.v)"""
      }.mkString(",\n")
      val finals = (1 to k).map { i =>
        s"""SELECT "rank", c AS vec_id, g AS gain_e6 FROM win$i"""
      }.mkString(" UNION ALL ")
      s"""WITH p AS (SELECT vec_id AS c, embedding AS vc
            FROM embeddings WHERE vec_id < 32),
          u AS (SELECT vec_id AS v, embedding AS vu FROM embeddings),
          sims AS (SELECT c, v,
            GREATEST(CAST(0 AS BIGINT),
              CAST(round(round(${dotSql("vc", "vu")} /
                (sqrt(${dotSql("vc", "vc")}) *
                 sqrt(${dotSql("vu", "vu")})), 6) * 1000000.0)
                AS BIGINT)) AS s
            FROM p, u),
          sel0 AS (SELECT CAST(NULL AS BIGINT) AS c WHERE 1 = 0),
          cur0 AS (SELECT vec_id AS v, CAST(0 AS BIGINT) AS cur
            FROM embeddings),
          $steps
          SELECT * FROM ($finals) ORDER BY "rank""""
    },

    // KNN-Shapley replay: full ranking per probe, lead() for m_{j+1},
    // the positive-divide term staging, one suffix-sum window.
    "q_knn_shapley" -> {
      val dotSql = duckDotSql _
      s"""WITH qv AS (SELECT vec_id AS qid, embedding,
            CAST(label AS BIGINT) AS ql,
            sqrt(${dotSql("embedding", "embedding")}) AS nm
            FROM embeddings WHERE vec_id < 10),
          cv AS (SELECT vec_id AS cid, embedding,
            CAST(label AS BIGINT) AS cl,
            sqrt(${dotSql("embedding", "embedding")}) AS nm
            FROM embeddings),
          p AS (SELECT q.qid, c.cid,
            CASE WHEN c.cl = q.ql THEN 1 ELSE 0 END AS m,
            CASE WHEN q.nm * c.nm = 0 THEN NULL
              ELSE round(${dotSql("q.embedding", "c.embedding")} /
                (q.nm * c.nm), 6) END AS sim
            FROM qv q JOIN cv c ON q.qid <> c.cid),
          r AS (SELECT qid, cid, m,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY sim DESC NULLS LAST, cid) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS np
            FROM p),
          t AS (SELECT qid, cid, rn,
            CASE WHEN lead(m) OVER w IS NULL
              THEN (m * 1000000000) // np
              ELSE (m - lead(m) OVER w) *
                (1000000000 // greatest(rn, 5)) END AS term
            FROM r WINDOW w AS (PARTITION BY qid ORDER BY rn)),
          s AS (SELECT qid, cid,
            CAST(sum(term) OVER (PARTITION BY qid ORDER BY rn
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS shp FROM t)
          SELECT cid AS vec_id, CAST(sum(shp) AS BIGINT) AS shap_sum_e9,
            CAST(count(*) AS BIGINT) AS n_tests
          FROM s GROUP BY 1 ORDER BY vec_id"""
    },

    // Majority vote over the shared nnDescent out-lists, count desc /
    // label asc ties — same staging as the Spark scan.
    "q_label_noise" ->
      s"""WITH ${duckNnDescentCtes(16, 4, 3, 8)},
          lab AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS lab
            FROM embeddings),
          votes AS (SELECT g.s AS id, l.lab AS nl,
            CAST(count(*) AS BIGINT) AS c
            FROM g3 g JOIN lab l ON l.id = g.d GROUP BY 1, 2),
          maj AS (SELECT id, nl AS maj_label FROM
            (SELECT *, row_number() OVER (PARTITION BY id
               ORDER BY c DESC, nl ASC) AS rn FROM votes) WHERE rn = 1),
          nb AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_nbr
            FROM votes GROUP BY 1),
          ag AS (SELECT v.id, v.c AS agree FROM votes v
            JOIN lab l ON l.id = v.id AND l.lab = v.nl)
          SELECT m.id AS vec_id, l.lab AS label, m.maj_label,
            coalesce(ag.agree, CAST(0 AS BIGINT)) AS n_agree, nb.n_nbr,
            m.maj_label <> l.lab AS is_suspect
          FROM maj m JOIN nb USING (id) JOIN lab l USING (id)
          LEFT JOIN ag USING (id)
          ORDER BY vec_id""",

    // Walk replay: ranked adjacency straight from g3, hop s picks rank
    // (mix(cur*17+s) mod deg) + 1 — the catalog mixer verbatim.
    "q_graph_walks" -> {
      val hops = (1 to 4).map { s =>
        s"""w$s AS (SELECT w.strt, a.nb AS cur
              FROM w${s - 1} w JOIN dg ON dg.v = w.cur
              JOIN adj a ON a.v = w.cur
                AND a.rk = (${duckMixOf(s"(w.cur * 17 + $s)")} % dg.deg) + 1)"""
      }.mkString(",\n")
      val unions = (0 to 4).map { s =>
        s"SELECT strt, CAST($s AS BIGINT) AS step, cur FROM w$s"
      }.mkString(" UNION ALL ")
      s"""WITH ${duckNnDescentCtes(16, 4, 3, 8)},
          adj AS (SELECT s AS v, d AS nb, CAST(rn AS BIGINT) AS rk
            FROM g3),
          dg AS (SELECT v, max(rk) AS deg FROM adj GROUP BY 1),
          w0 AS (SELECT vec_id AS strt, vec_id AS cur FROM embeddings
            WHERE vec_id < 100),
          $hops
          SELECT strt AS start_id, step, cur AS node_id FROM ($unions)
          ORDER BY start_id, step"""
    },

    // LOF replay: the shared nnDescent CTEs give the kNN lists; distance
    // = 1e6 − c_e6 (NULL sim → 2e6), k-distance = max over each node's
    // own list, reach = max(kdist(o), dist), and the two floor-divides
    // are staged exactly as the Spark side (r(o) = n·1e9 // Sr(o), then
    // (Sr_p // n)·(Σr // n) // 1e6 — positive `//` = div).
    "q_lof" ->
      s"""WITH ${duckNnDescentCtes(16, 4, 3, 8)},
          dd AS (SELECT s, d, CAST(1000000 - CAST(round(
              coalesce(sim, -1.0) * 1000000.0) AS BIGINT) AS BIGINT) AS dist
            FROM g3),
          kd AS (SELECT s AS id, max(dist) AS kdist FROM dd GROUP BY 1),
          rch AS (SELECT dd.s, dd.d,
              GREATEST(kd.kdist, dd.dist) AS reach
            FROM dd JOIN kd ON kd.id = dd.d),
          sr AS (SELECT s AS id,
              CAST(GREATEST(CAST(1 AS BIGINT), sum(reach)) AS BIGINT) AS sr,
              count(*) AS n
            FROM rch GROUP BY 1),
          rr AS (SELECT id, (n * 1000000000) // sr AS r FROM sr),
          ag AS (SELECT dd.s AS id, CAST(sum(rr.r) AS BIGINT) AS sumr
            FROM dd JOIN rr ON rr.id = dd.d GROUP BY 1)
          SELECT sr.id AS vec_id, CAST(sr.n AS BIGINT) AS n_nbr,
            sr.sr AS sr_e6,
            CAST(((sr.sr // sr.n) * (ag.sumr // sr.n)) // 1000000
              AS BIGINT) AS lof_e3
          FROM sr JOIN ag ON ag.id = sr.id
          ORDER BY vec_id""",

    // Bitext margin replay: forward top-8 of each probe source against
    // the odd side, backward top-8 of only the mined candidates against
    // the full even side, one integer divide, argmax per query.
    "q_bitext_margin" -> {
      val dotSql = duckDotSql _
      val k = 8
      s"""WITH xs AS (SELECT vec_id, embedding,
            sqrt(${dotSql("embedding", "embedding")}) AS nm
            FROM embeddings WHERE vec_id % 2 = 0),
          ys AS (SELECT vec_id, embedding,
            sqrt(${dotSql("embedding", "embedding")}) AS nm
            FROM embeddings WHERE vec_id % 2 = 1),
          xq AS (SELECT * FROM xs WHERE vec_id < 100),
          fp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            CASE WHEN q.nm * c.nm = 0 THEN NULL
              ELSE round(${dotSql("q.embedding", "c.embedding")} /
                (q.nm * c.nm), 6) END AS sim
            FROM xq q, ys c),
          fwd AS MATERIALIZED (SELECT query_id, neighbor_id,
            CAST(round(sim * 1000000.0) AS BIGINT) AS c_e6 FROM
            (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC NULLS LAST, neighbor_id) AS rn FROM fp)
            WHERE rn <= $k),
          sx AS (SELECT query_id, CAST(sum(c_e6) AS BIGINT) AS sxv
            FROM fwd GROUP BY 1),
          cand AS (SELECT DISTINCT neighbor_id FROM fwd),
          bp AS (SELECT y.vec_id AS yid, x.vec_id AS xid,
            CASE WHEN y.nm * x.nm = 0 THEN NULL
              ELSE round(${dotSql("y.embedding", "x.embedding")} /
                (y.nm * x.nm), 6) END AS sim
            FROM ys y JOIN cand ON cand.neighbor_id = y.vec_id, xs x),
          bwd AS (SELECT yid,
            CAST(round(sim * 1000000.0) AS BIGINT) AS c_e6 FROM
            (SELECT *, row_number() OVER (PARTITION BY yid
               ORDER BY sim DESC NULLS LAST, xid) AS rn FROM bp)
            WHERE rn <= $k),
          sy AS (SELECT yid, CAST(sum(c_e6) AS BIGINT) AS syv
            FROM bwd GROUP BY 1),
          sc AS (SELECT f.query_id, f.neighbor_id, f.c_e6,
            CASE WHEN sx.sxv + sy.syv > 0
              THEN CAST((GREATEST(f.c_e6, 0) * ${2 * k} * 1000000)
                // (sx.sxv + sy.syv) AS BIGINT)
              ELSE NULL END AS margin_e6
            FROM fwd f JOIN sx ON sx.query_id = f.query_id
            JOIN sy ON sy.yid = f.neighbor_id)
          SELECT query_id, neighbor_id AS target_id, c_e6, margin_e6,
            margin_e6 >= 1060000 AS accepted FROM
            (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY margin_e6 DESC NULLS LAST, neighbor_id) AS rn
             FROM sc) WHERE rn = 1
          ORDER BY query_id"""
    },

    "q_embed_neardup_lsh" -> {
      val dotSql = duckDotSql _
      val projs = (0 until 4).map { j =>
        s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(embedding) + 1),
              i -> (CASE WHEN (i * 2654435761 + ${j + 1} * 40503) % 65536 < 32768
                    THEN 1.0 ELSE -1.0 END) * CAST(embedding[i] AS DOUBLE))),
            (acc, x) -> acc + x) > 0 THEN ${1L << j} ELSE 0 END)"""
      }.mkString(" + ")
      s"""WITH b AS (SELECT vec_id, embedding,
            CAST($projs AS BIGINT) AS bucket FROM embeddings),
          p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
            ${dotSql("a.embedding", "c.embedding")} AS dp,
            ${dotSql("a.embedding", "a.embedding")} AS na,
            ${dotSql("c.embedding", "c.embedding")} AS nb
            FROM b a JOIN b c
            ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
          SELECT id_a, id_b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS sim
          FROM p WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.4
          ORDER BY id_a, id_b"""
    },

    // Hamming <= 1 on the 4-bit codes replayed as a popcount over the
    // XOR (bounded: bit_count of a 4-bit value).
    "q_embed_neardup_mp" -> {
      val dotSql = duckDotSql _
      val projs = (0 until 4).map { j =>
        s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(embedding) + 1),
              i -> (CASE WHEN (i * 2654435761 + ${j + 1} * 40503) % 65536 < 32768
                    THEN 1.0 ELSE -1.0 END) * CAST(embedding[i] AS DOUBLE))),
            (acc, x) -> acc + x) > 0 THEN ${1L << j} ELSE 0 END)"""
      }.mkString(" + ")
      s"""WITH b AS (SELECT vec_id, embedding,
            CAST($projs AS BIGINT) AS bucket FROM embeddings),
          p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
            ${dotSql("a.embedding", "c.embedding")} AS dp,
            ${dotSql("a.embedding", "a.embedding")} AS na,
            ${dotSql("c.embedding", "c.embedding")} AS nb
            FROM b a JOIN b c
            ON a.vec_id < c.vec_id AND
              ((xor(a.bucket, c.bucket) & 1) + ((xor(a.bucket, c.bucket) >> 1) & 1)
               + ((xor(a.bucket, c.bucket) >> 2) & 1)
               + ((xor(a.bucket, c.bucket) >> 3) & 1)) <= 1)
          SELECT id_a, id_b, round(dp / (sqrt(na) * sqrt(nb)), 6) AS sim
          FROM p WHERE round(dp / (sqrt(na) * sqrt(nb)), 6) >= 0.4
          ORDER BY id_a, id_b"""
    },

    "q_kmeans" ->
      s"""WITH $duckKmeansCte
          SELECT vec_id, CAST(cell AS BIGINT) AS cell, dist2 FROM a2
          ORDER BY vec_id""",

    "q_silhouette" -> {
      val dotSql = duckDotSql _
      // all point x final-centroid (c1) distances in the a2 chain's own
      // rounded-6 arithmetic; a2 = own-cell distance, b2 = min other
      s"""WITH $duckKmeansCte,
          ad AS (SELECT e.vec_id, e.cell AS own, c.cell AS cc,
            round(greatest(0.0, (${dotSql("e.embedding", "e.embedding")}
              - 2 * ${dotSql("e.embedding", "c.cvec")})
              + ${dotSql("c.cvec", "c.cvec")}), 6) AS d2
            FROM a2 e CROSS JOIN c1 c),
          g AS (SELECT vec_id, own,
            min(CASE WHEN cc = own THEN d2 END) AS a2,
            min(CASE WHEN cc <> own THEN d2 END) AS b2
            FROM ad GROUP BY 1, 2)
          SELECT vec_id, CAST(own AS BIGINT) AS cell, a2, b2,
            CASE WHEN greatest(a2, b2) = 0.0 THEN 0.0
              ELSE round((b2 - a2) / greatest(a2, b2), 6) END AS sil
          FROM g ORDER BY vec_id"""
    },

    "q_cluster_purity" ->
      s"""WITH $duckKmeansCte,
          j AS (SELECT a2.cell, e.label FROM a2
            JOIN embeddings e USING (vec_id)),
          c AS (SELECT cell, CAST(label AS BIGINT) AS lab,
            CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1, 2),
          t AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n FROM c
            GROUP BY 1),
          r AS (SELECT cell, lab, n AS n_top, row_number() OVER
            (PARTITION BY cell ORDER BY n DESC, lab ASC) AS rn FROM c)
          SELECT CAST(t.cell AS BIGINT) AS cell, t.n,
            r.lab AS top_label, r.n_top,
            ${duckPpm("r.n_top", "t.n")} AS purity_ppm
          FROM t JOIN r ON r.cell = t.cell AND r.rn = 1
          ORDER BY cell""",

    "q_mmd" -> {
      val dotSql = duckDotSql _
      s"""WITH ${duckCentroidCte("g")},
          n AS (SELECT label AS g, CAST(count(*) AS BIGINT) AS n
            FROM embeddings GROUP BY 1),
          gg AS (SELECT cl.g, cl.centroid, n.n FROM cl JOIN n USING (g))
          SELECT CAST(a.g AS BIGINT) AS g_a, CAST(b.g AS BIGINT) AS g_b,
            a.n AS n_a, b.n AS n_b,
            round(greatest(0.0, (${dotSql("a.centroid", "a.centroid")}
              - 2 * ${dotSql("a.centroid", "b.centroid")})
              + ${dotSql("b.centroid", "b.centroid")}), 6) AS mmd2
          FROM gg a JOIN gg b ON a.g < b.g
          ORDER BY g_a, g_b"""
    },

    "q_kcenter" -> duckKCenterSql(6),

    "q_diverse_sample" ->
      s"""WITH $duckKmeansCte,
          b AS (SELECT vec_id, cell, ${duckBucketOf("vec_id")} AS bkt FROM a2),
          r AS (SELECT vec_id, cell, row_number() OVER
            (PARTITION BY cell ORDER BY bkt, vec_id) AS rn FROM b)
          SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM r
          WHERE rn <= 12 ORDER BY vec_id""",

    "q_cluster_keywords" ->
      s"""WITH $duckKmeansCte,
          dt AS (SELECT a2.cell, d.text FROM documents d
            JOIN a2 ON a2.vec_id = d.doc_id),
          tk AS (SELECT cell, unnest(${duckToks("text")}) AS term FROM dt),
          ctf AS (SELECT cell, term, CAST(count(*) AS BIGINT) AS ctf
            FROM tk GROUP BY 1, 2),
          ttf AS (SELECT term, CAST(sum(ctf) AS BIGINT) AS ttf
            FROM ctf GROUP BY 1),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tk),
          sc AS (SELECT cell, ctf.term, ctf, ttf,
            CAST(ctf * t AS DOUBLE) / CAST(ttf AS DOUBLE) AS score
            FROM ctf JOIN ttf USING (term), tot),
          r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cell
            ORDER BY score DESC, term) AS BIGINT) AS term_rank FROM sc)
          SELECT CAST(cell AS BIGINT) AS cell, term, ctf, ttf, score,
            term_rank
          FROM r WHERE term_rank <= 5 ORDER BY cell, term_rank""",

    "q_embed_centroid" ->
      s"""WITH ${duckCentroidCte("label")},
          n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
            FROM embeddings GROUP BY label)
          SELECT c.label, CAST(c.dim - 1 AS BIGINT) AS dim,
            CAST(CAST(c.m AS REAL) AS DOUBLE) AS cval, n.n_vecs
          FROM cent c JOIN n USING (label)
          ORDER BY label, dim""",

    "q_ivf_topk" -> {
      val dotSql = duckDotSql _
      // Centroid arithmetic comes from the shared duckCentroidCte —
      // decimal-exact order-free sums with the REAL -> DOUBLE widening hop.
      s"""WITH ${duckIvfProbeCte(" + 0.0")},
          r AS (SELECT query_id, neighbor_id, sim,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank" FROM cand)
          SELECT query_id, neighbor_id, sim, "rank" FROM r
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_ndcg" -> {
      val dotSql = duckDotSql _
      // IVF chain positions (ra with rk), exact chain grades (rx with
      // rel = 6 - rank), FixLog discounts over positions 2..6
      s"""WITH ${duckIvfProbeCte()},
          ra AS (SELECT query_id, neighbor_id, rk FROM (
            SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM cand)
            WHERE rk <= 5),
          ${duckExactTopkCte(graded = true)},
          lx AS (SELECT DISTINCT CAST(p AS BIGINT) AS x
            FROM range(2, 7) t(p)),
          $duckLog2Chain,
          dt AS (SELECT ra.query_id,
            CASE WHEN coalesce(rx.rel, 0) > 0
              THEN ${duckPpm("coalesce(rx.rel, 0) * 65536", "lg.lq")}
              ELSE 0 END AS t
            FROM ra LEFT JOIN rx USING (query_id, neighbor_id)
            JOIN lgt lg ON lg.x = ra.rk + 1),
          dcg AS (SELECT query_id, CAST(sum(t) AS BIGINT) AS dcg_sum_ppm
            FROM dt GROUP BY 1),
          it AS (SELECT query_id,
            ${duckPpm("rel * 65536", "lg.lq")} AS t
            FROM (SELECT query_id, rel,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY rel DESC, neighbor_id) AS BIGINT) AS p
              FROM rx WHERE rel > 0)
            JOIN lgt lg ON lg.x = p + 1
            WHERE p <= 5),
          idcg AS (SELECT query_id, CAST(sum(t) AS BIGINT) AS idcg_sum_ppm
            FROM it GROUP BY 1)
          SELECT d.query_id, d.dcg_sum_ppm,
            coalesce(i.idcg_sum_ppm, CAST(0 AS BIGINT)) AS idcg_sum_ppm,
            CASE WHEN coalesce(i.idcg_sum_ppm, 0) = 0 THEN NULL
              ELSE ${duckPpm("d.dcg_sum_ppm", "i.idcg_sum_ppm")} END
              AS ndcg_ppm
          FROM dcg d LEFT JOIN idcg i USING (query_id)
          ORDER BY d.query_id"""
    },

    "q_err" -> {
      val dotSql = duckDotSql _
      // same IVF-position (ra) / exact-grade (rx) chains as q_ndcg;
      // the ERR fold replays graft's packed-integer state machine:
      // bits 0-3 = r, 4-29 = stop-mass numerator over 2^(5r),
      // 30+ = accumulated ppm
      s"""WITH ${duckIvfProbeCte()},
          ra AS (SELECT query_id, neighbor_id, rk FROM (
            SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM cand)
            WHERE rk <= 5),
          ${duckExactTopkCte(graded = true)},
          gg AS (SELECT ra.query_id, ra.rk,
              CAST(coalesce(rx.rel, 0) AS BIGINT) AS g
            FROM ra LEFT JOIN rx USING (query_id, neighbor_id)),
          ls AS (SELECT query_id, list(g ORDER BY rk, g) AS gs
            FROM gg GROUP BY 1),
          f AS (SELECT query_id,
            list_reduce(list_prepend(CAST(16 AS BIGINT), gs),
              (a, x) ->
                (((a >> 30) +
                  (2 * ((CAST(1 AS BIGINT) << x) - 1)
                     * ((a >> 4) & 67108863) * 1000000
                   + ((CAST(1 AS BIGINT) << (5 * ((a & 15) + 1)))
                      * ((a & 15) + 1)))
                  // (2 * (CAST(1 AS BIGINT) << (5 * ((a & 15) + 1)))
                      * ((a & 15) + 1))) << 30)
                | ((((a >> 4) & 67108863)
                    * (32 - ((CAST(1 AS BIGINT) << x) - 1))) << 4)
                | ((a & 15) + 1)) AS packed
            FROM ls)
          SELECT query_id, CAST(packed >> 30 AS BIGINT) AS err_ppm
          FROM f ORDER BY query_id"""
    },

    "q_ann_recall" -> {
      val dotSql = duckDotSql _
      // the q_ivf_topk chain (ra) and the q_cosine_topk chain (rx),
      // intersected per query
      s"""WITH ${duckIvfProbeCte()},
          ra AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM cand)
            WHERE rk <= 5),
          ${duckExactTopkCte(graded = false)},
          kt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k_true
            FROM rx GROUP BY 1),
          ht AS (SELECT ra.query_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM ra JOIN rx ON rx.query_id = ra.query_id
              AND rx.neighbor_id = ra.neighbor_id GROUP BY 1)
          SELECT kt.query_id, kt.k_true,
            coalesce(ht.n_hit, CAST(0 AS BIGINT)) AS n_hit,
            ${duckPpm("coalesce(ht.n_hit, 0)", "kt.k_true")} AS recall_ppm
          FROM kt LEFT JOIN ht USING (query_id) ORDER BY query_id"""
    },

    "q_mrr" -> {
      val dotSql = duckDotSql _
      // the q_ann_recall chains with ra keeping its rank; lcm(1..5)=60
      s"""WITH ${duckIvfProbeCte()},
          ra AS (SELECT query_id, neighbor_id, rk FROM (
            SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM cand)
            WHERE rk <= 5),
          ${duckExactTopkCte(graded = false)},
          fh AS (SELECT ra.query_id, CAST(min(ra.rk) AS BIGINT) AS first_hit
            FROM ra JOIN rx ON rx.query_id = ra.query_id
              AND rx.neighbor_id = ra.neighbor_id GROUP BY 1),
          qq AS (SELECT DISTINCT query_id FROM rx),
          fin AS (SELECT qq.query_id,
            coalesce(fh.first_hit, CAST(0 AS BIGINT)) AS first_hit,
            CASE WHEN coalesce(fh.first_hit, 0) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(60 // fh.first_hit AS BIGINT) END AS rr_num
            FROM qq LEFT JOIN fh USING (query_id))
          SELECT query_id, first_hit, rr_num,
            ${duckPpm("rr_num", "60")} AS rr_ppm
          FROM fin ORDER BY query_id"""
    },

    "q_map" -> {
      val dotSql = duckDotSql _
      // q_mrr's chains; cumulative hits over the k-bounded ranking,
      // per-relevant-position precision terms at lcm(1..5)=60 scale
      s"""WITH ${duckIvfProbeCte()},
          ra AS (SELECT query_id, neighbor_id, rk FROM (
            SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM cand)
            WHERE rk <= 5),
          ${duckExactTopkCte(graded = false)},
          rl AS (SELECT ra.query_id, ra.rk,
            CASE WHEN rx.neighbor_id IS NULL THEN 0 ELSE 1 END AS rel
            FROM ra LEFT JOIN rx ON rx.query_id = ra.query_id
              AND rx.neighbor_id = ra.neighbor_id),
          cm AS (SELECT query_id, rk, rel,
            CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rk)
              AS BIGINT) AS c FROM rl),
          pq AS (SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_hit,
            CAST(sum(CASE WHEN rel = 1 THEN c * (60 // rk) ELSE 0 END)
              AS BIGINT) AS ap_num
            FROM cm GROUP BY 1),
          kt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k_true
            FROM rx GROUP BY 1)
          SELECT kt.query_id, kt.k_true,
            coalesce(pq.n_hit, CAST(0 AS BIGINT)) AS n_hit,
            coalesce(pq.ap_num, CAST(0 AS BIGINT)) AS ap_num,
            ${duckPpm("coalesce(pq.ap_num, 0)", "60 * kt.k_true")} AS ap_ppm
          FROM kt LEFT JOIN pq USING (query_id) ORDER BY query_id"""
    },

    "q_rbo" -> {
      val dotSql = duckDotSql _
      // weights generated by the SAME arithmetic as Rank.rbo (depth 10,
      // p = 1/2): w(m) = sum_{d=m..10} (lcm(1..10)/d) * 2^(10-d)
      def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
      val lcmD = (1 to 10).foldLeft(1L)((l, d) => l / gcd(l, d) * d)
      val denom = lcmD * 1024
      val ws = (1 to 10).map(m =>
        s"($m, ${(m to 10).map(d => lcmD / d * (1L << (10 - d))).sum})")
        .mkString(", ")
      s"""WITH qq AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 10),
          pa AS (SELECT query_id, e.vec_id AS neighbor_id,
            ${dotSql("qv", "e.embedding")} AS dp,
            ${dotSql("qv", "qv")} AS nq,
            ${dotSql("e.embedding", "e.embedding")} AS nc
            FROM qq, embeddings e WHERE e.vec_id <> qq.query_id),
          sca AS (SELECT query_id, neighbor_id,
            round(dp / (sqrt(nq) * sqrt(nc)), 6) + 0.0 AS sim FROM pa),
          ea AS (SELECT query_id, neighbor_id,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS ra FROM sca
            QUALIFY ra <= 10),
          ${duckIvfProbeCte(" + 0.0", withQ = false, qFrom = "qq q")},
          eb AS (SELECT query_id, neighbor_id,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rb FROM cand
            QUALIFY rb <= 10),
          w AS (SELECT * FROM (VALUES $ws) t(m, wt)),
          c AS (SELECT ea.query_id, greatest(ra, rb) AS m
            FROM ea JOIN eb USING (query_id, neighbor_id)),
          s AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_common,
            CAST(sum(wt) AS BIGINT) AS sw FROM c JOIN w USING (m)
            GROUP BY query_id)
          SELECT qq.query_id, COALESCE(n_common, 0) AS n_common,
            round(CAST(COALESCE(sw, 0) AS DOUBLE) / $denom.0, 6) AS rbo
          FROM qq LEFT JOIN s USING (query_id) ORDER BY qq.query_id"""
    },

    "q_ivf_kmeans" -> {
      // a2 = the unrolled k-means final assignment (vec_id, embedding,
      // cell); centroids over a2 use the same decimal-exact stages, then
      // the probe/scan SQL mirrors q_ivf_topk with a2 as the corpus.
      s"""WITH $duckKmeansCte,
          ${duckCentroidStages("a2", "cell", "cell", "exq", "ctq", "clq")},
          ${duckIvfProbeCte(simTail = " + 0.0", corpus = "a2",
            cellCol = "cell", centroidRel = "clq")},
          r AS (SELECT query_id, neighbor_id, sim,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS "rank" FROM cand)
          SELECT query_id, neighbor_id, sim, "rank" FROM r
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_knn_classify" -> {
      // the q_ivf_kmeans chain with ALL vectors as queries, then a
      // majority vote over each query's top-5 neighbor labels
      s"""WITH $duckKmeansCte,
          ${duckCentroidStages("a2", "cell", "cell", "exq", "ctq", "clq")},
          q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings),
          ${duckIvfProbeCte(simTail = " + 0.0", withQ = false,
            corpus = "a2", cellCol = "cell", centroidRel = "clq")},
          rr AS (SELECT query_id, neighbor_id,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM cand),
          v AS (SELECT rr.query_id, CAST(e.label AS BIGINT) AS nl,
            CAST(count(*) AS BIGINT) AS v
            FROM rr JOIN embeddings e ON e.vec_id = rr.neighbor_id
            WHERE rr.rk <= 5 GROUP BY 1, 2),
          p AS (SELECT query_id, nl, row_number() OVER
            (PARTITION BY query_id ORDER BY v DESC, nl ASC) AS rn FROM v)
          SELECT p.query_id, p.nl AS pred_label,
            CAST(t.label AS BIGINT) AS true_label,
            p.nl = t.label AS correct
          FROM p JOIN embeddings t ON t.vec_id = p.query_id
          WHERE p.rn = 1 ORDER BY p.query_id"""
    },

    "q_semdedup" -> {
      val dotSql = duckDotSql _
      // a2 = unrolled k-means assignment with DERIVED kCells (the
      // deriveKCells twin — scale-portable); in-cell pairs at
      // rounded-sim >= 0.3; then the same recursive-closure component
      // labeling as q_neardup_cluster, over the full vec_id universe.
      s"""WITH RECURSIVE $duckKmeansCteAuto,
          pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE round(${dotSql("a.embedding", "b.embedding")} /
              (sqrt(${dotSql("a.embedding", "a.embedding")}) *
               sqrt(${dotSql("b.embedding", "b.embedding")})), 6) >= 0.3),
          ed AS (SELECT id_a AS s, id_b AS t FROM pr
                 UNION SELECT id_b, id_a FROM pr),
          reach(id, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT ed.t, reach.r FROM ed JOIN reach ON ed.s = reach.id),
          comp AS (SELECT id AS vec_id, min(r) AS component
                   FROM reach GROUP BY id),
          csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                     FROM comp GROUP BY component)
          SELECT c.vec_id, c.component, z.csize,
                 (c.vec_id = c.component) AS is_rep
          FROM comp c JOIN csizes z USING (component)
          ORDER BY c.vec_id"""
    },

    "q_mutual_knn" -> {
      val dotSql = duckDotSql _
      // a2 = unrolled k-means assignment with DERIVED kCells (the
      // deriveKCells twin — scale-portable); directed in-cell top-3 by
      // rounded sim (neighbor-id tie-break), reciprocity via self-join,
      // then the shared recursive component labeling.
      s"""WITH RECURSIVE $duckKmeansCteAuto,
          dd AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
            round(${dotSql("a.embedding", "b.embedding")} /
              (sqrt(${dotSql("a.embedding", "a.embedding")}) *
               sqrt(${dotSql("b.embedding", "b.embedding")})), 6) AS sim
            FROM a2 a JOIN a2 b
            ON a.cell = b.cell AND a.vec_id <> b.vec_id),
          rk AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
              ORDER BY sim DESC, nid) AS rn FROM dd),
          dir AS (SELECT qid, nid FROM rk WHERE rn <= 3),
          m AS (SELECT e1.qid AS id_a, e1.nid AS id_b FROM dir e1
            JOIN dir e2 ON e1.qid = e2.nid AND e1.nid = e2.qid
            WHERE e1.qid < e1.nid),
          ed AS (SELECT id_a AS s, id_b AS t FROM m
                 UNION SELECT id_b, id_a FROM m),
          reach(id, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT ed.t, reach.r FROM ed JOIN reach ON ed.s = reach.id),
          comp AS (SELECT id AS vec_id, min(r) AS component
                   FROM reach GROUP BY id),
          csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                     FROM comp GROUP BY component)
          SELECT c.vec_id, c.component, z.csize,
                 (c.vec_id = c.component) AS is_rep
          FROM comp c JOIN csizes z USING (component)
          ORDER BY c.vec_id"""
    },

    "q_embed_quant" ->
      // Identical double arithmetic in the same order as Quant: widen
      // float→double, one affine map, half-up round on a non-negative
      // operand, explicit clamp, reconstruction from the integral code.
      """WITH p AS (SELECT vec_id, embedding,
            CAST(list_min(embedding) AS DOUBLE) AS lo,
            (CAST(list_max(embedding) AS DOUBLE)
              - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale
          FROM embeddings),
          e AS (SELECT vec_id, lo, scale, s.i - 1 AS dim,
            CAST(s.x AS DOUBLE) AS x
          FROM (SELECT vec_id, lo, scale,
            unnest(list_transform(range(1, len(embedding) + 1),
              i -> {'i': i, 'x': embedding[i]})) AS s FROM p)),
          q AS (SELECT vec_id, dim, x, lo, scale,
            CASE WHEN scale = 0 THEN -128.0
                 ELSE least(127.0, greatest(-128.0,
                   round((x - lo) / scale) - 128.0)) END AS qd
          FROM e)
          SELECT vec_id, CAST(dim AS BIGINT) AS dim,
            CAST(qd AS BIGINT) AS qval,
            round(abs(x - (lo + (qd + 128.0) * scale)), 6) AS err
          FROM q ORDER BY vec_id, dim""",

    "q_pq_codes" -> {
      // one sliced-input CTE + one unrolled k-means chain per subspace
      val subs = (0 until 4).map { s =>
        val lo = s * 16 + 1
        s"""s$s AS (SELECT vec_id, embedding[$lo:${lo + 15}] AS embedding
            FROM embeddings),
            ${duckKmeansStages(s"s$s", s"p$s", 8)}"""
      }.mkString(",\n")
      val parts = (0 until 4).map { s =>
        s"""SELECT vec_id, CAST($s AS BIGINT) AS subspace,
            CAST(cell AS BIGINT) AS code, dist2 FROM p${s}a2"""
      }.mkString(" UNION ALL ")
      s"""WITH $subs
          SELECT * FROM ($parts) ORDER BY vec_id, subspace"""
    },

    "q_pq_adc" -> {
      val dotSql = duckDotSql _
      val subs = (0 until 4).map { s =>
        val lo = s * 16 + 1
        s"""s$s AS (SELECT vec_id, embedding[$lo:${lo + 15}] AS embedding
            FROM embeddings),
            ${duckKmeansStages(s"s$s", s"p$s", 8)}"""
      }.mkString(",\n")
      val cb = (0 until 4).map(s =>
        s"SELECT $s AS subspace, cell, cvec FROM p${s}c1").mkString(" UNION ALL ")
      val cd = (0 until 4).map(s =>
        s"SELECT vec_id, $s AS subspace, cell FROM p${s}a2").mkString(" UNION ALL ")
      // recon = codebook centroids concatenated in subspace order; then
      // the same shortlist/rerank SQL as q_ivf_quant.
      s"""WITH $subs,
          cb AS ($cb),
          cd AS ($cd),
          rcn AS (SELECT cd.vec_id,
            flatten(list(cb.cvec ORDER BY cd.subspace)) AS embedding
            FROM cd JOIN cb ON cb.subspace = cd.subspace AND cb.cell = cd.cell
            GROUP BY cd.vec_id),
          q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 10),
          cand AS (SELECT q.query_id, e.vec_id AS neighbor_id,
            round(${dotSql("q.qv", "e.embedding")} /
              (sqrt(${dotSql("q.qv", "q.qv")}) *
               sqrt(${dotSql("e.embedding", "e.embedding")})), 6) AS sim
            FROM q CROSS JOIN rcn e
            WHERE e.vec_id <> q.query_id),
          $duckRescoreCte
          SELECT query_id, neighbor_id, sim, "rank" FROM fin
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_ivfpq_topk" -> {
      // q_pq_adc's per-subspace codebook/reconstruction stages + the
      // q_ivf_topk probe: ADC candidates restricted to probed cells,
      // top-10 shortlist, exact rerank to top-5.
      val subs = (0 until 4).map { s =>
        val lo = s * 16 + 1
        s"""s$s AS (SELECT vec_id, embedding[$lo:${lo + 15}] AS embedding
            FROM embeddings),
            ${duckKmeansStages(s"s$s", s"p$s", 8)}"""
      }.mkString(",\n")
      val cbU = (0 until 4).map(s =>
        s"SELECT $s AS subspace, cell, cvec FROM p${s}c1").mkString(" UNION ALL ")
      val cdU = (0 until 4).map(s =>
        s"SELECT vec_id, $s AS subspace, cell FROM p${s}a2").mkString(" UNION ALL ")
      s"""WITH $subs,
          cb AS ($cbU),
          cd AS ($cdU),
          rcn AS (SELECT cd.vec_id,
            flatten(list(cb.cvec ORDER BY cd.subspace)) AS embedding
            FROM cd JOIN cb ON cb.subspace = cd.subspace AND cb.cell = cd.cell
            GROUP BY cd.vec_id),
          rce AS (SELECT r.vec_id, e.label, r.embedding
            FROM rcn r JOIN embeddings e USING (vec_id)),
          ${duckIvfProbeCte(corpus = "rce")},
          $duckRescoreCte
          SELECT query_id, neighbor_id, sim, "rank" FROM fin
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_ivfpq_res_topk" -> {
      // q_ivfpq_topk's chain with the PQ trained on RESIDUALS: rs
      // subtracts the (label) centroid per element (REAL casts at both
      // truncation points mirror the Spark zip_with), rce adds it back
      // to the reconstructed residual before the ADC scoring.
      val subs = (0 until 4).map { s =>
        val lo = s * 16 + 1
        s"""s$s AS (SELECT vec_id, embedding[$lo:${lo + 15}] AS embedding
            FROM rs),
            ${duckKmeansStages(s"s$s", s"p$s", 8)}"""
      }.mkString(",\n")
      val cbU = (0 until 4).map(s =>
        s"SELECT $s AS subspace, cell, cvec FROM p${s}c1").mkString(" UNION ALL ")
      val cdU = (0 until 4).map(s =>
        s"SELECT vec_id, $s AS subspace, cell FROM p${s}a2").mkString(" UNION ALL ")
      s"""WITH ${duckCentroidCte("cell")},
          rs AS (SELECT e.vec_id, e.label,
            list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(CAST(e.embedding[i] AS DOUBLE)
                - CAST(cl.centroid[i] AS DOUBLE) AS REAL)) AS embedding
            FROM embeddings e JOIN cl ON cl.cell = e.label),
          $subs,
          cb AS ($cbU),
          cd AS ($cdU),
          rcn AS (SELECT cd.vec_id,
            flatten(list(cb.cvec ORDER BY cd.subspace)) AS embedding
            FROM cd JOIN cb ON cb.subspace = cd.subspace AND cb.cell = cd.cell
            GROUP BY cd.vec_id),
          rce AS (SELECT r.vec_id, e.label,
            list_transform(range(1, len(r.embedding) + 1),
              i -> CAST(CAST(cl.centroid[i] AS DOUBLE)
                + CAST(r.embedding[i] AS DOUBLE) AS REAL)) AS embedding
            FROM rcn r JOIN embeddings e USING (vec_id)
            JOIN cl ON cl.cell = e.label),
          ${duckIvfProbeCte(corpus = "rce", centroidRel = "cl")},
          $duckRescoreCte
          SELECT query_id, neighbor_id, sim, "rank" FROM fin
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_ivfpq_recall" -> {
      // the q_ivfpq_topk chain (through fin) intersected per query with
      // the exact cosine top-5 (px/rx), q_ann_recall's grade arithmetic
      val subs = (0 until 4).map { s =>
        val lo = s * 16 + 1
        s"""s$s AS (SELECT vec_id, embedding[$lo:${lo + 15}] AS embedding
            FROM embeddings),
            ${duckKmeansStages(s"s$s", s"p$s", 8)}"""
      }.mkString(",\n")
      val cbU = (0 until 4).map(s =>
        s"SELECT $s AS subspace, cell, cvec FROM p${s}c1").mkString(" UNION ALL ")
      val cdU = (0 until 4).map(s =>
        s"SELECT vec_id, $s AS subspace, cell FROM p${s}a2").mkString(" UNION ALL ")
      s"""WITH $subs,
          cb AS ($cbU),
          cd AS ($cdU),
          rcn AS (SELECT cd.vec_id,
            flatten(list(cb.cvec ORDER BY cd.subspace)) AS embedding
            FROM cd JOIN cb ON cb.subspace = cd.subspace AND cb.cell = cd.cell
            GROUP BY cd.vec_id),
          rce AS (SELECT r.vec_id, e.label, r.embedding
            FROM rcn r JOIN embeddings e USING (vec_id)),
          ${duckIvfProbeCte(corpus = "rce")},
          $duckRescoreCte,
          ra AS (SELECT query_id, neighbor_id FROM fin WHERE "rank" <= 5),
          ${duckExactTopkCte(graded = false)},
          kt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k_true
            FROM rx GROUP BY 1),
          ht AS (SELECT ra.query_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM ra JOIN rx ON rx.query_id = ra.query_id
              AND rx.neighbor_id = ra.neighbor_id GROUP BY 1)
          SELECT kt.query_id, kt.k_true,
            coalesce(ht.n_hit, CAST(0 AS BIGINT)) AS n_hit,
            ${duckPpm("coalesce(ht.n_hit, 0)", "kt.k_true")} AS recall_ppm
          FROM kt LEFT JOIN ht USING (query_id) ORDER BY query_id"""
    },

    "q_ivf_quant" -> {
      // Quantize → reconstruct per dim → reassemble the recon list in dim
      // order; centroids/probe over recon (same decimal-exact stages);
      // exact-embedding rerank of the top-10 shortlist.
      s"""WITH qp AS (SELECT vec_id, label, embedding,
            CAST(list_min(embedding) AS DOUBLE) AS lo,
            (CAST(list_max(embedding) AS DOUBLE)
              - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale
          FROM embeddings),
          qe AS (SELECT vec_id, label, lo, scale, s.i AS dim,
            CAST(s.x AS DOUBLE) AS x
          FROM (SELECT vec_id, label, lo, scale,
            unnest(list_transform(range(1, len(embedding) + 1),
              i -> {'i': i, 'x': embedding[i]})) AS s FROM qp)),
          qc AS (SELECT vec_id, label, dim, lo, scale,
            CASE WHEN scale = 0 THEN -128.0
                 ELSE least(127.0, greatest(-128.0,
                   round((x - lo) / scale) - 128.0)) END AS qd
          FROM qe),
          rc AS (SELECT vec_id, label,
            list(CAST(lo + (qd + 128.0) * scale AS REAL) ORDER BY dim)
              AS embedding
          FROM qc GROUP BY vec_id, label),
          ${duckCentroidStages("rc", "label", "cell", "exq", "ctq", "clq")},
          ${duckIvfProbeCte(corpus = "rc", centroidRel = "clq")},
          $duckRescoreCte
          SELECT query_id, neighbor_id, sim, "rank" FROM fin
          WHERE "rank" <= 5 ORDER BY query_id, "rank""""
    },

    "q_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         FROM documents ORDER BY doc_id""",

    // PNG being lossless, the decoded luma sum over the 16x16 payload
    // equals the ascii-code sum of the first 256 source characters
    // (zero-padded) — the oracle recomputes it without parsing PNG.
    // NOTE (shared by every media oracle): chars are equated with
    // UTF-8 BYTES (length/ascii vs getBytes) — exact because the
    // corpus is printable ASCII (verified; GateSchema-level guard is
    // the ascii regexp in the generator); a non-ASCII corpus needs
    // octet-based oracles.
    "q_image_decode" ->
      """SELECT doc_id AS media_id, 'png' AS format,
           16 AS width, 16 AS height,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, least(length(text), 256) + 1),
               i -> CAST(ascii(text[i]) AS BIGINT))),
             (a, b) -> a + b) AS BIGINT) AS sum_luma
         FROM documents ORDER BY media_id""",

    // Nearest-neighbor 4x4 over the 16x16 image: thumb pixel i samples
    // source (x*4, y*4) with x = i%4, y = i//4, i.e. source byte index
    // (i//4)*64 + (i%4)*4 — ascii code when inside the text, else the
    // zero pad.
    "q_image_thumb" ->
      """SELECT doc_id AS media_id, CAST(i.i AS BIGINT) AS px_idx,
           CAST(CASE WHEN (i.i // 4) * 64 + (i.i % 4) * 4 < length(text)
             THEN ascii(text[(i.i // 4) * 64 + (i.i % 4) * 4 + 1])
             ELSE 0 END AS BIGINT) AS px
         FROM documents, range(0, 16) i(i)
         ORDER BY media_id, px_idx""",

    // PCM-in-WAV is lossless: decoded sample i equals (ascii_i - 64)*256,
    // so energy = 65536 * sum (ascii-64)^2 and zero crossings count
    // adjacent opposite-sign pairs (the corpus has no '@', so no zero
    // samples and the carry rule never engages).
    "q_audio_decode" ->
      """SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
           CAST(length(text) AS BIGINT) AS n_frames,
           CAST(65536 * list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(text) + 1),
               i -> CAST((ascii(text[i]) - 64) * (ascii(text[i]) - 64)
                 AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS energy,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(text)),
               i -> CAST(CASE WHEN (ascii(text[i]) - 64) *
                 (ascii(text[i + 1]) - 64) < 0 THEN 1 ELSE 0 END
                 AS BIGINT))), (a, b) -> a + b) AS BIGINT)
             AS zero_crossings
         FROM documents ORDER BY media_id""",

    "q_winsorize" ->
      """WITH e AS (SELECT event_id, event_type,
            CAST(round("value" * 100, 0) AS BIGINT) AS cents FROM events),
          r AS (SELECT event_type, cents,
            row_number() OVER (PARTITION BY event_type ORDER BY cents)
              AS rn,
            count(*) OVER (PARTITION BY event_type) AS n FROM e),
          th AS (SELECT event_type,
            max(CASE WHEN rn = greatest(1, (n * 500 + 9999) // 10000)
              THEN cents END) AS lo,
            max(CASE WHEN rn = greatest(1, (n * 9500 + 9999) // 10000)
              THEN cents END) AS hi
            FROM r GROUP BY 1)
          SELECT e.event_id, e.event_type, e.cents, th.lo AS lo_clip,
            th.hi AS hi_clip,
            least(greatest(e.cents, th.lo), th.hi) AS winsorized
          FROM e JOIN th USING (event_type) ORDER BY event_id""",

    "q_winsorize_sampled" ->
      s"""WITH e AS (SELECT event_id, event_type,
            CAST(round("value" * 100, 0) AS BIGINT) AS cents FROM events),
          smp AS (SELECT * FROM e
            WHERE ${duckMixOf("event_id")} % 1000 < 400),
          r AS (SELECT event_type, cents,
            row_number() OVER (PARTITION BY event_type ORDER BY cents)
              AS rn,
            count(*) OVER (PARTITION BY event_type) AS n FROM smp
            WHERE cents IS NOT NULL),
          th AS (SELECT event_type,
            max(CASE WHEN rn = greatest(1, (n * 500 + 9999) // 10000)
              THEN cents END) AS lo,
            max(CASE WHEN rn = greatest(1, (n * 9500 + 9999) // 10000)
              THEN cents END) AS hi
            FROM r GROUP BY 1),
          miss AS (SELECT DISTINCT event_type FROM e
            WHERE event_type NOT IN (SELECT event_type FROM th)),
          rx AS (SELECT e.event_type, cents,
            row_number() OVER (PARTITION BY e.event_type ORDER BY cents)
              AS rn,
            count(*) OVER (PARTITION BY e.event_type) AS n
            FROM e JOIN miss USING (event_type)
            WHERE cents IS NOT NULL),
          thx AS (SELECT event_type,
            max(CASE WHEN rn = greatest(1, (n * 500 + 9999) // 10000)
              THEN cents END) AS lo,
            max(CASE WHEN rn = greatest(1, (n * 9500 + 9999) // 10000)
              THEN cents END) AS hi
            FROM rx GROUP BY 1),
          tha AS (SELECT * FROM th UNION ALL SELECT * FROM thx)
          SELECT e.event_id, e.event_type, e.cents, t.lo AS lo_clip,
            t.hi AS hi_clip,
            CASE WHEN e.cents IS NULL THEN NULL
              ELSE least(greatest(e.cents, t.lo), t.hi) END AS winsorized
          FROM e LEFT JOIN tha t USING (event_type) ORDER BY event_id""",

    // Six unrolled MM rounds: per-pair truncating term divisions,
    // per-item win/denominator update, mean-2^20 renormalization —
    // every stage the same fixed-point arithmetic as the engine.
    "q_bradley_terry" -> {
      val rounds = 6
      val roundCtes = (1 to rounds).map { r =>
        s"""t$r AS (SELECT u.i AS item,
              CAST(sum((u.n * 1099511627776) // (wi.wq + wj.wq))
                AS BIGINT) AS dq
              FROM und u
              JOIN w${r - 1} wi ON wi.item = u.i
              JOIN w${r - 1} wj ON wj.item = u.j
              GROUP BY 1),
            u$r AS MATERIALIZED (SELECT w.item, w.wn, greatest(1,
                CAST((CAST(w.wn AS HUGEINT) * 1099511627776) // t.dq
                  AS BIGINT)) AS wq
              FROM w${r - 1} w JOIN t$r t ON t.item = w.item),
            s$r AS (SELECT CAST(sum(wq) AS HUGEINT) AS sw,
              CAST(count(*) AS BIGINT) AS ni FROM u$r),
            w$r AS MATERIALIZED (SELECT item, wn, greatest(1,
                CAST((CAST(wq AS HUGEINT) * ni * 1048576) // sw
                  AS BIGINT)) AS wq
              FROM u$r, s$r)"""
      }.mkString(",\n")
      s"""WITH p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
            a.n_chars AS ca, b.n_chars AS cb
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 50),
          e0 AS (SELECT CASE WHEN ca >= cb THEN ia ELSE ib END AS w,
            CASE WHEN ca >= cb THEN ib ELSE ia END AS l FROM p),
          ed AS MATERIALIZED (SELECT w AS a, l AS b,
            CAST(count(*) AS BIGINT) AS n
            FROM e0 GROUP BY 1, 2),
          und AS MATERIALIZED (SELECT a AS i, b AS j, n FROM ed
            UNION ALL SELECT b, a, n FROM ed),
          items AS (SELECT DISTINCT i AS item FROM und),
          wins AS (SELECT a AS item, CAST(sum(n) AS BIGINT) AS wn
            FROM ed GROUP BY 1),
          w0 AS MATERIALIZED (SELECT item,
            coalesce(wn, CAST(0 AS BIGINT)) AS wn,
            CAST(1048576 AS BIGINT) AS wq
            FROM items LEFT JOIN wins USING (item)),
          $roundCtes,
          nrm AS (SELECT CAST(sum(wq) AS HUGEINT) AS sw FROM w$rounds)
          SELECT item, wn AS n_wins, wq AS w_q,
            CAST((CAST(wq AS HUGEINT) * 1000000) // nrm.sw AS BIGINT)
              AS w_ppm
          FROM w$rounds, nrm ORDER BY item"""
    },

    // The KN perplexity chain per source, then four unrolled
    // multiplicative-weights rounds with the exp2 ladder replayed per
    // round over the mixture-sized lw table.
    "q_doremi" -> {
      val rounds = 4
      val etaQ = 16384L
      val roundCtes = (1 to rounds).map { r =>
        s"""t$r AS (SELECT CAST(sum(w) AS BIGINT) AS sw,
              CAST(sum(CAST(w AS HUGEINT) * loss) AS HUGEINT) AS swl
            FROM d${r - 1}),
            n$r AS (SELECT domain, loss,
              lw + ((greatest(loss - CAST(t$r.swl // t$r.sw AS BIGINT), 0)
                * $etaQ) // 65536) AS lw
              FROM d${r - 1}, t$r),
            ex$r AS (SELECT DISTINCT lw AS x FROM n$r),
            ${duckExp2Chain(r.toString)},
            d$r AS (SELECT n$r.domain, n$r.loss, n$r.lw, e2t$r.v AS w
              FROM n$r JOIN e2t$r ON e2t$r.x = n$r.lw)"""
      }.mkString(",\n")
      s"""WITH $duckBigramCountsCte
          $duckKnLmCte
          j AS MATERIALIZED (SELECT d.doc_id,
            greatest(lm.pkn_q, 1) AS pq
            FROM dids d JOIN lm USING (tid_a, tid_b)),
          lx AS (SELECT DISTINCT pq AS x FROM j
            UNION SELECT 1000000000),
          $duckLog2Chain,
          sc AS (SELECT j.doc_id, CAST(count(*) AS BIGINT) AS n_scored,
            sum(g9.lq - lp.lq) AS sbq
            FROM j JOIN lgt lp ON lp.x = j.pq
            CROSS JOIN (SELECT lq FROM lgt WHERE x = 1000000000) g9
            GROUP BY 1),
          lsrc AS (SELECT dd.source AS domain,
            CAST(sum(sc.sbq // sc.n_scored) // count(*) AS BIGINT) AS loss
            FROM sc JOIN documents dd USING (doc_id) GROUP BY 1),
          d0 AS (SELECT domain, loss, CAST(0 AS BIGINT) AS lw,
            CAST(1048576 AS BIGINT) AS w FROM lsrc),
          $roundCtes,
          nrm AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM d$rounds)
          SELECT domain AS source, loss AS loss_q, lw AS lw_q,
            CAST((CAST(w AS HUGEINT) * 1000000) // nrm.sw AS BIGINT)
              AS w_ppm
          FROM d$rounds, nrm ORDER BY source"""
    },

    // Concat-and-chunk replay: exclusive prefix sum over the mixer
    // order, then each doc's overlap rows from (s, n, L) arithmetic.
    "q_seq_pack" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n FROM documents),
          f AS (SELECT * FROM t WHERE n > 0),
          o AS (SELECT doc_id, n, ${duckMixOf("doc_id")} AS mx FROM f),
          p AS (SELECT doc_id, n,
            CAST(coalesce(sum(n) OVER (ORDER BY mx, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS s FROM o),
          e AS (SELECT doc_id, n, s,
            unnest(range(s // 128, (s + n - 1) // 128 + 1)) AS seq_id
            FROM p)
          SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
            CAST(greatest(seq_id * 128 - s, 0) AS BIGINT) AS tok_from,
            CAST(least((seq_id + 1) * 128 - s, n) AS BIGINT) AS tok_to,
            CAST(greatest(s - seq_id * 128, 0) AS BIGINT) AS seq_off
          FROM e ORDER BY seq_id, seq_off""",

    // The thumbnail key replays the nearest-neighbor sampling as ascii
    // codes; the grouping is exact on the 16-value list.
    "q_image_dup_groups" ->
      """WITH k AS (SELECT doc_id AS media_id, list_transform(range(0, 16),
            i -> CASE WHEN (i // 4) * 64 + (i % 4) * 4 < length(text)
              THEN ascii(text[(i // 4) * 64 + (i % 4) * 4 + 1])
              ELSE 0 END) AS key
          FROM documents),
          g AS (SELECT key, CAST(min(media_id) AS BIGINT) AS rep_id,
            CAST(count(*) AS BIGINT) AS gsize FROM k GROUP BY 1)
          SELECT k.media_id, g.rep_id, g.gsize
          FROM k JOIN g USING (key) ORDER BY media_id""",

    // Animated-GIF frames are 8x8 gray windows over the text: frame f
    // sums ascii codes of chars f*64+1 .. min(len, f*64+64) (zero pad
    // contributes nothing); frame count = max(1, min(4, ceil(len/64))).
    "q_video_frames" ->
      """SELECT doc_id AS media_id, CAST(f.f AS BIGINT) AS frame_idx,
           8 AS width, 8 AS height,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(
               range(f.f * 64 + 1, least(length(text), f.f * 64 + 64) + 1),
               i -> CAST(ascii(text[i]) AS BIGINT))),
             (a, b) -> a + b) AS BIGINT) AS sum_luma
         FROM documents, range(0, 4) f(f)
         WHERE f.f < greatest(1, least(4,
           CAST(ceil(length(text) / 64.0) AS INT)))
         ORDER BY media_id, frame_idx""",

    // 64-sample frames, last partial kept: frame f covers chars
    // f*64+1 .. min(len, f*64+64); the frame range is CORRELATED
    // (ceil(len/64) per document) — a fixed cap would silently truncate
    // long documents on the oracle side only.
    "q_audio_frames" ->
      """WITH t AS (SELECT doc_id, text,
            unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)))
              AS f
          FROM documents)
         SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(65536 * list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(
               range(f * 64 + 1, least(length(text), f * 64 + 64) + 1),
               i -> CAST((ascii(text[i]) - 64) * (ascii(text[i]) - 64)
                 AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS frame_energy
         FROM t ORDER BY media_id, frame_idx""",

    "q_event_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_hopping_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, "value" FROM events),
          h AS (SELECT ((us // 900000000) - i.i) * 900000000 AS ws,
            "value" FROM e, range(0, 4) i(i)),
          w AS (SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S')
              AS window_start,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM h GROUP BY 1)
          SELECT window_start, n_events, sum_value FROM w
          ORDER BY window_start""",

    "q_recursive" ->
      """WITH RECURSIVE tree(doc_id, depth) AS (
           SELECT doc_id, 0 FROM documents WHERE doc_id = 0
           UNION ALL
           SELECT d.doc_id, t.depth + 1
           FROM documents d JOIN tree t ON (d.doc_id - 1) // 2 = t.doc_id
           WHERE d.doc_id > 0)
         SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM tree GROUP BY depth ORDER BY depth""",

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
           (o_orderstatus), ())
         ORDER BY gid, o_orderstatus, o_orderpriority""",

    "q_unpivot" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           metric, value
         FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax FROM lineitem)
         UNPIVOT (value FOR metric IN
           (l_quantity, l_extendedprice, l_discount, l_tax))
         ORDER BY l_orderkey, l_linenumber, metric""",

    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
         FROM orders GROUP BY o_custkey
         HAVING COUNT(*) >= 15 ORDER BY o_custkey""",

    "q_exists_correlated" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_totalprice > c.c_acctbal * 100)
         ORDER BY c_custkey""",

    "q_lateral_topn" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n JOIN LATERAL (
           SELECT c_name, c_acctbal FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON true
         ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""",

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
         ORDER BY c_custkey""",

    "q_scd2" ->
      """WITH h1 AS (SELECT o_orderkey, o_orderstatus,
            CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
            true AS is_current FROM orders),
          c2 AS (SELECT o_orderkey, 'X' AS st FROM orders
            WHERE o_orderkey % 7 = 0),
          e2 AS (SELECT h.o_orderkey, h.o_orderstatus, h.valid_from,
              CAST(2 AS BIGINT) AS valid_to, false AS is_current
            FROM h1 h JOIN c2 ON c2.o_orderkey = h.o_orderkey
            WHERE h.is_current AND h.o_orderstatus <> c2.st),
          k2 AS (SELECT h.* FROM h1 h WHERE NOT (h.is_current AND EXISTS (
            SELECT 1 FROM c2 WHERE c2.o_orderkey = h.o_orderkey
              AND c2.st <> h.o_orderstatus))),
          f2 AS (SELECT c2.o_orderkey, c2.st AS o_orderstatus,
              CAST(2 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
              true AS is_current
            FROM c2 LEFT JOIN (SELECT o_orderkey, o_orderstatus FROM h1
              WHERE is_current) cur USING (o_orderkey)
            WHERE cur.o_orderkey IS NULL OR cur.o_orderstatus <> c2.st),
          h2 AS (SELECT * FROM k2 UNION ALL SELECT * FROM e2
            UNION ALL SELECT * FROM f2),
          c3 AS (SELECT o_orderkey, 'Y' AS st FROM orders
            WHERE o_orderkey % 21 = 0),
          e3 AS (SELECT h.o_orderkey, h.o_orderstatus, h.valid_from,
              CAST(3 AS BIGINT) AS valid_to, false AS is_current
            FROM h2 h JOIN c3 ON c3.o_orderkey = h.o_orderkey
            WHERE h.is_current AND h.o_orderstatus <> c3.st),
          k3 AS (SELECT h.* FROM h2 h WHERE NOT (h.is_current AND EXISTS (
            SELECT 1 FROM c3 WHERE c3.o_orderkey = h.o_orderkey
              AND c3.st <> h.o_orderstatus))),
          f3 AS (SELECT c3.o_orderkey, c3.st AS o_orderstatus,
              CAST(3 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
              true AS is_current
            FROM c3 LEFT JOIN (SELECT o_orderkey, o_orderstatus FROM h2
              WHERE is_current) cur USING (o_orderkey)
            WHERE cur.o_orderkey IS NULL OR cur.o_orderstatus <> c3.st),
          h3 AS (SELECT * FROM k3 UNION ALL SELECT * FROM e3
            UNION ALL SELECT * FROM f3)
          SELECT o_orderkey, o_orderstatus, valid_from, valid_to, is_current
          FROM h3 ORDER BY o_orderkey, valid_from""",

    "q_scalar_subquery" ->
      """SELECT p_partkey, p_brand,
          CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM part p
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) *
            (SELECT count(*) FROM part p2
             WHERE p2.p_brand = p.p_brand) * 100 >
          (SELECT sum(CAST(p2.p_retailprice AS DECIMAL(18,2)))
           FROM part p2 WHERE p2.p_brand = p.p_brand) * 101
        ORDER BY p_partkey""",

    "q_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_30d
        FROM orders ORDER BY o_orderkey""",

    "q_cdc_apply" ->
      """SELECT user_id, max(event_id) AS last_event_id,
          arg_max(value, event_id) AS last_value,
          CAST(count(*) AS BIGINT) AS n_changes
        FROM events GROUP BY 1
        HAVING arg_max(event_type, event_id) <> 'error'
        ORDER BY user_id""",

    "q_union_tagged" ->
      """SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 250000
         UNION ALL
         SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_orderkey, tag""",

    "q_except" ->
      """SELECT o_custkey FROM orders
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_totalprice > 150000
         ORDER BY o_custkey""",

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_up, lower(p_brand) AS brand_lo,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_type, ' ', '_') AS type_us,
           substr(p_name, 1, 10) AS name10,
           CAST(length(p_name) AS BIGINT) AS name_len,
           reverse(p_brand) AS brand_rev
         FROM part ORDER BY p_partkey""",

    "q_date_parts" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
         FROM orders ORDER BY o_orderkey""",

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",

    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
            WHERE event_type = 'purchase'),
          s AS (SELECT user_id, epoch_us(ts) AS us FROM events
            WHERE event_type = 'signup')
          SELECT p.event_id, p.user_id, s.us AS signup_us
          FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.us <= p.us
          ORDER BY p.event_id""",

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         s1 AS (SELECT user_id, min(us) AS t_1 FROM e
           WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, t_1, min(us) AS t_2 FROM e
           JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND us > t_1 GROUP BY 1, 2),
         s3 AS (SELECT e.user_id, t_1, t_2, min(us) AS t_3 FROM e
           JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND us > t_2 GROUP BY 1, 2, 3)
         SELECT user_id, t_1, t_2, t_3,
           CAST(1 + CASE WHEN t_2 IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN t_3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS steps_completed
         FROM s1 LEFT JOIN s2 USING (user_id, t_1)
           LEFT JOIN s3 USING (user_id, t_1, t_2)
         ORDER BY user_id""",

    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, min(us) // 604800000000 AS cohort FROM e
           GROUP BY 1),
         a AS (SELECT DISTINCT e.user_id, cohort,
           us // 604800000000 - cohort AS period_offset
           FROM e JOIN f USING (user_id))
         SELECT cohort, period_offset, CAST(count(*) AS BIGINT) AS n_users
         FROM a GROUP BY 1, 2 ORDER BY cohort, period_offset""",

    "q_ab_test" ->
      s"""WITH pu AS (SELECT user_id,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
            FROM events GROUP BY 1),
          bk AS (SELECT conv, ${duckBucketOf("user_id")} AS bkt FROM pu),
          s AS (SELECT
            CAST(sum(CASE WHEN bkt < 5000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_a,
            CAST(sum(CASE WHEN bkt >= 5000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_b,
            CAST(sum(CASE WHEN bkt < 5000 THEN conv ELSE 0 END)
              AS BIGINT) AS conv_a,
            CAST(sum(CASE WHEN bkt >= 5000 THEN conv ELSE 0 END)
              AS BIGINT) AS conv_b
            FROM bk),
          f AS (SELECT n_a, n_b, conv_a, conv_b,
            (CAST(n_a AS HUGEINT) + n_b) *
              (CAST(conv_a AS HUGEINT) * (n_b - conv_b) -
               CAST(conv_b AS HUGEINT) * (n_a - conv_a)) *
              (CAST(conv_a AS HUGEINT) * (n_b - conv_b) -
               CAST(conv_b AS HUGEINT) * (n_a - conv_a)) AS num,
            CAST(n_a AS HUGEINT) * n_b *
              (CAST(conv_a AS HUGEINT) + conv_b) *
              (CAST(n_a AS HUGEINT) - conv_a + n_b - conv_b) AS den
            FROM s)
          SELECT n_a, n_b, conv_a, conv_b,
            CASE WHEN n_a = 0 THEN NULL
              ELSE ${duckPpm("conv_a", "n_a")} END AS rate_a_ppm,
            CASE WHEN n_b = 0 THEN NULL
              ELSE ${duckPpm("conv_b", "n_b")} END AS rate_b_ppm,
            CASE WHEN den = 0 THEN NULL
              ELSE ${duckPpm("num", "den")} END AS chi2_ppm
          FROM f""",

    "q_markov" ->
      s"""WITH e AS (SELECT user_id, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS nxt
            FROM events),
          p AS (SELECT event_type AS from_type, nxt AS to_type,
            CAST(count(*) AS BIGINT) AS n
            FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
          t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tt
            FROM p GROUP BY 1)
          SELECT p.from_type, p.to_type, p.n,
            ${duckPpm("p.n", "t.tt")} AS p_ppm
          FROM p JOIN t USING (from_type)
          ORDER BY from_type, to_type""",

    "q_kaplan_meier" ->
      s"""WITH pu AS (SELECT user_id,
            min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
            FROM events GROUP BY 1),
          mxd AS (SELECT max(l) AS mx FROM pu),
          bt AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
            CAST(count(*) AS BIGINT) AS na,
            CAST(sum(CASE WHEN l = mxd.mx THEN 0 ELSE 1 END) AS BIGINT)
              AS d
            FROM pu CROSS JOIN mxd GROUP BY 1),
          tt AS (SELECT CAST(sum(na) AS BIGINT) AS n FROM bt),
          rk AS (SELECT t, d, tt.n - CAST(coalesce(sum(na) OVER
              (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
               1 PRECEDING), 0) AS BIGINT) AS nr
            FROM bt CROSS JOIN tt),
          de AS (SELECT t, nr, d FROM rk WHERE d > 0),
          lx AS (SELECT DISTINCT x FROM (
            SELECT nr AS x FROM de WHERE d < nr
            UNION SELECT nr - d FROM de WHERE d < nr)),
          $duckLog2Chain,
          ls AS (SELECT de.t, de.nr, de.d,
            CASE WHEN de.d = de.nr THEN 0 ELSE l1.lq - l2.lq END AS loss
            FROM de LEFT JOIN lgt l1 ON l1.x = de.nr
            LEFT JOIN lgt l2 ON l2.x = de.nr - de.d),
          cmv AS (SELECT t, nr, d,
            CAST(sum(loss) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
            max(CASE WHEN d = nr THEN 1 ELSE 0 END) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
            FROM ls),
          exkm AS (SELECT DISTINCT cum AS x FROM cmv WHERE z = 0),
          ${duckExp2Chain("km")}
          SELECT cmv.t AS t_days, cmv.nr AS n_at_risk,
            cmv.d AS n_events,
            CASE WHEN cmv.z = 1 THEN 0
              ELSE ${duckPpm("CAST(1048576 AS BIGINT)", "e.v")}
            END AS surv_ppm
          FROM cmv LEFT JOIN e2tkm e ON e.x = cmv.cum
          ORDER BY t_days""",

    "q_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
           value FROM events),
         p AS (SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           FROM e GROUP BY 1, 2),
         g AS (SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
           FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
                 FROM p GROUP BY 1)),
         j AS (SELECT g.user_id, g.bucket,
           coalesce(n_events, 0) AS n_events, sum_value
           FROM g LEFT JOIN p ON g.user_id = p.user_id AND g.bucket = p.bucket)
         SELECT user_id, bucket, CAST(n_events AS BIGINT) AS n_events,
           sum_value,
           last_value(sum_value IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_sum
         FROM j ORDER BY user_id, bucket""",

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
           FROM events),
         l AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
           ORDER BY us, event_id) AS prev FROM e),
         c AS (SELECT user_id, event_type, us, event_id FROM l
           WHERE prev IS NULL OR prev != event_type)
         SELECT user_id, event_type, us AS valid_from_us,
           lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS valid_to_us,
           lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             IS NULL AS is_current
         FROM c ORDER BY user_id, valid_from_us""",

    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
           FROM events),
         l AS (SELECT user_id, us, value,
           lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             AS prev_us FROM e),
         m AS (SELECT user_id, us, value,
           CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
                THEN 1 ELSE 0 END AS is_new FROM l),
         s AS (SELECT user_id, us, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY us
             ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         SELECT user_id,
           strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S')
             AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         l AS (SELECT user_id, event_id, us,
           lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
           FROM e),
         m AS (SELECT user_id, event_id, us,
           CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                THEN 1 ELSE 0 END AS is_new FROM l),
         s AS (SELECT user_id, us,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM m)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S') AS session_start
         FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",

    "q_cuped" ->
      s"""WITH u AS (SELECT user_id,
            sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS x,
            sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS y
            FROM events GROUP BY 1),
          v AS (SELECT x, y, ${duckBucketOf("user_id")} AS bkt FROM u),
          s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
            sum(x * x) AS sxx, sum(x * y) AS sxy,
            sum(CASE WHEN bkt < 5000 THEN 1 ELSE 0 END) AS n_a,
            sum(CASE WHEN bkt >= 5000 THEN 1 ELSE 0 END) AS n_b,
            sum(CASE WHEN bkt < 5000 THEN x ELSE 0 END) AS sx_a,
            sum(CASE WHEN bkt >= 5000 THEN x ELSE 0 END) AS sx_b,
            sum(CASE WHEN bkt < 5000 THEN y ELSE 0 END) AS sy_a,
            sum(CASE WHEN bkt >= 5000 THEN y ELSE 0 END) AS sy_b
            FROM v),
          t AS (SELECT *, n * sxy - sx * sy AS tnum,
            n * sxx - sx * sx AS tden,
            sy_a * n_b - sy_b * n_a AS dynum,
            sx_a * n_b - sx_b * n_a AS dxnum,
            n_a * n_b AS dden FROM s),
          th AS (SELECT *, CASE WHEN tden > 0
            THEN ${duckPpm("tnum", "tden")} END AS theta_ppm FROM t)
          SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
            theta_ppm,
            CASE WHEN dden > 0 THEN ${duckPpm("dynum", "dden")} END
              AS delta_raw_ppm,
            CASE WHEN dden > 0 AND theta_ppm IS NOT NULL THEN
              ${duckPpm("1000000 * dynum - theta_ppm * dxnum",
                "1000000 * dden")} END AS delta_cuped_ppm
          FROM th""",

    "q_did" ->
      s"""WITH e AS (SELECT
            ${duckBucketOf("user_id")} < 5000 AS treated,
            ts >= TIMESTAMP '2024-01-16' AS post,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events),
          s AS (SELECT
            sum(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END) AS n_tq,
            sum(CASE WHEN treated AND post THEN 1 ELSE 0 END) AS n_tp,
            sum(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END) AS n_cq,
            sum(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END) AS n_cp,
            sum(CASE WHEN treated AND NOT post THEN cents ELSE 0 END) AS s_tq,
            sum(CASE WHEN treated AND post THEN cents ELSE 0 END) AS s_tp,
            sum(CASE WHEN NOT treated AND NOT post THEN cents ELSE 0 END) AS s_cq,
            sum(CASE WHEN NOT treated AND post THEN cents ELSE 0 END) AS s_cp
            FROM e),
          tr AS (SELECT *,
            CASE WHEN n_tp > 0 AND n_tq > 0 THEN
              ${duckPpm("s_tp * n_tq - s_tq * n_tp", "n_tp * n_tq")} END
              AS trend_t_ppm,
            CASE WHEN n_cp > 0 AND n_cq > 0 THEN
              ${duckPpm("s_cp * n_cq - s_cq * n_cp", "n_cp * n_cq")} END
              AS trend_c_ppm FROM s)
          SELECT CAST(n_tq AS BIGINT) AS n_t_pre,
            CAST(n_tp AS BIGINT) AS n_t_post,
            CAST(n_cq AS BIGINT) AS n_c_pre,
            CAST(n_cp AS BIGINT) AS n_c_post,
            CASE WHEN n_tq > 0 THEN ${duckPpm("s_tq", "n_tq")} END
              AS mean_t_pre_ppm,
            CASE WHEN n_tp > 0 THEN ${duckPpm("s_tp", "n_tp")} END
              AS mean_t_post_ppm,
            CASE WHEN n_cq > 0 THEN ${duckPpm("s_cq", "n_cq")} END
              AS mean_c_pre_ppm,
            CASE WHEN n_cp > 0 THEN ${duckPpm("s_cp", "n_cp")} END
              AS mean_c_post_ppm,
            trend_t_ppm, trend_c_ppm,
            trend_t_ppm - trend_c_ppm AS did_ppm
          FROM tr""",

    "q_pareto_front" ->
      s"""WITH t AS (SELECT doc_id, n_chars,
            CAST(len(list_distinct(${duckToks("text")})) AS BIGINT)
              AS n_vocab FROM documents)
          SELECT doc_id, n_chars, n_vocab FROM t a
          WHERE NOT EXISTS (SELECT 1 FROM t b
            WHERE b.n_chars <= a.n_chars AND b.n_vocab >= a.n_vocab
              AND (b.n_chars < a.n_chars OR b.n_vocab > a.n_vocab))
          ORDER BY n_chars, doc_id""",

    "q_cdc_chunks" ->
      s"""WITH ${duckCdcCk()}
          SELECT chash, CAST(min(clen) AS BIGINT) AS clen,
            CAST(count(*) AS BIGINT) AS n_occ,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM ck GROUP BY 1 HAVING count(*) >= 2 ORDER BY chash""",

    "q_cdc_decontam" ->
      s"""WITH ${duckCdcCk()},
          ek AS (SELECT DISTINCT chash FROM ck
            WHERE doc_id < 50 AND clen >= 24),
          co AS (SELECT DISTINCT doc_id, chash FROM ck
            WHERE doc_id >= 50 AND clen >= 24)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_chunks
          FROM co JOIN ek USING (chash)
          GROUP BY 1 ORDER BY doc_id""",

    "q_cdc_savings" ->
      s"""WITH ${duckCdcCk()},
          cs AS (SELECT chash, min(clen) AS clen, count(*) AS n_occ
            FROM ck GROUP BY 1),
          t AS (SELECT sum(n_occ) AS n_chunks, count(*) AS n_unique,
            sum(clen * n_occ) AS total_chars, sum(clen) AS unique_chars
            FROM cs)
          SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
            CAST(n_unique AS BIGINT) AS n_unique,
            CAST(total_chars AS BIGINT) AS total_chars,
            CAST(unique_chars AS BIGINT) AS unique_chars,
            ${duckPpm("total_chars - unique_chars", "total_chars")}
              AS savings_ppm
          FROM t""",

    "q_strat_att" ->
      s"""WITH u AS (SELECT user_id,
            sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS x,
            sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS y
            FROM events GROUP BY 1),
          st AS (SELECT least(x // 500000, 4) AS s,
            CASE WHEN ${duckBucketOf("user_id")} < 5000 THEN 1 ELSE 0 END
              AS it, y FROM u),
          g AS (SELECT s, sum(it) AS n_t, sum(1 - it) AS n_c,
            sum(it * y) AS s_t, sum((1 - it) * y) AS s_c
            FROM st GROUP BY 1),
          us AS (SELECT *,
            ${duckPpm("s_t * n_c - s_c * n_t", "n_t * n_c")} AS diff_ppm
            FROM g WHERE n_t > 0 AND n_c > 0),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
            sum(n_t) AS nt, sum(n_t * diff_ppm) AS wd FROM us),
          r AS (SELECT sum(n_t) AS rnt, sum(n_c) AS rnc,
            sum(s_t) AS rst, sum(s_c) AS rsc FROM g)
          SELECT n_strata_used, CAST(nt AS BIGINT) AS n_t_used,
            CASE WHEN nt > 0 THEN ${duckPpm("wd", "nt", 1L)} END
              AS att_ppm,
            CASE WHEN rnt > 0 AND rnc > 0 THEN
              ${duckPpm("rst * rnc - rsc * rnt", "rnt * rnc")} END
              AS raw_diff_ppm
          FROM a, r""",

    "q_span_corrupt" ->
      s"""WITH tk AS (SELECT doc_id, ${duckToks("text")} AS tk
            FROM documents),
          p AS (SELECT doc_id, CAST(unnest(range(0, len(tk))) AS BIGINT)
              AS pos, CAST(len(tk) AS BIGINT) AS nt
            FROM tk WHERE len(tk) > 0),
          m AS (SELECT doc_id, pos, nt,
            CASE WHEN ${duckBucketOf("(doc_id * 1048576 + pos)")} < 1500
              THEN 1 ELSE 0 END AS mk FROM p),
          sp AS (SELECT doc_id, nt, mk,
            CASE WHEN mk = 1 AND coalesce(lag(mk) OVER
              (PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS st FROM m),
          g AS (SELECT doc_id, CAST(max(nt) AS BIGINT) AS n_tokens,
            CAST(sum(mk) AS BIGINT) AS n_masked,
            CAST(sum(st) AS BIGINT) AS n_spans FROM sp GROUP BY 1)
          SELECT doc_id, n_tokens, n_masked, n_spans,
            ${duckPpm("n_masked", "n_tokens")} AS mask_ratio_ppm,
            CASE WHEN n_spans > 0 THEN ${duckPpm("n_masked", "n_spans")}
              END AS mean_span_len_ppm
          FROM g ORDER BY doc_id""",

    "q_dedup_weights" ->
      s"""WITH RECURSIVE $duckLshPairsCte,
          $duckCcCompCte,
          csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                     FROM comp GROUP BY component),
          tkw AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
            FROM documents)
          SELECT c.doc_id, c.component, z.csize, t.n_tokens,
            ${duckPpm("1", "z.csize")} AS w_ppm,
            ${duckPpm("t.n_tokens", "z.csize")} AS eff_tokens_ppm
          FROM comp c JOIN csizes z USING (component)
          JOIN tkw t USING (doc_id)
          ORDER BY c.doc_id""",

    "q_effective_tokens" ->
      s"""WITH RECURSIVE $duckLshPairsCte,
          $duckCcCompCte,
          csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                     FROM comp GROUP BY component),
          tkw AS (SELECT doc_id,
            CAST(len(${duckToks("text")}) AS BIGINT) AS n_tokens
            FROM documents),
          pw AS (SELECT c.doc_id, c.component, t.n_tokens,
            ${duckPpm("t.n_tokens", "z.csize")} AS eff
            FROM comp c JOIN csizes z USING (component)
            JOIN tkw t USING (doc_id)),
          ag AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            CAST(sum(eff) AS BIGINT) AS eff_tokens_ppm FROM pw)
          SELECT n_docs, n_clusters, total_tokens, eff_tokens_ppm,
            CASE WHEN eff_tokens_ppm > 0 THEN ${duckPpm(
              "CAST(1000000 AS HUGEINT) * total_tokens",
              "eff_tokens_ppm")} END AS inflation_ppm
          FROM ag""",

    "q_assortativity" ->
      s"""WITH $duckSnmCandCte,
          dg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
            (SELECT id_a AS v FROM cand
             UNION ALL SELECT id_b FROM cand) GROUP BY 1),
          jj AS (SELECT da.d AS du, db.d AS dv FROM cand
            JOIN dg da ON da.v = cand.id_a
            JOIN dg db ON db.v = cand.id_b),
          s AS (SELECT CAST(count(*) AS BIGINT) AS m,
            CAST(sum(du * dv) AS BIGINT) AS a,
            CAST(sum(du + dv) AS BIGINT) AS b,
            CAST(sum(du * du + dv * dv) AS BIGINT) AS c FROM jj)
          SELECT m AS n_edges, a AS sum_jk, b AS sum_j_plus_k,
            c AS sum_j2_plus_k2,
            CASE WHEN 2 * m * c - b * b > 0 THEN
              ${duckPpm("4 * m * a - b * b", "2 * m * c - b * b")} END
              AS r_ppm
          FROM s""",

    "q_cka" ->
      s"""WITH ea AS (SELECT vec_id AS id,
            CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT) AS i,
            unnest(list_transform(range(1, len(embedding) + 1),
              k -> CAST(round(CAST(embedding[k] AS DOUBLE) * 1000, 0)
                AS BIGINT))) AS x
            FROM embeddings),
          eb AS (SELECT id, i, x FROM ea WHERE i <= 32),
          nn AS (SELECT CAST(count(DISTINCT id) AS HUGEINT) AS n FROM ea),
          mab AS (SELECT a.i, b.i AS j, CAST(sum(a.x * b.x) AS HUGEINT)
              AS sxy FROM ea a JOIN eb b ON a.id = b.id GROUP BY 1, 2),
          maa AS (SELECT a.i, b.i AS j, CAST(sum(a.x * b.x) AS HUGEINT)
              AS sxy FROM ea a JOIN ea b ON a.id = b.id GROUP BY 1, 2),
          mbb AS (SELECT a.i, b.i AS j, CAST(sum(a.x * b.x) AS HUGEINT)
              AS sxy FROM eb a JOIN eb b ON a.id = b.id GROUP BY 1, 2),
          sxa AS (SELECT i, CAST(sum(x) AS HUGEINT) AS sx FROM ea
            GROUP BY 1),
          sxb AS (SELECT i, CAST(sum(x) AS HUGEINT) AS sx FROM eb
            GROUP BY 1),
          cab AS (SELECT coalesce(sum((n * sxy - a.sx * b.sx) *
              (n * sxy - a.sx * b.sx)), 0) AS f
            FROM mab JOIN sxa a ON a.i = mab.i
            JOIN sxb b ON b.i = mab.j CROSS JOIN nn),
          caa AS (SELECT coalesce(sum((n * sxy - a.sx * b.sx) *
              (n * sxy - a.sx * b.sx)), 0) AS f
            FROM maa JOIN sxa a ON a.i = maa.i
            JOIN sxa b ON b.i = maa.j CROSS JOIN nn),
          cbb AS (SELECT coalesce(sum((n * sxy - a.sx * b.sx) *
              (n * sxy - a.sx * b.sx)), 0) AS f
            FROM mbb JOIN sxb a ON a.i = mbb.i
            JOIN sxb b ON b.i = mbb.j CROSS JOIN nn)
          SELECT
            (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM ea) AS n_rows,
            (SELECT CAST(max(i) AS BIGINT) FROM ea) AS d_a,
            (SELECT CAST(max(i) AS BIGINT) FROM eb) AS d_b,
            CASE WHEN caa.f > 0 AND cbb.f > 0 THEN
              round((CAST(cab.f AS DOUBLE) / CAST(caa.f AS DOUBLE)) *
                (CAST(cab.f AS DOUBLE) / CAST(cbb.f AS DOUBLE)), 6)
              END AS cka2
          FROM cab, caa, cbb""",

    "q_logrank" ->
      s"""WITH pu AS (SELECT user_id,
            min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
            FROM events GROUP BY 1),
          pa AS (SELECT f, l,
            CASE WHEN ${duckBucketOf("user_id")} < 5000 THEN 1 ELSE 0 END
              AS a FROM pu),
          mxd AS (SELECT max(l) AS mx FROM pa),
          bt AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
            CAST(sum(a) AS BIGINT) AS all1,
            CAST(sum(1 - a) AS BIGINT) AS all0,
            CAST(sum(CASE WHEN l = mxd.mx THEN 0 ELSE a END) AS BIGINT)
              AS d1,
            CAST(sum(CASE WHEN l = mxd.mx THEN 0 ELSE 1 - a END)
              AS BIGINT) AS d0
            FROM pa CROSS JOIN mxd GROUP BY 1),
          tt AS (SELECT CAST(sum(all1) AS BIGINT) AS n1t,
            CAST(sum(all0) AS BIGINT) AS n0t FROM bt),
          rk AS (SELECT t, d1, d0,
            tt.n1t - CAST(coalesce(sum(all1) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n1,
            tt.n0t - CAST(coalesce(sum(all0) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n0
            FROM bt CROSS JOIN tt),
          de AS (SELECT t, d1, d0, n1, n0, d1 + d0 AS dd, n1 + n0 AS nn
            FROM rk WHERE d1 + d0 > 0),
          tm AS (SELECT d1, d0, ${duckPpm("dd * n1", "nn")} AS e1,
            CASE WHEN nn > 1 THEN
              ${duckPpm("dd * n1 * n0 * (nn - dd)", "nn * nn * (nn - 1)")}
              ELSE 0 END AS v FROM de),
          ag AS (SELECT CAST(coalesce(sum(d1), 0) AS BIGINT) AS o1,
            CAST(coalesce(sum(d0), 0) AS BIGINT) AS o0,
            CAST(coalesce(sum(e1), 0) AS BIGINT) AS e1s,
            CAST(coalesce(sum(v), 0) AS BIGINT) AS vs FROM tm)
          SELECT tt.n1t AS n_a, tt.n0t AS n_b, o1 AS n_deaths_a,
            o0 AS n_deaths_b,
            1000000 * o1 - e1s AS o_minus_e_ppm, vs AS var_ppm,
            CASE WHEN vs > 0 THEN ${duckPpm(
              "CAST(1000000 * o1 - e1s AS HUGEINT) * (1000000 * o1 - e1s)",
              "CAST(1000000 AS HUGEINT) * vs")} END AS z2_ppm
          FROM ag CROSS JOIN tt""",

    "q_mann_kendall" ->
      s"""WITH t AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS o,
            CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
          p AS (SELECT CAST(coalesce(sum(CASE WHEN b.x > a.x THEN 1
              WHEN b.x < a.x THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat
            FROM t a JOIN t b ON b.o > a.o),
          ti AS (SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0)
              AS BIGINT) AS tsum,
            CAST(coalesce(sum(c), 0) AS BIGINT) AS n_obs
            FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM t GROUP BY x)),
          v AS (SELECT n_obs, s_stat,
            n_obs * (n_obs - 1) * (2 * n_obs + 5) - tsum AS var18
            FROM p CROSS JOIN ti)
          SELECT n_obs, s_stat, CAST(var18 AS BIGINT) AS var18,
            CASE WHEN s_stat = 0 THEN 0
              WHEN var18 > 0 THEN ${duckPpm(
                "18 * (abs(s_stat) - 1) * (abs(s_stat) - 1)", "var18")}
              END AS z2_ppm
          FROM v""",

    "q_cliffs_delta" ->
      s"""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
            FROM events GROUP BY 1),
          m AS (SELECT v,
            CASE WHEN ${duckBucketOf("user_id")} < 5000 THEN 1 ELSE 0 END
              AS ia FROM u),
          c AS (SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
            CAST(sum(1 - ia) AS BIGINT) AS cb FROM m GROUP BY 1),
          w AS (SELECT *, CAST(coalesce(sum(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cbb FROM c),
          a AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
            CAST(sum(cb) AS BIGINT) AS n_b,
            CAST(sum(ca * (2 * cbb + cb)) AS BIGINT) AS win FROM w),
          d AS (SELECT n_a, n_b, win - n_a * n_b AS dom FROM a),
          e AS (SELECT n_a, n_b, CAST(dom AS BIGINT) AS dominance,
            CASE WHEN n_a > 0 AND n_b > 0 THEN
              ${duckPpm("dom", "n_a * n_b")} END AS cliffs_ppm FROM d)
          SELECT n_a, n_b, dominance, cliffs_ppm,
            CASE WHEN cliffs_ppm IS NULL THEN NULL
              WHEN abs(cliffs_ppm) < 147000 THEN 'negligible'
              WHEN abs(cliffs_ppm) < 330000 THEN 'small'
              WHEN abs(cliffs_ppm) < 474000 THEN 'medium'
              ELSE 'large' END AS magnitude
          FROM e""",

    "q_qte" ->
      s"""WITH u AS (SELECT user_id,
            sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END) AS y
            FROM events GROUP BY 1),
          m AS (SELECT CAST(y AS BIGINT) AS y,
            CASE WHEN ${duckBucketOf("user_id")} < 5000 THEN 'a'
              ELSE 'b' END AS arm FROM u),
          r AS (SELECT arm, y,
            row_number() OVER (PARTITION BY arm ORDER BY y) AS rn,
            count(*) OVER (PARTITION BY arm) AS n FROM m),
          qs AS (SELECT CAST(unnest([2500, 5000, 7500]) AS BIGINT)
            AS q_bps),
          pick AS (SELECT arm, q_bps, y FROM r CROSS JOIN qs
            WHERE rn = greatest(1, (n * q_bps + 9999) // 10000))
          SELECT a.q_bps, a.y AS q_a, b.y AS q_b, a.y - b.y AS qte
          FROM pick a JOIN pick b ON a.q_bps = b.q_bps
          WHERE a.arm = 'a' AND b.arm = 'b'
          ORDER BY 1""",

    "q_chrf" ->
      s"""WITH $duckSnmCandCte,
          st AS (SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS t
            FROM documents),
          gr AS (SELECT doc_id, unnest(list_transform(
              range(1, length(t) - 1),
              i -> substr(t, CAST(i AS INTEGER), 3))) AS gram
            FROM st WHERE length(t) >= 3),
          g AS (SELECT doc_id, ${duckPolyId("gram")} AS g FROM gr),
          gc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
            FROM g GROUP BY 1, 2),
          tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t
            FROM gc GROUP BY 1),
          ov AS (SELECT c.id_a, c.id_b,
              CAST(sum(least(a.c, b.c)) AS BIGINT) AS o
            FROM cand c JOIN gc a ON a.doc_id = c.id_a
            JOIN gc b ON b.doc_id = c.id_b AND b.g = a.g
            GROUP BY 1, 2),
          f AS (SELECT c.id_a, c.id_b,
              CAST(coalesce(o.o, 0) AS BIGINT) AS n_overlap,
              ta.t AS n_cand, tb.t AS n_ref
            FROM cand c JOIN tot ta ON ta.doc_id = c.id_a
            JOIN tot tb ON tb.doc_id = c.id_b
            LEFT JOIN ov o ON o.id_a = c.id_a AND o.id_b = c.id_b)
          SELECT id_a, id_b, n_overlap, n_cand, n_ref,
            ${duckPpm("n_overlap", "n_cand")} AS chrf_p_ppm,
            ${duckPpm("n_overlap", "n_ref")} AS chrf_r_ppm,
            ${duckPpm("5 * n_overlap", "4 * n_ref + n_cand")} AS chrf_ppm
          FROM f ORDER BY id_a, id_b""",

    "q_source_overlap_kmv" ->
      s"""WITH tk AS (SELECT source, ${duckToks("text")} AS tk
            FROM documents),
          sh0 AS (SELECT source, unnest(CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
              i -> array_to_string(tk[i:i+2], ' '))
            ELSE [] END) AS gram FROM tk),
          sh AS (SELECT DISTINCT source, ${duckPolyId("gram")} AS tid
            FROM sh0),
          h AS (SELECT source, tid, ${duckMixOf("tid")} AS mv FROM sh),
          rk AS (SELECT source, tid, mv, row_number() OVER
            (PARTITION BY source ORDER BY mv ASC, tid ASC) AS rn FROM h),
          sk AS (SELECT source, tid, mv FROM rk WHERE rn <= 128),
          pr AS (SELECT a.source AS grp_a, b.source AS grp_b
            FROM (SELECT DISTINCT source FROM sk) a,
                 (SELECT DISTINCT source FROM sk) b
            WHERE a.source < b.source),
          du AS (SELECT pr.grp_a, pr.grp_b, sk.tid, sk.mv,
              CAST(sum(CASE WHEN sk.source = pr.grp_a THEN 1 ELSE 2 END)
                AS BIGINT) AS src
            FROM pr JOIN sk
              ON sk.source = pr.grp_a OR sk.source = pr.grp_b
            GROUP BY 1, 2, 3, 4),
          ur AS (SELECT *, row_number() OVER
            (PARTITION BY grp_a, grp_b ORDER BY mv ASC, tid ASC) AS rn
            FROM du),
          ks AS (SELECT grp_a, grp_b, CAST(count(*) AS BIGINT) AS n_kept,
              CAST(max(mv) AS BIGINT) AS kth_mv,
              CAST(sum(CASE WHEN src = 3 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_inter
            FROM ur WHERE rn <= 128 GROUP BY 1, 2),
          es AS (SELECT *, CASE WHEN n_kept < 128 THEN n_kept
              WHEN kth_mv = 0 THEN NULL
              ELSE (CAST(127 AS BIGINT) * 2147483647) // kth_mv END
              AS est_union FROM ks)
          SELECT grp_a, grp_b, n_kept, kth_mv,
            CAST(est_union AS BIGINT) AS est_union, n_inter,
            ${duckPpm("n_inter", "n_kept")} AS jaccard_ppm,
            CAST(CASE WHEN est_union IS NULL THEN NULL
              ELSE (n_inter * est_union) // n_kept END AS BIGINT)
              AS est_inter
          FROM es ORDER BY grp_a, grp_b""",
  )
}
