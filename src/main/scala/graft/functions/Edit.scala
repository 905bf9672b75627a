package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — all pairs within Levenshtein distance
  * `maxDist` — in two exact candidate-generation regimes over the same
  * verification: positional q-gram COUNT filtering (Gravano et al. 2001,
  * "Approximate String Joins in a Database (Almost) for Free") and
  * Ed-Join PREFIX filtering (Xiao, Wang & Lin 2008). The typo/variant
  * detector of a record-linkage or vocabulary-normalization pass,
  * completing the set-similarity family (Jaccard, containment,
  * winnowing) with its EDIT-metric sibling.
  *
  * Count filter (lossless): if ed(a, b) <= d then the pair shares at
  * least T = max(|a|,|b|) - q + 1 - q*d positional q-grams matched
  * within position shift d — each edit destroys at most q grams and
  * shifts the rest by at most d. The join counts DISTINCT matched
  * a-side positions, an upper bound on any disjoint matching, so
  * `count >= T` is a relaxation — a superset of the true pairs.
  *
  * Prefix filter (lossless): under a universal gram order (global df
  * ascending, gram ascending) each string indexes only its q*d + 1
  * first DISTINCT grams — an edit changes at most q distinct grams, so
  * ed <= d forces set overlap >= |G_a| - q*d, and disjoint indexed
  * prefixes would cap overlap at |G_a| - (q*d + 1). Candidates are
  * prefix-collision pairs, verified directly.
  *
  * Regime split (measured in the edit_join ScaleProbe A/B): the count
  * path joins FULL posting lists — candidate mass sum(df^2) — but
  * prunes with the shared-gram threshold; the prefix path joins only
  * (q*d+1)-sized prefixes chosen to be the RAREST grams, so hub grams
  * leave the index entirely. On Zipf-shaped vocabularies the prefix
  * path wins by the hub-list mass (15.4 vs 2.9 s at 15k words, 241 vs
  * 5.5 s at 60k); on degenerate tiny-alphabet vocabularies both are
  * quadratic (with ~A^2 possible grams every gram is a hub — no gram
  * signal exists to block on; that floor is information-theoretic, not
  * a plan defect). The catalog runs the prefix path.
  *
  * Both gram bounds are vacuous when max(len) <= q*(d+1) - 1, so SHORT
  * strings take a separate block: all short-short pairs under the
  * length filter. Over DISTINCT strings this block is ALPHABET-bounded
  * — at most |Sigma|^(q*(d+1)-1) strings are that short. Short-long
  * pairs always land in the gram paths (their max length clears
  * q*(d+1) and their min length >= q). The paths partition the pair
  * space by max(len) — no double emission. Survivors are verified with
  * the exact threshold `levenshtein` (the DP early-exits past
  * maxDist), so verification is candidate-mass-bounded at
  * O(len * maxDist) per check.
  */
object Edit {

  /** (__id, __s, __len) normalized input. */
  private def normalized(df: DataFrame, idCol: String,
      strCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

  /** The alphabet-bounded short-short candidate block (both lengths
    * <= shortMax) under the length filter.
    */
  private def shortBlock(rows: DataFrame, shortMax: Int,
      maxDist: Int): DataFrame = {
    val shorts = rows.filter(col("__len") <= shortMax)
    shorts.toDF("__ida", "__sa", "__la")
      .join(shorts.toDF("__idb", "__sb", "__lb"),
        col("__ida") < col("__idb") &&
          abs(col("__la") - col("__lb")) <= maxDist)
  }

  /** Exact verification tail shared by both paths: threshold-DP
    * levenshtein over the candidate union, final (id_a, id_b, dist).
    */
  private def verified(candidates: DataFrame, maxDist: Int): DataFrame =
    candidates
      .withColumn("__dist",
        levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("__dist") >= 0 && col("__dist") <= maxDist)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("__dist").cast("int").as("dist"))

  /** All (id_a, id_b, dist) with id_a < id_b and
    * levenshtein(str_a, str_b) <= maxDist — positional-count-filter
    * path. Strings must be non-null and ids unique per string.
    * `dfCap` optionally drops grams whose DOCUMENT frequency (distinct
    * strings containing them) exceeds the cap; unlike the Jaccard
    * family's cap this TRADES RECALL (a dropped gram can push a true
    * pair below T), so it defaults to off.
    */
  def editPairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
      q: Int = 2, dfCap: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val rows = normalized(df, idCol, strCol)
    val shortMax = q * (maxDist + 1) - 1

    // positional q-gram postings over every string with len >= q
    val posted0 = rows.filter(col("__len") >= q)
      .select(col("__id"), col("__s"), col("__len"),
        posexplode(expr(
          s"transform(sequence(1, __len - ${q - 1}), i -> substring(__s, i, $q))")))
      .select(col("__id"), col("__s"), col("__len"),
        (col("pos") + 1).as("__pos"), col("col").as("__gram"))
    val posted =
      if (dfCap == Long.MaxValue) posted0
      else {
        val keep = posted0.groupBy(col("__gram"))
          .agg(countDistinct(col("__id")).as("__df"))
          .filter(col("__df") <= dfCap).select(col("__gram"))
        posted0.join(keep, Seq("__gram"))
      }
    val a = posted.select(col("__gram"), col("__pos").as("__pa"),
      col("__id").as("__ida"), col("__s").as("__sa"), col("__len").as("__la"))
    val b = posted.select(col("__gram"), col("__pos").as("__pb"),
      col("__id").as("__idb"), col("__s").as("__sb"), col("__len").as("__lb"))
    val candidates = a.join(b, Seq("__gram"))
      .filter(col("__ida") < col("__idb") &&
        abs(col("__la") - col("__lb")) <= maxDist &&
        abs(col("__pa") - col("__pb")) <= maxDist &&
        greatest(col("__la"), col("__lb")) > shortMax)
      .groupBy(col("__ida"), col("__idb"), col("__sa"), col("__sb"),
        col("__la"), col("__lb"))
      .agg(countDistinct(col("__pa")).as("__shared"))
      .filter(col("__shared") >=
        greatest(col("__la"), col("__lb")) - (q - 1) - q * maxDist)
      .select(col("__ida"), col("__sa"), col("__la"),
        col("__idb"), col("__sb"), col("__lb"))

    verified(candidates.unionByName(shortBlock(rows, shortMax, maxDist)),
      maxDist)
  }

  /** [[editPairs]] with Ed-Join prefix filtering — the SCALE regime of
    * the same operator (see the object scaladoc for the lemma and the
    * measured A/B).
    */
  def editPairsPrefix(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    import org.apache.spark.sql.expressions.Window
    val rows = normalized(df, idCol, strCol)
    val shortMax = q * (maxDist + 1) - 1

    // distinct grams per string (set semantics) + universal order
    val grams = rows.filter(col("__len") >= q)
      .select(col("__id"), col("__s"), col("__len"),
        explode(array_distinct(expr(
          s"transform(sequence(1, __len - ${q - 1}), i -> substring(__s, i, $q))")))
          .as("__gram"))
    val dfTable = grams.groupBy(col("__gram"))
      .agg(count(lit(1)).as("__df"))
    // per-string prefix: word-length-bounded partitions
    val wPrefix = Window.partitionBy(col("__id"))
      .orderBy(col("__df").asc, col("__gram").asc)
    val prefix = grams.join(dfTable, Seq("__gram"))
      .withColumn("__pr", row_number().over(wPrefix))
      .filter(col("__pr") <= q * maxDist + 1)
      .select(col("__gram"), col("__id"), col("__s"), col("__len"))
    val a = prefix.toDF("__gram", "__ida", "__sa", "__la")
    val b = prefix.toDF("__gram", "__idb", "__sb", "__lb")
    val candidates = a.join(b, Seq("__gram"))
      .filter(col("__ida") < col("__idb") &&
        abs(col("__la") - col("__lb")) <= maxDist &&
        greatest(col("__la"), col("__lb")) > shortMax)
      .select(col("__ida"), col("__sa"), col("__la"),
        col("__idb"), col("__sb"), col("__lb"))
      .distinct()

    verified(candidates.unionByName(shortBlock(rows, shortMax, maxDist)),
      maxDist)
  }
}
