package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Cluster, Linkage}

/** End-to-end entity resolution to GOLDEN RECORDS — the master-data
  * composition of the linkage layer, the structured-records sibling of
  * CorpusPipeline.curateFull: synthesize a deterministic dirty twin of
  * the customer table (the classic ER benchmark construction — corrupted
  * copies with case flips, truncations, and value drift), then block →
  * Fellegi-Sunter score → link → connected components → survivorship.
  *
  * Every stage is an existing engine primitive: blocking is an equi-join
  * on a (nationkey, name-suffix) key that the perturbations provably
  * preserve; scoring is [[Linkage.score]] with milli-bit weights; the
  * cluster pass is the pointer-jumping [[Cluster.connectedComponents]];
  * survivorship picks the most COMPLETE record per entity (longest
  * segment string, rec_id tie-break) as the base and repairs the
  * balance with the cluster minimum (the un-drifted value) — a
  * component-keyed window over clique-bounded partitions, the
  * canonical-docs shape.
  *
  * Scale (100 TB): blocking bounds candidate pairs by block volume (the
  * SNM/FS discipline), CC is round-bounded pointer jumping, and the
  * survivorship window partitions by entity — never a global sort. The
  * synthetic-twin generator is a map-only 20% append.
  */
object GoldenRecords {

  /** The clean customer table re-keyed for ER plus a deterministic
    * dirty copy of every 5th record: rec_id + 10^6, name upper-cased,
    * market segment truncated to 4 chars, balance drifted by +0.50 —
    * the same rows in BOTH engines.
    */
  def dirtyCustomers(customers: DataFrame): DataFrame = {
    val clean = customers.select(
      col("c_custkey").cast("long").as("rec_id"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").cast("decimal(18,2)").as("acctbal"),
      col("c_nationkey").cast("long").as("nationkey"))
    val dirty = clean.filter(col("rec_id") % 5 === 0)
      .select((col("rec_id") + 1000000L).as("rec_id"),
        upper(col("name")).as("name"),
        substring(col("segment"), 1, 4).as("segment"),
        (col("acctbal") + lit(0.5).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("acctbal"),
        col("nationkey"))
    clean.unionByName(dirty)
  }

  /** FS comparison fields over the a/b-suffixed pair frame. The dirty
    * twin agrees on all three (case-folded name, segment prefix,
    * near-equal balance); unrelated in-block pairs at best share the
    * segment prefix (~1 in 5) — m/u chosen accordingly and interpolated
    * verbatim into the oracle. Weight structure (spec-pinned): NO single
    * agreement clears the threshold (its two disagreements drag it
    * under), the name plus either corroborating field links, and the
    * two weak fields without the name do not.
    */
  val erFields: Seq[Linkage.Field] = Seq(
    Linkage.Field("name_ci", upper(col("name_a")) === upper(col("name_b")),
      970, 1),
    Linkage.Field("seg4",
      substring(col("segment_a"), 1, 4) === substring(col("segment_b"), 1, 4),
      950, 210),
    Linkage.Field("bal",
      abs(col("acctbal_a") - col("acctbal_b")) < 1, 900, 2))

  /** Link decision threshold (milli-bits). */
  val linkMilli = 6000L

  /** Block key: nation + the last 4 chars of the name — stable under
    * every synthesized perturbation (case folding keeps digits; the
    * name tail is digits).
    */
  private def blockKey(name: org.apache.spark.sql.Column,
      nation: org.apache.spark.sql.Column) =
    concat(nation.cast("string"), lit("|"),
      upper(substring(name, -4, 4)))

  /** Blocked candidate pairs with a/b-suffixed fields. */
  def candidatePairs(recs: DataFrame): DataFrame = {
    val keyed = recs.withColumn("__blk",
      blockKey(col("name"), col("nationkey")))
    val a = keyed.select(keyed.columns.toIndexedSeq
      .map(c => col(c).as(if (c == "__blk") c else c + "_a")): _*)
    val b = keyed.select(keyed.columns.toIndexedSeq
      .map(c => col(c).as(if (c == "__blk") c else c + "_b")): _*)
    a.join(b, Seq("__blk"))
      .filter(col("rec_id_a") < col("rec_id_b"))
  }

  /** The full pipeline: golden record per resolved entity —
    * (entity_id, n_records, name, segment, acctbal_cents). entity_id
    * is the component's minimum rec_id; name/segment come from the most
    * complete member (longest segment, rec_id tie-break); acctbal_cents
    * is the cluster-minimum balance (the un-drifted value) in exact
    * integer cents.
    */
  def golden(recs: DataFrame): DataFrame = {
    val links = Linkage.score(candidatePairs(recs), erFields,
        upperMilli = linkMilli, lowerMilli = 0L)
      .filter(col("decision") === "link")
      .select(col("rec_id_a"), col("rec_id_b"))
    val comp = Cluster.connectedComponents(links, "rec_id_a", "rec_id_b",
      recs.select(col("rec_id")), "rec_id")
    val member = recs.join(comp, Seq("rec_id"))
    val w = Window.partitionBy(col("component"))
      .orderBy(length(col("segment")).desc, col("rec_id").asc)
    val base = member.withColumn("__rn", row_number().over(w))
    val agg = member.groupBy(col("component"))
      .agg(count(lit(1)).as("n_records"), min(col("acctbal")).as("acctbal"))
    base.filter(col("__rn") === 1)
      .select(col("component").as("entity_id"), col("name"), col("segment"))
      .join(agg.select(col("component").as("entity_id"), col("n_records"),
        col("acctbal")), Seq("entity_id"))
      .select(col("entity_id"), col("n_records"), col("name"),
        col("segment"),
        // integer cents, not decimal(18,2): the 2-dec decimal * 100 is
        // exact, and the gate must never hash a DECIMAL column (the
        // driver's comparator renders wide decimal types differently
        // from BIGINT — the empirical round-6 failure rule)
        (col("acctbal") * lit(100)).cast("long").as("acctbal_cents"))
  }
}
