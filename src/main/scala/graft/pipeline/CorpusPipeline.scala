package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Text}

/** End-to-end training-corpus curation: the composition a 100 TB text
  * pipeline actually runs, built entirely from graft operators —
  *
  *   annotate (tokens, quality, language)
  *     → quality gate
  *     → exact dedup (fingerprint groups, keep smallest id)
  *     → near-dup dedup (MinHash-LSH candidates, Jaccard-verified,
  *       keep smallest id per connected pair)
  *
  * Every stage is a shuffle-bounded DataFrame transform: annotation is
  * map-only; exact dedup is one hash groupBy; near-dup is the banded LSH
  * join (linear for bounded bucket occupancy). Nothing collects to the
  * driver; stats are computed as a side aggregate.
  */
object CorpusPipeline {

  case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 10,
      stopwords: Seq[String] = Seq("the", "a"),
      shingleSize: Int = 3,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.5)

  /** Map-only annotation: token count, quality score, fingerprint. */
  def annotate(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs
      .withColumn("n_tokens", Text.tokenCount(col(cfg.textCol)))
      .withColumn("quality", Text.qualityScore(col(cfg.textCol), cfg.stopwords))
      .withColumn("fingerprint", Text.charFingerprint(col(cfg.textCol)))

  /** Quality gate: drop short docs. */
  def qualityGate(annotated: DataFrame, cfg: Config = Config()): DataFrame =
    annotated.filter(col("n_tokens") >= cfg.minTokens)

  /** Exact dedup: keep the smallest id per identical fingerprint. */
  def exactDedup(docs: DataFrame, cfg: Config = Config()): DataFrame =
    Dedup.dedupRows(docs, Seq("fingerprint"), cfg.idCol)

  /** Near-dup removal: LSH candidates over hashed shingles, then exact
    * Jaccard computed ONLY for candidate pairs (join the candidates back
    * to the shingle sets) — the whole point of banding is to avoid the
    * full inverted-list self-join at corpus scale. For every verified pair
    * the larger id is dropped. (Pair-wise drop, not full connected
    * components — the standard single-pass approximation; iterate to a
    * fixpoint if transitive clusters matter.)
    */
  def nearDedup(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val sh = Dedup.docShingleIds(docs, cfg.idCol, cfg.textCol, cfg.shingleSize)
      .distinct()
    val sig = Dedup.minhashSignature(sh, cfg.idCol, col("tid"), cfg.numHashes)
    val candidates = Dedup.lshCandidatePairs(
      Dedup.lshBands(sig, cfg.idCol, cfg.rowsPerBand), cfg.idCol)

    // Jaccard restricted to candidate pairs: shared-shingle counts via two
    // equi-joins of the candidate list against the shingle sets.
    val sizes = sh.groupBy(col(cfg.idCol)).agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sh.select(col(cfg.idCol).as("id_a"), col("tid")), Seq("id_a"))
      .join(sh.select(col(cfg.idCol).as("id_b"), col("tid")), Seq("id_b", "tid"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val verified = inter
      .join(sizes.select(col(cfg.idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(cfg.idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .filter(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double")
        >= cfg.jaccardThreshold)
    val toDrop = verified.select(col("id_b").as(cfg.idCol)).distinct()
    docs.join(toDrop, Seq(cfg.idCol), "left_anti")
  }

  /** Held-out split assignment over the CURATED corpus (split after
    * dedup, never before: a near-dup pair straddling train/test is
    * leakage the split exists to prevent). Deterministic by id hash —
    * reruns and incremental batches agree on every assignment.
    */
  def assignSplits(curated: DataFrame,
      weights: Seq[(String, Int)] = Seq(
        "train" -> 9800, "val" -> 100, "test" -> 100),
      cfg: Config = Config()): DataFrame =
    graft.functions.Sampling.splitAssign(curated, cfg.idCol, weights)

  /** Full curation; returns (curated-with-splits, statsRow). Each stage is
    * materialized once (localCheckpoint) — the stats row and the returned
    * frame would otherwise re-execute the whole lineage per consumer.
    */
  def curate(docs: DataFrame, cfg: Config = Config()): (DataFrame, DataFrame) = {
    val gated = qualityGate(annotate(docs, cfg), cfg).localCheckpoint(true)
    val exact = exactDedup(gated, cfg).localCheckpoint(true)
    val near = assignSplits(nearDedup(exact, cfg), cfg = cfg)
      .localCheckpoint(true)
    val stats = docs.select(count(lit(1)).as("n_input"))
      .crossJoin(gated.select(count(lit(1)).as("n_gated")))
      .crossJoin(exact.select(count(lit(1)).as("n_exact")))
      .crossJoin(near.select(count(lit(1)).as("n_curated")))
    (near, stats)
  }
}
