package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilters — the corpus-scale alternative to
  * broadcasting the reference set itself.
  *
  * A broadcast hash semi-join ships ~100+ bytes per reference key (hash
  * table + long key + object headers) to every executor; the bloom ships
  * ~10 BITS per key at 1% false positives — ~2 orders of magnitude
  * smaller, so reference sets far past the broadcast budget still fit.
  * The filter embeds in the scan-stage codegen'd Filter, so the big side
  * is pruned BEFORE its first exchange: only true matches plus the
  * fp-rate survive into any downstream shuffle. Blooms have no false
  * negatives, so an exact verification join over the (tiny) survivor set
  * restores exact semantics — the same prefilter-then-verify shape as the
  * LSH near-dup paths.
  *
  * Re-expresses contamination/overlap checks a training-data pipeline
  * runs against eval benchmarks (cf. the reference's join-based lookups,
  * /root/reference/Batch_notebook/operations/operations.py) on Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` kernels — the
  * codegen'd pair Spark itself uses for runtime join pruning.
  */
object Bloom {

  /** Default bit ceiling, mirroring Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` default (2^26
    * bits = 8 MiB). Spark SILENTLY clamps `BloomFilterAggregate`'s numBits
    * to that conf, so an unclamped request would allocate less than the
    * caller believes; and the blob travels as a plan `Literal`, so an
    * unbounded request would otherwise make a multi-GB plan object.
    */
  val DefaultMaxBits: Long = 1L << 26

  /** Bits for a target false-positive rate: ceil(-n·ln(p)/ln(2)²), clamped
    * to `maxBits`. Past the clamp the EFFECTIVE fpp degrades (~0.6185^(bits
    * /n)) but correctness never does — blooms have no false negatives, and
    * every consumer here exact-verifies the survivors.
    */
  def bitsFor(expectedItems: Long, fpp: Double,
      maxBits: Long = DefaultMaxBits): Long = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    require(maxBits >= 64, s"maxBits must be >= 64, got $maxBits")
    math.min(maxBits, math.max(64L, math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
  }

  /** Serialized bloom filter over xxhash64(c) of `df`'s rows — ONE small
    * binary blob materialized on the driver (the same bounded driver-side
    * artifact as heavyHitters' candidate list; the input is the SMALL
    * reference side by contract). Returns None for an empty input.
    */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    // Honor a raised session cap, never exceed it: Spark clamps to these
    // confs internally, so exceeding them would only misstate the blob size.
    val conf = df.sparkSession.conf
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", DefaultMaxBits.toString).toLong
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(c)),
      Literal(math.min(expectedItems, maxItems)),
      Literal(bitsFor(expectedItems, fpp, maxBits)))
    val row = df.select(
      GraftBridge.column(agg.toAggregateExpression()).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Membership test against a serialized bloom: true for every inserted
    * value, true with probability ~fpp for absent ones. The bloom rides
    * into codegen as a literal, so the test runs at scan speed with no
    * broadcast exchange.
    */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftBridge.column(new BloomFilterMightContain(
      Literal(bloomBytes), GraftBridge.expression(xxhash64(c))))

  /** Exact benchmark decontamination through a bloom prefilter: identical
    * output to `Dedup.decontaminate` (drop corpus docs sharing more than
    * `maxSharedShingles` word n-grams with the eval set), but the corpus
    * gram stream is cut to bloom survivors at the scan BEFORE the distinct
    * — the full-corpus gram shuffle of the plain path disappears, and the
    * exact semi-join that removes bloom false positives only ever sees the
    * survivor trickle. Eval-set gram count is taken with one small count()
    * job to size the bloom.
    */
  def decontaminateBloom(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, shingleSize: Int, maxSharedShingles: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    val evalSh = Dedup.docShingleIds(evalDocs, idCol, textCol, shingleSize)
      .select(col("tid")).distinct()
    val nGrams = evalSh.count()
    if (nGrams == 0) return docs
    val bloom = buildBloom(evalSh, col("tid"), nGrams, fpp)
      .getOrElse(return docs)
    val survivors = Dedup.docShingleIds(docs, idCol, textCol, shingleSize)
      .filter(mightContain(bloom, col("tid")))
      .distinct()
    // No broadcast hint on the verify join: the module's whole premise is
    // an eval set past the broadcast budget, so forcing a broadcast here
    // would OOM the driver in exactly the regime the bloom exists for.
    // AQE picks broadcast on its own when the eval side measures small;
    // otherwise this degrades to a shuffle join over the survivor trickle.
    val contaminated = survivors
      .join(evalSh, Seq("tid"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") > maxSharedShingles)
      .select(col(idCol))
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}
