package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-tolerant joins (salting) and bucketed co-located
  * joins — the knobs a 100 TB deployment turns when AQE alone isn't enough.
  */
object Scale {

  /** Salted equi-join for skewed keys: the skewed (large, hot-keyed) left
    * side gets a random salt in [0, saltFactor); the right side is
    * replicated once per salt value. Hot keys spread across saltFactor
    * reducers instead of melting one. Semantics identical to
    * `left.join(right, keys, joinType)`.
    *
    * Supported join types: inner, left/left_outer, left_semi, left_anti —
    * every left row carries exactly one salt and meets a replica group
    * containing the full right side, so null-extension (left) and
    * membership (semi/anti) behave exactly as unsalted. Right/full outer
    * are rejected: the replicated right side would emit each unmatched
    * right row saltFactor times; salt the other input instead (swap sides).
    *
    * AQE's skew-join handles sort-merge skew automatically; salting is for
    * the cases AQE can't re-split (e.g. a single key larger than any split,
    * or aggregation-after-join pipelines where partial state matters).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val canonical = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(canonical),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType " +
        "(for right/full outer, swap the inputs so the skewed side is left)")
    val spark = left.sparkSession
    val salted = left.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val salts = broadcast(graft.functions.Dedup.smallTable(spark,
      Seq("__salt" -> org.apache.spark.sql.types.IntegerType),
      (0 until saltFactor).map(i => Seq[Any](i))))
    val replicated = right.join(salts) // right × saltFactor
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Write a table bucketed (and optionally sorted) by join keys. Joins and
    * aggregations on the bucket keys then read co-located data and skip the
    * shuffle entirely — the cheapest repeated-join layout at scale.
    * Bucketed tables must go through the catalog (saveAsTable), not bare
    * paths; parquet + Hive-style bucketing metadata.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion that a bucketed join actually skipped the shuffle.
    * Tests for ShuffleExchangeLike nodes specifically: a substring match on
    * "Exchange" would also flag BroadcastExchange/ReusedExchange, wrongly
    * reporting a legitimately shuffle-free broadcast plan as shuffled.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Seq[SparkPlan] = {
      val root = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      root.collect {
        case e: ShuffleExchangeLike => e
        case q: ShuffleQueryStageExec => q
      }
    }
    shuffles(df.queryExecution.executedPlan).isEmpty
  }
}
