package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Medallion

/** K4/S2 + §2.9 SQL surface: database DDL, external parquet tables
  * registered by location, catalog scans, and raw SQL over them — the
  * stock-Spark equivalent of the reference's
  * `CREATE TABLE ... USING DELTA LOCATION` catalog
  * (Batch_notebook/rawToBronze.py:80-88, config/configuration.py:23-24).
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("external table DDL + catalog scan + SQL aggregation") {
    val dir = TestSpark.tmpDir("catalog")
    val rawDir = MovieFixture.writeRaw(dir)
    val bronze = Medallion.transformRaw(
      Medallion.explodeRecords(
        Medallion.readRawJson(spark, rawDir), "movie", "record"),
      "record", "movie.json")
    Medallion.batchWriter(bronze, s"$dir/bronze", "p_ingestdate")

    spark.sql("CREATE DATABASE IF NOT EXISTS movie_db")
    spark.sql("USE movie_db")
    spark.sql("DROP TABLE IF EXISTS movie_bronze")
    spark.sql(
      s"CREATE TABLE movie_bronze USING PARQUET LOCATION '$dir/bronze'")
    // Partitioned parquet layouts don't self-describe like Delta: the
    // catalog needs an explicit partition-discovery pass after DDL.
    spark.sql("MSCK REPAIR TABLE movie_bronze")

    // S2 — catalog scan by name.
    assert(spark.read.table("movie_bronze").count() === 4)
    // §2.9 — the reference's count-by-status reconciliation SQL.
    val n = spark.sql(
      "SELECT count(*) FROM movie_bronze WHERE status = 'new'")
      .head().getLong(0)
    assert(n === 4L)

    spark.sql("DROP TABLE IF EXISTS movie_bronze")
    spark.sql("USE default")
    spark.sql("DROP DATABASE movie_db")
  }

  test("bucketed tables co-locate: the bucket-key join plans with NO " +
      "shuffle exchange on either side") {
    import org.apache.spark.sql.functions._
    // The 100 TB join posture the scaladocs cite, demonstrated for
    // real: both sides written bucketed by the join key, the sort-merge
    // join reads bucket i against bucket i directly — zero Exchange.
    // At scale this turns every recurring fact-dim or fact-fact join on
    // the bucket key into a shuffle-free map-side merge.
    val d = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("g_orders_b")
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("g_lineitem_b")
    // the fixture is small enough to auto-broadcast; the 100 TB regime
    // this demonstrates is the one where neither side broadcasts
    val abKey = "spark.sql.autoBroadcastJoinThreshold"
    val abPrev = spark.conf.getOption(abKey)
    spark.conf.set(abKey, "-1")
    try {
      val joined = spark.table("g_lineitem_b")
        .join(spark.table("g_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not reshuffle either bucketed side: no
      // Exchange may appear BELOW the join (the aggregate above it may
      // still exchange on o_custkey)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
        s"bucketed join reshuffled a bucketed side:\n$plan")
      // and it computes the right thing
      val viaBuckets = joined.agg(sum(col("rev"))).head.getDouble(0)
      val direct = Tables.lineitem(spark, d)
        .agg(sum(col("l_extendedprice"))).head.getDouble(0)
      assert(math.abs(viaBuckets - direct) < 1e-6)
    } finally {
      abPrev match {
        case Some(v) => spark.conf.set(abKey, v)
        case None => spark.conf.unset(abKey)
      }
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }
}
