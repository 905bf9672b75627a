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
}
