package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MoviePipeline

/** End-to-end medallion pipeline: raw → bronze → silver → repair, with the
  * status lifecycle new → loaded|quarantined → loaded (SURVEY.md §3, §5.4).
  */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("full pipeline lifecycle on the movie fixture") {
    val root = TestSpark.tmpDir("e2e")
    val rawDir = MovieFixture.writeRaw(s"$root/raw".tap(mkdirs))
    val bronzePath = s"$root/bronze"
    val silverDir = s"$root/silver"

    // Stage 1: raw → bronze.
    MoviePipeline.rawToBronze(spark, rawDir, bronzePath)
    val bronze1 = spark.read.parquet(bronzePath)
    assert(bronze1.count() === 4)
    assert(bronze1.filter(col("status") === "new").count() === 4)

    // Stage 2: bronze → silver (+status writeback).
    val (nClean, nQuar) = MoviePipeline.bronzeToSilver(spark, bronzePath, silverDir)
    assert(nClean === 2L)
    assert(nQuar === 1L)

    val bronze2 = spark.read.parquet(bronzePath)
    // duplicate Id=3 rows share the same value struct -> both marked loaded
    assert(bronze2.filter(col("status") === "loaded").count() === 3)
    assert(bronze2.filter(col("status") === "quarantined").count() === 1)
    assert(bronze2.filter(col("status") === "new").count() === 0)

    val silver1 = spark.read.parquet(s"$silverDir/movie_silver")
    assert(silver1.count() === 2)
    assert(!silver1.columns.contains("value"))

    val genres = spark.read.parquet(s"$silverDir/genres_silver")
    assert(genres.count() === 2) // Action, Drama; empty name dropped

    // Stage 3: quarantine repair with anti-join guard.
    val inserted = MoviePipeline.silverUpdate(spark, bronzePath, silverDir)
    assert(inserted === 1L)
    val silver2 = spark.read.parquet(s"$silverDir/movie_silver")
    assert(silver2.count() === 3)
    assert(silver2.filter(col("RunTime") < 0).count() === 0)
    assert(silver2.filter(col("Id") === 2).select("RunTime")
      .head().getInt(0) === 95)

    val bronze3 = spark.read.parquet(bronzePath)
    assert(bronze3.filter(col("status") === "loaded").count() === 4)

    // Idempotence: re-running the repair inserts nothing (the guard the
    // reference's batch variant lacks).
    val again = MoviePipeline.silverUpdate(spark, bronzePath, silverDir)
    assert(again === 0L)
    assert(spark.read.parquet(s"$silverDir/movie_silver").count() === 3)
  }

  private def mkdirs(p: String): Unit =
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
  implicit class Tap(s: String) {
    def tap(f: String => Unit): String = { f(s); s }
  }
}
