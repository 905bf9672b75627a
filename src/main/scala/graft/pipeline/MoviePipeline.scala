package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.merge.Merge
import graft.ops.Medallion

/** The reference's medallion pipeline end-to-end (batch variant):
  * raw multiline JSON → bronze (enveloped, partitioned) → silver
  * (movie/genres/language) with data-quality quarantine → quarantine
  * repair. Mirrors /root/reference/Batch_notebook/main.py:10-65 and
  * operations/operations.py:19-165, re-expressed with the graft operator
  * library over parquet (no Delta in this environment).
  *
  * Divergences (deliberate, SURVEY.md §7.5):
  *  - silver_update guards the re-append with a left-anti join on Id (the
  *    reference's batch variant double-appends on rerun; the Autoloader
  *    variant's whenNotMatchedInsertAll semantics are adopted as canonical).
  *  - the flattened bronze branch point is cached before fanning out into
  *    movie/genres/language/clean/quarantine (the reference recomputes it
  *    per branch).
  */
object MoviePipeline {

  val BudgetFloor = 100000L

  /** Stage 1 — raw → bronze (main.py:10-17). */
  def rawToBronze(spark: SparkSession, rawPath: String, bronzePath: String,
      ingestTime: org.apache.spark.sql.Column = current_timestamp()): Unit = {
    val raw = Medallion.readRawJson(spark, rawPath)
    val records = Medallion.explodeRecords(raw, "movie", "record")
    val bronze = Medallion.transformRaw(records, "record", "movie.json", ingestTime)
    Medallion.batchWriter(bronze, bronzePath, "p_ingestdate")
  }

  /** The silver movie projection (operations.py:62-84): flatten + cast +
    * budget floor + genre-id array + language FK stub.
    */
  def transformMovie(flat: DataFrame): DataFrame =
    flat.select(
      col("value"),
      col("Id").cast("integer").as("Id"),
      when(col("Budget") < BudgetFloor, BudgetFloor).otherwise(col("Budget"))
        .as("Budget"),
      col("Revenue"),
      col("RunTime").cast("integer").as("RunTime"),
      col("Price"),
      col("Title"), col("Overview"), col("Tagline"),
      col("ImdbUrl"), col("TmdbUrl"), col("PosterUrl"), col("BackdropUrl"),
      col("ReleaseDate").cast("date").as("ReleaseDate"),
      col("CreatedDate").cast("date").as("p_CreatedDate"),
      col("UpdatedDate"), col("UpdatedBy"), col("CreatedBy"),
      col("Genres.id").as("Genres_Id"),
      lit(1).as("Language_Id"))

  /** Genres dimension (fix_genres, operations.py:53-54). */
  def transformGenres(flat: DataFrame): DataFrame =
    Medallion.dimensionFromArray(flat, "Genres")

  /** Language dimension (operations.py:91-97). */
  def transformLanguage(flat: DataFrame): DataFrame =
    flat.select(lit(1).as("Id"), col("OriginalLanguage")).distinct()

  /** Stage 2 — bronze → silver (main.py:21-46). Returns
    * (cleanCount, quarantinedCount) for reconciliation.
    */
  def bronzeToSilver(spark: SparkSession, bronzePath: String,
      silverDir: String): (Long, Long) = {
    val bronzeNew = Medallion.filterStatus(
      spark.read.parquet(bronzePath), "new")
    val flat = Medallion.flattenValue(bronzeNew).cache()

    val movie = transformMovie(flat).distinct()
    val (clean, quarantined) =
      Medallion.cleanQuarantineSplit(movie, col("RunTime") >= 0)

    Medallion.batchWriter(clean, s"$silverDir/movie_silver", "p_CreatedDate",
      excludeCols = Seq("value"))
    // Dimensions accumulate across batches via anti-join upsert: a plain
    // overwrite would wipe rows from earlier batches (dangling FKs from
    // older silver movies), and the reference's plain append would
    // duplicate dimension rows on every run.
    upsertDimension(spark, transformGenres(flat),
      s"$silverDir/genres_silver", Seq("Id", "name"))
    upsertDimension(spark, transformLanguage(flat),
      s"$silverDir/language_silver", Seq("Id", "OriginalLanguage"))

    // Materialize both merge sources BEFORE the first bronze rewrite: the
    // lazy plans reference the bronze files being replaced underneath them.
    val cleanKeys = clean.select(col("value")).distinct().localCheckpoint(true)
    val quarKeys = quarantined.select(col("value")).distinct().localCheckpoint(true)
    val counts = (clean.count(), quarantined.count())

    // MERGE status writeback on the full struct key (operations.py:112-129).
    updateBronzeStatus(spark, bronzePath, cleanKeys, "loaded")
    updateBronzeStatus(spark, bronzePath, quarKeys, "quarantined")
    flat.unpersist()
    counts
  }

  /** Dimension upsert: append only the rows whose key is absent (J2 shape).
    * First batch creates the table.
    */
  def upsertDimension(spark: SparkSession, dim: DataFrame, path: String,
      keyCols: Seq[String]): Unit = {
    val exists = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))
    // Read with the dimension's own schema: a previous empty batch leaves
    // a directory with no parquet footers, which schema inference would
    // reject ("Unable to infer schema") and permanently wedge the pipeline.
    val fresh =
      if (!exists) dim
      else dim.join(spark.read.schema(dim.schema).parquet(path),
        keyCols, "left_anti")
    Medallion.batchWriter(fresh, path, "Id")
  }

  /** J1 — mark bronze rows whose `value` struct matches a silver-side row
    * with the given status (whenMatchedUpdate on struct equality).
    */
  /** Expects `keys`: a single-`value`-column, already-distinct, already-
    * materialized DataFrame (localCheckpoint) — the caller owns
    * materialization so the key set is built exactly once per stage
    * instead of per merge.
    */
  def updateBronzeStatus(spark: SparkSession, bronzePath: String,
      keys: DataFrame, status: String): Unit =
    Merge.rewriteTable(spark, bronzePath, Some("p_ingestdate")) { bronze =>
      Merge.whenMatchedUpdateOn(bronze, keys,
        (t, s) => t("value") === s("value"),
        Map("status" -> lit(status)),
        dedupSource = false)
    }

  /** Stage 3 — quarantine repair (main.py:50-59 + the Autoloader anti-join
    * guard, Silver_update.py:50-60).
    */
  def silverUpdate(spark: SparkSession, bronzePath: String,
      silverDir: String): Long = {
    val quarantined = Medallion.filterStatus(
      spark.read.parquet(bronzePath), "quarantined")
    val flat = Medallion.flattenValue(quarantined).distinct()
    val repaired = transformMovie(
      Medallion.repairAbs(flat, "RunTime")).distinct()

    val moviePath = s"$silverDir/movie_silver"
    val existing = spark.read.parquet(moviePath)
    val toInsert = repaired.drop("value")
      .join(existing.select("Id"), Seq("Id"), "left_anti")
      .localCheckpoint(true)
    val repairedKeys = repaired.select(col("value")).distinct().localCheckpoint(true)
    val n = toInsert.count()
    if (n > 0)
      Medallion.batchWriter(toInsert, moviePath, "p_CreatedDate")
    updateBronzeStatus(spark, bronzePath, repairedKeys, "loaded")
    n
  }

  /** Full pipeline (main.py:63-65). */
  def run(spark: SparkSession, rawPath: String, bronzePath: String,
      silverDir: String): Unit = {
    rawToBronze(spark, rawPath, bronzePath)
    bronzeToSilver(spark, bronzePath, silverDir)
    silverUpdate(spark, bronzePath, silverDir)
  }
}
