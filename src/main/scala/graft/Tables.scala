package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * single-parquet tables from it. Column pruning + predicate pushdown reach
  * the parquet scan because we return the raw scan DataFrame and let the
  * caller project/filter declaratively.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reader-frame memo per (session, path): `spark.read.parquet`
    * re-resolves the data source on every call (file listing + footer
    * schema read + analysis — pure driver latency repeated hundreds of
    * times across the catalog); a catalog table resolves once. The memo
    * holds only the LAZY analyzed reader (metadata — never rows or
    * results): every execution still scans the parquet files.
    */
  private val readers =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    readers.computeIfAbsent(
      (System.identityHashCode(spark), s"$sfDir/$name.parquet"),
      key => spark.read.parquet(key._2))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")

  /** events with `ts` normalized to a session-local microsecond
    * TIMESTAMP, whatever the file stores. Generations of the testdata
    * have used TIMESTAMP(NANOS) — which Spark only reads as a long
    * (session must set spark.sql.legacy.parquet.nanosAsLong=true), so
    * `ts div 1000` truncates ns -> us exactly like DuckDB's
    * timestamp_ns -> timestamp cast — and plain TIMESTAMP_NTZ(MICROS),
    * which needs only the ntz -> ltz reinterpretation (the session zone
    * is UTC everywhere here, so the instant is unchanged). Branching on
    * the READ schema keeps every events consumer working against either
    * file generation.
    */
  def eventsTs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = events(s, d)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
