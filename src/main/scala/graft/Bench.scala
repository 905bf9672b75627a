package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Fully executes a query: every projection, sort, and expression runs.
    * A bare `.count()` lets Catalyst prune unreferenced projections and
    * eliminate sorts under Aggregate(count(1)), so map-only queries would
    * time a parquet scan instead of the operator. The noop sink (shipped
    * with Spark 4) consumes every row of the final plan without writing.
    */
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKNative.enable(spark)
    // Warm the session (codegen, scheduler, parquet footer caches) so the
    // first timed query doesn't absorb one-time startup cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failure must be VISIBLE: a query that regresses to throwing in
      // 50 ms would otherwise record a great "time" and silently deflate
      // the total — a breakage indistinguishable from a speed-up.
      try { exec(fn(spark, sfDir)) } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Millisecond precision keeps the line compact, and the headline
    // total goes LAST: the harness keeps only the trailing ~2k chars of
    // run output, so with 80+ queries a leading total would be the part
    // that gets truncated away.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s""""$k":${ms(v)}""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"queries":$qs,"sf":"$sfDir","metric":"total","unit":"sec","value":${ms(total)}}""")
    spark.stop()
  }
}
