package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}

/** Triage harness (not part of the library surface): for every catalog
  * entry, one priming run (memos/JIT warm) then one timed run recording
  * the WALL and the SUM OF JOB WALLS — `driver ≈ wall − jobsum` flags
  * entries whose time is Catalyst analysis/planning, not cluster work
  * (job overlap makes jobsum an overcount, so the driver share is a
  * LOWER bound; it found q_odds_ratio spending 1.8 s/run in the
  * analyzer on a 0.05 s job). Args: optional query names (default: the
  * full catalog in order). Output: one `DRIVERSHARE` line per entry.
  */
object DriverShare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKNative.enable(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobNs = new AtomicLong
    val nJobs = new AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(je.jobId)
        if (t0 != 0L) { jobNs.addAndGet(System.nanoTime() - t0); nJobs.incrementAndGet() }
      }
    })
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      try {
        exec(fn(spark, d)) // priming: family memos + codegen warm
        GraftBridge.drainListenerBus(spark)
        jobNs.set(0L); nJobs.set(0L)
        val t0 = System.nanoTime()
        exec(fn(spark, d))
        val wall = (System.nanoTime() - t0) / 1e9
        GraftBridge.drainListenerBus(spark)
        val js = jobNs.get / 1e9
        println(f"DRIVERSHARE $q%-28s wall ${wall}%7.3f jobsum ${js}%7.3f " +
          f"njobs ${nJobs.get}%3d driver>= ${math.max(0.0, wall - js)}%7.3f")
      } catch { case e: Throwable =>
        println(s"DRIVERSHARE $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
