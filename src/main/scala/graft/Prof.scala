package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

// Throwaway profiling harness (not part of the library surface).
object Prof {
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
    def exec(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_PROF_JOBS=1: print per-job wall times (job-count-bound
    // queries show up as many small jobs; data-bound ones as few big ones)
    if (sys.env.get("SPARK_GRAFT_PROF_JOBS").contains("1")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
      spark.sparkContext.addSparkListener(new SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(js: SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime())
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(je.jobId)
          if (t0 != 0L) println(f"PROFJOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      })
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_string_funcs", "q_lang_id", "q_text_quality", "q_ngram_jaccard", "q_embed_neardup")
    for (q <- names; i <- 1 to 3) {
      val fn = SparkEntry.queries(q)
      val t0 = System.nanoTime(); exec(fn(spark, d)); val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROF $q run$i $dt%.3f s")
    }
    spark.stop()
  }
}
