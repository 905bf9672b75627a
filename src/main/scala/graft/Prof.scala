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
