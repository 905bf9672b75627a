package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Throwaway stage-level profiling harness (not part of the library surface).
object ProfStages {
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
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // inline replica of the perceptron loop with per-phase timing
    val dec = "decimal(38,0)"
    val docs = Tables.documents(spark, d)
    val idCol = "doc_id"
    val labels = docs.select(col(idCol),
      when(array_contains(graft.functions.Text.tokens(col("text")), "stream"),
        1L).otherwise(-1L).as("y"))
    val lab = labels.select(col(idCol), col("y").cast("long").as("y"))
    val nBuckets = 64
    val x = t("x-checkpoint") {
      docs.select(col(idCol),
          graft.plans.TextExpressions.hashedShingles(col("text"), 1))
        .select(col(idCol), pmod(col("tid"), lit(nBuckets.toLong)).as("bkt"))
        .distinct()
        .withColumn("cnt", lit(1L))
        .unionByName(lab.select(col(idCol), lit(-1L).as("bkt"),
          lit(1L).as("cnt")))
        .join(lab, Seq(idCol))
        .repartition(col(idCol))
        .localCheckpoint(true)
    }
    var w: DataFrame = null
    for (r <- 1 to 12) {
      val joined =
        if (w == null) x.withColumn("__p", lit(0L).cast(dec))
        else x.join(broadcast(w), Seq("bkt"), "left")
          .withColumn("__p",
            (coalesce(col("w"), lit(0L)) * col("cnt")).cast(dec))
          .drop("w")
      val mis = t(s"r$r-mis") {
        joined.groupBy(col(idCol))
          .agg(min(col("y")).as("y"), sum(col("__p")).cast(dec).as("__s"))
          .filter(col("y") * col("__s") <= 0)
          .select(col(idCol))
          .localCheckpoint(true)
      }
      if (t(s"r$r-empty")(mis.isEmpty)) { println(s"converged r$r") }
      else {
        w = t(s"r$r-w") {
          val delta = x.join(mis, Seq(idCol), "left_semi")
            .groupBy(col("bkt"))
            .agg(sum(col("y") * col("cnt")).cast("long").as("__d"))
          (if (w == null) delta.select(col("bkt"), col("__d").as("w"))
           else w.join(delta, Seq("bkt"), "full_outer")
             .select(col("bkt"),
               (coalesce(col("w"), lit(0L)) + coalesce(col("__d"), lit(0L)))
                 .as("w")))
            .localCheckpoint(true)
        }
      }
    }
    if (args.contains("explain")) {
      x.groupBy(col(idCol)).agg(sum(col("cnt"))).explain("formatted")
    }
    spark.stop()
  }
}
