package graft
import org.apache.spark.sql.SparkSession
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
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = Tables.embeddings(spark, d)
    val n = t("count")(emb.count()); println("n=" + n)
    val kc = graft.functions.Vec.deriveKCells(n, 64L); println("kCells=" + kc)
    val cells = graft.functions.Vec.kmeans(emb, kc, 2, "vec_id", "embedding")
      .select(col("vec_id"), col("cell"))
    t("kmeans-exec")(exec(cells))
    val pairs = graft.functions.Vec.mutualKnnPairs(emb, 3, kc, 2,
      "vec_id", "embedding")
    t("pairs-exec")(exec(pairs))
    t("pairs-exec2")(exec(pairs))
    val cc = t("cc-define")(graft.functions.Cluster.assignClusters(pairs,
      "id_a", "id_b", emb.select(col("vec_id")), "vec_id"))
    t("cc-exec")(exec(cc))
    t("full-again")(exec(
      graft.functions.Vec.mutualKnnClustersAuto(emb, 3, 2, 64L)))
    // break down inside pairs: bucketed, directed (window top-k), recip
    val cells2 = graft.functions.Vec.kmeans(emb, kc, 2, "vec_id", "embedding")
      .select(col("vec_id"), col("cell"))
    val bucketed = emb.select(col("vec_id"), col("embedding"))
      .join(cells2, Seq("vec_id"))
    t("bucketed-exec")(exec(bucketed))
    t("bucketed-exec2")(exec(bucketed))
    import org.apache.spark.sql.expressions.Window
    val b2 = bucketed.select(col("cell"), col("vec_id"), col("embedding"),
      sqrt(graft.plans.VecExpressions.dotProduct(col("embedding"),
        col("embedding"))).as("nrm"))
    val a2 = b2.select(col("cell"), col("vec_id").as("query_id"),
      col("embedding").as("va"), col("nrm").as("na"))
    val c2 = b2.select(col("cell"), col("vec_id").as("neighbor_id"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    val joined = a2.join(c2, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
    t("celljoin-exec")(exec(joined))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val directed = joined
      .withColumn("sim", round(
        graft.plans.VecExpressions.dotProduct(col("va"), col("vb")) /
          (col("na") * col("nb")), 6))
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    t("directed-exec")(exec(directed))
    t("directed-exec2")(exec(directed))
    spark.stop()
  }
}
