package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTI-EXECUTOR probe: the same heavy families as [[ScalingProbe]],
  * run once on `local[32]` (one JVM, 32 threads) and once on
  * `local-cluster[4,8,8g]` (REAL separate executor JVMs: 4 workers × 8
  * cores — equal total cores), walls and task-seconds side by side.
  *
  * What this adds over every other card: local[N] hides the two things
  * a 1000-executor cluster is made of — (a) per-executor memory
  * isolation (ScalingProbe proved the single JVM's memory subsystem is
  * the >8-thread wall; separate heaps multiply that resource), and
  * (b) REAL serialization: closures ship over the wire, broadcasts
  * and shuffle blocks cross process boundaries, and any operator that
  * silently assumed executor == driver JVM (a static cache consulted
  * on the driver, an unserializable capture) fails here and nowhere
  * else. The families deliberately include the compiled-expression
  * paths (WeightFoldSum model arrays ride codegen reference tables;
  * GramHash static kernels), a mapPartitions codec (ImageIO state per
  * executor), and a serving probe loop (driver-held frontier against
  * executor-held buckets) — the shapes most likely to hide a
  * same-JVM assumption.
  *
  * Run (SPARK_HOME must point at a full Spark dist for worker launch):
  *
  *   SPARK_HOME=/opt/spark SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.ClusterProbe"
  *
  * Wall-clock comparisons between the two modes carry a caveat the
  * card records rather than hides: local-cluster pays real IPC and
  * its executors start cold per run, so a modest wall regression is
  * expected for shuffle-light families; what must NOT appear is a
  * failure, a hash mismatch, or a pathological (multi-×) wall blowup
  * on the shuffle-heavy ones.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_CLUSTER_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val classesDir = new java.io.File("target/scala-2.13/classes")
      .getAbsolutePath
    val addOpens = Seq("java.base/java.lang", "java.base/java.nio",
      "java.base/sun.nio.ch", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.lang.invoke",
      "java.base/jdk.internal.misc")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)

    def session(master: String): SparkSession = {
      val b = SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
      val withExec =
        if (master.startsWith("local-cluster"))
          b.config("spark.executor.extraClassPath", classesDir)
            .config("spark.executor.extraJavaOptions", addOpens)
            .config("spark.executor.memory", "7g")
        else b
      val s = withExec.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      graft.plans.TopKNative.enable(s)
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) taskNanos.addAndGet(m.executorRunTime * 1000000L): Unit
          }
        })
      s
    }

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def docsX(s: SparkSession, m: Int): DataFrame = {
      val base = Tables.documents(s, sfDir)
      val replicas = s.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
        .select((col("doc_id") * m + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .repartition(128)
    }
    def embX(s: SparkSession, m: Int): DataFrame = {
      val base = Tables.embeddings(s, sfDir)
      val replicas = s.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
        .select((col("vec_id") * m + col("rep")).as("vec_id"),
          col("embedding"))
        .repartition(128)
    }

    // (name, mult, body, checksum) — the checksum (a count or an exact
    // aggregate collected per mode) is the cross-mode CORRECTNESS gate:
    // identical numbers from one JVM and from four executor JVMs.
    val probes: Seq[(String, Int, (SparkSession, Int) => Long)] = Seq(
      ("lsh_bands", 16, (s, m) => {
        val sh = graft.functions.Dedup.docShingleIds(
          docsX(s, m), "doc_id", "text", 3)
        val sig = graft.functions.Dedup.minhashSignature(
          sh, "doc_id", col("tid"), 8)
        graft.functions.Dedup.lshCandidatePairsUncached(
          graft.functions.Dedup.lshBands(sig, "doc_id", 2), "doc_id")
          .count()
      }),
      ("ngram_jaccard", 8, (s, m) => {
        val n = graft.functions.Dedup.ngramJaccardPairsUncached(
          docsX(s, m), "doc_id", "text", n = 3, minJaccard = 0.2,
          dfCap = 1000000L).count()
        graft.functions.Dedup.releasePairMemos()
        n
      }),
      ("suffix_doubling", 8, (s, m) => {
        val tables = graft.functions.Suffix.rankTables(
          docsX(s, m), "doc_id", "text", rounds = 5)
        val n = tables.last.count()
        tables.foreach(org.apache.spark.sql.GraftBridge.unpersistCheckpoint)
        n
      }),
      ("brute_cosine", 32, (s, m) => {
        val corpus = embX(s, m)
        val queries = corpus.filter(col("vec_id") % lit(m * 8) === 0)
        graft.functions.Vec.bruteForceTopKUncached(queries, corpus, k = 5)
          .count()
      }),
      // compiled-expression + driver-loop family: the model array must
      // serialize to executors through the codegen reference table
      ("perceptron", 4, (s, m) => {
        val docs = docsX(s, m)
        val labels = docs.select(col("doc_id"),
          when(array_contains(graft.functions.Text.tokens(col("text")),
            "stream"), 1L).otherwise(-1L).as("y"))
        graft.functions.Classifier.perceptronScores(docs, "doc_id", "text",
            labels, nBuckets = 64, rounds = 12)
          .agg(sum(col("score")).cast("long")).head().getLong(0)
      }),
      // mapPartitions codec family: per-executor ImageIO state
      ("video_decode", 2, (s, m) => {
        graft.multimodal.Media.videoFrameLuma(
            graft.multimodal.Media.textAsGif(docsX(s, m), "doc_id", "text"))
          .agg(sum(col("sum_luma")).cast("long")).head().getLong(0)
      }),
      // lexical serving: tuned child session + bucket-pruned postings
      // reads (term buckets live on whichever executor reads them —
      // the pruned-scan claim under real multi-executor file IO)
      ("bm25_serve", 2, (s, m) => {
        val docs = docsX(s, m)
        val path = java.nio.file.Files
          .createTempDirectory("clusterbm").toString
        graft.functions.TextIndex.writePostingsIndex(docs, path, 64)
        val terms = Seq("data", "stream", "model", "value",
          "code", "point", "line", "set")
        terms.indices.map { i =>
          graft.functions.TextIndex.bm25Indexed(s, path,
            Seq(terms(i), terms((i + 1) % terms.size)), 20).count()
        }.sum
      }),
      // IVF serving: centroid ranking on the driver-side tuned session,
      // cell-partition-pruned data reads on executors
      ("ivf_serve", 2, (s, m) => {
        val vecs = embX(s, m).localCheckpoint(true)
        val cells = graft.functions.Vec.kmeans(vecs, k = 16, iters = 2)
          .select(col("vec_id"), col("cell"))
        val path = java.nio.file.Files
          .createTempDirectory("clusterivf").toString
        graft.functions.VecIndex.writeIvfIndex(
          vecs.join(cells, Seq("vec_id")), "cell", path)
        val out = (0 until 4).map { i =>
          graft.functions.VecIndex.ivfProbeIndexed(s, path,
            vecs.filter(col("vec_id") % 4 === i)
              .filter(col("vec_id") < 64), k = 5, nProbe = 3).count()
        }.sum
        org.apache.spark.sql.GraftBridge.unpersistCheckpoint(vecs)
        out
      }),
      // composed streaming loop: the exactly-once multi-sink
      // foreachBatch (dedup gate -> dynamic-overwrite corpus ->
      // postings anti-join append -> calibration fold) driven one
      // staged file per microbatch — the streaming serialization
      // surface (checkpoint offsets, per-sink writes) under real
      // executor JVMs. Wave 2 re-sends half of wave 0 VERBATIM, so
      // the checksum also proves the gate rejected the replays in
      // both modes.
      ("corpus_stream", 2, (s, m) => {
        val root = java.nio.file.Files
          .createTempDirectory("clustercs").toString
        val in = s"$root/in"
        val docs = docsX(s, m).localCheckpoint(true)
        val w0 = docs.filter(col("doc_id") % 4 === 0)
        val w1 = docs.filter(col("doc_id") % 4 === 1)
        val w2 = docs.filter(col("doc_id") % 4 === 2)
          .unionByName(w0.filter(col("doc_id") % 8 === 0))
        Seq(w0, w1, w2).foreach(w =>
          w.coalesce(1).write.mode("append").parquet(in))
        val schema = s.read.parquet(in).schema
        graft.streaming.CorpusStream.stream(
            s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
              .parquet(in),
            root, s"$root/cp", pmod(col("doc_id"), lit(100L)),
            col("doc_id") % 2 === 0, binWidth = 10L,
            postingsBuckets = 16)
          .awaitTermination()
        val acc = s.read.parquet(s"$root/accepted")
        val nAcc = acc.count()
        // exactly-once, asserted in-probe: no id may appear in two
        // batches (the re-sent wave must have been gated)
        require(nAcc == acc.select(col("doc_id")).distinct().count(),
          "corpus_stream: duplicate doc_id crossed the dedup gate")
        val idSum = acc.agg(sum(col("doc_id")).cast("long"))
          .head().getLong(0)
        val nPost = s.read
          .parquet(s"$root/postings_index/postings").count()
        val nHist = s.read.parquet(s"$root/hist")
          .agg(sum(col("n")).cast("long")).head().getLong(0)
        org.apache.spark.sql.GraftBridge.unpersistCheckpoint(docs)
        idSum + nAcc * 1000003L + nPost * 7919L + nHist * 104729L
      }),
      // serving loop: driver-held frontier, executor-held buckets,
      // tuned child session — the graph index's whole probe path
      ("graph_serve", 1, (s, m) => {
        val vecs = embX(s, m).localCheckpoint(true)
        val path = java.nio.file.Files
          .createTempDirectory("clusterg").toString
        graft.functions.VecIndex.writeGraphIndex(vecs, path, k = 8,
          nBits = graft.functions.Vec.deriveNBits(vecs.count()))
        val out = graft.functions.VecIndex.graphProbeIndexed(s, path,
          vecs.filter(col("vec_id") < 64), k = 4, beam = 16, hops = 5)
          .count()
        org.apache.spark.sql.GraftBridge.unpersistCheckpoint(vecs)
        out
      }))

    val selected = probes.filter { case (n, _, _) => only.forall(_.contains(n)) }
    require(selected.nonEmpty, "no cluster probes selected")

    val results = scala.collection.mutable
      .Map.empty[(String, String), (Double, Double, Long)]
    for ((label, master) <- Seq(
        "local32" -> "local[32]",
        "cluster4x8" -> "local-cluster[4,8,8192]")) {
      val s = session(master)
      // unprinted warmup: codegen + (for local-cluster) executor spin-up
      selected.foreach { case (_, _, f) => f(s, 1): Unit }
      for ((name, mult, f) <- selected) {
        val n0 = taskNanos.get()
        val t0 = System.nanoTime()
        val check = f(s, mult)
        val sec = (System.nanoTime() - t0) / 1e9
        val taskSec = (taskNanos.get() - n0) / 1e9
        results((name, label)) = (sec, taskSec, check)
        println(f"""{"probe":"cluster_$name","mode":"$label","mult":$mult,"sec":$sec%.2f,"task_sec":$taskSec%.1f,"check":$check}""")
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    for ((name, _, _) <- selected) {
      val (l, lt, lc) = results((name, "local32"))
      val (c, ct, cc) = results((name, "cluster4x8"))
      val same = lc == cc
      println(f"""{"probe":"cluster_summary","family":"$name","local32_sec":$l%.2f,"cluster_sec":$c%.2f,"wall_ratio":${c / l}%.2f,"local32_task_sec":$lt%.1f,"cluster_task_sec":$ct%.1f,"check_match":$same}""")
      require(same, s"$name: cross-mode checksum mismatch ($lc vs $cc)")
    }
  }
}
