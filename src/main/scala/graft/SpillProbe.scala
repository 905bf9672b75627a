package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constrained-memory SPILL probe: re-runs the engine's heaviest
  * shuffle families at a multiplied corpus inside a deliberately small
  * heap and asserts they SPILL RATHER THAN OOM — the evidence a
  * "designed for 100 TB" claim needs beyond wall-clock cards measured
  * with 128 GiB of headroom. At scale, executor memory per task is
  * the scarce resource; an operator whose shuffle only completes when
  * everything fits in RAM is a scale defect no fast number hides.
  *
  * Run FORKED with the heap cap (the sbt `run` fork reads it):
  *
  *   SPARK_DRIVER_MEM=2g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.SpillProbe"
  *
  * Probes (the shuffle-heaviest families by judge/plan audit):
  * MinHash-LSH banding, suffix-array doubling, corr-matrix moments,
  * IVF-PQ build (kmeans + codebooks + persisted write), and the
  * n-gram-Jaccard inverted-list join. Each runs over an on-the-fly
  * replicated corpus (mult× rows, distinct ids, perturbed text — the
  * ScaleProbe replication discipline; no materialized copy competes
  * for the capped heap). Per entry the card records wall seconds and
  * the listener's memory/disk spill totals; a probe that OOMs kills
  * the fork and the card never prints — completion IS the assertion.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SPILL_MULT", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Shuffle partitions sized BY DATA VOLUME, not by core count —
      // the 100 TB sizing discipline under test: the per-partition
      // working set is what must fit in a task's share of the heap, so
      // partitions scale with the corpus multiplier (the first probe
      // run, at a fixed 64, OOM'd the n-gram intersection aggregate's
      // spill MERGE at 16× — hundreds of spill files per oversized
      // task, each merge reader allocating its buffer at once).
      .config("spark.sql.shuffle.partitions", (16 * mult).toString)
      // Under a tight heap the memoized postings/rank checkpoints must
      // YIELD to execution memory (they respill to disk and re-read);
      // the default 0.5 storageFraction protects cached blocks so hard
      // that 8 concurrent join+agg+sort consumers starve
      // (UNABLE_TO_ACQUIRE_MEMORY with storage pinned at ~0.5 of the
      // unified region). 0.1 is the constrained-memory posture: caches
      // are an optimization, completion is the contract.
      .config("spark.memory.storageFraction", "0.1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKNative.enable(spark)
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    println(f"""{"probe":"spill_setup","heap_gb":$heapGb%.2f,"mult":$mult,"cpus":$cpus}""")

    // Listener: accumulate spill bytes across all tasks, and per STAGE
    // (keyed by stage id, labeled by the stage's callsite name) so a
    // spill regression names the operator that paid it instead of one
    // opaque total.
    val memSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageSpill = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            memSpill.addAndGet(m.memoryBytesSpilled): Unit
            diskSpill.addAndGet(m.diskBytesSpilled): Unit
            if (m.memoryBytesSpilled > 0)
              stageSpill.merge(te.stageId, m.memoryBytesSpilled,
                (a, b) => a + b): Unit
          }
        }
        override def onStageSubmitted(
            ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stageName.put(ss.stageInfo.stageId, ss.stageInfo.name): Unit
      })
    def topSpillStages(): String = {
      import scala.jdk.CollectionConverters._
      stageSpill.asScala.toSeq.sortBy(-_._2).take(5).map { case (sid, b) =>
        val n = Option(stageName.get(sid)).getOrElse("?")
          .takeWhile(_ != '\n').take(60).replace("\"", "'")
        f""""stage_$sid ($n)": ${b / (1024.0 * 1024)}%.0f"""
      }.mkString("{", ", ", "}")
    }

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // On-the-fly replication (the ScaleProbe discipline): mult× rows,
    // distinct ids, text perturbed per replica — a lazy plan fragment,
    // never a materialized copy competing for the capped heap.
    def docsX(m: Int): DataFrame = {
      val base = Tables.documents(spark, sfDir)
      val replicas = spark.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
        .select((col("doc_id") * m + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
    }
    def embX(m: Int): DataFrame = {
      val base = Tables.embeddings(spark, sfDir)
      val replicas = spark.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
        .select((col("vec_id") * m + col("rep")).as("vec_id"),
          col("embedding"))
    }
    def lineitemX(m: Int): DataFrame = {
      val base = Tables.lineitem(spark, sfDir)
      val replicas = spark.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
    }

    val probes: Seq[(String, () => Unit)] = Seq(
      "lsh_bands" -> (() => {
        val sh = graft.functions.Dedup.docShingleIds(
          docsX(mult), "doc_id", "text", 3)
        val sig = graft.functions.Dedup.minhashSignature(
          sh, "doc_id", col("tid"), 8)
        exec(graft.functions.Dedup.lshCandidatePairsUncached(
          graft.functions.Dedup.lshBands(sig, "doc_id", 2), "doc_id"))
      }),
      "suffix_doubling" -> (() => {
        exec(graft.functions.Suffix.suffixRanks(
          docsX(mult), "doc_id", "text", rounds = 5))
        graft.functions.Suffix.releaseShared()
      }),
      "corr_moments" -> (() => {
        exec(graft.functions.Stats.corrMatrix(
          lineitemX(mult).select(
            round(col("l_quantity"), 0).cast("long").as("qty"),
            round(col("l_extendedprice") * 100, 0).cast("long")
              .as("price_c"),
            round(col("l_discount") * 100, 0).cast("long").as("disc_pct"),
            round(col("l_tax") * 100, 0).cast("long").as("tax_pct")),
          Seq("qty", "price_c", "disc_pct", "tax_pct")))
      }),
      "ivfpq_build" -> (() => {
        val vecs = embX(mult)
        val cells = graft.functions.Vec.kmeans(vecs, k = 16, iters = 2)
          .select(col("vec_id"), col("cell"))
        val path = java.nio.file.Files
          .createTempDirectory("spillpq").toString
        graft.functions.VecIndex.writeIvfPqIndex(
          vecs.join(cells, Seq("vec_id")), "cell", path,
          m = 4, subDim = 16, kCodes = 8, iters = 2)
      }),
      "ngram_jaccard" -> (() => {
        exec(graft.functions.Dedup.ngramJaccardPairsUncached(
          docsX(mult), "doc_id", "text", n = 3, minJaccard = 0.2,
          dfCap = 1000000L))
      }),
      // This round's grouped-postings winnow rework under the same cap:
      // the HOF pair expansion and the raw-gram-stream verify must
      // spill like the inverted list they replaced.
      "winnow_pairs" -> (() => {
        exec(graft.functions.Dedup.winnowPairs(
          docsX(mult), "doc_id", "text", n = 3, w = 4,
          minJaccard = 0.2, minShared = 2))
        graft.functions.Dedup.releasePairMemos()
      }))

    // SPARK_GRAFT_SPILL_ONLY=name,name: iterate on one entry.
    val only = sys.env.get("SPARK_GRAFT_SPILL_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = probes.filter { case (n, _) => only.forall(_.contains(n)) }
    for ((name, f) <- selected) {
      val m0 = memSpill.get(); val d0 = diskSpill.get()
      val t0 = System.nanoTime()
      f()
      val sec = (System.nanoTime() - t0) / 1e9
      val mMb = (memSpill.get() - m0) / (1024.0 * 1024)
      val dMb = (diskSpill.get() - d0) / (1024.0 * 1024)
      println(f"""{"probe":"spill_$name","mult":$mult,"sec":$sec%.2f,"mem_spill_mb":$mMb%.1f,"disk_spill_mb":$dMb%.1f,"completed":true,"top_stages_mb":${topSpillStages()}}""")
      stageSpill.clear()
    }
    println(f"""{"probe":"spill_summary","heap_gb":$heapGb%.2f,"mult":$mult,"entries":${selected.size},"all_completed":true,"mem_spill_mb":${memSpill.get() / (1024.0 * 1024)}%.1f,"disk_spill_mb":${diskSpill.get() / (1024.0 * 1024)}%.1f}""")
    spark.stop()
  }
}
