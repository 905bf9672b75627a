package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STRONG-SCALING probe: fixed problem size, core count swept
  * 4 → 8 → 16 → 32 (fresh SparkSession per rung, one JVM), recording
  * the wall-clock speedup curve for the engine's shuffle- and
  * compute-heavy families. The ScaleProbe cards show walls stay flat
  * as DATA grows; this card shows walls SHRINK as PARALLELISM grows —
  * the other half of the 1000-executor claim. An operator whose curve
  * flattens early has a serial bottleneck (driver loop, single-task
  * stage, unsplittable partition) that 1000 executors cannot buy back.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScalingProbe"
  *
  * Families (the same heavy set as [[SpillProbe]], plus a dense
  * numeric witness): MinHash-LSH banding, n-gram-Jaccard inverted
  * join, suffix-array doubling, corr-matrix moments, and brute-force
  * cosine top-k (pure compute, near-zero shuffle — the codegen/CPU
  * rung). All paths are the UNMEMOIZED variants: a memo hit would time
  * a cache read, not the operator.
  *
  * Methodology notes, deliberate:
  *  - shuffle partitions = 4 × cores per rung (a fixed count would cap
  *    task parallelism at high rungs and overshard the low ones);
  *  - the first rung is preceded by an unprinted mult=1 warmup of every
  *    family so whole-stage codegen compilation (JVM-global, survives
  *    session restarts) is not billed to the first rung;
  *  - rungs run in one JVM, ascending, each against the same lazily
  *    replicated input (the ScaleProbe replication discipline — no
  *    materialized copy, no parquet re-write between rungs).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusList = sys.env.getOrElse("SPARK_GRAFT_SCALING_CPUS", "4,8,16,32")
      .split(",").map(_.trim.toInt).filter(_ >= 1).toSeq
    val only = sys.env.get("SPARK_GRAFT_SCALING_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // Task-seconds accumulated by the listener: utilization =
    // taskSec / (wall × cores) separates the two flat-curve causes —
    // low utilization at the SMALL rung means fixed per-stage overhead
    // dominates (the problem is too small for the cores, not serial);
    // high utilization at the small rung that collapses at the big one
    // means a genuinely unsplittable stage (skewed task, single
    // partition) that more cores cannot share.
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMillis = new java.util.concurrent.atomic.AtomicLong(0L)
    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_SCALING_PARTS", (4 * cpus).toString))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      graft.plans.TopKNative.enable(s)
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              taskNanos.addAndGet(m.executorRunTime * 1000000L): Unit
              gcMillis.addAndGet(m.jvmGCTime): Unit
            }
          }
        })
      s
    }

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Lazy replication (mult× rows, distinct ids, perturbed text): the
    // problem size is FIXED across rungs — only parallelism varies.
    // The replicated frame is REPARTITIONED after the crossJoin: the
    // single-file test parquet scans as ONE partition, and a crossJoin
    // keeps its left side's partitioning — without the exchange every
    // scan-stage kernel (shingle hashing, norm precompute) and every
    // map-only family runs as a single task regardless of cores (the
    // first probe run measured brute_cosine at util 0.24 on 4 cores =
    // one busy core). A real corpus arrives as thousands of splits;
    // the repartition models that, it does not help the operators.
    def parts(s: SparkSession): Int =
      s.conf.get("spark.sql.shuffle.partitions").toInt
    def docsX(s: SparkSession, m: Int): DataFrame = {
      val base = Tables.documents(s, sfDir)
      val replicas = s.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
        .select((col("doc_id") * m + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .repartition(parts(s))
    }
    def embX(s: SparkSession, m: Int): DataFrame = {
      val base = Tables.embeddings(s, sfDir)
      val replicas = s.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas)
        .select((col("vec_id") * m + col("rep")).as("vec_id"),
          col("embedding"))
        .repartition(parts(s))
    }
    def lineitemX(s: SparkSession, m: Int): DataFrame = {
      val base = Tables.lineitem(s, sfDir)
      val replicas = s.range(m).select(col("id").as("rep"))
      base.crossJoin(replicas).repartition(parts(s))
    }

    // (name, fixed multiplier, body). Multipliers sized so the 4-core
    // rung runs tens of seconds — long enough that scheduler overhead
    // is noise at every rung.
    val probes: Seq[(String, Int, (SparkSession, Int) => Unit)] = Seq(
      ("lsh_bands", 16, (s, m) => {
        val sh = graft.functions.Dedup.docShingleIds(
          docsX(s, m), "doc_id", "text", 3)
        val sig = graft.functions.Dedup.minhashSignature(
          sh, "doc_id", col("tid"), 8)
        exec(graft.functions.Dedup.lshCandidatePairsUncached(
          graft.functions.Dedup.lshBands(sig, "doc_id", 2), "doc_id"))
      }),
      ("ngram_jaccard", 8, (s, m) => {
        exec(graft.functions.Dedup.ngramJaccardPairsUncached(
          docsX(s, m), "doc_id", "text", n = 3, minJaccard = 0.2,
          dfCap = 1000000L))
        graft.functions.Dedup.releasePairMemos()
      }),
      ("suffix_doubling", 8, (s, m) => {
        val tables = graft.functions.Suffix.rankTables(
          docsX(s, m), "doc_id", "text", rounds = 5)
        exec(tables.last)
        tables.foreach(org.apache.spark.sql.GraftBridge.unpersistCheckpoint)
      }),
      ("corr_moments", 8, (s, m) => {
        exec(graft.functions.Stats.corrMatrix(
          lineitemX(s, m).select(
            round(col("l_quantity"), 0).cast("long").as("qty"),
            round(col("l_extendedprice") * 100, 0).cast("long")
              .as("price_c"),
            round(col("l_discount") * 100, 0).cast("long").as("disc_pct"),
            round(col("l_tax") * 100, 0).cast("long").as("tax_pct")),
          Seq("qty", "price_c", "disc_pct", "tax_pct")))
      }),
      ("brute_cosine", 32, (s, m) => {
        val corpus = embX(s, m)
        val queries = corpus.filter(col("vec_id") % lit(m * 8) === 0)
        exec(graft.functions.Vec.bruteForceTopKUncached(
          queries, corpus, k = 5))
      }))

    val selected = probes.filter { case (n, _, _) => only.forall(_.contains(n)) }
    require(selected.nonEmpty, "no scaling probes selected")

    // Codegen warmup (unprinted): tiny inputs through every family so
    // the first rung doesn't absorb JVM-global compilation cost.
    {
      val s = session(cpusList.head)
      selected.foreach { case (_, _, f) => f(s, 1) }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // Pure-ALU strong-scaling reference (no Spark, no memory traffic):
    // a fixed 8e9-iteration xorshift workload split across `threads`
    // JVM threads. Families are memory-bound; this line shows what the
    // BOX's cores give back for compute that never leaves registers —
    // the gap between this curve and a family's curve is the shared
    // memory subsystem (and JVM-shared structures), not engine
    // serialization.
    def aluSec(threads: Int): Double = {
      val totalIters = 8000000000L
      val per = totalIters / threads
      val out = new Array[Long](threads)
      val ts = (0 until threads).map { k =>
        new Thread(() => {
          var h = 0x9E3779B97F4A7C15L + k
          var i = 0L
          while (i < per) {
            h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h += i; i += 1
          }
          out(k) = h
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      if (out.sum == 42L) println("") // defeat dead-code elimination
      sec
    }

    val walls = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (cpus <- cpusList) {
      walls(("cpu_alu", cpus)) = aluSec(cpus)
      println(f"""{"probe":"scaling_cpu_alu","cpus":$cpus,"sec":${walls(("cpu_alu", cpus))}%.2f}""")
      val s = session(cpus)
      for ((name, mult, f) <- selected) {
        val n0 = taskNanos.get(); val g0 = gcMillis.get()
        val t0 = System.nanoTime()
        f(s, mult)
        val sec = (System.nanoTime() - t0) / 1e9
        val taskSec = (taskNanos.get() - n0) / 1e9
        val gcSec = (gcMillis.get() - g0) / 1e3
        val util = taskSec / (sec * cpus)
        walls((name, cpus)) = sec
        println(f"""{"probe":"scaling_$name","cpus":$cpus,"mult":$mult,"sec":$sec%.2f,"task_sec":$taskSec%.1f,"gc_sec":$gcSec%.1f,"util":$util%.2f}""")
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // Speedup summary vs the smallest rung (per family): s(c) = t_min/t_c,
    // efficiency = s(c) / (c / min_cpus).
    val base = cpusList.min
    for (name <- selected.map(_._1) :+ "cpu_alu") {
      val t0 = walls((name, base))
      val cells = cpusList.map { c =>
        val sp = t0 / walls((name, c))
        val eff = sp / (c.toDouble / base)
        f""""x$c":{"sec":${walls((name, c))}%.2f,"speedup":$sp%.2f,"eff":$eff%.2f}"""
      }
      println(s"""{"probe":"scaling_summary","family":"$name",${cells.mkString(",")}}""")
    }
  }
}
