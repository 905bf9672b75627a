package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Medallion
import graft.streaming.StreamingMedallion

/** Structured-Streaming surface: incremental file ingestion with
  * exactly-once semantics, watermark-bounded dedup, event-time windows
  * (SURVEY.md §2.7).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("S4/K2: streaming raw→bronze processes each file exactly once") {
    val root = TestSpark.tmpDir("stream_e2e")
    val rawDir = s"$root/raw"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rawDir))
    MovieFixture.writeRaw(rawDir)
    val schema = Medallion.probeSchema(spark, rawDir)

    val q1 = StreamingMedallion.rawToBronzeStream(
      spark, rawDir, s"$root/bronze", s"$root/cp", schema)
    q1.awaitTermination()
    assert(spark.read.parquet(s"$root/bronze").count() === 4)

    // Second run with no new files: nothing reprocessed.
    val q2 = StreamingMedallion.rawToBronzeStream(
      spark, rawDir, s"$root/bronze", s"$root/cp", schema)
    q2.awaitTermination()
    assert(spark.read.parquet(s"$root/bronze").count() === 4)

    // A new file arrives: only its records are appended.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(rawDir, "movie2.json"),
      MovieFixture.rawJson.replace("\"Id\": 1", "\"Id\": 11")
        .replace("\"Id\": 2", "\"Id\": 12").replace("\"Id\": 3", "\"Id\": 13"))
    val q3 = StreamingMedallion.rawToBronzeStream(
      spark, rawDir, s"$root/bronze", s"$root/cp", schema)
    q3.awaitTermination()
    assert(spark.read.parquet(s"$root/bronze").count() === 8)
  }

  test("K3: streaming bronze→silver via foreachBatch merge") {
    val root = TestSpark.tmpDir("stream_silver")
    val rawDir = s"$root/raw"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rawDir))
    MovieFixture.writeRaw(rawDir)
    val schema = Medallion.probeSchema(spark, rawDir)
    StreamingMedallion.rawToBronzeStream(
      spark, rawDir, s"$root/bronze", s"$root/cp1", schema).awaitTermination()

    val q = StreamingMedallion.bronzeToSilverStream(
      spark, s"$root/bronze", s"$root/silver", s"$root/cp2")
    q.awaitTermination()
    StreamingMedallion.applyStatusLog(spark, s"$root/bronze", s"$root/silver")
    val silver = spark.read.parquet(s"$root/silver/movie_silver")
    assert(silver.count() === 2)
    val quar = spark.read.parquet(s"$root/silver/movie_quarantine")
    assert(quar.count() === 1)
    // statuses wrote back into bronze: nothing is left 'new'
    val statuses = spark.read.parquet(s"$root/bronze")
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.getOrElse("new", 0L) === 0L, statuses.toString)
    assert(statuses("loaded") >= 2L)
    assert(statuses("quarantined") >= 1L)
    // a rerun (same checkpoint, no new files) changes nothing: the merge
    // sinks are anti-join idempotent and the log was cleared
    val q2 = StreamingMedallion.bronzeToSilverStream(
      spark, s"$root/bronze", s"$root/silver", s"$root/cp2")
    q2.awaitTermination()
    StreamingMedallion.applyStatusLog(spark, s"$root/bronze", s"$root/silver")
    assert(spark.read.parquet(s"$root/silver/movie_silver").count() === 2)
    assert(spark.read.parquet(s"$root/silver/movie_quarantine").count() === 1)
  }

  test("A1-streaming: watermarked dropDuplicates bounds state and dedups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val dedup = StreamingMedallion.dedupStream(df, "ts", "10 minutes", Seq("user_id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData((t0, 1L, 1.0), (t0, 1L, 1.0), (t0, 2L, 2.0))
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() === 2)
    q.stop()
  }

  test("windowed aggregation state survives a restart via the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val root = TestSpark.tmpDir("state_restart")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def writeBatch(name: String, rows: Seq[(String, String, Double)]): Unit = {
      import spark.implicits._
      rows.toDF("ts_s", "event_type", "value")
        .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"),
          col("value"))
        .coalesce(1).write.mode("append").parquet(src)
    }
    def runOnce(): Unit = {
      val events = spark.readStream.schema(schema).parquet(src)
      val agg = StreamingMedallion.windowedEventCounts(
        events, "ts", "5 minutes", "1 minute")
      val q = agg.writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", s"$root/cp")
        .option("path", s"$root/out")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // Run 1: two events in one window; nothing finalizes (watermark low).
    writeBatch("b1", Seq(
      ("2024-01-01 00:01:00", "click", 1.0),
      ("2024-01-01 00:02:00", "click", 2.0)))
    runOnce()
    // Run 2 (fresh query, same checkpoint): one more event in the SAME
    // window — only countable if run 1's state was recovered — plus a late
    // event that pushes the watermark past the window end.
    writeBatch("b2", Seq(
      ("2024-01-01 00:03:00", "click", 4.0),
      ("2024-01-01 01:00:00", "click", 0.5)))
    runOnce()
    // Run 3: flush finalized windows to the sink.
    writeBatch("b3", Seq(("2024-01-01 02:00:00", "click", 0.25)))
    runOnce()

    val out = spark.read.parquet(s"$root/out")
      .filter(col("window_start") === lit("2024-01-01 00:00:00").cast("timestamp"))
    val row = out.head()
    assert(row.getAs[Long]("n_events") === 3L,
      "state from run 1 must merge with run 2's event")
    assert(row.getAs[Double]("sum_value") === 7.0)
    assert(out.count() === 1) // finalized exactly once across restarts
  }

  test("flatMapGroupsWithState: sessions close when watermark passes gap") {
    import graft.streaming.{ClosedSession, UserTimedEvent}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[UserTimedEvent]
    val sessions = StreamingMedallion.sessionizeStream(
      mem.toDS(), gapMs = 60000, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    mem.addData(
      UserTimedEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
      UserTimedEvent(1L, ts("2024-01-01 00:00:10"), 2.0),
      UserTimedEvent(2L, ts("2024-01-01 00:00:05"), 5.0))
    q.processAllAvailable()
    // Advance the watermark far past both sessions' (last ts + gap).
    mem.addData(UserTimedEvent(3L, ts("2024-01-01 01:00:00"), 9.0))
    q.processAllAvailable()
    // One more batch so the timed-out state is flushed to the sink.
    mem.addData(UserTimedEvent(3L, ts("2024-01-01 01:00:01"), 1.0))
    q.processAllAvailable()
    val out = spark.table("sess_out").as[ClosedSession]
      .collect().map(s => s.user_id -> (s.n_events, s.sum_value)).toMap
    assert(out.get(1L).contains((2L, 3.0)))
    assert(out.get(2L).contains((1L, 5.0)))
    q.stop()
  }

  test("sessionize applies the gap INSIDE a microbatch (backlog replay)") {
    import graft.streaming.{ClosedSession, UserTimedEvent}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[UserTimedEvent]
    val sessions = StreamingMedallion.sessionizeStream(
      mem.toDS(), gapMs = 60000, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_replay_out")
      .outputMode("append").start()
    // one batch carrying TWO gap-separated bursts for user 7 — the
    // backlog-replay shape; folding them into one session is the bug
    mem.addData(
      UserTimedEvent(7L, ts("2024-01-01 00:00:00"), 1.0),
      UserTimedEvent(7L, ts("2024-01-01 00:00:30"), 2.0),
      UserTimedEvent(7L, ts("2024-01-01 00:10:00"), 40.0))
    q.processAllAvailable()
    // the first burst closes immediately (in-batch gap), without waiting
    // for any watermark advance
    val immediate = spark.table("sess_replay_out").as[ClosedSession]
      .collect().filter(_.user_id == 7L)
    assert(immediate.map(s => (s.n_events, s.sum_value)).toSet ===
      Set((2L, 3.0)))
    // advance the watermark to flush the second burst
    mem.addData(UserTimedEvent(8L, ts("2024-01-01 02:00:00"), 0.0))
    q.processAllAvailable()
    mem.addData(UserTimedEvent(8L, ts("2024-01-01 02:00:01"), 0.0))
    q.processAllAvailable()
    val all = spark.table("sess_replay_out").as[ClosedSession]
      .collect().filter(_.user_id == 7L)
      .map(s => (s.n_events, s.sum_value)).toSet
    assert(all === Set((2L, 3.0), (1L, 40.0)))
    q.stop()
  }

  test("scan-stage corpus ops run stateless inside a stream: gate, redact, chunk") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[(Long, String)]
    val in = docs.toDF().toDF("doc_id", "text")
    // Native token-scan gate + PII redaction + overlapping chunking —
    // all per-row, so the streaming planner accepts them in append mode
    // with no state store.
    val out = graft.functions.Chunk.chunkByTokens(
      in.filter(graft.functions.Text.tokenCount(col("text")) >= 3)
        .withColumn("text", graft.functions.Quality.redactPii(col("text"))),
      "doc_id", "text", chunkSize = 4, overlap = 1)
    val q = out.writeStream.format("memory").queryName("corpus_stream")
      .outputMode("append").start()
    docs.addData(
      (1L, "contact a@b.co about the quick brown fox jumping"), // 8 tokens
      (2L, "too short"),                                        // gated out
      (3L, "one two three"))                                    // 1 chunk
    q.processAllAvailable()
    val rows = spark.table("corpus_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = rows.groupBy(_._1)
    assert(!byDoc.contains(2L))
    assert(byDoc(3L).map(_._3).toSeq == Seq("one two three"))
    // chunking: stride 3 over 8 tokens -> chunks at 0/3/6
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq == Seq(
      "contact <EMAIL> about the", "the quick brown fox",
      "fox jumping"))
    q.stop()
  }

  test("event-time tumbling window with watermark emits finalized windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingMedallion.windowedEventCounts(
      events, "ts", "5 minutes", "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 00:03:00"), "view", 3.0))
    q.processAllAvailable()
    // advance watermark past the first window
    mem.addData((Timestamp.valueOf("2024-01-01 00:30:00"), "click", 9.0))
    q.processAllAvailable()
    val out = spark.table("win_out")
    assert(out.count() >= 2) // click + view windows finalized
    val click = out.filter($"event_type" === "click" &&
      $"window_start" === Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(click.head().getAs[Long]("n_events") === 2L)
    assert(click.head().getAs[Double]("sum_value") === 3.0)
    q.stop()
  }

  test("transformWithState running card accumulates across batches and restarts") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulCard
    val root = TestSpark.tmpDir("tws_card")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("n_tokens", LongType)))

    def writeBatch(rows: Seq[(String, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("source", "n_tokens")
        .coalesce(1).write.mode("append").parquet(src)
    }
    // transformWithState requires the RocksDB state store provider; set
    // it for these runs and restore the previous value after.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val docs = spark.readStream.schema(schema).parquet(src)
        // parquet is an append-only sink; land the update-mode card rows
        // through foreachBatch (the upsert-sink pattern, K3)
        val q = StatefulCard.runningCardStream(docs, "source", "n_tokens")
          .writeStream.outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.RunningCard], _: Long) =>
            batch.write.mode("append").parquet(s"$root/out"): Unit
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      writeBatch(Seq(("web", 10L), ("web", 5L), ("books", 7L)))
      runOnce()
      // Restart (fresh query, same checkpoint): state must carry over,
      // so the second run's cards CONTINUE the first run's counters.
      writeBatch(Seq(("web", 1L), ("wiki", 3L)))
      runOnce()
      import spark.implicits._
      val out = spark.read.parquet(s"$root/out")
        .as[graft.streaming.RunningCard].collect()
      // latest card per source = max n_docs (counters only grow)
      val last = out.groupBy(_.source).view
        .mapValues(_.maxBy(c => (c.n_docs, c.n_tokens))).toMap
      assert(last("web") === graft.streaming.RunningCard("web", 3L, 16L))
      assert(last("books") === graft.streaming.RunningCard("books", 1L, 7L))
      assert(last("wiki") === graft.streaming.RunningCard("wiki", 1L, 3L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming confusion: batch parity with Eval.confusion, counts " +
      "continue across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulEval
    val root = TestSpark.tmpDir("tws_eval")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("pred", StringType),
      StructField("truth", StringType)))
    def writeBatch(rows: Seq[(String, String)]): Unit = {
      import spark.implicits._
      rows.toDF("pred", "truth").coalesce(1).write.mode("append").parquet(src)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val preds = spark.readStream.schema(schema).parquet(src)
        val q = StatefulEval.confusionStream(preds, "pred", "truth")
          .writeStream.outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.ConfusionCell], _: Long) =>
            batch.write.mode("append").parquet(s"$root/out"): Unit
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val batch1 = Seq(("en", "en"), ("en", "fr"), ("fr", "fr"),
        ("fr", "fr"), ("de", "en"))
      writeBatch(batch1)
      runOnce()
      // restart with more data, same checkpoint: counts must CONTINUE
      val batch2 = Seq(("en", "en"), ("fr", "en"), ("de", "de"))
      writeBatch(batch2)
      runOnce()
      import spark.implicits._
      val out = spark.read.parquet(s"$root/out")
        .as[graft.streaming.ConfusionCell].collect()
      // the latest (= max, counters only grow) row per cell is the
      // live matrix; it must equal the batch confusion over ALL rows
      val live = out.groupBy(c => (c.true_class, c.pred_class)).view
        .mapValues(_.map(_.n).max).toMap
      val allRows = (batch1 ++ batch2).zipWithIndex
        .map { case ((p, t), i) => (i.toLong, p, t) }
        .toDF("id", "pred", "truth")
      val expected = graft.functions.Eval.confusion(
          allRows, "id", "pred", allRows, "truth")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(live == expected, s"live=$live expected=$expected")
      // classMetrics composes over the live cells (the drift monitor)
      val cells = live.toSeq.map { case ((t, p), n) => (t, p, n) }
        .toDF("true_class", "pred_class", "n")
      val f1 = graft.functions.Eval.classMetrics(cells)
        .select("class", "tp", "fp", "fn").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(f1("en") == ((2L, 1L, 2L)), f1.toString)
      assert(f1("fr") == ((2L, 1L, 1L)), f1.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming reliability: per-bin tallies match a batch count and " +
      "survive restart") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulEval
    val root = TestSpark.tmpDir("tws_rel")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("bin", LongType),
      StructField("ok", BooleanType)))
    def writeBatch(rows: Seq[(Long, Boolean)]): Unit = {
      import spark.implicits._
      rows.toDF("bin", "ok").coalesce(1).write.mode("append").parquet(src)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val preds = spark.readStream.schema(schema).parquet(src)
        val q = StatefulEval.reliabilityStream(preds, "bin", "ok")
          .writeStream.outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.ReliabilityCell], _: Long) =>
            batch.write.mode("append").parquet(s"$root/out"): Unit
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      writeBatch(Seq((1L, true), (1L, false), (2L, true)))
      runOnce()
      writeBatch(Seq((1L, true), (3L, false)))
      runOnce()
      import spark.implicits._
      val out = spark.read.parquet(s"$root/out")
        .as[graft.streaming.ReliabilityCell].collect()
      val live = out.groupBy(_.bin).view
        .mapValues(cs => cs.maxBy(_.n)).toMap
      assert(live(1L).n == 3L && live(1L).n_pos == 2L, live.toString)
      assert(live(2L).n == 1L && live(2L).n_pos == 1L)
      assert(live(3L).n == 1L && live(3L).n_pos == 0L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming Misra-Gries keeps the planted heavy hitter across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulFreq
    val root = TestSpark.tmpDir("tws_mg")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("item", StringType)))
    def writeBatch(rows: Seq[(String, String)]): Unit = {
      import spark.implicits._
      rows.toDF("source", "item").coalesce(1).write.mode("append").parquet(src)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val q = StatefulFreq.heavyHittersStream(
            spark.readStream.schema(schema).parquet(src), "source", "item",
            k = 3)
          .writeStream.outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.HeavyCandidate], _: Long) =>
            batch.write.mode("append").parquet(s"$root/out"): Unit
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // batch 1: "the" appears 5 of 8 times; batch 2 (after restart)
      // adds 3 more plus light noise — the sketch must carry "the"
      // through the checkpoint and keep it a candidate (true count 8 of
      // 13 > n/(k+1)); the MG guarantee makes presence order-free.
      writeBatch(Seq.fill(5)(("web", "the")) ++
        Seq(("web", "a"), ("web", "b"), ("web", "c")))
      runOnce()
      writeBatch(Seq.fill(3)(("web", "the")) ++
        Seq(("web", "d"), ("web", "e")))
      runOnce()
      import spark.implicits._
      val out = spark.read.parquet(s"$root/out")
        .as[graft.streaming.HeavyCandidate].collect()
      val last = out.filter(_.n_items == 13L)
      assert(last.nonEmpty, s"no final-batch rows in ${out.toSeq}")
      val the = last.find(_.item == "the")
      assert(the.isDefined, s"heavy hitter evicted: ${last.toSeq}")
      // estimate within the MG error bound: true 8, off by at most
      // n/(k+1) = 3
      assert(the.get.count_est >= 5L && the.get.count_est <= 8L, the.get)
      // state bounded: at most k+1 candidates
      assert(last.length <= 4, last.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState timers close sessions like the old API") {
    import graft.streaming.{ClosedSession, StatefulSession, UserTimedEvent}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[UserTimedEvent]
      val sessions = StatefulSession.sessionizeTws(mem.toDS(), gapMs = 60000)
      val q = sessions.writeStream.format("memory").queryName("tws_sess")
        .outputMode("append").start()
      // batch 1: two users; user 7 carries an IN-BATCH gap-separated
      // burst that must split without any watermark help
      mem.addData(
        UserTimedEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        UserTimedEvent(1L, ts("2024-01-01 00:00:10"), 2.0),
        UserTimedEvent(7L, ts("2024-01-01 00:00:00"), 4.0),
        UserTimedEvent(7L, ts("2024-01-01 00:10:00"), 8.0))
      q.processAllAvailable()
      val immediate = spark.table("tws_sess").as[ClosedSession]
        .collect().map(s => s.user_id -> (s.n_events, s.sum_value)).toSet
      // u7's first burst closes from the IN-BATCH gap; u1's session closes
      // from its TIMER in the follow-up batch — u7's 00:10 event advanced
      // the watermark past u1's (last + gap) = 00:01:10. u7's second burst
      // (expiry 00:11:00) is the only session still open.
      assert(immediate === Set(7L -> (1L, 4.0), 1L -> (2L, 3.0)),
        "in-batch gap + first-watermark timer must close exactly these")
      // advance the watermark far past every open session's timer, then
      // one more batch to flush the fired-timer output to the sink
      mem.addData(UserTimedEvent(3L, ts("2024-01-01 02:00:00"), 9.0))
      q.processAllAvailable()
      mem.addData(UserTimedEvent(3L, ts("2024-01-01 02:00:01"), 1.0))
      q.processAllAvailable()
      val out = spark.table("tws_sess").as[ClosedSession]
        .collect().map(s => s.user_id -> (s.n_events, s.sum_value)).toSet
      assert(out.contains(1L -> (2L, 3.0)), s"timer never closed u1: $out")
      assert(out.contains(7L -> (1L, 8.0)), s"timer never closed u7: $out")
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state store reader exposes transformWithState state offline") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulCard
    val root = TestSpark.tmpDir("tws_statereader")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("n_tokens", LongType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      Seq(("web", 10L), ("web", 5L), ("books", 7L)).toDF("source", "n_tokens")
        .coalesce(1).write.mode("append").parquet(src)
      val q = StatefulCard.runningCardStream(
          spark.readStream.schema(schema).parquet(src), "source", "n_tokens")
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.RunningCard], _: Long) =>
          batch.write.mode("append").parquet(s"$root/out"): Unit
        }
        .option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the state data source reads the CHECKPOINTED state offline — the
      // ops story for debugging a live job's keyed state without
      // touching the job. transformWithState state is addressed by
      // variable name.
      val state = spark.read.format("statestore")
        .option("stateVarName", "card")
        .load(s"$root/cp")
      val cards = state.select("key.value", "value.n_docs", "value.n_tokens")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(cards === Map("web" -> (2L, 15L), "books" -> (1L, 7L)), cards)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming funnel: MapState progress, completion, and timeout") {
    import graft.streaming.{FunnelEvent, FunnelResult, StatefulFunnel}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[FunnelEvent]
      val out = StatefulFunnel.funnelStream(mem.toDS(),
        Seq("signup", "click", "purchase"), timeoutMs = 60000)
      val q = out.writeStream.format("memory").queryName("tws_funnel")
        .outputMode("append").start()
      // u1 progresses across batches and completes; u2 reaches step 1
      // and stalls; a simultaneous step-2 event must NOT advance u3
      mem.addData(
        FunnelEvent(1L, ts("2024-01-01 00:00:00"), "signup"),
        FunnelEvent(2L, ts("2024-01-01 00:00:00"), "signup"),
        FunnelEvent(3L, ts("2024-01-01 00:00:00"), "signup"),
        FunnelEvent(3L, ts("2024-01-01 00:00:00"), "click"))
      q.processAllAvailable()
      mem.addData(
        FunnelEvent(1L, ts("2024-01-01 00:00:10"), "click"),
        FunnelEvent(1L, ts("2024-01-01 00:00:20"), "purchase"))
      q.processAllAvailable()
      val afterComplete = spark.table("tws_funnel").as[FunnelResult]
        .collect().map(r => r.user_id -> r).toMap
      assert(afterComplete(1L).completed && afterComplete(1L)
        .steps_completed === 3L, afterComplete.toString)
      assert(afterComplete(1L).t_first === ts("2024-01-01 00:00:00").getTime)
      assert(afterComplete(1L).t_last === ts("2024-01-01 00:00:20").getTime)
      assert(!afterComplete.contains(2L) && !afterComplete.contains(3L))
      // advance the watermark far past every stalled funnel's timeout,
      // then flush the fired-timer output
      mem.addData(FunnelEvent(9L, ts("2024-01-01 02:00:00"), "signup"))
      q.processAllAvailable()
      mem.addData(FunnelEvent(9L, ts("2024-01-01 02:00:01"), "view"))
      q.processAllAvailable()
      val fin = spark.table("tws_funnel").as[FunnelResult]
        .collect().map(r => r.user_id -> r).toMap
      assert(!fin(2L).completed && fin(2L).steps_completed === 1L, fin.toString)
      // u3's simultaneous click never advanced it past signup
      assert(!fin(3L).completed && fin(3L).steps_completed === 1L, fin.toString)
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("tws session timers survive a checkpoint restart") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.{ClosedSession, StatefulSession, UserTimedEvent}
    val root = TestSpark.tmpDir("tws_sess_restart")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    def writeBatch(rows: Seq[(Long, String, Double)]): Unit = {
      import spark.implicits._
      rows.map { case (u, t, v) => (u, Timestamp.valueOf(t), v) }
        .toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        import spark.implicits._
        val events = spark.readStream.schema(schema).parquet(src)
          .as[UserTimedEvent]
        val q = StatefulSession.sessionizeTws(events, gapMs = 60000)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClosedSession], _: Long) =>
            batch.write.mode("append").parquet(s"$root/out"): Unit
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // run 1: open a session for user 1; nothing can close yet
      writeBatch(Seq((1L, "2024-01-01 00:00:00", 1.0),
        (1L, "2024-01-01 00:00:20", 2.0)))
      runOnce()
      // run 2 (fresh query, same checkpoint): advance the watermark far
      // past user 1's (last + gap) — closing it requires BOTH the session
      // state and its registered timer to have been recovered
      writeBatch(Seq((9L, "2024-01-01 03:00:00", 5.0)))
      runOnce()
      // run 3: flush any fired-timer output still buffered
      writeBatch(Seq((9L, "2024-01-01 03:00:01", 1.0)))
      runOnce()
      import spark.implicits._
      val out = spark.read.parquet(s"$root/out").as[ClosedSession]
        .collect().filter(_.user_id == 1L)
        .map(s => (s.n_events, s.sum_value)).toSet
      assert(out === Set((2L, 3.0)),
        s"session not closed across restart: $out")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("token-bucket rate limiter: burst, refill, per-key isolation, " +
      "restart continuity") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulQuota
    val root = TestSpark.tmpDir("tws_quota")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = StructType(Seq(StructField("dom", StringType),
      StructField("ts_us", LongType), StructField("units", LongType)))
    def writeBatch(rows: Seq[(String, Long, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("dom", "ts_us", "units")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val events = spark.readStream.schema(schema).parquet(src)
        val q = StatefulQuota.rateLimit(events, "dom", "ts_us", "units",
            ratePerSec = 1L, burst = 2L)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.QuotaDecision], _: Long) =>
            batch.write.mode("append").parquet(s"$root/out"): Unit
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // burst of 2: two unit events at t=0 admit, the half-second one
      // is short (0.5 tokens), the 3s one refills to the full burst
      writeBatch(Seq(("a", 0L, 1L), ("a", 0L, 1L), ("a", 500000L, 1L),
        ("a", 3000000L, 2L), ("b", 500000L, 2L)))
      runOnce()
      // restart: state carries — 0.5s later still short, 2s later ok
      writeBatch(Seq(("a", 3500000L, 1L), ("a", 5000000L, 1L)))
      runOnce()
      import spark.implicits._
      val out = spark.read.parquet(s"$root/out")
        .as[graft.streaming.QuotaDecision].collect()
        .map(d => (d.key, d.ts_us) -> ((d.admitted, d.tokens_after_micro)))
        .toMap
      assert(out(("a", 0L))._1 == true)
      assert(out(("a", 500000L)) == ((false, 500000L)))
      assert(out(("a", 3000000L)) == ((true, 0L)))
      // key b is untouched by a's spend: full burst admits its 2 units
      assert(out(("b", 500000L)) == ((true, 0L)))
      // post-restart: bucket continued from the checkpointed state
      assert(out(("a", 3500000L)) == ((false, 500000L)))
      assert(out(("a", 5000000L)) == ((true, 1000000L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
