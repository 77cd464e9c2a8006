package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.streaming.EventStreams

/** Streaming transforms driven end-to-end under readStream (file source →
  * memory sink, processAllAvailable), cross-checked against their batch
  * twins on the same finite input.
  */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The file stream source tails a directory; stage the single events
    * parquet into one.
    */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  /** Same staging for documents, shared by the LM and DSIR stream tests. */
  lazy val docsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/documents.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling-window counts under readStream match the batch computation") {
    val streamed = runToMemory(
      EventStreams.tumblingCounts(
        EventStreams.readEvents(spark, eventsDir)),
      "tumbling_out", mode = "complete") // complete: finite input, all windows
    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("frozen-LM quality scoring composes onto a document stream unchanged") {
    // deployment shape: LM trained offline (batch), scoring applied to a
    // live ingest stream — scoreBroadcast is a stateless projection, so the
    // same call works under readStream with identical results
    val batchDocs = Tables.documents(spark, SparkTestSession.sfDir)
    val (terms, logps, oov) = graft.operators.UnigramLm.collectLm(
      graft.operators.UnigramLm.termCounts(batchDocs, "text"))
    val streamDocs = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir)
    val streamed = runToMemory(
      graft.operators.UnigramLm.scoreBroadcast(
        streamDocs, "doc_id", "text", terms, logps, oov), "lm_stream_out")
    val batch = graft.operators.UnigramLm.scoreBroadcast(
      batchDocs, "doc_id", "text", terms, logps, oov)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("frozen-DSIR scoring composes onto a document stream unchanged") {
    // same deployment shape as the LM: weights trained offline (batch),
    // importance scoring applied to a live ingest stream — score is a
    // stateless filter + projection, so it runs under readStream verbatim
    val batchDocs = Tables.documents(spark, SparkTestSession.sfDir)
    val w = graft.operators.Dsir.trainWeightsSubset(
      batchDocs, org.apache.spark.sql.functions.col("lang") === "en",
      "text", maxN = 2, numBuckets = 1000)
    val streamDocs = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir)
    val streamed = runToMemory(
      graft.operators.Dsir.score(streamDocs, "doc_id", "text", w, maxN = 2),
      "dsir_stream_out")
    val batch = graft.operators.Dsir.score(batchDocs, "doc_id", "text", w, maxN = 2)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("stream-static enrichment under readStream matches the batch join") {
    val dim = Tables.customer(spark, SparkTestSession.sfDir)
    val streamed = runToMemory(
      EventStreams.enrichWithDim(
        EventStreams.readEvents(spark, eventsDir), dim, "user_id", "c_custkey")
        .select("event_id", "user_id", "c_mktsegment"),
      "enrich_out")
    val batch = EventStreams.enrichWithDim(
      Tables.events(spark, SparkTestSession.sfDir), dim, "user_id", "c_custkey")
      .select("event_id", "user_id", "c_mktsegment")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("dropDuplicatesWithinWatermark dedups a replayed stream") {
    val deduped = runToMemory(
      EventStreams.dedupWithinWatermark(
        EventStreams.readEvents(spark, eventsDir)
          .unionAll(EventStreams.readEvents(spark, eventsDir))),
      "dedup_out")
    val expected = Tables.events(spark, SparkTestSession.sfDir).count()
    assert(deduped.count() == expected)
  }

  test("streaming ingest sinks micro-batches into a medallion table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS stream_test")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = EventStreams.sinkToTable(
      EventStreams.readEvents(spark, eventsDir),
      graft.sources.ParquetTableFormat,
      "stream_test.events_bronze", ckpt).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("stream_test.events_bronze").count() ==
      Tables.events(spark, SparkTestSession.sfDir).count())
  }

  test("stream-stream purchase-view join matches the batch join") {
    val streamed = runToMemory(
      EventStreams.purchaseViewJoin(
        EventStreams.readEvents(spark, eventsDir), withinMs = 60 * 60 * 1000L),
      "ssjoin_out")
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val batch = p.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 3600 SECONDS"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("checkpointed ingest resumes exactly-once across restarts") {
    // stop the query, add a new file, start a NEW query instance on the SAME
    // checkpoint: the source must skip everything already committed (no
    // re-ingest of file 0) and pick up only the new file — the exactly-once
    // resume contract a production ingest relies on after a crash/deploy
    val dir = java.nio.file.Files.createTempDirectory("graft_resume_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_resume_ckpt").toString
    val tbl = "graft_stream_resume_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val src = java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("0.parquet"))
    def run(): Unit = {
      val q = EventStreams.sinkToTable(
        EventStreams.readEvents(spark, dir.toString),
        graft.sources.ParquetTableFormat, tbl, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    val total = Tables.events(spark, SparkTestSession.sfDir).count()
    run()
    assert(spark.table(tbl).count() == total)
    java.nio.file.Files.copy(src, dir.resolve("1.parquet"))
    run()
    // file 1 ingested once, file 0 NOT replayed (refresh: the catalog caches
    // the table's file listing from the first count)
    spark.catalog.refreshTable(tbl)
    assert(spark.table(tbl).count() == 2 * total)
  }

  test("idempotent append makes batch re-delivery exactly-once") {
    // foreachBatch is at-least-once: after a crash the in-flight batch is
    // RE-DELIVERED with the same batchId. The partition-per-batch overwrite
    // must absorb the replay (including a partial first attempt) without
    // duplicating rows, while new batch ids append.
    val out = java.nio.file.Files.createTempDirectory("graft_eo_sink").toString
    val b0 = (1L to 100L).toDF("v")
    EventStreams.idempotentAppend(b0, 0L, out)
    assert(spark.read.parquet(out).count() == 100)
    // replay of batch 0 — as after a crash mid-commit; simulate the partial
    // first attempt being superseded by a complete retry
    EventStreams.idempotentAppend(b0, 0L, out)
    assert(spark.read.parquet(out).count() == 100)
    EventStreams.idempotentAppend((200L to 249L).toDF("v"), 1L, out)
    assert(spark.read.parquet(out).count() == 150)
    // replay of an OLD batch after later batches landed touches only its own
    // partition
    EventStreams.idempotentAppend(b0, 0L, out)
    assert(spark.read.parquet(out).count() == 150)
    assert(spark.read.parquet(out).select(sum(col("v"))).as[Long].collect().head ==
      (1L to 100L).sum + (200L to 249L).sum)
  }

  test("exactly-once sink end-to-end over a file stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eo_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_eo_out").toString
    val src = java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("0.parquet"))
    def run(): Unit = {
      val q = EventStreams.sinkToPathExactlyOnce(
        EventStreams.readEvents(spark, dir.toString), out, ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    val total = Tables.events(spark, SparkTestSession.sfDir).count()
    run()
    assert(spark.read.parquet(out).count() == total)
    // restart on the same checkpoint with a new file: only the new file lands
    java.nio.file.Files.copy(src, dir.resolve("1.parquet"))
    run()
    assert(spark.read.parquet(out).count() == 2 * total)
  }

  test("sessionization state carries across micro-batches") {
    // split events by time into two files; maxFilesPerTrigger=1 forces two
    // micro-batches, so sessions spanning the cut exercise state handoff
    val dir = java.nio.file.Files.createTempDirectory("graft_two_batches")
    val ev = Tables.events(spark, SparkTestSession.sfDir).orderBy("ts")
    val cut = ev.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head.getTimestamp(0)
    ev.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$dir/b0")
    ev.filter(col("ts") > cut).coalesce(1).write.parquet(s"$dir/b1")
    // stage as flat files so the source sees them as two inputs (b0 first)
    java.nio.file.Files.move(
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/b0"))
        .filter(_.toString.endsWith(".parquet")).findFirst.get,
      java.nio.file.Paths.get(s"$dir/0.parquet"))
    java.nio.file.Files.move(
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/b1"))
        .filter(_.toString.endsWith(".parquet")).findFirst.get,
      java.nio.file.Paths.get(s"$dir/1.parquet"))

    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[EventStreams.SessionEvent]
    val streamed = runToMemory(
      EventStreams.sessionize(stream, gapMs = 30 * 60 * 1000L).toDF(),
      "sessions_2batch_out")
    val batch = EventStreams.sessionizeBatch(
      Tables.events(spark, SparkTestSession.sfDir), gapMs = 30 * 60 * 1000L)
    val streamedSet = streamed
      .select("user_id", "session_start", "session_end", "n_events").collect().toSet
    val batchSet = batch
      .select("user_id", "session_start", "session_end", "n_events").collect().toSet
    // every emitted session must be a true session even when it was built
    // across the batch boundary; only per-user trailing sessions stay open
    assert(streamedSet.subsetOf(batchSet))
    assert(streamedSet.size >= batchSet.size - 150)
    assert(streamedSet.nonEmpty)
  }

  test("late within-watermark events gap-merge into one session (batch-twin semantics)") {
    // batch 0: one event at 10:00 opens a session (gap 10 min, watermark 30
    // min → after batch 0 the watermark is 09:30). batch 1: two late events
    // at 09:35/09:36 — before the open session's reach (09:50) but within
    // the gap of EACH OTHER, so they must emit as ONE closed session of 2
    // (the pre-fix code emitted two spurious singletons)
    val dir = java.nio.file.Files.createTempDirectory("graft_late_merge")
    def writeBatch(name: String, minutes: Seq[Int]): Unit = {
      val df = minutes.map(m => (1L, new java.sql.Timestamp(
          java.time.Instant.parse("2024-01-01T09:00:00Z").toEpochMilli + m * 60000L),
          "view"))
        .toDF("user_id", "ts", "event_type")
      val tmp = s"$dir/_$name"
      df.coalesce(1).write.parquet(tmp)
      java.nio.file.Files.move(
        java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    writeBatch("0", Seq(60))     // 10:00
    writeBatch("1", Seq(35, 36)) // 09:35, 09:36
    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .as[EventStreams.SessionEvent]
    val out = runToMemory(
      EventStreams.sessionize(stream, gapMs = 10 * 60 * 1000L).toDF(),
      "late_merge_out")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
    assert(out.length == 1, out.mkString("; "))
    val s = out.head
    assert(s.getLong(0) == 1L)
    assert(s.getTimestamp(1).toInstant == java.time.Instant.parse("2024-01-01T09:35:00Z"))
    assert(s.getTimestamp(2).toInstant == java.time.Instant.parse("2024-01-01T09:36:00Z"))
    assert(s.getLong(3) == 2L)
  }

  test("stateful sessionization emits the same sessions as the batch twin") {
    val events = EventStreams.readEvents(spark, eventsDir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[EventStreams.SessionEvent]
    val streamed = runToMemory(
      EventStreams.sessionize(events, gapMs = 30 * 60 * 1000L).toDF(), "sessions_out")
    val batch = EventStreams.sessionizeBatch(
      Tables.events(spark, SparkTestSession.sfDir), gapMs = 30 * 60 * 1000L)
    // append-mode streaming only emits sessions closed by the watermark; on a
    // finite input the final open session per user stays in state. Everything
    // emitted must be a real session, and most sessions must have closed.
    val streamedSet = streamed
      .select("user_id", "session_start", "session_end", "n_events").collect().toSet
    val batchSet = batch
      .select("user_id", "session_start", "session_end", "n_events").collect().toSet
    assert(streamedSet.subsetOf(batchSet))
    assert(streamedSet.size >= batchSet.size - 150) // ≤1 open session per user
    assert(streamedSet.nonEmpty)
  }

  test("readEvents starts on an EMPTY landing directory and picks up late files") {
    // the normal streaming-startup order: define the stream BEFORE the
    // first file lands; the schema probe must fall back, not throw
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_stream")
    val stream = EventStreams.readEvents(spark, dir.toString)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("late_files_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("late_files_out").count() == 0)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
        dir.resolve("part-0.parquet"))
      q.processAllAvailable()
      assert(spark.table("late_files_out").count() ==
        Tables.events(spark, SparkTestSession.sfDir).count())
    } finally q.stop()
  }

  test("streaming HLL distinct equals the batch sketch TO THE BIT across restarts") {
    // two time-split files → two micro-batches; stop the query between
    // them on a checkpoint and restart, so the register state also
    // survives a recovery. The final per-group row must equal the batch
    // twin exactly — same doubles, not "within sketch error".
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hll_ckpt")
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val cut = ev.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head.getTimestamp(0)
    // stage as flat files (the source lists the directory, not nested dirs)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_hll_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    stage(ev.filter(col("ts") <= cut), "0.parquet")
    def stream() = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    // foreachBatch sink: the memory sink cannot recover from a checkpoint,
    // and recovery is exactly what this test exercises
    val emittedBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Double)]()
    def run(): Unit = {
      val q = EventStreams.distinctCountsHll(stream(), "event_type", "user_id")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => emittedBuf.add(
            (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))))
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run()
    stage(ev.filter(col("ts") > cut), "1.parquet")
    run() // restart on the same checkpoint; state recovers, second file lands
    // the memory sink holds every update-mode emission (one row per group
    // per touching batch); order-free exactness check: every emission is
    // the batch twin of SOME prefix (file0 or file0+file1), and the full
    // twin's row for every group was emitted — i.e., each group's final
    // streamed state equals the batch sketch bit-for-bit
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Double)] =
      df.select(col("event_type"), col("m_used"), col("v_zero"),
        col("hll_estimate")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val emitted = {
      import scala.jdk.CollectionConverters._
      emittedBuf.asScala.toSet
    }
    val twinPrefix = rowSet(
      EventStreams.distinctCountsHllBatch(ev.filter(col("ts") <= cut),
        "event_type", "user_id"))
    val twinFull = rowSet(
      EventStreams.distinctCountsHllBatch(ev, "event_type", "user_id"))
    assert(twinFull.nonEmpty)
    assert(twinFull.subsetOf(emitted),
      s"missing final states: ${twinFull -- emitted}")
    assert(emitted.subsetOf(twinPrefix ++ twinFull),
      s"spurious emissions: ${emitted -- twinPrefix -- twinFull}")
  }

  test("streaming KMV bottom-k equals the batch sketch TO THE BIT across restarts") {
    // same discipline as the HLL test: two time-split micro-batches with a
    // stop+restart on the checkpoint between them; every final per-group
    // emission must equal the batch twin's doubles exactly
    val k = 8 // < the 15 distinct users per type at sf0.001 → saturated branch
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kmv_ckpt")
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val cut = ev.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head.getTimestamp(0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_kmv_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    stage(ev.filter(col("ts") <= cut), "0.parquet")
    def stream() = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val emittedBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Double)]()
    def run(): Unit = {
      val q = EventStreams.distinctCountsKmv(stream(), "event_type", "user_id", k)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => emittedBuf.add(
            (r.getString(0), r.getLong(1), r.getDouble(2))))
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run()
    stage(ev.filter(col("ts") > cut), "1.parquet")
    run() // restart on the same checkpoint; sorted-hash state recovers
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
      df.select(col("event_type"), col("n_mins"), col("kmv_estimate"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val emitted = {
      import scala.jdk.CollectionConverters._
      emittedBuf.asScala.toSet
    }
    val twinPrefix = rowSet(EventStreams.distinctCountsKmvBatch(
      ev.filter(col("ts") <= cut).filter(col("user_id").isNotNull),
      "event_type", "user_id", k))
    val twinFull = rowSet(EventStreams.distinctCountsKmvBatch(
      ev.filter(col("user_id").isNotNull), "event_type", "user_id", k))
    assert(twinFull.nonEmpty)
    assert(twinFull.exists(_._2 == k), "test should exercise the saturated (k-th minimum) branch")
    assert(twinFull.subsetOf(emitted),
      s"missing final states: ${twinFull -- emitted}")
    assert(emitted.subsetOf(twinPrefix ++ twinFull),
      s"spurious emissions: ${emitted -- twinPrefix -- twinFull}")
  }

  test("streaming CMS counters equal the batch sketch TO THE BIT across restarts") {
    // counter updates are pure sums, so micro-batch boundaries and a
    // checkpoint restart cannot move a single counter off the batch twin
    val width = 64
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cms_ckpt")
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val cut = ev.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head.getTimestamp(0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cms_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    stage(ev.filter(col("ts") <= cut), "0.parquet")
    def stream() = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val emittedBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Seq[Long])]()
    def run(): Unit = {
      val q = EventStreams.freqSketchCms(stream(), "event_type", "user_id", width)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => emittedBuf.add(
            (r.getString(0), r.getLong(1), r.getSeq[Long](2))))
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run()
    stage(ev.filter(col("ts") > cut), "1.parquet")
    run() // restart on the same checkpoint; the counter matrix recovers
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Seq[Long])] =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val emitted = {
      import scala.jdk.CollectionConverters._
      emittedBuf.asScala.toSet
    }
    val twinPrefix = rowSet(EventStreams.freqSketchCmsBatch(
      ev.filter(col("ts") <= cut), "event_type", "user_id", width))
    val twinFull = rowSet(EventStreams.freqSketchCmsBatch(
      ev, "event_type", "user_id", width))
    assert(twinFull.nonEmpty)
    assert(twinFull.exists(_._3.exists(_ > 1L)),
      "test should exercise colliding/repeated counters")
    assert(twinFull.subsetOf(emitted),
      s"missing final states: ${(twinFull -- emitted).map(_._1)}")
    assert(emitted.subsetOf(twinPrefix ++ twinFull),
      s"spurious emissions: ${(emitted -- twinPrefix -- twinFull).map(_._1)}")
  }

  test("streaming as-of enrich converges to the native batch as-of join across restarts") {
    import spark.implicits._
    val evDir = java.nio.file.Files.createTempDirectory("graft_asof_ev")
    val dimDir = java.nio.file.Files.createTempDirectory("graft_asof_dim")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_ckpt")
    def stage(df: org.apache.spark.sql.DataFrame, dir: java.nio.file.Path, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_asof_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    // file 0: early versions + events, including id4 whose match will be
    // OVERTAKEN by a later version (re-emission path) and id1 (no match)
    stage(Seq(("a", 10L, "a1"), ("a", 20L, "a2")).toDF("key", "version_ts", "payload"),
      dimDir, "0.parquet")
    stage(Seq(("a", 1L, 5L), ("a", 2L, 10L), ("a", 3L, 25L), ("a", 4L, 35L))
      .toDF("key", "event_id", "ts"), evDir, "0.parquet")
    val dim1 = Seq(("a", 30L, "a3"), ("b", 15L, "b1")).toDF("key", "version_ts", "payload")
    val ev1 = Seq(("b", 5L, 50L)).toDF("key", "event_id", "ts")
    def evStream() = spark.readStream
      .schema("key STRING, event_id BIGINT, ts BIGINT")
      .option("maxFilesPerTrigger", "1").parquet(evDir.toString)
    def dimStream() = spark.readStream
      .schema("key STRING, version_ts BIGINT, payload STRING")
      .option("maxFilesPerTrigger", "1").parquet(dimDir.toString)
    val seq = new java.util.concurrent.atomic.AtomicLong()
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Option[Long], Option[String])]()
    def run(): Unit = {
      val q = EventStreams.asOfEnrichStream(evStream(), dimStream())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => emitted.add((seq.incrementAndGet(),
            r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            Option(r.getString(4)))))
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run()
    stage(dim1, dimDir, "1.parquet")
    stage(ev1, evDir, "1.parquet")
    run() // restart: version history + pending events recover
    // last emission per event must equal the batch as-of over ALL data
    val lastPerEvent = {
      import scala.jdk.CollectionConverters._
      emitted.asScala.toSeq.sortBy(_._1)
        .map(e => e._2 -> ((e._3, e._4, e._5))).toMap
    }
    val allEv = Seq(("a", 1L, 5L), ("a", 2L, 10L), ("a", 3L, 25L),
      ("a", 4L, 35L), ("b", 5L, 50L)).toDF("key", "event_id", "ts")
    val allDim = Seq(("a", 10L, "a1"), ("a", 20L, "a2"), ("a", 30L, "a3"),
      ("b", 15L, "b1")).toDF("dkey", "version_ts", "payload")
    val batchTwin = graft.operators.AsOfJoin.joinAsOfNative(
      allEv, allDim, Seq("key"), "ts", Seq("dkey"), "version_ts",
      graft.plans.AsOfBackward)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        Option(r.getString(5))))).toMap
    assert(batchTwin.size == 5)
    assert(lastPerEvent == batchTwin)
    // the overtaken event was emitted at least twice (a2 then a3)
    val id4Emissions = {
      import scala.jdk.CollectionConverters._
      emitted.asScala.toSeq.filter(_._2 == 4L).map(_._5).distinct
    }
    assert(id4Emissions.toSet == Set(Some("a2"), Some("a3")))
  }

  test("streaming histogram bins equal the batch sketch TO THE BIT across restarts") {
    // bin counts are pure sums over the shared scalar/column binning, so
    // micro-batch splits and a restart cannot move a count between bins
    val (lo, hi, nBins) = (0.0, 100.0, 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_hist_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hist_ckpt")
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val cut = ev.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head.getTimestamp(0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_hist_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(
        java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst.get,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    stage(ev.filter(col("ts") <= cut), "0.parquet")
    def stream() = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val emittedBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Seq[Long])]()
    def run(): Unit = {
      val q = EventStreams.histogramSketchStream(
          stream(), "event_type", "value", lo, hi, nBins)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => emittedBuf.add(
            (r.getString(0), r.getLong(1), r.getSeq[Long](2))))
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run()
    stage(ev.filter(col("ts") > cut), "1.parquet")
    run()
    def rowSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Seq[Long])] =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val emitted = {
      import scala.jdk.CollectionConverters._
      emittedBuf.asScala.toSet
    }
    val twinPrefix = rowSet(EventStreams.histogramSketchStreamBatch(
      ev.filter(col("ts") <= cut), "event_type", "value", lo, hi, nBins))
    val twinFull = rowSet(EventStreams.histogramSketchStreamBatch(
      ev, "event_type", "value", lo, hi, nBins))
    assert(twinFull.nonEmpty)
    assert(twinFull.exists(_._3.count(_ > 0L) > 3),
      "test should spread mass over several bins")
    assert(twinFull.subsetOf(emitted),
      s"missing final states: ${(twinFull -- emitted).map(_._1)}")
    assert(emitted.subsetOf(twinPrefix ++ twinFull),
      s"spurious emissions: ${(emitted -- twinPrefix -- twinFull).map(_._1)}")
  }
}
