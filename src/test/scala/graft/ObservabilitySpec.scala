package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.observe.{AlertManager, Freshness, PipelineMetrics}

class ObservabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("SparkListener metrics capture records and bytes read") {
    val m = new PipelineMetrics().attach(spark)
    Tables.lineitem(spark, SparkTestSession.sfDir).count()
    // listener events are delivered async; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (m.snapshot.recordsRead < 6000 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    val snap = m.snapshot
    m.detach(spark)
    assert(snap.recordsRead >= 6000)
    assert(snap.bytesRead > 0)
    assert(snap.failedTasks == 0)
  }

  test("alerts fire on duration and error-rate thresholds") {
    assert(AlertManager.evaluate(durationMs = 61 * 60 * 1000L, 1000, 0)
      .exists(a => a.name == "pipeline_duration" && a.severity == "warning"))
    assert(AlertManager.evaluate(durationMs = 1000, processed = 100, errors = 6)
      .exists(a => a.name == "error_rate" && a.severity == "critical"))
    assert(AlertManager.evaluate(durationMs = 1000, processed = 100, errors = 2).isEmpty)
    assert(AlertManager.throughput(2000, 60000) == 2000 / 60.0)
  }

  test("alerts fire on memory and CPU thresholds (reference pipeline_monitor.py:284-285)") {
    assert(AlertManager.evaluate(1000, 100, 0, memoryMb = 5000.0)
      .exists(a => a.name == "memory_usage" && a.severity == "warning"))
    assert(AlertManager.evaluate(1000, 100, 0, cpuPct = 95.0)
      .exists(a => a.name == "cpu_usage" && a.severity == "warning"))
    // within thresholds / unsampled (negative) → no alert
    assert(AlertManager.evaluate(1000, 100, 0, memoryMb = 1024.0, cpuPct = 50.0).isEmpty)
    assert(AlertManager.evaluate(1000, 100, 0).isEmpty)
    assert(AlertManager.heapUsedMb() > 0)
  }

  test("freshness classifies fresh/aging/stale from max event time") {
    val events = Tables.events(spark, SparkTestSession.sfDir)
    val latest = events.agg(org.apache.spark.sql.functions.max("ts"))
      .head.getTimestamp(0).toInstant.getEpochSecond
    def statusAt(now: Long): String =
      Freshness.check(events, "ts", now).head.getAs[String]("status")
    assert(statusAt(latest + 3600) == "fresh")
    assert(statusAt(latest + 18 * 3600) == "aging")
    assert(statusAt(latest + 48 * 3600) == "stale")
  }

  test("per-group freshness classifies each stream independently") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, SparkTestSession.sfDir)
    val latest = events.agg(max("ts")).head.getTimestamp(0)
      .toInstant.getEpochSecond
    // age one stream by 20 h, another by 40 h; the rest stay fresh
    val skewed = events.withColumn("ts",
      when(col("event_type") === "view", col("ts") - expr("INTERVAL 20 HOURS"))
        .when(col("event_type") === "error", col("ts") - expr("INTERVAL 40 HOURS"))
        .otherwise(col("ts")))
    val got = Freshness.checkPerGroup(skewed, Seq("event_type"), "ts",
        nowEpochSec = latest + 3600)
      .collect().map(r => r.getString(0) -> r.getAs[String]("status")).toMap
    assert(got("view") === "aging")
    assert(got("error") === "stale")
    assert(got("click") === "fresh")
    // same thresholds as the corpus-level check by construction
    assert(got.values.toSet.subsetOf(Set("fresh", "aging", "stale")))
  }
}
