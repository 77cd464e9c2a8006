package graft.observe

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Execution metrics + alerting, re-expressing the reference's monitoring
  * surface (reference scripts/monitoring/pipeline_monitor.py:35-48 metric
  * collection, :280-285 thresholds; scripts/utils/logger.py:141-168
  * quality-rate and throughput metrics) on Spark-native sources: a
  * SparkListener for task/bytes/time, wall-clock timers for throughput.
  */
final case class MetricsSnapshot(
    recordsRead: Long, bytesRead: Long, shuffleBytesWritten: Long,
    taskTimeMs: Long, failedTasks: Long)

final class PipelineMetrics extends SparkListener {
  private val records = new java.util.concurrent.atomic.AtomicLong
  private val bytes = new java.util.concurrent.atomic.AtomicLong
  private val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
  private val taskTime = new java.util.concurrent.atomic.AtomicLong
  private val failed = new java.util.concurrent.atomic.AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      records.addAndGet(m.inputMetrics.recordsRead)
      bytes.addAndGet(m.inputMetrics.bytesRead)
      shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      taskTime.addAndGet(m.executorRunTime)
    }
    if (taskEnd.reason != org.apache.spark.Success) failed.incrementAndGet()
  }

  def snapshot: MetricsSnapshot = MetricsSnapshot(
    records.get, bytes.get, shuffleBytes.get, taskTime.get, failed.get)

  def attach(spark: SparkSession): this.type = {
    spark.sparkContext.addSparkListener(this); this
  }
  def detach(spark: SparkSession): Unit =
    spark.sparkContext.removeSparkListener(this)
}

/** Threshold alerting (reference pipeline_monitor.py:280-312): pipeline
  * duration > 60 min → warning; error rate > 5% → critical; memory
  * > 4096 MB → warning; CPU > 90% → warning (pipeline_monitor.py:284-285).
  */
final case class Alert(name: String, severity: String, detail: String)

object AlertManager {
  def evaluate(
      durationMs: Long,
      processed: Long,
      errors: Long,
      maxDurationMs: Long = 60 * 60 * 1000L,
      maxErrorRate: Double = 0.05,
      /** Observed driver/executor memory and CPU; negative = not sampled
        * (callers without a metrics source skip these checks).
        */
      memoryMb: Double = -1.0,
      cpuPct: Double = -1.0,
      maxMemoryMb: Double = 4096.0,
      maxCpuPct: Double = 90.0): Seq[Alert] = {
    val durationAlert =
      if (durationMs > maxDurationMs)
        Some(Alert("pipeline_duration", "warning",
          s"${durationMs / 60000} min exceeds ${maxDurationMs / 60000} min"))
      else None
    val errRate = if (processed == 0) 0.0 else errors.toDouble / processed
    val errorAlert =
      if (errRate > maxErrorRate)
        Some(Alert("error_rate", "critical",
          f"$errRate%.3f exceeds $maxErrorRate%.2f"))
      else None
    val memoryAlert =
      if (memoryMb >= 0 && memoryMb > maxMemoryMb)
        Some(Alert("memory_usage", "warning",
          f"$memoryMb%.0f MB exceeds $maxMemoryMb%.0f MB"))
      else None
    val cpuAlert =
      if (cpuPct >= 0 && cpuPct > maxCpuPct)
        Some(Alert("cpu_usage", "warning",
          f"$cpuPct%.1f%% exceeds $maxCpuPct%.1f%%"))
      else None
    (durationAlert ++ errorAlert ++ memoryAlert ++ cpuAlert).toSeq
  }

  /** JVM heap in use, MB — the local-mode memory sample for [[evaluate]]. */
  def heapUsedMb(): Double = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)
  }

  /** records/sec throughput metric (reference logger.py:156-168). */
  def throughput(processed: Long, durationMs: Long): Double =
    if (durationMs == 0) 0.0 else processed * 1000.0 / durationMs
}

/** Data-freshness classification (reference
  * scripts/monitoring/health_check.py:318-387: fresh ≤12 h, aging ≤24 h,
  * stale >24 h) from the max event-time of a table — a single max()
  * aggregate, pushdown-friendly.
  */
object Freshness {
  /** Shared classification: attaches `age_hours` and `status` to a frame
    * carrying a `latest` timestamp — ONE definition of the thresholds so
    * the corpus-level and per-stream reports can never drift.
    */
  private def classify(withLatest: DataFrame, nowEpochSec: Long,
      freshHours: Int, agingHours: Int): DataFrame =
    withLatest
      .withColumn("age_hours",
        (lit(nowEpochSec) - unix_timestamp(col("latest"))) / 3600.0)
      .withColumn("status",
        when(col("age_hours") <= freshHours, "fresh")
          .when(col("age_hours") <= agingHours, "aging")
          .otherwise("stale"))

  def check(df: DataFrame, tsCol: String, nowEpochSec: Long,
      freshHours: Int = 12, agingHours: Int = 24): DataFrame =
    classify(df.agg(max(col(tsCol)).as("latest")),
      nowEpochSec, freshHours, agingHours)

  /** Per-stream form of [[check]] — one freshness row per group (stream,
    * source, partition): the dashboard table a pipeline owner reads, with
    * the same fresh/aging/stale thresholds per group. One
    * map-side-combining max aggregate; classification is a projection.
    */
  def checkPerGroup(df: DataFrame, groupCols: Seq[String], tsCol: String,
      nowEpochSec: Long, freshHours: Int = 12,
      agingHours: Int = 24): DataFrame =
    classify(
      df.groupBy(groupCols.map(col): _*).agg(max(col(tsCol)).as("latest")),
      nowEpochSec, freshHours, agingHours)
}
