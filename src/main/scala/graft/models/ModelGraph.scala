package graft.models

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.quality.RuleSet
import graft.sources.TableFormat

/** One materialized model: the Spark-native equivalent of a dbt model
  * (reference dbt/models/bronze/bronze_claims.sql + dbt_project.yml:29-46) —
  * a named build function, its dependencies, and attached quality rules
  * whose failures are stored dbt-style (`store_failures`,
  * dbt_project.yml:61-63).
  */
final case class Model(
    name: String,
    targetTable: String,
    deps: Seq[String] = Nil,
    build: SparkSession => DataFrame,
    rules: Option[RuleSet] = None,
    /** Incremental high-watermark column: when set and the target exists,
      * only rows with `incrementalCol > max(existing)` are appended instead
      * of rebuilding the table (dbt incremental materialization — at scale
      * the difference between a partition append and a full rewrite).
      */
    incrementalCol: Option[String] = None)

object Model {
  /** SQL-string model — the dbt SELECT ports verbatim through spark.sql
    * (reference dbt/models/bronze/bronze_claims.sql shape).
    */
  def sql(name: String, targetTable: String, query: String,
      deps: Seq[String] = Nil, rules: Option[RuleSet] = None): Model =
    Model(name, targetTable, deps, s => s.sql(query), rules)
}

final case class ModelRun(
    name: String, ok: Boolean, rows: Long, testViolations: Long,
    error: Option[String] = None)

/** Dependency-ordered model executor — the in-session replacement for
  * dbt-over-HTTP (reference orchestrator.py:60-78 + profiles.yml:4-13;
  * SURVEY §3 E3): topological order, fail-fast on build errors, test
  * failures tolerated but counted (orchestrator.py:84-85 semantics).
  *
  * `parallelism > 1` runs independent models of the same dependency rank
  * concurrently (the dbt `threads` analog, profiles.yml:10 — Spark
  * schedules the submitted jobs fairly across the session).
  */
final class ModelGraph(models: Seq[Model], format: TableFormat,
    failuresTable: Option[String] = None,
    analyzeTables: Boolean = false,
    parallelism: Int = 1,
    /** Stamped onto stored failures so successive runs' violations are
      * distinguishable (the failures table is append-only).
      */
    runId: String = "") {

  private val byName = models.map(m => m.name -> m).toMap
  require(byName.size == models.size, "duplicate model names")
  models.foreach(m => m.deps.foreach(d =>
    require(byName.contains(d), s"${m.name}: unknown dep $d")))

  /** Deterministic topological order (stable within a rank). */
  val order: Seq[Model] = {
    val ranked = scala.collection.mutable.LinkedHashMap[String, Int]()
    def rank(n: String, seen: Set[String]): Int = {
      require(!seen(n), s"dependency cycle at $n")
      ranked.getOrElseUpdate(n,
        byName(n).deps.map(d => rank(d, seen + n) + 1).maxOption.getOrElse(0))
    }
    models.foreach(m => rank(m.name, Set.empty))
    models.sortBy(m => (ranked(m.name), m.name))
  }

  private lazy val rankOf: Map[String, Int] = {
    def rank(n: String): Int =
      byName(n).deps.map(d => rank(d) + 1).maxOption.getOrElse(0)
    models.map(m => m.name -> rank(m.name)).toMap
  }

  /** Run all models in order. Build failure aborts downstream dependents but
    * not independent branches; rule violations are stored and counted, never
    * fatal. Models within a rank run concurrently when parallelism > 1
    * (stored-failure appends are serialized — the Parquet table layer has no
    * concurrent-append transaction).
    *
    * Retries are PER MODEL (like per-entity ingestion retries): a step-level
    * re-run of the whole graph would re-build models that already succeeded
    * and re-append their stored failures under the same runId, duplicating
    * violation rows.
    */
  def run(spark: SparkSession, retries: Int = 0, retrySleepMs: Long = 0L): Seq[ModelRun] = {
    if (parallelism <= 1) runSequential(spark, retries, retrySleepMs)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        val failuresLock = new Object
        order.groupBy(m => rankOf(m.name)).toSeq.sortBy(_._1).flatMap {
          case (_, rank) =>
            val futs = rank.map(m =>
              Future(runOne(spark, m, failed, failuresLock, retries, retrySleepMs)))
            futs.map(f => Await.result(f, Duration.Inf))
        }
      } finally pool.shutdown()
    }
  }

  private def runSequential(spark: SparkSession, retries: Int,
      retrySleepMs: Long): Seq[ModelRun] = {
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val lock = new Object
    order.map(m => runOne(spark, m, failed, lock, retries, retrySleepMs))
  }

  private def runOne(spark: SparkSession, m: Model,
      failed: java.util.Set[String], failuresLock: Object,
      retries: Int, retrySleepMs: Long): ModelRun = {
    def attempt(remaining: Int): ModelRun = {
      if (m.deps.exists(failed.contains)) {
        failed.add(m.name)
        ModelRun(m.name, ok = false, 0, 0, Some("skipped: upstream failure"))
      } else Try {
        val df = m.build(spark)
        m.incrementalCol match {
          case Some(c) if format.exists(spark, m.targetTable) =>
            val hwm = spark.table(m.targetTable)
              .agg(org.apache.spark.sql.functions.max(
                org.apache.spark.sql.functions.col(c))).head().get(0)
            val fresh =
              if (hwm == null) df
              else df.filter(org.apache.spark.sql.functions.col(c) >
                org.apache.spark.sql.functions.lit(hwm))
            format.appendMergeSchema(spark, fresh, m.targetTable)
          case _ =>
            format.overwrite(spark, df, m.targetTable)
        }
        // on-run-end statistics hook (reference dbt_project.yml:95-97
        // ANALYZE TABLE ... COMPUTE STATISTICS) — feeds CBO broadcast and
        // join-reorder decisions on the materialized tables
        if (analyzeTables)
          spark.sql(s"ANALYZE TABLE ${m.targetTable} COMPUTE STATISTICS")
        val materialized = spark.table(m.targetTable)
        // every count runs BEFORE the stored-failures append: the append is
        // the last non-idempotent action of an attempt, so a transient
        // failure anywhere else re-runs the attempt without having appended,
        // and a failure during the append itself is the only (unavoidable)
        // partial-write window — retries cannot double-append via a later
        // count/ANALYZE blowing up
        val rowCount = materialized.count()
        val violations = m.rules.map { rs =>
          val fails = rs.failures(materialized)
          val n = fails.count()
          failuresTable.foreach(t => failuresLock.synchronized {
            format.appendMergeSchema(spark,
              fails.select("table_name", "rule")
                .withColumn("run_id", org.apache.spark.sql.functions.lit(runId)),
              t)
          })
          n
        }.getOrElse(0L)
        ModelRun(m.name, ok = true, rowCount, violations)
      } match {
        case Success(r) => r
        case Failure(_) if remaining > 0 =>
          // overwrite-materialized models are idempotent per attempt; all
          // counts/ANALYZE run before the stored-failures append (see above),
          // so a retried attempt has not already appended violation rows
          if (retrySleepMs > 0) Thread.sleep(retrySleepMs)
          attempt(remaining - 1)
        case Failure(e) =>
          failed.add(m.name)
          ModelRun(m.name, ok = false, 0, 0, Some(e.toString))
      }
    }
    attempt(retries)
  }
}
