package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AppConfig, Layer}
import graft.ingest.IngestSpec
import graft.models.InsuranceModels
import graft.pipeline.Orchestrator
import graft.sources.ParquetTableFormat

/** End-to-end medallion pipeline over our own claims/policies fixtures:
  * ingest (with deterministic dedup) → bronze → silver (cleansed) → gold
  * (aggregates), with hand-computed oracles on the results.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val report = {
    val dir = Fixtures.tempDir()
    val claimsCsv = Fixtures.writeCsv(dir, "claims.csv",
      Fixtures.claimsHeader, Fixtures.claimsRows)
    val policiesCsv = Fixtures.writeCsv(dir, "policies.csv",
      Fixtures.policiesHeader, Fixtures.policiesRows)
    val cfg = AppConfig(appName = "graftpipe")
    val orch = new Orchestrator(cfg, ParquetTableFormat)
    orch.run(spark,
      specs = Seq(
        IngestSpec("claims", claimsCsv, cfg.tableName(Layer.Bronze, "claims"),
          dedupKeys = Seq("claim_id"), orderCol = Some("updated_at")),
        IngestSpec("policies", policiesCsv, cfg.tableName(Layer.Bronze, "policies"),
          dedupKeys = Seq("policy_id"), orderCol = Some("updated_at"))),
      models = InsuranceModels.graph(cfg, runId = "test-run-1"))
  }

  test("pipeline succeeds end-to-end with exit code 0") {
    assert(report.ok)
    assert(report.exitCode == 0)
    assert(report.steps.map(_.step) ==
      Seq("ingestion", "transformations", "quality_checks"))
  }

  test("ingest dedups deterministically keeping the latest updated_at") {
    val claims = report.ingests.find(_.name == "claims").get
    assert(claims.rowsRead == 7)
    assert(claims.rowsWritten == 6)
    assert(claims.duplicatesRemoved == 1)
    val kept = spark.table("graftpipe_dev_bronze.claims")
      .filter(col("claim_id") === "CLM100")
    assert(kept.count() == 1)
    // the amended (later updated_at) row won
    assert(kept.select("description").head.getString(0) == "fender bender amended")
  }

  test("bronze tables carry ingest metadata columns") {
    val bronze = spark.table("graftpipe_dev_bronze.bronze_claims")
    assert(Seq("ingestion_timestamp", "dbt_run_timestamp", "dbt_invocation_id")
      .forall(bronze.columns.contains))
    assert(bronze.select("dbt_invocation_id").distinct().head.getString(0)
      == "test-run-1")
  }

  test("gold_claims_summary aggregates match hand-computed totals") {
    val gold = spark.table("graftpipe_dev_gold.claims_summary")
    // AUTO/OPEN in 2024-01: only the deduped CLM100 (1250.00)
    val autoOpen = gold.filter(col("claim_type") === "AUTO"
      && col("claim_status") === "OPEN").head
    assert(autoOpen.getAs[Long]("n_claims") == 1)
    assert(autoOpen.getAs[java.math.BigDecimal]("total_claim_amount")
      .compareTo(new java.math.BigDecimal("1250.00")) == 0)
    // CLOSED claims have settlements: HOME 4500/5000, AUTO 2000/2200
    val homeClosed = gold.filter(col("claim_type") === "HOME"
      && col("claim_status") === "CLOSED").head
    assert(homeClosed.getAs[java.math.BigDecimal]("total_settlement_amount")
      .compareTo(new java.math.BigDecimal("4500.00")) == 0)
  }

  test("gold_policy_summary premium totals match") {
    val gold = spark.table("graftpipe_dev_gold.policy_summary")
    val autoActive = gold.filter(col("policy_type") === "AUTO"
      && col("policy_status") === "ACTIVE").head
    assert(autoActive.getAs[Long]("n_policies") == 1)
    assert(autoActive.getAs[java.math.BigDecimal]("total_premium")
      .compareTo(new java.math.BigDecimal("1400.00")) == 0)
    val suspended = gold.filter(col("policy_status") === "SUSPENDED").head
    assert(suspended.getAs[Long]("n_active") == 0)
  }

  test("clean fixtures produce zero stored violations") {
    assert(report.models.map(_.testViolations).sum == 0)
  }

  test("report renders the boxed summary") {
    val r = report.render
    assert(r.contains("PIPELINE EXECUTION REPORT"))
    assert(r.contains("RESULT: SUCCESS"))
    assert(r.contains("claims"))
  }

  test("dirty data flows through with violations stored, pipeline tolerated") {
    val dir = Fixtures.tempDir()
    val policiesCsv = Fixtures.writeCsv(dir, "policies.csv",
      Fixtures.policiesHeader, Fixtures.policiesRows ++ Fixtures.dirtyPoliciesRows)
    val cfg = AppConfig(appName = "graftdirty")
    val orch = new Orchestrator(cfg, ParquetTableFormat)
    val rpt = orch.run(spark,
      specs = Seq(IngestSpec("policies", policiesCsv,
        cfg.tableName(Layer.Bronze, "policies"),
        dedupKeys = Seq("policy_id"), orderCol = Some("updated_at"))),
      models = InsuranceModels.graph(cfg, runId = "dirty-run")
        .filter(m => m.name.contains("polic")))
    // violations counted but never fatal (reference orchestrator.py:84-85)
    assert(rpt.ok)
    assert(rpt.models.find(_.name == "silver_policies").get.testViolations > 0)
    // stored-failures table carries (table_name, rule) rows dbt-style
    val failures = spark.table(cfg.tableName(Layer.Gold, "test_failures"))
    assert(failures.count() > 0)
    assert(failures.select("rule").distinct().count() >= 3)
  }

  test("a step exceeding its timeout aborts with a timeout error") {
    val cfg = AppConfig(appName = "grafttimeout", maxRetries = 0)
    val orch = new Orchestrator(cfg, ParquetTableFormat,
      stepTimeouts = Map("ingestion" -> 50L))
    val dir = Fixtures.tempDir()
    val csv = Fixtures.writeCsv(dir, "claims.csv",
      Fixtures.claimsHeader, Fixtures.claimsRows)
    val slow = orch.run(spark,
      specs = Seq(IngestSpec("slow", csv,
        cfg.tableName(graft.core.Layer.Bronze, "claims"))),
      models = Nil)
    assert(!slow.ok)
    assert(slow.steps.head.detail.contains("timed out"))
  }

  test("a missing source fails fast with an isolated error") {
    val cfg = AppConfig(appName = "graftbad", maxRetries = 0, retryDelayMs = 0)
    val orch = new Orchestrator(cfg, ParquetTableFormat)
    val bad = orch.run(spark,
      specs = Seq(IngestSpec("claims", "/nonexistent/claims.csv",
        cfg.tableName(Layer.Bronze, "claims"))),
      models = Nil)
    assert(!bad.ok)
    assert(bad.exitCode == 1)
    assert(bad.steps.head.step == "ingestion" && !bad.steps.head.ok)
  }
}
