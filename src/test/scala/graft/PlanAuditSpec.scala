package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PlanAudit, Tables}

/** PlanAudit extracts the shape facts PlanShapeSpec asserts by string
  * matching — counted from real plans over the test tables.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lineitem = Tables.lineitem(spark, SparkTestSession.sfDir)
  private def nation = Tables.nation(spark, SparkTestSession.sfDir)
  private def supplier = Tables.supplier(spark, SparkTestSession.sfDir)

  test("broadcast join counts a broadcast exchange + hash join, no shuffle join") {
    val f = PlanAudit.facts(
      supplier.join(broadcast(nation), col("s_nationkey") === col("n_nationkey")))
    assert(f.broadcastHashJoins === 1)
    assert(f.broadcastExchanges === 1)
    assert(f.sortMergeJoins === 0 && f.cartesianProducts === 0)
  }

  test("a filter over parquet shows up as a pushed-filter scan") {
    val f = PlanAudit.facts(
      lineitem.filter(col("l_quantity") > 10).select("l_orderkey", "l_quantity"))
    assert(f.fileScans === 1)
    assert(f.fileScansWithPushedFilters === 1)
    assert(f.wholeStageCodegenSpans >= 1)
  }

  test("an aggregate costs exactly one shuffle; the guard passes and caps bind") {
    val agg = lineitem.groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(PlanAudit.facts(agg).shuffleExchanges === 1)
    PlanAudit.requireMaxShuffles(agg, 1)
    intercept[IllegalArgumentException] {
      PlanAudit.requireMaxShuffles(agg, 0)
    }
  }

  test("corpus-squaring joins are refused loudly") {
    val crossed = supplier.crossJoin(nation)
    assert(PlanAudit.facts(crossed).cartesianProducts +
      PlanAudit.facts(crossed).broadcastNestedLoopJoins >= 1)
    intercept[IllegalArgumentException] {
      PlanAudit.requireNoProductJoins(crossed)
    }
    PlanAudit.requireNoProductJoins(
      supplier.join(nation, col("s_nationkey") === col("n_nationkey")))
  }

  test("cached inputs surface as in-memory scans; the audit frame is one row") {
    val cached = nation.cache()
    try {
      cached.count()
      val f = PlanAudit.facts(cached.filter(col("n_regionkey") === 1))
      assert(f.inMemoryScans === 1)
      val row = PlanAudit.auditFrame(cached.filter(col("n_regionkey") === 1))
      assert(row.count() === 1)
      assert(row.columns.contains("shuffleExchanges"))
    } finally cached.unpersist()
  }
}
