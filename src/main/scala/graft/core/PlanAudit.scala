package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Physical-plan audit as a first-class library feature: the facts a CI
  * gate asserts about a pipeline's plan BEFORE it ships — "no cartesian
  * product", "at most N shuffles", "the filter reached the scan", "the
  * dimension joins broadcast" — extracted as data instead of eyeballed
  * from `explain()` text. At 100 TB a plan regression (a broadcast
  * flipping to sort-merge behind a stats change, a pushed filter lost
  * behind a cast) costs more than any single query's runtime; making the
  * shape assertable turns those regressions into red tests.
  *
  * Facts come from the static physical plan (AQE's initial plan when
  * adaptive execution wraps it): that is what is knowable before running,
  * which is exactly the contract of a pre-ship gate. AQE may still
  * improve a shape at runtime (e.g. demote a skewed sort-merge), but it
  * will not save a cartesian product or a lost pushdown — the things the
  * audit exists to catch. PlanShapeSpec uses the same source of truth.
  */
object PlanAudit {

  /** Counted plan-shape facts for one DataFrame's physical plan. */
  final case class PlanFacts(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      cartesianProducts: Int,
      broadcastNestedLoopJoins: Int,
      sortMergeJoins: Int,
      broadcastHashJoins: Int,
      shuffledHashJoins: Int,
      wholeStageCodegenSpans: Int,
      inMemoryScans: Int,
      fileScans: Int,
      fileScansWithPushedFilters: Int)

  private def staticPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  def facts(df: DataFrame): PlanFacts = {
    val nodes = staticPlan(df).collectWithSubqueries { case p => p }
    def n(pf: PartialFunction[SparkPlan, Unit]): Int = nodes.count(pf.isDefinedAt)
    val fileScans = nodes.collect { case f: FileSourceScanExec => f }
    PlanFacts(
      shuffleExchanges = n { case _: ShuffleExchangeLike => },
      broadcastExchanges = n { case _: BroadcastExchangeLike => },
      cartesianProducts = n { case _: CartesianProductExec => },
      broadcastNestedLoopJoins = n { case _: BroadcastNestedLoopJoinExec => },
      sortMergeJoins = n { case _: SortMergeJoinExec => },
      broadcastHashJoins = n { case _: BroadcastHashJoinExec => },
      shuffledHashJoins = n { case _: ShuffledHashJoinExec => },
      wholeStageCodegenSpans = n { case _: WholeStageCodegenExec => },
      inMemoryScans = n { case _: InMemoryTableScanExec => },
      fileScans = fileScans.size,
      fileScansWithPushedFilters = fileScans.count(
        _.metadata.get("PushedFilters").exists(v => v != "[]" && v.nonEmpty)))
  }

  /** The audit as a one-row DataFrame — so a plan-shape check can ride the
    * same report sink (table, dashboard, gate query) as any data-level
    * quality metric.
    */
  def auditFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq(facts(df)).toDS().toDF()
  }

  /** CI guard: refuse plans with corpus-squaring joins — a cartesian or
    * non-broadcast nested-loop join that is survivable in a test fixture
    * and fatal at 100 TB.
    */
  def requireNoProductJoins(df: DataFrame): Unit = {
    val f = facts(df)
    require(f.cartesianProducts == 0,
      s"plan contains ${f.cartesianProducts} CartesianProduct node(s)")
    require(f.broadcastNestedLoopJoins == 0,
      s"plan contains ${f.broadcastNestedLoopJoins} BroadcastNestedLoopJoin node(s)")
  }

  /** CI guard: cap the shuffle count — the scale currency of a plan. */
  def requireMaxShuffles(df: DataFrame, max: Int): Unit = {
    val got = facts(df).shuffleExchanges
    require(got <= max, s"plan shuffles $got times, cap is $max")
  }
}
