package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{OracleArith, Tables}
import graft.operators.IncrementalAgg
import graft.plans.MvRewrite

/** The maintained-view rewrite's firing envelope: it must answer exactly
  * the query shapes the registration proves equivalent — and leave every
  * other shape on the base scan.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = {
    // the rewrite rule rides the engine's user-rule batch, which gate
    // invocations install via Sessions.tune (idempotent)
    graft.core.Sessions.tune(SparkTestSession.spark)
  }

  private val groups = Seq("o_orderstatus", "o_orderpriority")
  private val sums = Seq("sum_price" -> "o_totalprice")
  private def orders = Tables.orders(spark, SparkTestSession.sfDir)
  private val basePath = s"${SparkTestSession.sfDir}/orders.parquet"

  private def withView(f: => Unit): Unit = {
    val viewPath = java.nio.file.Files
      .createTempDirectory("graft_mv_spec").toString
    IncrementalAgg.state(orders, groups, sums)
      .write.mode("overwrite").parquet(viewPath)
    MvRewrite.register(spark, basePath, viewPath, groups,
      Map("o_totalprice" -> "sum_price"))
    try f finally MvRewrite.deregister(basePath)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def agg(df: DataFrame, by: String*): DataFrame =
    df.groupBy(by.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(OracleArith.dec2(col("o_totalprice"))).as("s"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("exact-grouping and subset-grouping aggregates read the view, equal base") {
    val exactBase = rows(agg(orders, groups: _*))
    val subsetBase = rows(agg(orders, "o_orderpriority"))
    val globalBase = rows(orders.agg(
      count(lit(1)).as("n"),
      sum(OracleArith.dec2(col("o_totalprice"))).as("s")))
    withView {
      for ((q, base) <- Seq(
          (agg(orders, groups: _*), exactBase),
          (agg(orders, "o_orderpriority"), subsetBase),
          // global aggregate = empty grouping, also a subset
          (orders.agg(count(lit(1)).as("n"),
            sum(OracleArith.dec2(col("o_totalprice"))).as("s")), globalBase))) {
        assert(planOf(q).contains("graft_mv_spec"), planOf(q).take(800))
        assert(rows(q) == base)
      }
    }
  }

  test("non-provable shapes stay on the base scan") {
    withView {
      // a filter between scan and aggregate: not registered, no rewrite
      val filtered = agg(orders.filter(col("o_totalprice") > 1000.0),
        "o_orderstatus")
      assert(!planOf(filtered).contains("graft_mv_spec"))
      // an unregistered aggregate function
      val minAgg = orders.groupBy("o_orderstatus")
        .agg(min(col("o_totalprice")).as("m"))
      assert(!planOf(minAgg).contains("graft_mv_spec"))
      // a sum over a raw (uncast) column is NOT the materialized sum
      val rawSum = orders.groupBy("o_orderstatus")
        .agg(sum(col("o_totalprice")).as("s"))
      assert(!planOf(rawSum).contains("graft_mv_spec"))
      // grouping by a non-view column
      val other = agg(orders, "o_orderdate")
      assert(!planOf(other).contains("graft_mv_spec"))
    }
    // deregistered: back to the base scan
    val afterwards = agg(orders, "o_orderstatus")
    assert(!planOf(afterwards).contains("graft_mv_spec"))
  }

  test("join-view rewrite fires only on the exact registered equi-join") {
    import graft.core.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft_mvj").toString
    val c = Tables.customer(spark, SparkTestSession.sfDir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.orders(spark, SparkTestSession.sfDir)
      .select(col("o_custkey").as("ok"), col("o_orderstatus"),
        col("o_totalprice"))
    c.write.parquet(s"$dir/c"); o.write.parquet(s"$dir/o")
    val cP = spark.read.parquet(s"$dir/c")
    val oP = spark.read.parquet(s"$dir/o")
    IncrementalAgg.state(cP.join(oP, col("k") === col("ok")),
        Seq("seg", "o_orderstatus"), sums)
      .write.parquet(s"$dir/view")
    MvRewrite.registerJoin(spark, s"$dir/c", s"$dir/o",
      Seq("k" -> "ok"), s"$dir/view", Seq("seg", "o_orderstatus"),
      Map("o_totalprice" -> "sum_price"))
    try {
      def q(frame: DataFrame) = frame.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(OracleArith.dec2(col("o_totalprice"))).as("s"))
      val joined = q(cP.join(oP, col("k") === col("ok")))
      assert(planOf(joined).contains(s"$dir/view"), planOf(joined).take(800))
      assert(!planOf(joined).contains("Join"), planOf(joined).take(800))
      // equality against the real join, computed after deregistration
      val expected = q(cP.join(oP, col("k") === col("ok")))
      // a DIFFERENT key condition must not fire
      val wrongKeys = q(cP.join(oP, col("k") === col("ok") + 1))
      assert(!planOf(wrongKeys).contains(s"$dir/view"))
      // a LEFT join must not fire
      val leftJoin = q(cP.join(oP, col("k") === col("ok"), "left"))
      assert(!planOf(leftJoin).contains(s"$dir/view"))
      MvRewrite.deregisterJoin(s"$dir/c", s"$dir/o")
      assert(rows(joined) == rows(expected))
    } finally MvRewrite.deregisterJoin(s"$dir/c", s"$dir/o")
  }

  test("registered min/max columns answer min/max roll-ups from the view") {
    val viewPath = java.nio.file.Files
      .createTempDirectory("graft_mv_spec").toString
    orders.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(OracleArith.dec2(col("o_totalprice"))).as("sum_price"),
        min(col("o_totalprice")).as("min_p"),
        max(col("o_totalprice")).as("max_p"))
      .write.mode("overwrite").parquet(viewPath)
    MvRewrite.register(spark, basePath, viewPath, groups,
      Map("o_totalprice" -> "sum_price"),
      mins = Map("o_totalprice" -> "min_p"),
      maxs = Map("o_totalprice" -> "max_p"))
    try {
      val q = orders.groupBy("o_orderstatus")
        .agg(min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
      assert(planOf(q).contains("graft_mv_spec"), planOf(q).take(800))
      val base = orders.groupBy("o_orderstatus")
        .agg(min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
      MvRewrite.deregister(basePath)
      assert(rows(q) == rows(base))
    } finally MvRewrite.deregister(basePath)
  }
}
