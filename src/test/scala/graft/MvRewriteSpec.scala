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

  test("group-column filters push onto the view; WHERE+GROUP BY reads no base") {
    val fBase = rows(agg(orders.filter(col("o_orderstatus") === "F"),
      "o_orderpriority"))
    val inBase = rows(agg(orders.filter(
      col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderstatus") =!= "P"), "o_orderstatus"))
    withView {
      val f = agg(orders.filter(col("o_orderstatus") === "F"),
        "o_orderpriority")
      assert(planOf(f).contains("graft_mv_spec"), planOf(f).take(800))
      assert(!planOf(f).contains("orders.parquet"), planOf(f).take(800))
      assert(rows(f) == fBase)
      // compound predicate over two group columns, still whole-group
      val in = agg(orders.filter(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus") =!= "P"), "o_orderstatus")
      assert(planOf(in).contains("graft_mv_spec"), planOf(in).take(800))
      assert(rows(in) == inBase)
    }
  }

  test("one plan matching twice gets fresh view instances (no duplicate exprIds)") {
    withView {
      val a = agg(orders, "o_orderstatus")
      val b = agg(orders, "o_orderstatus")
      val u = a.unionByName(b)
      // both legs rewritten, and the union analyzes + executes cleanly
      val p = planOf(u)
      assert("graft_mv_spec".r.findAllIn(p).length >= 2, p.take(1200))
      assert(u.count() == 2 * a.count())
    }
  }

  test("global count over an EMPTY registered base returns 0, not NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_empty").toString
    val empty = orders.filter(lit(false))
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
    empty.write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    IncrementalAgg.state(base, groups, sums)
      .write.parquet(s"$dir/view")
    MvRewrite.register(spark, s"$dir/base", s"$dir/view", groups,
      Map("o_totalprice" -> "sum_price"))
    try {
      val q = base.agg(count(lit(1)).as("n"))
      assert(planOf(q).contains(s"$dir/view"), planOf(q).take(800))
      assert(rows(q) == Set(Seq(0L)))
    } finally MvRewrite.deregister(s"$dir/base")
  }

  test("non-provable shapes stay on the base scan") {
    withView {
      // a filter on a NON-group column cannot push onto the view
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
      // a GROUP-column filter pushes onto the join view and fires
      val grpFiltered = q(cP.join(oP, col("k") === col("ok"))
        .filter(col("seg") === "BUILDING"))
      assert(planOf(grpFiltered).contains(s"$dir/view"),
        planOf(grpFiltered).take(800))
      // equality vs the real filtered join, computed after deregistration
      val grpExpected = q(cP.join(oP, col("k") === col("ok"))
        .filter(col("seg") === "BUILDING"))
      // a NON-group-column filter (fact measure) must refuse
      val measureFiltered = q(cP.join(oP, col("k") === col("ok"))
        .filter(col("o_totalprice") > 1000.0))
      assert(!planOf(measureFiltered).contains(s"$dir/view"),
        planOf(measureFiltered).take(800))
      // a join-KEY filter must refuse too (keys are not view columns)
      val keyFiltered = q(cP.join(oP, col("k") === col("ok"))
        .filter(col("k") > 100L))
      assert(!planOf(keyFiltered).contains(s"$dir/view"),
        planOf(keyFiltered).take(800))
      MvRewrite.deregisterJoin(s"$dir/c", s"$dir/o")
      assert(rows(grpFiltered) == rows(grpExpected))
      MvRewrite.registerJoin(spark, s"$dir/c", s"$dir/o",
        Seq("k" -> "ok"), s"$dir/view", Seq("seg", "o_orderstatus"),
        Map("o_totalprice" -> "sum_price"))
      MvRewrite.deregisterJoin(s"$dir/c", s"$dir/o")
      assert(rows(joined) == rows(expected))
    } finally MvRewrite.deregisterJoin(s"$dir/c", s"$dir/o")
  }

  test("versioned registry resolves the NEWEST committed version at match time") {
    import graft.operators.IncrementalAgg
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_ver").toString
    orders.select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    // registered BEFORE any version committed: queries stay on the base
    MvRewrite.registerVersioned(s"$dir/base", s"$dir/state", groups,
      Map("o_totalprice" -> "sum_price"))
    try {
      val q0 = agg(base, "o_orderstatus")
      assert(!planOf(q0).contains(s"$dir/state"), planOf(q0).take(800))
      // v=0 commits → the SAME query shape now reads v=0, no re-register
      IncrementalAgg.state(base, groups, sums)
        .write.parquet(s"$dir/state/v=0")
      val q1 = agg(base, "o_orderstatus")
      assert(planOf(q1).contains(s"$dir/state/v=0"), planOf(q1).take(800))
      val v0Rows = rows(q1)
      // a refresh commits v=1 (a delta dropped every F-status group row);
      // the next query must read v=1 — the r9 frozen-listing registry
      // would have stayed on v=0 until a manual re-register
      IncrementalAgg.state(base.filter(col("o_orderstatus") =!= "F"),
          groups, sums)
        .write.parquet(s"$dir/state/v=1")
      val q2 = agg(base, "o_orderstatus")
      assert(planOf(q2).contains(s"$dir/state/v=1"), planOf(q2).take(800))
      assert(!planOf(q2).contains(s"$dir/state/v=0"), planOf(q2).take(800))
      assert(rows(q2) == v0Rows.filter(_.head != "F"))
      // an UNCOMMITTED version (no _SUCCESS) is invisible: still v=1
      IncrementalAgg.state(base.filter(col("o_orderstatus") === "F"),
          groups, sums)
        .write.parquet(s"$dir/state/v=2")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/state/v=2/_SUCCESS"), false)
      val q3 = agg(base, "o_orderstatus")
      assert(planOf(q3).contains(s"$dir/state/v=1"), planOf(q3).take(800))
    } finally MvRewrite.deregister(s"$dir/base")
  }

  test("versioned JOIN registration flips to the stream's newest view version") {
    import graft.core.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft_mvj_ver").toString
    val c = Tables.customer(spark, SparkTestSession.sfDir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.orders(spark, SparkTestSession.sfDir)
      .select(col("o_custkey").as("ok"), col("o_orderstatus"),
        col("o_totalprice"))
    c.write.parquet(s"$dir/c"); o.write.parquet(s"$dir/o")
    val cP = spark.read.parquet(s"$dir/c")
    val oP = spark.read.parquet(s"$dir/o")
    MvRewrite.registerJoinVersioned(spark, s"$dir/c", s"$dir/o",
      Seq("k" -> "ok"), s"$dir/state", Seq("seg", "o_orderstatus"),
      Map("o_totalprice" -> "sum_price"))
    try {
      def q() = cP.join(oP, col("k") === col("ok"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          sum(OracleArith.dec2(col("o_totalprice"))).as("s"))
      // no committed version yet: the join executes on base
      assert(!planOf(q()).contains(s"$dir/state"))
      IncrementalAgg.state(cP.join(oP, col("k") === col("ok")),
          Seq("seg", "o_orderstatus"), sums)
        .write.parquet(s"$dir/state/v=0")
      assert(planOf(q()).contains(s"$dir/state/v=0"), planOf(q()).take(800))
      // a refresh lands v=1 (drop one segment): same registration flips
      IncrementalAgg.state(cP.filter(col("seg") =!= "BUILDING")
          .join(oP, col("k") === col("ok")),
          Seq("seg", "o_orderstatus"), sums)
        .write.parquet(s"$dir/state/v=1")
      val p = planOf(q())
      assert(p.contains(s"$dir/state/v=1") && !p.contains(s"$dir/state/v=0"),
        p.take(800))
      assert(!rows(q()).exists(_.head == "BUILDING"))
    } finally MvRewrite.deregisterJoin(s"$dir/c", s"$dir/o")
  }

  test("join rewrite refuses a group column whose name exists on BOTH sides") {
    import graft.core.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft_mvj_amb").toString
    // both sides carry a column literally named "seg": the left's is the
    // registered group column, the right's is a decoy with other values
    val c = Tables.customer(spark, SparkTestSession.sfDir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val o = Tables.orders(spark, SparkTestSession.sfDir)
      .select(col("o_custkey").as("ok"), col("o_orderstatus").as("seg"),
        col("o_totalprice"))
    c.write.parquet(s"$dir/c"); o.write.parquet(s"$dir/o")
    val cP = spark.read.parquet(s"$dir/c")
    val oP = spark.read.parquet(s"$dir/o")
    IncrementalAgg.state(
        cP.join(oP.withColumnRenamed("seg", "o_seg"), col("k") === col("ok")),
        Seq("seg"), sums)
      .write.parquet(s"$dir/view")
    MvRewrite.registerJoin(spark, s"$dir/c", s"$dir/o",
      Seq("k" -> "ok"), s"$dir/view", Seq("seg"),
      Map("o_totalprice" -> "sum_price"))
    try {
      // grouping by the RIGHT side's seg: name matches the registration,
      // values do not — the side check must refuse the rewrite
      val wrongSide = cP.join(oP, col("k") === col("ok"))
        .groupBy(oP("seg"))
        .agg(count(lit(1)).as("n"),
          sum(OracleArith.dec2(col("o_totalprice"))).as("s"))
      assert(!planOf(wrongSide).contains(s"$dir/view"),
        planOf(wrongSide).take(800))
      // the LEFT side's seg is the registered one, but the name is
      // ambiguous across sides — conservative refusal there too
      val leftSide = cP.join(oP.withColumnRenamed("seg", "o_seg"),
          col("k") === col("ok"))
        .groupBy(cP("seg"))
        .agg(count(lit(1)).as("n"),
          sum(OracleArith.dec2(col("o_totalprice"))).as("s"))
      assert(!planOf(leftSide).contains(s"$dir/view"),
        planOf(leftSide).take(800))
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
