package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg

/** Incremental view maintenance: refresh-equals-recompute on a real
  * table with mixed insert/delete/update deltas, group disappearance at
  * count zero, and the dirty-group recompute path for min/max.
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val groups = Seq("o_orderstatus", "o_orderpriority")
  val sums = Seq("sum_price" -> "o_totalprice")
  lazy val orders = graft.core.Tables.orders(spark, SparkTestSession.sfDir)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long, java.math.BigDecimal)] =
    df.select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("sum_price").cast(graft.core.OracleArith.Dec))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).stripTrailingZeros)).toSet

  test("refresh over a mixed delta equals the full recompute exactly") {
    val base = IncrementalAgg.state(orders, groups, sums)
    val del = orders.filter(col("o_orderkey") % 11 === 0)
      .withColumn("op", lit("delete"))
    val upOld = orders.filter(col("o_orderkey") % 13 === 0 &&
        col("o_orderkey") % 11 =!= 0)
      .withColumn("op", lit("delete"))
    val upNew = upOld.withColumn("op", lit("insert"))
      .withColumn("o_totalprice", col("o_totalprice") + 500.0)
    val ins = orders.filter(col("o_orderkey") % 17 === 0)
      .withColumn("op", lit("insert"))
    val delta = del.unionByName(upOld).unionByName(upNew).unionByName(ins)
      .select((Seq("op") ++ groups ++ Seq("o_totalprice")).map(col): _*)
    val refreshed = IncrementalAgg.refresh(base,
      IncrementalAgg.deltaState(delta, "op", groups, sums),
      groups, Seq("sum_price"))
    val after = orders.filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 500.0)
          .otherwise(col("o_totalprice")))
      .unionByName(orders.filter(col("o_orderkey") % 17 === 0))
    assert(canon(refreshed) == canon(IncrementalAgg.state(after, groups, sums)))
  }

  test("a group deleted to zero rows leaves no tombstone") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val base = IncrementalAgg.state(df, Seq("g"), Seq("s" -> "v"))
    val delta = Seq(("delete", "a", 1.0), ("delete", "a", 2.0))
      .toDF("op", "g", "v")
    val out = IncrementalAgg.refresh(base,
      IncrementalAgg.deltaState(delta, "op", Seq("g"), Seq("s" -> "v")),
      Seq("g"), Seq("s"))
    assert(out.select("g").as[String].collect().toSeq == Seq("b"))
  }

  test("a delta-only group (no base row) appears through the full-outer side") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val base = IncrementalAgg.state(df, Seq("g"), Seq("s" -> "v"))
    val delta = Seq(("insert", "c", 7.0)).toDF("op", "g", "v")
    val out = IncrementalAgg.refresh(base,
      IncrementalAgg.deltaState(delta, "op", Seq("g"), Seq("s" -> "v")),
      Seq("g"), Seq("s"))
    assert(out.filter(col("g") === "c").select(col("n")).as[Long].head() == 1L)
  }

  test("min/max maintain via dirty-group recompute + patch") {
    val base = orders
    val stateMm = base.groupBy(groups.map(col): _*)
      .agg(min(col("o_totalprice")).as("min_p"), max(col("o_totalprice")).as("max_p"))
    // delete the cheapest orders — exactly the rows a scalar state cannot
    // subtract, forcing the recompute path to find the new minima
    val cut = base.select(percentile_approx(col("o_totalprice"), lit(0.05), lit(1000)))
      .head().getDouble(0)
    val delta = base.filter(col("o_totalprice") <= cut)
    val after = base.filter(col("o_totalprice") > cut)
    val dirty = IncrementalAgg.dirtyGroups(delta, groups)
    val recomputed = IncrementalAgg.recomputeGroups(after, dirty, groups,
      Seq(min(col("o_totalprice")).as("min_p"), max(col("o_totalprice")).as("max_p")))
    val patched = IncrementalAgg.patch(stateMm, recomputed, dirty, groups)
    val full = after.groupBy(groups.map(col): _*)
      .agg(min(col("o_totalprice")).as("min_p"), max(col("o_totalprice")).as("max_p"))
    def mm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(mm(patched) == mm(full))
    // and the recompute only touched dirty groups
    assert(recomputed.count() <= dirty.count())
  }
}
