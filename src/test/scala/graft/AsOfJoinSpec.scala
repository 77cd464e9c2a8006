package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.AsOfJoin

/** As-of join: composed (union+window) and native (custom SparkPlan) forms
  * must agree exactly; the native plan must shuffle-sort-merge.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val events = Tables.events(spark, SparkTestSession.sfDir).cache()
  lazy val purchases = events.filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts")
  lazy val views = events.filter(col("event_type") === "view")
    .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
    .agg(max("value").as("v_value"))

  lazy val composed = AsOfJoin.joinAsOf(
    purchases,
    views.select(col("v_user").as("user_id"), col("v_ts").as("ts"), col("v_value")),
    key = "user_id", leftTs = "ts", rightTs = "ts",
    rightValueCols = Seq("v_value"))
    .select(col("event_id"), col("asof_ts").as("v_ts"), col("asof_v_value").as("v_value"))

  lazy val native = AsOfJoin.joinAsOfNative(
    purchases, views, key = "user_id", leftTs = "ts",
    rightKey = "v_user", rightTs = "v_ts")
    .select("event_id", "v_ts", "v_value")

  test("native custom-plan as-of join equals the composed form") {
    assert(native.count() == purchases.count())
    assert(composed.exceptAll(native).count() == 0)
    assert(native.exceptAll(composed).count() == 0)
  }

  test("native plan is the custom exec with shuffle + sort children") {
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort"), plan)
  }

  test("a null value in the matched right row stays null (no older-row fallback)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 3000000L)).toDF("id", "k", "us")
      .select(col("id"), col("k"), org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"))
    val r = Seq((10L, 1000000L, Some(5.0)), (10L, 2000000L, None))
      .toDF("k", "us", "v")
      .select(col("k"), org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"), col("v"))
    val out = AsOfJoin.joinAsOf(l, r, "k", "ts", "ts", Seq("v")).head
    // the as-of match is the ts=2s row whose v is null — NOT the ts=1s value
    assert(out.getAs[java.sql.Timestamp]("asof_ts").toInstant.toEpochMilli == 2000L)
    assert(out.isNullAt(out.fieldIndex("asof_v")))
  }

  test("left rows with no prior right row are null-extended") {
    val firstPurchase = native.orderBy("event_id").head
    // event 2 (user 12) precedes any view for that user in this dataset
    assert(firstPurchase.isNullAt(1) && firstPurchase.isNullAt(2))
  }

  test("native merge handles null keys and timestamps (no NPE, SQL semantics)") {
    import spark.implicits._
    val l = Seq(
      (1L, Some(10L), Some(5000000L)), // normal row, has a match
      (2L, None, Some(5000000L)),      // null key → never matches
      (3L, Some(10L), None))           // null ts → never matches
      .toDF("id", "k", "us")
      .select(col("id"), col("k"),
        org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"))
    val r = Seq(
      (Some(10L), Some(1000000L), 1.0), // the match for id=1
      (None, Some(2000000L), 2.0),      // null key right row: discarded
      (Some(10L), None, 3.0))           // null ts right row: discarded
      .toDF("k", "us", "v")
      .select(col("k").as("rk"),
        org.apache.spark.sql.functions.timestamp_micros(col("us")).as("rts"),
        col("v"))
    val out = AsOfJoin.joinAsOfNative(l, r,
      key = "k", leftTs = "ts", rightKey = "rk", rightTs = "rts")
      .select("id", "rts", "v").collect().map(x => x.getLong(0) -> x).toMap
    assert(out.size == 3)
    assert(!out(1L).isNullAt(2) && out(1L).getDouble(2) == 1.0)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2))
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
  }
}
