package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and produces a sane frame; the
  * exact-value gate is the driver's DuckDB comparison (tools/check_local.py
  * locally) — this suite catches runtime regressions fast.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q15's from_json path agrees with the get_json_object path form") {
    // q15 ships the schema'd from_json parse (one Jackson pass); the JSON-path
    // extraction must stay semantically interchangeable on this surface
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.events(spark, SparkTestSession.sfDir)
    val structK = events.withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
    val pathK = events.withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
    assert(structK.exceptAll(pathK).isEmpty && pathK.exceptAll(structK).isEmpty)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and has a non-empty schema") {
      val df = fn(spark, SparkTestSession.sfDir)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
