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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and has a non-empty schema") {
      val df = fn(spark, SparkTestSession.sfDir)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
