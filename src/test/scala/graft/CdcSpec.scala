package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** CDC apply semantics on a hand-countable log: latest change per key
  * wins, deletes remove, revives restore, untouched keys pass through.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "bal")

  private lazy val changes = Seq(
    (2L, 1L, "U", "b2", 21.0),   // update
    (3L, 1L, "D", "c", 30.0),    // delete
    (4L, 1L, "D", "d", 40.0),    // delete...
    (4L, 2L, "I", "d2", 41.0),   // ...then revive (latest wins)
    (5L, 1L, "I", "e", 50.0),    // fresh insert
    (2L, 2L, "U", "b3", 22.0)    // later update supersedes
  ).toDF("k", "seq", "op", "name", "bal")

  test("latest change per key wins; deletes drop; untouched pass through") {
    val got = Cdc.applyChanges(base, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(got === Map(
      1L -> ("a", 10.0),    // untouched
      2L -> ("b3", 22.0),   // seq 2 update
      4L -> ("d2", 41.0),   // delete then revive
      5L -> ("e", 50.0)))   // insert; 3 deleted
  }

  test("idempotent: re-applying the same log changes nothing") {
    val once = Cdc.applyChanges(base, changes, Seq("k"))
    val twice = Cdc.applyChanges(once, changes, Seq("k"))
    assert(once.orderBy("k").collect().toSeq ===
      twice.orderBy("k").collect().toSeq)
  }

  test("base carrying op/seq columns is rejected loudly") {
    val bad = base.withColumnRenamed("name", "op")
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(bad, changes, Seq("k"))
    }
  }
}
