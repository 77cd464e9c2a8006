package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotDiff

/** Snapshot-diff classification semantics, including null payloads and
  * multi-column keys.
  */
class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("added/removed/changed/unchanged classification") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("k"), Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("null payloads compare null-safely") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("y")))
      .toDF("k", "s")
    val got = SnapshotDiff.diff(old, neu, Seq("k"), Seq("s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("composite keys join correctly") {
    val old = Seq(("x", 1, 1.0), ("x", 2, 2.0)).toDF("a", "b", "v")
    val neu = Seq(("x", 1, 1.0), ("y", 2, 2.0)).toDF("a", "b", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("a", "b"), Seq("v"))
      .select(concat_ws("/", col("a"), col("b")), col("change_type"))
      .as[(String, String)].collect().toMap
    assert(got == Map("x/1" -> "unchanged", "x/2" -> "removed", "y/2" -> "added"))
  }
}
