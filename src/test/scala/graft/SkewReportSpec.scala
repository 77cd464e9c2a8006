package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewReport

/** Skew diagnostics: shares/ratios must reconcile with the raw counts, the
  * head must really be the head, and a constructed hot key must dominate
  * the report exactly as loaded.
  */
class SkewReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 1000 rows on key 0, 100 on key 1, 10 each on keys 2..11: known skew
  lazy val skewed = (
    Seq.fill(1000)(0L) ++ Seq.fill(100)(1L) ++
      (2L to 11L).flatMap(k => Seq.fill(10)(k))
  ).toDF("k")

  test("topKeys ranks the constructed hot key first with exact share") {
    val top = SkewReport.topKeys(skewed, "k", 3).orderBy("rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(top.head.getLong(2) == 1000L)
    val total = 1000 + 100 + 10 * 10
    assert(top.head.getDouble(3) == 1000.0 / total)
    // cumulative share is monotone and ends at head coverage
    val cums = top.map(_.getDouble(4)).toSeq
    assert(cums == cums.sorted)
    assert(math.abs(cums.last - (1000.0 + 100 + 10) / total) < 1e-12)
    // 12 keys, mean load total/12 → hot key's skew factor
    assert(top.head.getDouble(5) == 1000.0 * 12 / total)
  }

  test("summary reconciles with raw counts and flags the skew ratio") {
    val s = SkewReport.summary(skewed, "k").collect().head
    assert(s.getLong(0) == 1200L && s.getLong(1) == 12L && s.getLong(2) == 1000L)
    assert(s.getDouble(3) == 100.0)      // avg per key
    assert(s.getDouble(4) == 10.0)       // max/avg — well past AQE's 5x bar
    assert(s.getDouble(5) == 1000.0 / 1200.0)
  }

  test("null keys are profiled as a key, not dropped") {
    val withNulls = Seq(Some(1L), Some(1L), None, None, None).toDF("k")
    val top = SkewReport.topKeys(withNulls, "k", 2).orderBy("rank").collect()
    assert(top.head.isNullAt(1) && top.head.getLong(2) == 3L)
    val s = SkewReport.summary(withNulls, "k").collect().head
    assert(s.getLong(1) == 2L)
  }

  test("uniform keys report skew ratio 1") {
    val uniform = (0L until 100L).flatMap(k => Seq.fill(5)(k)).toDF("k")
    val s = SkewReport.summary(uniform, "k").collect().head
    assert(s.getDouble(4) == 1.0)
    val top = SkewReport.topKeys(uniform, "k", 5).collect()
    assert(top.forall(_.getDouble(5) == 1.0))
  }
}
