package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Binned interval-overlap join: exact pair set vs brute force, no
  * duplicates from multi-bin overlaps, and bin-width invariance.
  */
class IntervalOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(a: Seq[(Long, Double, Double)], b: Seq[(Long, Double, Double)]) =
    (for {
      (ai, alo, ahi) <- a
      (bi, blo, bhi) <- b
      if alo < bhi && blo < ahi
    } yield (ai, bi)).toSet

  test("pair set equals brute force, exactly once per pair") {
    val rnd = new scala.util.Random(3)
    val a = (1L to 300L).map(i => (i, rnd.nextDouble() * 100, 0.0))
      .map { case (i, lo, _) => (i, lo, lo + rnd.nextDouble() * 10) }
    val b = (1L to 300L).map(i => (i, rnd.nextDouble() * 100, 0.0))
      .map { case (i, lo, _) => (i, lo, lo + rnd.nextDouble() * 10) }
    val got = RangeJoin.binnedIntervalOverlap(
      a.toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
      b.toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi", binWidth = 5.0)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == brute(a, b))
  }

  test("result is invariant to bin width") {
    val a = Seq((1L, 0.0, 50.0), (2L, 10.0, 12.0), (3L, 90.0, 91.0))
    val b = Seq((10L, 11.0, 95.0), (20L, 49.0, 60.0), (30L, 200.0, 201.0))
    val want = brute(a, b)
    Seq(1.0, 7.0, 100.0).foreach { w =>
      val got = RangeJoin.binnedIntervalOverlap(
        a.toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
        b.toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi", binWidth = w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dups at width $w")
      assert(got.toSet == want, s"wrong pairs at width $w")
    }
  }

  test("touching-but-not-overlapping half-open intervals do not match") {
    val a = Seq((1L, 0.0, 10.0)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 10.0, 20.0)).toDF("b_id", "b_lo", "b_hi")
    assert(RangeJoin.binnedIntervalOverlap(
      a, "a_lo", "a_hi", b, "b_lo", "b_hi", 5.0).count() == 0)
  }
}
