package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Blocked edit-distance join semantics: distance bounds, block isolation,
  * and the length-band prefilter's soundness.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val df = Seq(
    (1L, "widget", "A"), (2L, "widgit", "A"), (3L, "widget", "A"),
    (4L, "gadget", "A"), (5L, "widget", "B"), (6L, "completely other", "A"))
    .toDF("id", "name", "blk")

  test("pairs respect [minDist, maxDist] and block boundaries") {
    val got = FuzzyJoin.blockedPairs(df, "id", "name", Seq("blk"), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // widget~widgit dist 1; widget~gadget dist 2; widgit~gadget dist 3 (out);
    // exact dup (1,3) excluded by minDist=1; cross-block (5,*) excluded;
    // "completely other" outside the length band and distance bound
    assert(got == Set((1L, 2L, 1), (2L, 3L, 1), (1L, 4L, 2), (3L, 4L, 2)))
  }

  test("minDist = 0 admits exact duplicates") {
    val got = FuzzyJoin.blockedPairs(df, "id", "name", Seq("blk"),
      maxDist = 0, minDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
  }

  test("length band never drops a true match (dist <= maxDist)") {
    // brute-force check on a small block: every pair within maxDist survives
    val words = Seq("alpha", "alpah", "alphas", "alp", "beta", "betas", "bet")
    val d2 = words.zipWithIndex.map { case (w, i) => (i.toLong, w, "X") }
      .toDF("id", "name", "blk")
    val got = FuzzyJoin.blockedPairs(d2, "id", "name", Seq("blk"), maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      i <- words.indices; j <- words.indices if i < j
      d = lev(words(i), words(j)) if d >= 1 && d <= 2
    } yield (i.toLong, j.toLong)).toSet
    assert(got == want)
  }
}
