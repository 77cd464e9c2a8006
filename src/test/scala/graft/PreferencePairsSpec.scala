package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PreferencePairs

/** Mirror-pairing semantics: best-vs-worst by position, disjoint sides,
  * margin cutoff, deterministic under ties.
  */
class PreferencePairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // scores 10, 8, 5, 3, 1 → pairs (10,1), (8,3); middle 5 unpaired
  private lazy val docs = Seq(
    (1L, "g", 10.0), (2L, "g", 8.0), (3L, "g", 5.0),
    (4L, "g", 3.0), (5L, "g", 1.0)
  ).toDF("id", "grp", "score")

  test("i-th best pairs with i-th worst; middle element unpaired") {
    val got = PreferencePairs.pairByScore(docs, "id", "grp",
      col("score"), minMargin = 1.0)
      .orderBy("pos").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(6)))
    assert(got.toSeq === Seq((1L, 5L, 9.0), (2L, 4L, 5.0)))
  }

  test("margin cutoff drops low-contrast pairs") {
    val got = PreferencePairs.pairByScore(docs, "id", "grp",
      col("score"), minMargin = 6.0).collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1L))
  }

  test("no item appears on both sides, even with heavy ties") {
    val tied = (1L to 10L).map(i => (i, "g", if (i <= 5) 2.0 else 1.0))
      .toDF("id", "grp", "score")
    val got = PreferencePairs.pairByScore(tied, "id", "grp",
      col("score"), minMargin = 0.5).collect()
    val chosen = got.map(_.getLong(2)).toSet
    val rejected = got.map(_.getLong(3)).toSet
    assert(chosen.intersect(rejected).isEmpty)
    assert(got.length === 5)
    // deterministic under repartitioning
    val again = PreferencePairs.pairByScore(tied.repartition(7), "id", "grp",
      col("score"), minMargin = 0.5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(again.toSeq ===
      got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq)
  }

  test("groups pair independently") {
    val multi = Seq((1L, "a", 9.0), (2L, "a", 1.0), (3L, "b", 7.0),
      (4L, "b", 2.0)).toDF("id", "grp", "score")
    val got = PreferencePairs.pairByScore(multi, "id", "grp",
      col("score"), minMargin = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map("a" -> ((1L, 2L)), "b" -> ((3L, 4L))))
  }
}
