package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankFusion

/** RRF arithmetic and fusion semantics on hand-built runs. */
class RankFusionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: (String, Long, Int)*) =
    rows.toDF("query_id", "item_id", "rank")

  test("fused score sums 1/(k+rank) across runs; absent runs contribute 0") {
    val a = run(("q", 1L, 1), ("q", 2L, 2))
    val b = run(("q", 2L, 1), ("q", 3L, 2))
    val got = RankFusion.rrf(Seq(a, b), k = 60, topK = 10)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    // item 2: in both runs (rank 2 and 1) — must win
    assert(math.abs(got(2L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(got(2L)._2 === 1)
    assert(math.abs(got(1L)._1 - 1.0 / 61) < 1e-15)
    assert(math.abs(got(3L)._1 - 1.0 / 62) < 1e-15)
    // equal single-run scores tie-break on item id: 1 (rank 1 in a) vs
    // 3 (rank 2 in b) — 1/61 > 1/62 so order is 2, 1, 3
    assert(got(1L)._2 === 2 && got(3L)._2 === 3)
  }

  test("topK bounds output per query; queries fuse independently") {
    val a = run((1 to 30).map(i => ("x", i.toLong, i)) ++
      Seq(("y", 100L, 1)): _*)
    val got = RankFusion.rrf(Seq(a), k = 60, topK = 5).collect()
    assert(got.count(_.getString(0) == "x") === 5)
    assert(got.count(_.getString(0) == "y") === 1)
  }
}
