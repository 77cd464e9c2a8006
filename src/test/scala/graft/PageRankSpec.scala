package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** PageRank: mass conservation, known-graph structure, dangling rejection,
  * path equivalence, and ordered-path determinism.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ring graph stays uniform and conserves mass") {
    val n = 10L
    val ring = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val pr = PageRank.run(ring, "src", "dst", iters = 5).collect()
    val total = pr.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-9)
    pr.foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / n) < 1e-12))
  }

  test("star graph ranks the hub highest") {
    val star = (1L to 9L).flatMap(i => Seq((i, 0L), (0L, i))).toDF("src", "dst")
    val pr = PageRank.run(star, "src", "dst", iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 9L).forall(i => pr(0L) > pr(i) * 3))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("dangling nodes are rejected loudly") {
    val dangle = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 has no out
    val e = intercept[IllegalArgumentException] {
      PageRank.run(dangle, "src", "dst", iters = 1)
    }
    assert(e.getMessage.contains("dangling"))
  }

  test("symmetrize yields both directions, no self-loops, no dangling") {
    val pairs = Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 3L)).toDF("a", "b")
    // collect to a LIST, not a set: an input holding both orientations of
    // (1,2) must still emit each direction exactly ONCE — a multigraph
    // would inflate node 2's out-degree and misweight every neighbor
    val e = PageRank.symmetrize(pairs, "a", "b")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(e == Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    PageRank.run(PageRank.symmetrize(pairs, "a", "b"), "src", "dst", 2)
  }

  test("ordered and streaming sums agree to float tolerance") {
    val pairs = Seq.tabulate(200)(i => (i.toLong % 23, 100L + i % 7)).toDF("a", "b")
    val e = PageRank.symmetrize(pairs, "a", "b")
    val a = PageRank.run(e, "src", "dst", 3, ordered = true)
      .orderBy("node").collect().map(_.getDouble(1))
    val b = PageRank.run(e, "src", "dst", 3, ordered = false)
      .orderBy("node").collect().map(_.getDouble(1))
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
  }

  test("ordered path is bit-deterministic across partitionings") {
    val pairs = Seq.tabulate(300)(i => (i.toLong % 37, 1000L + i % 11)).toDF("a", "b")
    val e = PageRank.symmetrize(pairs, "a", "b")
    val a = PageRank.run(e, "src", "dst", 3, ordered = true)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    val b = PageRank.run(e.repartition(13), "src", "dst", 3, ordered = true)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }
}
