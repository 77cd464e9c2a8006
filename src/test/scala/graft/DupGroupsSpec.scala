package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupGroups

/** Connected-components closure semantics: chain propagation, component
  * isolation, the non-convergence guard, and the end-to-end near-dup
  * grouping/canonical-selection operators built on it.
  */
class DupGroupsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)], maxIter: Int = 25,
      maxDriverEdges: Long = 4000000L): Map[Long, Long] =
    DupGroups.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter,
        maxDriverEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // every closure test runs both physical strategies: driver union-find
  // (default threshold) and distributed label propagation. Forcing the
  // distributed path needs threshold -1: an EMPTY edge list has count 0,
  // and 0 <= 0 would silently route "forced distributed" back to the driver
  private def onBothPaths(edges: Seq[(Long, Long)], expect: Map[Long, Long]): Unit = {
    assert(components(edges) == expect, "driver union-find path")
    assert(components(edges, maxDriverEdges = -1L) == expect, "distributed path")
  }

  test("chain propagates the minimum label across the whole component") {
    // diameter-4 chain: takes multiple propagation rounds, not just the init
    onBothPaths(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels; edge direction is ignored") {
    onBothPaths(Seq((7L, 2L), (2L, 9L), (11L, 10L)),
      Map(2L -> 2L, 7L -> 2L, 9L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("non-convergence within maxIter fails loudly instead of returning a non-fixpoint") {
    val longChain = (1L to 8L).sliding(2).map(s => (s.head, s.last)).toSeq
    intercept[IllegalStateException] {
      components(longChain, maxIter = 1, maxDriverEdges = 0L)
    }
    // and the same graph converges with the default budget
    assert(components(longChain, maxDriverEdges = 0L).values.toSet == Set(1L))
  }

  test("nearDupGroups clusters transitively and dropNearDuplicates keeps canonicals") {
    // 10 and 20 are exact duplicates; 21 near-dups 20 (one word changed at
    // the end); 30 is unrelated → cluster {10, 20, 21} + singleton 30
    val docs = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (20L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (21L, "alpha bravo charlie delta echo foxtrot golf india"),
      (30L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val groups = DupGroups.nearDupGroups(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(10L -> 10L, 20L -> 10L, 21L -> 10L))
    val kept = DupGroups.dropNearDuplicates(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 30L))
  }

  test("empty edge list converges to an empty labeling (clean corpus)") {
    // the common no-near-duplicates case: zero pairs must yield zero groups,
    // not an NPE from a null label SUM
    onBothPaths(Seq.empty, Map.empty)
  }

  test("dropNearDuplicates keeps everything when nothing is similar") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo"),
      (2L, "one two three four five"),
      (3L, "red green blue yellow purple")
    ).toDF("doc_id", "text")
    val kept = DupGroups.dropNearDuplicates(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("deep lineage stays bounded: a long chain needs many rounds but constant-size plans") {
    // 40-vertex chain → ~20 propagation rounds; without per-round lineage
    // truncation the logical plan doubles per round (cur appears in both the
    // join and the union) and planning alone dominates — this is the shape
    // that timed out a full bench run before the localCheckpoint fix
    val longChain = (1L to 40L).sliding(2).map(s => (s.head, s.last)).toSeq
    val got = components(longChain, maxIter = 45, maxDriverEdges = 0L)
    assert(got.values.toSet == Set(1L) && got.size == 40)
  }

  test("distributed path at GATE scale: >1M generated edges cross the default ceiling") {
    // The size-adaptive switch must actually hand off past maxDriverEdges —
    // this runs the distributed min-label loop on a real >1M-edge graph with
    // the DEFAULT ceiling (no forcing), proving the fallback works where it
    // would engage in production, not just on toy forced graphs.
    // Graph: chains of 8 consecutive vertices (0-7, 8-15, …) over 1.3M
    // vertices → 1,137,499 edges, component label = v - v % 8, diameter 7
    // (well under maxIter).
    val nV = 1300000L
    val edges = spark.range(nV - 1).filter(col("id") % 8 =!= 7)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    assert(edges.count() > 1000000L, "graph must exceed the driver ceiling")
    val labels = DupGroups.connectedComponents(edges, "a", "b")
    assert(labels.count() == nV)
    val wrong = labels
      .filter(col("label") =!= col("vertex") - (col("vertex") % 8)).count()
    assert(wrong == 0L, s"$wrong vertices mislabeled by the distributed path")
  }

  test("embeddingDupGroups clusters by cosine within blocks") {
    // block 1: 1≈2 (identical direction), 3 orthogonal; block 2: 4≈5
    val vecs = Seq(
      (1L, Array(1f, 0f), 1), (2L, Array(2f, 0f), 1), (3L, Array(0f, 1f), 1),
      (4L, Array(0f, 3f), 2), (5L, Array(0f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = DupGroups.embeddingDupGroups(vecs, "label", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("canonicalPerGroup elects the best-scored member, ties to the smallest id") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "group_id")
    // group 1: doc 2 has the top score; group 7: score tie → doc 7 wins
    val docs = Seq((1L, 10), (2L, 50), (3L, 20), (7L, 30), (8L, 30), (9L, 99))
      .toDF("doc_id", "quality")
    val got = DupGroups.canonicalPerGroup(groups, docs, "doc_id", "quality")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      1L -> ((2L, false)), 2L -> ((2L, true)), 3L -> ((2L, false)),
      7L -> ((7L, true)), 8L -> ((7L, false))))
    // non-members (doc 9) never appear
    assert(got.size == 5)
  }
}
