package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalDistinct

/** The maintained-KMV invariant: refresh(view, batch) must equal a
  * from-scratch rebuild of the post-delta base — exactly, not
  * approximately — for the merge path (insert-only groups), the
  * dirty-recompute path (delete-touched groups), and the structural
  * edges (new group arrives, group fully deleted).
  */
class IncrementalDistinctSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val K = 8 // small k so sketches saturate and estimates engage τ

  private def rows(df: DataFrame): Set[(String, Seq[Long])] = {
    import scala.jdk.CollectionConverters._
    df.collect().map(r =>
      (r.getString(0), r.getList[Long](1).asScala.toSeq)).toSet
  }

  test("refresh equals from-scratch rebuild across merge and dirty paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // base: 6 groups x up to 40 rows with duplicate keys (multiset)
    val base = Seq.tabulate(200)(i =>
      (s"g${rnd.nextInt(6)}", rnd.nextInt(60).toLong, i.toLong))
      .toDF("g", "key", "row_id")
    // inserts touch every group (incl. a brand-new g9); deletes hit g0/g1
    val inserts = Seq.tabulate(40)(i =>
      (if (i % 5 == 0) "g9" else s"g${rnd.nextInt(6)}",
        (100 + rnd.nextInt(30)).toLong, (1000 + i).toLong))
      .toDF("g", "key", "row_id")
    val deletes = base.filter($"g".isin("g0", "g1") && $"row_id" % 2 === 0)
    val after = base.exceptAll(deletes).unionByName(inserts)
    val view = IncrementalDistinct.state(base, "key", "g", K)
    val refreshed = IncrementalDistinct.refresh(view, after,
      inserts, deletes, "key", "g", K)
    val rebuilt = IncrementalDistinct.state(after, "key", "g", K)
    assert(rows(refreshed) == rows(rebuilt))
    // estimates agree too (same arrays, same arithmetic)
    val estR = IncrementalDistinct.estimates(refreshed, "g", K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val estB = IncrementalDistinct.estimates(rebuilt, "g", K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(estR == estB)
    // the new group arrived through the merge seam
    assert(rows(refreshed).exists(_._1 == "g9"))
  }

  test("a fully-deleted group drops out; exhaustive sketches count exact") {
    import spark.implicits._
    val base = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L), ("b", 8L))
      .toDF("g", "key")
    val view = IncrementalDistinct.state(base, "key", "g", K)
    val deletes = base.filter($"g" === "b")
    val after = base.exceptAll(deletes)
    val refreshed = IncrementalDistinct.refresh(view, after,
      inserts = base.limit(0), deletes = deletes, "key", "g", K)
    val est = IncrementalDistinct.estimates(refreshed, "g", K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // b is gone; a's sketch is exhaustive (2 distinct keys) → exact count
    assert(est.toSeq == Seq(("a", 2L, 2.0)))
  }
}
