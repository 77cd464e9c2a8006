package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Round-robin interleave contract: position p of every source precedes
  * position p+1 of any source; within a round sources order by name; the
  * whole order is deterministic at any partitioning.
  */
class InterleaveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed sources: a has 6 docs, b has 3, c has 1
  private lazy val docs = (
    (1L to 6L).map(i => (i, "a")) ++
    (7L to 9L).map(i => (i, "b")) ++
    Seq((10L, "c"))).toDF("doc_id", "source")

  private def ordered = Sampling.interleaveBySource(docs, "doc_id", "source")
    .select("doc_id", "source", "source_pos", "train_pos")
    .collect().sortBy(_.getLong(3))

  test("train order is (source_pos, source) and positions are 1..n") {
    val rows = ordered
    assert(rows.map(_.getLong(3)).toSeq === (1L to 10L))
    val key = rows.map(r => (r.getLong(2), r.getString(1)))
    assert(key.toSeq === key.sortBy(identity).toSeq)
    // first round is one doc of each source, in source-name order
    assert(rows.take(3).map(_.getString(1)).toSeq === Seq("a", "b", "c"))
    // exhausted sources drop out of later rounds
    assert(rows.drop(3).take(2).map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(rows.last.getString(1) === "a")
  }

  test("deterministic under repartitioning") {
    val a = ordered.map(r => (r.getLong(0), r.getLong(3))).toSeq
    val b = Sampling.interleaveBySource(docs.repartition(7), "doc_id", "source")
      .select("doc_id", "train_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
    assert(a === b)
  }
}
