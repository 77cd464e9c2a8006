package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.{SortedNeighborhood, TextDedup}

/** Sorted-neighborhood blocking: linear candidate bound, precision against
  * exact ground truth, and the compiled set-Jaccard kernel's arithmetic.
  */
class SortedNeighborhoodSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()

  test("LongSetJaccard matches array_intersect arithmetic") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = Seq(
      (Array(1L, 2L, 3L), Array(2L, 3L, 4L)),   // 2/4
      (Array(1L, 2L), Array(1L, 2L)),           // 1
      (Array(1L), Array(2L)),                   // 0
      (Array.empty[Long], Array.empty[Long]),   // both empty -> 0 by contract
      (Array.empty[Long], Array(1L)))           // 0
      .toDF("a", "b")
    val got = df.select(ColumnBridge.column(graft.expressions.LongSetJaccard(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
      .as("j")).as[Double].collect()
    assert(got.sameElements(Array(0.5, 1.0, 0.0, 0.0, 0.0)))
  }

  test("every SNM pair is a true near-dup pair (precision = 1 vs exact)") {
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      minJaccard = 0.5, maxDocFreq = 100000L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val snm = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text",
      sortCol = "text", window = 4, n = 3, minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(snm.nonEmpty, "SNM found no pairs on a corpus with planted dups")
    assert(snm.length == snm.toSet.size, "duplicate pairs emitted")
    assert(snm.forall(exact), "SNM emitted a pair exact Jaccard rejects")
  }

  test("candidate count is exactly window × N regardless of content") {
    // all-identical corpus: shingle-join blocking degenerates quadratically,
    // SNM stays linear — count candidate pairs via minJaccard = 0
    val clones = spark.range(200).select(col("id").as("doc_id"), lit("x y z w v u").as("text"))
    val pairs = SortedNeighborhood.nearDupPairs(clones, "doc_id", "text",
      sortCol = "text", window = 3, n = 3, minJaccard = 0.0)
    // ranks 1..200, window 3: pairs = 3*200 - (1+2+3) = 594
    assert(pairs.count() == 594)
  }
}
