package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Containment pairs (the asymmetric near-dup detector) and the
  * corpus-granular overlap report, on hand-countable trigram sets.
  */
class CorpusOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 2 is doc 1's prefix: every trigram of 2 is in 1 (containment 1.0)
  // but Jaccard is only 3/8; doc 3 is unrelated
  private val long = "one two three four five six seven eight nine ten"
  private val short = "one two three four five"
  private lazy val docs = Seq(
    (1L, long), (2L, short), (3L, "alpha beta gamma delta epsilon zeta")
  ).toDF("doc_id", "text")

  test("containment catches the subset pair Jaccard misses") {
    val pairs = TextDedup.ngramContainmentPairs(docs, "doc_id", "text",
      n = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    val r = pairs((1L, 2L))
    assert(r.getAs[Long]("inter") === 3L)      // trigrams of the prefix
    assert(r.getAs[Long]("sz_a") === 8L)
    assert(r.getAs[Long]("sz_b") === 3L)
    assert(math.abs(r.getAs[Double]("cont_b") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cont_a") - 3.0 / 8.0) < 1e-12)
    // and the same pair fails a symmetric Jaccard bar at the same level
    val jac = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.9)
    assert(jac.count() === 0L)
  }

  test("corpusOverlap: counts, containments, jaccard") {
    val r = TextDedup.corpusOverlap(
      docs.filter(col("doc_id") =!= 2), docs.filter(col("doc_id") === 2),
      "text", "text", n = 3).head()
    // a = docs 1+3: 8 + 4 = 12 distinct trigrams; b = doc 2: 3, all shared
    assert(r.getAs[Long]("grams_a") === 12L)
    assert(r.getAs[Long]("grams_b") === 3L)
    assert(r.getAs[Long]("shared") === 3L)
    assert(math.abs(r.getAs[Double]("cont_b_in_a") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cont_a_in_b") - 3.0 / 12.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("jaccard") - 3.0 / 12.0) < 1e-12)
  }

  test("disjoint corpora: zero shared, zero ratios") {
    val r = TextDedup.corpusOverlap(
      docs.filter(col("doc_id") === 1), docs.filter(col("doc_id") === 3),
      "text", "text", n = 3).head()
    assert(r.getAs[Long]("shared") === 0L)
    assert(r.getAs[Double]("jaccard") === 0.0)
  }
}
