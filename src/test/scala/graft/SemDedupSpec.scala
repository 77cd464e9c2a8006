package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.DupGroups

/** Composed dedup paths (SemDeDup k-means blocking, MinHash sketch closure)
  * against their exact counterparts on the sf0.001 tables.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("semanticDupGroups recovers most exact-closure members; dedup keeps canonicals") {
    val vecs = Tables.embeddings(spark, SparkTestSession.sfDir).cache()
    // exact ground truth: all-pairs closure via a constant block column
    val exact = DupGroups.embeddingDupGroups(
      vecs.withColumn("blk", lit(1)), "blk", threshold = 0.3)
      .as[(Long, Long)].collect().toMap
    val got = DupGroups.semanticDupGroups(vecs, kCells = 4, threshold = 0.3)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "threshold should produce some semantic dups")
    // blocked closure can only miss cross-cell pairs, never invent members
    assert(got.keySet.subsetOf(exact.keySet))
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall over ${exact.size} members")

    val kept = DupGroups.semanticDedup(vecs, kCells = 4, threshold = 0.3)
    // every cluster's canonical survives; every flagged loser is gone
    val losers = got.filter { case (v, g) => v != g }.keySet
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    assert(losers.forall(!keptIds.contains(_)))
    assert(keptIds.size.toLong === vecs.count() - losers.size)
  }

  test("dedupIncrementNear: cross-snapshot dupes drop, survivors self-dedup, short docs live") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // identical to corpus doc 1 → est-Jaccard 1.0, must drop
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // near-copy of corpus doc 2 (one word appended) → high overlap, drops
      (11L, "one two three four five six seven eight nine ten eleven"),
      // novel content, two in-batch near-copies: lowest id survives
      (12L, "red orange yellow green blue indigo violet pink brown black"),
      (13L, "red orange yellow green blue indigo violet pink brown white"),
      // novel and unique
      (14L, "do re mi fa sol la ti octave scale note melody"),
      // too short to shingle at n=3 with k signatures — always survives
      (15L, "tiny doc")).toDF("doc_id", "text")
    val kept = DupGroups.dedupIncrementNear(
      batch, corpus, "doc_id", "text", n = 3, k = 128, bands = 32,
      minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(12L, 14L, 15L))
    // empty corpus (first snapshot): pure in-batch near-dedup
    val first = DupGroups.dedupIncrementNear(
      batch, corpus.filter(lit(false)), "doc_id", "text", n = 3, k = 128,
      bands = 32, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(first === Set(10L, 11L, 12L, 14L, 15L))
  }

  test("minHashDupGroups matches the exact n-gram closure with high recall") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()
    val exact = DupGroups.nearDupGroups(
      docs, "doc_id", "text", n = 3, minJaccard = 0.5, maxDocFreq = 100000L)
      .as[(Long, Long)].collect().toMap
    val got = DupGroups.minHashDupGroups(
      docs, "doc_id", "text", n = 3, k = 128, bands = 32, minJaccard = 0.45)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty)
    val recall = exact.keySet.count(got.contains).toDouble / exact.size
    assert(recall >= 0.9, s"member recall $recall over ${exact.size}")
    // estimated-Jaccard verification keeps the sketch path honest: no
    // more than a small multiple of the exact membership
    assert(got.size <= exact.size * 2)
  }
}
