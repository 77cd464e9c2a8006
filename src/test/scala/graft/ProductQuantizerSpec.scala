package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.{ProductQuantizer, Similarity}
import graft.operators.ProductQuantizer.Codebooks

/** PQ arithmetic on hand-built codebooks (exact code/norm/ADC values), plus
  * train/encode/query behavior on the sf0.001 embeddings: determinism,
  * recall against the exact brute-force ranking, and distortion bounds.
  */
class ProductQuantizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of 2 dims, 2 codes per subspace
  private val cb = Codebooks(dim = 4, subDim = 2, codebooks = Array(
    Array(Array(1f, 0f), Array(0f, 1f)),   // subspace 0
    Array(Array(3f, 4f), Array(0f, 0f)))) // subspace 1 (norms 5, 0)

  test("encode picks the L2-nearest code per subspace and exact recon norm") {
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 3.1f, 3.9f)), // → codes (0, 0)
      (2L, Seq(0.2f, 0.8f, 0.1f, 0.1f))  // → codes (1, 1)
    ).toDF("vec_id", "embedding").select(col("vec_id"), col("embedding").cast("array<float>"))
    val out = ProductQuantizer.encode(df, cb)
      .select($"vec_id", $"pq_code", $"recon_norm")
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(out(0)._2 === Seq(0, 0))
    assert(out(1)._2 === Seq(1, 1))
    // recon of vec 1 = (1,0,3,4) → norm sqrt(1+25); vec 2 = (0,1,0,0) → 1
    assert(math.abs(out(0)._3 - math.sqrt(26.0)) < 1e-9)
    assert(math.abs(out(1)._3 - 1.0) < 1e-9)
  }

  test("ADC score equals the exact cosine against the reconstructed vector") {
    val corpus = Seq((1L, Seq(0.9f, 0.1f, 3.1f, 3.9f)))
      .toDF("vec_id", "embedding").select(col("vec_id"), col("embedding").cast("array<float>"))
    val query = Seq((7L, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding").select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = ProductQuantizer.queryAdc(ProductQuantizer.encode(corpus, cb), query, cb, k = 1)
      .select($"query_id", $"neighbor_id", $"cos_sim")
      .as[(Long, Long, Double)].head()
    // recon(corpus) = (1,0,3,4); dot(q, recon) = 1 + 0 + 9 + 16 = 26
    val expected = 26.0 / (math.sqrt(1.0 + 4 + 9 + 16) * math.sqrt(26.0))
    assert(got._1 === 7L && got._2 === 1L)
    assert(math.abs(got._3 - expected) < 1e-9)
  }

  test("training is deterministic and codebooks have the declared shape") {
    val corpus = Tables.embeddings(spark, SparkTestSession.sfDir)
    val a = ProductQuantizer.train(corpus, m = 8, kCodes = 16, iters = 2)
    val b = ProductQuantizer.train(corpus, m = 8, kCodes = 16, iters = 2)
    assert(a.m === 8 && a.subDim === 8 && a.dim === 64)
    assert(a.codebooks.forall(book => book.nonEmpty && book.length <= 16 &&
      book.forall(_.length === 8)))
    assert(a.codebooks.length === b.codebooks.length)
    a.codebooks.zip(b.codebooks).foreach { case (x, y) =>
      assert(x.length === y.length)
      x.zip(y).foreach { case (u, v) => assert(u.toSeq === v.toSeq) }
    }
  }

  test("PQ recall and distortion against exact brute-force ranking") {
    val corpus = Tables.embeddings(spark, SparkTestSession.sfDir)
    val queries = corpus.filter(col("vec_id") < 10)
    val k = 10
    val cb = ProductQuantizer.train(corpus, m = 8, kCodes = 64, iters = 4)
    val encoded = ProductQuantizer.encode(corpus, cb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val approx = ProductQuantizer.queryAdc(encoded, queries, cb, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.knnBruteForce(corpus, queries, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    // pure-ADC recall on near-isotropic synthetic embeddings is modest by
    // nature (cosines concentrate, ranking is quantization-sensitive); the
    // production path below recovers it via shortlist + exact re-rank
    assert(recall >= 0.25, s"PQ recall@$k = $recall")
    val rerank = ProductQuantizer.queryAdcRerank(encoded, queries, cb, k, shortlist = 50)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val rerankRecall = (rerank & exact).size.toDouble / exact.size
    assert(rerankRecall >= 0.6, s"PQ rerank recall@$k = $rerankRecall")
    assert(rerankRecall > recall, "re-ranking should not lose recall")
    // distortion: approximate cosine within 0.2 of exact for returned pairs
    val approxScores = ProductQuantizer.queryAdc(encoded, queries, cb, k)
      .select($"query_id", $"neighbor_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactByPair = Similarity.knnBruteForce(corpus, queries, corpus.count().toInt - 1)
      .select($"query_id", $"neighbor_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val errs = approxScores.flatMap(r => exactByPair.get((r._1, r._2)).map(e => math.abs(r._3 - e)))
    assert(errs.nonEmpty)
    val meanErr = errs.sum / errs.length
    assert(meanErr < 0.2, s"mean |cos_approx - cos_exact| = $meanErr")
    encoded.unpersist()
  }
}
