package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Projections, RetrievalEval, Similarity}

class RetrievalEvalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("hand-checked recall and reciprocal rank") {
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
    // q1: finds 10 (at rank 2) and 12; q2: misses the top-1, finds 21 only
    val approx = ranked((1L, 99L, 1), (1L, 10L, 2), (1L, 12L, 3),
      (2L, 21L, 1), (2L, 98L, 2), (2L, 97L, 3))
    val got = RetrievalEval.compare(truth, approx, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 2.0 / 3.0, 0.5)))
    assert(got(2L) == ((1L, 1.0 / 3.0, 0.0)))
  }

  test("a query whose shortlist is empty still gets a zero row") {
    val truth = ranked((1L, 10L, 1), (2L, 20L, 1))
    val approx = ranked((1L, 10L, 1))
    val got = RetrievalEval.compare(truth, approx, k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 1.0, 1.0)))
    assert(got(2L) == ((0L, 0.0, 0.0)))
  }

  test("identical rankings score perfect recall and rr") {
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2))
    val got = RetrievalEval.compare(truth, truth, k = 2).collect().head
    assert(got.getLong(1) == 2L && got.getDouble(2) == 1.0 && got.getDouble(3) == 1.0)
  }

  test("random-projection ANN keeps useful recall on a real corpus") {
    val rnd = new scala.util.Random(5)
    // clustered corpus: near-neighbors are real (iid gaussian would be the
    // JL worst case — all cosines near 0, nothing to recover)
    val centers = Seq.fill(30)(Seq.fill(64)(rnd.nextGaussian()))
    val vecs = Seq.tabulate(300)(v =>
      (v.toLong, centers(v % 30).map(c => (c + rnd.nextGaussian() * 0.2).toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)
    val truth = Similarity.knnBruteForce(corpus, queries, k = 5)
    val proj = Projections.randomProjection(corpus, "embedding", 64, 32)
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val approx = Similarity.knnBruteForce(
      proj, proj.filter(col("vec_id") < 10), k = 5)
    val recall = RetrievalEval.compare(truth, approx, k = 5)
      .agg(avg("recall")).collect().head.getDouble(0)
    // clustered data survives the 2x JL cut easily; chance is 5/299
    assert(recall > 0.6, s"mean recall $recall")
  }

  test("hand-checked nDCG: perfect ranking scores 1, misses discount by position") {
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
    // q1 ranks the truth set perfectly; q2 finds only 21, at rank 3
    val approx = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 99L, 1), (2L, 98L, 2), (2L, 21L, 3))
    val got = RetrievalEval.ndcg(truth, approx, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val d = RetrievalEval.discounts(3)
    val idcg = RetrievalEval.idcgConst(3)
    assert(math.abs(got(1L)._2 - 1.0) < 1e-12)
    assert(math.abs(got(2L)._1 - d(2)) < 1e-12)
    assert(math.abs(got(2L)._2 - d(2) / idcg) < 1e-12)
  }

  test("nDCG: a query with zero overlap gets an explicit 0 row") {
    val truth = ranked((1L, 10L, 1), (2L, 20L, 1))
    val approx = ranked((1L, 10L, 1), (2L, 99L, 1))
    val got = RetrievalEval.ndcg(truth, approx, k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 1.0 && got(2L) == 0.0)
  }

  test("nDCG is position-sensitive where recall is not") {
    // both shortlists contain the whole truth set; one ranks it on top,
    // the other buries it — recall ties at 1.0, nDCG must not
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2))
    val top = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3), (1L, 98L, 4))
    val buried = ranked((1L, 99L, 1), (1L, 98L, 2), (1L, 10L, 3), (1L, 11L, 4))
    def score(a: org.apache.spark.sql.DataFrame) =
      RetrievalEval.ndcg(truth.filter(col("rank") <= 4), a, k = 4)
        .collect().head.getDouble(2)
    assert(score(top) > score(buried))
    val rTop = RetrievalEval.compare(truth, top, k = 4).collect().head.getDouble(2)
    val rBuried = RetrievalEval.compare(truth, buried, k = 4).collect().head.getDouble(2)
    assert(rTop == rBuried)
  }

  test("rbo weights: suffix sums of p^(d-1)(1-p)/d, identical lists score Σw") {
    val w = RetrievalEval.rboWeights(3, 0.5)
    // terms: d=1: 0.5, d=2: 0.25/2=0.125, d=3: 0.125/3
    assert(math.abs(w(2) - 0.125 / 3.0) < 1e-15)
    assert(math.abs(w(1) - (0.125 + 0.125 / 3.0)) < 1e-15)
    assert(math.abs(w(0) - (0.5 + 0.125 + 0.125 / 3.0)) < 1e-15)
    // identical rankings: every item contributes w(its own rank) →
    // Σ_m w(m) = Σ_d p^(d-1)(1-p) (each depth's X_d = d cancels /d)
    val t = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val got = RetrievalEval.rbo(t, t, k = 3, p = 0.5)
      .collect().head.getDouble(1)
    assert(math.abs(got - (0.5 + 0.25 + 0.125)) < 1e-12)
  }

  test("rbo: hand-checked partial overlap, zero-overlap query gets 0 row") {
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
    // q1: item 10 at (1,2) → w(2); item 11 missed. q2: no overlap.
    val approx = ranked((1L, 99L, 1), (1L, 10L, 2), (2L, 98L, 1), (2L, 97L, 2))
    val w = RetrievalEval.rboWeights(2, 0.9)
    val got = RetrievalEval.rbo(truth, approx, k = 2, p = 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - w(1)) < 1e-15)
    assert(got(2L) === 0.0)
  }

  test("rbo output keys on the UNION of query sets — approx-only queries score 0.0") {
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2))
    // query 7 exists only in the approx ranking: symmetric RBO must surface
    // it (zero overlap with the absent truth list), not silently drop it
    val approx = ranked((1L, 10L, 1), (1L, 11L, 2), (7L, 50L, 1), (7L, 51L, 2))
    val got = RetrievalEval.rbo(truth, approx, k = 2, p = 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set(1L, 7L))
    assert(got(7L) === 0.0)
  }

  test("rbo is top-weighted: agreement at rank 1 beats agreement at rank k") {
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val topAgree = ranked((1L, 10L, 1), (1L, 98L, 2), (1L, 99L, 3))
    val tailAgree = ranked((1L, 98L, 1), (1L, 99L, 2), (1L, 12L, 3))
    def score(a: org.apache.spark.sql.DataFrame) =
      RetrievalEval.rbo(truth, a, k = 3, p = 0.9).collect().head.getDouble(1)
    assert(score(topAgree) > score(tailAgree))
  }
}
