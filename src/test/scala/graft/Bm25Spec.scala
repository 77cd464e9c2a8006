package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** BM25 arithmetic on a hand-computable corpus + ranking sanity. */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 docs: "cat" in docs 1,2; doc 1 repeats it; doc 3 unrelated
  private lazy val docs = Seq(
    (1L, "cat cat cat sits"),
    (2L, "cat naps all day long here"),
    (3L, "dog runs far away")
  ).toDF("doc_id", "text")

  test("score matches the closed-form BM25 on a tiny corpus") {
    val got = Bm25.scoreTopK(docs, "doc_id", "text", Seq("q" -> "cat"),
      k1 = 1.2, b = 0.75, topK = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val n = 3.0
    val avgdl = (4.0 + 6.0 + 4.0) / 3.0
    val idf = math.log((n - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(got.keySet === Set(1L, 2L)) // doc 3 has no hit
    assert(math.abs(got(1L) - s(3.0, 4.0)) < 1e-12)
    assert(math.abs(got(2L) - s(1.0, 6.0)) < 1e-12)
    assert(got(1L) > got(2L)) // higher tf, shorter doc wins
  }

  test("multi-term queries sum per-term contributions; topK bounds output") {
    val got = Bm25.scoreTopK(docs, "doc_id", "text",
      Seq("q" -> "cat sits"), topK = 1).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 1L) // only doc 1 matches both terms
  }

  test("deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Bm25.scoreTopK(df, "doc_id", "text", Seq("q" -> "cat naps day"))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(docs) === run(docs.repartition(7)))
  }
}
