package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.{Sampling, TfIdf}

/** Unit semantics of the corpus-layout operators beyond what the oracle
  * gates pin: TF-IDF scoring/tie-breaks on a hand corpus, shard determinism
  * under re-partitioning, and quantization edge cases.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tfidf ranks corpus-rare terms above common ones") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("doc_id", "text")
    val top1 = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id").collect()
    // doc1: apple tf=2 df=1 → 6.0 beats banana 1*3/2=1.5
    // doc2: banana and cherry tie at 1.5; term order picks banana
    assert(top1.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "apple"), (2L, "banana"), (3L, "cherry")))
    // doc3 ties: date 1*3/1 = 3.0 == cherry 2*3/2; "cherry" wins on term order
    val doc3 = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .filter($"doc_id" === 3).orderBy("term").collect()
    assert(doc3.map(_.getString(1)).toSeq == Seq("cherry", "date"))
    assert(doc3.map(_.getDouble(4)).toSeq == Seq(3.0, 3.0))
  }

  test("shards are contiguous per shard and stable under repartitioning") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select("doc_id", "text")
    val a = Sampling.shards(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "shard_pos")
    val rows = a.collect()
    assert(rows.map(_.getInt(1)).forall(s => s >= 0 && s < 4))
    // positions are exactly 1..n within each shard (dense, no gaps/dupes)
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // identical assignment and order regardless of input partitioning
    val b = Sampling.shards(docs.repartition(13), "doc_id", nShards = 4)
      .select("doc_id", "shard", "shard_pos").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq)
  }

  test("curriculum ranks are dense and buckets cover 1..n") {
    val docs = (1L to 17L).map(i => (i, i * 3 % 17)).toDF("doc_id", "difficulty")
    val b = graft.operators.Curriculum
      .buckets(docs, Seq("difficulty", "doc_id"), n = 4).collect()
    assert(b.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 17L).toSeq)
    assert(b.map(_.getAs[Long]("bucket")).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // rank order matches the difficulty order
    val byRank = b.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("difficulty"))
    assert(byRank.toSeq == byRank.sorted.toSeq)
    // single-row corpus: pct_rank defined as 0, no divide-by-zero
    val one = graft.operators.Curriculum
      .buckets(Seq((1L, 5L)).toDF("doc_id", "difficulty"),
        Seq("difficulty", "doc_id"), n = 4).collect()
    assert(one.head.getAs[Double]("pct_rank") == 0.0)
  }

  test("quantizeU8 maps range endpoints to 0/255 and constants to zeros") {
    val df = Seq(
      (1L, Array(0.0f, 1.0f, 0.5f)),
      (2L, Array(2.0f, 2.0f, 2.0f)),
      (3L, Array(-4.0f, 4.0f, 0.0f))).toDF("id", "vec")
      .select(col("id"),
        VectorFunctions.quantizeU8(
          col("vec"), array_min(col("vec")), array_max(col("vec"))).as("q"))
      .orderBy("id")
    val got = df.collect().map(_.getAs[scala.collection.Seq[Int]]("q").toSeq)
    assert(got(0) == Seq(0, 255, 127))   // floor(0.5 * 255) = 127
    assert(got(1) == Seq(0, 0, 0))       // constant vector
    assert(got(2) == Seq(0, 255, 127))   // midpoint of [-4, 4]
  }
}
