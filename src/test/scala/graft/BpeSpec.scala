package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("golden merges on the classic low/lower/lowest corpus") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val model = Bpe.trainOn(docs, "text", numMerges = 4)
    // (l,o) ties (o,w) at 5 -> lexicographic; then (lo,w)=5, (low,e)=2,
    // then a 3-way tie at 1 -> (lowe,r)
    assert(model.merges == Seq(("l", "o"), ("lo", "w"), ("low", "e"),
      ("lowe", "r")))
  }

  test("encoding applies merges bottom-up; unknown tails stay chars") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val model = Bpe.trainOn(docs, "text", numMerges = 4)
    val got = Bpe.encode(
      Seq((1L, "lowest low"), (2L, "wow")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("lowe", "s", "t", "low"))
    assert(got(2L) == Seq("w", "o", "w")) // (l,o) never fires without l
  }

  test("subwords always concatenate back to the original words") {
    val docs = Seq(
      (1L, "abracadabra alakazam"),
      (2L, "banana bandana"),
      (3L, "a ab abc abcd")).toDF("doc_id", "text")
    val model = Bpe.trainOn(docs, "text", numMerges = 20)
    val enc = Bpe.encode(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = Map(
      1L -> "abracadabraalakazam", 2L -> "bananabandana", 3L -> "aababcabcd")
    expected.foreach { case (id, joined) =>
      assert(enc(id).mkString == joined, s"doc $id")
    }
  }

  test("more merges never increase the encoded length") {
    val docs = Seq((1L, "banana bandana cabana")).toDF("doc_id", "text")
    val lens = Seq(0, 2, 5, 10).map { nm =>
      val model = Bpe.trainOn(docs, "text", numMerges = nm)
      Bpe.encode(docs, "doc_id", "text", model)
        .select(size(col("subwords"))).as[Int].collect().head
    }
    assert(lens == lens.sorted.reverse, s"lengths $lens")
    assert(lens.head == "bananabandanacabana".length) // 0 merges = chars
  }

  test("training is deterministic across repartitionings") {
    val docs = (1L to 60L).map(i => (i, s"tok${i % 7} tok${i % 5} shared"))
      .toDF("doc_id", "text")
    val m1 = Bpe.trainOn(docs.repartition(13), "text", 15)
    val m2 = Bpe.trainOn(docs.repartition(3), "text", 15)
    assert(m1.merges == m2.merges)
  }

  test("multi-byte codepoints stay intact as base symbols") {
    val docs = Seq((1L, "naïve naïve café")).toDF("doc_id", "text")
    val model = Bpe.trainOn(docs, "text", numMerges = 0)
    val got = Bpe.encode(docs, "doc_id", "text", model)
      .collect().head.getSeq[String](1)
    assert(got.contains("ï") && got.contains("é"))
    assert(got.mkString == "naïvenaïvecafé")
  }

  test("encode is a single zero-shuffle projection") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val model = Bpe.Model(Seq(("x", "y")))
    val plan = Bpe.encode(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
