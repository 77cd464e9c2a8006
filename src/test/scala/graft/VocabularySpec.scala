package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Vocabulary

/** Vocabulary id stability, encode round-trip fidelity, and OOV handling. */
class VocabularySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()

  test("ids are dense 1..V, most-frequent term is id 1") {
    val dict = Vocabulary.dictionary(docs, "text")
      .as[(String, Long, Long)].collect()
    val v = dict.length
    assert(dict.map(_._3).sorted.sameElements(1L to v))
    val byFreq = dict.sortBy { case (t, f, _) => (-f, t) }
    assert(byFreq.head._3 == 1L && byFreq.last._3 == v.toLong)
  }

  test("ids are stable under repartitioning") {
    val a = Vocabulary.dictionary(docs, "text")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val b = Vocabulary.dictionary(docs.repartition(17), "text")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("encode covers every token in order; decode round-trips a document") {
    val dict = Vocabulary.dictionary(docs, "text").cache()
    val doc0 = docs.filter(col("doc_id") === 7).select("text").as[String].head()
    val want = doc0.trim.split("\\s+").toSeq
    val enc = Vocabulary.encode(docs.filter(col("doc_id") === 7), "doc_id", "text", dict)
      .orderBy("pos")
    val got = enc.select("term").as[String].collect().toSeq
    assert(got == want)
    // decode via the dictionary inverse gives the original tokens
    val decoded = enc.join(dict.withColumnRenamed("term", "dterm"), "vid")
      .orderBy("pos").select("dterm").as[String].collect().toSeq
    assert(decoded == want)
  }

  test("frozen vocab marks unseen terms as OOV id 0") {
    val dict = Vocabulary.dictionary(docs, "text")
    val fresh = Seq((9999L, "zzz_never_seen the a")).toDF("doc_id", "text")
    val enc = Vocabulary.encode(fresh, "doc_id", "text", dict)
      .orderBy("pos").select("term", "vid").as[(String, Long)].collect()
    assert(enc.head._1 == "zzz_never_seen" && enc.head._2 == 0L)
    assert(enc.drop(1).forall(_._2 > 0L))
  }

  test("coveragePrune keeps the minimal covering prefix") {
    // masses: a=6, b=3, c=2, d=1 (total 12)
    val corpus = Seq((1L, "a a a a a a b b b c c d")).toDF("doc_id", "text")
    def kept(cov: Double) =
      Vocabulary.coveragePrune(corpus, "text", cov)
        .orderBy("vid").collect()
        .map(r => (r.getAs[String]("term"), r.getAs[Long]("cum_tokens")))
    // 50% of 12 = 6: {a} alone reaches it
    assert(kept(0.5).map(_._1).toSeq === Seq("a"))
    // 58%: a alone (6) is short of 6.96 — b joins (9 covers)
    assert(kept(0.58).map(_._1).toSeq === Seq("a", "b"))
    // full coverage keeps everything, cumulative is exact
    assert(kept(1.0).toSeq ===
      Seq(("a", 6L), ("b", 9L), ("c", 11L), ("d", 12L)))
    // cum_frac of the last kept term at full coverage is exactly 1.0
    val full = Vocabulary.coveragePrune(corpus, "text", 1.0)
      .orderBy(org.apache.spark.sql.functions.desc("vid")).head()
    assert(full.getAs[Double]("cum_frac") === 1.0)
  }
}
