package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusCard

/** Data-card semantics on a hand fixture: corpus-wide (cross-source) dup
  * accounting, majority-language tie-breaking, exact ratio arithmetic.
  */
class CorpusCardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // srcA: two docs, one duplicated INTO srcB (cross-source copy), langs en/de
  // srcB: two docs, one the copy of A's, langs en/en
  private val longText = ("w " * 40).trim // 79 chars — inside the [50,5000] band
  lazy val docs = Seq(
    (1L, longText, "en", "srcA"),
    (2L, "Shared Body!", "de", "srcA"),  // normalizes equal to doc 4
    (3L, longText + " extra", "en", "srcB"),
    (4L, "shared body", "en", "srcB")
  ).toDF("doc_id", "text", "lang", "source")

  test("report computes per-source volume, dup exposure and language mode") {
    val out = CorpusCard.report(docs, "doc_id", "text", "lang", "source")
      .orderBy("source")
      .as[(String, Long, Long, Double, Long, String, Double, Double)]
      .collect()
    val a = out(0)
    assert(a._1 === "srcA" && a._2 === 2L)
    assert(a._3 === 42L && a._4 === 21.0)    // 40 + 2 tokens
    assert(a._5 === 2L)                      // en, de
    // lang tie (1 en, 1 de) breaks lexicographically → de
    assert(a._6 === "de")
    assert(a._7 === 0.5)                     // doc 2 duplicated corpus-wide
    assert(a._8 === 0.5)                     // only longText in the band
    val b = out(1)
    assert(b._1 === "srcB" && b._7 === 0.5 && b._6 === "en")
  }

  test("dup rate is corpus-wide: isolated sources show their cross copies") {
    // removing srcB's copy zeroes srcA's dup rate too
    val pruned = docs.filter($"doc_id" =!= 4L)
    val rates = CorpusCard.report(pruned, "doc_id", "text", "lang", "source")
      .select($"source", $"dup_doc_rate").as[(String, Double)].collect().toMap
    assert(rates("srcA") === 0.0 && rates("srcB") === 0.0)
  }
}
