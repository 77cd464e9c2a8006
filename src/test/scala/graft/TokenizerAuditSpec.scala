package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TokenizerAudit

/** Fertility arithmetic on hand-built docs: subword proxy counts, exact
  * integer sums, NULL ratios on empty slices.
  */
class TokenizerAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    // "ab-cd ef" → words 2; subwords: ab, cd, ef runs + '-' = 4; bytes 8
    ("en", "ab-cd ef"),
    // "x,y" → words 1; subwords x, y, ',' = 3; bytes 3
    ("en", "x,y"),
    // whitespace-only → 0 words, 0 subwords, 2 bytes
    ("de", " \t")
  ).toDF("lang", "text")

  private lazy val got =
    TokenizerAudit.fertility(docs, Seq("lang"), "text")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap

  test("sums words, subword proxy, and bytes exactly") {
    val en = got("en")
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(en.getAs[Long]("words") === 3L)
    assert(en.getAs[Long]("subwords") === 7L)
    assert(en.getAs[Long]("bytes") === 11L)
    assert(en.getAs[Double]("fertility") === 7.0 / 3.0)
    assert(en.getAs[Double]("bytes_per_subword") === 11.0 / 7.0)
  }

  test("a slice with no tokens reports NULL ratios, not an error") {
    val de = got("de")
    assert(de.getAs[Long]("words") === 0L)
    assert(de.isNullAt(de.fieldIndex("fertility")))
    assert(de.isNullAt(de.fieldIndex("bytes_per_subword")))
  }
}
