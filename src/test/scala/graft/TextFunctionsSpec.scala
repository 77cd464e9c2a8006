package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Unit semantics of the text Column functions not already pinned by the
  * oracle gate (subword counting, punctuation ratio, language-ID edges,
  * shingles on short inputs).
  */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head.getAs[T]("r")

  test("subwordCount splits alphanumeric runs and punctuation") {
    // "don't stop" → don / ' / t / stop
    assert(one[Int](subwordCount(col("t")), "don't stop") == 4)
    assert(one[Int](subwordCount(col("t")), "abc123") == 1)
    assert(one[Int](subwordCount(col("t")), "a-b.c") == 5)
  }

  test("punctRatio counts sentence punctuation over length") {
    assert(one[Double](punctRatio(col("t")), "ab.,") == 0.5)
    assert(one[Double](punctRatio(col("t")), "abcd") == 0.0)
  }

  test("languageId falls back to 'und' and breaks ties by profile order") {
    val profiles = Seq("en" -> Seq("the"), "de" -> Seq("der"))
    assert(one[String](languageId(col("t"), profiles), "xyz qqq") == "und")
    assert(one[String](languageId(col("t"), profiles), "the der") == "en")
    assert(one[String](languageId(col("t"), profiles), "der der the") == "de")
  }

  test("shingles of short texts are empty, not errors") {
    assert(one[scala.collection.Seq[String]](shingles(col("t"), 3), "a b").isEmpty)
    assert(one[scala.collection.Seq[String]](shingles(col("t"), 3), "a b c")
      .toSeq == Seq("a b c"))
  }

  test("fingerprint is case/punctuation/whitespace insensitive") {
    val a = one[String](fingerprint(col("t")), "Hello,  World!")
    val b = one[String](fingerprint(col("t")), "hello world")
    assert(a == b)
    assert(a != one[String](fingerprint(col("t")), "hello there"))
  }
}
