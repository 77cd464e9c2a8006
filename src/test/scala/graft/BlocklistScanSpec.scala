package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BlocklistScan

class BlocklistScanSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def scanOne(text: String, patterns: Seq[String]): (Long, Long) = {
    val r = BlocklistScan.scan(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", patterns)
      .collect().head
    (r.getLong(1), r.getLong(2))
  }

  test("hand-checked counts: occurrences, distinct terms, misses") {
    assert(scanOne("the cat sat on the mat", Seq("cat", "mat", "dog"))
      == ((2L, 2L)))
    assert(scanOne("no matches here", Seq("xyz")) == ((0L, 0L)))
    assert(scanOne("abc abc abc", Seq("abc")) == ((3L, 1L)))
  }

  test("overlapping occurrences all count (one per end position)") {
    assert(scanOne("aaa", Seq("aa")) == ((2L, 1L)))
    assert(scanOne("a a a", Seq("a a")) == ((2L, 1L)))
    assert(scanOne("ababab", Seq("abab")) == ((2L, 1L)))
  }

  test("patterns that are substrings of each other all fire") {
    // "a", "ab", "abc" all end inside "abc": fail-chain totals must
    // collapse correctly
    assert(scanOne("abc", Seq("a", "ab", "abc")) == ((3L, 3L)))
    assert(scanOne("xabcx", Seq("b", "abc")) == ((2L, 2L)))
  }

  test("multi-byte UTF-8 patterns match on character boundaries") {
    assert(scanOne("café au lait, café", Seq("café")) == ((2L, 1L)))
    assert(scanOne("naïve", Seq("ï")) == ((1L, 1L)))
  }

  test("matches a naive position-scan on generated text") {
    val rnd = new scala.util.Random(3)
    val alphabet = "abcd "
    val patterns = Seq("ab", "bcd", "d a", "aa", "cc")
    (1 to 30).foreach { _ =>
      val text = Seq.fill(80)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val expHits = patterns.map { p =>
        (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
      }
      val exp = (expHits.sum, expHits.count(_ > 0).toLong)
      assert(scanOne(text, patterns) == exp, s"text [$text]")
    }
  }

  test("scan is a single zero-shuffle projection") {
    val plan = BlocklistScan.scan(
      Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
