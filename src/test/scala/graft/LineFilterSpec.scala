package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineFilter

/** C4 line-filter rules, line-local semantics, empty-document handling. */
class LineFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(text: String, minWords: Int = 3,
      punct: Boolean = true): (String, Long, Long) = {
    val r = LineFilter.c4LineFilter(
      Seq((1L, text)).toDF("id", "text"), "text", minWords, punct).head()
    (r.getAs[String]("text"), r.getAs[Long]("n_lines"), r.getAs[Long]("kept_lines"))
  }

  test("keeps only lines with enough words, terminal punct, no blocked phrase") {
    val doc = Seq(
      "Short title",                          // no terminal punct
      "This line has five good words.",       // kept
      "Accept our cookie policy please now.", // blocked phrase
      "Is this a real question?",             // kept (question mark)
      "no").mkString("\n")                    // too short AND no punct
    val (text, n, kept) = run(doc)
    assert(n === 5L && kept === 2L)
    assert(text ===
      "This line has five good words.\nIs this a real question?")
  }

  test("terminal punctuation accepts . ! ? and closing quote, trailing spaces ok") {
    val doc = Seq(
      "An exclamation with enough words!",
      "A quoted ending with enough words\"",
      "Trailing spaces after the full stop.   ",
      "A colon ending with enough words:").mkString("\n")
    val (_, _, kept) = run(doc)
    assert(kept === 3L)
  }

  test("requireTerminalPunct=false drops the punctuation rule only") {
    val doc = "three good words here\nonly two\nbad cookie line today"
    val (text, n, kept) = run(doc, minWords = 3, punct = false)
    assert(n === 3L && kept === 1L)
    assert(text === "three good words here")
  }

  test("document with no surviving lines comes back empty, not dropped") {
    val (text, n, kept) = run("tiny\nalso tiny")
    assert(n === 2L && kept === 0L && text === "")
  }

  test("blocklist match is case-insensitive") {
    val (_, _, kept) = run("Enable JAVASCRIPT to view this page correctly.")
    assert(kept === 0L)
  }
}
