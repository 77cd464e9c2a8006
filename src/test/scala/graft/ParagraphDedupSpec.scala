package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParagraphDedup

/** Paragraph-granular dedup contract: keep-first semantics across
  * documents, boilerplate thresholds, rebuild fidelity (positions, empty
  * collapse, literal separators), and the every-row-survives guarantee.
  */
class ParagraphDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rows: (Int, String)*) =
    rows.toSeq.toDF("id", "text")

  test("duplicate paragraph keeps only the lexicographically-first occurrence") {
    val df = corpus(
      1 -> "HEADER\nalpha body\nFOOTER",
      2 -> "HEADER\nbeta body\nFOOTER",
      3 -> "HEADER\ngamma body\nFOOTER")
    val out = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "\n")
      .orderBy("id").select("text", "kept_paras").as[(String, Long)].collect()
    assert(out(0) === (("HEADER\nalpha body\nFOOTER", 3L)))
    assert(out(1) === (("beta body", 1L)))
    assert(out(2) === (("gamma body", 1L)))
  }

  test("keep-first prefers the lowest position within the lowest document") {
    // doc 1 holds the dup twice: position 0 is canonical, position 2 dropped
    val df = corpus(1 -> "X\nmid\nX", 2 -> "X\nother")
    val out = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "\n")
      .orderBy("id").select("text").as[String].collect()
    assert(out(0) === "X\nmid")
    assert(out(1) === "other")
  }

  test("a document reduced to nothing survives with empty text, not dropped") {
    val df = corpus(1 -> "only", 2 -> "only")
    val out = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "\n")
      .orderBy("id").select("text", "kept_paras").as[(String, Long)].collect()
    assert(out(0) === (("only", 1L)))
    assert(out(1) === (("", 0L)))
  }

  test("minDocFreq raises the bar: rarer duplicates are left alone") {
    val df = corpus(
      1 -> "common\nrare",
      2 -> "common\nrare",
      3 -> "common")
    val out = ParagraphDedup
      .dropDuplicateParagraphs(df, "id", "text", "\n", minDocFreq = 3)
      .orderBy("id").select("text").as[String].collect()
    // "common" (df=3) deduped; "rare" (df=2) untouched in both docs
    assert(out === Array("common\nrare", "rare", ""))
  }

  test("dropAll removes every copy, first occurrence included") {
    val df = corpus(1 -> "chrome\nbody one", 2 -> "chrome\nbody two")
    val out = ParagraphDedup
      .dropDuplicateParagraphs(df, "id", "text", "\n", dropAll = true)
      .orderBy("id").select("text").as[String].collect()
    assert(out === Array("body one", "body two"))
  }

  test("within-document repeats below minDocFreq are preserved") {
    // same paragraph twice in ONE doc: doc frequency 1 < 2 → both kept
    val df = corpus(1 -> "twice\ntwice", 2 -> "unrelated")
    val out = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "\n")
      .orderBy("id").select("text").as[String].collect()
    assert(out(0) === "twice\ntwice")
  }

  test("empty paragraphs are collapsed and never participate in identity") {
    val df = corpus(1 -> "a\n\n\nb", 2 -> "\n\nc")
    val out = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "\n")
      .orderBy("id").select("text", "kept_paras").as[(String, Long)].collect()
    assert(out(0) === (("a\nb", 2L)))
    assert(out(1) === (("c", 1L)))
  }

  test("separator is literal, not regex: '||' splits and re-joins losslessly") {
    val df = corpus(1 -> "p||q", 2 -> "p||r")
    val out = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "||")
      .orderBy("id").select("text").as[String].collect()
    assert(out === Array("p||q", "r"))
  }

  test("boilerplateReport tallies distinct docs and the first holder") {
    val df = corpus(
      1 -> "H\na", 2 -> "H\nb", 3 -> "H\nc", 4 -> "pair\nd", 5 -> "pair\ne")
    val rep = ParagraphDedup.boilerplateReport(df, "id", "text", "\n", 3)
      .as[(String, Long, Int)].collect()
    assert(rep === Array(("H", 3L, 1)))
  }

  test("deterministic under repartitioning") {
    val df = corpus((1 to 50).map(i =>
      i -> s"shared header\nbody $i\nshared footer"): _*)
    val a = ParagraphDedup.dropDuplicateParagraphs(df, "id", "text", "\n")
      .select("id", "text").as[(Int, String)].collect().sortBy(_._1)
    val b = ParagraphDedup
      .dropDuplicateParagraphs(df.repartition(7), "id", "text", "\n")
      .select("id", "text").as[(Int, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }
}
