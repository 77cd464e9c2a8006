package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.SpanDedup

/** Span-granular dedup semantics on hand-built fixtures (exact span
  * boundaries, keep-first-doc canonicality, boilerplate thresholding) plus
  * corpus-level invariants on the sf0.001 documents table.
  */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 1: canonical; doc 2 copies tokens 2..9 of doc 1 (one 8-token window)
  // in the middle of otherwise-unique text; doc 3 shares nothing.
  private val shared = (1 to 8).map(i => s"s$i").mkString(" ")
  lazy val fixture = Seq(
    (1L, s"u1 u2 $shared u3 u4"),
    (2L, s"v1 v2 v3 $shared v4"),
    (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
  ).toDF("doc_id", "text")

  test("dupSpans finds the exact shared window in both documents") {
    val spans = SpanDedup.dupSpans(fixture, "doc_id", "text", k = 8)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Int, Int)].collect().toSet
    // doc 1: tokens 2..10 exclusive; doc 2: tokens 3..11 exclusive
    assert(spans === Set((1L, 2, 10), (2L, 3, 11)))
  }

  test("stripSpans keeps the canonical (lowest doc id) occurrence intact") {
    val out = SpanDedup.stripSpans(fixture, "doc_id", "text", k = 8)
      .select($"doc_id", $"text", $"kept_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, s"u1 u2 $shared u3 u4", 12L))) // untouched
    assert(out(1) === ((2L, "v1 v2 v3 v4", 4L)))           // span removed
    assert(out(2)._2.startsWith("w1") && out(2)._3 === 10L) // untouched
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // doc 5 copies a 10-token run from doc 4 → three overlapping 8-windows
    // in each doc, one merged span of exactly 10 tokens
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val df = Seq((4L, s"a1 $run a2"), (5L, s"b1 b2 b3 $run")).toDF("doc_id", "text")
    val spans = SpanDedup.dupSpans(df, "doc_id", "text", k = 8)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Int, Int)].collect().toSet
    assert(spans === Set((4L, 1, 11), (5L, 3, 13)))
  }

  test("minDocFreq above 2 turns the operator into boilerplate detection") {
    // the shared window appears in only 2 docs → no spans at threshold 3
    assert(SpanDedup.dupSpans(fixture, "doc_id", "text", k = 8, minDocFreq = 3)
      .isEmpty)
    // replicate the window into a third doc → all three flagged at threshold 3
    val wider = fixture.union(Seq((6L, s"x1 $shared x2")).toDF("doc_id", "text"))
    val flagged = SpanDedup.dupSpans(wider, "doc_id", "text", k = 8, minDocFreq = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged === Set(1L, 2L, 6L))
  }

  test("strip positions stay aligned on text with irregular whitespace") {
    // window positions come from whitespace-RUN tokenization; the rebuild
    // must tokenize the same way or a double space / tab shifts the strip
    // window onto the wrong tokens
    val df = Seq(
      (1L, s"z1 $shared z2"),
      (2L, s"a  b\t$shared") // double space + tab before the copied span
    ).toDF("doc_id", "text")
    val out = SpanDedup.stripSpans(df, "doc_id", "text", k = 8)
      .select($"doc_id", $"text", $"kept_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0)._2 === s"z1 $shared z2") // canonical untouched
    assert(out(1) === ((2L, "a b", 2L)))   // span gone, a and b kept
  }

  test("rebuild tokenizer matches the hashing kernel on leading \\t/\\n and embedded \\f") {
    // TextHashing delimits on runs of space/\t/\n/\r and never emits empty
    // tokens: a LEADING \t/\n must not shift positions (trim-then-\s+ would
    // emit an empty token 0), and \f is a token byte, not a delimiter (\s+
    // would split there). Misalignment strips the wrong tokens silently.
    val df = Seq(
      (1L, s"k1 k2 $shared k3"),  // canonical — untouched
      (2L, s"\tp1 $shared"),      // leading tab: span at kernel positions 1..9
      (3L, s"\nq1 $shared"),      // leading newline: same shape
      (4L, s"r1\fr2 $shared")     // \f inside one kernel token
    ).toDF("doc_id", "text")
    val out = SpanDedup.stripSpans(df, "doc_id", "text", k = 8)
      .select($"doc_id", $"text", $"kept_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0)._2 === s"k1 k2 $shared k3")
    assert(out(1) === ((2L, "p1", 1L)))
    assert(out(2) === ((3L, "q1", 1L)))
    assert(out(3) === ((4L, "r1\fr2", 1L)))
  }

  test("documents shorter than the window never produce spans or change text") {
    val df = Seq((7L, "a b c"), (8L, "a b c")).toDF("doc_id", "text")
    assert(SpanDedup.dupSpans(df, "doc_id", "text", k = 8).isEmpty)
    val out = SpanDedup.stripSpans(df, "doc_id", "text", k = 8)
      .select($"text", $"kept_tokens").as[(String, Long)].collect()
    assert(out.forall(_ == (("a b c", 3L))))
  }

  test("surgical decontamination strips only blocklisted spans, not documents") {
    val corpus = Seq(
      (1L, s"c1 c2 $shared c3"),         // contains the benched window
      (2L, "d1 d2 d3 d4 d5 d6 d7 d8 d9") // clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"b1 $shared b2")).toDF("doc_id", "text")
    val out = SpanDedup.stripContaminatedSpans(
      corpus, "doc_id", "text", bench, "text", k = 8)
      .select($"doc_id", $"text", $"kept_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // doc 1 loses exactly the benched window, keeps its own frame
    assert(out(0) === ((1L, "c1 c2 c3", 3L)))
    // clean doc untouched — whole-document drop would have been wrong here
    assert(out(1) === ((2L, "d1 d2 d3 d4 d5 d6 d7 d8 d9", 9L)))
    // empty blocklist strips nothing — compare against the ORIGINAL text
    // (kept_tokens vs rebuilt text is self-consistent even for wrong strips)
    val none = SpanDedup.stripContaminatedSpans(corpus, "doc_id", "text",
        bench.limit(0), "text", k = 8)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(none === Map(1L -> s"c1 c2 $shared c3",
      2L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9"))
  }

  test("stripSelfRepeats keeps the first occurrence and drops later ones") {
    val df = Seq(
      (1L, "a b c m n a b c"),            // abc repeats at 0 and 5
      (2L, "d1 d2 d3 d4 d5 d6")           // no repeats — identity
    ).toDF("doc_id", "text")
    val out = SpanDedup.stripSelfRepeats(df, "doc_id", "text", k = 3)
      .select($"doc_id", $"text", $"kept_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "a b c m n", 5L)))
    assert(out(1) === ((2L, "d1 d2 d3 d4 d5 d6", 6L)))
  }

  test("stripSelfRepeats on periodic text keeps one period's first windows") {
    // every window repeats; the protected first occurrences of (x y) at 0
    // and (y x) at 1 cover tokens 0..2, everything after is stripped
    val df = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val out = SpanDedup.stripSelfRepeats(df, "doc_id", "text", k = 2)
      .select($"text", $"kept_tokens").as[(String, Long)].head()
    assert(out === (("x y x", 3L)))
  }

  test("stripSelfRepeats is within-document only and honors minCount") {
    // the same phrase in two DIFFERENT docs is not a self-repeat
    val cross = Seq((1L, s"a1 $shared"), (2L, s"b1 $shared"))
      .toDF("doc_id", "text")
    val untouched = SpanDedup.stripSelfRepeats(cross, "doc_id", "text", k = 3)
      .filter($"kept_tokens" =!= 9L)
    assert(untouched.isEmpty)
    // two occurrences stay below a minCount of 3
    val twice = Seq((3L, "a b c m n a b c")).toDF("doc_id", "text")
    val kept = SpanDedup.stripSelfRepeats(twice, "doc_id", "text", k = 3,
      minCount = 3).select($"text").as[String].head()
    assert(kept === "a b c m n a b c")
  }

  test("stripSelfRepeats positions stay aligned on a leading tab") {
    val df = Seq((1L, "\ta b c a b c")).toDF("doc_id", "text")
    val out = SpanDedup.stripSelfRepeats(df, "doc_id", "text", k = 3)
      .select($"text", $"kept_tokens").as[(String, Long)].head()
    assert(out === (("a b c", 3L)))
  }

  test("corpus invariants: self-repeat strip preserves rows and consistency") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val stripped = SpanDedup.stripSelfRepeats(docs, "doc_id", "text", k = 2)
    assert(stripped.count() === docs.count(), "every row survives")
    val bad = stripped.filter(
      when(length($"text") === 0, lit(0)).otherwise(size(split($"text", " ")))
        =!= $"kept_tokens")
    assert(bad.isEmpty)
    // the synthetic corpus has within-doc repeated bigrams — some mass goes
    val totalToks = docs.select(
      sum(graft.functions.TextFunctions.tokenCount($"text")).cast("long"))
      .as[Long].head()
    val keptToks = stripped.agg(sum("kept_tokens")).as[Long].head()
    assert(keptToks < totalToks, "expected some within-doc repetition removed")
  }

  test("corpus invariants: strip removes exactly the non-canonical dup mass") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val stats = SpanDedup.dupSpanStats(docs, "doc_id", "text", k = 8)
    val statRows = stats.agg(sum("dup_tokens"), count(lit(1)))
      .as[(Long, Long)].head()
    assert(statRows._2 > 0, "planted near-duplicates should produce spans")
    val stripped = SpanDedup.stripSpans(docs, "doc_id", "text", k = 8)
    assert(stripped.count() === docs.count(), "every row survives")
    // kept_tokens always matches the rebuilt text
    val bad = stripped.filter(
      when(length($"text") === 0, lit(0)).otherwise(size(split($"text", " ")))
        =!= $"kept_tokens")
    assert(bad.isEmpty)
    // strip removes no more than the audited dup mass, and something
    val totalToks = docs.select(
      sum(graft.functions.TextFunctions.tokenCount($"text")).cast("long"))
      .as[Long].head()
    val keptToks = stripped.agg(sum("kept_tokens")).as[Long].head()
    val removed = totalToks - keptToks
    assert(removed > 0 && removed <= statRows._1,
      s"removed $removed vs dup mass ${statRows._1}")
  }
}
