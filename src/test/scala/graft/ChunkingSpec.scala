package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Chunking

/** Sliding-window chunk boundaries on hand fixtures (coverage, overlap,
  * short-doc and exact-fit edges) plus corpus-level coverage invariants.
  */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks(text: String, w: Int, s: Int): Seq[(Long, Long, Long, String)] =
    Chunking.slidingWindows(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", w, s)
      .select($"chunk_id", $"chunk_start", $"n_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("overlapping chunks cover the document with the declared stride") {
    // 10 tokens, window 4, stride 2 → starts 0,2,4,6: last window reaches 10
    val got = chunks("a b c d e f g h i j", w = 4, s = 2)
    assert(got === Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 4L, "c d e f"),
      (2L, 4L, 4L, "e f g h"),
      (3L, 6L, 4L, "g h i j")))
  }

  test("a trailing remainder gets one short final chunk") {
    // 7 tokens, window 4, stride 3 → starts 0, 3: final chunk is 4 tokens;
    // 8 tokens → starts 0, 3, 6 with a 2-token tail
    assert(chunks("a b c d e f g", w = 4, s = 3).map(_._4) ===
      Seq("a b c d", "d e f g"))
    assert(chunks("a b c d e f g h", w = 4, s = 3) === Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 3L, 4L, "d e f g"),
      (2L, 6L, 2L, "g h")))
  }

  test("documents at or below the window yield exactly one chunk") {
    assert(chunks("a b c", w = 4, s = 2) === Seq((0L, 0L, 3L, "a b c")))
    assert(chunks("a b c d", w = 4, s = 2) === Seq((0L, 0L, 4L, "a b c d")))
  }

  test("stride = window degenerates to q74's disjoint chunks") {
    val got = chunks("a b c d e f g h i", w = 3, s = 3)
    assert(got.map(_._4) === Seq("a b c", "d e f", "g h i"))
    assert(got.map(_._2) === Seq(0L, 3L, 6L))
  }

  test("corpus invariants: every token covered, overlap bounded by stride") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val out = Chunking.slidingWindows(docs, "doc_id", "text", 32, 24)
    // coverage: per doc, max(chunk_start + n_tokens) == token count, and the
    // summed chunk tokens exceed the doc's by exactly the overlap mass
    val perDoc = out.groupBy("doc_id").agg(
      max(col("chunk_start") + col("n_tokens")).as("covered"),
      count(lit(1)).as("n_chunks"),
      sum("n_tokens").as("chunk_mass"))
    val joined = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .join(perDoc, "doc_id")
    assert(joined.filter(col("covered") =!= col("n")).isEmpty)
    assert(joined.filter(
      col("chunk_mass") - col("n") > (col("n_chunks") - 1) * lit(8L)).isEmpty)
  }
}
