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

  private def cdc(df: org.apache.spark.sql.DataFrame) =
    Chunking.contentDefinedChunks(df, "doc_id", "text", k = 3, divisor = 4)

  test("CDC chunks partition each document: contiguous, ordered, full coverage") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir).limit(50).cache()
    val out = cdc(docs).cache()
    // contiguity: chunk i+1 starts right after chunk i ends
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_id")
    val gaps = out.withColumn("prev_end", lag("tok_end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("tok_start") =!= col("prev_end") + 1)
    assert(gaps.isEmpty)
    // coverage: first chunk at 0, last ends at n-1, masses sum to n
    val perDoc = out.groupBy("doc_id").agg(
      min("tok_start").as("first"), max("tok_end").as("last"),
      sum("n_tokens").as("mass"))
    val joined = docs.select(col("doc_id"),
        graft.functions.TextFunctions.hashAlignedTokenCount(col("text"))
          .cast("long").as("n"))
      .filter(col("n") > 0).join(perDoc, "doc_id")
    assert(joined.filter(col("first") =!= 0L).isEmpty)
    assert(joined.filter(col("last") =!= col("n") - 1).isEmpty)
    assert(joined.filter(col("mass") =!= col("n")).isEmpty)
    assert(docs.count() == perDoc.count())
  }

  test("CDC md5 variant (the oracle-parity twin) holds the same partition invariants") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir).limit(50).cache()
    val out = Chunking.contentDefinedChunksMd5(
      docs, "doc_id", "text", k = 4, divisor = 8).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_id")
    assert(out.withColumn("prev_end", lag("tok_end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("tok_start") =!= col("prev_end") + 1).isEmpty)
    val perDoc = out.groupBy("doc_id").agg(
      min("tok_start").as("first"), max("tok_end").as("last"),
      sum("n_tokens").as("mass"))
    val joined = docs.select(col("doc_id"),
        graft.functions.TextFunctions.hashAlignedTokenCount(col("text"))
          .cast("long").as("n"))
      .filter(col("n") > 0).join(perDoc, "doc_id")
    assert(joined.filter(col("first") =!= 0L ||
      col("last") =!= col("n") - 1 || col("mass") =!= col("n")).isEmpty)
    // expected cut density ~1/divisor holds for this hash family too
    val nChunks = out.count().toDouble
    val nTokens = joined.agg(sum("n")).head.getLong(0).toDouble
    assert(nChunks / nTokens > 0.04 && nChunks / nTokens < 0.30,
      s"cut density ${nChunks / nTokens} far from 1/8")
  }

  test("CDC chunk texts reassemble the original token stream") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir).limit(20)
    val rebuilt = cdc(docs)
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        x => x.getField("chunk_text"))).as("re"))
    val orig = docs.select(col("doc_id"), concat_ws(" ",
      graft.functions.TextFunctions.hashAlignedTokens(col("text"))).as("o"))
    assert(orig.join(rebuilt, "doc_id").filter(col("re") =!= col("o")).isEmpty)
  }

  test("CDC boundaries are content-local: a prefix edit leaves tail chunks intact") {
    // the defining property — a fixed-size chunker fails this
    val base = (1 to 120).map(i => s"w${i % 37}x$i").mkString(" ")
    val edited = "zz qq vv " + base
    val origHashes = cdc(Seq((1L, base)).toDF("doc_id", "text"))
      .select("chunk_hash").as[Long].collect().toSet
    val editHashes = cdc(Seq((1L, edited)).toDF("doc_id", "text"))
      .select("chunk_hash").as[Long].collect().toSet
    val lost = origHashes -- editHashes
    // only chunks before the first post-edit shared boundary may differ
    assert(origHashes.size >= 10, s"fixture too coarse: ${origHashes.size} chunks")
    assert(lost.size <= 2, s"prefix edit invalidated ${lost.size} of ${origHashes.size} chunks")
  }

  test("CDC is deterministic and respects empty/short documents") {
    val docs = Seq((1L, ""), (2L, "one two"), (3L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val a = cdc(docs).collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val b = cdc(docs).collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(a == b)
    // empty doc yields nothing; a short doc yields one whole-doc chunk
    assert(!a.exists(_.getLong(0) == 1L))
    val twoTok = a.filter(_.getLong(0) == 2L)
    assert(twoTok.map(_.getAs[String]("chunk_text")) == Seq("one two"))
  }
}
