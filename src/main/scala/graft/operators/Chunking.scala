package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the retrieval-ingestion counterpart
  * of [[Packing]]'s training-side packing: cut each document into
  * `window`-token chunks whose starts advance by `stride` tokens, so
  * consecutive chunks overlap by `window - stride` tokens and no boundary
  * sentence is ever lost to a hard cut (the standard RAG chunking shape;
  * q74 is the stride = window degenerate case).
  *
  * Start positions are 0, stride, 2·stride, …, up to the smallest multiple
  * of stride whose window reaches the document end — every token is covered,
  * the final chunk may be short, and a document not longer than `window`
  * yields exactly one chunk.
  *
  * Scale shape: one generator (explode of a per-row index sequence) over a
  * single corpus scan — chunk arithmetic and the chunk-text slice stay
  * codegen'd, nothing shuffles, output order is the caller's. Chunking
  * 100 TB is a map-only job whose output size is input × (window/stride).
  */
object Chunking {

  /** One row per (doc, chunk): chunk_id (0-based), chunk_start (token
    * offset), n_tokens (≤ window), chunk_text (the tokens re-joined — the
    * payload a retrieval index embeds).
    */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val iMax = floor(
      (greatest(col("n") - window, lit(0)) + stride - 1) / stride).cast("long")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
      .select(col(idCol), col("t"), size(col("t")).as("n"))
      // the generator is its own select step (Spark 4 forbids nested
      // generators inside expressions — same shape as q74)
      .select(col(idCol), col("t"), col("n"),
        explode(sequence(lit(0L), iMax)).as("i"))
      .select(col(idCol),
        col("i").cast("long").as("chunk_id"),
        (col("i") * stride).cast("long").as("chunk_start"),
        least(lit(window), col("n") - col("i") * stride).cast("long").as("n_tokens"),
        concat_ws(" ",
          slice(col("t"), (col("i") * stride + 1).cast("int"), lit(window))).as("chunk_text"))
  }
}
