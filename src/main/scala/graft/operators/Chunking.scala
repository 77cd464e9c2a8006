package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Content-defined chunking: cut after any k-token window whose 64-bit
    * hash ≡ 0 (mod `divisor`) — boundaries decided by CONTENT, not offsets,
    * so inserting a paragraph shifts only the chunks up to the next
    * surviving boundary and every later chunk re-hashes identically (a
    * fixed-size chunker re-cuts the whole tail). That stability is what
    * makes chunk-hash-keyed artifacts (dedup stores, embedding caches,
    * chunk-level provenance) survive document edits at corpus scale;
    * expected chunk length is ≈ `divisor` tokens.
    *
    * Semantics: token indices come from the hash-aligned tokenizer (the
    * [[graft.expressions.ShingleHashes]] kernel — same positional contract
    * as [[SpanDedup]]); a window at pos cuts after token pos+k−1; the final
    * chunk always ends at the last token; empty documents yield no chunks.
    * No min/max-size clamping: suppression of a cut depends on where the
    * previous ACCEPTED cut fell, an inherently sequential chain that
    * cannot shard — callers needing size floors merge adjacent tiny chunks
    * downstream (associative, parallel) instead.
    *
    * Scale shape: the windows expansion is map-only; accepted cuts are
    * ~1/divisor of windows; per-document cut arrays are bounded by
    * n_tokens/divisor (the [[SpanDedup]] span-array argument); chunk slice,
    * text rebuild and xxhash64 fingerprint are codegen projections. One
    * doc-keyed shuffle (the cut collect), nothing corpus-pairwise.
    */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    chunksFromWindowHashes(df, idCol, textCol, k, divisor,
      winHashes = ColumnBridge.column(graft.expressions.ShingleHashes(
        ColumnBridge.expression(col(textCol)), k, distinct = false)),
      fingerprint = xxhash64(_))
  }

  /** [[contentDefinedChunks]] with the DuckDB-reproducible md5 hash family
    * deciding the cuts AND fingerprinting the chunks
    * (TextFunctions.md5Hashes60 over the same hash-aligned positional
    * windows) — the oracle-parity twin the q167 gate runs, same trick as
    * q66's winnow fingerprints. The engine-fast path stays the one-pass
    * ShingleHashes kernel above; cut DENSITY and every structural
    * invariant are hash-family-independent (ChunkingSpec pins both).
    */
  def contentDefinedChunksMd5(df: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    chunksFromWindowHashes(df, idCol, textCol, k, divisor,
      winHashes = ColumnBridge.column(graft.expressions.ShingleHashesMd5(
        ColumnBridge.expression(col(textCol)), k)),
      fingerprint = TextFunctions.md5Hash60)
  }

  private def chunksFromWindowHashes(df: DataFrame, idCol: String,
      textCol: String, k: Int, divisor: Int, winHashes: Column,
      fingerprint: Column => Column): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(divisor > 0, s"divisor must be positive, got $divisor")
    val wins = df.select(col(idCol), posexplode(winHashes))
      .toDF(idCol, "pos", "h")
    val cuts = wins.filter(pmod(col("h"), lit(divisor.toLong)) === 0)
      .groupBy(idCol)
      .agg(sort_array(collect_list((col("pos") + (k - 1)).cast("int")))
        .as("__cuts"))
    val base = df
      .select(col(idCol),
        TextFunctions.hashAlignedTokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
    base.join(cuts, Seq(idCol), "left")
      // final chunk always closes at the last token; distinct absorbs a
      // cut that already lands there (appended end ≥ every cut end, so
      // the array stays sorted)
      .withColumn("__ends", array_distinct(concat(
        coalesce(col("__cuts"), array().cast("array<int>")),
        array((col("__n") - 1).cast("int")))))
      .select(col(idCol), col("__t"), col("__ends"),
        posexplode(col("__ends")).as(Seq("ci", "end")))
      .withColumn("tok_start",
        when(col("ci") === 0, lit(0))
          .otherwise(element_at(col("__ends"), col("ci")) + 1))
      .select(col(idCol),
        col("ci").cast("long").as("chunk_id"),
        col("tok_start").cast("long"),
        col("end").cast("long").as("tok_end"),
        (col("end") - col("tok_start") + 1).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("__t"), col("tok_start") + 1,
          col("end") - col("tok_start") + 1)).as("chunk_text"))
      .withColumn("chunk_hash", fingerprint(col("chunk_text")))
  }
}
