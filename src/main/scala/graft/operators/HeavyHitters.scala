package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.{CmsEstimateTerm, CountMinAgg, ShingleHashes}

/** Exact heavy hitters over a heavy-tail key space with sketch-bounded
  * memory: a count-min sketch (one mergeable aggregation, fixed
  * `depth × width` memory per partition) prefilters candidate terms, then
  * only candidates get an exact count. CMS never underestimates, so no true
  * heavy hitter is lost at the prefilter, and the exact pass removes the
  * overestimates — the result equals a plain `groupBy.count.filter(>= T)`
  * bit-for-bit.
  *
  * Why not just groupBy? For word tokens it IS fine (bounded vocabulary,
  * map-side combine). For unbounded key spaces — n-gram shingles, URLs,
  * (user, path) pairs — the combine hash tables grow with distinct keys per
  * partition and spill; the sketch stays fixed-size no matter how long the
  * tail is, and only the (tiny) candidate set ever shuffles. This is the
  * frequency-side sibling of the stop-shingle guard in
  * [[TextDedup.ngramJaccardPairs]].
  */
object HeavyHitters {

  /** Terms of `textCol` (whitespace tokens) occurring at least `minFreq`
    * times corpus-wide, with their exact counts. `width`/`depth` size the
    * sketch: overestimate ≤ 2·occurrences/width per row with prob 1−2^−depth,
    * so width ≫ occurrences/minFreq keeps the candidate set near-exact.
    */
  def heavyTokens(df: DataFrame, textCol: String, minFreq: Long,
      width: Int = 1 << 16, depth: Int = 4): DataFrame = {
    // pass 1: one-pass per-occurrence token hashes → mergeable sketch
    val hashes = df.select(ColumnBridge.column(ShingleHashes(
      ColumnBridge.expression(col(textCol)), 1, distinct = false)).as("__hs"))
    val sketch = hashes.agg(ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(col("__hs")), width, depth)
        .toAggregateExpression()).as("sk"))
      .head().getSeq[Long](0).toArray
    // pass 2: per-occurrence terms, sketch prefilter (no false negatives),
    // exact count of the surviving candidates only. The split MUST mirror
    // the sketch pass's tokenizer (TextHashing: runs of non-[space/tab/
    // CR/LF] bytes, no empty tokens) — `tokens()`'s \s+ split also breaks
    // on \f/\x0B and emits "" for blank text, and any divergence here makes
    // the prefilter a false-negative source for exactly those terms
    df.select(explode(split(col(textCol), "[ \t\n\r]+")).as("term"))
      .filter(length(col("term")) > 0)
      .filter(ColumnBridge.column(CmsEstimateTerm(
        ColumnBridge.expression(col("term")), sketch, width, depth)) >= minFreq)
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
  }
}
