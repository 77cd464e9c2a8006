package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFunctions

/** Unigram language-model perplexity scoring — the CCNet-style "how much
  * does this text look like the reference corpus" quality signal (Wenzek et
  * al., LREC'20 score documents with an LM and filter/bucket by perplexity;
  * the unigram form keeps the arithmetic exactly reproducible while the
  * pipeline shape — train on a reference corpus, score any corpus — is the
  * same as the 5-gram KenLM deployment).
  *
  * Two scoring paths with one contract (mean negative log-likelihood per
  * document, natural log):
  *
  *  - [[scoreBroadcast]]: the trained log-prob table rides inside a codegen
  *    kernel ([[graft.expressions.TokenWeightSum]]) — zero shuffle, one
  *    corpus scan, and the per-document sum folds in token order, so the
  *    result is bit-reproducible (and DuckDB-verifiable). Vocabulary is
  *    broadcast-class driver state; right for the ≤ millions-of-terms
  *    lexicons a unigram LM actually has.
  *  - [[scoreJoin]]: explode + hash join + re-aggregate — no driver-side
  *    vocabulary at all, for when the table outgrows a broadcast. Same
  *    score up to float re-association (partition-arrival sum order),
  *    which is why the gate pins the broadcast path and the spec bounds
  *    the join path against it.
  */
object UnigramLm {

  /** Token unigram counts: (term, cnt). One explode (projection, no
    * shuffle) + one map-side-combined groupBy. The empty term — `tokens`'s
    * artifact on empty/whitespace-only documents — is excluded: it is not
    * a token and would otherwise pollute the vocabulary. This is all
    * [[collectLm]] needs; [[train]] layers the distributed log-probs on
    * top for the join path.
    */
  def termCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Trained LM with corpus-relative log-probabilities:
    * (term, cnt, logp = ln(cnt / total)); the total joins back as a
    * broadcast single row. The counts frame backs both the total aggregate
    * and the output projection, so it is persisted (vocabulary-sized —
    * broadcast-class, not corpus-class) rather than exploded twice. The
    * distributed `logp` uses Spark's ln for [[scoreJoin]]-scale use;
    * [[collectLm]] recomputes it on the driver for the bit-reproducible
    * broadcast path.
    */
  def train(docs: DataFrame, textCol: String): DataFrame = {
    val counts = termCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("term"), col("cnt"),
        log(col("cnt").cast("double") / col("total").cast("double")).as("logp"))
  }

  /** Collect a trained LM ([[train]] or just [[termCounts]]) to driver
    * state: (terms, logps) aligned, plus the OOV log-prob floor
    * ln(0.5 / total) — half a count, the standard additive-smoothing floor
    * for unseen tokens. An empty LM floors against total = 1 (every token
    * OOV at ln 0.5) instead of degenerating to ±Infinity.
    */
  def collectLm(lm: DataFrame): (Seq[String], Seq[Double], Double) = {
    val rows = lm.select(col("term"), col("cnt")).collect()
    val total = math.max(rows.iterator.map(_.getLong(1)).sum, 1L).toDouble
    val terms = rows.map(_.getString(0)).toSeq
    // driver-side Math.log: bitwise-equal to DuckDB ln on these inputs
    // (verified), unlike StrictMath-backed distributed ln
    val logps = rows.map(r => math.log(r.getLong(1) / total)).toSeq
    (terms, logps, math.log(0.5 / total))
  }

  /** Mean negative log-likelihood per document via the broadcast kernel:
    * (idCol, n_tokens, nll). Zero shuffle — a single projection pass.
    * Empty/whitespace-only documents are unscorable and are dropped — not
    * scored: `tokenCount` counts their split artifact as one token while
    * the kernel sees zero, which would hand junk documents a perfect
    * nll = 0 (and the head perplexity bucket).
    */
  def scoreBroadcast(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], logps: Seq[Double], oovLogP: Double): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        ColumnBridge.column(graft.expressions.TokenWeightSum(
          ColumnBridge.expression(col(textCol)), terms, logps, oovLogP))
          .as("__lpsum"))
      .select(col(idCol), col("n_tokens"),
        (-col("__lpsum") / col("n_tokens")).as("nll"))

  /** Join-path scoring for beyond-broadcast vocabularies: explode tokens,
    * hash-join the LM table, re-aggregate per document. OOV tokens take
    * `oovLogP` via the left join's null branch.
    */
  def scoreJoin(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, oovLogP: Double): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .join(lm.select(col("term"), col("logp")), Seq("term"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("logp"), lit(oovLogP))).as("__lpsum"))
      .select(col(idCol), col("n_tokens"),
        (-col("__lpsum") / col("n_tokens")).as("nll"))
}
