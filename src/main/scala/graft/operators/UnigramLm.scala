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

  /** Token unigram counts with corpus-relative log-probabilities:
    * (term, cnt, logp = ln(cnt / total)). One explode (projection, no
    * shuffle) + one map-side-combined groupBy; the total joins back as a
    * broadcast single row. The distributed `logp` uses Spark's ln for
    * [[scoreJoin]]-scale use; [[collectLm]] recomputes it on the driver
    * for the bit-reproducible broadcast path.
    */
  def train(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("term"), col("cnt"),
        log(col("cnt").cast("double") / col("total").cast("double")).as("logp"))
  }

  /** Collect a trained LM to driver state: (terms, logps) aligned, plus the
    * OOV log-prob floor ln(0.5 / total) — half a count, the standard
    * additive-smoothing floor for unseen tokens.
    */
  def collectLm(lm: DataFrame): (Seq[String], Seq[Double], Double) = {
    val rows = lm.select(col("term"), col("cnt")).collect()
    val total = rows.iterator.map(_.getLong(1)).sum.toDouble
    val terms = rows.map(_.getString(0)).toSeq
    // driver-side Math.log: bitwise-equal to DuckDB ln on these inputs
    // (verified), unlike StrictMath-backed distributed ln
    val logps = rows.map(r => math.log(r.getLong(1) / total)).toSeq
    (terms, logps, math.log(0.5 / total))
  }

  /** Mean negative log-likelihood per document via the broadcast kernel:
    * (idCol, n_tokens, nll). Zero shuffle — a single projection pass.
    */
  def scoreBroadcast(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], logps: Seq[Double], oovLogP: Double): DataFrame =
    docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        ColumnBridge.column(graft.expressions.TokenWeightSum(
          ColumnBridge.expression(col(textCol)), terms, logps, oovLogP))
          .as("__lpsum"))
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"),
        (-col("__lpsum") / col("n_tokens")).as("nll"))

  /** Join-path scoring for beyond-broadcast vocabularies: explode tokens,
    * hash-join the LM table, re-aggregate per document. OOV tokens take
    * `oovLogP` via the left join's null branch.
    */
  def scoreJoin(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, oovLogP: Double): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .join(lm.select(col("term"), col("logp")), Seq("term"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("logp"), lit(oovLogP))).as("__lpsum"))
      .select(col(idCol), col("n_tokens"),
        (-col("__lpsum") / col("n_tokens")).as("nll"))
}
