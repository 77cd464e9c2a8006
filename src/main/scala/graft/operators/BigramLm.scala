package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFunctions

/** Interpolated bigram language-model scoring — the next rung above
  * [[UnigramLm]] on the CCNet/KenLM ladder (Wenzek et al., LREC'20 deploy a
  * 5-gram KenLM; the bigram form keeps every probability exactly
  * replayable while exercising the real n-gram machinery: context counts,
  * interpolation, backoff, OOV floors).
  *
  * Model, with interpolation weight λ:
  *
  *  - first token `t`:    p = pu(t)
  *  - later token `t` after `p`:  p = λ·(cnt(p,t)/cnt(p)) + (1−λ)·pu(t),
  *    the bigram term dropping to 0 when the pair was never seen
  *  - pu(t) = cnt(t)/total for trained tokens, 0.5/total (half-count
  *    additive floor, as [[UnigramLm.collectLm]]) for OOV
  *
  * `cnt(p)` is the unigram count of the context token (the standard
  * simplification — it counts document-final occurrences that have no
  * successor, so Σ_t p_bi(t|p) ≤ 1; mass leaks to the interpolation
  * floor, never above 1).
  *
  * Scale shape: the trained model is vocabulary + seen-pair sized —
  * model-artifact state, exactly what CCNet ships to every worker — so
  * scoring is one zero-shuffle projection pass with the
  * [[graft.expressions.TokenBigramScore]] kernel, summing log-probs in
  * token order (bit-reproducible, DuckDB-verifiable). Training is one
  * corpus scan per n-gram order: a map-only pair expansion plus a
  * map-side-combined count.
  */
object BigramLm {

  /** Trained model as driver state, ready for the broadcast kernel. */
  final case class Model(pairKeys: Seq[String], pairLogps: Seq[Double],
      terms: Seq[String], firstLogps: Seq[Double], backoffLogps: Seq[Double],
      oovFirst: Double, oovBackoff: Double)

  /** Adjacent-pair counts: (prev, tok, cnt). The pair expansion is a
    * projection over the token array (no self-join, no window — adjacency
    * is positional within one row), then one map-side-combined groupBy.
    * Tokenized through [[TextFunctions.hashAlignedTokens]], the scoring
    * kernel's own rule.
    */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(TextFunctions.hashAlignedTokens(col(textCol)).as("t"))
      // zip the array against itself shifted by one — NOT sequence(2, n),
      // which DESCENDS for sub-2-token docs and would fabricate null pairs
      .select(explode(expr(
        """zip_with(slice(t, 1, greatest(size(t) - 1, 0)),
          |         slice(t, 2, greatest(size(t) - 1, 0)),
          |         (p, c) -> struct(p as prev, c as tok))""".stripMargin))
        .as("p"))
      .select(col("p.prev"), col("p.tok"))
      .groupBy("prev", "tok").agg(count(lit(1)).as("cnt"))

  /** Collect unigram + pair counts ([[UnigramLm.termCounts]] /
    * [[pairCounts]]) into a [[Model]]. All log-probs use driver-side
    * `Math.log` (bitwise DuckDB-`ln`-equal; Spark's distributed `log` is
    * StrictMath) and the interpolation arithmetic is plain IEEE
    * `λ·(c2/c1) + (1−λ)·(ct/total)` so an oracle can replay it term for
    * term. An empty training corpus floors total at 1, as the unigram LM
    * does.
    */
  def collect(uniCounts: DataFrame, pairs: DataFrame, lambda: Double): Model = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0, 1), got $lambda")
    val uni = uniCounts.select(col("term"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = math.max(uni.iterator.map(_._2).sum, 1L).toDouble
    val uniMap = uni.toMap
    val terms = uni.map(_._1).toSeq
    val firstLogps = uni.map(r => math.log(r._2 / total)).toSeq
    val backoffLogps = uni.map(r => math.log((1 - lambda) * (r._2 / total))).toSeq
    val pairRows = pairs.select(col("prev"), col("tok"), col("cnt")).collect()
    val pairKeys = pairRows.map(r => r.getString(0) + " " + r.getString(1)).toSeq
    val pairLogps = pairRows.map { r =>
      // pair seen ⇒ both tokens trained; uniMap probes cannot miss
      val cntPrev = uniMap(r.getString(0)).toDouble
      val cntTok = uniMap(r.getString(1)).toDouble
      math.log(lambda * (r.getLong(2) / cntPrev) + (1 - lambda) * (cntTok / total))
    }.toSeq
    Model(pairKeys, pairLogps, terms, firstLogps, backoffLogps,
      oovFirst = math.log(0.5 / total),
      oovBackoff = math.log((1 - lambda) * (0.5 / total)))
  }

  /** Train on `ref` in one pass per order and collect to a [[Model]]. */
  def train(ref: DataFrame, textCol: String, lambda: Double): Model =
    collect(UnigramLm.termCounts(ref, textCol), pairCounts(ref, textCol), lambda)

  /** Mean negative log-likelihood per document via the broadcast kernel:
    * (idCol, n_tokens, nll). Zero shuffle — one projection pass; the
    * per-document sum folds in token order inside
    * [[graft.expressions.TokenBigramScore]]. Zero-token documents are
    * unscorable and drop, as in [[UnigramLm.scoreBroadcast]].
    */
  def scoreBroadcast(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    docs.select(col(idCol),
        TextFunctions.hashAlignedTokenCount(col(textCol)).cast("long").as("n_tokens"),
        ColumnBridge.column(graft.expressions.TokenBigramScore(
          ColumnBridge.expression(col(textCol)),
          model.pairKeys, model.pairLogps, model.terms, model.firstLogps,
          model.backoffLogps, model.oovFirst, model.oovBackoff))
          .as("__lpsum"))
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"),
        (-col("__lpsum") / col("n_tokens")).as("nll"))
}
