package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFunctions

/** Domain tagging — classify every document to the most similar labeled
  * source with a multinomial naive-Bayes linear classifier over unigrams,
  * the published shape of pretraining-corpus quality/domain filters (GPT-3
  * trains a linear classifier against curated positives, Brown et al.
  * NeurIPS'20 §A; CCNet's fastText language/quality gates are the same
  * log-linear score, Wenzek et al. LREC'20). A trained model is one token
  * log-odds table per label — model-artifact state — so scoring 100 TB is
  * a single zero-shuffle projection: one [[graft.expressions.TokenWeightSum]]
  * kernel per label, an argmax, and a top-two margin as the confidence
  * signal.
  *
  * Per label s: score(d, s) = ln p(s) + Σ_i ln p_s(tok_i), summed in
  * document order (bit-reproducible). p_s(t) uses half-count additive
  * smoothing over the shared training vocabulary V:
  * (cnt_s(t) + 0.5) / (total_s + 0.5·(|V| + 1)), unseen tokens taking the
  * same formula at cnt 0 — so every probability is exactly replayable by a
  * SQL oracle. Ties break to the lexicographically smallest label.
  */
object DomainClassifier {

  /** Trained model: per-label priors and token log-probs, label-sorted. */
  final case class Model(labels: Seq[String], logPriors: Seq[Double],
      terms: Seq[String], logps: Seq[Seq[Double]], oovLogps: Seq[Double])

  /** Per-label token counts: (label, term, cnt) — one explode + one
    * map-side-combined groupBy, the [[UnigramLm.termCounts]] shape with
    * the label carried through.
    */
  def labelTermCounts(docs: DataFrame, labelCol: String,
      textCol: String): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(TextFunctions.hashAlignedTokens(col(textCol))).as("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("cnt"))

  /** Train on a labeled reference corpus and collect to driver state.
    * Priors are document-share ln(n_s / n); token tables are dense over
    * the shared vocabulary so each label's kernel can probe one map. All
    * logs are driver-side Math.log (bitwise DuckDB-`ln`-equal).
    */
  def train(ref: DataFrame, labelCol: String, textCol: String): Model = {
    val docCounts = ref.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val labels = docCounts.map(_._1).toSeq
    val nDocs = math.max(docCounts.map(_._2).sum, 1L).toDouble
    val logPriors = docCounts.map(r => math.log(r._2 / nDocs)).toSeq
    val cnts = labelTermCounts(ref, labelCol, textCol).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val terms = cnts.keysIterator.map(_._2).toSeq.distinct.sorted
    val vPlus1 = (terms.length + 1).toDouble
    val totals = labels.map(l =>
      l -> cnts.iterator.filter(_._1._1 == l).map(_._2).sum).toMap
    val logps = labels.map { l =>
      val denom = totals(l) + 0.5 * vPlus1
      terms.map(t => math.log((cnts.getOrElse((l, t), 0L) + 0.5) / denom))
    }
    val oovLogps = labels.map { l =>
      math.log(0.5 / (totals(l) + 0.5 * vPlus1))
    }
    Model(labels, logPriors, terms, logps, oovLogps)
  }

  /** Tag every document: (idCol, pred_label, margin). One projection pass —
    * a per-label kernel column, a deterministic argmax (score desc, label
    * asc), and margin = best − runner-up (0 for a single-label model).
    * Zero-token documents are unscorable and drop, as in the LM scorers.
    */
  def tag(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    require(model.labels.nonEmpty, "model must have at least one label")
    // ONE broadcast lexicon table shared by every label's kernel (slot i =
    // label i's log-probs): executors materialize the map once instead of
    // each task deserializing |labels| vocabulary-sized closures
    val table = graft.expressions.TokenWeightSum
      .broadcastTable(docs.sparkSession, model.terms, model.logps)
    val scoreCols: Seq[Column] = model.labels.indices.map { i =>
      (lit(model.logPriors(i)) +
        ColumnBridge.column(graft.expressions.TokenWeightSum(
          ColumnBridge.expression(col(textCol)),
          table, i, model.oovLogps(i))))
        .as(s"__s$i")
    }
    val scored = docs.select(
      (col(idCol) +:
        TextFunctions.hashAlignedTokenCount(col(textCol)).cast("long")
          .as("n_tokens") +:
        scoreCols): _*)
      .filter(col("n_tokens") > 0)
    // argmax over a sorted (score desc, label asc) struct array: the
    // label-ascending tie-break rides in the struct order, and the
    // runner-up falls out of the same sort for the margin
    val ranked = array_sort(array(model.labels.indices.map(i =>
      struct((-col(s"__s$i")).as("neg"), lit(model.labels(i)).as("lab"),
        col(s"__s$i").as("s"))): _*))
    scored.select(col(idCol), col("n_tokens"),
        ranked.as("__r"))
      .select(col(idCol), col("n_tokens"),
        col("__r")(0).getField("lab").as("pred_label"),
        (col("__r")(0).getField("s") -
          (if (model.labels.length > 1) col("__r")(1).getField("s")
           else col("__r")(0).getField("s"))).as("margin"))
  }
}
