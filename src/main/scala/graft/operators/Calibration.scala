package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier calibration audit — the report read before a quality
  * classifier's score is turned into a KEEP/DROP threshold over a corpus
  * (Guo et al., ICML'17 "On Calibration of Modern Neural Networks"). A
  * filter admitting "p ≥ 0.9 quality" rows admits garbage if the model
  * says 0.9 where the empirical positive rate is 0.6; the reliability
  * table makes that visible per score bin, and ECE condenses it to one
  * number a pipeline gate can threshold.
  *
  * Bins are FIXED logit-space edges supplied by the caller — binning by
  * raw logit with literal edges keeps the per-row work a codegen CASE
  * chain and the whole table one map-side-combining aggregate (bin
  * cardinality = edges.length - 1, never corpus-sized). The predicted
  * confidence per bin is the sigmoid of the bin midpoint, computed ONCE
  * on the driver and embedded as a literal — no per-row transcendental,
  * and the one non-correctly-rounded op (exp) never runs inside either
  * engine, so the report is oracle-exact. Out-of-range logits clamp into
  * the end bins (a calibration audit must account for every scored row).
  *
  * ECE sums |pos_rate - conf| weighted by bin mass IN BIN ORDER (an
  * ordered fold over the bins-sized table), so the float total is
  * bit-reproducible on any partitioning.
  */
object Calibration {

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Per-bin reliability rows: (bin, bin_lo, bin_hi, conf, n, positives,
    * pos_rate). `edges` must be strictly increasing with at least two
    * entries; bin i covers [edges(i), edges(i+1)) with both end bins
    * absorbing out-of-range scores.
    */
  def reliability(scored: DataFrame, logitCol: String, label: Column,
      edges: Array[Double]): DataFrame = {
    require(edges.length >= 2 && edges.sliding(2).forall(p => p(0) < p(1)),
      s"edges must be strictly increasing, got ${edges.mkString(",")}")
    val nBins = edges.length - 1
    // clamped CASE chain — checks edges ASCENDING (foldRight keeps the
    // smallest edge outermost), so the first interior edge exceeding the
    // logit wins, exactly like a SQL CASE written in edge order
    val bin = (1 until nBins).foldRight(lit(nBins - 1): Column) { (i, acc) =>
      when(col(logitCol) < edges(i), i - 1).otherwise(acc)
    }
    val lo = edges.dropRight(1)
    val hi = edges.drop(1)
    val conf = lo.zip(hi).map { case (a, b) => sigmoid((a + b) / 2.0) }
    def byBin(vals: Array[Double]): Column =
      vals.zipWithIndex.foldLeft(lit(vals(0))) { case (acc, (v, i)) =>
        when(col("bin") === i, v).otherwise(acc)
      }
    scored
      // a NULL logit would fall through every when() into the top bin's
      // otherwise() and be audited at the HIGHEST midpoint confidence —
      // unscored rows are excluded instead, the same contract (and
      // rationale) as Roc.auc's NULL-score exclusion
      .filter(col(logitCol).isNotNull)
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("positives"))
      .withColumn("bin_lo", byBin(lo))
      .withColumn("bin_hi", byBin(hi))
      .withColumn("conf", byBin(conf))
      .withColumn("pos_rate",
        col("positives").cast("double") / col("n").cast("double"))
      .select("bin", "bin_lo", "bin_hi", "conf", "n", "positives", "pos_rate")
  }

  /** Expected calibration error over a [[reliability]] table: one row
    * (n_total, ece). The weighted-gap sum folds the bins-sized table in
    * bin order (sort_array + sequential fold), so the double total is
    * partition-independent — the same ordered-sum discipline as the LM
    * scoring kernels, at bins-count cost.
    */
  def ece(rel: DataFrame): DataFrame =
    rel.agg(
        sum(col("n")).as("n_total"),
        sort_array(collect_list(struct(col("bin"),
          (abs(col("pos_rate") - col("conf")) * col("n").cast("double"))
            .as("term")))).as("__t"))
      .select(col("n_total"),
        (aggregate(col("__t"), lit(0.0),
          (acc, t) => acc + t.getField("term"))
          / col("n_total").cast("double")).as("ece"))
}
