package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust outlier detection: flag values more than `k` median-absolute-
  * deviations from their group's median — the skew-immune alternative to
  * mean/stddev z-scores (one fat-tailed claim wrecks a mean; the median and
  * MAD shrug it off), which is what an insurance-amount or price-drift
  * quality rule actually needs.
  *
  * Two passes by construction (the MAD is a median OF deviations from the
  * median): each pass is one aggregate on the group key plus a broadcast
  * join of the tiny per-group statistic back onto the rows. [[madOutliers]]
  * uses exact interpolated medians — per-group state is the group's value
  * multiset, fine when groups are bounded (dashboards, per-category rules)
  * and required for engine-exact oracles. [[madOutliersApprox]] swaps in
  * approx_percentile (t-digest-style sketch, constant state per group) — the
  * same dataflow at unbounded group sizes, which is the 100 TB path.
  */
object Outliers {

  /** Rows of `df` with `median`, `mad` and boolean `is_outlier` columns
    * attached, grouped by `groupCols`; `k` is the MAD multiplier (a common
    * robust default is 3).
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double): DataFrame =
    withMadFlags(df, groupCols, valueCol, k,
      c => percentile(c, lit(0.5)))

  /** Sketch-based variant for unbounded groups: same contract, approximate
    * median/MAD (`accuracy` as in approx_percentile).
    */
  def madOutliersApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double, accuracy: Int = 10000): DataFrame =
    withMadFlags(df, groupCols, valueCol, k,
      c => approx_percentile(c, lit(0.5), lit(accuracy)))

  /** Per-group z-score standardization of an INTEGRAL column — how
    * heterogeneous quality signals are put on one scale before mixing
    * ("length z-score within source", Gopher-style per-domain cuts). Adds
    * `mean`, `std` (population) and `z` to every row.
    *
    * Engine-exact by construction: the only aggregates are integer sums
    * (count, Σx, Σx²), which every engine computes identically; the
    * mean/variance/z arithmetic is then a fixed dag of IEEE double ops
    * (correctly rounded, engine-independent). A naive avg/stddev over
    * doubles would drift with partition arrival order. Contract: `valueCol`
    * integral with Σx² inside long range (document char/token counts are;
    * values ≥ 2^31-ish need a pre-scale). NULL values carry no mass: they
    * are excluded from the moments (count(v), like AVG/STDDEV would) and
    * score z = NULL — unscorable, not zero. Degenerate groups (constant
    * value, one row) get z = 0 rather than NaN. One map-side-combining
    * aggregate + one broadcast join — same shape as [[madOutliers]] but
    * single-pass.
    */
  def groupZScore(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val stats = df.groupBy(gcols: _*)
      .agg(count(v).as("__n"), sum(v).as("__s"), sum(v * v).as("__sq"))
    val mean = col("__s").cast("double") / col("__n")
    val msq = col("__sq").cast("double") / col("__n")
    val variance = msq - mean * mean
    df.join(broadcast(stats), groupCols)
      .withColumn("mean", mean)
      .withColumn("std", when(variance > 0.0, sqrt(variance)).otherwise(0.0))
      .withColumn("z",
        when(v.isNull, lit(null).cast("double"))
          .when(variance > 0.0, (v.cast("double") - mean) / sqrt(variance))
          .otherwise(0.0))
      .drop("__n", "__s", "__sq")
  }

  private def withMadFlags(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Double, median: Column => Column): DataFrame = {
    val gcols = groupCols.map(col)
    val med = df.groupBy(gcols: _*)
      .agg(median(col(valueCol)).as("median"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed.groupBy(gcols: _*)
      .agg(median(abs(col(valueCol) - col("median"))).as("mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn("is_outlier",
        abs(col(valueCol) - col("median")) > lit(k) * col("mad"))
  }
}
