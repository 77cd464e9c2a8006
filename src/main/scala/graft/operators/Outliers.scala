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
