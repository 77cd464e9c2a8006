package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT quantiles of an integral column at corpus scale, computed in the
  * VALUE domain: aggregate (group, value) → count first, then walk the
  * ordered distinct values — per-group state is bounded by the distinct-
  * value count (token/char counts: thousands), not the row count, so the
  * exact answer survives 100 TB where a per-group value multiset
  * ([[Outliers.madOutliers]]'s percentile) or a full sort does not, and
  * without the error bar approx_percentile trades away. The standard
  * length-distribution audit (deciles of document length per source) needs
  * exactly this shape.
  *
  * Interpolation is type-7 (h = q·(n−1), linear between the two covering
  * values) — the same rule as Spark's `percentile`, NumPy's default and
  * DuckDB's `quantile_cont`; QuantilesSpec pins agreement with Spark's own
  * `percentile` aggregate. The arithmetic after the integer counts is a
  * fixed IEEE dag, so an oracle replaying the same windowed walk matches
  * bit-for-bit.
  *
  * Shuffle shape: one map-side-combining groupBy on (group, value); the
  * prefix windows then run over DISTINCT-VALUE rows only (partitioned by
  * group — never a single global partition), and each requested q picks
  * its two covering rows with a scan-level filter. `n − 1 < 2^53` keeps
  * the double index exact — beyond that, row indices themselves stop
  * fitting in doubles and q·(n−1) would need decimal arithmetic.
  */
object Quantiles {

  /** (groupCols*, q, quantile) for every distinct q in `qs` over the
    * integral `valueCol`. NULL values are ignored (the `percentile`/
    * `quantile_cont` contract — they carry no position in the order
    * statistic); a group whose values are all NULL disappears. A
    * single-value group returns that value for every q.
    *
    * Single-pass: the row covering index lo = ⌊h⌋ also knows the hi = ⌈h⌉
    * value — its own when hi is still inside this value's index range,
    * its ordered successor's (lead) when h crosses into the next distinct
    * value — so each quantile is one scan-level filter over the windowed
    * counts, with no lo/hi self-join re-executing the aggregate.
    */
  def exactIntQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double]): DataFrame = {
    val qds = qs.distinct
    require(qds.nonEmpty && qds.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val counts = df.filter(v.isNotNull)
      .groupBy(gcols :+ v.as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val byGroup = Window.partitionBy(gcols: _*)
    val ordered = byGroup.orderBy(col("__v"))
    // inclusive prefix of row indices: this value covers [cum−c, cum)
    val pref = counts
      .withColumn("__cum", sum(col("__c")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(byGroup))
      .withColumn("__next", lead(col("__v"), 1).over(ordered))
    pref.select(gcols ++ Seq(col("__v"), col("__c"), col("__cum"), col("__n"),
        col("__next"), explode(array(qds.map(lit): _*)).as("q")): _*)
      .withColumn("__h", col("q") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__h")))
      .filter(col("__lo") >= col("__cum") - col("__c") && col("__lo") < col("__cum"))
      .withColumn("__vhi",
        when(ceil(col("__h")) < col("__cum"), col("__v")).otherwise(col("__next")))
      .select(gcols ++ Seq(col("q"),
        (col("__v").cast("double") + (col("__h") - col("__lo"))
          * (col("__vhi") - col("__v")).cast("double")).as("quantile")): _*)
  }

  /** Per-group ROBUST standardization: (x − median) / IQR — the
    * outlier-immune complement of [[Outliers.groupZScore]] (one fat-tailed
    * document wrecks a mean/stddev scale; the quartiles shrug it off),
    * over the same exact value-domain quantile walk, so it stays engine-
    * exact and feasible at corpus scale. Adds `median`, `iqr` and
    * `robust_z` to every row. NULL values score NULL; a zero-IQR group
    * (over half the mass on one value) gets robust_z = 0 rather than a
    * division blow-up. The quartile table is group-count-sized and rides
    * back on a broadcast join.
    */
  def robustScale(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val quartiles = exactIntQuantiles(df, groupCols, valueCol,
        Seq(0.25, 0.5, 0.75))
      .groupBy(gcols: _*)
      .agg(
        max(when(col("q") === 0.25, col("quantile"))).as("__q1"),
        max(when(col("q") === 0.5, col("quantile"))).as("median"),
        max(when(col("q") === 0.75, col("quantile"))).as("__q3"))
      .withColumn("iqr", col("__q3") - col("__q1"))
      .drop("__q1", "__q3")
    // LEFT join: a group whose values are ALL NULL has no quartile row
    // (NULLs are filtered before the walk) — an inner join would silently
    // DROP that group's rows, where the contract (same as groupZScore's)
    // is to keep them scored NULL
    df.join(broadcast(quartiles), groupCols, "left")
      .withColumn("robust_z",
        when(v.isNull || col("median").isNull, lit(null).cast("double"))
          .when(col("iqr") > 0.0, (v.cast("double") - col("median")) / col("iqr"))
          .otherwise(0.0))
  }
}
