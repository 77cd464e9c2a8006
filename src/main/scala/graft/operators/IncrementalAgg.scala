package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.OracleArith

/** Incremental view maintenance for materialized aggregates — refresh a
  * grouped count/sum table from a CDC delta at cost proportional to the
  * DELTA, never rescanning the base data (Gupta & Mumick, "Maintenance of
  * Materialized Views: Problems, Techniques, and Applications", IEEE Data
  * Eng. Bull. 1995 — the delta-propagation rule for distributive
  * aggregates). This is the refresh half of the CDC story: [[Cdc]] folds
  * a change feed into a base SNAPSHOT; this folds the same feed into the
  * snapshot's downstream AGGREGATES, which at 100 TB is the difference
  * between touching a day's changes and recomputing a month's gold table.
  *
  * Exactness: counts are long sums of ±1; value sums are EXACT DECIMAL
  * ([[OracleArith.dec2]]) so insert/delete contributions cancel without
  * float error and the refreshed state is bit-identical to a full
  * recompute — which is precisely the invariant the q238 gate's oracle
  * checks (DuckDB recomputes the post-delta aggregate from scratch; the
  * engine only ever sees base state + delta).
  *
  * Distributive aggregates (count/sum, avg = sum/count) maintain via
  * [[deltaState]]+[[refresh]]. NON-invertible aggregates (min/max,
  * distinct counts) cannot subtract a delete from a scalar; for those use
  * [[dirtyGroups]]+[[recomputeGroups]]+[[patch]] — re-aggregate ONLY the
  * groups the delta touched from the post-apply base (a semi-join the
  * scan can partition-prune on), splice them over the untouched state
  * rows. Cost: delta-sized shuffle + the dirty groups' share of the base,
  * not the whole table.
  *
  * Scale shape: [[deltaState]] is a map-side-combining groupBy over the
  * delta only; [[refresh]] one full-outer join on the group key (state
  * and delta-state both group-sized, both tiny next to data); groups
  * whose count reaches zero drop out, so a fully-deleted group leaves no
  * tombstone row.
  */
object IncrementalAgg {

  /** The materialized state: one row per group with `n` (row count) and
    * one exact-DECIMAL sum per (outName, valueCol) pair.
    */
  def state(df: DataFrame, groupCols: Seq[String],
      sums: Seq[(String, String)]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map { case (out, v) => sum(OracleArith.dec2(col(v))).as(out) }: _*)

  /** The delta's per-group contribution: `opCol` must be "insert" or
    * "delete" (an update is a delete of the old row + an insert of the
    * new one — the standard CDC decomposition). Signs ride inside the
    * aggregation, so the delta shuffles once at group granularity.
    */
  def deltaState(delta: DataFrame, opCol: String, groupCols: Seq[String],
      sums: Seq[(String, String)]): DataFrame = {
    val insert = col(opCol) === "insert"
    delta.groupBy(groupCols.map(col): _*)
      .agg(sum(when(insert, 1L).otherwise(-1L)).as("n"),
        sums.map { case (out, v) =>
          sum(when(insert, OracleArith.dec2(col(v)))
            .otherwise(-OracleArith.dec2(col(v)))).as(out)
        }: _*)
  }

  /** Merge a delta state into the materialized state: full-outer on the
    * group key, element-wise addition, zero-count groups dropped.
    * `sumCols` are the sum column names shared by both frames.
    */
  def refresh(state: DataFrame, deltaState: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val s = state.toDF(state.columns.map(c =>
      if (groupCols.contains(c)) c else s"s_$c"): _*)
    val d = deltaState.toDF(deltaState.columns.map(c =>
      if (groupCols.contains(c)) c else s"d_$c"): _*)
    s.join(d, groupCols, "full_outer")
      .select(groupCols.map(col) ++
        Seq((coalesce(col("s_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n")) ++
        sumCols.map(c =>
          (coalesce(col(s"s_$c"), lit(java.math.BigDecimal.ZERO).cast(OracleArith.Dec))
            + coalesce(col(s"d_$c"), lit(java.math.BigDecimal.ZERO).cast(OracleArith.Dec))).as(c)): _*)
      .filter(col("n") > 0)
  }

  /** The groups a delta touches — the recompute scope for non-invertible
    * aggregates.
    */
  def dirtyGroups(delta: DataFrame, groupCols: Seq[String]): DataFrame =
    delta.select(groupCols.map(col): _*).distinct()

  /** Re-aggregate ONLY the dirty groups from the post-apply base: the
    * semi-join restricts the scan (and partition-prunes when the base is
    * laid out on a group column) before the groupBy ever shuffles.
    */
  def recomputeGroups(baseAfter: DataFrame, dirty: DataFrame,
      groupCols: Seq[String], aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    baseAfter.join(dirty, groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Splice recomputed dirty groups over the untouched state rows. A
    * dirty group with no surviving base rows contributes nothing —
    * deletion falls out naturally.
    */
  def patch(state: DataFrame, recomputed: DataFrame, dirty: DataFrame,
      groupCols: Seq[String]): DataFrame =
    state.join(dirty, groupCols, "left_anti").unionByName(recomputed)
}
