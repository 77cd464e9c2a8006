package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of DISTINCT-COUNT view columns via mergeable
  * KMV sketches — the summary-maintenance half the count/sum rules of
  * [[IncrementalAgg]] cannot cover: COUNT(DISTINCT) is not distributive,
  * but its bottom-k synopsis is MERGEABLE under inserts (the k smallest
  * of A ∪ B are computable from the two k-smallest sets alone — Beyer et
  * al., "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD 2007), so an insert-only CDC batch refreshes the
  * view by a sketch-sized array merge, never rescanning the base.
  * Deletes cannot be subtracted from a synopsis (the non-invertible case
  * of Gupta & Mumick 1995), so delete-touched groups take
  * [[IncrementalAgg]]'s q240 dirty-group path: re-sketch ONLY those
  * groups from the post-apply base via a semi-join-restricted scan and
  * splice over the untouched rows.
  *
  * The sketch is the md5-60-bit KMV family ([[KmvSketch]]), so the
  * maintained estimate is bit-replayable in DuckDB from the post-delta
  * base — the q255 gate's oracle recomputes every group's bottom-k from
  * scratch and hash-compares estimates, proving BOTH maintenance paths
  * (merge and dirty-recompute) land exactly where a full rebuild would.
  *
  * Scale shape: view state is ≤ k longs per group; an insert batch costs
  * one delta-sized sketch aggregation ([[KmvSketch.sketchAgg]]'s
  * k-bounded map-side-combining buffer) plus a group-sized array merge;
  * deletes cost the dirty groups' share of the base, which a base laid
  * out on the group column partition-prunes.
  */
object IncrementalDistinct {

  /** The materialized view: one row per group, `kmv` = the sorted array
    * of the ≤ k smallest distinct h60 hashes of `keyCol` (exhaustive —
    * and the estimate exact — while the group has < k distinct keys).
    */
  def state(df: DataFrame, keyCol: String, groupCol: String, k: Int): DataFrame =
    KmvSketch.sketchAgg(df, keyCol, groupCol, k)
      .groupBy(groupCol)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))

  private def emptyArr: Column = array().cast("array<bigint>")

  /** Exact KMV union: k smallest of the merged distinct hash sets. */
  private def merge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(
      coalesce(a, emptyArr), coalesce(b, emptyArr)))), 1, k)

  /** Refresh the view from one CDC batch split into `inserts` and
    * `deletes` (rows shaped like the base): groups untouched by deletes
    * merge the inserts' sketch (delta cost); delete-touched groups
    * re-sketch from `baseAfter` restricted by semi-join (dirty cost). A
    * dirty group with no surviving rows drops out; a brand-new group
    * enters through the merge's full-outer seam.
    */
  def refresh(view: DataFrame, baseAfter: DataFrame,
      inserts: DataFrame, deletes: DataFrame,
      keyCol: String, groupCol: String, k: Int): DataFrame = {
    val dirty = deletes.select(col(groupCol)).distinct()
    val insSketch = state(inserts, keyCol, groupCol, k)
    val cleanState = view.join(dirty, Seq(groupCol), "left_anti")
      .withColumnRenamed("kmv", "a")
    val cleanIns = insSketch.join(dirty, Seq(groupCol), "left_anti")
      .withColumnRenamed("kmv", "b")
    val merged = cleanState.join(cleanIns, Seq(groupCol), "full_outer")
      .select(col(groupCol), merge(col("a"), col("b"), k).as("kmv"))
    val recomputed = state(
      baseAfter.join(dirty, Seq(groupCol), "left_semi"), keyCol, groupCol, k)
    merged.unionByName(recomputed)
  }

  /** Distinct-cardinality reads off the maintained view: exact count
    * when the sketch is exhaustive (n_mins < k), else (k−1)/τ with
    * τ = h_(k)/2^60 — the same arithmetic [[KmvSketch.estimate]] reads
    * off sketch rows, so the estimate replays bitwise in SQL.
    */
  def estimates(view: DataFrame, groupCol: String, k: Int): DataFrame =
    view.select(col(groupCol),
      size(col("kmv")).cast("long").as("n_mins"),
      when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
        .otherwise(lit((k - 1).toDouble * KmvSketch.HashSpace) /
          element_at(col("kmv"), k).cast("double"))
        .as("kmv_estimate"))
}
