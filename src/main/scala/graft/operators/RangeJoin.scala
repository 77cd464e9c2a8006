package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: match fact rows to dimension intervals
  * `[lo, hi)` without the nested-loop plan Spark produces for a raw
  * range predicate.
  *
  * Bin trick: pick a bin width, tag each fact row with its bin
  * `floor(value / w)`, explode each interval into every bin it overlaps,
  * equi-join on the bin, and re-check the exact predicate. The range join
  * becomes a hash join whose cost is fact + Σ interval-width/w — the
  * standard scale-out for interval joins (point-in-interval case).
  */
object RangeJoin {

  /** @param intervals columns (..., loCol, hiCol); hi exclusive */
  def binnedPointInInterval(fact: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0 && !binWidth.isInfinite,
      s"binWidth must be a positive finite number, got $binWidth")
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    fact
      .withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval OVERLAP join — both sides are interval relations, matched when
    * `[a_lo, a_hi) ∩ [b_lo, b_hi) ≠ ∅`. Same bin trick applied to both
    * sides: each interval explodes into the bins it covers, bins equi-join
    * (hash, co-partitioned — never a nested loop), and the exact overlap
    * predicate re-checks. A pair overlapping k shared bins would appear k
    * times, so the join keeps only the pair's FIRST shared bin (the max of
    * the two start bins) — an arithmetic dedup, no distinct shuffle.
    * Cost: Σ widths/binWidth rows per side; pick binWidth near the median
    * interval width so each interval explodes into O(1) bins.
    */
  def binnedIntervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0 && !binWidth.isInfinite,
      s"binWidth must be a positive finite number, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("__bin"))
      // exact overlap (half-open)
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      // first-shared-bin dedup: emit the pair only from the bin where both
      // intervals are first simultaneously present
      .filter(col("__bin") === greatest(
        floor(col(aLo) / binWidth).cast("long"),
        floor(col(bLo) / binWidth).cast("long")))
      .drop("__bin")
  }
}
