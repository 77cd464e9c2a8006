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
}
