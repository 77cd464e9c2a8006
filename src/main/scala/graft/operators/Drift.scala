package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift monitoring: which terms changed frequency most between two
  * snapshots of a rolling corpus build — the report an operator reads when
  * a new dump lands ("why did quality scores move? what is this dump full
  * of?") before recipes and filters are re-tuned.
  *
  * Deliberately transcendental-free: the drift metric is the larger of the
  * smoothed relative-rate ratio and its reciprocal (monotone in |log
  * ratio|, so the ranking is the standard log-odds one) — plain IEEE
  * add/divide on integer counts, bitwise reproducible across engines,
  * which keeps the report oracle-exact where an `ln`-based score computed
  * distributed would drift in the last ulp (Spark's `log` is StrictMath).
  *
  * Scale shape: two token explodes with map-side-combined counts
  * (vocabulary-sized output), one vocabulary-sized full-outer join, one
  * tiny scalar aggregate, and a TakeOrderedAndProject top-k — the corpus
  * is scanned once per snapshot and never shuffled. The joined count frame
  * has two consumers (scalar totals + the ranked output), so it is
  * materialized once via an eager localCheckpoint — vocabulary-sized
  * blocks, reclaimed by the ContextCleaner when the result frame is
  * dropped; without it both consumers would re-run the corpus scans.
  */
object Drift {

  /** Top-`topK` terms by frequency drift from `oldDocs` to `newDocs`:
    * (term, cnt_old, cnt_new, ratio, drift) where
    * `ratio = rate_new / rate_old` under additive smoothing over the union
    * vocabulary (`rate = (cnt + alpha) / (total + alpha * |V|)`) and
    * `drift = max(ratio, 1/ratio)`. New-only terms surface through the
    * smoothing floor rather than dividing by zero; ties break on the term.
    */
  def termDrift(oldDocs: DataFrame, newDocs: DataFrame, textCol: String,
      alpha: Double = 0.5, topK: Int = 100): DataFrame = {
    val co = UnigramLm.termCounts(oldDocs, textCol)
      .withColumnRenamed("cnt", "cnt_old")
    val cn = UnigramLm.termCounts(newDocs, textCol)
      .withColumnRenamed("cnt", "cnt_new")
    val joined = co.join(cn, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
        coalesce(col("cnt_new"), lit(0L)).as("cnt_new"))
      .localCheckpoint(true)
    val stats = joined
      .agg(sum(col("cnt_old")).as("t_old"), sum(col("cnt_new")).as("t_new"),
        count(lit(1)).as("v"))
      .head
    // empty-side totals are legal (first snapshot); smoothing keeps every
    // rate positive as long as the union vocabulary is non-empty
    val (tOld, tNew, v) =
      (if (stats.isNullAt(0)) 0L else stats.getLong(0),
        if (stats.isNullAt(1)) 0L else stats.getLong(1),
        stats.getLong(2))
    val ratio = ((col("cnt_new") + alpha) / (tNew + alpha * v)) /
      ((col("cnt_old") + alpha) / (tOld + alpha * v))
    joined
      .withColumn("ratio", ratio)
      .withColumn("drift", greatest(col("ratio"), lit(1.0) / col("ratio")))
      .orderBy(col("drift").desc, col("term").asc)
      .limit(topK)
  }
}
