package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering: rank every document in a global difficulty order and
  * cut the order into `n` equal-width buckets — the "train on easy documents
  * first" schedule of a curriculum-learning pipeline, plus the percentile
  * position each document holds in the corpus.
  *
  * Scale design: the global rank is a distributed prefix sum over
  * range-sharded data (same two-phase shape as
  * [[Packing.withGlobalOffsets]]), NOT an unpartitioned
  * `Window.orderBy(...)` — a global window funnels the whole corpus through
  * one task. Phase 1 range-partitions on the order columns and collects one
  * row count per shard (driver state the size of the shard count); phase 2
  * adds each shard's exclusive prefix to a within-shard `row_number`, so
  * every task ranks only its own slice. Ranks depend only on the order
  * columns, so the result is deterministic regardless of where the range
  * sampler places shard boundaries.
  *
  * Buckets use the explicit formula `(rank-1) * n div total + 1` rather than
  * an engine `NTILE` (whose remainder-distribution differs between
  * implementations); percentile is the explicit `(rank-1) / (total-1)`. Both
  * are exact-integer arithmetic plus one deterministic division, so two
  * engines agree bit-for-bit.
  */
object Curriculum {

  /** Unpersist every shard cache this session accumulated through the
    * prefix-sum operators (Curriculum, Packing, and the rank-based ops
    * built on them: SortedNeighborhood, Vocabulary, tokenBudgetFill).
    * Call only after the ranked results have been fully consumed — a plan
    * still pending over a released cache recomputes with FRESH sampled
    * boundaries and would rank inconsistently. Registry bookkeeping
    * (including self-pruning after an external `clearCache()`) lives in
    * [[ShardCaches]].
    */
  def releaseCaches(spark: org.apache.spark.sql.SparkSession): Unit =
    ShardCaches.release(spark)

  /** Each row with its global 1-based rank in `orderCols` order (column
    * `rank`) and the corpus row count (column `total`). The order must be a
    * total order (include a unique tie-break column) for the rank to be
    * well-defined.
    *
    * Cache lifecycle: the range-sharded corpus is persisted because the
    * per-shard counts (phase 1) and the within-shard ranking (phase 2) MUST
    * see the same sampled shard boundaries — a recompute would resample
    * them and desynchronize the prefix map, so the cache is a correctness
    * pin, not an optimization, and is deliberately NOT auto-released.
    * Long-lived sessions calling rank-based operators repeatedly should
    * call [[releaseCaches]] once the ranked results are fully consumed
    * (the Bench/Verify drivers clear the cache between queries).
    */
  def withGlobalRank(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val shard = "graft_cur_shard"
    // shared two-phase scaffolding (persist pin, cache registration,
    // prefix fold) lives in ShardedScan; counts scan, row_number ranks
    val s = ShardedScan.prefix(df, orderCols, shard, count(lit(1)), 0L, _ + _)
    val withinShard = Window.partitionBy(shard).orderBy(orderCols.map(col): _*)
    s.frame
      .withColumn("rank",
        s.prefixLookup + row_number().over(withinShard).cast("long"))
      .withColumn("total", lit(s.folded))
      .drop(shard)
  }

  /** Equal-width curriculum buckets 1..`n` over the global `orderCols` rank,
    * with the document's exact percentile position (`pct_rank`, 0 for a
    * single-row corpus).
    */
  def buckets(df: DataFrame, orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"bucket count must be >= 1, got $n")
    withGlobalRank(df, orderCols)
      // integer div (not double-divide-then-truncate): exact at any scale
      .withColumn("bucket", expr(s"((rank - 1) * $n) div total + 1"))
      .withColumn("pct_rank",
        when(col("total") > 1,
          (col("rank") - 1).cast("double") / (col("total") - 1))
          .otherwise(lit(0.0)))
  }
}
