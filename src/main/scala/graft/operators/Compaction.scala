package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingest, per-batch appends and
  * fine-grained partitioning all shed thousands of KB-sized files, and at
  * read time each file costs a task schedule, a footer parse and an open —
  * the classic small-file problem that quietly dominates scan latency.
  * Rewrites a frame into evenly-sized files at a declared target. Reference
  * scope: the reference delegates layout maintenance to Delta OPTIMIZE
  * (managed service); this is the engine-level equivalent.
  *
  * Sizing is records-based and exact: one count, then a round-robin
  * repartition into ⌈n / target⌉ even partitions, each under the
  * `maxRecordsPerFile` cap so every task emits exactly one file. (A
  * bytes-based target would need the writer's post-encoding size, which is
  * only estimable before the write — plan stats track in-memory width, off
  * by the codec factor; records are the honest deterministic unit, and
  * callers convert via their known bytes-per-row.) The shuffle IS the
  * point: without it, `maxRecordsPerFile` alone caps file size but cannot
  * merge the thousands of small inputs upward.
  */
object Compaction {

  /** Rewrite `df` at `path` (parquet, overwrite) as ⌈n / targetRecords⌉
    * files of ≤ `targetRecords` rows each (even ±1 spread), and return the
    * read-back frame. Row SET is preserved exactly; row-to-file assignment
    * is round-robin and not part of the contract (CompactionSpec pins the
    * file count and content fidelity).
    */
  def compactToTarget(df: DataFrame, path: String,
      targetRecords: Long): DataFrame = {
    require(targetRecords > 0, s"targetRecords must be positive: $targetRecords")
    val n = df.count()
    val parts = math.max(1L, (n + targetRecords - 1) / targetRecords).toInt
    df.repartition(parts)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecords)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
