package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.IncrementalAgg

/** Continuous incremental view maintenance: a materialized grouped
  * count/sum view kept current from a CDC delta STREAM — the streaming
  * twin of [[graft.operators.IncrementalAgg]] (q238's batch rule), so the
  * gold table refreshes at delta cost forever instead of on a rescan
  * schedule.
  *
  * Exactly-once without a transaction log: foreachBatch is at-least-once
  * by contract, so the state is VERSIONED — batch B reads the newest
  * committed state version strictly below B and overwrites `v=B`. A
  * replayed batch re-reads the same predecessor and rewrites its own
  * version, never double-applying; a crash mid-write leaves a version
  * without parquet's `_SUCCESS` marker, which readers skip. Because
  * Structured Streaming serializes micro-batches per query, the
  * predecessor of B is always complete before B runs. The version chain
  * doubles as time travel for the view (the q194 pattern applied to
  * maintained state).
  *
  * Scale shape: each micro-batch shuffles only the delta at group
  * granularity plus a group-sized full-outer merge — state size is the
  * number of live groups, independent of how much history the stream has
  * absorbed. Sums stay exact DECIMAL end to end, so the maintained view
  * is bit-identical to a from-scratch recompute after ANY prefix of
  * batches — the invariant [[foldRefresh]] (the gate's batch twin) and
  * the restart spec pin.
  */
object IvmStream {

  /** Sequential multi-batch refresh — the deterministic batch twin of
    * [[maintainAggStream]]: folds each delta chunk through
    * deltaState+refresh in order. Refresh composes (state after chunks
    * c1..cn equals one-shot refresh of c1∪..∪cn equals full recompute),
    * which is exactly what lets a stream maintain the view chunk by
    * chunk.
    */
  def foldRefresh(base: DataFrame, deltaChunks: Seq[DataFrame],
      opCol: String, groupCols: Seq[String],
      sums: Seq[(String, String)]): DataFrame =
    deltaChunks.foldLeft(base) { (state, d) =>
      IncrementalAgg.refresh(state,
        IncrementalAgg.deltaState(d, opCol, groupCols, sums),
        groupCols, sums.map(_._1))
    }

  /** Newest committed state version strictly below `before` (None = the
    * view has absorbed no batch yet). Commit = the directory's parquet
    * `_SUCCESS` marker; a half-written version from a crash is invisible.
    */
  def latestState(spark: SparkSession, statePath: String,
      before: Long = Long.MaxValue): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val versions =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory &&
          fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
        .filter(_ < before)
    if (versions.isEmpty) None
    else Some(spark.read.parquet(s"$statePath/v=${versions.max}"))
  }

  /** Maintain the view from a CDC delta stream. `baseState` is the
    * initial materialization ([[IncrementalAgg.state]] of the base
    * table); each micro-batch advances the newest committed version by
    * its own delta. Caller starts/stops the returned writer.
    */
  def maintainAggStream(deltas: DataFrame, baseState: DataFrame,
      statePath: String, checkpointDir: String, opCol: String,
      groupCols: Seq[String], sums: Seq[(String, String)]): DataStreamWriter[Row] =
    deltas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prev = latestState(spark, statePath, before = batchId)
          .getOrElse(baseState)
        IncrementalAgg.refresh(prev,
            IncrementalAgg.deltaState(batch, opCol, groupCols, sums),
            groupCols, sums.map(_._1))
          .write.mode("overwrite").parquet(s"$statePath/v=$batchId")
      }
}
