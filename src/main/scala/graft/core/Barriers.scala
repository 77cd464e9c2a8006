package graft.core

import org.apache.spark.sql.DataFrame

/** Eager lineage-truncation barrier with a pluggable durability level.
  *
  * `localCheckpoint(true)` truncates a compounding plan (iterative loops,
  * long IVM folds) at minimum cost, but stores the blocks on executors
  * with NO lineage to recompute from: on a cluster, one lost executor
  * (preemption, OOM kill, dynamic deallocation) fails the whole job
  * instead of recomputing a partition — Spark's own scaladoc flags exactly
  * this. At bench scale (one local JVM, no executor loss) that trade is
  * free; on a 100 TB run it is an availability regression.
  *
  * So the barrier is configurable: set `spark.graft.checkpointDir` (a
  * runtime conf — any HDFS-compatible path) and every cut becomes a
  * reliable `checkpoint(true)` that survives executor loss; leave it unset
  * (the local/bench default) and cuts stay local. Results are identical
  * either way — only where the materialized partitions live changes.
  */
object Barriers {

  /** Runtime conf key holding the reliable-checkpoint directory. */
  val ConfKey = "spark.graft.checkpointDir"

  /** Materialize `df` eagerly and truncate its lineage — reliable
    * checkpoint when [[ConfKey]] is set, local checkpoint otherwise.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.get(ConfKey, "")
    if (dir.isEmpty) df.localCheckpoint(true)
    else {
      val sc = spark.sparkContext
      // Dataset.checkpoint requires the SparkContext-level dir; align it
      // with the session conf (idempotent when unchanged)
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint(true)
    }
  }
}
