package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry of the range-shard caches the two-phase prefix-sum operators
  * ([[Curriculum.withGlobalRank]], [[Packing.withGlobalOffsets]]) pin.
  * Those caches are correctness pins, not optimizations — the driver-side
  * prefix map and the per-shard window phase must see the SAME sampled
  * shard boundaries, and a recompute would resample them — so they cannot
  * be released at call time; they are released here.
  *
  * Lifecycle: [[release]] unpersists everything a session accumulated
  * (call once ranked/packed results are fully consumed). Sessions that
  * instead drop blocks externally (`spark.catalog.clearCache()` — what
  * the Bench/Verify harnesses do per query) leave dead plan references
  * behind; [[register]] self-prunes those on every call, so a long-lived
  * session's registry stays bounded by its LIVE caches rather than
  * growing once per operator invocation.
  */
private[graft] object ShardCaches {

  private val registry =
    scala.collection.mutable.Map.empty[
      SparkSession, scala.collection.mutable.ListBuffer[DataFrame]]

  def register(df: DataFrame): Unit = registry.synchronized {
    val buf = registry.getOrElseUpdate(df.sparkSession,
      scala.collection.mutable.ListBuffer.empty)
    // entries whose blocks are already gone (external clearCache) hold
    // only plan references — sweep them instead of accumulating forever
    buf.filterInPlace(_.storageLevel != StorageLevel.NONE)
    buf += df
    // sessions emptied by the sweep (e.g. stopped test sessions) release
    // their map entry too
    registry.filterInPlace((_, b) => b.nonEmpty)
  }

  def release(spark: SparkSession): Unit = registry.synchronized {
    registry.remove(spark).foreach(_.foreach(_.unpersist(false)))
  }

  /** Registered live-cache count for `spark` — lifecycle tests only. */
  private[graft] def liveCount(spark: SparkSession): Int = registry.synchronized {
    registry.get(spark)
      .map(_.count(_.storageLevel != StorageLevel.NONE)).getOrElse(0)
  }
}
