package graft.core

import org.apache.spark.sql.SparkSession

/** Cleanup for gate/bench artifacts that are intentionally written to disk
  * (roundtrip gates prove on-disk semantics, so they must materialize).
  * Artifact names embed the Spark applicationId; each run sweeps PRIOR runs'
  * leftovers — its own are left in place while live — so repeated
  * Verify/Bench invocations stay bounded at one artifact set instead of
  * accumulating until the warehouse or /tmp fills.
  */
object Housekeeping {

  /** Drop catalog tables starting with `prefix`, except those carrying
    * `keepSuffix` (the current app's own artifacts) and anything created
    * within the last hour — a CONCURRENT run's live tables (including its
    * in-flight `__stage_` tables, which share the prefix) must not be
    * dropped mid-query, mirroring [[cleanStaleTmpDirs]]'s age guard.
    */
  def dropStaleTables(spark: SparkSession, prefix: String, keepSuffix: String): Unit = {
    val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
    spark.catalog.listTables().collect()
      .map(_.name)
      .filter(n => n.startsWith(prefix) && !n.endsWith(keepSuffix))
      .filter { n =>
        try spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(n))
          .createTime < cutoff
        catch { case _: Exception => false } // vanished/external: leave it
      }
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** Delete `java.io.tmpdir` entries starting with `prefix`, except the
    * current app's (`keepSuffix`) and anything modified within the last
    * hour — a concurrent run's live artifacts must not be swept.
    */
  def cleanStaleTmpDirs(prefix: String, keepSuffix: String): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) &&
        !f.getName.endsWith(keepSuffix) && f.lastModified() < cutoff)
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** The applicationId sanitized for use in table/directory names. */
  def appTag(spark: SparkSession): String =
    spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
}
