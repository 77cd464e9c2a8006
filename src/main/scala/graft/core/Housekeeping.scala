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

  private val exitSweepInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Register a JVM shutdown hook that deletes THIS app's on-disk gate
    * artifacts — `graft_*<tag>` entries in java.io.tmpdir and in the Spark
    * warehouse directory (the managed-table data of an in-memory catalog,
    * which would otherwise outlive the JVM that owns it). Closes the gap the
    * age-guarded [[cleanStaleTmpDirs]]/[[dropStaleTables]] sweeps leave: a
    * crashed gate's residue used to sit for an hour until the NEXT run swept
    * it; now the owning JVM removes it on the way out. Idempotent; hooks run
    * even when a gate threw mid-write (any exit except a hard kill).
    *
    * The `graft_keep_` prefix is exempt: those artifacts are read AFTER the
    * JVM exits (the q220 oracle replays a parquet footer in DuckDB once
    * Verify has terminated) and are cleaned by the age-guarded sweep instead.
    */
  def installExitSweep(spark: SparkSession): Unit =
    if (exitSweepInstalled.compareAndSet(false, true)) {
      val tag = appTag(spark)
      val warehouse = warehouseDir(spark)
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => sweepAppArtifacts(tag, warehouse), "graft-exit-sweep"))
    }

  /** The sweep itself, separated so a spec can prove a crashed gate leaves
    * no residue without tearing down the JVM.
    */
  private[graft] def sweepAppArtifacts(tag: String,
      warehouse: Option[java.io.File]): Unit = {
    def sweep(dir: java.io.File): Unit =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_") &&
          !f.getName.startsWith("graft_keep_") && f.getName.contains(tag))
        .foreach(deleteRecursively)
    sweep(new java.io.File(System.getProperty("java.io.tmpdir")))
    warehouse.foreach(sweep)
  }

  /** The warehouse directory as a local file, when it is one (file: URI or
    * bare path); None for remote warehouses — nothing local to sweep there.
    */
  private[graft] def warehouseDir(spark: SparkSession): Option[java.io.File] = {
    val raw = spark.conf.get("spark.sql.warehouse.dir")
    try {
      val uri = new java.net.URI(raw)
      uri.getScheme match {
        case null => Some(new java.io.File(raw))
        case "file" => Some(new java.io.File(uri.getPath))
        case _ => None
      }
    } catch { case _: java.net.URISyntaxException => Some(new java.io.File(raw)) }
  }
}
