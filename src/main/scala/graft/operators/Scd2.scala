package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 snapshots — the Spark-native form of the
  * reference's declared-but-unused dbt snapshot config
  * (reference dbt_project.yml:49-58: `strategy: timestamp, updated_at`).
  *
  * Given the full version history of an entity, produce validity intervals:
  * `valid_from` = the version's timestamp, `valid_to` = the next version's
  * timestamp (null while current), `is_current`, and a version number.
  * One window over (key ORDER BY ts) — a single shuffle on the key.
  */
object Scd2 {

  def buildSnapshot(history: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    history
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Apply a batch of updates to an existing snapshot: expire current rows
    * whose key has a newer version, append the new versions (dbt snapshot
    * merge semantics on `updated_at`). The result is identical to a full
    * [[buildSnapshot]] over the combined history — q171 pins that
    * equivalence — so incremental merging never drifts from a rebuild.
    *
    * `tieBreak` must make (key, ts, tieBreak) a version identity: the
    * redelivery dedup keys on it (a retried batch must not create
    * duplicate versions / zero-length intervals — dbt snapshot re-runs are
    * no-ops) and the interval order uses it. Without it, two versions of
    * a key sharing a timestamp would collapse arbitrarily here while a
    * full rebuild with a tie-break keeps both.
    */
  def applyUpdates(snapshot: DataFrame, updates: DataFrame, keyCols: Seq[String],
      tsCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val history = snapshot
      .drop("version", "valid_from", "valid_to", "is_current")
      .unionByName(updates)
      .dropDuplicates(keyCols ++ (tsCol +: tieBreak))
    buildSnapshot(history, keyCols, tsCol, tieBreak)
  }
}
