package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC apply — fold a change stream into a base snapshot. Changes carry
  * the base's columns plus an operation (`I`nsert / `U`psert / `D`elete)
  * and a per-key sequence number (the change-log offset); for every key
  * the LATEST change wins: I/U replaces the row (or creates it), D
  * removes it, keys without changes pass through. This is the
  * apply-the-binlog step of keeping an analytical mirror of an
  * operational table — the delete-aware generalization of
  * `TableFormat.upsert` (which cannot drop rows) and the
  * row-granular complement of [[Scd2.applyUpdates]] (which keeps
  * history; this produces the current state only).
  *
  * Scale shape: the per-key latest change is ONE map-side-combining
  * `max(struct(seq, …))` aggregate — no window, no per-key sort; the
  * base then anti-joins the changed-key set and the surviving changes
  * union in. Traffic is changes-sized plus one key-join over the base,
  * the minimum any CDC apply can do.
  *
  * Determinism: `seqCol` must totally order each key's changes (unique
  * per key — change-log offsets are); struct comparison breaks any
  * residual tie on (op, values), so the result is partition-independent
  * regardless.
  */
object Cdc {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(!base.columns.contains(opCol) && !base.columns.contains(seqCol),
      s"base must not carry the change-metadata columns '$opCol'/'$seqCol'")
    val valueCols = base.columns.filterNot(keyCols.contains).toSeq
    // an op outside {I, U, D} (including NULL — a malformed log record)
    // must fail LOUDLY: a NULL op would otherwise null through the
    // =!= "D" filter below and silently delete the key
    val checkedOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(lit("unknown CDC op: "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val packed = changes.withColumn(opCol, checkedOp)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col(seqCol) +: col(opCol) +: valueCols.map(col): _*))
        .as("__c"))
    val latest = packed.select(
      keyCols.map(col) ++
        (col("__c").getField(opCol).as("__op") +:
          valueCols.map(c => col("__c").getField(c).as(c))): _*)
    val untouched = base.join(latest.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val upserted = latest.filter(col("__op") =!= "D").drop("__op")
      .select(base.columns.map(col).toSeq: _*)
    untouched.unionByName(upserted)
  }
}
