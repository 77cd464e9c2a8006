package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive for sources
  * that deliver full table dumps (the reference's CSV drops are exactly
  * that): classify every key as added / removed / changed / unchanged
  * between two snapshots, feeding incremental downstream loads and drift
  * reports.
  *
  * Scale design: one full-outer sort-merge join on the key — the minimum
  * possible data movement for an unordered diff (each side shuffles once on
  * the key; with both snapshots bucketed on the key it degrades to a
  * zero-shuffle zip). Value comparison is null-safe column equality, no
  * row serialization or hashing pass.
  */
object SnapshotDiff {

  /** Per-key change classification between `old` and `neu`. Output: the key
    * columns + `change_type` ('added'|'removed'|'changed'|'unchanged').
    * `compareCols` are the payload columns whose difference means 'changed';
    * nulls compare as equal to nulls (null-safe `<=>`).
    */
  def diff(old: DataFrame, neu: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = old.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = neu.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val renamedO = compareCols.foldLeft(o)((d, c) => d.withColumnRenamed(c, s"__old_$c"))
    val renamedN = compareCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__new_$c"))
    val same = compareCols
      .map(c => col(s"__old_$c") <=> col(s"__new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    renamedO.join(renamedN, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }
}
