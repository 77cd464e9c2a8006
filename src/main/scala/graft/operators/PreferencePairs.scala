package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction for DPO/RLHF-style training: within each
  * group (a prompt cluster, a source, a topic), pair the i-th BEST-scored
  * item with the i-th WORST as (chosen, rejected), keeping pairs whose
  * score margin clears `minMargin`. Mirror pairing maximizes the summed
  * margin over disjoint pairs for a fixed pair count — the natural greedy
  * a preference-data recipe wants — and the position cap `pos ≤ ⌊n/2⌋`
  * guarantees no item appears on both sides.
  *
  * Determinism: the best order breaks score ties by ascending id and the
  * worst order by DESCENDING id — exact mirrors of one comparator — so
  * the item at best-rank r sits at worst-rank n+1−r regardless of ties
  * and the pairing is reproducible at any partitioning.
  *
  * Scale shape: two windows partitioned by the group column (groups are
  * source/prompt-sized, the same discipline as every per-source rank
  * here) and one join on (group, pos); score arithmetic stays whatever
  * fixed dag the caller supplies, so an oracle can replay the whole
  * construction.
  */
object PreferencePairs {

  def pairByScore(df: DataFrame, idCol: String, groupCol: String,
      score: Column, minMargin: Double): DataFrame = {
    require(minMargin > 0, s"minMargin must be > 0, got $minMargin")
    val scored = df.select(col(groupCol), col(idCol), score.as("__s"))
    val best = Window.partitionBy(groupCol).orderBy(desc("__s"), col(idCol))
    val worst = Window.partitionBy(groupCol)
      .orderBy(asc("__s"), desc(idCol))
    val chosen = scored
      .withColumn("pos", row_number().over(best).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col("pos"), col("__n"),
        col(idCol).as("chosen_id"), col("__s").as("chosen_score"))
    val rejected = scored
      .withColumn("pos", row_number().over(worst).cast("long"))
      .select(col(groupCol), col("pos"),
        col(idCol).as("rejected_id"), col("__s").as("rejected_score"))
    chosen.join(rejected, Seq(groupCol, "pos"))
      .filter(col("pos") <= floor(col("__n") / 2))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("margin") >= minMargin)
      .select(col(groupCol), col("pos"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"), col("margin"))
  }
}
