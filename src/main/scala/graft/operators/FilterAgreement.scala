package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Agreement audit between two KEEP/DROP decisions over the same corpus —
  * the report read before swapping a heuristic quality filter for a
  * learned one (or before trusting two annotators' labels). Raw overlap
  * is misleading when both filters keep almost everything, so alongside
  * the confusion counts it reports Cohen's kappa (Cohen, Educ. Psychol.
  * Meas. 1960): observed agreement corrected for the agreement two
  * INDEPENDENT filters with these keep rates would show by chance.
  * κ≈0 means the filters share nothing but their base rates; that is the
  * number that says a learned filter actually learned something beyond
  * the heuristic's prior.
  *
  * One map-side-combining aggregate to group cardinality — the corpus is
  * scanned once and only (group, 4 counts) rows ever move. All counts
  * integral; po/pe/kappa are a fixed chain of correctly-rounded double
  * ops over them, so the report is bit-deterministic and oracle-exact.
  * NULL decisions count as DROP (coalesce to false) — an unscored row is
  * a row neither filter kept.
  */
object FilterAgreement {

  /** Per-group (or one-row, with `groupCols` empty) confusion counts and
    * Cohen's kappa between boolean decisions `a` and `b`:
    * (…group, n, both_keep, only_a, only_b, neither, po, pe, kappa).
    * `kappa` is NULL when pe = 1 (both filters constant — chance
    * agreement is total and the statistic is undefined).
    */
  def kappa(df: DataFrame, a: Column, b: Column,
      groupCols: Seq[String] = Nil): DataFrame = {
    val av = coalesce(a, lit(false))
    val bv = coalesce(b, lit(false))
    val base =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    val counts = base.agg(
      count(lit(1)).as("n"),
      sum(when(av && bv, 1L).otherwise(0L)).as("both_keep"),
      sum(when(av && !bv, 1L).otherwise(0L)).as("only_a"),
      sum(when(!av && bv, 1L).otherwise(0L)).as("only_b"),
      sum(when(!av && !bv, 1L).otherwise(0L)).as("neither"))
    val n = col("n").cast("double")
    val pa = (col("both_keep") + col("only_a")).cast("double") / n
    val pb = (col("both_keep") + col("only_b")).cast("double") / n
    counts
      .withColumn("po", (col("both_keep") + col("neither")).cast("double") / n)
      .withColumn("pe", pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb))
      .withColumn("kappa",
        when(lit(1.0) - col("pe") =!= 0.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .otherwise(lit(null).cast("double")))
  }
}
