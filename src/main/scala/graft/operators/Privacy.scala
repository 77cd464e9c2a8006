package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over quasi-identifiers: k-anonymity (Sweeney, IJUFKS
  * 2002) and l-diversity (Machanavajjhala et al., TKDD 2007). A row is
  * re-identifiable when its quasi-identifier combination (e.g. nation ×
  * market segment × birth year) is shared by fewer than k rows; a group is
  * attribute-disclosing when its sensitive column takes fewer than l
  * distinct values even at size ≥ k. These are the release-gate checks a
  * data owner runs before publishing or training on user-derived tables —
  * the structured-data complement of [[graft.functions.Redaction]]'s
  * free-text PII scrubbing, and an extension of the reference's declarative
  * row-rule battery (dbt/models/sources.yml:12-45) from per-row validity to
  * corpus-level disclosure risk.
  *
  * Scale shape: one map-side-combining groupBy on the quasi-identifier
  * tuple per audit — group count traffic only, never row contents; the
  * distinct-sensitive count rides the same aggregate. Flagging is a pure
  * post-aggregate filter, and joining flags back to rows ([[suppress]]) is
  * a semi/anti join on the same key the aggregate already shuffled on.
  */
object Privacy {

  /** Per-group audit: group size, distinct sensitive values, and the two
    * disclosure flags. One row per distinct quasi-identifier combination.
    */
  def audit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("l_diverse", col("distinct_sensitive") >= l)
  }

  /** Corpus-level headline: total rows, groups, the anonymity level
    * actually achieved (the smallest group), and the row mass at risk
    * under each criterion — the one-row summary a release review reads.
    */
  def riskReport(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame =
    audit(df, qiCols, sensitiveCol, k, l).agg(
      sum(col("group_n")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("group_n")).as("achieved_k"),
      sum(when(!col("k_anonymous"), col("group_n")).otherwise(0L))
        .as("rows_below_k"),
      sum(when(!col("l_diverse"), col("group_n")).otherwise(0L))
        .as("rows_below_l"))

  /** The rows of `df` whose quasi-identifier group satisfies BOTH criteria
    * — suppression-by-group, the standard minimal release transform (drop
    * every row a too-small or too-uniform group would expose).
    */
  def suppress(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame =
    df.join(
      audit(df, qiCols, sensitiveCol, k, l)
        .filter(col("k_anonymous") && col("l_diverse"))
        .select(qiCols.map(col): _*),
      qiCols, "left_semi")
}
