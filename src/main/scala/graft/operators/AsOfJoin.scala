package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the classic time-series operator Spark's
  * built-ins lack as a first-class node.
  *
  * `joinAsOf(left, right, key, leftTs, rightTs)`: for every left row, attach
  * the right row with the greatest `rightTs <= leftTs` for the same key
  * (tolerance-bounded variant included). Composed from built-ins as
  * union + window over (key ORDER BY ts): tag both sides, sort-merge within
  * key, and carry the latest right row forward with `last(..., ignoreNulls)`.
  * ONE shuffle on the key and no range-join pair blowup — the same dataflow a
  * dedicated sort-merge as-of SparkPlan would run, which keeps it linear at
  * 100 TB (a naive `b.ts <= a.ts` range join materializes O(pairs-per-key)).
  */
object AsOfJoin {

  /** Native whole-operator form (graft.plans.AsOfJoinPlan): per-side shuffle
    * + in-partition sort + single streaming merge. Column names must be
    * disjoint between `left` and `right` (rename the right side first).
    * Right columns come back null-extended where no prior row exists.
    *
    * Determinism: when the right side has multiple rows at the same
    * (key, ts), which one matches is tie-order dependent (both here and in
    * the composed form) — pre-aggregate the right side to one row per
    * (key, ts) for fully deterministic output, as q26_asof_join does.
    */
  def joinAsOfNative(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightKey: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lp = ColumnBridge.analyzedPlan(left)
    val rp = ColumnBridge.analyzedPlan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    ColumnBridge.ofRows(spark, graft.plans.AsOfJoinNode(lp, rp,
      attr(lp, key), attr(lp, leftTs), attr(rp, rightKey), attr(rp, rightTs)))
  }

  def joinAsOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    // tag and align the two sides: side 0 = right (wins ties at equal ts by
    // sorting first), side 1 = left
    val rightTagged = right.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        rightValueCols.map(c => col(c).as(s"__r_$c"))): _*)
    val leftCols = left.columns
    val leftTagged = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        leftCols.map(c => col(c).as(s"__l_$c"))): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    val w = Window.partitionBy(key).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }.withColumn("__match_ts",
      last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))

    val matched = carried
      .filter(col("__side") === 1)
      .withColumn("__in_tolerance", toleranceMs match {
        case Some(tol) =>
          col("__match_ts").isNotNull &&
            (unix_micros(col("__ts")) - unix_micros(col("__match_ts"))) <= tol * 1000L
        case None => col("__match_ts").isNotNull
      })
    val out = leftCols.map(c => col(s"__l_$c").as(c)) ++
      Seq(when(col("__in_tolerance"), col("__match_ts")).as(s"asof_$rightTs")) ++
      rightValueCols.map(c =>
        when(col("__in_tolerance"), col(s"__r_$c")).as(s"asof_$c"))
    matched.select(out: _*)
  }
}
