package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Top-k rows per group. The native form plans through
  * [[graft.plans.TopKPerGroupPlan]] (one hash exchange, per-group bounded
  * heaps, NO sort); the window formulation it replaces is the q33 gate.
  */
object TopK {

  /** The k best rows per `groupCol` ranked by `orderCol` (descending by
    * default), boundary ties broken by the smaller `tieCol` — include a
    * unique tie column for deterministic output. Rows with a null order or
    * tie value are dropped. Output order is unspecified (heap emission);
    * add an orderBy for presentation.
    */
  def perGroupNative(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, k: Int, descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerGroupStrategy
    val plan = ColumnBridge.analyzedPlan(df)
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${plan.output.map(_.name)}"))
    ColumnBridge.ofRows(spark, graft.plans.TopKPerGroupNode(
      plan, attr(groupCol), attr(orderCol), attr(tieCol), k, descending))
  }
}
