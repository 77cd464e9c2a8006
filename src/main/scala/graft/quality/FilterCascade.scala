package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential filter-cascade attrition report — the funnel every cleaning
  * recipe publishes ("N docs in → nonempty → length band → language →
  * quality → M docs out"), read to spot the stage that silently eats the
  * corpus. Distinct from a per-reason violation tally (QualityReport):
  * attrition is ORDER-SENSITIVE — stage i only sees what stages 1..i-1
  * kept, exactly like the deployed pipeline.
  *
  * Cost shape: ONE aggregate pass. The prefix conjunctions compile to a
  * codegen CASE-sum per stage (stages-many longs per partition cross the
  * wire, never rows), where the naive per-stage re-filter would scan the
  * corpus once per stage. At 100 TB the report costs the same single scan
  * a count() does.
  *
  * NULL rule: a NULL predicate result DROPS the row (coalesce to false),
  * deliberately and uniformly — a cleaning filter that cannot evaluate a
  * document must not pass it, and the explicit coalesce keeps the SQL
  * replay's three-valued logic identical.
  */
object FilterCascade {

  /** One row per stage: (stage, stage_name, entering, kept, dropped,
    * keep_rate, cum_keep_rate). `entering` of stage 0 is the corpus size;
    * thereafter it is the previous stage's `kept`.
    */
  def attrition(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "attrition needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      s"duplicate stage names: ${stages.map(_._1).mkString(", ")}")
    val prefixes = stages
      .scanLeft(lit(true)) { case (acc, (_, cond)) =>
        acc && coalesce(cond, lit(false))
      }
      .tail
    val aggs = count(lit(1)).as("__n0") +:
      prefixes.zipWithIndex.map { case (p, i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"__k$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stageStructs = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("stage"), lit(name).as("stage_name"),
        (if (i == 0) col("__n0") else col(s"__k${i - 1}")).as("entering"),
        col(s"__k$i").as("kept"), col("__n0").as("__total"))
    }
    one.select(explode(array(stageStructs: _*)).as("__s"))
      .select(col("__s.stage").as("stage"),
        col("__s.stage_name").as("stage_name"),
        col("__s.entering").as("entering"),
        col("__s.kept").as("kept"),
        (col("__s.entering") - col("__s.kept")).as("dropped"),
        (col("__s.kept").cast("double") /
          nullif(col("__s.entering"), lit(0L)).cast("double")).as("keep_rate"),
        (col("__s.kept").cast("double") /
          nullif(col("__s.__total"), lit(0L)).cast("double"))
          .as("cum_keep_rate"))
  }
}
