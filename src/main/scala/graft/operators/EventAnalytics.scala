package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics primitives over an event stream — ordered funnels,
  * cohort retention, and behavioral transition matrices. The reference's
  * events model stops at sessionization and windowed counts
  * (`scripts/transformations.py`, `tests/unit/test_transformations.py`);
  * these are the next layer a warehouse team builds on the same table, and
  * each is expressed so every shuffle lands on the entity key and every
  * aggregate is exact (counts/timestamps only — no float accumulation), so
  * results are bit-stable under any partitioning at any scale.
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each user, walk `steps` in order and
    * find the earliest completion time of each prefix — step k counts the
    * users with events of type steps(0..k) at strictly increasing
    * timestamps (the classic "signup, then view, then purchase" screen).
    *
    * Shape: one aggregation per step, every one shuffling on the user key —
    * Spark plans the chain as co-partitioned sort-merge joins with the
    * exchange reused between steps, so the cost is ONE user-key shuffle of
    * the events plus k tiny per-user frames. The greedy earliest-event walk
    * is the standard funnel semantics: taking the earliest completion of
    * each prefix never excludes a user who could complete it some other way
    * (any valid witness has step-k time ≥ the greedy one). No
    * collect_list-per-user (unbounded memory on power users), no windowed
    * scan per step.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // per-user earliest completion time of each funnel prefix, left to right;
    // prefixes(i) holds exactly the users who reached step i+1
    val first = events
      .filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t0"))
    val prefixes = steps.zipWithIndex.drop(1).scanLeft(first) {
      case (acc, (step, i)) =>
        events.filter(col(typeCol) === step)
          .join(acc, Seq(userCol))
          .filter(col(tsCol) > col(s"t${i - 1}"))
          .groupBy((userCol +: (0 until i).map(j => s"t$j")).map(col): _*)
          .agg(min(col(tsCol)).as(s"t$i"))
    }
    val counts = prefixes.zipWithIndex.map { case (frame, i) =>
      frame.agg(
        lit(i + 1).as("step"),
        lit(steps(i)).as("step_name"),
        count(col(s"t$i")).as("users_reached"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention: users are cohorted by the week of their first
    * event; each later active week counts toward (cohort_week,
    * weeks_since). Weeks are `floor(days/7)` from the cohort DATE — an
    * engine-neutral bucketing (no week-start convention involved).
    *
    * Two exact aggregations: first-seen per user (shuffle on user), then
    * distinct actives per (cohort, offset) — the second input is already
    * user-keyed so the join is co-partitioned. Counts only; bit-stable.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(userCol)
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    events
      .join(firstSeen, Seq(userCol))
      .withColumn("weeks_since",
        floor(datediff(to_date(col(tsCol)), col("cohort_day")) / 7))
      .groupBy(date_trunc("week", col("cohort_day")).cast("date").as("cohort_week"),
        col("weeks_since"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** First-order behavioral transition matrix: per user, order events by
    * (ts, tie-break id) and count each (event_type, next_event_type) pair;
    * the probability is the count over the from-type's total out-count.
    *
    * One window pass (partitioned by user — never a global sort) feeds one
    * exact count aggregation; the probability is a single long/long
    * division, which IEEE rounds identically everywhere. The from-type
    * totals come from a window over the counted frame (grouped cardinality
    * = |type|², trivially small), not a second scan of the events.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wTot = Window.partitionBy("from_type")
    pairs
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(wTot))
  }
}
