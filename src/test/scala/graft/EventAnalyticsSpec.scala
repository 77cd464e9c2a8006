package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Funnel / retention / transition semantics on hand-checked event streams. */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1 completes signup->view->purchase in order; user 2 has the types
  // but out of order (purchase before view); user 3 signs up only
  private lazy val events = Seq(
    (1L, "signup", ts("2024-01-01 10:00:00"), 1L),
    (1L, "view", ts("2024-01-01 11:00:00"), 2L),
    (1L, "purchase", ts("2024-01-01 12:00:00"), 3L),
    (2L, "signup", ts("2024-01-02 10:00:00"), 4L),
    (2L, "purchase", ts("2024-01-02 10:30:00"), 5L),
    (2L, "view", ts("2024-01-02 11:00:00"), 6L),
    (3L, "signup", ts("2024-01-08 09:00:00"), 7L))
    .toDF("user_id", "event_type", "ts", "event_id")

  test("funnel counts users per ordered prefix, not per type presence") {
    val got = EventAnalytics
      .funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "view", "purchase"))
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // user 2 reaches "view" (signup then view) but NOT "purchase": its only
    // purchase precedes its view
    assert(got.toSeq === Seq(
      (1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("funnel greedy earliest walk still finds non-earliest witnesses") {
    // earliest B is before A, but a later B after A exists: user completes
    val df = Seq(
      (9L, "a", ts("2024-01-01 10:00:00"), 1L),
      (9L, "b", ts("2024-01-01 09:00:00"), 2L),
      (9L, "b", ts("2024-01-01 11:00:00"), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.funnel(df, "user_id", "event_type", "ts", Seq("a", "b"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(got.toSeq === Seq(1L, 1L))
  }

  test("retention cohorts bucket by first-seen week with day/7 offsets") {
    val got = EventAnalytics
      .retentionCohorts(events, "user_id", "ts")
      .orderBy("cohort_week", "weeks_since")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // users 1,2 cohort at week 2024-01-01; user 3 at week 2024-01-08;
    // all activity is within week 0 of each cohort
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-08", 0L, 1L)))
  }

  test("transition matrix counts ordered pairs with per-from probabilities") {
    val got = EventAnalytics
      .transitionMatrix(events, "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // pairs: u1 signup->view->purchase; u2 signup->purchase->view
    assert(got.toSeq === Seq(
      ("purchase", "view", 1L, 1.0),
      ("signup", "purchase", 1L, 0.5),
      ("signup", "view", 1L, 0.5),
      ("view", "purchase", 1L, 1.0)))
  }
}
