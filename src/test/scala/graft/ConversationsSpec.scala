package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Conversations

/** Conversation assembly on a hand-built stream: gap cuts, ordered
  * transcript, alternation and opens-with-user flags.
  */
class ConversationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // user 1: clean alternating convo, then a gap > 10 min opens convo 2
  // whose two assistant turns in a row break alternation; user 2 opens
  // with the assistant role
  private lazy val events = Seq(
    (1L, ts(0), 1L, "user", "hi"),
    (1L, ts(1), 2L, "assistant", "hello"),
    (1L, ts(2), 3L, "user", "thanks"),
    (1L, ts(30), 4L, "user", "back"),
    (1L, ts(31), 5L, "assistant", "yes"),
    (1L, ts(32), 6L, "assistant", "again"),
    (2L, ts(0), 7L, "assistant", "unprompted")
  ).toDF("user_id", "ts", "event_id", "role", "content")

  private lazy val got = Conversations.assemble(events, "user_id", "ts",
    "event_id", col("role"), col("content"), gapMs = 10 * 60 * 1000L)
    .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

  test("gap cuts conversations; transcripts order by time") {
    assert(got.keySet === Set((1L, 1L), (1L, 2L), (2L, 1L)))
    val c1 = got((1L, 1L))
    assert(c1.getAs[Long]("n_turns") === 3L)
    assert(c1.getAs[String]("transcript") ===
      "user:hi | assistant:hello | user:thanks")
    assert(c1.getAs[Boolean]("alternation_ok"))
    assert(c1.getAs[Boolean]("starts_with_user"))
  }

  test("consecutive same-role turns fail alternation; role counts exact") {
    val c2 = got((1L, 2L))
    assert(c2.getAs[Long]("n_user_turns") === 1L)
    assert(c2.getAs[Long]("n_assistant_turns") === 2L)
    assert(!c2.getAs[Boolean]("alternation_ok"))
    assert(c2.getAs[Boolean]("starts_with_user"))
  }

  test("assistant-opened conversation flagged") {
    val c3 = got((2L, 1L))
    assert(!c3.getAs[Boolean]("starts_with_user"))
    assert(c3.getAs[Boolean]("alternation_ok")) // single turn alternates trivially
  }
}
