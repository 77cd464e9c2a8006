package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SftMasks

/** Loss-mask spans on a hand-built turn stream: segment offsets tile the
  * example exactly, loss rides assistant turns only, and the gap rule
  * cuts examples at the same boundary as Conversations.assemble.
  */
class SftMasksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // user 1, convo 1: user(2 tokens) / assistant(3) / user(1); a >10 min
  // gap then convo 2: assistant(2). user 2: single user turn (no loss).
  private lazy val events = Seq(
    (1L, ts(0), 1L, "user", "hi there"),
    (1L, ts(1), 2L, "assistant", "hello to you"),
    (1L, ts(2), 3L, "user", "thanks"),
    (1L, ts(30), 4L, "assistant", "still here"),
    (2L, ts(0), 5L, "user", "anyone")
  ).toDF("user_id", "ts", "event_id", "role", "content")

  private lazy val got = SftMasks.lossMaskSpans(events, "user_id", "ts",
    "event_id", col("role"), col("content"), gapMs = 10 * 60 * 1000L)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r).toMap

  test("segments tile the example: consecutive, gapless, end = total") {
    val c1 = Seq((1L, 1L, 1L), (1L, 1L, 2L), (1L, 1L, 3L)).map(got)
    assert(c1.map(r => (r.getAs[Long]("seg_start"), r.getAs[Long]("seg_end")))
      === Seq((0L, 2L), (2L, 5L), (5L, 6L)))
    assert(c1.forall(_.getAs[Long]("example_tokens") == 6L))
  }

  test("loss weight is 1 on assistant turns only; loss_tokens sums them") {
    assert(got((1L, 1L, 2L)).getAs[Int]("loss_weight") === 1)
    assert(got((1L, 1L, 1L)).getAs[Int]("loss_weight") === 0)
    assert(got.values.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L)
      .forall(_.getAs[Long]("loss_tokens") == 3L))
  }

  test("gap opens a new example with offsets reset") {
    val t = got((1L, 2L, 1L))
    assert(t.getAs[Long]("seg_start") === 0L)
    assert(t.getAs[Long]("seg_end") === 2L)
    assert(t.getAs[Long]("example_tokens") === 2L)
    assert(t.getAs[Long]("loss_tokens") === 2L)
  }

  test("an all-user example has zero loss tokens, not null") {
    assert(got((2L, 1L, 1L)).getAs[Long]("loss_tokens") === 0L)
  }

  test("NULL content yields an EMPTY span, never a NULL seg_end") {
    // a NULL turn must stay consumable: zero tokens, zero-width segment,
    // neighbors' offsets unaffected (the window sums would skip the NULL
    // while seg_end inherited it — an inconsistent span)
    val g = SftMasks.lossMaskSpans(
      Seq((9L, ts(0), 1L, "user", "hi there"),
        (9L, ts(1), 2L, "assistant", null),
        (9L, ts(2), 3L, "assistant", "ok"))
        .toDF("user_id", "ts", "event_id", "role", "content"),
      "user_id", "ts", "event_id", col("role"), col("content"),
      gapMs = 10 * 60 * 1000L)
      .orderBy("turn_idx").collect()
    assert(g.map(r => (r.getAs[Long]("n_tokens"),
      r.getAs[Long]("seg_start"), r.getAs[Long]("seg_end"))).toSeq
      === Seq((2L, 0L, 2L), (0L, 2L, 2L), (1L, 2L, 3L)))
    assert(g.forall(_.getAs[Long]("example_tokens") == 3L))
  }

  test("leading-whitespace content counts hash-aligned tokens") {
    val g = SftMasks.lossMaskSpans(
      Seq((9L, ts(0), 1L, "user", "\thi there")) // tokens() would count 3
        .toDF("user_id", "ts", "event_id", "role", "content"),
      "user_id", "ts", "event_id", col("role"), col("content"),
      gapMs = 1000L).collect()
    assert(g.head.getAs[Long]("n_tokens") === 2L)
  }
}
