package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-offset loss masks for supervised fine-tuning: given the same
  * turn stream [[Conversations.assemble]] consumes, emit one row per turn
  * with its token span inside the packed example and the loss weight a
  * trainer applies to that span — loss on assistant turns only, the
  * standard SFT masking rule. This is the step between conversation
  * assembly (q195) and sequence packing (q75): a trainer needs to know,
  * for every token of the flattened example, whether it contributes to
  * the loss, and span arithmetic must be exact or the mask silently
  * shifts onto the wrong tokens.
  *
  * Output per turn: (userCol, session_no, turn_idx, role, n_tokens,
  * seg_start, seg_end, loss_weight) plus per-example totals
  * (example_tokens, loss_tokens) for budget accounting — e.g. dropping
  * examples whose loss fraction is too small to be worth a training step.
  *
  * Token counts go through [[TextFunctions.hashAlignedTokenCount]] — the
  * SAME tokenizer as every other token-accounting op here (packing,
  * span strip, LM scoring), so an example's `example_tokens` equals the
  * sum its packed form (q75) would charge, and offsets line up with
  * [[SpanDedup]] span coordinates if decontamination runs on transcripts.
  *
  * Scale shape: the session cut and the prefix sums are windows
  * partitioned by user / (user, session) — no global window, no driver
  * state; identical discipline to [[Conversations.assemble]]. The per-
  * example totals ride the same partitioned window (no second shuffle).
  *
  * Reference scope: extends the sessionization contract the reference
  * tests at the row level (dedup/session grouping) to the fine-tuning
  * data-prep surface the builder mandates (north-star §2.10).
  */
object SftMasks {

  def lossMaskSpans(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, role: Column, content: Column, gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be > 0, got $gapMs")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val cut = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapMs * 1000L, 1)
      .otherwise(0)
    val turns = events
      .withColumn("role", role)
      // NULL content must not leak into token accounting: un-guarded, a
      // NULL turn gets NULL n_tokens and a NULL seg_end (a span no trainer
      // can consume) while the window sums silently skip it — coalesce to
      // an EMPTY span instead, the same tokenCountOrZero discipline the
      // packing operators use
      .withColumn("n_tokens", coalesce(
        TextFunctions.hashAlignedTokenCount(content).cast("long"), lit(0L)))
      .withColumn("session_no", sum(cut).over(byUser).cast("long"))
    val bySess = Window.partitionBy(col(userCol), col("session_no"))
      .orderBy(col(tsCol), col(tieCol))
    val whole = Window.partitionBy(col(userCol), col("session_no"))
    turns
      .withColumn("turn_idx", row_number().over(bySess).cast("long"))
      .withColumn("seg_start", coalesce(
        sum(col("n_tokens")).over(bySess.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("seg_end", col("seg_start") + col("n_tokens"))
      .withColumn("loss_weight",
        when(col("role") === "assistant", 1).otherwise(0))
      .withColumn("example_tokens", sum(col("n_tokens")).over(whole))
      .withColumn("loss_tokens", coalesce(
        sum(when(col("loss_weight") === 1, col("n_tokens"))).over(whole),
        lit(0L)))
      .select(col(userCol), col("session_no"), col("turn_idx"), col("role"),
        col("n_tokens"), col("seg_start"), col("seg_end"), col("loss_weight"),
        col("example_tokens"), col("loss_tokens"))
  }
}
