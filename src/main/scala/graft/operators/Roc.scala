package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Threshold-free evaluation of a scoring classifier — the ROC/AUC
  * companion to [[Calibration]]'s reliability report. Calibration asks
  * "are the probabilities honest?"; AUC asks "does the score RANK
  * positives above negatives at all?" (Hanley & McNeil, Radiology 1982) —
  * a quality filter whose AUC is ~0.5 is noise no matter how well
  * calibrated, so a corpus gate reads both numbers before trusting a
  * KEEP/DROP threshold.
  *
  * AUC is computed exactly via the Mann-Whitney midrank identity
  * `AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)` with tied scores
  * taking their midrank — never by sampling pairs and never through a
  * global sort: scores collapse to distinct-score levels (one map-side-
  * combining aggregate), and each level's exclusive rank prefix comes
  * from [[Packing.withGlobalOffsets]]'s two-phase sharded scan, so no
  * stage funnels through a single task and the level frame — not the
  * corpus — is all that ever shuffles again. All rank arithmetic stays
  * integral (`2·midrank = 2·offset + cnt + 1`, summed as DECIMAL(38,0)
  * so ~10^18-row corpora cannot overflow the rank sum), with ONE double
  * division at the end — bit-deterministic on any partitioning and
  * replayable in an oracle's HUGEINT arithmetic.
  */
object Roc {

  /** One-row (n_pos, n_neg, auc) exact AUC of `scoreCol` against the
    * boolean `label`. `auc` is NULL when either class is empty (the
    * statistic is undefined). Higher scores must mean "more positive".
    * NULL scores are excluded — an unscored row cannot be ranked (and
    * Spark's NULLS-FIRST level would disagree with any oracle's
    * NULLS-LAST ordering).
    */
  def auc(scored: DataFrame, scoreCol: String, label: Column): DataFrame = {
    val levels = scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(label, 1L).otherwise(0L)).as("pos"))
    val ranked = Packing.withGlobalOffsets(levels, Seq("score"), "cnt")
    val p = col("__p")
    val n = col("__n")
    val dec = DecimalType(38, 0)
    ranked.agg(
        sum(col("pos")).as("__p"),
        sum(col("cnt") - col("pos")).as("__n"),
        // Σ pos·(2·rank_before + cnt + 1) = 2·Σ midranks over positives.
        // EVERY factor goes through DECIMAL before multiplying — the
        // per-level product alone can pass Long.MaxValue near 10^10 rows
        // (offset ~ corpus size), long before the sum does
        sum(col("pos").cast(dec) *
          (col("offset").cast(dec) * lit(2) + col("cnt") + lit(1)))
          .as("__r2"))
      .select(p.as("n_pos"), n.as("n_neg"),
        when(p > 0 && n > 0,
          (col("__r2") - (p.cast(DecimalType(38, 0)) *
            (p + lit(1L)).cast(DecimalType(38, 0)))).cast("double") /
            (lit(2.0) * p.cast("double") * n.cast("double")))
          .otherwise(lit(null).cast("double")).as("auc"))
  }

  /** ROC curve points at each reliability-bin threshold: one row per bin
    * of a [[Calibration.reliability]] table with (bin, threshold, tp, fp,
    * tpr, fpr) under the rule "predict positive when score ≥ threshold".
    * Bin 0's threshold is −∞, not its lower edge: reliability clamps
    * below-range scores INTO bin 0, so its cumulative counts are "keep
    * everything" — a finite edge there would overstate tp/fp for rows
    * that are not actually ≥ it. Bins-cardinality work done as an
    * ordered fold over one collected array (the same partition-
    * independence discipline as [[Calibration.ece]] — no single-partition
    * window), O(bins²) slice sums on a bins-sized array.
    */
  def rocPoints(rel: DataFrame): DataFrame = {
    def before(i: Column, field: String): Column =
      aggregate(slice(col("__a"), lit(1), i), lit(0L),
        (acc, y) => acc + y.getField(field))
    rel.agg(
        sort_array(collect_list(struct(col("bin"), col("bin_lo"),
          col("n"), col("positives")))).as("__a"),
        sum(col("positives")).as("__p"),
        sum(col("n") - col("positives")).as("__n"))
      .select(explode(transform(col("__a"), (x, i) => {
        val tp = col("__p") - before(i, "positives")
        val fp = col("__n") - (before(i, "n") - before(i, "positives"))
        struct(x.getField("bin").as("bin"),
          when(x.getField("bin") === 0, lit(Double.NegativeInfinity))
            .otherwise(x.getField("bin_lo")).as("threshold"),
          tp.as("tp"), fp.as("fp"),
          (tp.cast("double") / nullif(col("__p"), lit(0L)).cast("double"))
            .as("tpr"),
          (fp.cast("double") / nullif(col("__n"), lit(0L)).cast("double"))
            .as("fpr"))
      })).as("__e"))
      .select(col("__e.*"))
  }

  /** Precision/recall/F1 at each reliability-bin threshold — the
    * threshold-PICKING companion to [[rocPoints]]: a corpus filter is
    * deployed at one operating point, and this is the table read to
    * choose it (precision = kept-quality, recall = quality-coverage,
    * F1 their harmonic mean). Same "predict positive when score ≥
    * threshold" rule, same bins-sized ordered fold, and every cell is
    * integer counts with ONE double division at the end, so the table is
    * bit-exact on any partitioning and oracle-replayable. F1 uses the
    * division-free identity `2·tp / (tp + fp + P)` (denominator =
    * predicted-positives + actual-positives), so zero-precision/zero-
    * recall rows stay well-defined wherever tp+fp+P > 0.
    */
  def prPoints(rel: DataFrame): DataFrame = {
    def before(i: Column, field: String): Column =
      aggregate(slice(col("__a"), lit(1), i), lit(0L),
        (acc, y) => acc + y.getField(field))
    rel.agg(
        sort_array(collect_list(struct(col("bin"), col("bin_lo"),
          col("n"), col("positives")))).as("__a"),
        sum(col("positives")).as("__p"))
      .select(explode(transform(col("__a"), (x, i) => {
        val tp = col("__p") - before(i, "positives")
        val predPos = aggregate(col("__a"), lit(0L),
          (acc, y) => acc + y.getField("n")) - before(i, "n")
        struct(x.getField("bin").as("bin"),
          when(x.getField("bin") === 0, lit(Double.NegativeInfinity))
            .otherwise(x.getField("bin_lo")).as("threshold"),
          tp.as("tp"), predPos.as("pred_pos"),
          (tp.cast("double") / nullif(predPos, lit(0L)).cast("double"))
            .as("precision"),
          (tp.cast("double") / nullif(col("__p"), lit(0L)).cast("double"))
            .as("recall"),
          (lit(2.0) * tp.cast("double") /
            nullif(predPos + col("__p"), lit(0L)).cast("double")).as("f1"))
      })).as("__e"))
      .select(col("__e.*"))
  }
}
