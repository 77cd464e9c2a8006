package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, JASA
  * 1969; the scoring model inside Splink/dedupe.io and every serious
  * entity-resolution stack): each field comparison contributes a log-odds
  * weight — `log2(m/u)` on agreement, `log2((1-m)/(1-u))` on disagreement,
  * where `m = P(agree | same entity)` and `u = P(agree | different
  * entities)` — and a pair's match weight is the sum. Thresholds cut the
  * weight axis into match / possible (clerical review) / non-match.
  *
  * This completes the entity-resolution story next to the blocking
  * primitives already here ([[FuzzyJoin.blockedPairs]],
  * [[SortedNeighborhood.nearDupPairs]]): blocking proposes candidate
  * pairs at linear-ish cost; this scores them with calibrated evidence
  * instead of a single distance.
  *
  * Scale design: scoring is a pure map over the candidate-pair frame
  * (every weight is a driver-computed literal — no joins, no shuffle,
  * codegen CASE arithmetic), so cost is exactly the blocking stage's
  * output size. Weights are computed on the DRIVER with `Math.log` and
  * inlined as literals; the per-pair sum folds in declared field order —
  * both engines add the same doubles in the same order, so scores are
  * bit-reproducible and oracle-exact (q159).
  */
object RecordLinkage {

  /** One field comparison: `agree` evaluates on the candidate-pair frame
    * (reference the pair columns, e.g. `col("seg_a") === col("seg_b")`),
    * with match/non-match agreement probabilities `m` and `u`.
    */
  final case class FieldSpec(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"$name: m, u must be in (0,1)")
    /** log2 evidence for agreement. */
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    /** log2 evidence (negative) for disagreement. */
    def disagreeWeight: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Candidate pairs with per-field agreement flags and the summed match
    * weight. Adds `agree_<name>` (boolean; a null agreement evaluates as
    * disagreement — absent data is not evidence FOR a match) and
    * `weight`. Fold order is the declared field order.
    */
  def scorePairs(pairs: DataFrame, fields: Seq[FieldSpec]): DataFrame = {
    require(fields.nonEmpty, "at least one field comparison required")
    val flagged = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"agree_${f.name}", coalesce(f.agree, lit(false)))
    }
    val weight = fields
      .map(f => when(col(s"agree_${f.name}"), lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight)))
      .reduceLeft(_ + _)
    flagged.withColumn("weight", weight)
  }

  /** [[scorePairs]] plus the three-way Fellegi–Sunter decision:
    * weight ≥ `upper` → match, ≤ `lower` → non_match, else possible
    * (the clerical-review band).
    */
  def classify(pairs: DataFrame, fields: Seq[FieldSpec],
      lower: Double, upper: Double): DataFrame = {
    require(lower <= upper, s"need lower <= upper, got $lower > $upper")
    scorePairs(pairs, fields).withColumn("decision",
      when(col("weight") >= upper, "match")
        .when(col("weight") <= lower, "non_match")
        .otherwise("possible"))
  }
}
