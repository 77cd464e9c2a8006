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

  /** Multi-rule blocking (the Splink "blocking rules" shape): project the
    * comparison attributes once, self-join under EACH rule (a conjunction
    * of attr equalities — an equi-join, so every pass is hash-partitioned
    * on its own block key, never a cartesian), keep id_a < id_b, and
    * union-DISTINCT the passes so a pair proposed by several rules scores
    * once. `attrs` maps attr name → source expression; each lands on the
    * pair frame as `<name>_a` / `<name>_b`, which is what [[FieldSpec]]
    * agreement columns reference.
    *
    * Scale shape: cost = Σ per-rule block volumes + one distinct shuffle
    * on the candidate keys — the candidate-pair volume IS the pipeline's
    * cost driver, which is exactly what the composed probe (q234 rows in
    * SCALING.md) measures rather than assumes.
    */
  def blockedPairsUnion(df: DataFrame, idCol: String,
      attrs: Seq[(String, Column)],
      blockingRules: Seq[Seq[String]]): DataFrame = {
    require(blockingRules.nonEmpty, "at least one blocking rule required")
    val names = attrs.map(_._1)
    blockingRules.foreach(r => r.foreach(n =>
      require(names.contains(n), s"blocking rule references unknown attr $n")))
    val base = df.select(
      col(idCol).as("id") +: attrs.map { case (n, c) => c.as(n) }: _*)
    val a = base.toDF("id_a" +: names.map(_ + "_a"): _*)
    val b = base.toDF("id_b" +: names.map(_ + "_b"): _*)
    blockingRules.map { rule =>
      a.join(b, rule.map(n => col(s"${n}_a") === col(s"${n}_b")).reduce(_ && _))
        .filter(col("id_a") < col("id_b"))
    }.reduce(_ unionByName _).distinct()
  }

  /** The composed Fellegi–Sunter pipeline as ONE declarative plan:
    * multi-rule blocking → per-field scoring → three-way decision. No
    * stage materializes; Catalyst sees blocking joins, the literal-weight
    * projection, and the threshold CASE as a single dag.
    */
  def pipeline(df: DataFrame, idCol: String, attrs: Seq[(String, Column)],
      blockingRules: Seq[Seq[String]], fields: Seq[FieldSpec],
      lower: Double, upper: Double): DataFrame =
    classify(blockedPairsUnion(df, idCol, attrs, blockingRules),
      fields, lower, upper)
}
