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
    * on the candidate keys. Per-block pair volume is quadratic in block
    * size, so a blocking key whose CARDINALITY does not grow with the
    * data (e.g. a fixed set of balance bands × name suffixes) turns the
    * whole pipeline quadratic — the 10× probe measured exactly that
    * (ratio/M 2.04 before the cap below existed). `maxBlockSize` is the
    * standard countermeasure: blocks at or under the cap enumerate all
    * pairs; OVERSIZED blocks degrade to sorted-neighborhood pairing
    * (members ranked by id within the block; each row pairs with the next
    * `overflowWindow` ranks), bounding per-block cost at O(size × w)
    * while keeping partial recall instead of dropping the block outright
    * (block purging, Papadakis et al., TKDE 2013, §block refinement;
    * windowed degrade after Hernández & Stolfo, SIGMOD 1995). The
    * windowed pass enumerates candidates by EXPLODING each row into its
    * w target ranks and equi-joining on (block key, target rank) — never
    * materializing the quadratic pair set. With the cap, total candidate
    * volume is O(n × rules × max(cap, w)) — linear in n, which the
    * re-probed q234 rows in SCALING.md verify empirically.
    */
  def blockedPairsUnion(df: DataFrame, idCol: String,
      attrs: Seq[(String, Column)],
      blockingRules: Seq[Seq[String]],
      maxBlockSize: Option[Int] = None,
      overflowWindow: Int = 8): DataFrame = {
    require(blockingRules.nonEmpty, "at least one blocking rule required")
    require(overflowWindow >= 1, "overflowWindow must be >= 1")
    val names = attrs.map(_._1)
    blockingRules.foreach(r => r.foreach(n =>
      require(names.contains(n), s"blocking rule references unknown attr $n")))
    val base = df.select(
      col(idCol).as("id") +: attrs.map { case (n, c) => c.as(n) }: _*)
    val outCols = ("id" +: names).flatMap(n => Seq(s"${n}_a", s"${n}_b"))
    def rename(d: DataFrame, sfx: String): DataFrame =
      d.columns.foldLeft(d)((acc, c) => acc.withColumnRenamed(c, c + sfx))
    val passes = blockingRules.flatMap { rule =>
      val keyEq = (n: String) => col(s"${n}_a") === col(s"${n}_b")
      maxBlockSize match {
        case None =>
          val a = rename(base, "_a")
          val b = rename(base, "_b")
          Seq(a.join(b, rule.map(keyEq).reduce(_ && _))
            .filter(col("id_a") < col("id_b"))
            .select(outCols.map(col): _*))
        case Some(cap) =>
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(rule.map(col): _*)
          val sized = base
            .withColumn("bn", count(lit(1)).over(w))
            .withColumn("rn", row_number().over(w.orderBy(col("id"))).cast("long"))
          val a = rename(sized, "_a")
          val b = rename(sized, "_b")
          val small = a.filter(col("bn_a") <= cap)
            .join(b.filter(col("bn_b") <= cap), rule.map(keyEq).reduce(_ && _))
            .filter(col("id_a") < col("id_b"))
            .select(outCols.map(col): _*)
          val over = a.filter(col("bn_a") > cap)
            .withColumn("rn_tgt", explode(
              when(col("rn_a") < col("bn_a"),
                sequence(col("rn_a") + 1L,
                  least(col("rn_a") + overflowWindow.toLong, col("bn_a"))))
                .otherwise(array().cast("array<bigint>"))))
          val windowed = over
            .join(b.filter(col("bn_b") > cap),
              (rule.map(keyEq) :+ (col("rn_tgt") === col("rn_b"))).reduce(_ && _))
            .select(outCols.map(col): _*)
          Seq(small, windowed)
      }
    }
    passes.reduce(_ unionByName _).distinct()
  }

  /** The composed Fellegi–Sunter pipeline as ONE declarative plan:
    * multi-rule blocking → per-field scoring → three-way decision. No
    * stage materializes; Catalyst sees blocking joins, the literal-weight
    * projection, and the threshold CASE as a single dag.
    */
  def pipeline(df: DataFrame, idCol: String, attrs: Seq[(String, Column)],
      blockingRules: Seq[Seq[String]], fields: Seq[FieldSpec],
      lower: Double, upper: Double,
      maxBlockSize: Option[Int] = None, overflowWindow: Int = 8): DataFrame =
    classify(
      blockedPairsUnion(df, idCol, attrs, blockingRules, maxBlockSize,
        overflowWindow),
      fields, lower, upper)
}
