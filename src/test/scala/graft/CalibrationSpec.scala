package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Calibration

/** Reliability binning and ECE on a hand-built scored frame: edge
  * assignment (half-open bins, clamped ends), midpoint-sigmoid
  * confidence, and the ordered weighted-gap fold.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edges = Array(-1.0, 0.0, 1.0)

  // bin 0: logits -5.0 (clamped), -0.5 → labels F, F → pos_rate 0
  // bin 1: logits 0.0 (lower-inclusive), 0.5, 5.0 (clamped) → T, T, F
  private lazy val scored = Seq(
    (-5.0, false), (-0.5, false),
    (0.0, true), (0.5, true), (5.0, false)
  ).toDF("logit", "y")

  private lazy val rel =
    Calibration.reliability(scored, "logit", col("y"), edges)
      .orderBy("bin").collect()

  test("bins clamp out-of-range logits and split at interior edges") {
    assert(rel.map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
      r.getAs[Long]("positives"))).toSeq === Seq((0, 2L, 0L), (1, 3L, 2L)))
  }

  test("bounds and confidence are the edge/midpoint-sigmoid literals") {
    assert(rel.map(_.getAs[Double]("bin_lo")).toSeq === Seq(-1.0, 0.0))
    assert(rel.map(_.getAs[Double]("bin_hi")).toSeq === Seq(0.0, 1.0))
    assert(rel(0).getAs[Double]("conf") === 1.0 / (1.0 + math.exp(0.5)))
    assert(rel(1).getAs[Double]("conf") === 1.0 / (1.0 + math.exp(-0.5)))
  }

  test("ece is the bin-mass-weighted gap, folded in bin order") {
    val Array(row) = Calibration.ece(
      Calibration.reliability(scored, "logit", col("y"), edges)).collect()
    val c0 = 1.0 / (1.0 + math.exp(0.5))
    val c1 = 1.0 / (1.0 + math.exp(-0.5))
    val expected =
      (math.abs(0.0 - c0) * 2.0 + math.abs(2.0 / 3.0 - c1) * 3.0) / 5.0
    assert(row.getAs[Long]("n_total") === 5L)
    assert(row.getAs[Double]("ece") === expected)
  }

  test("NULL logits are excluded, never binned at top-bin confidence") {
    // un-guarded, a NULL falls through every when() into the final
    // otherwise() and lands in the TOP bin — the audit would count an
    // unscored row at the highest midpoint confidence
    val withNulls = scored.union(
      Seq((Option.empty[Double], true), (Option.empty[Double], false))
        .toDF("logit", "y"))
    val rel2 = Calibration.reliability(withNulls, "logit", col("y"), edges)
      .orderBy("bin").collect()
    assert(rel2.map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
      r.getAs[Long]("positives"))).toSeq === Seq((0, 2L, 0L), (1, 3L, 2L)))
  }

  test("rejects non-increasing edges") {
    intercept[IllegalArgumentException] {
      Calibration.reliability(scored, "logit", col("y"), Array(0.0, 0.0))
    }
  }
}
