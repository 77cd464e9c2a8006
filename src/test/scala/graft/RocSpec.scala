package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Calibration, Roc}

/** Exact-AUC midrank arithmetic (ties, degenerate classes, perfect
  * separation) and the bin-threshold ROC points, on hand-computed frames.
  */
class RocSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def aucOf(rows: Seq[(Double, Boolean)]): org.apache.spark.sql.Row =
    Roc.auc(rows.toDF("score", "y"), "score", col("y")).collect().head

  test("auc: midranks handle cross-class ties") {
    // pairs: (.2T,.1F)=1, (.2T,.2F)=.5, (.3T,.1F)=1, (.3T,.2F)=1 → 3.5/4
    val r = aucOf(Seq((0.1, false), (0.2, true), (0.2, false), (0.3, true)))
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("auc") === 0.875)
  }

  test("auc: perfect separation is 1.0, reversed is 0.0") {
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
    assert(aucOf(sep).getAs[Double]("auc") === 1.0)
    assert(aucOf(sep.map { case (s, y) => (-s, y) }).getAs[Double]("auc") === 0.0)
  }

  test("auc: NULL scores are excluded, not ranked as a level") {
    val withNull = Seq((Some(0.1), false), (Some(0.2), true),
      (Some(0.2), false), (Some(0.3), true), (None, true))
      .toDF("score", "y")
    val r = Roc.auc(withNull, "score", col("y")).collect().head
    assert(r.getAs[Long]("n_pos") === 2L) // the unscored positive is out
    assert(r.getAs[Double]("auc") === 0.875)
  }

  test("auc: undefined (NULL) when a class is empty") {
    val r = aucOf(Seq((0.1, true), (0.2, true)))
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("rocPoints: descending-threshold cumulative counts and rates") {
    val scored = Seq(
      // bin 0 [0,1): n=4 pos=1; bin 1 [1,2): n=3 pos=2; bin 2 [2,3): n=2 pos=2
      (0.1, true), (0.2, false), (0.3, false), (0.4, false),
      (1.1, true), (1.2, true), (1.3, false),
      (2.1, true), (2.2, true)
    ).toDF("logit", "y")
    val rel = Calibration.reliability(scored, "logit", col("y"),
      Array(0.0, 1.0, 2.0, 3.0))
    val pts = Roc.rocPoints(rel).orderBy("bin").collect()
    // bin 0's threshold is -inf: reliability clamps below-range scores
    // into it, so its row means "keep everything"
    assert(pts.map(r => (r.getAs[Int]("bin"), r.getAs[Double]("threshold"),
      r.getAs[Long]("tp"), r.getAs[Long]("fp"))).toSeq ===
      Seq((0, Double.NegativeInfinity, 5L, 4L), (1, 1.0, 4L, 1L),
        (2, 2.0, 2L, 0L)))
    assert(pts.map(_.getAs[Double]("tpr")).toSeq === Seq(1.0, 0.8, 0.4))
    assert(pts.map(_.getAs[Double]("fpr")).toSeq === Seq(1.0, 0.25, 0.0))
  }

  test("prPoints: precision/recall/F1 at the same descending thresholds") {
    val scored = Seq(
      // bin 0 [0,1): n=4 pos=1; bin 1 [1,2): n=3 pos=2; bin 2 [2,3): n=2 pos=2
      (0.1, true), (0.2, false), (0.3, false), (0.4, false),
      (1.1, true), (1.2, true), (1.3, false),
      (2.1, true), (2.2, true)
    ).toDF("logit", "y")
    val rel = Calibration.reliability(scored, "logit", col("y"),
      Array(0.0, 1.0, 2.0, 3.0))
    val pts = Roc.prPoints(rel).orderBy("bin").collect()
    // P=5; keep-all: tp=5/pred=9; ≥1: tp=4/pred=5; ≥2: tp=2/pred=2
    assert(pts.map(r => (r.getAs[Int]("bin"), r.getAs[Long]("tp"),
      r.getAs[Long]("pred_pos"))).toSeq ===
      Seq((0, 5L, 9L), (1, 4L, 5L), (2, 2L, 2L)))
    assert(pts.map(_.getAs[Double]("precision")).toSeq
      === Seq(5.0 / 9.0, 0.8, 1.0))
    assert(pts.map(_.getAs[Double]("recall")).toSeq === Seq(1.0, 0.8, 0.4))
    assert(pts.map(_.getAs[Double]("f1")).toSeq
      === Seq(10.0 / 14.0, 8.0 / 10.0, 4.0 / 7.0))
    assert(pts.head.getAs[Double]("threshold") === Double.NegativeInfinity)
  }

  test("rocPoints: empty reliability table yields zero rows") {
    val rel = Calibration.reliability(
      Seq.empty[(Double, Boolean)].toDF("logit", "y"), "logit", col("y"),
      Array(0.0, 1.0))
    assert(Roc.rocPoints(rel).count() === 0L)
  }
}
