package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FilterAgreement

/** Confusion counts and Cohen's kappa on hand-computed decision frames:
  * the chance correction, the degenerate-pe NULL, and null-as-drop.
  */
class FilterAgreementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kappa: counts and chance-corrected agreement") {
    // both=4, only_a=2, only_b=1, neither=3 → po=.7, pa=.6, pb=.5,
    // pe=.6*.5+.4*.5=.5, kappa=(.7-.5)/.5=0.4
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(2)((true, false)) ++
        Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("a", "b")
    val r = FilterAgreement.kappa(df, col("a"), col("b")).collect().head
    assert((r.getAs[Long]("n"), r.getAs[Long]("both_keep"),
      r.getAs[Long]("only_a"), r.getAs[Long]("only_b"),
      r.getAs[Long]("neither")) === ((10L, 4L, 2L, 1L, 3L)))
    assert(r.getAs[Double]("po") === 0.7)
    assert(r.getAs[Double]("pe") === 0.5)
    // same double chain as the operator: (0.7-0.5)/(1-0.5), one ulp
    // below the rational 0.4
    assert(r.getAs[Double]("kappa") === (0.7 - 0.5) / (1.0 - 0.5))
  }

  test("kappa: NULL when both filters are constant (pe = 1)") {
    val df = Seq.fill(5)((true, true)).toDF("a", "b")
    val r = FilterAgreement.kappa(df, col("a"), col("b")).collect().head
    assert(r.getAs[Double]("pe") === 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("kappa: NULL decisions count as DROP and groups are independent") {
    val df = Seq(
      ("x", Some(true), Some(true)), ("x", None, Some(true)),
      ("y", Some(false), Some(false)), ("y", Some(false), None)
    ).toDF("g", "a", "b")
    val rows = FilterAgreement.kappa(df, col("a"), col("b"), Seq("g"))
      .orderBy("g").collect()
    // x: both=1, only_b=1; y: neither=2
    assert((rows(0).getAs[Long]("both_keep"),
      rows(0).getAs[Long]("only_b")) === ((1L, 1L)))
    assert(rows(1).getAs[Long]("neither") === 2L)
  }
}
