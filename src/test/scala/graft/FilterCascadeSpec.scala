package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.FilterCascade

/** Attrition funnel semantics: order sensitivity, NULL-drops, the
  * entering/kept chain, and the rate columns, on a hand-built frame.
  */
class FilterCascadeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id, len, lang): 5 rows — len NULL on row 5
  private lazy val df = Seq(
    (1L, Some(10), "en"), (2L, Some(200), "en"), (3L, Some(300), "fr"),
    (4L, Some(400), "en"), (5L, Option.empty[Int], "en")
  ).toDF("id", "len", "lang")

  private lazy val rows = FilterCascade.attrition(df, Seq(
    "len_band" -> col("len").between(100, 500),
    "lang_en" -> (col("lang") === "en")))
    .orderBy("stage").collect()

  test("entering chains from the previous stage's kept; totals are exact") {
    // stage 0: 5 in, keeps 2,3,4 (row 1 too short, row 5 NULL-drops) → 3
    // stage 1: 3 in, keeps 2,4 → 2
    assert(rows.map(r => (r.getAs[Int]("stage"), r.getAs[String]("stage_name"),
      r.getAs[Long]("entering"), r.getAs[Long]("kept"),
      r.getAs[Long]("dropped"))).toSeq ===
      Seq((0, "len_band", 5L, 3L, 2L), (1, "lang_en", 3L, 2L, 1L)))
    assert(rows.map(_.getAs[Double]("keep_rate")).toSeq
      === Seq(3.0 / 5.0, 2.0 / 3.0))
    assert(rows.map(_.getAs[Double]("cum_keep_rate")).toSeq
      === Seq(3.0 / 5.0, 2.0 / 5.0))
  }

  test("stage order changes the funnel, not the final survivor count") {
    val swapped = FilterCascade.attrition(df, Seq(
      "lang_en" -> (col("lang") === "en"),
      "len_band" -> col("len").between(100, 500)))
      .orderBy("stage").collect()
    // lang first keeps 1,2,4,5 (4); then the band keeps 2,4 (2)
    assert(swapped.map(r => (r.getAs[Long]("entering"),
      r.getAs[Long]("kept"))).toSeq === Seq((5L, 4L), (4L, 2L)))
    assert(swapped.last.getAs[Long]("kept")
      === rows.last.getAs[Long]("kept"))
  }

  test("empty input: zero counts, NULL rates, one row per stage") {
    val got = FilterCascade.attrition(
      Seq.empty[(Long, Option[Int], String)].toDF("id", "len", "lang"),
      Seq("a" -> (col("len") > 0), "b" -> (col("lang") === "en")))
      .orderBy("stage").collect()
    assert(got.map(r => (r.getAs[Long]("entering"),
      r.getAs[Long]("kept"))).toSeq === Seq((0L, 0L), (0L, 0L)))
    assert(got.forall(_.isNullAt(got.head.fieldIndex("keep_rate"))))
  }

  test("the funnel is ONE aggregate pass: a single shuffle, no joins") {
    val attr = FilterCascade.attrition(df, Seq(
      "len_band" -> col("len").between(100, 500),
      "lang_en" -> (col("lang") === "en")))
    graft.core.PlanAudit.requireMaxShuffles(attr, 1)
    graft.core.PlanAudit.requireNoProductJoins(attr)
  }

  test("duplicate stage names are rejected loudly") {
    intercept[IllegalArgumentException] {
      FilterCascade.attrition(df, Seq(
        "x" -> (col("len") > 0), "x" -> (col("lang") === "en")))
    }
  }
}
