package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** k-anonymity / l-diversity audit semantics on a hand-countable table. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // QI = (city, seg); sensitive = diag
  // (a,x): 3 rows, 2 distinct diag  → k-anon at k=3, NOT l-diverse at l=3
  // (a,y): 1 row,  1 distinct diag  → neither
  // (b,x): 4 rows, 3 distinct diag  → both
  private lazy val rows = Seq(
    ("a", "x", "flu"), ("a", "x", "flu"), ("a", "x", "cold"),
    ("a", "y", "flu"),
    ("b", "x", "flu"), ("b", "x", "cold"), ("b", "x", "ache"), ("b", "x", "flu")
  ).toDF("city", "seg", "diag")

  test("audit flags per group") {
    val got = Privacy.audit(rows, Seq("city", "seg"), "diag", k = 3, l = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got(("a", "x")) === ((3L, 2L, true, false)))
    assert(got(("a", "y")) === ((1L, 1L, false, false)))
    assert(got(("b", "x")) === ((4L, 3L, true, true)))
  }

  test("riskReport headline arithmetic") {
    val r = Privacy.riskReport(rows, Seq("city", "seg"), "diag", 3, 3).head()
    assert(r.getAs[Long]("n_rows") === 8L)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("achieved_k") === 1L)
    assert(r.getAs[Long]("rows_below_k") === 1L)   // (a,y)
    assert(r.getAs[Long]("rows_below_l") === 4L)   // (a,x) + (a,y)
  }

  test("suppress keeps only groups passing both criteria") {
    val kept = Privacy.suppress(rows, Seq("city", "seg"), "diag", 3, 3)
    assert(kept.count() === 4L)
    assert(kept.select("city", "seg").distinct().collect().toSeq
      .map(r => (r.getString(0), r.getString(1))) === Seq(("b", "x")))
  }

  test("null sensitive values: countDistinct ignores nulls") {
    val withNull = Seq(("c", "z", null: String), ("c", "z", "flu"),
      ("c", "z", "flu")).toDF("city", "seg", "diag")
    val r = Privacy.audit(withNull, Seq("city", "seg"), "diag", 2, 2).head()
    assert(r.getLong(2) === 3L)     // group size counts the null row
    assert(r.getLong(3) === 1L)     // distinct sensitive excludes null
  }
}
