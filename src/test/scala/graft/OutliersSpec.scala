package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Outliers

/** MAD outlier semantics: robustness to planted extremes, agreement between
  * the exact and sketch paths, and interpolated-median arithmetic.
  */
class OutliersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a planted extreme is flagged; the bulk is not") {
    val vals = (1 to 99).map(_.toDouble) :+ 1e6
    val df = vals.map(("g", _)).toDF("g", "v")
    val flagged = Outliers.madOutliers(df, Seq("g"), "v", k = 3.0)
      .filter(col("is_outlier")).select("v").as[Double].collect()
    assert(flagged.toSet == Set(1e6))
  }

  test("median/MAD are interpolated exactly on an even-sized group") {
    // values 1,2,3,4: median 2.5; deviations 1.5,0.5,0.5,1.5 -> MAD 1.0
    val df = Seq(1.0, 2.0, 3.0, 4.0).map(("g", _)).toDF("g", "v")
    val row = Outliers.madOutliers(df, Seq("g"), "v", k = 3.0)
      .select("median", "mad").head
    assert(row.getDouble(0) == 2.5 && row.getDouble(1) == 1.0)
  }

  test("mean/stddev z-score would mask what MAD catches (robustness)") {
    // 10% contamination inflates the stddev so much that 3-sigma keeps the
    // contaminators; 3-MAD still flags them
    val vals = (1 to 90).map(_ => 100.0) ++ (1 to 10).map(_ => 1e5)
    val df = vals.map(("g", _)).toDF("g", "v")
    val madFlags = Outliers.madOutliers(df, Seq("g"), "v", k = 3.0)
      .filter(col("is_outlier")).count()
    assert(madFlags == 10)
    val stats = df.agg(avg("v").as("m"), stddev("v").as("s")).head
    val sigmaFlags = vals.count(v => math.abs(v - stats.getDouble(0)) > 3 * stats.getDouble(1))
    assert(sigmaFlags == 0, "3-sigma unexpectedly caught the contamination")
  }

  test("approx path agrees with exact on flag counts at gate scale") {
    val orders = graft.core.Tables.orders(spark, SparkTestSession.sfDir)
      .select("o_orderpriority", "o_totalprice")
    val exact = Outliers.madOutliers(orders, Seq("o_orderpriority"), "o_totalprice", 3.0)
      .filter(col("is_outlier")).count()
    val approx = Outliers.madOutliersApprox(orders, Seq("o_orderpriority"), "o_totalprice", 3.0)
      .filter(col("is_outlier")).count()
    val denom = math.max(exact, 1L).toDouble
    assert(math.abs(exact - approx) / denom <= 0.1,
      s"exact $exact vs approx $approx")
  }

  test("groupZScore standardizes within each group") {
    import spark.implicits._
    val df = Seq(
      ("a", 10), ("a", 20), ("a", 30),
      ("b", 5), ("b", 5)).toDF("g", "v")
    val out = Outliers.groupZScore(df, Seq("g"), "v")
      .select("g", "v", "mean", "std", "z")
      .as[(String, Int, Double, Double, Double)].collect().sortBy(r => (r._1, r._2))
    // group a: mean 20, population std sqrt(200/3)
    val stdA = math.sqrt(200.0 / 3.0)
    assert(out(0)._3 === 20.0 && math.abs(out(0)._5 - (-10.0 / stdA)) < 1e-12)
    assert(out(1)._5 === 0.0)
    assert(math.abs(out(2)._5 - 10.0 / stdA) < 1e-12)
    // constant group: variance 0 → z 0, std 0, no NaN
    assert(out(3)._4 === 0.0 && out(3)._5 === 0.0)
    // z-scores within a group sum to ~0 and have unit population variance
    val zs = out.take(3).map(_._5)
    assert(math.abs(zs.sum) < 1e-12)
    assert(math.abs(zs.map(z => z * z).sum / 3 - 1.0) < 1e-12)
  }

  test("groupZScore: NULL values carry no mass and score NULL") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", Some(3)), ("a", None))
      .toDF("g", "v")
    val rows = Outliers.groupZScore(df, Seq("g"), "v")
      .select("v", "mean", "z").collect()
    // moments from the 3 non-null values only: mean 2, not 6/4
    assert(rows.forall(_.getDouble(1) === 2.0))
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(2), "NULL value must score z = NULL, not 0")
    val z1 = rows.find(r => !r.isNullAt(0) && r.getInt(0) == 1).get.getDouble(2)
    assert(math.abs(z1 - (-1.0 / math.sqrt(2.0 / 3.0))) < 1e-12)
  }
}
