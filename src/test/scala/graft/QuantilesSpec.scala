package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** Value-domain exact quantiles must agree with Spark's own `percentile`
  * aggregate (the multiset-based exact reference) on every q, including
  * ties, tiny groups, and the q=0/1 endpoints — the value-domain walk is a
  * scalability rewrite, not a semantics change.
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  test("matches Spark percentile on skewed integer data with heavy ties") {
    val df = spark.range(10000)
      .select((col("id") % 3).cast("string").as("g"),
        // heavy ties: only ~60 distinct values, zipf-ish
        (col("id") * col("id") % 61).as("v"))
    val got = Quantiles.exactIntQuantiles(df, Seq("g"), "v", qs)
      .select("g", "q", "quantile").as[(String, Double, Double)]
      .collect().map { case (g, q, x) => (g, q) -> x }.toMap
    val want = df.groupBy("g")
      .agg(percentile(col("v"), array(qs.map(lit): _*)).as("p"))
      .select(col("g"), posexplode(col("p")))
      .as[(String, Int, Double)].collect()
      .map { case (g, i, x) => (g, qs(i)) -> x }.toMap
    assert(got.keySet === want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-9, s"$k: got ${got(k)}, want $w")
  }

  test("single-value group returns that value for every q") {
    val df = Seq(("a", 7), ("a", 7), ("b", 3)).toDF("g", "v")
    val got = Quantiles.exactIntQuantiles(df, Seq("g"), "v", Seq(0.0, 0.5, 1.0))
      .select("g", "quantile").as[(String, Double)].collect()
    assert(got.filter(_._1 == "a").forall(_._2 == 7.0))
    assert(got.filter(_._1 == "b").forall(_._2 == 3.0))
  }

  test("even-count interpolation lands between the two middle values") {
    val df = Seq(1, 2, 3, 4).map(("g", _)).toDF("g", "v")
    val got = Quantiles.exactIntQuantiles(df, Seq("g"), "v", Seq(0.5))
      .select("quantile").as[Double].head()
    assert(got === 2.5)
  }

  test("NULL values are ignored, matching percentile; duplicate qs collapse") {
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", Some(3)),
      ("a", None), ("b", None)).toDF("g", "v")
    val got = Quantiles.exactIntQuantiles(df, Seq("g"), "v",
      Seq(0.0, 0.5, 0.5, 1.0))
      .select("g", "q", "quantile").as[(String, Double, Double)].collect()
    // all-NULL group b disappears; NULL in group a carries no position
    assert(got.forall(_._1 == "a"))
    assert(got.length === 3, "duplicate q must not duplicate output rows")
    val byQ = got.map(r => r._2 -> r._3).toMap
    assert(byQ(0.0) === 1.0 && byQ(0.5) === 2.0 && byQ(1.0) === 3.0)
  }

  test("robustScale: median/IQR arithmetic, zero-IQR and NULL contracts") {
    val df = Seq(("a", Some(10)), ("a", Some(20)), ("a", Some(30)),
      ("a", Some(40)), ("a", None),
      ("b", Some(7)), ("b", Some(7)), ("b", Some(7))).toDF("g", "v")
    val out = Quantiles.robustScale(df, Seq("g"), "v")
      .select("g", "v", "median", "iqr", "robust_z").collect()
    val a = out.filter(_.getString(0) == "a")
    // type-7 quartiles of [10,20,30,40]: q1=17.5, med=25, q3=32.5, iqr=15
    assert(a.forall(r => r.getDouble(2) == 25.0 && r.getDouble(3) == 15.0))
    val a10 = a.find(r => !r.isNullAt(1) && r.getInt(1) == 10).get
    assert(math.abs(a10.getDouble(4) - (10.0 - 25.0) / 15.0) < 1e-12)
    assert(a.find(_.isNullAt(1)).get.isNullAt(4), "NULL value -> NULL robust_z")
    // constant group: IQR 0 -> robust_z 0, no blow-up
    val b = out.filter(_.getString(0) == "b")
    assert(b.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }

  test("deterministic under repartitioning") {
    val df = spark.range(5000)
      .select((col("id") % 5).cast("string").as("g"), (col("id") % 97).as("v"))
    val a = Quantiles.exactIntQuantiles(df, Seq("g"), "v", qs)
      .collect().map(_.toString).sorted
    val b = Quantiles.exactIntQuantiles(df.repartition(13), Seq("g"), "v", qs)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("robustScale keeps all-NULL groups, scored NULL (groupZScore contract)") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1L)), ("a", Some(3L)), ("a", Some(5L)), ("a", None),
      ("b", None), ("b", None) // group with NO non-null values
    ).toDF("g", "v")
    val out = Quantiles.robustScale(df, Seq("g"), "v")
    assert(out.count() == 6) // an inner quartile join would drop group b
    val bRows = out.filter(col("g") === "b").collect()
    assert(bRows.length == 2 && bRows.forall(_.isNullAt(out.columns.indexOf("robust_z"))))
    // null values inside a scored group also come back NULL, others scored
    val aNull = out.filter(col("g") === "a" && col("v").isNull).collect()
    assert(aNull.length == 1 && aNull.head.isNullAt(out.columns.indexOf("robust_z")))
  }
}
