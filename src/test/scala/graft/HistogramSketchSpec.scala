package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HistogramSketch

/** Histogram-sketch contract: merge associativity (shard split must not
  * change the merged histogram), interpolation arithmetic on hand-countable
  * bins, clamp semantics, and bounded error vs exact quantiles.
  */
class HistogramSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // values 1..100, lo=0 hi=100, 10 bins of width 10
  private lazy val vals = (1 to 100).map(v => (v.toLong % 7, v.toDouble))
    .toDF("shard", "x")

  test("merge is shard-independent: 7 shards == 2 shards == 1 shard") {
    def hist(shards: Int) = HistogramSketch.merge(
      HistogramSketch.sketch(
        vals.withColumn("shard", col("shard") % shards),
        "shard", "x", 0.0, 100.0, 10))
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(hist(7) === hist(1))
    assert(hist(2) === hist(1))
  }

  test("interpolated quantiles on a uniform histogram") {
    // bin b holds [10b, 10b+10): bin 0 has 9 values (1..9), bins 1-8 have
    // 10, bin 9 has 11 (90..99 plus the clamped 100)
    val merged = HistogramSketch.merge(
      HistogramSketch.sketch(vals, "shard", "x", 0.0, 100.0, 10))
    val got = HistogramSketch.quantiles(merged, Seq(0.5, 0.9, 1.0),
      0.0, 100.0, 10)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // replay the documented dag: target q·100 lands in the bin whose
    // inclusive cumulative reaches it; interpolate inside
    def cumBelow(b: Int) = if (b == 0) 0.0 else 9.0 + 10.0 * (b - 1)
    def cnt(b: Int) = if (b == 0) 9.0 else if (b == 9) 11.0 else 10.0
    def want(q: Double) = {
      val target = q * 100.0
      val b = (0 to 9).find(b => cumBelow(b) < target &&
        target <= cumBelow(b) + cnt(b)).get
      0.0 + 10.0 * (b + (target - cumBelow(b)) / cnt(b))
    }
    for (q <- Seq(0.5, 0.9, 1.0))
      assert(got(q) === want(q), s"q=$q")
    assert(math.abs(got(0.5) - 51.0) < 1e-9)
    assert(got(1.0) === 100.0)
  }

  test("out-of-range values clamp into edge bins") {
    val df = Seq((0L, -5.0), (0L, 500.0), (0L, 15.0)).toDF("shard", "x")
    val h = HistogramSketch.sketch(df, "shard", "x", 0.0, 100.0, 10)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(h === Map(0 -> 1L, 9 -> 1L, 1 -> 1L))
  }

  test("estimate error is within one bin width of the exact quantile") {
    val docs = graft.core.Tables.documents(spark, SparkTestSession.sfDir)
      .withColumn("shard", col("doc_id") % 4)
    val merged = HistogramSketch.merge(
      HistogramSketch.sketch(docs, "shard", "n_chars", 0.0, 600.0, 60))
    val est = HistogramSketch.quantiles(merged, Seq(0.5, 0.9), 0.0, 600.0, 60)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = docs.stat.approxQuantile("n_chars", Array(0.5, 0.9), 0.0)
    assert(math.abs(est(0.5) - exact(0)) <= 10.0,
      s"p50 est ${est(0.5)} exact ${exact(0)}")
    assert(math.abs(est(0.9) - exact(1)) <= 10.0,
      s"p90 est ${est(0.9)} exact ${exact(1)}")
  }
}
