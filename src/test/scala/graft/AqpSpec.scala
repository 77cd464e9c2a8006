package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Aqp

/** AQP sampled-sum estimates: deterministic membership, the exact algebra
  * on degenerate (constant) data, CLT interval behavior on spread data,
  * and the NULL-error-bar contract for under-sampled groups.
  */
class AqpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Scala twin of Sampling.hashBucket(key, 100) for string keys. */
  private def bucket(key: String): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100).toInt
  }

  test("constant values: estimate equals the true total exactly, CI collapses") {
    // every sampled row carries the same value, so the sample mean IS the
    // population mean and the variance is exactly 0.0
    val df = (1 to 400).map(i => ("A", s"k$i", 10.0)).toDF("g", "k", "v")
    val r = Aqp.sampledSum(df, "k", "v", Seq("g"), samplePct = 10).head()
    assert(r.getAs[Long]("n_total") === 400L)
    val expected = 4000.0
    assert(r.getAs[Double]("total_true") === expected)
    assert(r.getAs[Double]("total_est") === expected)
    assert(r.getAs[Double]("ci_lo") === expected)
    assert(r.getAs[Double]("ci_hi") === expected)
    assert(r.getAs[Boolean]("ci_hit"))
  }

  test("sample membership matches the scalar md5 twin and is deterministic") {
    val keys = (1 to 300).map(i => s"key$i")
    val df = keys.map(k => ("A", k, 1.0)).toDF("g", "k", "v")
    val expectedN = keys.count(bucket(_) < 20)
    val r1 = Aqp.sampledSum(df, "k", "v", Seq("g"), samplePct = 20).head()
    val r2 = Aqp.sampledSum(df, "k", "v", Seq("g"), samplePct = 20).head()
    assert(r1.getAs[Long]("n_sample") === expectedN.toLong)
    assert(r1.getAs[Double]("ci_lo") === r2.getAs[Double]("ci_lo"))
  }

  test("spread data: interval brackets the estimate and covers the truth here") {
    // deterministic linear values; 20% sample of 1000 rows — the 95% CI
    // on THIS fixed dataset comfortably contains the truth
    val df = (1 to 1000).map(i => ("A", s"id$i", (i % 100) + 0.5)).toDF("g", "k", "v")
    val r = Aqp.sampledSum(df, "k", "v", Seq("g"), samplePct = 20).head()
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("total_est"))
    assert(r.getAs[Double]("total_est") < r.getAs[Double]("ci_hi"))
    assert(r.getAs[Boolean]("ci_hit"),
      s"true=${r.getAs[Double]("total_true")} ci=[${r.getAs[Double]("ci_lo")}, ${r.getAs[Double]("ci_hi")}]")
  }

  test("groups sampled below 2 rows report NULL error bars, never fake ones") {
    // keys chosen so at most one lands under a 1% sample
    val keys = (1 to 50).map(i => s"z$i")
    assert(keys.count(bucket(_) < 1) <= 1)
    val df = keys.map(k => ("A", k, 5.0)).toDF("g", "k", "v")
    val r = Aqp.sampledSum(df, "k", "v", Seq("g"), samplePct = 1).head()
    assert(r.isNullAt(r.fieldIndex("ci_lo")))
    assert(r.isNullAt(r.fieldIndex("ci_hit")))
  }
}
