package graft

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** DeflateLength pinned against java.util.zip directly (the gate over it
  * is rows-only — no SQL oracle can replay DEFLATE), plus the ratio
  * semantics of the Gopher compression band.
  */
class DeflateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rawDeflateLen(s: String, level: Int = 6): Long = {
    val d = new Deflater(level, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("deflateLen matches java.util.zip raw DEFLATE, including unicode") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "naïve café — résumé über alles 你好",
      "")
    val got = samples.toDF("text")
      .select(TextFunctions.deflateLen(col("text"))).as[Long].collect()
    assert(got.toSeq === samples.map(rawDeflateLen(_)))
  }

  test("repetitive text compresses harder than diverse text") {
    val rep = "spam spam spam spam " * 50
    val div = (0 until 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val ratios = Seq(rep, div).toDF("text")
      .select(TextFunctions.compressionRatio(col("text"))).as[Double].collect()
    assert(ratios(0) < 0.3, s"repetitive ratio ${ratios(0)}")
    assert(ratios(0) < ratios(1))
  }

  test("ratio is NULL for empty text and NULL for null text") {
    val df = Seq(Some(""), None).toDF("text")
      .select(TextFunctions.compressionRatio(col("text")).as("r"))
    assert(df.collect().forall(_.isNullAt(0)))
  }
}
