package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GopherQuality

/** Each Gopher rule fires on a crafted document that violates exactly that
  * rule; the conjunction and the filter form agree with the report.
  */
class GopherQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val stops = Seq("the", "of", "and")
  // relaxed word bound so the crafted docs stay short
  private val t = GopherQuality.Thresholds(minWords = 5, maxWords = 20)

  private def good = "the cat sat of the mat and then slept all afternoon"

  private lazy val docs = Seq(
    (0L, good),                                        // passes everything
    (1L, "the of and"),                                // too few words
    (2L, "the extraordinarily of xylophonequalifications and " +
      "internationalization considerations somewhere tomorrow"), // mean len high
    (3L, "the cat# of mat## and then... slept#"),        // symbols attached
    (4L, "the 12 of 34 and 56 78 90 11 22"),            // alpha frac low
    (5L, "cats sit on mats every single day here now")  // no stopwords
  ).toDF("doc_id", "text")

  private lazy val rep =
    GopherQuality.report(docs, "doc_id", "text", stops, t)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("clean document passes every rule") {
    val r = rep(0L)
    assert(r.getAs[Boolean]("pass"))
    assert(r.getAs[Long]("n_words") === 11L)
  }

  test("each rule fires on its crafted violator, others hold") {
    def flags(id: Long) = {
      val r = rep(id)
      Seq("ok_words", "ok_mean_len", "ok_symbols", "ok_alpha", "ok_stops")
        .map(f => f -> r.getAs[Boolean](f)).toMap
    }
    assert(!flags(1L)("ok_words"))
    assert(!flags(2L)("ok_mean_len") && flags(2L)("ok_words"))
    assert(!flags(3L)("ok_symbols") && flags(3L)("ok_alpha"))
    assert(!flags(4L)("ok_alpha") && flags(4L)("ok_symbols"))
    assert(!flags(5L)("ok_stops") && flags(5L)("ok_words"))
    for (id <- 1L to 5L) assert(!rep(id).getAs[Boolean]("pass"), s"doc $id")
  }

  test("symbol ratio counts hashes and ellipses, non-overlapping") {
    // "the cat# of mat## and then... slept#": 4 hashes + 1 ellipsis, 7 words
    val r = rep(3L)
    assert(math.abs(r.getAs[Double]("symbol_ratio") - 5.0 / 7.0) < 1e-12)
  }

  test("filterPassing is the pass-flag filter, map-side") {
    val kept = GopherQuality.filterPassing(docs, "text", stops, t)
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(0L))
    // no shuffle in the plan: a pure filter over the scan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
