package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.expressions.CountMinUtil
import graft.operators.HeavyHitters

/** Count-min sketch guarantees (never underestimates, bounded overestimate,
  * exact merge) and the heavy-hitter path's equality with plain groupBy.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()

  test("estimates never underestimate; overestimate within the eps bound") {
    val rnd = new scala.util.Random(11)
    val width = 1 << 12
    val depth = 4
    // zipf-ish stream: key i appears ~1000/i times
    val stream = (1 to 200).flatMap(i => Seq.fill(1000 / i)(i.toLong))
    val shuffled = rnd.shuffle(stream)
    val counts = new Array[Long](width * depth)
    shuffled.foreach(k => CountMinUtil.add(counts, width, depth, k))
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    truth.foreach { case (k, n) =>
      val est = CountMinUtil.estimate(counts, width, depth, k)
      assert(est >= n, s"key $k: est $est < true $n — CMS must not underestimate")
      assert(est - n <= 2L * stream.size / width,
        s"key $k: overestimate ${est - n} beyond bound")
    }
  }

  test("sharded sketches merge to exactly the single-pass sketch") {
    val width = 1 << 8
    val depth = 3
    val keys = (1 to 5000).map(i => (i % 37).toLong)
    val whole = new Array[Long](width * depth)
    keys.foreach(k => CountMinUtil.add(whole, width, depth, k))
    val merged = keys.grouped(700).map { shard =>
      val c = new Array[Long](width * depth)
      shard.foreach(k => CountMinUtil.add(c, width, depth, k))
      c
    }.reduce { (a, b) => a.indices.foreach(i => a(i) += b(i)); a }
    assert(merged.sameElements(whole))
  }

  test("heavyTokens equals plain groupBy + HAVING bit-for-bit") {
    val want = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 500L)
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.heavyTokens(docs, "text", minFreq = 500L)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty, "threshold found no heavy terms — weak test")
  }

  test("exotic whitespace and blank docs cannot desync sketch and exact passes") {
    // \f is NOT a separator for the one-pass tokenizer; blank docs emit no
    // tokens at all — the exact pass must agree, or the CMS prefilter
    // underestimates exactly those terms and drops true heavy hitters
    val tricky = Seq(
      (1L, "aa\fbb aa\fbb aa\fbb", "s"), // "aa\fbb" is ONE token, 3 times
      (2L, "   ", "s"),                  // no tokens
      (3L, "aa\fbb x", "s"))
      .toDF("doc_id", "text", "source")
    val got = HeavyHitters.heavyTokens(tricky, "text", minFreq = 3L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("aa\fbb" -> 4L))
  }

  test("an undersized sketch still yields the exact result (only more candidates)") {
    val want = HeavyHitters.heavyTokens(docs, "text", minFreq = 500L)
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.heavyTokens(docs, "text", minFreq = 500L,
      width = 64, depth = 2)
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }
}
