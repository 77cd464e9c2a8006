package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.expressions.BloomUtil
import graft.operators.TextDedup

/** Bloom-filter build/probe arithmetic and the Bloom decontamination path's
  * exact equivalence to the broadcast-semi-join path.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()

  test("BloomUtil: no false negatives, bounded false-positive rate") {
    val rnd = new scala.util.Random(7)
    val inserted = Array.fill(10000)(rnd.nextLong())
    val bits = new Array[Long](BloomUtil.bitsFor(10000, 16) >>> 6)
    inserted.foreach(h => BloomUtil.set(bits, h, 6))
    assert(inserted.forall(h => BloomUtil.contains(bits, h, 6)))
    val insertedSet = inserted.toSet
    val probes = Array.fill(100000)(rnd.nextLong()).filterNot(insertedSet)
    val fpr = probes.count(h => BloomUtil.contains(bits, h, 6)).toDouble / probes.length
    // 16 bits/item, k=6 → theoretical FPR ~0.04%; allow an order of margin
    assert(fpr < 0.01, s"false-positive rate $fpr")
  }

  test("bitsFor rounds to a power of two and scales with items") {
    assert(BloomUtil.bitsFor(0, 16) == 64)
    val b = BloomUtil.bitsFor(10000, 16)
    assert(b >= 10000 * 16 && (b & (b - 1)) == 0)
  }

  test("decontaminateBloom equals the exact broadcast path bit-for-bit") {
    val bench = docs.filter(col("doc_id") < 5)
    val exact = TextDedup.decontaminate(docs, "doc_id", "text", bench, "text", n = 4)
      .select("doc_id").as[Long].collect().sorted
    val viaBloom = TextDedup.decontaminateBloom(docs, "doc_id", "text", bench, "text", n = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(viaBloom.sameElements(exact))
    // the blocklist's own documents share all their shingles → removed
    assert(!viaBloom.contains(0L))
  }

  test("a sparse filter prunes most of the corpus before exact verification") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bench = docs.filter(col("doc_id") === 0)
    def shingleArr(c: String) = ColumnBridge.column(
      graft.expressions.ShingleHashes(ColumnBridge.expression(col(c)), 8))
    val blArrs = bench.select(shingleArr("text").as("shs"))
    val numBits = BloomUtil.bitsFor(blArrs.agg(sum(size(col("shs")))).head.getLong(0), 16)
    val bits = blArrs.agg(ColumnBridge.column(
      graft.expressions.BloomAgg(ColumnBridge.expression(col("shs")), numBits, 6)
        .toAggregateExpression()).as("b")).head.getSeq[Long](0).toArray
    val flagged = docs.filter(ColumnBridge.column(
      graft.expressions.BloomAnyContain(
        ColumnBridge.expression(shingleArr("text")), bits, 6))).count()
    // 8-gram overlap with a single doc is rare: the prefilter must reject
    // the overwhelming majority (that's the entire point of the scale path)
    assert(flagged < docs.count() / 5, s"prefilter kept $flagged")
    assert(flagged >= 1) // the doc itself always hits
  }
}
