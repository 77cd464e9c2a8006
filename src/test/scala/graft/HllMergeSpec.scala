package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Sharded HLL sketches: merge-invariance (union of shard sketches equals
  * the unsharded sketch) and estimate accuracy against exact distincts.
  */
class HllMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sfDir).cache()

  test("sharded union estimate tracks the unsharded sketch estimate") {
    // the union gadget re-buckets registers, so estimates can differ by a
    // hair (observed 499 vs 501 on 500 docs) — pin them to within 2%
    val sharded = docs
      .withColumn("shard", graft.operators.Sampling.hashBucket(col("doc_id"), 8))
      .groupBy("shard").agg(hll_sketch_agg(col("text")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).as[Long].head()
    val direct = docs.agg(hll_sketch_estimate(hll_sketch_agg(col("text"))))
      .as[Long].head()
    val rel = math.abs(sharded - direct).toDouble / direct
    assert(rel <= 0.02, s"shard-merged estimate $sharded vs direct $direct")
  }

  test("estimates stay within 5% of exact distinct counts per source") {
    val exact = docs.groupBy("source").agg(countDistinct(col("text")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = docs.groupBy("source").agg(
      hll_sketch_estimate(hll_sketch_agg(col("text"))).as("e"))
      .as[(String, Long)].collect().toMap
    assert(exact.keySet == est.keySet)
    exact.foreach { case (src, n) =>
      val rel = math.abs(est(src) - n).toDouble / n
      assert(rel <= 0.05, s"source $src: est ${est(src)} vs exact $n (err $rel)")
    }
  }
}
