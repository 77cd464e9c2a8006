package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InferenceBatching

/** Length-bucketed inference batching: band assignment, batch-size bounds,
  * no band-crossing batches, waste accounting, and determinism.
  */
class InferenceBatchingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val rows = (1L to 1000L).map(i => (i, (i * 7 % 97 + 1).toInt))
    .toDF("id", "len").cache()

  val bounds = Seq(25, 50, 75)

  test("lengthBucket bands by end-exclusive upper bounds") {
    val f = Seq((1L, 10), (2L, 24), (3L, 25), (4L, 74), (5L, 75), (6L, 500))
      .toDF("id", "len")
      .select(InferenceBatching.lengthBucket(col("len"), bounds).as("b"))
      .as[Int].collect().toSeq
    assert(f == Seq(0, 0, 1, 2, 3, 3))
  }

  test("no batch exceeds batchSize and none crosses a (bucket, shard)") {
    val a = InferenceBatching.assign(rows, "id", "len", bounds,
      batchSize = 8, numShards = 4)
    val per = a.groupBy("bucket", "shard", "batch_idx")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("bucket")).as("nb"),
        countDistinct(col("shard")).as("ns"))
    assert(per.filter(col("n") > 8).count() == 0)
    assert(per.filter(col("nb") > 1 || col("ns") > 1).count() == 0)
    // only the LAST batch of a (bucket, shard) run may be short
    val short = per.filter(col("n") < 8)
      .select("bucket", "shard", "batch_idx").collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val last = a.groupBy("bucket", "shard").agg(max("batch_idx").as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(short.subsetOf(last))
  }

  test("every row is assigned exactly once and pad_len bounds its band") {
    val a = InferenceBatching.assign(rows, "id", "len", bounds, 8, 4)
    assert(a.count() == 1000)
    assert(a.select(countDistinct(col("id"))).as[Long].collect().head == 1000)
    val bad = a.filter(
      (col("bucket") === 0 && (col("len") > 24 || col("pad_len") =!= 24)) ||
        (col("bucket") === 1 && (col("len") < 25 || col("len") > 49)) ||
        (col("bucket") === 3 && (col("len") < 75 || col("pad_len") =!= col("len"))))
    assert(bad.count() == 0)
  }

  test("waste accounting reconciles: padded >= real, fractions in [0,1)") {
    val w = InferenceBatching.wasteReport(rows, "id", "len", bounds, 8, 4)
      .collect()
    assert(w.map(_.getLong(1)).sum == 1000)
    w.foreach { r =>
      assert(r.getLong(4) >= r.getLong(3))
      val f = r.getDouble(5)
      assert(f >= 0.0 && f < 1.0)
    }
  }

  test("assignment is deterministic across partitionings") {
    val a = InferenceBatching.assign(rows, "id", "len", bounds, 8, 4)
      .orderBy("id").collect()
    val b = InferenceBatching.assign(rows.repartition(17), "id", "len", bounds, 8, 4)
      .orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
