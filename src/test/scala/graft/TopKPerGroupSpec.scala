package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.TopK

/** Native heap-based top-k-per-group: equivalence with the window
  * formulation, sort-free plan shape, and boundary-tie determinism.
  */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val orders = Tables.orders(spark, SparkTestSession.sfDir)
    .select("o_orderpriority", "o_orderkey", "o_totalprice").cache()

  private def windowed(k: Int) = orders
    .withColumn("rn", row_number().over(Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
    .filter(col("rn") <= k).drop("rn")

  test("equals the window formulation row-for-row") {
    Seq(1, 3, 10).foreach { k =>
      val native = TopK.perGroupNative(orders, "o_orderpriority",
        "o_totalprice", "o_orderkey", k)
        .as[(String, Long, Double)].collect().toSet
      val window = windowed(k).as[(String, Long, Double)].collect().toSet
      assert(native == window, s"k=$k")
    }
  }

  test("perGroupWindow (the spill-safe fallback) matches the native exec") {
    // the documented escape hatch for near-row-cardinality group keys must
    // stay output-identical: same ranking, tie-break, and null-row drop
    val withNulls = orders.union(
      Seq(("1-URGENT", 999999L, null.asInstanceOf[java.lang.Double]))
        .toDF("o_orderpriority", "o_orderkey", "o_totalprice")
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice").cast("double")))
    Seq(1, 5).foreach { k =>
      val native = TopK.perGroupNative(withNulls, "o_orderpriority",
        "o_totalprice", "o_orderkey", k)
        .as[(String, Long, Double)].collect().toSet
      val window = TopK.perGroupWindow(withNulls, "o_orderpriority",
        "o_totalprice", "o_orderkey", k)
        .as[(String, Long, Double)].collect().toSet
      assert(native == window, s"k=$k")
    }
  }

  test("the physical plan has no Sort and exactly one exchange") {
    val p = TopK.perGroupNative(orders, "o_orderpriority",
      "o_totalprice", "o_orderkey", 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p.take(2000))
    assert(!p.contains("Sort"), p.take(2000))
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1, p.take(2000))
  }

  test("k larger than every group returns all non-null rows") {
    val n = TopK.perGroupNative(orders, "o_orderpriority",
      "o_totalprice", "o_orderkey", 1000000).count()
    assert(n == orders.count())
  }

  test("boundary ties resolve to the smaller tie key at any partitioning") {
    val df = Seq(
      ("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 10.0), ("g", 4L, 5.0))
      .toDF("grp", "id", "score")
    Seq(df, df.repartition(7)).foreach { d =>
      val got = TopK.perGroupNative(d, "grp", "score", "id", 2)
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(Array(1L, 2L)))
    }
  }

  test("ascending mode keeps the smallest values") {
    val got = TopK.perGroupNative(orders, "o_orderpriority",
      "o_totalprice", "o_orderkey", 2, descending = false)
      .as[(String, Long, Double)].collect().toSet
    val window = orders
      .withColumn("rn", row_number().over(Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey"))))
      .filter(col("rn") <= 2).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    assert(got == window)
  }
}
