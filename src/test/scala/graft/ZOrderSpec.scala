package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order semantics (known Morton codes, locality) and the layout's reason
  * to exist: a z-ordered file layout prunes on BOTH dimensions, a
  * single-column sort only on its own.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits (a odd positions, b even)") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): a=0b011 -> odd bits 0_1_1_ , b=0b101 -> even bits 1_0_1 => 0b011011
    assert(got == Seq(2L, 1L, 27L, 0xFFFFFFFFL))
  }

  /** Files (min/max envelopes per dimension) a box predicate cannot prune. */
  private def filesTouched(layout: DataFrame,
      aLo: Int, aHi: Int, bLo: Int, bHi: Int): Long =
    layout.groupBy("file")
      .agg(min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
      .filter(col("max_a") >= aLo && col("min_a") <= aHi &&
        col("max_b") >= bLo && col("min_b") <= bHi)
      .count()

  test("z-order layout prunes both dimensions; linear sort only one") {
    // 64x64 grid, one row per cell
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong * 64 + y, x.toLong, y.toLong))).toDF("id", "a", "b")
    val nFiles = 16
    val zLayout = ZOrder.cluster(grid, "a", "b", "id", nFiles)
    // linear layout: same file cuts, but ordered by a alone
    val linear = graft.operators.Curriculum
      .buckets(grid, Seq("a", "id"), nFiles).withColumnRenamed("bucket", "file")

    // thin slab in b: a-sorted layout cannot prune it at all
    val zSlab = filesTouched(zLayout, 0, 63, 8, 15)
    val linSlab = filesTouched(linear, 0, 63, 8, 15)
    assert(linSlab == nFiles, s"a-sorted layout should touch every file, got $linSlab")
    assert(zSlab <= nFiles / 2, s"z-order should prune the b-slab, touched $zSlab")

    // small box: z-order keeps pruning competitive on a too
    val zBox = filesTouched(zLayout, 8, 15, 8, 15)
    assert(zBox <= 4, s"z-order should localize an 8x8 box, touched $zBox")
  }
}
