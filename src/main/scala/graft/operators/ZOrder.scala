package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension columns
  * so that sorting by the combined key co-locates rows that are close in
  * BOTH dimensions — the data-layout trick behind multi-column data
  * skipping. A table laid out in z-order and cut into files gives every file
  * a tight min/max envelope on every clustered column, so a 2-D box
  * predicate prunes files on both dimensions at once (a single-column sort
  * only ever prunes its own column; see ZOrderSpec for the measured
  * difference).
  *
  * The interleave is the classic mask-shift bit spread — five shifts, five
  * ANDs, one OR per dimension, all `long` bitwise ops that whole-stage
  * codegen fuses into the scan projection. Computing z-values for 100 TB is
  * a map-only pass; the layout itself is one range-partitioned sort, the
  * same cost class as any global `orderBy`.
  */
object ZOrder {

  private val masks = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L))

  /** Spread a 16-bit value's bits to the even positions of a 32-bit value. */
  private def spread(c: Column): Column =
    masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (sh, m)) => (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(m))
    }

  /** Morton z-value of two dimensions (each truncated to its low 16 bits);
    * `a` takes the odd (higher) bit positions.
    */
  def zValue(a: Column, b: Column): Column =
    shiftleft(spread(a), 1).bitwiseOR(spread(b))

  /** Assign each row to one of `nFiles` z-ordered "files" (equal-width cuts
    * of the global z order, via the distributed prefix-sum rank — no
    * unpartitioned window). Output adds `z` and `file` (1..nFiles). `tieCol`
    * must be unique so the order is total.
    */
  def cluster(df: DataFrame, aCol: String, bCol: String, tieCol: String,
      nFiles: Int): DataFrame =
    Curriculum.buckets(
      df.withColumn("z", zValue(col(aCol), col(bCol))),
      Seq("z", tieCol), nFiles)
      .withColumnRenamed("bucket", "file")
      .drop("rank", "total", "pct_rank")

  // DuckDB oracle fragment mirroring zValue: identical shift/mask chain over
  // BIGINT, so the z-keys (and any layout derived from them) match
  // bit-for-bit.
  private def sqlSpread(e: String): String =
    masks.foldLeft(s"(CAST($e AS BIGINT) & 65535)") {
      case (x, (sh, m)) => s"(($x | ($x << $sh)) & $m)"
    }

  def sqlZValue(a: String, b: String): String =
    s"((${sqlSpread(a)} << 1) | ${sqlSpread(b)})"
}
