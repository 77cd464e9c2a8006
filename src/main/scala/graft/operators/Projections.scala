package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Seeded Rademacher random projection — the Johnson–Lindenstrauss scale
  * path for embedding columns (Achlioptas, JCSS'03: ±1 entries preserve
  * pairwise distances as well as Gaussian ones and need no float RNG):
  * out[j] = Σ_i x[i] · s(j,i) / √k with s(j,i) ∈ {+1, −1}.
  *
  * The sign matrix is derived from md5 of `"rp:<seed>:<j>:<i>"` (first hex
  * digit's parity), so it is pure driver arithmetic that any engine can
  * replay — a DuckDB oracle regenerates the same matrix from the same
  * strings, making the projection hash-exact end to end, unlike
  * float-RNG projections which are engine-private. Projection itself is
  * one zero-shuffle [[graft.expressions.ArrayMatMul]] pass; at 100 TB
  * this is a map-only job that cuts every downstream ANN shuffle by
  * d/k.
  */
object Projections {

  /** The ±1 sign for output dim `j`, input dim `i` (0-based). */
  private[graft] def sign(seed: Int, j: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$seed:$j:$i".getBytes("UTF-8"))
    // first hex char parity = high-nibble parity of byte 0
    if (((digest(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Project `embCol` (array<float>, dim `d`) down to `k` dims. */
  def randomProjection(df: DataFrame, embCol: String, d: Int, k: Int,
      seed: Int = 0): DataFrame = {
    require(k >= 1 && d >= 1, s"dims must be positive, got d=$d k=$k")
    val rows = (0 until k).map(j => (0 until d).map(i => sign(seed, j, i)))
    val sqrtK = math.sqrt(k.toDouble)
    df.withColumn(embCol,
      ColumnBridge.column(graft.expressions.ArrayMatMul(
        ColumnBridge.expression(col(embCol)),
        rows, Seq.fill(k)(sqrtK), Seq.fill(k)(0.0))))
  }
}
