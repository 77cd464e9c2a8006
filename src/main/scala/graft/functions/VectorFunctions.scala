package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (zip_with/aggregate/transform — codegen'd, no UDFs).
  *
  * Determinism: every reduction here is a *sequential left fold* in double
  * precision (`aggregate` folds element-by-element). float→double widening is
  * exact and IEEE double ops are deterministic, so results are bit-identical
  * to any engine that folds the same way — DuckDB's list_sum does (verified),
  * which is what makes the cosine queries oracle-comparable without resorting
  * to decimal arithmetic. Per-row folds don't depend on partitioning, so
  * results are also stable across cluster layouts.
  */
object VectorFunctions {

  /** Dot product: sequential double fold, as a native codegen'd expression
    * (graft.expressions.FloatVecDot). The higher-order formulation
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` computes the same value but
    * interpreted — ~an order of magnitude slower in pair-heavy plans.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.FloatVecDot(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Nearest-centroid cell id by cosine, against a driver-held centroid
    * matrix — a zero-shuffle projection (graft.expressions.NearestCell).
    * `cells` must be sorted ascending for lowest-cell tie-breaking.
    */
  def nearestCell(vec: Column, cells: Array[Int], centroids: Array[Array[Float]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.NearestCell(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        cells, centroids))

  /** Nearest-centroid cell id by EUCLIDEAN distance — the PQ-subquantizer
    * metric (graft.expressions.NearestCellL2), same zero-shuffle shape.
    * `cells` must be sorted ascending for lowest-cell tie-breaking.
    */
  def nearestCellL2(vec: Column, cells: Array[Int], centroids: Array[Array[Float]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.NearestCellL2(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        cells, centroids))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Random-hyperplane LSH bucket: `bits` sign bits of dot products with
    * pseudo-random ±1 hyperplanes derived from xxhash64(bit, dim) — fully
    * deterministic, no trained state to ship to executors.
    */
  def hyperplaneBucket(vec: Column, bits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val signedDot = (j: Int) =>
      aggregate(
        zip_with(vec, dims, (x, d) =>
          when(xxhash64(lit(j), d).bitwiseAND(1) === 1, x.cast("double"))
            .otherwise(-x.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    (0 until bits)
      .map(j => when(signedDot(j) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }

  /** Uint8 scalar quantization of a float vector against its own [min, max]
    * range: `q = min(255, floor((x - vmin) * 255 / (vmax - vmin)))` — the
    * 4× storage compression step before ANN indexing at corpus scale.
    * Constant vectors (vmax == vmin) quantize to all zeros. Deterministic
    * across engines: the float subtractions stay in float32 (same IEEE op
    * everywhere), the scale-up promotes to double exactly, and floor/least
    * over doubles carry no rounding-mode ambiguity — unlike round(), whose
    * tie semantics differ between engines.
    */
  def quantizeU8(vec: Column, vmin: Column, vmax: Column): Column =
    when(vmax === vmin, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x =>
        least(lit(255), floor((x - vmin) * lit(255.0) / (vmax - vmin)).cast("int"))))

  // DuckDB oracle fragments mirroring dot/normSq/cosine: list_sum over a
  // double-cast comprehension is the same sequential fold (verified
  // bit-identical against Spark's aggregate()).
  def sqlDot(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a)+1)])"
  def sqlNorm(a: String): String = s"sqrt(${sqlDot(a, a)})"
  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)}))"

  /** DuckDB twin of [[quantizeU8]]; `vmin`/`vmax` must be FLOAT exprs so the
    * subtractions stay in float32 like Spark's. The 255.0 literals are cast
    * to DOUBLE explicitly — DuckDB parses bare `255.0` as DECIMAL, which
    * would change the promotion chain.
    */
  def sqlQuantizeU8(vec: String, vmin: String, vmax: String): String =
    s"""CASE WHEN $vmax = $vmin THEN list_transform($vec, x -> 0)
       |ELSE list_transform($vec, x -> least(255, CAST(floor(
       |  (x - $vmin) * CAST(255.0 AS DOUBLE) / ($vmax - $vmin)) AS INTEGER))) END""".stripMargin
}
