package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid cell id by EUCLIDEAN distance — the metric of product-
  * quantization subquantizers (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI'11), where [[NearestCell]]'s cosine
  * argmax would discard subvector magnitudes and mis-train the codebook.
  *
  * Same zero-shuffle shape as [[NearestCell]]: the centroid matrix is tiny
  * driver state riding inside a codegen'd projection — no join, no groupBy,
  * no exchange, which is what lets a Lloyd loop or a PQ encode pass run
  * map-only over 100 TB.
  *
  * Scoring algebra: argmin_j |v - c_j|² = argmax_j (dot(v, c_j) - |c_j|²/2)
  * because |v|² is constant across j — so the inner loop is the same dot
  * product as the cosine variant plus one precomputed additive bias, no
  * per-row subtraction vector. Ties break to the lowest cell id (callers
  * pass cells sorted ascending; strict `>` keeps the first).
  *
  * Null handling mirrors [[NearestCell]]: null array → null; null element →
  * null; dimension mismatch with the centroid matrix → null.
  */
case class NearestCellL2(
    child: Expression,
    cells: Array[Int],
    centroids: Array[Array[Float]])
  extends UnaryExpression with TypedInputs {

  require(cells.length == centroids.length,
    s"cells (${cells.length}) and centroids (${centroids.length}) must align")

  override def dataType: DataType = IntegerType
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  // the expression introduces nulls itself (empty matrix / dim mismatch /
  // null element) — nullability must not be inherited from the child
  override def nullable: Boolean = true

  private val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length

  // -|c_j|²/2 precomputed once on the driver
  private lazy val biases: Array[Double] = centroids.map { c =>
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    -0.5 * s
  }

  /** Boxed so codegen can signal null without an extra flag channel. */
  def evalCell(arr: ArrayData): java.lang.Integer = {
    if (centroids.isEmpty || arr.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      vec(i) = arr.getFloat(i).toDouble
      i += 1
    }
    var best = Double.NegativeInfinity
    var bestCell = 0
    var found = false
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += vec(i) * c(i); i += 1 }
      val score = acc + biases(j)
      if (!found || score > best) { best = score; bestCell = cells(j); found = true }
      j += 1
    }
    if (found) Integer.valueOf(bestCell) else null
  }

  override def nullSafeEval(v: Any): Any = {
    val r = evalCell(v.asInstanceOf[ArrayData])
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellL2", this, classOf[NearestCellL2].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("cellResult")
      s"""
         |java.lang.Integer $r = $ref.evalCell($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  // Content-based equality: array params otherwise get reference equals,
  // defeating canonicalization and CSE (see NearestCell)
  override def equals(other: Any): Boolean = other match {
    case that: NearestCellL2 =>
      child == that.child &&
        java.util.Arrays.equals(cells, that.cells) &&
        centroids.length == that.centroids.length &&
        centroids.indices.forall(i =>
          java.util.Arrays.equals(centroids(i), that.centroids(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + java.util.Arrays.hashCode(cells)
    centroids.foreach(c => h = 31 * h + java.util.Arrays.hashCode(c))
    h
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellL2 =
    copy(child = newChild)
}
