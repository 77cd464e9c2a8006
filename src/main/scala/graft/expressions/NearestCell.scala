package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid cell id for an `array<float>` embedding, by cosine
  * similarity against a driver-held centroid matrix (k × dim floats).
  *
  * This is the zero-shuffle form of IVF/k-means assignment: because the
  * centroid set is tiny driver state, the argmax is a pure projection — no
  * crossJoin, no groupBy, no join-back. The previous formulation (broadcast
  * crossJoin + groupBy(vec_id) + self-join) shuffled the entire corpus twice
  * per assignment, which a Lloyd training loop multiplied per iteration — at
  * 100 TB that is a full-corpus exchange per iteration; this is none.
  *
  * Scoring: argmax_j dot(v, c_j) / |c_j| — the query norm |v| is a positive
  * constant across j, so dividing by it cannot change the argmax and is
  * skipped. A zero-norm centroid scores 0. Ties break to the lowest cell id
  * (callers pass cells sorted ascending; the strict `>` keeps the first).
  *
  * Null handling: null array → null; null element → null; dimension mismatch
  * with the centroid matrix → null (mirrors [[FloatVecDot]]).
  */
case class NearestCell(
    child: Expression,
    cells: Array[Int],
    centroids: Array[Array[Float]])
  extends UnaryExpression with TypedInputs {

  require(cells.length == centroids.length,
    s"cells (${cells.length}) and centroids (${centroids.length}) must align")

  override def dataType: DataType = IntegerType
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  // the expression itself introduces nulls (empty matrix / dim mismatch /
  // null element), so nullability must not be inherited from the child —
  // see the FloatVecDot nullable defect this guards against
  override def nullable: Boolean = true

  private val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length

  // 1/|c_j| precomputed once on the driver; 0.0 for a zero centroid
  private lazy val invNorms: Array[Double] = centroids.map { c =>
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
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
      val score = acc * invNorms(j)
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
    // the centroid matrix rides along as a reference object; the argmax loop
    // runs in compiled Scala, inside the whole-stage-codegen'd projection
    val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("cellResult")
      s"""
         |java.lang.Integer $r = $ref.evalCell($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  // Array params get reference equals/hashCode from the case class, which
  // defeats canonicalization and common-subexpression elimination (two
  // semantically identical NearestCell nodes would never compare equal).
  // Compare contents instead; child participates so canonicalized children
  // still differentiate.
  override def equals(other: Any): Boolean = other match {
    case that: NearestCell =>
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

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}
