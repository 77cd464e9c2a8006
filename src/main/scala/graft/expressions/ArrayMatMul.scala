package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense affine matrix–vector product over an embedding column:
  * out[j] = (Σ_i x[i] · rows(j)(i)) / divisors(j) − offsets(j), the inner
  * sum folding in ascending `i` (bit-reproducible, oracle-replayable). The
  * offset carries mean-centering through linearly (V·(x−μ) = V·x − V·μ),
  * so centered projections stay one kernel over the raw vectors. The
  * matrix is broadcast-class driver state riding inside the kernel — one
  * fused pass per output dim instead of k higher-order-function folds (the
  * HOF formulation re-walks Catalyst per element; the fused kernel is the
  * same 10× win [[TokenWeightSum]] bought for token scoring).
  *
  * Backs both linear embedding maps of the toolkit: Rademacher random
  * projection (rows = ±1, divisor = √k) and PCA projection/whitening
  * (rows = eigenvectors, divisor = 1 or √λ).
  */
case class ArrayMatMul(child: Expression, rows: Seq[Seq[Double]],
    divisors: Seq[Double], offsets: Seq[Double])
    extends UnaryExpression with TypedInputs {

  require(rows.length == divisors.length && rows.length == offsets.length,
    s"rows (${rows.length}), divisors (${divisors.length}) and " +
      s"offsets (${offsets.length}) must align")
  require(rows.nonEmpty, "at least one output dimension required")
  require(rows.forall(_.length == rows.head.length),
    "all matrix rows must share the input dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType))

  @transient private lazy val mat: Array[Array[Double]] =
    rows.map(_.toArray).toArray
  @transient private lazy val divs: Array[Double] = divisors.toArray
  @transient private lazy val offs: Array[Double] = offsets.toArray

  def evalProduct(arr: ArrayData): ArrayData = {
    val d = math.min(arr.numElements(), mat(0).length)
    val out = new Array[Any](mat.length)
    var j = 0
    while (j < mat.length) {
      val row = mat(j)
      var sum = 0.0
      var i = 0
      while (i < d) {
        sum += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      out(j) = sum / divs(j) - offs(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalProduct(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayMatMul", this, classOf[ArrayMatMul].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalProduct($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayMatMul =
    copy(child = newChild)
}
