package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sum of `weights(i)` over an array of bucket indices, in ARRAY ORDER —
  * the scoring kernel of hashed-feature models ([[graft.operators.Dsir]]:
  * weights = per-bucket log importance ratios) where the weight table is
  * small driver state (one double per bucket) and the lookup must ride a
  * corpus scan with zero shuffle. The [[TokenWeightSum]] sibling keys by
  * token STRING; this one keys by precomputed bucket index, so the same
  * kernel serves any featurizer that reduces to `array<long>` indices.
  *
  * Summation folds left-to-right over the array (float addition is
  * non-associative; the DuckDB oracle folds each document's weights
  * positionally via `list_sum(list(w ORDER BY pos))`, and a join-then-SUM
  * would add in partition-arrival order and drift in the last ulp).
  *
  * Out-of-range indices are a caller bug (buckets are built `% weights
  * .length`) and throw rather than silently skewing scores; null elements
  * cannot be produced by the bucket arithmetic and contribute nothing.
  */
case class ArrayWeightSum(child: Expression, weights: Seq[Double])
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = true))

  @transient private lazy val w: Array[Double] = weights.toArray

  def evalSum(arr: ArrayData): Double = {
    val n = arr.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val idx = arr.getLong(i)
        if (idx < 0 || idx >= w.length)
          throw new IllegalArgumentException(
            s"bucket index $idx outside weight table of ${w.length}")
        sum += w(idx.toInt)
      }
      i += 1
    }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    evalSum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayWeightSum", this, classOf[ArrayWeightSum].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalSum($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayWeightSum =
    copy(child = newChild)
}
