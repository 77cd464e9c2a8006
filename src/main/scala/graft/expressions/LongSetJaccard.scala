package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Set Jaccard of two `array<long>` hash sets (inputs assumed distinct, as
  * ShingleHashes emits): |a ∩ b| / |a ∪ b| via one hash-set build over the
  * smaller side and a probe over the larger — the verification kernel for
  * candidate pairs from any blocking scheme. Both-empty pairs score 0.0
  * (documents too short to shingle never count as near-duplicates).
  * Complements [[LongArrayMatchFrac]], which compares POSITIONS (MinHash
  * signatures), not sets.
  */
case class LongSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression with TypedInputs {

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = false))

  def evalJaccard(a: ArrayData, b: ArrayData): Double = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nl = large.numElements()
    if (ns == 0 && nl == 0) return 0.0
    if (ns == 0) return 0.0
    val set = new java.util.HashSet[java.lang.Long](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nl) {
      if (set.contains(large.getLong(i))) inter += 1
      i += 1
    }
    inter.toDouble / (ns + nl - inter)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longSetJaccard", this, classOf[LongSetJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalJaccard($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSetJaccard =
    copy(left = newLeft, right = newRight)
}
