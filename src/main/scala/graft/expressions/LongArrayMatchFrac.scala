package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fraction of positions where two `array<bigint>` columns agree — the
  * MinHash Jaccard estimator. Replaces the interpreted
  * `size(filter(zip_with(a,b,_===_), identity))/size(a)` formulation with a
  * codegen'd primitive loop (the estimator runs once per candidate pair, the
  * hottest loop of LSH verification).
  */
case class LongArrayMatchFrac(left: Expression, right: Expression)
    extends BinaryExpression with TypedInputs {

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val fa = a.asInstanceOf[ArrayData]
    val fb = b.asInstanceOf[ArrayData]
    val n = math.min(fa.numElements(), fb.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (fa.getLong(i) == fb.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $n == 0 ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayMatchFrac =
    copy(left = newLeft, right = newRight)
}
