package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns.
  *
  * Spark's higher-order `aggregate`/`zip_with` formulation is semantically
  * identical but interpreted (higher-order functions don't participate in
  * whole-stage codegen and pay per-element lambda dispatch); this expression
  * generates a tight primitive loop. Semantics are the same sequential
  * left-to-right double fold, so results stay bit-identical to the
  * higher-order version and to the DuckDB oracle's list_sum.
  *
  * Null handling: a null array yields null; a null *element* yields null
  * (mirroring zip_with's null-propagating multiply).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with TypedInputs {

  override def dataType: DataType = DoubleType

  // declared input contract → wrong argument types fail analysis with a
  // clear error instead of an executor-side ClassCastException
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  // the expression itself introduces nulls (length mismatch, null element)
  // regardless of child nullability; without this override NullPropagation
  // could fold IsNull(dot) on non-nullable inputs, and doGenCode's
  // `isNull = true` would target a FalseLiteral (uncompilable Java)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val fa = a.asInstanceOf[ArrayData]
    val fb = b.asInstanceOf[ArrayData]
    // length mismatch → null, matching the zip_with formulation (which pads
    // with nulls and null-propagates) — a silent prefix dot would be wrong
    if (fa.numElements() != fb.numElements()) return null
    val n = fa.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (fa.isNullAt(i) || fb.isNullAt(i)) return null
      acc += fa.getFloat(i).toDouble * fb.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
