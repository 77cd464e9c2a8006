package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `a·x + b` with 64-bit wraparound (Java long semantics) — the universal
  * hash family step used by MinHash. A plain Column multiply can't express
  * this: Spark 4's ANSI mode turns the intended wraparound into an overflow
  * error. Codegen'd to the two-instruction form.
  */
case class WrapMulAdd(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any = a * x.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"${a}L * $x + ${b}L")

  override protected def withNewChildInternal(newChild: Expression): WrapMulAdd =
    copy(child = newChild)
}
