package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column in one pass: FNV-1a hash per whitespace
  * token, ±1 vote per bit, sign of the per-bit sum.
  *
  * Replaces the explode-tokens → 64-conditional-sums groupBy formulation:
  * same signature structure with zero shuffle and no token-row explosion —
  * per document the whole computation is this single loop.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = LongType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalSimHash(input: UTF8String): Long = {
    val tokenHashes = TextHashing.fnvTokenHashes(input.getBytes)
    val votes = new Array[Int](64)
    tokenHashes.foreach { tok =>
      var b = 0
      while (b < 64) {
        if (((tok >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    evalSimHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalSimHash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
