package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the tokens the hashing kernels see — runs of non-space/\t/\n/\r
  * bytes, the tokenization of [[TextHashing]]/[[TokenWeightSum]] — in ONE
  * byte pass with no allocation. Replaces the interpreted
  * `size(filter(split(text, "[ \t\n\r]+"), t -> t != ""))` formulation
  * (three passes: regex split, per-element lambda, size) with identical
  * results, which matters because this count sits next to the scoring
  * kernel on every corpus scan (LM n_tokens, span-dedup denominators).
  * Null in → null out, 0 for empty/whitespace-only text.
  */
case class AlignedTokenCount(child: Expression)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = IntegerType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalCount(str: UTF8String): Int = {
    val bytes = str.getBytes
    var n = 0
    var inToken = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isSpace = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      if (isSpace) inToken = false
      else if (!inToken) { n += 1; inToken = true }
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    evalCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("alignedTokenCount", this,
      classOf[AlignedTokenCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalCount($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): AlignedTokenCount =
    copy(child = newChild)
}
