package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace tokens contained in a fixed word set — the kernel of
  * stopword ratios and stopword-profile language ID. One pass over the
  * string with a hash-set probe per token; replaces the interpreted
  * `size(filter(split(...), t -> array_contains(...)))` formulation with
  * identical results on whitespace-tokenizable text.
  */
case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = IntegerType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def evalHits(str: UTF8String): Int = {
    val bytes = str.getBytes
    var hits = 0
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }
      if (isSpace) {
        if (start >= 0) {
          if (wordSet.contains(UTF8String.fromBytes(bytes, start, i - start)))
            hits += 1
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    hits
  }

  override def nullSafeEval(input: Any): Any =
    evalHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetHits", this, classOf[TokenSetHits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalHits($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}
