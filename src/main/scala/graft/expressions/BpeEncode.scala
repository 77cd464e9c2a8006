package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table ([[graft.operators.Bpe]]) to a string:
  * whitespace words are each rewritten bottom-up — repeatedly take the
  * LOWEST-RANK pair present in the word and merge all its occurrences
  * left-to-right — and the resulting subwords concatenate in document
  * order into one array<string>. The merge table is driver state inside
  * the kernel; encoding is a zero-shuffle projection.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val rankMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      // words never contain whitespace, so SP is an unambiguous pair glue
      m.putIfAbsent(a + " " + b, r)
    }
    m
  }

  private def encodeWord(word: String,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(word.substring(ci, ci + n))
      ci += n
    }
    var continue = syms.size > 1
    while (continue) {
      // lowest-rank pair present
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = rankMap.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val key = merges(bestRank)
        val next = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms.get(j) == key._1 && syms.get(j + 1) == key._2) {
            next.add(syms.get(j) + syms.get(j + 1))
            j += 2
          } else {
            next.add(syms.get(j))
            j += 1
          }
        }
        syms = next
        continue = syms.size > 1
      }
    }
    var k = 0
    while (k < syms.size) { out += UTF8String.fromString(syms.get(k)); k += 1 }
  }

  def evalEncode(str: UTF8String): GenericArrayData = {
    val bytes = str.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }
      if (isSpace) {
        if (start >= 0) {
          encodeWord(UTF8String.fromBytes(bytes, start, i - start).toString, out)
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    evalEncode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalEncode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
