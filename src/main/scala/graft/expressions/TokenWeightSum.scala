package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of per-token weights over the whitespace tokens of a string, in
  * DOCUMENT ORDER — the kernel of unigram language-model scoring (weights =
  * token log-probabilities) and any other lexicon-weighted signal. One pass
  * over the string with a hash-map probe per token; tokens absent from the
  * lexicon contribute `defaultWeight` (the OOV penalty).
  *
  * Summation order matters: float addition is non-associative, and the
  * DuckDB oracle folds each document's weights positionally (list built
  * ORDER BY token position), so this kernel adds in the same left-to-right
  * order — a join-then-SUM formulation would sum in partition-arrival
  * order and drift in the last ulp.
  */
case class TokenWeightSum(child: Expression, terms: Seq[String],
    weights: Seq[Double], defaultWeight: Double)
    extends UnaryExpression with TypedInputs {

  require(terms.length == weights.length,
    s"terms (${terms.length}) and weights (${weights.length}) must align")

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val weightMap: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](terms.length * 2)
    terms.iterator.zip(weights.iterator).foreach { case (t, w) =>
      m.put(UTF8String.fromString(t), w)
    }
    m
  }

  def evalSum(str: UTF8String): Double = {
    val bytes = str.getBytes
    var sum = 0.0
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }
      if (isSpace) {
        if (start >= 0) {
          val w = weightMap.get(UTF8String.fromBytes(bytes, start, i - start))
          sum += (if (w == null) defaultWeight else w.doubleValue())
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    evalSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenWeightSum", this, classOf[TokenWeightSum].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalSum($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)
}
