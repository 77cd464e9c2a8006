package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of interpolated-bigram log-probabilities over the whitespace tokens
  * of a string, in DOCUMENT ORDER — the kernel of bigram language-model
  * scoring ([[graft.operators.BigramLm]]). Per token the probe ladder is:
  *
  *  - first token: unigram log-prob (`firstWeights`), else `oovFirst`;
  *  - later token: seen-pair interpolated log-prob (`pairWeights`, keyed
  *    `prev SP tok` — unambiguous, tokens never contain whitespace), else
  *    the unigram-backoff log-prob
  *    (`backoffWeights`), else `oovBackoff`.
  *
  * All log-probs are precomputed driver-side (Math.log — bitwise equal to
  * DuckDB `ln`); the kernel only probes and adds, left-to-right, so the
  * fold is bit-reproducible like [[TokenWeightSum]]'s. One pass over the
  * bytes; the pair key is built from the two token slices without
  * re-tokenizing.
  */
case class TokenBigramScore(child: Expression,
    pairKeys: Seq[String], pairWeights: Seq[Double],
    terms: Seq[String], firstWeights: Seq[Double], backoffWeights: Seq[Double],
    oovFirst: Double, oovBackoff: Double)
    extends UnaryExpression with TypedInputs {

  require(pairKeys.length == pairWeights.length,
    s"pairKeys (${pairKeys.length}) and pairWeights (${pairWeights.length}) must align")
  require(terms.length == firstWeights.length && terms.length == backoffWeights.length,
    s"terms (${terms.length}), firstWeights (${firstWeights.length}) and " +
      s"backoffWeights (${backoffWeights.length}) must align")

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val pairMap: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pairKeys.length * 2)
    pairKeys.iterator.zip(pairWeights.iterator).foreach { case (k, w) =>
      m.put(UTF8String.fromString(k), w)
    }
    m
  }

  // one map, two weights per term: probe once per token for both branches
  @transient private lazy val termMap: java.util.HashMap[UTF8String, Array[Double]] = {
    val m = new java.util.HashMap[UTF8String, Array[Double]](terms.length * 2)
    terms.indices.foreach { i =>
      m.put(UTF8String.fromString(terms(i)),
        Array(firstWeights(i), backoffWeights(i)))
    }
    m
  }

  private val sep = UTF8String.fromString(" ")

  def evalSum(str: UTF8String): Double = {
    val bytes = str.getBytes
    var sum = 0.0
    var prev: UTF8String = null
    var start = -1
    var i = 0
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }
      if (isSpace) {
        if (start >= 0) {
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          if (prev == null) {
            val w = termMap.get(tok)
            sum += (if (w == null) oovFirst else w(0))
          } else {
            val pw = pairMap.get(UTF8String.concat(prev, sep, tok))
            if (pw != null) sum += pw.doubleValue()
            else {
              val w = termMap.get(tok)
              sum += (if (w == null) oovBackoff else w(1))
            }
          }
          prev = tok
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
    val ref = ctx.addReferenceObj("tokenBigramScore", this, classOf[TokenBigramScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalSum($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenBigramScore =
    copy(child = newChild)
}
