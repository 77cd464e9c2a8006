package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
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
  *
  * The lexicon rides as a BROADCAST of the prebuilt hash map, not as
  * expression fields (r10 optimization, guide §5 "large task closures"):
  * embedded term/weight Seqs were serialized into the task binary and
  * re-deserialized + rebuilt into a map BY EVERY TASK — measured 36 ms/task
  * at a vocabulary of ~50k terms, over a megabyte of closure per stage, and
  * at cluster scale the same bytes re-ship per task. The broadcast value is
  * materialized once per executor (in local mode: zero-copy), so tasks carry
  * only a handle. `slot` selects a column of the per-term weight array so
  * several kernels (one per classifier label) can share ONE table.
  */
case class TokenWeightSum(child: Expression,
    table: Broadcast[java.util.HashMap[UTF8String, Array[Double]]],
    slot: Int, defaultWeight: Double)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val weightMap: java.util.HashMap[UTF8String, Array[Double]] =
    table.value

  def evalSum(str: UTF8String): Double = {
    val bytes = str.getBytes
    val m = weightMap
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
          val w = m.get(UTF8String.fromBytes(bytes, start, i - start))
          sum += (if (w == null) defaultWeight else w(slot))
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

object TokenWeightSum {

  /** Build and broadcast the lexicon table once per model: term → one
    * weight per slot (slot = classifier label, or the single slot 0 for an
    * LM). All kernels built over the returned handle share one
    * executor-side map.
    */
  def broadcastTable(spark: SparkSession, terms: Seq[String],
      weightsPerSlot: Seq[Seq[Double]]): Broadcast[java.util.HashMap[UTF8String, Array[Double]]] = {
    weightsPerSlot.foreach(w => require(w.length == terms.length,
      s"terms (${terms.length}) and weights (${w.length}) must align"))
    val nSlots = weightsPerSlot.length
    val m = new java.util.HashMap[UTF8String, Array[Double]](terms.length * 2)
    var t = 0
    while (t < terms.length) {
      val arr = new Array[Double](nSlots)
      var s = 0
      while (s < nSlots) { arr(s) = weightsPerSlot(s)(t); s += 1 }
      m.put(UTF8String.fromString(terms(t)), arr)
      t += 1
    }
    spark.sparkContext.broadcast(m)
  }
}
