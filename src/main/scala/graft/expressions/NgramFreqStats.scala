package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Per-document word n-gram frequency statistics in ONE pass over the token
  * array: `struct(total, n_distinct, max_count, dup_count)` where `total` =
  * number of n-grams, `n_distinct` = distinct n-grams, `max_count` = highest
  * single n-gram frequency, `dup_count` = n-gram occurrences belonging to an
  * n-gram seen more than once. These are the Gopher-style repetition
  * signals (top-n-gram fraction, duplicate-n-gram fraction) used to filter
  * boilerplate/spam out of pretraining corpora.
  *
  * Scale design: the statistics are row-local, so the scalable formulation
  * is a projection, NOT explode→groupBy(doc, gram) — the explode form
  * shuffles corpus × n-grams (at 100 TB, a multi-PB shuffle) to compute
  * numbers each row already fully determines. This expression keeps the
  * whole computation inside the scan projection with a small per-row hash
  * map; the only data movement is the 4-long struct per document.
  *
  * Null handling: null array → null; null token → null (mirrors
  * [[TokenSetHits]]). Fewer than `n` tokens → all-zero struct (a document
  * too short to have n-grams has no repetition, not unknown repetition).
  */
case class NgramFreqStats(child: Expression, n: Int)
  extends UnaryExpression with TypedInputs {

  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false),
    StructField("dup_count", LongType, nullable = false)))

  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = true

  private val zeros: InternalRow =
    new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))

  /** Null result signalled as a Java null so codegen needs no extra flag. */
  def evalStats(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    // null scan FIRST: a corrupt (null-token) array must report null at
    // every n, not "no repetition" when it also happens to be shorter than n
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val total = m - n + 1
    if (total <= 0) return zeros
    val counts = new java.util.HashMap[String, Array[Long]](total * 2)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      val k = sb.toString
      val c = counts.get(k)
      if (c == null) counts.put(k, Array(1L)) else c(0) += 1L
      i += 1
    }
    var maxCount = 0L
    var dupCount = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxCount) maxCount = c
      if (c > 1L) dupCount += c
    }
    new GenericInternalRow(
      Array[Any](total.toLong, counts.size().toLong, maxCount, dupCount))
  }

  override def nullSafeEval(v: Any): Any = evalStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one reference object; the counting loop runs as compiled Scala inside
    // the whole-stage-codegen'd projection
    val ref = ctx.addReferenceObj("ngramFreqStats", this, classOf[NgramFreqStats].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("ngramStats")
      s"""
         |InternalRow $r = $ref.evalStats($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramFreqStats =
    copy(child = newChild)
}
