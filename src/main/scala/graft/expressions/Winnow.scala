package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * the distinct minima of every sliding window of `w` consecutive positional
  * hashes, in first-occurrence order. Fewer than `w` hashes → empty sketch.
  *
  * Why a custom expression instead of
  * `array_distinct(transform(sequence(...), j => array_min(slice(ph, j, w))))`:
  * that Column form re-evaluates the `ph` subtree for EVERY window position —
  * higher-order functions are interpreted, there is no let-binding in the
  * expression language, and when `ph` is itself an expensive projection
  * (md5-derived shingle hashes) the document cost becomes O(len²·hash)
  * instead of O(len). A bench run measured a single such task at ~400 s of
  * CPU over 5k documents. Here the child is evaluated exactly once and the
  * window minima come from the standard monotonic-deque sliding-minimum in
  * O(len) total, inside whole-stage codegen.
  *
  * Null handling: null array → null; null element → null (positional hashes
  * are never legitimately null).
  */
case class Winnow(child: Expression, w: Int)
  extends UnaryExpression with TypedInputs {

  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def nullable: Boolean = true

  private val empty: ArrayData = new GenericArrayData(Array.emptyLongArray)

  /** Null result signalled as Java null so codegen needs no extra flag. */
  def evalWinnow(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    // null scan FIRST: a corrupt (null-element) array must report null
    // whether or not it is also shorter than the window (same ordering fix
    // as NgramFreqStats — short+corrupt must not read as "empty sketch")
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    if (m < w) return empty
    val vals = new Array[Long](m)
    i = 0
    while (i < m) {
      vals(i) = arr.getLong(i)
      i += 1
    }
    // monotonic deque of indices; values increase front→back, front is the
    // current window's minimum
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && vals(deque(tail - 1)) >= vals(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(vals(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = evalWinnow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[Winnow].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("winnowed")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.evalWinnow($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
