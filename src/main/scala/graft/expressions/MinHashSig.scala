package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature of a text column in ONE pass per document: FNV
  * token hashes → rolling n-gram shingle hashes → k universal-family minima
  * (h_i = a_i·h + b_i, 64-bit wraparound, splitmix64 constants — the same
  * family as graft.operators.TextDedup, so signatures are identical to the
  * explode-and-aggregate formulation).
  *
  * Architecturally this turns signature building from
  * explode(shingles) → groupBy(doc) with k min-aggregates — a shuffle of
  * corpus × shingles rows — into a pure projection: zero shuffle, nothing
  * materialized but the k-long signature per document. At corpus scale the
  * shuffle was the dominant cost of MinHash+LSH dedup.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  // short docs (< n tokens) yield null even from a non-nullable child; the
  // override keeps downstream `.isNotNull` filters from being optimized away
  override def nullable: Boolean = true

  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(i => MinHashSig.splitmix64(2L * i) | 1L)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(i => MinHashSig.splitmix64(2L * i + 1))

  /** Null signalled as Java null so codegen needs no extra flag channel. */
  def evalSig(input: UTF8String): ArrayData = {
    val tokenHashes = TextHashing.fnvTokenHashes(input.getBytes)
    // no shingles → null (the explode formulation dropped such docs; a
    // constant sentinel signature would spuriously collide in every band)
    if (tokenHashes.length < n) return null

    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[Long]
    var s = 0
    while (s <= tokenHashes.length - n) {
      val acc = TextHashing.shingleHash(tokenHashes, s, n)
      if (seen.add(acc)) { // distinct shingles, as array_distinct did
        var m = 0
        while (m < k) {
          val v = as(m) * acc + bs(m)
          if (v < mins(m)) mins(m) = v
          m += 1
        }
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    evalSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.evalSig($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
