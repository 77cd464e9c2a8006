package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the word n-gram shingles of a text column, in
  * one pass over the string — no token array, no shingle strings, no
  * explode-then-rehash.
  *
  * The Column-function formulation (split → transform/slice → concat_ws →
  * xxhash64) materializes every shingle as a string and runs interpreted
  * higher-order lambdas; for sketch building only the shingle *hashes*
  * matter, so this expression tokenizes on whitespace, hashes each token
  * (FNV-1a over its UTF-8 bytes), and combines n consecutive token hashes
  * with a mixing function. Codegen calls the compiled hashing loop through
  * a reference object, keeping the surrounding projection one fused
  * whole-stage span (no interpreted-eval fallback row).
  */
case class ShingleHashes(child: Expression, n: Int,
    /** true → distinct hashes in first-seen order (set semantics, for
      * dedup joins); false → one hash per shingle POSITION in document
      * order (for positional algorithms like winnowing).
      */
    distinct: Boolean = true)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalHashes(input: UTF8String): ArrayData = {
    val tokenHashes = TextHashing.fnvTokenHashes(input.getBytes)
    if (tokenHashes.length < n) return new GenericArrayData(Array.empty[Long])
    if (distinct) {
      val out = new mutable.LinkedHashSet[Long]
      var s = 0
      while (s <= tokenHashes.length - n) {
        out += TextHashing.shingleHash(tokenHashes, s, n)
        s += 1
      }
      new GenericArrayData(out.toArray)
    } else {
      val out = new Array[Long](tokenHashes.length - n + 1)
      var s = 0
      while (s <= tokenHashes.length - n) {
        out(s) = TextHashing.shingleHash(tokenHashes, s, n)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    evalHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference-object call: the hashing loop runs as compiled Scala inside
    // the whole-stage-codegen'd projection, no interpreted-eval fallback row
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalHashes($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
