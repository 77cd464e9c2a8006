package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
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
  * with a mixing function. CodegenFallback: the eval is already a tight
  * single loop per row, and the expression sits under an explode where
  * per-row dispatch dominates either way.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // FNV-1a per whitespace-delimited token
    val tokenHashes = mutable.ArrayBuffer.empty[Long]
    var h = 0xCBF29CE484222325L
    var inToken = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isSpace = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      if (isSpace) {
        if (inToken) { tokenHashes += h; h = 0xCBF29CE484222325L; inToken = false }
      } else {
        h = (h ^ (b & 0xFFL)) * 0x100000001B3L
        inToken = true
      }
      i += 1
    }
    if (inToken) tokenHashes += h
    if (tokenHashes.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new mutable.LinkedHashSet[Long]
    var s = 0
    while (s <= tokenHashes.length - n) {
      var acc = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < n) {
        acc = java.lang.Long.rotateLeft(acc ^ tokenHashes(s + j), 27) * 0x94D049BB133111EBL
        j += 1
      }
      out += acc
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
