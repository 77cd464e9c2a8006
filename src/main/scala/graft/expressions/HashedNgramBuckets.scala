package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-bucketed word {1..maxN}-gram features of a text column, in ONE pass —
  * the featurization kernel of [[graft.operators.Dsir]]. Bucket of feature
  * `f` is the first 32 bits of `md5(f)` mod `numBuckets` (the widened
  * Sampling.hashBucket draw), bitwise-identical to the Column formulation
  * `transform(ngramFeatures(text), featureBucket)` it replaces — that form
  * runs interpreted higher-order lambdas and materializes every n-gram as a
  * string before re-hashing it (measured ~10× the cost on corpus scans).
  * Here the digest consumes exactly the bytes the string build would have
  * produced (token bytes joined by single spaces), so no feature string
  * ever exists.
  *
  * Tokenizer is the kernel rule (runs of space/\t/\n/\r, empty artifacts
  * dropped — [[TextHashing]]'s delimiters). Feature order: all unigrams in
  * token order, then bigrams, up to maxN — the order the scoring fold and
  * the DuckDB oracle's positional replay both follow. md5 rather than the
  * FNV family of [[ShingleHashes]] deliberately: these buckets are
  * replayable from SQL in any engine with an md5 builtin, which is what
  * makes the DSIR scores auditable off-cluster.
  */
case class HashedNgramBuckets(child: Expression, maxN: Int, numBuckets: Int)
    extends UnaryExpression with TypedInputs {

  require(maxN >= 1, s"maxN must be >= 1, got $maxN")
  require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalBuckets(str: UTF8String): ArrayData = {
    val bytes = str.getBytes
    // token [start, end) offsets under the kernel tokenizer
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    var tokStart = -1
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r'
      }
      if (isSpace) {
        if (tokStart >= 0) {
          if (nTok == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nTok * 2)
            ends = java.util.Arrays.copyOf(ends, nTok * 2)
          }
          starts(nTok) = tokStart
          ends(nTok) = i
          nTok += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    var total = 0
    var k = 1
    while (k <= maxN) { total += math.max(nTok - k + 1, 0); k += 1 }
    val out = new Array[Long](total)
    val md = HashedNgramBuckets.md5.get()
    var idx = 0
    k = 1
    while (k <= maxN) {
      var s = 0
      while (s + k <= nTok) {
        md.reset()
        var j = s
        while (j < s + k) {
          if (j > s) md.update(' '.toByte)
          md.update(bytes, starts(j), ends(j) - starts(j))
          j += 1
        }
        val d = md.digest()
        val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        out(idx) = v % numBuckets
        idx += 1
        s += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalBuckets(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedNgramBuckets", this,
      classOf[HashedNgramBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalBuckets($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)
}

object HashedNgramBuckets {
  /** MessageDigest is stateful and not thread-safe; tasks share expression
    * instances within one JVM in local mode, so the digest is per-thread.
    */
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
