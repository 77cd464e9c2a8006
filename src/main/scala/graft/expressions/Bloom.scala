package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared Bloom-filter arithmetic for the build aggregate and the probe
  * expression — both sides MUST derive identical bit positions from a 64-bit
  * element hash, so the mapping lives in one place. Double hashing (Kirsch &
  * Mitzenmacher): position_i = h1 + i*h2 over a power-of-two bit count, so
  * the modulo is a mask and each probe is a handful of ALU ops.
  */
object BloomUtil {

  /** Round up to a power of two (min 64) so index masking replaces modulo. */
  def bitsFor(expectedItems: Long, bitsPerItem: Int): Int = {
    val want = math.max(64L, expectedItems * bitsPerItem)
    var m = 64L
    while (m < want && m < (1L << 30)) m <<= 1
    m.toInt
  }

  /** Second hash from the element hash — a 64-bit finalizer (splitmix64),
    * forced odd so all k probe positions stay distinct over a pow-2 table.
    */
  def h2(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  def set(bits: Array[Long], h: Long, k: Int): Unit = {
    val mask = (bits.length.toLong << 6) - 1
    val step = h2(h)
    var g = h
    var i = 0
    while (i < k) {
      val pos = g & mask
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      g += step
      i += 1
    }
  }

  def contains(bits: Array[Long], h: Long, k: Int): Boolean = {
    val mask = (bits.length.toLong << 6) - 1
    val step = h2(h)
    var g = h
    var i = 0
    while (i < k) {
      val pos = g & mask
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      g += step
      i += 1
    }
    true
  }
}

/** Distributed Bloom-filter build over `array<long>` element hashes (e.g.
  * ShingleHashes output): each input row's hashes are inserted without any
  * explode, partial buffers are OR-merged — the mergeable-sketch shape that
  * makes the build one map-side pass plus a tiny reduce at any corpus size.
  * `numBits` must be a power of two (see [[BloomUtil.bitsFor]]). Result is
  * the bit table as `array<long>` — driver-collectable state for a
  * subsequent broadcast probe ([[BloomAnyContain]]), mirroring how runtime
  * filters and IVF centroids travel.
  */
case class BloomAgg(child: Expression, numBits: Int, numHashFns: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
    with TypedInputs {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashFns >= 1 && numHashFns <= 16,
    s"numHashFns must be in [1,16], got $numHashFns")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val hashes = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = hashes.numElements()
      while (i < n) {
        BloomUtil.set(buffer, hashes.getLong(i), numHashFns)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** True iff ANY element hash in the input `array<long>` might be in the
  * Bloom filter — the prefilter probe of Bloom-based decontamination. The
  * bit table rides along as a reference object (like a broadcast build
  * side), the probe loop is compiled Scala called from within the
  * whole-stage-codegen'd filter, and a document short-circuits on its first
  * hit. No false negatives: a `false` here is PROOF the document shares no
  * element with the build side.
  */
case class BloomAnyContain(child: Expression, bits: Array[Long], numHashFns: Int)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = BooleanType
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))

  def evalAny(arr: ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (BloomUtil.contains(bits, arr.getLong(i), numHashFns)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any =
    evalAny(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAnyContain", this, classOf[BloomAnyContain].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalAny($a);")
  }

  // the bit table is payload, not identity-defining for equality of plans
  override protected def withNewChildInternal(newChild: Expression): BloomAnyContain =
    copy(child = newChild)
}
