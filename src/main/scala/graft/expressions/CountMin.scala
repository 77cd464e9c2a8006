package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch arithmetic shared by the build aggregate and the probe
  * expression. `depth` independent rows; each element hash lands in one
  * column per row via double hashing (same family as [[BloomUtil]]), width a
  * power of two so the modulo is a mask. Estimates NEVER underestimate —
  * the property heavy-hitter candidate generation relies on.
  */
object CountMinUtil {

  def add(counts: Array[Long], width: Int, depth: Int, h: Long): Unit = {
    val mask = (width - 1).toLong
    val step = BloomUtil.h2(h)
    var g = h
    var d = 0
    while (d < depth) {
      counts(d * width + (g & mask).toInt) += 1L
      g += step
      d += 1
    }
  }

  def estimate(counts: Array[Long], width: Int, depth: Int, h: Long): Long = {
    val mask = (width - 1).toLong
    val step = BloomUtil.h2(h)
    var g = h
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + (g & mask).toInt)
      if (c < min) min = c
      g += step
      d += 1
    }
    min
  }

  /** The 64-bit key of a single token string — BY CONSTRUCTION identical to
    * the per-token element hash `ShingleHashes(text, n = 1)` emits (FNV-1a
    * over the token bytes run through the 1-gram shingle mixer), so a sketch
    * built from whole-document token streams can be probed per term.
    */
  def tokenKey(term: UTF8String): Long = {
    val bytes = term.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    val buf = scala.collection.mutable.ArrayBuffer(h)
    TextHashing.shingleHash(buf, 0, 1)
  }
}

/** Distributed count-min sketch build over `array<long>` element hashes
  * (e.g. the per-occurrence token hashes of `ShingleHashes(text, 1, distinct
  * = false)`): fixed `depth × width` memory per partition regardless of key
  * cardinality, partial sketches merged by element-wise addition — the
  * frequency-sketch shape for heavy-tail key spaces (shingles, URLs) where
  * a groupBy's map-side hash table would blow memory.
  */
case class CountMinAgg(child: Expression, width: Int, depth: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
    with TypedInputs {

  require(width >= 64 && (width & (width - 1)) == 0,
    s"width must be a power of two >= 64, got $width")
  require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
  // width*depth is used as an Int array size and in d*width indexing —
  // guard the product, not just the factors (1<<28 × 8 overflows Int)
  require(width.toLong * depth <= (1L << 28),
    s"width*depth must be <= 2^28 longs (2 GiB buffer), got ${width.toLong * depth}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val hashes = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = hashes.numElements()
      while (i < n) {
        CountMinUtil.add(buffer, width, depth, hashes.getLong(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Estimated occurrence count of a term string against a collected count-min
  * sketch (riding along as a reference object, like a broadcast build side).
  * Never underestimates, so `estimate >= threshold` is a sound prefilter for
  * exact heavy-hitter verification.
  */
case class CmsEstimateTerm(child: Expression, sketch: Array[Long],
    width: Int, depth: Int)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = LongType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalEstimate(term: UTF8String): Long =
    CountMinUtil.estimate(sketch, width, depth, CountMinUtil.tokenKey(term))

  override def nullSafeEval(input: Any): Any =
    evalEstimate(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimateTerm", this, classOf[CmsEstimateTerm].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalEstimate($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateTerm =
    copy(child = newChild)
}
