package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.CmsMd5

/** One-pass md5-parity count-min sketch build (SQL `cms_md5_agg`):
  * the buffer is the `depth × width` counter matrix of
  * [[graft.operators.CmsMd5]], bumped in place per row and merged by
  * element-wise addition, so building a group's frequency sketch is ONE
  * map-side-combining aggregation with fixed memory per group no matter
  * how heavy-tailed the key space. Output: the counters row-major as
  * array<bigint>, probe-able by [[CmsMd5.estimateCol]] and replayable
  * bucket-for-bucket in DuckDB (the q236 gate hash-checks every probed
  * counter). NULL keys are skipped; each non-null row adds exactly 1 to
  * one counter per depth row (occurrence counting, not distinct).
  */
case class CmsMd5Agg(child: Expression, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with TypedInputs {

  require(width >= 16 && width <= (1 << 20),
    s"width must be in [16, 2^20], got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CmsMd5.Depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = MinHashSigMd5.h60Bytes(v.asInstanceOf[UTF8String].getBytes)
      CmsMd5.addHash(buffer, width, h)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMd5Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMd5Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMd5Agg =
    copy(child = newChild)
}
