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

/** One-pass KMV bottom-k sketch build (SQL `kmv_md5_agg`) — the
  * native-aggregate form of [[graft.operators.KmvSketch.sketch]]'s
  * distinct + heap-top-k pipeline: the buffer is a k-bounded ordered set
  * of distinct 60-bit md5 key hashes, updated in place per row and merged
  * by set-union-then-trim, so building a group's sketch is ONE
  * map-side-combining aggregation (k longs per group per partition on the
  * wire) instead of a distinct shuffle followed by a top-k exchange.
  * Output: the minima ascending as array<bigint> — identical to the
  * relational sketch's rows (KmvSketchSpec pins set equality), so every
  * downstream estimate stays DuckDB-replayable. NULL keys are skipped
  * (COUNT(DISTINCT) contract); merging sketches of DIFFERENT k is valid
  * KMV semantics only at the smaller k, so the aggregate fixes one k per
  * call.
  */
case class KmvAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with TypedInputs {

  require(k >= 2 && k <= (1 << 20),
    s"k must be in [2, 2^20] (the estimator reads the k-th minimum), got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = MinHashSigMd5.h60Bytes(v.asInstanceOf[UTF8String].getBytes)
      // admit only when it can be a bottom-k member; TreeSet dedups
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last()) {
        if (buffer.add(h)) buffer.remove(buffer.last())
      }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buffer.addAll(other)
    while (buffer.size > k) buffer.remove(buffer.last())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.size * 8)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) set.add(bb.getLong())
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
