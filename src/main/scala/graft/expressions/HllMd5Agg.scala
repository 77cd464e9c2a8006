package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.HllMd5

/** One-pass HLL register build over string keys — the native-aggregate form
  * of [[graft.operators.HllMd5.sketch]]'s relational groupBy, and the
  * md5-parity twin of Spark's DataSketches `hll_sketch_agg`. The buffer IS
  * the sketch: m = 1024 register bytes per group, updated in place per row
  * and merged by element-wise max, so the shuffle carries exactly 1 KB per
  * group per partition instead of up-to-m register rows. Registers are
  * identical to the relational build's (HllMd5Spec pins frame equality), so
  * estimates stay DuckDB-replayable.
  */
case class HllMd5Agg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression]
    with TypedInputs {

  override def dataType: DataType = BinaryType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllMd5.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val k = child.eval(input)
    if (k != null) {
      val (idx, rho) = HllMd5.registerOfHash(
        MinHashSigMd5.h60Bytes(k.asInstanceOf[UTF8String].getBytes))
      if (rho > buffer(idx)) buffer(idx) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  // clone on both edges: a deserialized buffer may alias row-backed bytes,
  // and update/merge mutate in place
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMd5Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMd5Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMd5Agg =
    copy(child = newChild)
}

/** Register-wise max over binary HLL sketches — the md5-parity twin of
  * `hll_union_agg`: re-aggregates per-shard/per-day sketches into coarser
  * groups without touching a data row. NULL sketches are skipped; sketches
  * of the wrong length fail loudly (a silent size mismatch would zero-pad
  * someone's registers).
  */
case class HllMd5UnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression]
    with TypedInputs {

  override def dataType: DataType = BinaryType
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllMd5.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == HllMd5.M,
        s"hll_md5_union_agg: expected ${HllMd5.M}-byte sketch, got ${regs.length}")
      merge(buffer, regs)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  // clone on both edges: a deserialized buffer may alias row-backed bytes,
  // and update/merge mutate in place
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMd5UnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMd5UnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMd5UnionAgg =
    copy(child = newChild)
}

/** Estimate read off a binary HLL sketch — the md5-parity twin of
  * `hll_sketch_estimate`, except it exposes the full gate-parity triple
  * struct(m_used, v_zero, hll_estimate) through the same scalar dag as
  * [[graft.operators.HllMd5.estimateScalar]] (ascending-register fold,
  * small-range linear counting via platform ln), so the output is
  * bit-equal to both the relational estimate and a DuckDB replay.
  */
case class HllMd5Estimate(child: Expression)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = StructType(Seq(
    StructField("m_used", LongType, nullable = false),
    StructField("v_zero", LongType, nullable = false),
    StructField("hll_estimate", DoubleType, nullable = false)))
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType)

  def evalRow(regs: Array[Byte]): InternalRow = {
    require(regs.length == HllMd5.M,
      s"hll_md5_estimate: expected ${HllMd5.M}-byte sketch, got ${regs.length}")
    val (mUsed, vZero, est) = HllMd5.estimateScalar(regs)
    new GenericInternalRow(Array[Any](mUsed, vZero, est))
  }

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hllMd5Estimate", this, classOf[HllMd5Estimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HllMd5Estimate =
    copy(child = newChild)
}
