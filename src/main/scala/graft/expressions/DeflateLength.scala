package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a text column's UTF-8 bytes — the
  * compression-ratio quality signal of Rae et al., "Scaling Language
  * Models: … Gopher" (arXiv:2112.11446 §A1.1): highly compressible text
  * is repetitive boilerplate (and near-incompressible text is often
  * binary junk), so `deflate_len / raw_len` bands both tails for a keep
  * rule no token-level heuristic catches.
  *
  * One pass per document, zero shuffle. The Deflater is per-thread and
  * reset per row (allocating one per row would dominate the cost); raw
  * DEFLATE (nowrap, no zlib header) at a fixed level, so the length is a
  * pure function of the bytes — deterministic across partitions, runs,
  * and cluster layouts for a given JDK zlib. It is NOT replayable in a
  * SQL oracle (no DEFLATE there), so gates over it are rows-only with
  * the spec pinning values against java.util.zip directly.
  */
case class DeflateLength(child: Expression, level: Int)
    extends UnaryExpression with TypedInputs {

  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")

  override def dataType: DataType = LongType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalLen(input: UTF8String): Long = {
    val bytes = input.getBytes
    val d = DeflateLength.deflaterFor(level)
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override def nullSafeEval(input: Any): Any =
    evalLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateLength", this,
      classOf[DeflateLength].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalLen($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {
  // one Deflater per (executor thread, level) for the JVM lifetime — NOT
  // per expression instance: codegen deserializes a fresh instance per
  // task, and an instance-held ThreadLocal would strand one native zlib
  // state per task until GC+Cleaner. Bounded at threads × 9 levels.
  private val pool: ThreadLocal[java.util.HashMap[Int, Deflater]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[Int, Deflater])

  private def deflaterFor(level: Int): Deflater = {
    val m = pool.get()
    var d = m.get(level)
    if (d == null) { d = new Deflater(level, true); m.put(level, d) }
    d
  }
}
