package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen expression — the
  * canonicalization pass a multilingual corpus needs before ANY
  * byte-identity operator (fingerprint dedup, shingle hashing, blocklist
  * probes): the same visible text arrives from the web in composed and
  * decomposed forms (é as U+00E9 vs e+U+0301), and without normalization
  * those are different bytes, so duplicates survive dedup and
  * contamination probes miss. Spark ships no normalizer function; a Scala
  * UDF would force serialization per row — this wraps `java.text.Normalizer`
  * (ICU-equivalent for these forms) in the same nullSafeCodeGen shape as
  * every other kernel here, with a fast pre-check (`isNormalized`) so
  * already-NFC ASCII/Latin corpora pay one scan and zero allocation.
  *
  * Unicode normalization forms are engine-portable by spec (the forms are
  * defined by UAX #15, not the library), which is what makes an oracle
  * replay possible: DuckDB's `nfc_normalize` computes the same NFC.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression with TypedInputs {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalNormalize(str: UTF8String): UTF8String = {
    val s = str.toString
    if (Normalizer.isNormalized(s, normForm)) str
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override def nullSafeEval(input: Any): Any =
    evalNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeUnicode", this,
      classOf[NormalizeUnicode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalNormalize($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}
