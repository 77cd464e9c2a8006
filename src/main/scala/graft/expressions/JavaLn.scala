package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — the oracle-parity ln.
  *
  * Spark's built-in `log()` evaluates through StrictMath.log (fdlibm),
  * which can differ from the platform log in the final ulp; DuckDB's `ln`
  * is the platform log, verified bitwise-equal to Java's Math.log on real
  * inputs (see the verify notes and TokenBigramScore, which pins the same
  * equality for driver-computed log tables). Operators whose SELECTION
  * depends on a log-derived sort key (the Efraimidis-Spirakis exponential
  * race in Sampling.weightedSample*) use this expression so the key is
  * bit-identical across engines and the draw is replayable in a SQL
  * oracle — with built-in log() an ulp flip at the cut could change which
  * row wins.
  *
  * Codegen emits the call inline (still whole-stage-codegen friendly);
  * Math.log is an intrinsic, so this is also never slower than the
  * StrictMath path.
  */
case class JavaLn(child: Expression)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = DoubleType
  override def declaredInputTypes: Seq[DataType] = Seq(DoubleType)

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): JavaLn =
    copy(child = newChild)
}
