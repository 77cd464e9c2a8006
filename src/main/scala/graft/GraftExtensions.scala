package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{FloatVecDot, LongArrayMatchFrac, ShingleHashes, SimHash64}

/** Session extension registering the engine's native expressions as SQL
  * functions, so the `spark.sql` surface (and dbt-style SQL-string models)
  * can call them directly:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Covers: vec_dot(array<float>, array<float>) → double,
  * shingle_hashes(text, n) → array<bigint>, simhash64(text) → bigint,
  * minhash_match_frac(array<bigint>, array<bigint>) → double.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder))
    }
}

object GraftExtensions {
  private[graft] val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two float arrays",
      args => FloatVecDot(args(0), args(1))),
    ("simhash64", "simhash64(text) - 64-bit SimHash signature",
      args => SimHash64(args.head)),
    ("shingle_hashes", "shingle_hashes(text, n) - distinct word n-gram hashes",
      args => ShingleHashes(args(0), intLiteralArg(args(1), "shingle_hashes", "n"))),
    ("minhash_match_frac",
      "minhash_match_frac(a, b) - fraction of agreeing signature positions",
      args => LongArrayMatchFrac(args(0), args(1))))

  /** A function argument that must be a constant integer (e.g. a shingle
    * width): accepts any foldable integral expression; anything else fails at
    * plan time with a clear message instead of a ClassCastException/NPE.
    */
  private def intLiteralArg(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a constant integer, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a constant integer, got " +
            s"${if (other == null) "NULL" else other.getClass.getSimpleName} (${e.sql})")
    }
  }

  /** Register the same functions on an already-built session (temp-function
    * scope) — for sessions the caller doesn't construct.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
