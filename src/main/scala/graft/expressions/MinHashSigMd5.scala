package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-affine MinHash signature kernel — the compiled one-pass form of the
  * SQL-replayable hash family the q42/q113/q127 oracles verify: base hash =
  * first 60 bits of md5 over each distinct n-gram's UTF-8 bytes (the exact
  * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)` value), permutations
  * the affine family (aⱼ·h + bⱼ) mod P, P = 2³¹−1. The Column-HOF
  * formulation this replaces evaluated ~k × shingles interpreted expression
  * trees per document (minutes at sf0.1); here the whole signature is one
  * Java loop per row — k × shingles fused multiply-adds after one md5 per
  * distinct shingle.
  *
  * Tokenization is `trim.split("\\s+")` — identical to
  * TextFunctions.tokens and to the oracle's `string_split(trim(text), ' ')`
  * on single-space text. Documents with fewer than n tokens return null
  * (no signature), matching MinHashSig's contract.
  */
case class MinHashSigMd5(child: Expression, n: Int, k: Int,
    a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with TypedInputs {

  require(n > 0 && k > 0 && a.length == k && b.length == k,
    s"need n>0, k>0 and k-length param arrays (n=$n, k=$k, |a|=${a.length})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = true

  def evalSig(input: UTF8String): GenericArrayData = {
    val toks = input.toString.trim.split("\\s+")
    if (toks.length < n) return null
    val md = MinHashSigMd5.digest.get()
    // distinct shingles only (set semantics — duplicate n-grams cannot
    // change a min); reduced base hashes collected once
    val seen = new java.util.HashSet[String]()
    val hs = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= toks.length - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        md.reset()
        val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
        // first 15 hex chars = big-endian first 8 bytes >>> 4 (60 bits)
        var be = 0L
        var bi = 0
        while (bi < 8) { be = (be << 8) | (d(bi) & 0xffL); bi += 1 }
        hs.add((be >>> 4) % p)
      }
      i += 1
    }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val aj = a(j); val bj = b(j)
      var m = Long.MaxValue
      var x = 0
      while (x < hs.size) {
        val v = (aj * hs.get(x) + bj) % p
        if (v < m) m = v
        x += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    evalSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigMd5", this, classOf[MinHashSigMd5].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sigResult")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r = $ref.evalSig($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMd5 =
    copy(child = newChild)
}

object MinHashSigMd5 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 hash of a string — the shared scalar used by
    * [[SimHash64Md5]] and tests.
    */
  def h60(s: String): Long =
    h60Bytes(s.getBytes(StandardCharsets.UTF_8))

  /** Same hash over raw UTF-8 bytes — the per-row path of the HLL/KMV
    * aggregates, which read UTF8String bytes without a String round-trip.
    */
  def h60Bytes(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var be = 0L
    var bi = 0
    while (bi < 8) { be = (be << 8) | (d(bi) & 0xffL); bi += 1 }
    be >>> 4
  }
}

/** Positional 60-bit md5 n-gram hashes (one per window position, document
  * order, duplicates kept) — the compiled twin of
  * `TextFunctions.md5Hashes60(shinglesOfTokens(...))`, whose interpreted
  * HOFs re-evaluate the tokenization once per element (O(len²) per doc).
  * Used by the q167 CDC gate's cut rule; fewer than n tokens yields an
  * empty array (same as shinglesOfTokens).
  */
case class ShingleHashesMd5(child: Expression, n: Int)
    extends UnaryExpression with TypedInputs {

  require(n > 0, s"n must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalHashes(input: UTF8String): GenericArrayData = {
    val toks = input.toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      out(i) = MinHashSigMd5.h60(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashesMd5", this, classOf[ShingleHashesMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalHashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesMd5 =
    copy(child = newChild)
}

/** md5-parity SimHash kernel (the q43 oracle's twin of [[SimHash64]]):
  * 60-bit md5 token hashes, one ±1 vote per bit per token OCCURRENCE,
  * signature bit set iff the vote sum is strictly positive. Same
  * tokenization contract as [[MinHashSigMd5]].
  */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression with TypedInputs {

  override def dataType: DataType = LongType
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  def evalSig(input: UTF8String): Long = {
    val toks = input.toString.trim.split("\\s+")
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = MinHashSigMd5.h60(toks(i))
      var bit = 0
      while (bit < 60) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    evalSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64Md5", this, classOf[SimHash64Md5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalSig($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5 =
    copy(child = newChild)
}
