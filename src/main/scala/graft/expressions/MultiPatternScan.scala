package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.TypedInputs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-pattern scan (Aho–Corasick, CACM'75) over a string
  * column: returns `[total_hits, distinct_patterns]`, counting EVERY
  * occurrence including overlapping ones (one per match end position) —
  * the well-defined count any position-scan oracle can replay.
  *
  * This is the blocklist probe at corpus scale: one byte-automaton walk
  * per document — O(bytes + matches) — where the naive formulation runs
  * one `contains`/regex pass PER PATTERN and re-reads 100 TB k times. The
  * automaton (byte-alphabet goto table, BFS-filled fail links, collapsed
  * output counts, dictionary suffix links for distinct marking) is built
  * once on the driver from the pattern list and rides inside the kernel.
  * Matching is on UTF-8 bytes; UTF-8 is self-synchronizing, so byte
  * matches of valid patterns are exactly character matches.
  */
case class MultiPatternScan(child: Expression, patterns: Seq[String])
    extends UnaryExpression with TypedInputs {

  require(patterns.nonEmpty, "at least one pattern required")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  /** goto(node)(byte) table, per-node total endings (own + fail chain),
    * own pattern ids, and dictionary suffix links.
    */
  @transient private lazy val automaton: (Array[Array[Int]], Array[Long],
      Array[Array[Int]], Array[Int]) = {
    val gotoRaw = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Int, Int])
    val endings = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    patterns.indices.foreach { p =>
      var node = 0
      patterns(p).getBytes("UTF-8").foreach { b =>
        val key = b & 0xff
        node = gotoRaw(node).getOrElseUpdate(key, {
          gotoRaw += scala.collection.mutable.HashMap.empty[Int, Int]
          endings += Array.empty[Int]
          gotoRaw.length - 1
        })
      }
      endings(node) = endings(node) :+ p
    }
    val n = gotoRaw.length
    val fail = new Array[Int](n)
    val dict = new Array[Int](n) // nearest fail-ancestor with endings, -1 none
    java.util.Arrays.fill(dict, -1)
    val goto = Array.tabulate(n)(i => new Array[Int](256))
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { b =>
      gotoRaw(0).get(b) match {
        case Some(next) => goto(0)(b) = next; queue += next
        case None => goto(0)(b) = 0
      }
    }
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      dict(node) =
        if (endings(fail(node)).nonEmpty) fail(node) else dict(fail(node))
      (0 until 256).foreach { b =>
        gotoRaw(node).get(b) match {
          case Some(next) =>
            fail(next) = goto(fail(node))(b)
            goto(node)(b) = next
            queue += next
          case None =>
            goto(node)(b) = goto(fail(node))(b)
        }
      }
    }
    // collapsed total endings along the fail chain (processing in BFS
    // order guarantees the ancestor totals are final)
    val total = new Array[Long](n)
    val order = scala.collection.mutable.Queue(0)
    val seen = new Array[Boolean](n)
    seen(0) = true
    total(0) = endings(0).length.toLong
    while (order.nonEmpty) {
      val node = order.dequeue()
      gotoRaw(node).values.foreach { next =>
        if (!seen(next)) {
          seen(next) = true
          total(next) = endings(next).length.toLong + total(fail(next))
          order += next
        }
      }
    }
    (goto, total, endings.map(identity).toArray, dict)
  }

  def evalScan(str: UTF8String): GenericArrayData = {
    val (goto, total, endings, dict) = automaton
    val bytes = str.getBytes
    val seen = new Array[Boolean](patterns.length)
    var distinct = 0L
    var hits = 0L
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = goto(node)(bytes(i) & 0xff)
      if (total(node) > 0) {
        hits += total(node)
        // mark distinct patterns along the dictionary chain; cheap because
        // it only walks nodes that actually end patterns
        var d = node
        while (d >= 0) {
          val ends = endings(d)
          var e = 0
          while (e < ends.length) {
            if (!seen(ends(e))) { seen(ends(e)) = true; distinct += 1 }
            e += 1
          }
          d = dict(d)
        }
      }
      i += 1
    }
    new GenericArrayData(Array[Any](hits, distinct))
  }

  override def nullSafeEval(input: Any): Any =
    evalScan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPatternScan", this, classOf[MultiPatternScan].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalScan($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternScan =
    copy(child = newChild)
}
