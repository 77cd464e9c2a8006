package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom plan for the as-of join — the (c) tier of the
  * custom-operator ladder (LogicalPlan + Strategy + SparkPlan), used where
  * composing built-ins costs an extra pass: the union+window formulation in
  * graft.operators.AsOfJoin shuffles the *union* of both sides and then
  * filters half the rows back out; this operator shuffles each side once,
  * sorts within partitions, and streams a single merge pass.
  *
  * Semantics: for every left row, attach the right row with the greatest
  * `rightTs <= leftTs` within the same key (null-extended when none).
  * Both inputs are hash-clustered on the key and sorted by (key, ts) —
  * declared via requiredChildDistribution/Ordering so EnsureRequirements
  * plans the exchanges, exactly like SortMergeJoin does. The merge itself is
  * O(left + right) per partition with one buffered right row.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute)
    extends BinaryNode {
  // the exec reads both sides through the LEFT side's physical types
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(leftKey)
    val lTsOrd = left.output.indexOf(leftTs)
    val rKeyOrd = right.output.indexOf(rightKey)
    val rTsOrd = right.output.indexOf(rightTs)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val rightArity = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrdering = PhysicalDataType.ordering(keyType)
        .asInstanceOf[Ordering[Any]]
      val tsOrdering = PhysicalDataType.ordering(tsType)
        .asInstanceOf[Ordering[Any]]
      val nullRight = new GenericInternalRow(rightArity)
      val rBuf = rIter.buffered
      // last right row (copied) whose (key, ts) is <= the current left row
      var candidate: InternalRow = null
      var candidateKey: Any = null
      val joined = new JoinedRow

      lIter.map { lRow =>
        val lKey = lRow.get(lKeyOrd, keyType)
        val lTs = lRow.get(lTsOrd, tsType)
        if (lKey == null || lTs == null) {
          // SQL equi-join semantics (and the composed window form, which
          // filters right-side rows by rightTs <= leftTs — never true for
          // null): a null key or timestamp matches nothing → null-extend
          joined(lRow, nullRight)
        } else {
          // advance right while it is behind or equal to (lKey, lTs)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rBuf.head.get(rKeyOrd, keyType)
            val rTs = rBuf.head.get(rTsOrd, tsType)
            if (rKey == null || rTs == null) {
              rBuf.next() // can never match any left row — discard
            } else {
              val cmpKey = keyOrdering.compare(rKey, lKey)
              if (cmpKey < 0) {
                rBuf.next() // right rows for earlier keys can never match again
              } else if (cmpKey == 0 && tsOrdering.compare(rTs, lTs) <= 0) {
                candidate = rBuf.next().copy()
                candidateKey = rKey
              } else {
                advancing = false
              }
            }
          }
          val matches = candidate != null &&
            keyOrdering.compare(candidateKey, lKey) == 0
          joined(lRow, if (matches) candidate else nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
