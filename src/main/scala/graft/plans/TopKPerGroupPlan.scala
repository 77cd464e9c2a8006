package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator top-k-per-group — the second native plan of the (c) tier
  * (next to [[AsOfJoinPlan]]): keep the k best rows of every group by
  * (order, tie), maintained in per-group bounded heaps instead of the
  * window formulation's full per-group sort.
  *
  * Why a custom exec: `row_number().over(partitionBy(g).orderBy(o))` must
  * SORT every group end to end (O(n log n) per group, full materialization
  * in the sorter) only to discard all but k rows; the heap pass is
  * O(n log k) with memory k × groups-per-partition, and needs no sort at
  * all — `requiredChildDistribution` asks only for clustering, so
  * EnsureRequirements plans one hash exchange and nothing else. At 100 TB
  * ("top 10 documents per domain by quality") the skipped sort IS the
  * query cost.
  *
  * Rows whose order or tie value is null are dropped (the window
  * formulation ranks them last; a top-k caller never wants them — filter
  * upstream if they matter). Ties at the boundary break deterministically:
  * smaller tie value wins, so output is reproducible at any partitioning.
  */
final case class TopKPerGroupNode(
    child: LogicalPlan,
    group: Attribute, order: Attribute, tie: Attribute,
    k: Int, descending: Boolean)
    extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(child, g, o, t, k, desc) =>
      TopKPerGroupExec(planLater(child), g, o, t, k, desc) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    child: SparkPlan,
    group: Attribute, order: Attribute, tie: Attribute,
    k: Int, descending: Boolean)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(group)) :: Nil
  // deliberately NO requiredChildOrdering — the heap replaces the sort

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val gIdx = child.output.indexOf(group)
    val oIdx = child.output.indexOf(order)
    val tIdx = child.output.indexOf(tie)
    val gType = group.dataType
    val oType = order.dataType
    val tType = tie.dataType
    val kLocal = k
    val desc = descending

    child.execute().mapPartitions { iter =>
      val oOrd = PhysicalDataType.ordering(oType).asInstanceOf[Ordering[Any]]
      val tOrd = PhysicalDataType.ordering(tType).asInstanceOf[Ordering[Any]]
      // true iff (oa, ta) ranks strictly better than (ob, tb)
      def better(oa: Any, ta: Any, ob: Any, tb: Any): Boolean = {
        val c = oOrd.compare(oa, ob)
        if (c != 0) { if (desc) c > 0 else c < 0 }
        else tOrd.compare(ta, tb) < 0
      }
      // PriorityQueue dequeues its maximum: rank by badness so the head is
      // always the eviction candidate
      val badness: Ordering[(Any, Any, InternalRow)] =
        (a, b) =>
          if (better(a._1, a._2, b._1, b._2)) -1
          else if (better(b._1, b._2, a._1, a._2)) 1
          else 0
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[(Any, Any, InternalRow)]]
      iter.foreach { row =>
        val oVal = row.get(oIdx, oType)
        val tVal = row.get(tIdx, tType)
        if (oVal != null && tVal != null) {
          // transient lookup key is fine (equality probe); stable values are
          // re-extracted from the COPIED row before anything is retained —
          // unsafe-row buffers are reused by the iterator
          val probe = row.get(gIdx, gType)
          heaps.get(probe) match {
            case Some(heap) =>
              if (heap.size < kLocal) {
                val kept = row.copy()
                heap.enqueue((kept.get(oIdx, oType), kept.get(tIdx, tType), kept))
              } else {
                val worst = heap.head
                if (better(oVal, tVal, worst._1, worst._2)) {
                  heap.dequeue()
                  val kept = row.copy()
                  heap.enqueue((kept.get(oIdx, oType), kept.get(tIdx, tType), kept))
                }
              }
            case None =>
              val kept = row.copy()
              val heap = mutable.PriorityQueue.empty[(Any, Any, InternalRow)](badness)
              heap.enqueue((kept.get(oIdx, oType), kept.get(tIdx, tType), kept))
              heaps.put(kept.get(gIdx, gType), heap)
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
