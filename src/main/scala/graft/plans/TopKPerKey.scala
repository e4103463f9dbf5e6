package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical top-k-per-key: the first `k` rows of each key group under
  * `order`. Planned by [[graft.GraftStrategies]] into a two-phase
  * physical operator (map-side partial top-k → shuffle on keys → final
  * top-k), replacing the window/row_number formulation that must sort
  * ALL rows of every key group — at 100 TB, bounded heaps of size k per
  * key beat a full per-partition sort and cut shuffle volume to at most
  * k·partitions rows per key.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical per-key top-k: bounded max-heap per key per partition.
  * `global = false` → partial (no distribution requirement, runs
  * map-side); `global = true` → requires clustering on `keys`, emits
  * each group's rows in sort order.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    global: Boolean,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (global) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrder, limit, childOutput) = (keys, order, k, child.output)
    val emitRank = rankAttr.isDefined
    val outputSchema = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap: head = worst row currently kept for the key
      val heapOrd: Ordering[InternalRow] = ordering
      val heaps = new java.util.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      // rank = 1-based position within the group's sorted output; when
      // emitted, project to unsafe since downstream exchanges require it
      lazy val proj = UnsafeProjection.create(outputSchema.map(_.dataType).toArray)
      val rankCell = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        private var rank = 0
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            current = groups.next().dequeueAll.reverseIterator // ascending order
            rank = 0
          }
          current.hasNext
        }
        override def next(): InternalRow = {
          val row = current.next()
          if (!emitRank) row
          else {
            rank += 1
            rankCell.update(0, rank)
            proj(joined(row, rankCell))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
