package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical top-k-per-key: the first `k` rows of each key group under
  * `order`. Planned by [[graft.GraftStrategies]] into a two-phase
  * physical operator (map-side partial top-k → shuffle on keys → final
  * streaming group-limit), replacing the window/row_number formulation
  * that must sort ALL rows of every key group — at 100 TB, bounded
  * heaps of size k per key beat a full per-partition sort and cut
  * shuffle volume to at most k·partitions rows per key.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical per-key top-k.
  *
  * `global = false` — map-side partial: bounded max-heap of size k per
  * key per partition (no distribution requirement). Heap memory is
  * capped by `graft.topk.maxBufferedRows` (default 8M rows): once the
  * cap is hit, rows for keys not already tracked pass through
  * unfiltered — always correct, because the final phase re-filters;
  * the partial phase is only a shuffle-volume optimization, so
  * degrading to pass-through under ultra-high key cardinality costs
  * shuffle bytes, never memory or correctness.
  *
  * `global = true` — final: requires clustering on `keys` AND
  * (keys ++ order) child ordering, so Spark plans its spill-capable
  * SortExec underneath and this phase is a streaming group-limit with
  * O(1) state (current key + count) — the same execution shape as
  * Spark's WindowGroupLimit final, with no per-key heap map that could
  * OOM on near-unique keys. Its input is already pruned to ≤ k rows
  * per key per map partition by the partial phase.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    global: Boolean,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  /** Float/double keys normalized (-0.0 → 0.0, canonical NaN). The
    * RowNumberLimitToTopK rewrite fires BEFORE Spark's
    * NormalizeFloatingNumbers batch and replaces the Window that rule
    * would have handled, so this node must normalize its own keys —
    * otherwise the exchange can hash 0.0 and -0.0 to different
    * partitions and the final phase would split one logical group. */
  private val normKeys: Seq[Expression] = keys.map { k =>
    k.dataType match {
      case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType =>
        org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(k)
      case _ => k
    }
  }

  private def keysAndOrder: Seq[SortOrder] =
    normKeys.map(SortOrder(_, Ascending)) ++ order

  override def requiredChildDistribution: Seq[Distribution] =
    if (global) ClusteredDistribution(normKeys) :: Nil
    else UnspecifiedDistribution :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (global) Seq(keysAndOrder) else Seq(Nil)

  override def outputOrdering: Seq[SortOrder] =
    if (global) keysAndOrder else Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    if (global) executeFinal() else executePartial()

  /** Streaming group-limit over (keys ++ order)-sorted input. */
  private def executeFinal(): RDD[InternalRow] = {
    val (keyExprs, limit, childOutput) = (normKeys, k, child.output)
    val emitRank = rankAttr.isDefined
    val outputSchema = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      lazy val proj = UnsafeProjection.create(outputSchema.map(_.dataType).toArray)
      val rankCell = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow()
      new Iterator[InternalRow] {
        private var currentKey: UnsafeRow = null
        private var rank = 0
        private var pending: InternalRow = null
        override def hasNext: Boolean = {
          while (pending == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            if (currentKey == null || key != currentKey) {
              currentKey = key.copy()
              rank = 0
            }
            rank += 1
            if (rank <= limit) pending = row
          }
          pending != null
        }
        override def next(): InternalRow = {
          val row = pending
          pending = null
          if (!emitRank) row
          else {
            rankCell.update(0, rank)
            proj(joined(row, rankCell))
          }
        }
      }
    }
  }

  /** Map-side partial: bounded heaps, pass-through beyond the cap. */
  private def executePartial(): RDD[InternalRow] = {
    val (keyExprs, sortOrder, limit, childOutput) = (normKeys, order, k, child.output)
    val maxBuffered =
      conf.getConfString("graft.topk.maxBufferedRows", (8 << 20).toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap: head = worst row currently kept for the key
      val heapOrd: Ordering[InternalRow] = ordering
      val heaps = new java.util.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      new Iterator[InternalRow] {
        private var nBuffered = 0L
        private var overflow: InternalRow = null
        private var drain: Iterator[InternalRow] = null
        private def scan(): Unit = {
          while (overflow == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              if (nBuffered >= maxBuffered) {
                // cap reached: new keys bypass partial filtering — the
                // final phase still computes the exact top-k
                overflow = row
              } else {
                heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
                heaps.put(key.copy(), heap)
                heap.enqueue(row.copy())
                nBuffered += 1
              }
            } else if (heap.size < limit) {
              // cap gates EXISTING keys' growth too — without this,
              // tracked keys could buffer up to cap × k rows total
              if (nBuffered >= maxBuffered) overflow = row
              else {
                heap.enqueue(row.copy())
                nBuffered += 1
              }
            } else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(row.copy())
            }
          }
        }
        override def hasNext: Boolean = {
          if (overflow != null) return true
          scan()
          if (overflow != null) return true
          if (drain == null)
            drain = {
              val groups = heaps.values().iterator()
              new Iterator[Iterator[InternalRow]] {
                override def hasNext: Boolean = groups.hasNext
                override def next(): Iterator[InternalRow] = groups.next().dequeueAll.iterator
              }.flatten
            }
          drain.hasNext
        }
        override def next(): InternalRow = {
          if (overflow != null) { val r = overflow; overflow = null; r }
          else drain.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
