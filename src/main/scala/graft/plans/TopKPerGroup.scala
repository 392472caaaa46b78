package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §4.3 path (c)): top-k rows
  * per group under a total order, WITHOUT the global per-partition
  * sort a window `row_number() <= k` needs.
  *
  * Execution is heap-based and two-phase, like a partial aggregate:
  * each input partition keeps one bounded heap per group it sees and
  * emits at most k rows per (partition, group); after the group-key
  * shuffle the same pass merges the partials. At 100 TB the shuffle
  * carries O(partitions * groups * k) rows instead of the whole
  * table, and no stage ever sorts more than k rows per group.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    val part = partial
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      val ord = new LazilyGeneratedOrdering(orderE, childOutput)
      val heapOrd = new Ordering[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
      }
      // max-heap by the output order: head = worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      // memory bound for the PARTIAL phase: a near-unique group column
      // would otherwise hold groups x k rows in the map with no spill
      // (the hash-aggregate pitfall without its sort fallback). When
      // the map reaches the cap, flush every current heap downstream
      // and start over — correct because the final phase re-heaps per
      // group across ALL partial emissions, and any row discarded
      // before a flush was dominated by k flushed rows of its group.
      // The FINAL phase must NOT flush (its input is grouped by the
      // exchange but not sorted, so a mid-stream flush would emit one
      // group twice); its footprint is the post-shuffle per-partition
      // group count x k — callers with near-unique groups should use
      // the window row_number form, which sort-spills, instead.
      val maxGroups = if (part) 1 << 17 else Int.MaxValue
      def drain(): Iterator[InternalRow] = {
        val out = heaps.valuesIterator.flatMap(_.iterator)
          .map(_.asInstanceOf[InternalRow]).toArray
        heaps.clear()
        out.iterator
      }
      val flushed = iter.flatMap { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
        if (heaps.size >= maxGroups) drain() else Iterator.empty
      }
      flushed ++ heaps.valuesIterator.flatMap(_.iterator)
        .map(_.asInstanceOf[InternalRow])
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Planner strategy: logical TopKPerGroupNode → partial exec, then
  * final exec whose required ClusteredDistribution makes
  * EnsureRequirements insert the group-key exchange between them.
  */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      // normalize float group keys HERE (expressions are resolved at
      // planning time; at construction a bare col() may not be):
      // byte-wise heap-map keys and the hash exchange must collapse
      // -0.0/0.0 and NaN bit patterns like built-in aggregates do
      val gn = g.map(org.apache.spark.sql.graftbridge.Bridge.normalizeFloats)
      TopKPerGroupExec(gn, o, k, partial = false,
        TopKPerGroupExec(gn, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
