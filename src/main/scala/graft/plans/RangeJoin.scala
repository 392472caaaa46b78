package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan (SURVEY.md §4.3 path (c)) #3: the keyed
  * RANGE (interval) join — every left row paired with the right rows
  * of the same key whose time lies in [leftTime + lower, leftTime +
  * upper]. Right-side columns surface through `payload`/`payloadOut`
  * (fresh attributes), so self-joins with shared expression ids stay
  * unambiguous.
  *
  * The declarative scale shape (q43) buckets time and replicates the
  * right side into 3 adjacent buckets — correct, but it exchanges 3x
  * the right rows and re-filters. This operator instead co-partitions
  * both sides by key, sorts per partition by (key, time) — exactly
  * the q60 as-of layout — and sweeps a sliding window: a ring buffer
  * holds only the right rows inside [lt+lower, lt+upper] for the
  * current key, so execution is O(left + right + output) with memory
  * bounded by the densest window, and the exchanges carry each side
  * ONCE.
  */
case class RangeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lower: Long,
    upper: Long,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  require(payload.length == payloadOut.length)
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "range join times must be long (cast timestamps to epoch units first)")
  require(lower <= upper)
  // custom nodes bypass ImplicitTypeCasts — mismatched key types would
  // make the byte-wise comparisons read garbage (see AsOfJoinNode)
  require(leftKeys.zip(rightKeys).forall { case (l, r) =>
    !l.resolved || !r.resolved || l.dataType.sql == r.dataType.sql },
    s"range join key types must match pairwise: " +
      s"${leftKeys.map(_.sql)} vs ${rightKeys.map(_.sql)}")
  // lt + lower / lt + upper are computed with saturating adds in the
  // exec, but bounds at the very edge of Long would still make the
  // window semantics ambiguous — keep them in a sane band
  require(lower > Long.MinValue / 2 && upper < Long.MaxValue / 2,
    "range bounds must lie in (-2^62, 2^62) — use a domain-plausible horizon")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

case class RangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lower: Long,
    upper: Long,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val lowerB = lower
    val upperB = upper
    // saturating add: lt + bound must never wrap (a left time near the
    // Long edge with a sentinel-sized bound would otherwise flip sign
    // and silently drain/starve the window); saturation preserves the
    // intended "unbounded in that direction" reading
    def satAdd(a: Long, b: Long): Long = {
      val r = a + b
      if (((a ^ r) & (b ^ r)) < 0) { if (a > 0) Long.MaxValue else Long.MinValue }
      else r
    }
    val payloadB = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val payloadProj = UnsafeProjection.create(payloadB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      val nKeys = lKeysB.length
      def anyNull(row: InternalRow, n: Int): Boolean = {
        var i = 0
        while (i < n) { if (row.isNullAt(i)) return true; i += 1 }
        false
      }
      // sliding window of (rt, payload) for the key under the sweep
      var winKey: UnsafeRow = null
      val win = new java.util.ArrayDeque[(Long, UnsafeRow)]()
      lIter.flatMap { lRow =>
        val lk = lKeyProj(lRow)
        val ltRow = lTimeProj(lRow)
        // SQL inner-join semantics: NULL keys/times never match — a
        // left row carrying one produces no output, and nulls-first
        // ordering means skipping it consumes no rights out of order
        if (anyNull(lk, nKeys) || ltRow.isNullAt(0)) Iterator.empty else {
        val lt = ltRow.getLong(0)
        if (winKey == null || keyOrd.compare(winKey, lk) != 0) {
          win.clear()
          winKey = lk.copy()
        }
        // evict rights that fell behind the window
        while (!win.isEmpty && win.peekFirst()._1 < satAdd(lt, lowerB)) win.pollFirst()
        // admit rights of this key up to the window's upper edge
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rRow = rBuf.head
          val rKeyRow = rKeyProj(rRow)
          val kc = keyOrd.compare(rKeyRow, lk)
          if (kc < 0) {
            rBuf.next() // behind the sweep entirely (incl. NULL keys)
          } else if (kc == 0) {
            val rtRow = rTimeProj(rRow)
            if (rtRow.isNullAt(0)) {
              rBuf.next() // NULL right time never joins: discard
            } else {
            val rt = rtRow.getLong(0)
            if (rt <= satAdd(lt, upperB)) {
              // a right below the lower edge can never qualify for any
              // LATER left row either (left times are nondecreasing, so
              // lt + lower only moves forward): drop it outright
              if (rt >= satAdd(lt, lowerB)) win.addLast((rt, payloadProj(rRow).copy()))
              rBuf.next()
            } else {
              advancing = false
            }
            }
          } else {
            advancing = false
          }
        }
        // everything in the window satisfies both bounds for THIS lt
        // (evicted below, admission-capped above); flatMap fully
        // consumes this sub-iterator before the next left row mutates
        // the window
        val it = win.iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = outProj(joined(lRow, it.next()._2))
        }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: RangeJoinNode =>
      // normalize float keys at planning time (resolved here) — see
      // AsOfJoinStrategy; times are LongType by the node contract
      val nf = org.apache.spark.sql.graftbridge.Bridge.normalizeFloats _
      RangeJoinExec(n.leftKeys.map(nf), n.rightKeys.map(nf),
        n.leftTime, n.rightTime,
        n.lower, n.upper, n.payload, n.payloadOut,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}
