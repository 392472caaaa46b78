package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom plan (SURVEY.md §4.3 path (c)) #2: the AS-OF
  * join Spark lacks natively — every left row enriched with the
  * payload of the LATEST right row of the same key whose time is <=
  * (or < when strict) the left row's time.
  *
  * The declarative alternative (union the two streams, window
  * last_value-ignore-nulls, filter — q37's shape) materializes the
  * union and carries every left column through the window. This
  * operator instead declares the textbook distributed as-of layout:
  * requiredChildDistribution co-partitions both sides by key and
  * requiredChildOrdering sorts each partition by (key, time), so
  * EnsureRequirements inserts exactly one exchange + sort per side,
  * and execution is a single forward merge-sweep per partition —
  * O(left + right), no buffering beyond one payload row per key.
  * At 100 TB: two shuffles (one per side, each touched once), no
  * union materialization, no window state.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    // Output attributes for the payload, nullable (left rows with no
    // prior right row get NULLs, like the probe side of a left outer
    // join). A CONSTRUCTOR FIELD, not derived from `payload` aliases:
    // CleanupAliases strips top-level aliases inside generic operators,
    // and derived attributes would change exprId on every tree copy —
    // the same stable-output pattern Generate uses.
    payloadOut: Seq[Attribute],
    strict: Boolean) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  require(payload.length == payloadOut.length)
  // built-in joins get ImplicitTypeCasts during analysis; a custom
  // node bypasses that rule, and a type mismatch (int vs long key)
  // would make the byte-wise/ordering comparisons read garbage — fail
  // loudly at construction instead
  // (guarded on resolution: dataType throws on unresolved exprs, and
  // node copies during analysis may momentarily carry them)
  require(leftKeys.zip(rightKeys).forall { case (l, r) =>
    !l.resolved || !r.resolved || l.dataType.sql == r.dataType.sql },
    s"as-of join key types must match pairwise: " +
      s"${leftKeys.map(_.sql)} vs ${rightKeys.map(_.sql)}")
  require(!leftTime.resolved || !rightTime.resolved ||
    leftTime.dataType.sql == rightTime.dataType.sql,
    s"as-of join time types must match: " +
      s"${leftTime.sql} vs ${rightTime.sql}")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut is GENERATED here, not read from a child — without
  // this, the missing-attribute check counts it as an unresolvable
  // input reference
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute],
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Co-partition both sides by key; EnsureRequirements inserts the
    * two hash exchanges (and nothing else — the sweep needs no global
    * sort).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Per-partition (key, time) order on both sides — satisfied by a
    * local sort, which AQE/EnsureRequirements also inserts. The right
    * side additionally sorts by the payload expressions: when several
    * right rows share (key, time), the sweep keeps the LAST one in
    * sort order, so without a total order the kept payload would
    * depend on shuffle arrival order. Sorting ties by payload makes
    * the survivor deterministic (the payload-wise maximum) across
    * runs and partitionings. Payload columns of UNORDERABLE types
    * (e.g. MapType) are excluded from the tiebreak — SortOrder over
    * them fails at planning — so (key, time)-duplicate right rows
    * with only map payloads keep the documented arrival-order
    * nondeterminism instead of throwing.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ payload.filter(p =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(p.dataType))).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = payload
    val strictB = strict
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val payloadProj = UnsafeProjection.create(payloadB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(payloadB.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      val nKeys = lKeysB.length
      def anyNull(row: InternalRow, n: Int): Boolean = {
        var i = 0
        while (i < n) { if (row.isNullAt(i)) return true; i += 1 }
        false
      }
      // latest right payload seen for the key currently being swept
      var lastKey: UnsafeRow = null
      var lastPayload: UnsafeRow = null
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        // SQL join semantics: a NULL key or NULL time never matches —
        // such a left row passes through with a NULL payload (nulls
        // sort first, so no right rows are consumed out of order)
        if (anyNull(lk, nKeys) || lt.isNullAt(0)) {
          outProj(joined(lRow, nullPayload))
        } else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk = rKeyProj(rRow)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) {
              // right key entirely behind the sweep (incl. NULL keys,
              // which sort first and must never match): discard
              rBuf.next()
            } else if (kc == 0) {
              val rt = rTimeProj(rRow)
              if (rt.isNullAt(0)) {
                // NULL right time never matches any left row: discard
                rBuf.next()
              } else {
                val tc = timeOrd.compare(rt, lt)
                if (tc < 0 || (!strictB && tc == 0)) {
                  lastKey = rk.copy()
                  lastPayload = payloadProj(rRow).copy()
                  rBuf.next()
                } else {
                  advancing = false
                }
              }
            } else {
              advancing = false
            }
          }
          val p =
            if (lastKey != null && keyOrd.compare(lastKey, lk) == 0) lastPayload
            else nullPayload
          outProj(joined(lRow, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      // normalize float keys/times at planning time (resolved here):
      // the interpreted orderings would otherwise treat -0.0 < 0.0
      val nf = org.apache.spark.sql.graftbridge.Bridge.normalizeFloats _
      AsOfJoinExec(n.leftKeys.map(nf), n.rightKeys.map(nf),
        nf(n.leftTime), nf(n.rightTime),
        n.payload, n.payloadOut, n.strict,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}
