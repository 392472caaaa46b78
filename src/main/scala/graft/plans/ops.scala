package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.graftbridge.Bridge

/** DataFrame-level entry points for the custom plan operators. */
object ops {

  /** Top-k rows per group under the given order (e.g.
    * `col("price").desc, col("id")`) via the native two-phase heap
    * operator. The order must be total within each group for
    * deterministic output. Registers [[TopKStrategy]] on the session
    * on first use.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val order = orderCols.map(c => Bridge.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    // analyzedPlan (not logical): dataset-bound group/order columns
    // carry the ANALYZED plan's exprIds; wrapping the unanalyzed plan
    // would let re-analysis re-alias toDF-style projections under
    // fresh ids and orphan them (see Bridge.analyzedPlan's doc — the
    // same contract asofJoin/rangeJoin follow).
    // (float group keys are normalized in TopKStrategy at planning
    // time, when the expressions are guaranteed resolved)
    Bridge.ofRows(spark, TopKPerGroupNode(
      groupCols.map(Bridge.catalystExpression),
      order, k, Bridge.analyzedPlan(df)))
  }

  /** Self-join safety: when the right plan shares attribute ids with
    * the left (same DataFrame on both sides), the analyzer's
    * DeduplicateRelations re-ids the right SUBTREE but cannot rewrite
    * the right-bound expressions stored in a custom node's fields —
    * they would keep pointing at the left's ids and fail to bind. So
    * re-alias the right side under FRESH ids up front and remap the
    * right-bound expressions ourselves.
    */
  private def disambiguated(left: LogicalPlan, right: LogicalPlan,
      rightExprs: Seq[Expression]): (LogicalPlan, Seq[Expression]) = {
    if (right.outputSet.intersect(left.outputSet).isEmpty) (right, rightExprs)
    else {
      val aliases = right.output.map(a => Alias(a, a.name)())
      val fresh = Project(aliases, right)
      // keyed by exprId: dataset-bound columns may carry a different
      // qualifier than the plan's output attribute, which would make
      // whole-attribute equality silently miss
      val remap = right.output.map(_.exprId).zip(aliases.map(_.toAttribute)).toMap
      val remapped = rightExprs.map(_.transform {
        case a: Attribute => remap.getOrElse(a.exprId, a)
      })
      (fresh, remapped)
    }
  }

  /** Shared setup for the two native binary time-join operators:
    * registers `strategy` on the session, builds the fresh payload
    * output attributes, and runs the right side
    * through [[disambiguated]]. One implementation so the subtle
    * disambiguation protocol (exprId remap + splitAt unpacking) can
    * never drift between asofJoin and rangeJoin.
    */
  private final case class BinaryParts(
      lPlan: LogicalPlan, lKeys: Seq[Expression], lTime: Expression,
      rPlan: LogicalPlan, rKeys: Seq[Expression], rTime: Expression,
      rPayload: Seq[Expression], payloadOut: Seq[AttributeReference])

  private def binaryJoinParts(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      payload: Seq[(Column, String)],
      strategy: org.apache.spark.sql.execution.SparkStrategy): BinaryParts = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
    val payloadExprs = payload.map { case (c, _) => Bridge.catalystExpression(c) }
    val payloadOut = payload.zip(payloadExprs).map { case ((_, n), e) =>
      AttributeReference(n, e.dataType, nullable = true)()
    }
    val lPlan = Bridge.analyzedPlan(left)
    val (rPlan, rExprs) = disambiguated(lPlan, Bridge.analyzedPlan(right),
      rightKeys.map(Bridge.catalystExpression) ++
        (Bridge.catalystExpression(rightTime) +: payloadExprs))
    val (rKeys, rTimeAndPayload) = rExprs.splitAt(rightKeys.length)
    BinaryParts(lPlan,
      leftKeys.map(Bridge.catalystExpression),
      Bridge.catalystExpression(leftTime),
      rPlan, rKeys, rTimeAndPayload.head, rTimeAndPayload.tail, payloadOut)
  }

  /** Native as-of join: each left row gains `payload` columns from the
    * latest right row with the same key and rightTime <= leftTime
    * (strictly < when `strict`); NULLs when no such row. Pass
    * DATASET-BOUND columns (`df("c")`); the same frame may appear on
    * both sides (self-as-of). Registers [[AsOfJoinStrategy]] on
    * first use.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      payload: Seq[(Column, String)],
      strict: Boolean = false): DataFrame = {
    val p = binaryJoinParts(left, right, leftKeys, rightKeys,
      leftTime, rightTime, payload, AsOfJoinStrategy)
    Bridge.ofRows(left.sparkSession, AsOfJoinNode(
      p.lPlan, p.rPlan, p.lKeys, p.rKeys, p.lTime, p.rTime,
      p.rPayload, p.payloadOut, strict))
  }

  /** Native keyed range (interval) join: each left row paired with the
    * right rows of the same key whose LONG time lies in [leftTime +
    * lower, leftTime + upper]. Right columns surface as the fresh
    * `payload` attributes; the same frame may appear on both sides
    * (self-range-join). Registers [[RangeJoinStrategy]] on first use.
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      lower: Long, upper: Long,
      payload: Seq[(Column, String)]): DataFrame = {
    val p = binaryJoinParts(left, right, leftKeys, rightKeys,
      leftTime, rightTime, payload, RangeJoinStrategy)
    Bridge.ofRows(left.sparkSession, RangeJoinNode(
      p.lPlan, p.rPlan, p.lKeys, p.rKeys, p.lTime, p.rTime,
      lower, upper, p.rPayload, p.payloadOut))
  }
}
