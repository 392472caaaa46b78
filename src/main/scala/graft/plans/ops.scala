package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, SortOrder}
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
    Bridge.ofRows(spark, TopKPerGroupNode(
      groupCols.map(Bridge.catalystExpression), order, k, Bridge.logicalPlan(df)))
  }

  /** Native as-of join: each left row gains `payload` columns from the
    * latest right row with the same key and rightTime <= leftTime
    * (strictly < when `strict`); NULLs when no such row. Pass
    * DATASET-BOUND columns (`df("c")`) — left and right may share
    * attribute ids (self-as-of), and binding by the owning frame keeps
    * each expression on its side. Registers [[AsOfJoinStrategy]] on
    * first use.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      payload: Seq[(Column, String)],
      strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val payloadExprs = payload.map { case (c, _) => Bridge.catalystExpression(c) }
    val payloadOut = payload.zip(payloadExprs).map { case ((_, n), e) =>
      AttributeReference(n, e.dataType, nullable = true)()
    }
    Bridge.ofRows(spark, AsOfJoinNode(
      Bridge.analyzedPlan(left), Bridge.analyzedPlan(right),
      leftKeys.map(Bridge.catalystExpression),
      rightKeys.map(Bridge.catalystExpression),
      Bridge.catalystExpression(leftTime),
      Bridge.catalystExpression(rightTime),
      payloadExprs, payloadOut, strict))
  }
}
