package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
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
}
