package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing as the shuffle-elimination path for recurring joins
  * (SURVEY.md §7.6): both fact tables written bucketed by the join
  * key join WITHOUT any Exchange — at 100 TB this converts the
  * dominant shuffle of every downstream join into a one-time layout
  * cost at write time.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with no exchange and match the plain join") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(s, dir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(s, dir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = s.table("b_lineitem")
      .join(s.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not reshuffle either bucketed side: the only
    // exchange allowed is the one feeding the final small aggregation
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange"), plan)

    val plain = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val a = joined.orderBy("o_orderpriority").collect().toSeq
    val b = plain.orderBy("o_orderpriority").collect().toSeq
    assert(a == b)
  }
}
