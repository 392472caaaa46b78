package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** AQE skew handling — the runtime half of the skew story (q39 is the
  * static salting half): a join with one hot key re-plans at runtime
  * into split skewed partitions, no manual salting required.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val s = spark
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-sized thresholds: the hot key's partition (~2 MB of rows)
      // must count as "skewed" without needing 256 MB of test data
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force a sort-merge join: broadcast would sidestep the skew path
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // 50k rows of key 0 (hot) + 5k spread over 50 keys; payload
      // column makes the hot partition comfortably exceed the threshold
      val left = s.range(55000).select(
        when(col("id") < 50000, 0L).otherwise(col("id") % 50).as("k"),
        concat(lit("x"), col("id").cast("string"),
          lit("-" * 64)).as("payload"))
      val right = s.range(5000).select((col("id") % 50).as("k"),
        col("id").as("rv"))
      val joined = left.join(right, "k")
      // execute THIS frame (count() would build its own plan tree and
      // leave joined's adaptive plan unfinalized)
      val n = joined.toLocalIterator().asScala.length
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
