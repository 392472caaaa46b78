package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch dev probe (r17): where do the PR-round SMJ sides' partition
  * counts come from, and why does EnsureRequirements still re-shuffle
  * the aggregated contributions in the steady round?
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (_, edges, nodes) = graft.queries.Curation.prGraphEdges(spark, sfDir)
    val k = graft.Loop.statePartitions(edges)
    println(s"== statePartitions(edges) = $k")
    val edeg = graft.queries.Curation.withOutdeg(edges, k).persist(MEMORY_AND_DISK)
    graft.Tables.touch(edeg)
    println(s"== edeg.rdd.getNumPartitions = ${edeg.rdd.getNumPartitions}")
    println(s"== edeg cache executedPlan outputPartitioning = " +
      edeg.queryExecution.executedPlan.outputPartitioning)
    val pr0 = graft.queries.Curation.prIterateInitCk(
      nodes.select(col("id"), lit(1000000000L).as("pr")),
      edeg.rdd.getNumPartitions)
    println("== pr0 " + org.apache.spark.sql.GraftPlanStats.describeCk(pr0))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println("== round-1 plan under AQE-off (what ckSumPartitioned executes):")
    val r1 = graft.queries.Curation.prRound(edeg, pr0)
      .queryExecution.executedPlan
    println(r1.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Scan") || l.contains("Aggregate") || l.contains("Sort"))
      .mkString("\n"))
    println("== node partitionings:")
    r1.collect { case p =>
      println(s"  ${p.nodeName}: ${p.outputPartitioning} " +
        s"[np=${p.outputPartitioning.numPartitions}]")
    }
    // minimal repro: are two 1-partition key-partitioned checkpoints
    // join-compatible without an exchange?
    val ta = graft.Loop.ckPartitioned(spark.range(100)
      .select(col("id"), (col("id") * 2).as("v")).repartition(1, col("id")))
    val tb = graft.Loop.ckPartitioned(spark.range(100)
      .select(col("id").as("dst"), (col("id") * 3).as("w"))
      .repartition(1, col("dst")))
    println("== ta " + org.apache.spark.sql.GraftPlanStats.describeCk(ta))
    println("== 1-part ck join plan (AQE off):")
    println(ta.join(tb, ta("id") === tb("dst"), "left")
      .queryExecution.executedPlan.toString)
    println("== 1-part ck SMJ plan (AQE off, broadcast disabled):")
    val thrPrev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println(ta.join(tb, ta("id") === tb("dst"), "left")
      .queryExecution.executedPlan.toString)
    // and the 2-partition co-partitioned variant
    val ta2 = graft.Loop.ckPartitioned(spark.range(100)
      .select(col("id"), (col("id") * 2).as("v")).repartition(2, col("id")))
    val tb2 = graft.Loop.ckPartitioned(spark.range(100)
      .select(col("id").as("dst"), (col("id") * 3).as("w"))
      .repartition(2, col("dst")))
    println("== ta2 " + org.apache.spark.sql.GraftPlanStats.describeCk(ta2))
    println("== 2-part ck SMJ plan (AQE off, broadcast disabled):")
    println(ta2.join(tb2, ta2("id") === tb2("dst"), "left")
      .queryExecution.executedPlan.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thrPrev)
    // agg-shaped repro: SMJ whose right side is an aggregate over the
    // 1-partition cache (no broadcast join inside)
    println("== agg-shaped SMJ (left 1-part ck, right agg over cache):")
    val aggR = edeg.groupBy(col("dst")).agg(sum(col("outdeg")).as("sc"))
    println(ta.join(aggR, ta("id") === aggR("dst"), "left")
      .queryExecution.executedPlan.toString)
    // and with the broadcast join inside (the full prRound right side)
    println("== prRound-shaped SMJ (right = cache BHJ broadcast(ta) + agg):")
    val contribR = edeg
      .join(broadcast(ta.select(col("id"), col("v"))), col("src") === col("id"))
      .groupBy(col("dst")).agg(sum(col("v")).as("sc"))
    val lhs = ta.select(col("id").as("lid"), col("v").as("old"))
    println(lhs.join(contribR, col("lid") === col("dst"), "left")
      .queryExecution.executedPlan.toString)
    println("== same with maxSinglePartitionBytes=100g (SPARK-41986 test):")
    spark.conf.set("spark.sql.maxSinglePartitionBytes", "100g")
    println(lhs.join(contribR, col("lid") === col("dst"), "left")
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Scan ExistingRDD") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.conf.set("spark.sql.maxSinglePartitionBytes", "128m")
    println("== contribR estimated size: " +
      contribR.queryExecution.optimizedPlan.stats.sizeInBytes)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val (ck1, _) = graft.Loop.ckSumPartitioned(
      graft.queries.Curation.prRound(edeg, pr0), col("mv"))
    println("== ck1 " + org.apache.spark.sql.GraftPlanStats.describeCk(ck1))
    val pr1 = ck1.select(col("id"), col("pr"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan2 = graft.queries.Curation.prRound(edeg, pr1)
      .queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println(s"== steady-round Exchange lines: " +
      plan2.linesIterator.count(_.trim.startsWith("+- Exchange") ||
        plan2.linesIterator.isEmpty))
    println(plan2.linesIterator.filter(l => l.contains("Exchange") ||
      l.contains("SortMergeJoin") || l.contains("Sort ") ||
      l.contains("Scan ExistingRDD") || l.contains("HashAggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
