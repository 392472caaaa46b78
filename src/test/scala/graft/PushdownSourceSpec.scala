package graft

import org.apache.spark.sql.functions._

import graft.sources.PushdownSensorSource

/** The DSv2 pushdown contract: shard predicates prune whole input
  * partitions before planning, column pruning reaches the reader, and
  * results stay correct because every pushed filter is re-checked by
  * the engine (residual semantics, like parquet row-group skipping).
  */
class PushdownSourceSpec extends SparkSpec {

  private def src = spark.read
    .format("graft.sources.PushdownSensorProvider")
    .option("sensors", "8").option("readings", "50").load()

  test("sensorID equality prunes to a single input partition") {
    val df = src.filter(col("sensorID") === 2)
    assert(df.count() === 50)
    assert(PushdownSensorSource.lastPlannedPartitions.get() === 1)
    // the pushed filter is visible in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedSensorFilters"), plan)
  }

  test("range and IN predicates prune partitions; residual keeps rows exact") {
    val range = src.filter(col("sensorID") >= 5)
    assert(range.count() === 3 * 50)
    assert(PushdownSensorSource.lastPlannedPartitions.get() === 3)

    val in = src.filter(col("sensorID").isin(1, 4))
    assert(in.count() === 2 * 50)
    assert(PushdownSensorSource.lastPlannedPartitions.get() === 2)
  }

  test("non-shard predicates are not pushed and stay correct") {
    val df = src.filter(col("temperature") > 60.0 && col("sensorID") === 7)
    // sensorID pushes (1 partition); temperature is engine-side only
    val n = df.count()
    assert(PushdownSensorSource.lastPlannedPartitions.get() === 1)
    // sensor 7 starts at 42+7=49 and steps 0.8: readings above 60 are
    // those with 49 + 0.8*i > 60 => i >= 14; i runs 1..50 => 37 rows
    assert(n === 37)
  }

  test("column pruning reaches the reader schema") {
    val df = src.select(sum(col("seq")))
    assert(df.collect().head.getLong(0) === 8L * (50L * 51 / 2))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadColumns: [seq]"), scan)
  }

  test("pruned multi-column projection preserves column order semantics") {
    val rows = src.filter(col("sensorID") === 3)
      .select(col("temperature"), col("seq"))
      .orderBy(col("seq")).limit(2).collect()
    assert(rows(0).getDouble(0) === 42.0 + 3 + 0.8)
    assert(rows(0).getLong(1) === 1L)
    assert(rows(1).getLong(1) === 2L)
  }
}
