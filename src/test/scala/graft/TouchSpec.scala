package graft

/** Tables.touch is the eager-materialization primitive every
  * persist()-then-fan-out query relies on (Dedup.q25's race note).
  * Pin its contract: after touch, EVERY partition of the persisted
  * frame is cached — a lazy drain (e.g. creating but not consuming
  * the iterator) would leave partitions uncached and reintroduce the
  * compute-and-cache race downstream.
  */
class TouchSpec extends SparkSpec {

  test("touch fully populates a persisted frame's cache in one pass") {
    val df = spark.range(0, 50000, 1, 6)
      .selectExpr("id", "id * 2 as v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Tables.touch(df)
      val infos = spark.sparkContext.getRDDStorageInfo
      assert(infos.nonEmpty, "no RDD storage info after touch")
      val full = infos.exists(i =>
        i.numCachedPartitions == i.numPartitions && i.numPartitions > 0)
      assert(full, infos.map(i =>
        s"${i.name}: ${i.numCachedPartitions}/${i.numPartitions}").mkString("; "))
      // and the cached frame still answers correctly
      assert(df.selectExpr("sum(v)").head().getLong(0) == 49999L * 50000L)
    } finally df.unpersist(blocking = true)
  }
}
