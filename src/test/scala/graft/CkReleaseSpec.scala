package graft

import org.apache.spark.sql.functions._

/** Deterministic checkpoint-block release (`Ck.release`): the
  * round-6 bench showed loop queries slowing down monotonically
  * across runs in one JVM (q163 k-means 5.3 s -> 7.3 s -> 19.6 s)
  * because every superseded per-round `localCheckpoint` stayed
  * pinned in the BlockManager until an eventual GC. These tests pin
  * the fix: a loop leaves at most its RETURNED frame behind, so run
  * N of a loop query starts from the same persisted-RDD population
  * as run 1.
  */
class CkReleaseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Persistent-RDD ids right now (localCheckpoint blocks live here,
    * invisible to spark.catalog). */
  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release() drops a checkpoint's blocks; lazy frames are a no-op") {
    val before = persisted
    val ck = spark.range(1000).select(col("id"), (col("id") * 2).as("v"))
      .localCheckpoint(true)
    val added = persisted -- before
    assert(added.nonEmpty, "eager localCheckpoint must register blocks")
    // a projection of the checkpoint shares its backing RDD — release
    // through the projection, as the loops do
    Ck.release(ck.select(col("id")))
    assert(persisted == before, "release must drop exactly the new blocks")
    // a plain lazy plan has no LogicalRDD: release is a safe no-op
    Ck.release(spark.range(10).filter(col("id") > 3))
    assert(persisted == before)
  }

  test("cc loop: leaves only the returned frame's blocks behind") {
    spark.catalog.clearCache()
    val before = persisted
    val (labels, _) = graft.queries.Mining.ccLoop(spark, dir)
    labels.count() // a consumer materializes the result...
    // catalog-managed persists (graphEv's shared event cache) are the
    // harness's clearCache() job — this spec pins CHECKPOINT hygiene,
    // the blocks clearCache() cannot see
    spark.catalog.clearCache()
    val leftover = persisted -- before
    // ...and the loop has already released every superseded round:
    // at most the one checkpoint backing `labels` survives
    assert(leftover.size <= 1,
      s"cc loop leaked ${leftover.size} persisted RDDs (want <= 1)")
    Ck.release(labels)
    assert(persisted == before, "releasing the returned frame must zero the loop")
  }

  test("loop runs do not accumulate: run N == run 1 persisted population") {
    def runOnce(): Set[Int] = {
      val (labels, _) = graft.queries.Mining.ccLoop(spark, dir)
      labels.count()
      Ck.release(labels)
      spark.catalog.clearCache()
      persisted
    }
    val p1 = runOnce()
    val p2 = runOnce()
    val p3 = runOnce()
    assert(p2.size == p1.size && p3.size == p1.size,
      s"persisted-RDD population grew across runs: ${p1.size}/${p2.size}/${p3.size}")
  }

  test("q163 k-means converge: leaves ZERO checkpoint blocks behind") {
    spark.catalog.clearCache()
    val before = persisted
    // the census is collected driver-side and the output rebuilt from
    // driver rows, so the full query can be block-clean
    val out = graft.queries.Vectors.q163KmeansConverge(spark, dir)
    out.count()
    spark.catalog.clearCache()
    assert(persisted == before,
      s"q163 leaked ${(persisted -- before).size} persisted RDDs (want 0)")
  }

  test("q222 semdedup: leaves only the returned census behind") {
    spark.catalog.clearCache()
    val before = persisted
    // semDedup materializes kept + census checkpoints and releases
    // everything internal (assignment/pair persists, cc labels);
    // q222 releases kept immediately, so at most the census's one
    // checkpoint survives the run
    val out = graft.queries.Vectors.q222SemDedup(spark, dir)
    out.count()
    spark.catalog.clearCache()
    val leftover = persisted -- before
    assert(leftover.size <= 1,
      s"q222 leaked ${leftover.size} persisted RDDs (want <= 1)")
    Ck.release(out)
    assert(persisted == before,
      "releasing the census must zero the query")
  }

  test("bfs loop: immediate-exhaustion path keeps the seed frame readable") {
    // ops.bfsDistances with seeds whose neighbors are all seeds too:
    // hop 1 finds nothing fresh, the loop exhausts immediately, and
    // the dist join must still read the seed checkpoint (the
    // `expanded` guard in the release path)
    val edges = spark.range(6).select(col("id").as("src"),
      ((col("id") + 1) % 6).as("dst"))
    val (dist, hops) = graft.api.ops.bfsDistances(
      edges, "src", "dst", _ => lit(true))
    assert(hops == 1)
    assert(dist.filter(col("dist") === 0L).count() == 6)
  }

  test("scc loop: nested trim/color/collect rounds all release their blocks") {
    spark.catalog.clearCache()
    val before = persisted
    val (labels, _) = graft.queries.Mining.sccAssign(
      graft.queries.Mining.dirEdges(spark, dir))
    labels.count()
    spark.catalog.clearCache() // graphEv's catalog-managed cache
    val leftover = persisted -- before
    // three nested inner loops per outer round — only the returned
    // assignment frame may survive
    assert(leftover.size <= 1,
      s"scc loop leaked ${leftover.size} persisted RDDs (want <= 1)")
    Ck.release(labels)
    assert(persisted == before, "releasing the returned frame must zero the loop")
  }
}
