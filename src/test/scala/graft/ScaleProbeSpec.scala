package graft

import org.apache.spark.sql.functions._

import graft.api.ops

/** The scale-probe machinery must produce graphs whose loop depth
  * actually grows with the scale factor — chain replication, not
  * disjoint copies (disjoint copies leave every round count flat and
  * the probe would prove nothing).
  */
class ScaleProbeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("replicate chains replicas: counts add up and bridges merge components") {
    val base = graft.queries.Mining.sparseUnd(spark, dir)
      .localCheckpoint(true)
    val n = ScaleProbe.stride(base)
    val mod = ScaleProbe.anchorMod(base)
    val nodes = base.select(col("a").as("x"))
      .unionByName(base.select(col("b").as("x"))).distinct()
    val nBridge = nodes.filter(col("x") % mod === 0L).count()
    assert(nBridge > 0, "anchorMod must yield bridge anchors")

    val m1 = ScaleProbe.replicate(spark, base, 1, n, mod)
    assert(m1.count() === base.count(), "m=1 adds nothing")

    val m2 = ScaleProbe.replicate(spark, base, 2, n, mod).localCheckpoint(true)
    assert(m2.count() === 2 * base.count() + nBridge)

    // every bridge anchor x shares a component with its shifted twin
    val (labels, _) = ops.connectedComponents(m2, "a", "b")
    val lbl = labels.select(col("id"), col("component"))
    val unmatched = lbl.filter(col("id") % mod === 0L && col("id") < n)
      .select(col("id"), col("component").as("c0"))
      .join(lbl.select((col("id") - n).as("id"), col("component").as("c1")),
        "id")
      .filter(col("c0") =!= col("c1"))
    assert(unmatched.isEmpty, "bridged replicas must merge components")
  }

  test("BFS hop count grows with the replica chain (seeds in replica 0 only)") {
    val base = graft.queries.Mining.sparseUnd(spark, dir)
      .localCheckpoint(true)
    val n = ScaleProbe.stride(base)
    val mod = ScaleProbe.anchorMod(base)
    def hops(m: Int): Int = {
      val edges = ScaleProbe.replicate(spark, base, m, n, mod)
      ops.bfsDistances(edges, "a", "b",
        c => c < lit(n) && c % mod === 0L)._2
    }
    val h1 = hops(1)
    val h3 = hops(3)
    assert(h3 > h1, s"chained replicas must deepen BFS: m=1 -> $h1, m=3 -> $h3")
  }
}
