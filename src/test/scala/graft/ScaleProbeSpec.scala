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

  test("replicateDocs: within-replica dup structure preserved, zero cross-replica pairs") {
    val s = spark
    import s.implicits._
    // three identical docs: one 3-clique of near-dup pairs per replica
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg"),
      (1L, "aa bb cc dd ee ff gg"),
      (2L, "aa bb cc dd ee ff gg")).toDF("doc_id", "text")
    val m1 = ScaleProbe.replicateDocs(spark, docs, 1, 3L)
    assert(m1.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet,
      "m=1 must be the identity")
    val m2 = ScaleProbe.replicateDocs(spark, docs, 2, 3L)
      .localCheckpoint(true)
    assert(m2.count() == 6)
    val pairs = ops.nearDupPairs(m2, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both replica cliques intact (pair counts scale LINEARLY)...
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L)), pairs.toString)
    // ...and in particular no pair spans replicas, though the
    // original texts are byte-identical — the salt did its job
    assert(!pairs.exists(p => p._1 < 3L && p._2 >= 3L))
    Ck.release(m2)
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
