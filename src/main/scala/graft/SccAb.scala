package graft

import org.apache.spark.sql.functions._

import graft.api.ops

/** Dev harness for the SCC collect-phase freeze heuristic (round-13
  * verdict item 4): runs ONLY ScaleProbe's realistic scc leg (and
  * optionally the giant-ring leg) at one replication factor, so a
  * freeze-heuristic iteration costs one leg, not a full three-scale
  * probe. Prints outer rounds, collect depth (bw), the freeze round
  * (bail_at, -1 = never fired), wall, and the SCC census size — the
  * exact numbers SCALE_PROBE.json records for the leg.
  * runMain graft.SccAb <sfDir> <m> [ring]
  */
object SccAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val m = args(1).toInt
    val base = graft.queries.Mining.sparseUnd(spark, args(0))
      .localCheckpoint(true)
    val n = ScaleProbe.stride(base)
    val mod = ScaleProbe.anchorMod(base)
    val edges = ScaleProbe.replicate(spark, base, m, n, mod)
      .localCheckpoint(true)
    if (args.length > 2 && args(2) == "ring") {
      val nodeSet = edges.select(col("a").as("x"))
        .unionByName(edges.select(col("b").as("x"))).distinct()
      val mn = nodeSet.agg(min(col("x")).as("mn"))
      val wAll = org.apache.spark.sql.expressions.Window.orderBy("x")
      val ring = nodeSet
        .withColumn("nxt", lead(col("x"), 1).over(wAll))
        .crossJoin(broadcast(mn))
        .select(col("x").as("src"), coalesce(col("nxt"), col("mn")).as("dst"))
        .localCheckpoint(true)
      LoopStats.drain()
      val t0 = System.nanoTime()
      val lbl = ops.scc(ring, "src", "dst")
      val nScc = lbl.select(col("scc")).distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      val st = LoopStats.drain()
      println(f"[sccab] ring m=$m outer=${st.getOrElse("scc", -1L)} " +
        f"bw=${st.getOrElse("scc_bw", -1L)} bail_at=${st.getOrElse("scc_bail_at", -1L)} " +
        f"wall=$dt%.1fs n_sccs=$nScc")
      graft.Ck.release(lbl)
    } else {
      val dirE = edges.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(edges.filter((col("a") + col("b")) % 3 === 0L &&
            col("b") - col("a") < n)
          .select(col("b").as("src"), col("a").as("dst")))
        .distinct().localCheckpoint(true)
      LoopStats.drain()
      val t0 = System.nanoTime()
      val lbl = ops.scc(dirE, "src", "dst")
      val nScc = lbl.select(col("scc")).distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      val st = LoopStats.drain()
      println(f"[sccab] scc m=$m outer=${st.getOrElse("scc", -1L)} " +
        f"bw=${st.getOrElse("scc_bw", -1L)} bail_at=${st.getOrElse("scc_bail_at", -1L)} " +
        f"wall=$dt%.1fs n_sccs=$nScc")
      graft.Ck.release(lbl)
    }
    spark.stop()
  }
}
