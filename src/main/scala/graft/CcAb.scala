package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B harness (round-11 verdict item 1): label-propagation cc
  * (the shipped ops.ccCore) vs two-phase large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * on the real q161/q217 graphs. Measures wall + round counts and
  * asserts identical labelings. runMain graft.CcAb <sfDir> [reps]
  */
object CcAb {

  /** One large-star + small-star alternation over a canonical
    * (a < b, distinct) edge frame. Returns (a, b, chg) — the next
    * canonical edge set with a conservative per-group changed flag:
    * zero chg rows <=> the edge set is a stable star forest.
    */
  def star2Round(e: DataFrame): DataFrame = {
    val nbr = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    // large-star: every larger neighbor v of u connects to
    // m = min(N(u) + {u}); changed iff m != u
    val large = nbr.join(mins, "u").filter(col("v") > col("u"))
      .select(col("m").as("a"), col("v").as("b"),
        (col("m") =!= col("u")).as("c"))
      .groupBy(col("a"), col("b")).agg(max(col("c")).as("cl"))
    // small-star: per larger endpoint b, all smaller partners (and b
    // itself) connect to the smallest partner m; changed iff the
    // group had >1 partner, OR any consumed edge carried a
    // large-phase flag (so a large-star rewrite is never lost)
    val g = large.groupBy(col("b"))
      .agg(min(col("a")).as("m"), max(col("cl")).as("mc"),
        count(lit(1)).as("cnt"))
      .select(col("b"), col("m"), (col("mc") || (col("cnt") > 1L)).as("gc"))
    val rewired = large.join(g, "b")
      .filter(col("a") =!= col("m"))
      .select(col("m").as("sa"), col("a").as("sb"), col("gc"))
    val selfE = g.select(col("m").as("sa"), col("b").as("sb"), col("gc"))
    rewired.unionByName(selfE)
      .groupBy(col("sa"), col("sb")).agg(max(col("gc")).as("chg"))
      .select(col("sa").as("a"), col("sb").as("b"), col("chg"))
  }

  /** Two-phase cc to fixpoint over raw (src, dst) edges. Returns
    * ((id, component), movement curve).
    */
  def star2Cc(edges: DataFrame, src: String, dst: String,
      labelEdges: Option[DataFrame] = None, maxRounds: Int = 50)
    : (DataFrame, Seq[(Long, Long)]) = {
    val canon = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
    val nodes = canon.select(col("a").as("__node"))
      .unionByName(canon.select(col("b").as("__node"))).distinct()
      .localCheckpoint(true)
    val e0 = labelEdges.fold(canon)(le => canon.unionByName(
        le.select(col("a"), col("b")))).distinct()
    var e = org.apache.spark.sql.GraftPlanStats.withMeasuredStats(
      e0.localCheckpoint(true))
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val (next, mv) = graft.Loop.ckCount(star2Round(e), col("chg"))
      converged = mv == 0L
      curve += ((rounds.toLong, mv))
      graft.Ck.release(e)
      e = next.select(col("a"), col("b"))
    }
    require(converged, s"star2Cc did not converge in $maxRounds rounds")
    val labels = nodes
      .join(e.select(col("b").as("__node"), col("a").as("__c")),
        Seq("__node"), "left")
      .select(col("__node").as("id"),
        coalesce(col("__c"), col("__node")).as("component"))
    (labels, curve.toSeq)
  }

  private def labelSig(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(expr("id * 1000003 + component")))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    spark.range(1000000).selectExpr("sum(id)").collect()

    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ab] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"== rep $rep ==")
      // ---- q161 cold graph ----
      val und = graft.queries.Mining.sparseUnd(spark, dir)
        .persist(MEMORY_AND_DISK)
      und.count()
      val (l1, c1) = time("labelprop cold") {
        val (l, c) = graft.api.ops.connectedComponentsCurve(und, "a", "b")
        (l.localCheckpoint(true), c)
      }
      val (l2, c2) = time("star2     cold") {
        val (l, c) = star2Cc(und, "a", "b")
        (l.localCheckpoint(true), c)
      }
      println(s"[ab] rounds labelprop=${c1.length} star2=${c2.length}")
      val (n1, s1) = labelSig(l1); val (n2, s2) = labelSig(l2)
      require(n1 == n2 && s1 == s2, s"labels diverge: ($n1,$s1) vs ($n2,$s2)")
      graft.Ck.release(l1)

      // ---- q217 warm phase ----
      val dels = und.filter((col("a") * 7L + col("b") * 11L) % 61L === 0L)
      val ins = graft.queries.Mining.undFamily(spark, dir, 37L, 512L)
      val und1 = und.join(dels, Seq("a", "b"), "left_anti")
        .unionByName(ins).distinct().persist(MEMORY_AND_DISK)
      und1.count()
      // labelprop warm (shipped form)
      val (lab0, _) = graft.api.ops.connectedComponentsCurve(und, "a", "b")
      val (w1, wc1) = time("labelprop warm") {
        val (l, c) = graft.api.ops.incrementalConnectedComponents(
          lab0, und1, dels, "a", "b")
        (l.localCheckpoint(true), c)
      }
      // star2 warm: kept labels as shortcut edges
      val (w2, wc2) = time("star2     warm") {
        val aff = graft.api.ops.ccAffected(lab0, dels, "a", "b")
        val nodes1 = und1.select(col("a").as("id"))
          .unionByName(und1.select(col("b").as("id"))).distinct()
        val le = nodes1.join(lab0, Seq("id"), "inner")
          .join(broadcast(aff.withColumn("__aff", lit(1L))),
            Seq("component"), "left")
          .filter(col("__aff").isNull && col("component") =!= col("id"))
          .select(col("component").as("a"), col("id").as("b"))
        val (l, c) = star2Cc(und1, "a", "b", labelEdges = Some(le))
        (l.localCheckpoint(true), c)
      }
      println(s"[ab] warm rounds labelprop=${wc1.length} star2=${wc2.length}")
      val (wn1, ws1) = labelSig(w1); val (wn2, ws2) = labelSig(w2)
      require(wn1 == wn2 && ws1 == ws2,
        s"warm labels diverge: ($wn1,$ws1) vs ($wn2,$ws2)")
      Seq(w1, w2, l2, lab0).foreach(graft.Ck.release)
      und.unpersist(blocking = false); und1.unpersist(blocking = false)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
