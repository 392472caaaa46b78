package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B harness (round-11 verdict item 1): label-propagation cc
  * (the RETIRED pre-r11 engine, carried here verbatim so the A/B
  * stays re-runnable after ops switched to star contraction) vs
  * two-phase large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") on the real q161/q217
  * graphs. Measures wall + round counts and asserts identical
  * labelings. runMain graft.CcAb <sfDir> [reps]
  */
object CcAb {

  // ---- the retired engine: min-label propagation + pointer jump ----
  // (verbatim r10 ops.ccCore/ccNbrs/ccWarmInit, kept ONLY here as
  // the A/B baseline — production is ops.star2Round)

  private def lpNbrs(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(col(src).as("__node"), col(dst).as("__nbr"))
      .unionByName(edges.select(col(dst).as("__node"), col(src).as("__nbr")))
      .filter(col("__node") =!= col("__nbr"))

  private def lpCore(nbrs: DataFrame, init: DataFrame, maxRounds: Int = 50)
    : (DataFrame, Seq[(Long, Long)]) = {
    var labels = init
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val nbrMin = nbrs
        .join(labels.select(col("__node").as("__nbr"), col("__lbl").as("__nlbl")),
          "__nbr")
        .groupBy(col("__node")).agg(min(col("__nlbl")).as("__nmin"))
      val l1 = labels.join(nbrMin, Seq("__node"), "left")
        .select(col("__node"), col("__lbl"),
          least(col("__lbl"), coalesce(col("__nmin"), col("__lbl"))).as("__l1"))
      val (stepped, mv) = graft.Loop.ckCount(
        l1.join(l1.select(col("__node").as("__t"), col("__l1").as("__tl")),
            col("__l1") === col("__t"))
          .select(col("__node"), col("__lbl").as("__old"),
            col("__tl").as("__lbl")),
        col("__old") =!= col("__lbl"))
      converged = mv == 0L
      curve += ((rounds.toLong, mv))
      graft.Ck.release(labels)
      labels = stepped.select(col("__node"), col("__lbl"))
    }
    nbrs.unpersist(blocking = false)
    if (!converged) graft.Ck.release(labels)
    require(converged, s"label-prop cc did not converge in $maxRounds rounds")
    (labels.select(col("__node").as("id"), col("__lbl").as("component")),
      curve.toSeq)
  }

  /** Retired cold engine: (labels, movement curve). */
  def labelPropCc(edges: DataFrame, src: String, dst: String)
    : (DataFrame, Seq[(Long, Long)]) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val nbrs = lpNbrs(edges, src, dst).persist(MEMORY_AND_DISK)
    val init = org.apache.spark.sql.GraftPlanStats.withMeasuredStats(
      nbrs.select(col("__node")).distinct()
        .select(col("__node"), col("__node").as("__lbl"))
        .localCheckpoint(true))
    lpCore(nbrs, init)
  }

  /** Retired warm engine: kept-label init, affected re-seeded. */
  def labelPropCcWarm(prevLabels: DataFrame, edges: DataFrame,
      affected: DataFrame, src: String, dst: String)
    : (DataFrame, Seq[(Long, Long)]) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val nbrs = lpNbrs(edges, src, dst).persist(MEMORY_AND_DISK)
    val init = org.apache.spark.sql.GraftPlanStats.withMeasuredStats(
      nbrs.select(col("__node")).distinct()
        .join(prevLabels.select(col("id").as("__node"), col("component")),
          Seq("__node"), "left")
        .join(broadcast(affected.withColumn("__aff", lit(1L))),
          Seq("component"), "left")
        .select(col("__node"),
          when(col("component").isNull || col("__aff").isNotNull, col("__node"))
            .otherwise(col("component")).as("__lbl"))
        .localCheckpoint(true))
    lpCore(nbrs, init)
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
        val (l, c) = labelPropCc(und, "a", "b")
        (l.localCheckpoint(true), c)
      }
      val (l2, c2) = time("star2     cold") {
        val (l, c) = graft.api.ops.connectedComponentsCurve(und, "a", "b")
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
      // labelprop warm (the retired engine's warm form)
      val (lab0, _) = graft.api.ops.connectedComponentsCurve(und, "a", "b")
      val (w1, wc1) = time("labelprop warm") {
        val aff0 = graft.api.ops.ccAffected(lab0, dels, "a", "b")
        val (l, c) = labelPropCcWarm(lab0, und1, aff0, "a", "b")
        (l.localCheckpoint(true), c)
      }
      // star2 warm: the shipped production path
      val (w2, wc2) = time("star2     warm") {
        val (l, c) = graft.api.ops.incrementalConnectedComponents(
          lab0, und1, dels, "a", "b")
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
