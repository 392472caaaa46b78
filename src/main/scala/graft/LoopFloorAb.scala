package graft

import org.apache.spark.sql.SparkSession

/** Dev A/B: per-round floor of the convergence loops with AQE on vs
  * off (the round-11 floor question: rounds are now halved, so the
  * residual wall is rounds x per-job floor — is adaptive re-planning
  * part of that floor, or does its partition coalescing pay for
  * itself on the tiny round frames?). runMain graft.LoopFloorAb <sfDir>
  */
object LoopFloorAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[floor] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    (1 to 3).foreach { rep =>
      Seq("true", "false").foreach { aqe =>
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        time(s"rep$rep aqe=$aqe cc   ") {
          val (l, _) = graft.queries.Mining.ccLoop(spark, dir)
          graft.Ck.release(l); clear()
        }
        time(s"rep$rep aqe=$aqe pr   ") {
          val (l, _) = graft.queries.Curation.prLoop(spark, dir)
          graft.Ck.release(l); clear()
        }
        time(s"rep$rep aqe=$aqe bfs  ") {
          val (l, _) = graft.queries.Mining.bfsLoop(spark, dir)
          graft.Ck.release(l); clear()
        }
      }
    }
    spark.stop()
  }
}
