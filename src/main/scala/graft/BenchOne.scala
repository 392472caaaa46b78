package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time one query N times. runMain graft.BenchOne <sfDir> <name> [n] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val n = if (args.length > 2) args(2).toInt else 2
    (1 to n).foreach { i =>
      LoopStats.drain()
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(args(1))(spark, args(0)).count()
      val loops = LoopStats.drain().toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      println(f"[b1] ${args(1)} run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c $loops")
      spark.catalog.clearCache() // drop per-query persist()s between runs
      spark.sparkContext.getPersistentRDDs.values // + checkpoint blocks
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
