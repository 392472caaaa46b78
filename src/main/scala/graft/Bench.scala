package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer init lands here, not in the
    // first timed query
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    // sorted key order: a deterministic run sequence makes per-round
    // per-query deltas comparable (Map order varies with hashing).
    // min of two runs: a single sample in a 59-query session is
    // occasionally inflated 3-5x by one-off scheduler/GC artifacts
    // (observed on the cached self-join queries); the min is the
    // reproducible steady-state cost of the plan.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a query that throws records the sentinel -1, never its
      // time-to-failure — a crash must not masquerade as a fast run
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // release per-query persist()s (q23/q25/q42) — they never help
        // a different query and would accumulate for the session
        spark.catalog.clearCache()
        if (ok) dt else -1.0
      }
      val (a, b) = (once(), once())
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedField =
      if (failed.isEmpty) "" else s""","failed":${failed.mkString("[", ",", "]")}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failedField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
