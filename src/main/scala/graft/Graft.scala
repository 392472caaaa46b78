package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library facade — what a user of the reference would actually
  * call after switching: one entry point that registers the full
  * table catalog as temp views (nanos-safe `events` included) plus
  * the graft SQL function surface (array_dot, simhash60, minhash_sig,
  * bloom_build/bloom_might_contain), after which plain `spark.sql`
  * runs the whole operator surface; `query` exposes the named
  * pre-built pipelines.
  */
object Graft {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every testdata table as a temp view and install the SQL
    * functions into this session. Idempotent.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      // the dedicated loaders, not raw table(): `events` normalizes
      // both shipped ts shapes, `documents`/`embeddings` spread the
      // single-row-group files across cores — a SQL user's view must
      // plan exactly like the DataFrame queries (SqlSurfaceSpec pins
      // this via optimizedPlan.sameResult)
      val df = t match {
        case "events" => Tables.events(spark, dir)
        case "documents" => Tables.documents(spark, dir)
        case "embeddings" => Tables.embeddings(spark, dir)
        case _ => Tables.table(spark, dir, t)
      }
      df.createOrReplaceTempView(t)
    }
    graft.functions.GraftFunctions.ensureRegistered(spark)
  }

  /** Run a named pre-built pipeline (a `SparkEntry.queries` key). */
  def query(spark: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
