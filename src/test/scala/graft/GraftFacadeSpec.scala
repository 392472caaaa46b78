package graft

/** The user-facing facade: register once, then plain SQL over the
  * catalog plus the graft function surface.
  */
class GraftFacadeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("register exposes all tables and functions to plain SQL") {
    Graft.register(spark, dir)
    // every table is queryable
    Graft.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) > 0, t)
    }
    // events view carries the truncated-µs timestamp, not raw nanos
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema.head
      .dataType.typeName == "timestamp")
    // the SQL function surface works end-to-end in one statement
    val r = spark.sql(
      """SELECT lang, COUNT(DISTINCT simhash60(text)) AS n_sigs,
        |  COUNT(DISTINCT minhash_sig(text)[0]) AS n_m0
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin).collect()
    assert(r.length == 5 && r.forall(_.getLong(1) > 0))
    val dotOk = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(dotOk == 11.0)
  }

  test("query runs named pipelines through the facade") {
    val df = Graft.query(spark, dir, "q01_pricing_summary")
    assert(df.count() > 0)
  }
}
