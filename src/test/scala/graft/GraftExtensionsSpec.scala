package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayDotProduct

/** The SparkSessionExtensions install path: SQL function registration
  * and the HOF-to-native optimizer rewrite.
  */
/** The extensions-enabled session, shared with other suites that
  * need the optimizer rules installed (SetCardExpressionSpec).
  */
object GraftExtensionsSpec {
  lazy val extSession: SparkSession = {
    // force a fresh session (getOrCreate would return the shared one
    // and static spark.sql.extensions would be ignored)
    SparkSpec.session // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions (not the spark.sql.extensions conf): the static
    // conf is read from the already-created SparkContext, so only the
    // programmatic path works for a second session in one JVM
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(SparkSpec.session)
    SparkSession.setActiveSession(SparkSpec.session)
    s
  }
}

class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val extSpark: SparkSession = GraftExtensionsSpec.extSession

  test("array_dot is callable from SQL") {
    val r = extSpark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("optimizer rewrites aggregate(zip_with(a,b,*)) into ArrayDotProduct") {
    val df = extSpark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v) AS d
        |FROM (SELECT array(CAST(id AS DOUBLE), 2.0D) AS a, array(3.0D, 4.0D) AS b
        |      FROM range(3))""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan
    val rewritten = optimized.expressions.exists(_.exists {
      case _: ArrayDotProduct => true
      case _ => false
    })
    assert(rewritten, s"expected ArrayDotProduct in:\n$optimized")
    // rows: id=0 -> 0*3+2*4=8, id=1 -> 11, id=2 -> 14
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(8.0, 11.0, 14.0))
  }

  test("bloom filter pre-pass: build from small side, filter the big side") {
    extSpark.range(20000).createOrReplaceTempView("big")
    extSpark.range(100).selectExpr("id * 37 AS key")
      .createOrReplaceTempView("small")
    val filtered = extSpark.sql(
      """SELECT count(*) AS n FROM big
        |WHERE bloom_might_contain(
        |  (SELECT bloom_build(xxhash64(key)) FROM small),
        |  xxhash64(id))""".stripMargin).collect().head.getLong(0)
    // the filter passes every true member (100 keys * 37 < 20000 are
    // only 100/3700... keys 0,37,...,3663 => 100 members in range? no:
    // 37*99 = 3663 < 20000, so all 100 are present) plus possible
    // false positives — never fewer than the true matches
    assert(filtered >= 100)
    // false-positive rate stays tiny at default sizing
    assert(filtered < 300, s"suspiciously many bloom hits: $filtered")
  }

  test("the rewrite leaves non-matching aggregates alone") {
    val df = extSpark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x + y), 0.0D, (s, v) -> s + v) AS d
        |FROM (SELECT array(CAST(id AS DOUBLE), 2.0D) AS a, array(3.0D, 4.0D) AS b
        |      FROM range(1))""".stripMargin)
    val rewritten = df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: ArrayDotProduct => true
      case _ => false
    })
    assert(!rewritten)
    assert(df.collect().head.getDouble(0) == 9.0)
  }
}
