package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Operational metrics via the Observation API — the 100-TB way to
  * answer "how many rows did this gate drop" WITHOUT a second pass:
  * `observe` attaches accumulator-backed aggregates to a point in the
  * plan, collected as a side effect of the one job that runs anyway
  * (vs. a separate count() that re-reads the source).
  */
class ObservationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("observe reports gate selectivity from the single pipeline job") {
    val in = new Observation("in")
    val out = new Observation("out")
    val docs = Tables.documents(spark, dir)
      .observe(in, count(lit(1)).as("rows"), sum(col("n_chars")).as("chars"))
      .filter(col("n_chars") >= 200)
      .observe(out, count(lit(1)).as("rows"), sum(col("n_chars")).as("chars"))
    val kept = docs.count() // the ONLY job; both observations ride it

    val rowsIn = in.get("rows").asInstanceOf[Long]
    val rowsOut = out.get("rows").asInstanceOf[Long]
    assert(rowsIn === 500) // sf0.001 documents
    assert(rowsOut === kept)
    assert(rowsOut < rowsIn, s"gate dropped nothing: $rowsOut of $rowsIn")
    // chars metric is consistent with the rows that passed
    val charsOut = out.get("chars").asInstanceOf[Long]
    val expected = Tables.documents(spark, dir)
      .filter(col("n_chars") >= 200)
      .agg(sum(col("n_chars"))).head.getLong(0)
    assert(charsOut === expected)
  }

  test("observed metrics match a recomputation on a quality pipeline") {
    val gate = new Observation("gate")
    val scored = Tables.documents(spark, dir)
      .withColumn("ok", length(col("text")) >= col("n_chars"))
      .observe(gate,
        count(lit(1)).as("n"),
        count(when(col("ok"), 1)).as("n_ok"))
    scored.count()
    assert(gate.get("n") === gate.get("n_ok")) // text length == n_chars here
  }
}
