package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Operational metrics on a STREAM: `observe()` rides the micro-batch
  * that runs anyway (accumulator-backed, no second pass — same
  * mechanism ObservationSpec pins for batch) and surfaces per-batch
  * gate metrics through StreamingQueryProgress.observedMetrics — the
  * monitoring hook a production pipeline tails instead of re-counting
  * its own input. At 100 TB the alternative (a second aggregation
  * query over the source) doubles the read; observe() is free.
  */
class StreamingObserveSpec extends SparkSpec {

  test("observe() reports per-batch gate metrics through query progress") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[Int]
    val sink = s"obs_${System.nanoTime()}"
    val q = in.toDS().toDF("v")
      .observe("gate",
        count(lit(1)).as("n_rows"),
        sum(when(col("v") > 5, 1L).otherwise(0L)).as("n_hot"))
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      in.addData(1 to 10: _*)
      q.processAllAvailable()
      // the data-carrying batch may not be lastProgress (no-data
      // batches can follow) — scan recentProgress for the gate entry
      val gates = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("gate")))
      assert(gates.nonEmpty, "no observed metrics surfaced")
      val m = gates.last
      assert(m.getAs[Long]("n_rows") == 10L, m.toString)
      assert(m.getAs[Long]("n_hot") == 5L, m.toString)

      // second batch: metrics are PER-batch, not cumulative
      in.addData(6, 7)
      q.processAllAvailable()
      val m2 = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("gate"))).last
      assert(m2.getAs[Long]("n_rows") == 2L, m2.toString)
      assert(m2.getAs[Long]("n_hot") == 2L, m2.toString)
    } finally q.stop()
  }
}
