package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.ControlEvent
import graft.streaming.{HeaterCommand, HeaterSim, ThermostatStream}

/** foreachBatch as the custom-sink surface: each micro-batch of
  * emitted commands lands as a parquet partition (the offline stand-in
  * for the reference's Kafka producer sink).
  */
class ForeachBatchSinkSpec extends SparkSpec {

  test("pipeline output lands in parquet via foreachBatch") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val outDir = Files.createTempDirectory("fb_out").toString
    val ms = MemoryStream[ControlEvent]
    val q = ThermostatStream.pipeline(ms.toDS())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[HeaterCommand], id: Long) =>
        batch.write.mode("append").parquet(s"$outDir/commands")
      }
      .start()
    val evs = HeaterSim.eventsOf(HeaterSim.closedLoop(40))
    try {
      evs.grouped(15).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val written = s.read.parquet(s"$outDir/commands").as[HeaterCommand]
      .collect().toSeq.sortBy(_.seq)
    val expected = graft.model.Hysteresis
      .replay(evs.sortBy(_.seq).iterator)
      .map { case (seq, a) => HeaterCommand(1L, seq, a) }.toSeq
    assert(written == expected)
  }
}
