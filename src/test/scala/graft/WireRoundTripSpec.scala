package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.{ControlEvent, Hysteresis, SensorData, TemperatureControl}
import graft.streaming.{Codec, HeaterCommand, HeaterSim, ThermostatStream}

/** End-to-end BYTES→bytes streaming path: the serialize/deserialize
  * boundaries Kafka would carry (reference A3/A11,
  * sparkcontroller/.../SparkStructuredController.scala:38-39,78),
  * exercised offline over MemoryStream — (offset, value-bytes) records
  * in, decoded, unified, run through the stateful pipeline, re-encoded
  * to command bytes, and golden-checked against the pure fold.
  */
class WireRoundTripSpec extends SparkSpec {

  private def goldenFold(events: Seq[ControlEvent]): Seq[HeaterCommand] =
    events.groupBy(_.sensorID).toSeq.flatMap { case (k, evs) =>
      Hysteresis.replay(evs.sortBy(_.seq).iterator)
        .map { case (seq, a) => HeaterCommand(k, seq, a) }
    }.sortBy(c => (c.sensorID, c.seq))

  test("bytes -> decode -> unify -> pipeline -> encode -> bytes equals the pure fold") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    val evs = HeaterSim.eventsOf(HeaterSim.closedLoop(40))
    // re-encode the fixture events as the two wire topics
    val sensorRecords = evs.filter(_.kind == "data").map(e =>
      (e.seq, Codec.encodeSensor(SensorData(e.sensorID.toInt, e.temperature))))
    val controlRecords = evs.filter(_.kind == "control").map(e =>
      (e.seq, Codec.encodeControl(
        TemperatureControl(e.sensorID.toInt, e.desired, e.upDelta, e.downDelta))))
    // malformed payloads on both topics must be dropped, not crash
    val junk = Seq((9000L, Array[Byte](1, 2, 3)), (9001L, Array.empty[Byte]))

    val sensorMs = MemoryStream[(Long, Array[Byte])]
    val controlMs = MemoryStream[(Long, Array[Byte])]
    val out = ThermostatStream.toWire(
      ThermostatStream.pipeline(
        ThermostatStream.fromWire(sensorMs.toDS(), controlMs.toDS())))
    val sink = s"wire_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      controlMs.addData(controlRecords ++ junk)
      q.processAllAvailable()
      sensorRecords.grouped(9).foreach { b =>
        sensorMs.addData(b ++ junk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = s.table(sink).as[Array[Byte]].collect().toSeq
      .flatMap(Codec.decodeCommand)
      .sortBy(c => (c.sensorID, c.seq))
    assert(got == goldenFold(evs))
  }
}
