package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable demo of the streaming thermostat pipeline: feeds the
  * closed-loop simulator through MemoryStream micro-batches and prints
  * the emitted transitions (the offline analog of the reference's
  * Kafka round trip, heater -> controller -> heater).
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[graft.model.ControlEvent]
    val q = ThermostatStream.pipeline(ms.toDS())
      .writeStream.format("memory").queryName("demo").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    val events = HeaterSim.eventsOf(HeaterSim.closedLoop(60))
    events.grouped(10).foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val out = spark.table("demo").as[HeaterCommand].collect().sortBy(_.seq)
    out.foreach(c => println(s"[demo] sensor=${c.sensorID} seq=${c.seq} " +
      s"action=${if (c.action == 0) "On" else "Off"}"))
    println(s"[demo] ${out.length} transitions emitted (flatMapGroupsWithState)")

    // same loop through the transformWithState variant (RocksDB store)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms2 = MemoryStream[graft.model.ControlEvent]
    val q2 = ThermostatStream.pipelineTws(ms2.toDS())
      .writeStream.format("memory").queryName("demo_tws").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    events.grouped(10).foreach { b => ms2.addData(b); q2.processAllAvailable() }
    q2.stop()
    val out2 = spark.table("demo_tws").as[HeaterCommand].collect().sortBy(_.seq)
    println(s"[demo] ${out2.length} transitions emitted (transformWithState); " +
      s"variants agree = ${out.toSeq == out2.toSeq}")

    // throughput: one large micro-batch through the stateful pipeline
    // (reference design point is 0.1 events/sec/sensor — heater
    // publishes every 10s, Heater.scala:26,65)
    val nSensors = 200
    val perSensor = 500
    val bulk = (0 until nSensors).flatMap { sid =>
      HeaterSim.eventsOf(HeaterSim.closedLoop(perSensor))
        .map(e => e.copy(sensorID = sid.toLong))
    }
    val ms3 = MemoryStream[graft.model.ControlEvent]
    val q3 = ThermostatStream.pipeline(ms3.toDS())
      .writeStream.format("memory").queryName("demo_tp").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    val t0 = System.nanoTime()
    ms3.addData(bulk)
    q3.processAllAvailable()
    val dt = (System.nanoTime() - t0) / 1e9
    q3.stop()
    println(f"[demo] throughput: ${bulk.size} events, ${nSensors} keys in $dt%.2f s " +
      f"= ${bulk.size / dt}%.0f events/s")

    // multi-query lifecycle (reference A13,
    // SparkStructuredController.scala:89): two concurrent queries on
    // independent streams; the driver parks on awaitAnyTermination and
    // wakes when the first query terminates, while the second keeps
    // running.
    spark.streams.resetTerminated() // forget the stopped demos above
    val msA = MemoryStream[graft.model.ControlEvent]
    val msB = MemoryStream[graft.model.ControlEvent]
    val qA = ThermostatStream.pipeline(msA.toDS())
      .writeStream.format("memory").queryName("demo_a").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    val qB = ThermostatStream.pipeline(msB.toDS())
      .writeStream.format("memory").queryName("demo_b").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    msA.addData(events)
    msB.addData(events)
    val stopper = new Thread(() => {
      qA.processAllAvailable(); qB.processAllAvailable(); qA.stop()
    })
    stopper.start()
    spark.streams.awaitAnyTermination()
    stopper.join()
    val bStillActive = qB.isActive
    println(s"[demo] awaitAnyTermination woke on demo_a; demo_b active = $bStillActive")
    qB.stop()
    spark.stop()
    if (!bStillActive) sys.exit(1)
    if (out.isEmpty || out.toSeq != out2.toSeq) sys.exit(1)
  }
}
