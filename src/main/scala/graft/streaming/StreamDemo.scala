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
    spark.stop()
    if (out.isEmpty || out.toSeq != out2.toSeq) sys.exit(1)
  }
}
