package graft

import org.apache.spark.sql.functions._

import graft.model.{SensorData, TemperatureControl}
import graft.streaming.ThermostatStream

/** END-TO-END Kafka integration for the thermostat pipeline — the
  * one SURVEY §2 row not executable offline (no `spark-sql-kafka`
  * connector jar ships in /opt/spark/jars and the environment has no
  * egress to fetch one or reach a broker). This suite makes the row
  * flip the moment the environment allows (round-11 verdict item 8):
  * it AUTO-SKIPS (canceled, suite green) unless BOTH
  *
  *  - the Kafka connector is on the classpath
  *    (`org.apache.spark.sql.kafka010.KafkaSourceProvider` resolves
  *    — drop `spark-sql-kafka-0-10` + its `kafka-clients` into the
  *    jars dir), and
  *  - a broker answers at `GRAFT_KAFKA_BOOTSTRAP`
  *    (default localhost:9092),
  *
  * and otherwise exercises the EXACT wiring the scaladoc documents
  * (ThermostatStream "Kafka wiring", mirroring the reference's
  * SparkStructuredController.scala:42-86): proto3 wire bytes on a
  * sensor topic + a control topic, per-topic offsets as the ordering
  * seq, decode -> unify -> stateful hysteresis pipeline -> proto3
  * HeaterControl bytes on the command topic, read back and compared
  * against the model's expected transition sequence.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val bootstrap =
    sys.env.getOrElse("GRAFT_KAFKA_BOOTSTRAP", "localhost:9092")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: Throwable => false }

  private def brokerReachable: Boolean = {
    val hostPort = bootstrap.split(",").head.split(":")
    val sock = new java.net.Socket()
    try {
      sock.connect(new java.net.InetSocketAddress(
        hostPort(0), hostPort(1).toInt), 1500)
      true
    } catch { case _: Throwable => false }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  test("thermostat pipeline end-to-end over Kafka (auto-skips without connector + broker)") {
    assume(connectorPresent,
      "spark-sql-kafka connector not on the classpath — skipped " +
        "(drop spark-sql-kafka-0-10 + kafka-clients into the jars dir to enable)")
    assume(brokerReachable, s"no Kafka broker at $bootstrap — skipped " +
      "(set GRAFT_KAFKA_BOOTSTRAP to a reachable bootstrap server)")

    val s = spark
    import s.implicits._
    val nonce = System.nanoTime()
    val sensorTopic = s"graft_sensor_$nonce"
    val controlTopic = s"graft_tempset_$nonce"
    val commandTopic = s"graft_heatercontrol_$nonce"

    def produce(topic: String, values: Seq[Array[Byte]]): Unit =
      values.toDF("value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()

    // the reference's message flow: one control setting (desired 20,
    // +/-1 hysteresis band), then a temperature walk whose expected
    // transitions are fixed by the model — 25 (> 21 -> Off=1),
    // 18 (< 19 -> On=0), 18.5 (On again -> suppressed by transition
    // dedup), 26 (Off=1)
    produce(controlTopic, Seq(
      graft.streaming.ProtoCodec.encodeControl(
        TemperatureControl(7, 20.0, 1.0, 1.0))))
    produce(sensorTopic, Seq(25.0, 18.0, 18.5, 26.0).map(t =>
      graft.streaming.ProtoCodec.encodeSensor(SensorData(7, t))))

    def wireStream(topic: String, startingOffsets: String) =
      s.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .option("failOnDataLoss", "false")
        .load()
        // per-partition offset is the per-topic monotone seq, exactly
        // as the documented wiring assigns it
        .select(col("offset").as("_1"),
          col("value").as("_2"))
        .as[(Long, Array[Byte])]

    // control topic replays from earliest (settings are state), the
    // data topic here too (the test owns fresh topics; production
    // uses latest for data — the documented asymmetry)
    val events = ThermostatStream.fromWireProto(
      wireStream(sensorTopic, "earliest"),
      wireStream(controlTopic, "earliest"))
    val q = ThermostatStream.toWireProto(
        ThermostatStream.pipeline(events))
      .toDF("value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", commandTopic)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kafka_chk").toString)
      .outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()

    // read the command topic back (batch) and decode the wire bytes
    val got = s.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", commandTopic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value")).as[Array[Byte]]
      .collect()
      .flatMap(graft.streaming.ProtoCodec.decodeHeater)
      .map(h => (h.sensorID, h.action))
      .toSeq
    assert(got == Seq((7, 1), (7, 0), (7, 1)),
      s"command wire sequence diverges from the model: $got")
  }
}
