package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream


import graft.model.{ControlEvent, Hysteresis, SensorData, TemperatureControl}
import graft.streaming.{Codec, HeaterCommand, HeaterSim, ThermostatStream}

/** End-to-end streaming semantics (SURVEY.md §5.2-3): MemoryStream →
  * flatMapGroupsWithState pipeline → memory sink, checked against the
  * pure batch fold (the golden semantics all four reference engines
  * share).
  */
class ThermostatStreamSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[ControlEvent]]): Seq[HeaterCommand] = {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[ControlEvent]
    val sink = s"thermo_${System.nanoTime()}"
    val q = ThermostatStream.pipeline(ms.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    s.table(sink).as[HeaterCommand].collect().toSeq
      .sortBy(c => (c.sensorID, c.seq))
  }

  private def goldenFold(events: Seq[ControlEvent]): Seq[HeaterCommand] =
    events.groupBy(_.sensorID).toSeq.flatMap { case (k, evs) =>
      Hysteresis.replay(evs.sortBy(_.seq).iterator)
        .map { case (seq, a) => HeaterCommand(k, seq, a) }
    }.sortBy(c => (c.sensorID, c.seq))

  test("streaming output equals the pure fold, state persists across batches") {
    val evs = HeaterSim.eventsOf(HeaterSim.closedLoop(40))
    // split into 5 micro-batches at arbitrary points
    val batches = evs.grouped(9).toSeq
    assert(runStream(batches) == goldenFold(evs))
  }

  test("multi-key streams keep independent state") {
    val k1 = HeaterSim.eventsOf(HeaterSim.closedLoop(25))
    val k2 = HeaterSim.eventsOf(HeaterSim.closedLoop(25, desired = 50.0,
      startTemp = 55.0)).map(e => e.copy(sensorID = 2L))
    val interleaved = (k1 ++ k2).sortBy(_.seq)
    assert(runStream(Seq(interleaved)) == goldenFold(k1 ++ k2))
  }

  test("no emission for keys that never receive a control") {
    val data = (1 to 10).map(i =>
      ControlEvent(9L, i.toLong, "data", 100.0 + i, 0.0, 0.0, 0.0))
    assert(runStream(Seq(data)).isEmpty)
  }

  test("closed loop: temperature oscillates inside the hysteresis band") {
    val steps = HeaterSim.closedLoop(200)
    // after convergence (first Off emission) temp stays within the band
    // extended by one integration step on each side
    val afterFirstOff = steps.dropWhile(_.emitted.isEmpty).drop(1)
    assert(afterFirstOff.nonEmpty)
    assert(afterFirstOff.forall(s => s.temp > 45.0 - 1.0 - 0.4 - 1e-9 &&
      s.temp < 45.0 + 1.0 + 0.8 + 1e-9))
    // actions strictly alternate (transition dedup end-to-end)
    val acts = steps.flatMap(_.emitted)
    assert(acts.nonEmpty)
    acts.sliding(2).foreach {
      case Seq(a, b) => assert(a != b)
      case _ =>
    }
  }

  test("transformWithState variant matches flatMapGroupsWithState") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = HeaterSim.eventsOf(HeaterSim.closedLoop(30))
      val ms = MemoryStream[ControlEvent]
      val sink = s"tws_${System.nanoTime()}"
      val q = ThermostatStream.pipelineTws(ms.toDS())
        .writeStream.format("memory").queryName(sink).outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      try {
        evs.grouped(7).foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(sink).as[HeaterCommand].collect().toSeq
        .sortBy(c => (c.sensorID, c.seq))
      assert(got == goldenFold(evs))
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("binary codecs round-trip and reject malformed payloads") {
    val sd = SensorData(42, 36.6)
    val tc = TemperatureControl(42, 45.0, 1.0, 1.5)
    assert(Codec.decodeSensor(Codec.encodeSensor(sd)).contains(sd))
    assert(Codec.decodeControl(Codec.encodeControl(tc)).contains(tc))
    assert(Codec.decodeSensor(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codec.decodeControl(null).isEmpty)
    assert(Codec.encodeCommand(HeaterCommand(1L, 7L, 1)).length == 20)
    // full-Long seq round-trip (Kafka offsets exceed Int range)
    val big = HeaterCommand(42L, Long.MaxValue - 5, 2)
    assert(Codec.decodeCommand(Codec.encodeCommand(big)).contains(big))
    assert(Codec.decodeCommand(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codec.decodeCommand(null).isEmpty)
  }

  test("unify merges typed data and control streams by seq") {
    val s = spark
    import s.implicits._
    val data = s.createDataset(Seq((SensorData(1, 50.0), 2L), (SensorData(1, 40.0), 4L)))
    val ctl = s.createDataset(Seq((TemperatureControl(1, 45.0, 1.0, 1.0), 1L)))
    val unified = ThermostatStream.unify(data, ctl)
    val out = ThermostatStream.pipeline(unified).collect().sortBy(_.seq)
    assert(out.toSeq == Seq(HeaterCommand(1L, 2L, 1), HeaterCommand(1L, 4L, 0)))
  }

  private def runStreamTws(batches: Seq[Seq[ControlEvent]]): Seq[HeaterCommand] = {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[ControlEvent]
      val sink = s"twsr_${System.nanoTime()}"
      val q = ThermostatStream.pipelineTws(ms.toDS())
        .writeStream.format("memory").queryName(sink).outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      s.table(sink).as[HeaterCommand].collect().toSeq
        .sortBy(c => (c.sensorID, c.seq))
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a control and data event sharing a seq apply control-first, deterministically") {
    val s = spark
    import s.implicits._
    // per-topic offsets can collide across topics; bare-seq sorting
    // would break the tie by shuffle-arrival order (run-dependent
    // emissions). The defined rule is control-before-data: the reading
    // at seq 2 must be evaluated against the setting that shares its
    // seq — emitting Off — not dropped for lack of a setting.
    val evs = Seq(
      ControlEvent(1L, 2L, "data", 50.0, 0.0, 0.0, 0.0),
      ControlEvent(1L, 2L, "control", 0.0, 45.0, 1.0, 1.0))
    val out = ThermostatStream.pipeline(s.createDataset(evs)).collect().toSeq
    assert(out == Seq(HeaterCommand(1L, 2L, 1)))
  }

  test("setpoint random walk: control upserts land mid-stream, both stateful APIs") {
    // the reference's core "dynamically controlled" claim: the Heater
    // re-randomizes the desired temperature while the stream runs
    // (Heater.scala:72-86), so state.update must apply a NEW control
    // to a key that already has state — across micro-batch boundaries
    val evs = HeaterSim.closedLoopWalk(60, controlEvery = 13, seed = 42L)
    val controls = evs.filter(_.kind == "control")
    assert(controls.size >= 4, "walk must re-configure repeatedly")
    assert(controls.map(_.desired).distinct.size >= 3, "setpoint must move")
    val golden = goldenFold(evs)
    // emissions continue AFTER a re-configuration (non-vacuous)
    assert(golden.exists(_.seq > controls(1).seq),
      "no transitions after the first control change")
    val batches = evs.grouped(7).toSeq // controls land in several batches
    assert(runStream(batches) == golden)
    assert(runStreamTws(batches) == golden)
  }

  test("per-key state isolation: three sensors interleaved in one stream") {
    // the Akka variant spawns one actor per sensor
    // (ControllerManagerBehavior.scala:22-28); the GroupState analog
    // must keep the same isolation with all keys in one stream
    val walks = Seq((1L, 42L), (2L, 43L), (3L, 44L)).map { case (id, seed) =>
      HeaterSim.closedLoopWalk(40, controlEvery = 11, seed = seed,
        sensorID = id, startTemp = 38.0 + 2 * id)
    }
    val len = walks.head.size
    assert(walks.forall(_.size == len))
    val interleaved = (0 until len).flatMap(i => walks.map(_(i)))
    val golden = goldenFold(walks.flatten)
    // every sensor produced transitions (non-vacuous isolation check)
    assert(golden.map(_.sensorID).distinct.sorted == Seq(1L, 2L, 3L))
    assert(runStream(interleaved.grouped(10).toSeq) == golden)
    assert(runStreamTws(interleaved.grouped(10).toSeq) == golden)
  }
}
