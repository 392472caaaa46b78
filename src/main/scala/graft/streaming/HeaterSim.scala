package graft.streaming

import graft.model.{ControlEvent, ControlState, Hysteresis}

/** Deterministic port of the reference's closed-loop heater simulator
  * (reference: heater/src/main/scala/com/lightbend/streams/heater/
  * Heater.scala:49-66 — linear temperature integrator: temp rises by
  * interval/upRate while heating, falls by interval/downRate while
  * off; start 42.0) used as the test-fixture generator: the golden
  * streaming outputs in the specs come from running the controller
  * against this physics.
  */
object HeaterSim {

  final case class Step(seq: Long, temp: Double, emitted: Option[Int])

  /** Run `n` steps of the closed loop for one sensor: the controller
    * (Hysteresis) consumes each reading and its emissions drive the
    * heater state, exactly like the reference's
    * heater-control listener (Heater.scala:90-103; command index 0 =
    * On = heating).
    */
  def closedLoop(
      n: Int,
      desired: Double = 45.0,
      upDelta: Double = 1.0,
      downDelta: Double = 1.0,
      startTemp: Double = 42.0,
      heatStep: Double = 0.8,
      coolStep: Double = 0.4): Vector[Step] = {
    var temp = startTemp
    var heating = true // reference heater starts heating (Heater.scala:49)
    var st = ControlState.empty
    val (st1, _) = Hysteresis.step(st,
      ControlEvent(1L, 0L, "control", 0.0, desired, upDelta, downDelta))
    st = st1
    (1 to n).toVector.map { i =>
      temp = if (heating) temp + heatStep else temp - coolStep
      val (st2, emitted) = Hysteresis.step(st,
        ControlEvent(1L, i.toLong, "data", temp, 0.0, 0.0, 0.0))
      st = st2
      emitted.foreach { a => heating = a == 0 } // On=0 heats, Off=1 cools
      Step(i.toLong, temp, emitted)
    }
  }

  /** The event sequence (control first, then readings) that feeds the
    * same loop through the Spark pipeline.
    */
  def eventsOf(steps: Vector[Step], desired: Double = 45.0,
      upDelta: Double = 1.0, downDelta: Double = 1.0): Vector[ControlEvent] =
    ControlEvent(1L, 0L, "control", 0.0, desired, upDelta, downDelta) +:
      steps.map(s => ControlEvent(1L, s.seq, "data", s.temp, 0.0, 0.0, 0.0))

  /** Closed loop WITH the reference Heater's setpoint random walk
    * (reference: heater/.../Heater.scala:72-86 — start 45.0, then
    * `desired += nextInt(10) - 5` per control interval; the reference
    * re-publishes every 10 min against 10-s readings, i.e. one control
    * per ~60 readings — here `controlEvery` compresses that ratio so
    * short fixtures still cross several control changes). Returns the
    * full interleaved event stream: control upserts land MID-stream,
    * exercising the reference's core "dynamically controlled" claim —
    * the state.update control path under re-configuration
    * (sparkcontroller/.../SparkStructuredController.scala:100-103) —
    * rather than a single fixed setting. Deterministic under `seed`.
    */
  def closedLoopWalk(
      n: Int,
      controlEvery: Int = 10,
      seed: Long = 42L,
      sensorID: Long = 1L,
      startTemp: Double = 42.0,
      heatStep: Double = 0.8,
      coolStep: Double = 0.4): Vector[ControlEvent] = {
    val rnd = new scala.util.Random(seed)
    var desired = 45.0
    var temp = startTemp
    var heating = true
    var st = ControlState.empty
    var seq = 0L
    val out = Vector.newBuilder[ControlEvent]
    var i = 0
    while (i < n) {
      if (i % controlEvery == 0) {
        val ctl = ControlEvent(sensorID, seq, "control", 0.0, desired, 1.0, 1.0)
        out += ctl
        st = Hysteresis.step(st, ctl)._1
        // walk AFTER publishing, as the reference does (Heater.scala:83)
        desired = desired + (rnd.nextInt(10) - 5)
        seq += 1
      }
      temp = if (heating) temp + heatStep else temp - coolStep
      val ev = ControlEvent(sensorID, seq, "data", temp, 0.0, 0.0, 0.0)
      out += ev
      val (st2, emitted) = Hysteresis.step(st, ev)
      st = st2
      emitted.foreach { a => heating = a == 0 } // On=0 heats
      seq += 1
      i += 1
    }
    out.result()
  }
}
