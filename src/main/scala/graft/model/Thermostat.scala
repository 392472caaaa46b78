package graft.model

/** Data model of the dynamically-controlled-streams pattern, re-expressed
  * as plain Scala case classes (Spark product encoders).
  *
  * Message shapes follow the reference's proto3 definitions
  * (reference: protobufs/src/main/protobuf/messages.proto:12-29); the
  * flattened `action: Int` mirrors the reference's lesson that ScalaPB
  * enums are not Spark-encodable (reference:
  * sparkcontroller/.../DataModelTransform.scala:41-44).
  */
final case class SensorData(sensorID: Int, temperature: Double)

final case class TemperatureControl(
    sensorID: Int,
    desired: Double,
    upDelta: Double,
    downDelta: Double)

/** action: On=0, Off=1 (reference: messages.proto:6-9). */
final case class HeaterControl(sensorID: Int, action: Int)

/** Tagged union of the two input streams, discriminated by `kind`
  * (cleaner than the reference's null-tagged UnifiedDataModel,
  * reference: sparkcontroller/.../DataModelTransform.scala:7-25).
  * `seq` is the per-key ordering sequence (event-id / offset).
  */
final case class ControlEvent(
    sensorID: Long,
    seq: Long,
    kind: String, // "control" | "data"
    temperature: Double, // valid when kind == "data"
    desired: Double, // valid when kind == "control"
    upDelta: Double,
    downDelta: Double)

/** Per-key state: latest setting + last emitted action (reference keeps
  * both inside GroupState, sparkcontroller/.../DataModelTransform.scala:39).
  * lastAction == -1 means "nothing emitted yet".
  */
final case class ControlState(
    hasSetting: Boolean,
    desired: Double,
    upDelta: Double,
    downDelta: Double,
    lastAction: Int)

object ControlState {
  val empty: ControlState = ControlState(hasSetting = false, 0d, 0d, 0d, -1)
}

/** The pure hysteresis + transition-dedup state machine — identical
  * semantics to all four reference engines (reference:
  * sparkcontroller/.../SparkStructuredController.scala:96-118,
  * flinkcontroller/.../TemperatureControlProcessor.scala:30-50,
  * kafkastreamcontroller/.../SensorDataTransformer.scala:14-46,
  * akkastreamcontroller/.../ControllerBehavior.scala:9-41).
  *
  * Kept Spark-free so it can be property-tested directly and reused by
  * both the batch replay (groupByKey + flatMapGroups) and the streaming
  * pipeline (flatMapGroupsWithState).
  */
object Hysteresis {

  /** 1=Off if too hot, 0=On if too cold, -1 = inside the deadband. */
  def action(desired: Double, up: Double, down: Double, temp: Double): Int =
    if (temp > desired + up) 1
    else if (temp < desired - down) 0
    else -1

  /** One step of the state machine: returns the new state and an
    * optional emitted action. Controls update the setting and never
    * emit; readings emit only on a transition (action >= 0 and different
    * from the last emitted action), and only once a setting exists.
    */
  def step(st: ControlState, ev: ControlEvent): (ControlState, Option[Int]) =
    if (ev.kind == "control") {
      (st.copy(hasSetting = true, desired = ev.desired,
        upDelta = ev.upDelta, downDelta = ev.downDelta), None)
    } else if (!st.hasSetting) {
      (st, None) // no output before the first control for the key
    } else {
      val a = action(st.desired, st.upDelta, st.downDelta, ev.temperature)
      if (a >= 0 && a != st.lastAction) (st.copy(lastAction = a), Some(a))
      else (st, None)
    }

  /** Fold a per-key, already-ordered event sequence into the emitted
    * transitions. Returns (seq, action) pairs.
    */
  def replay(events: Iterator[ControlEvent]): Iterator[(Long, Int)] = {
    var st = ControlState.empty
    events.flatMap { ev =>
      val (st2, out) = step(st, ev)
      st = st2
      out.map(a => (ev.seq, a)).iterator
    }
  }
}
