package graft.streaming

import java.io.ByteArrayOutputStream

import graft.model.{HeaterControl, SensorData, TemperatureControl}

/** Hand-rolled proto3 wire codec for the reference's three messages
  * (reference: protobufs/src/main/protobuf/messages.proto:1-29) —
  * varint-tagged fields, little-endian fixed64 doubles, proto3
  * default-value omission — so the wire round trip carries actual
  * protobuf bytes even though neither ScalaPB nor the spark-protobuf
  * connector exists in this offline environment. With the connector
  * present, `from_protobuf`/`to_protobuf` against messages.proto
  * replace this object 1:1 (same bytes).
  *
  * Wire shapes (field → tag byte):
  *   SensorData          1: int32 sensorID (0x08), 2: double temperature (0x11)
  *   TemperatureControl  1: int32 sensorID (0x08), 2: double desired (0x11),
  *                       3: double upDelta (0x19), 4: double downDelta (0x21)
  *   HeaterControl       1: int32 sensorID (0x08), 2: enum command (0x10)
  *
  * The enum is FLATTENED to `action: Int` on the Scala side — the
  * reference's own lesson that ScalaPB enums are not Spark-encodable
  * (reference: sparkcontroller/.../DataModelTransform.scala:41-44);
  * On=0, Off=1 (messages.proto:6-9).
  *
  * Decode is a conforming proto3 reader for these flat messages:
  * unknown fields are skipped by wire type, last value wins on
  * duplicates, missing fields decode to proto3 defaults (0 / 0.0),
  * and any structural error (truncation, over-long varint, unknown
  * wire type) returns None — dropped upstream like every malformed
  * payload (reference: flinkcontroller/.../BadDataHandler.scala:13-19).
  */
object ProtoCodec {

  // ---- primitives ----------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt & 0x7f)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field.toLong << 3) | wire.toLong))

  /** proto3 int32: negative values sign-extend to 64 bits (10-byte varint). */
  private def writeInt32Field(out: ByteArrayOutputStream, field: Int, v: Int): Unit =
    if (v != 0) { writeTag(out, field, 0); writeVarint(out, v.toLong) }

  /** proto3 double: fixed64, little-endian; omitted iff raw bits are 0
    * (matches protobuf-java: -0.0 IS serialized). */
  private def writeDoubleField(out: ByteArrayOutputStream, field: Int, v: Double): Unit = {
    val bits = java.lang.Double.doubleToRawLongBits(v)
    if (bits != 0L) {
      writeTag(out, field, 1)
      var b = bits
      var i = 0
      while (i < 8) { out.write((b & 0xff).toInt); b = b >>> 8; i += 1 }
    }
  }

  /** Mutable cursor over the payload; structural errors throw Malformed
    * and surface as None from the message decoders. */
  private final class Malformed extends RuntimeException(null, null, false, false)
  private val malformed = new Malformed

  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0
      var acc = 0L
      while (shift < 64) {
        if (pos >= buf.length) throw malformed
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      throw malformed // > 10 bytes
    }
    def readFixed64(): Long = {
      if (pos + 8 > buf.length) throw malformed
      var acc = 0L
      var i = 0
      while (i < 8) { acc |= (buf(pos + i).toLong & 0xff) << (8 * i); i += 1 }
      pos += 8
      acc
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => if (pos + 8 > buf.length) throw malformed else pos += 8
      case 2 =>
        val len = readVarint()
        // overflow-safe bound: `pos + len` wraps negative for a crafted
        // 10-byte varint near Long.MaxValue and would pass a naive check
        if (len < 0 || len > (buf.length - pos).toLong) throw malformed
        pos += len.toInt
      case 5 => if (pos + 4 > buf.length) throw malformed else pos += 4
      // groups are proto2 wire relics, but conforming parsers
      // (protobuf-java) still SKIP an embedded group rather than
      // reject the message: consume nested fields until the matching
      // END_GROUP tag. A bare END_GROUP here is malformed.
      case 3 =>
        var open = 1
        while (open > 0) {
          val tag = readVarint()
          val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
          if (f == 0) throw malformed
          w match {
            case 3 => open += 1
            case 4 => open -= 1
            case other => skip(other)
          }
        }
      case _ => throw malformed // wire 4 outside a group, or 6/7
    }
  }

  /** Wraps a full-message decode loop: runs `loop` over a fresh
    * [[Reader]] on the payload and maps any structural error
    * ([[Malformed]]) to None. Each per-message decoder owns its own
    * tag-dispatch loop and MUST end its match with a
    * `case _ => r.skip(wire)` arm — that catch-all, not this wrapper,
    * is what skips unknown fields. */
  private def decodeWith[T](b: Array[Byte])(loop: Reader => T): Option[T] =
    if (b == null) None
    else
      try {
        val r = new Reader(b)
        Some(loop(r))
      } catch { case _: Malformed => None }

  // ---- SensorData ----------------------------------------------

  def encodeSensor(s: SensorData): Array[Byte] = {
    val out = new ByteArrayOutputStream(16)
    writeInt32Field(out, 1, s.sensorID)
    writeDoubleField(out, 2, s.temperature)
    out.toByteArray
  }

  def decodeSensor(b: Array[Byte]): Option[SensorData] = decodeWith(b) { r =>
    var id = 0
    var temp = 0.0
    while (r.hasMore) {
      val tag = r.readVarint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 0) throw malformed // conforming parsers reject tag 0
      (field, wire) match {
        case (1, 0) => id = r.readVarint().toInt
        case (2, 1) => temp = java.lang.Double.longBitsToDouble(r.readFixed64())
        case _      => r.skip(wire)
      }
    }
    SensorData(id, temp)
  }

  // ---- TemperatureControl --------------------------------------

  def encodeControl(c: TemperatureControl): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    writeInt32Field(out, 1, c.sensorID)
    writeDoubleField(out, 2, c.desired)
    writeDoubleField(out, 3, c.upDelta)
    writeDoubleField(out, 4, c.downDelta)
    out.toByteArray
  }

  def decodeControl(b: Array[Byte]): Option[TemperatureControl] = decodeWith(b) { r =>
    var id = 0
    var desired = 0.0
    var up = 0.0
    var down = 0.0
    while (r.hasMore) {
      val tag = r.readVarint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 0) throw malformed // conforming parsers reject tag 0
      (field, wire) match {
        case (1, 0) => id = r.readVarint().toInt
        case (2, 1) => desired = java.lang.Double.longBitsToDouble(r.readFixed64())
        case (3, 1) => up = java.lang.Double.longBitsToDouble(r.readFixed64())
        case (4, 1) => down = java.lang.Double.longBitsToDouble(r.readFixed64())
        case _      => r.skip(wire)
      }
    }
    TemperatureControl(id, desired, up, down)
  }

  // ---- HeaterControl (flattened enum) --------------------------

  def encodeHeater(h: HeaterControl): Array[Byte] = {
    val out = new ByteArrayOutputStream(16)
    writeInt32Field(out, 1, h.sensorID)
    // enum on the wire is a plain varint; On=0 is the proto3 default
    // and is omitted, exactly like protobuf-java would
    if (h.action != 0) { writeTag(out, 2, 0); writeVarint(out, h.action.toLong) }
    out.toByteArray
  }

  def decodeHeater(b: Array[Byte]): Option[HeaterControl] = decodeWith(b) { r =>
    var id = 0
    var action = 0
    while (r.hasMore) {
      val tag = r.readVarint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 0) throw malformed // conforming parsers reject tag 0
      (field, wire) match {
        case (1, 0) => id = r.readVarint().toInt
        case (2, 0) => action = r.readVarint().toInt
        case _      => r.skip(wire)
      }
    }
    HeaterControl(id, action)
  }
}
