package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** A REAL audio codec for the multimodal column surface — the audio
  * sibling of [[MediaCodec]]'s netpbm image kernel: binary RIFF/WAVE
  * PCM16 payloads decoded to format fields + exact-int64 sample
  * statistics inside whole-stage codegen. The reference carries its
  * sensor payloads as opaque wire bytes end to end
  * (`fdp-dynamically-controlled-streams`,
  * `sparkcontroller/src/main/scala/com/lightbend/streams/spark/SparkStructuredStateController.scala:47-55`
  * decodes bytes per record the same way — a per-row parse inside the
  * execution engine); here the parse is a native Catalyst expression
  * so a 100-TB audio column is decoded without a Scala UDF or object
  * (de)serialization. WAV/RIFF is the self-describing container every
  * audio pipeline meets first; compressed codecs (MP3/FLAC/Opus) are
  * absent from this environment by design — the PCM kernel is the
  * smallest REAL instance of the same shape: walk a chunked
  * container, validate the format chunk, scan the sample stream,
  * emit typed features, reject malformed bytes as NULL (a poisoned
  * payload in a corpus-scale scan must not kill the stage).
  */
object WavCodec {

  /** Deterministic tiny PCM16 WAV payload for a document id — the
    * fixture generator for the decode path (the testdata has no
    * binary audio column, so payloads are synthesized from doc_id by
    * a closed form the DuckDB oracle replicates arithmetically; the
    * decoder must then recover those values from the BYTES alone).
    * doc_id % 5 == 0 emits mono, the rest interleaved stereo; sample
    * rates cycle 8000/12000/16000; frame counts cycle 16..24 so
    * duration math exercises every (rate, frames) residue pair.
    * Sample values span negative and positive int16 territory.
    */
  def wavSynth(id: Long): Array[Byte] = {
    val ch = if (id % 5 == 0) 1 else 2
    val rate = 8000 + (id % 3).toInt * 4000
    val frames = 16 + (id % 9).toInt
    val dataSize = frames * ch * 2
    val out = new Array[Byte](44 + dataSize)
    def le32(pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte
      out(pos + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(pos: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(pos + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, ch)
    le32(24, rate)
    le32(28, rate * ch * 2) // byte rate
    le16(32, ch * 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, dataSize)
    var k = 0
    var o = 44
    while (k < frames) {
      val s0 = ((id * 37 + k * 101L) % 4001L - 2000L).toInt
      le16(o, s0 & 0xffff)
      o += 2
      if (ch == 2) {
        val s1 = ((id * 53 + k * 67L) % 4001L - 2000L).toInt
        le16(o, s1 & 0xffff)
        o += 2
      }
      k += 1
    }
    out
  }

  /** Decoded audio features: format fields plus exact-int64 sample
    * statistics — per-channel sums (mono reports sum_l with
    * sum_r = 0), peak absolute sample, total sample energy (sum of
    * squares; int64-safe to ~2^33 samples per payload at full
    * scale), and integer milliseconds of duration.
    */
  val decodedType: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("dur_ms", LongType, nullable = false),
    StructField("sum_l", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  /** Parse a RIFF/WAVE payload: RIFF header with a size that must
    * cover the file, then a chunk walk — unknown chunks (LIST, fact,
    * cue, …) are skipped with the RIFF odd-size pad byte honored; the
    * canonical synthesizer emits only fmt+data, so the skip/pad paths
    * are exercised by WavCodecSpec's hand-built payloads. Requires a
    * PCM (format 1) 16-bit fmt chunk with 1 or 2 channels BEFORE the
    * data chunk (the spec's ordering rule), and a data chunk whose
    * size is a whole number of frames. Any violation — bad magic,
    * truncated chunk, zero rate, non-PCM, odd sample bytes, missing
    * data — returns null rather than throwing.
    */
  def wavStats(payload: Array[Byte]): InternalRow = {
    val n = payload.length
    if (n < 44) return null
    if (payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
      payload(3) != 'F') return null
    if (payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' ||
      payload(11) != 'E') return null
    def u16(pos: Int): Int =
      (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8)
    def u32(pos: Int): Long =
      (payload(pos) & 0xffL) | ((payload(pos + 1) & 0xffL) << 8) |
        ((payload(pos + 2) & 0xffL) << 16) | ((payload(pos + 3) & 0xffL) << 24)
    if (u32(4) != n - 8L) return null // RIFF size must cover the file
    var pos = 12
    var ch = 0
    var rate = 0
    var haveFmt = false
    var dataPos = -1
    var dataLen = 0L
    while (pos + 8 <= n && dataPos < 0) {
      val size = u32(pos + 4)
      val body = pos + 8
      if (size < 0 || body + size > n) return null // truncated chunk
      val isFmt = payload(pos) == 'f' && payload(pos + 1) == 'm' &&
        payload(pos + 2) == 't' && payload(pos + 3) == ' '
      val isData = payload(pos) == 'd' && payload(pos + 1) == 'a' &&
        payload(pos + 2) == 't' && payload(pos + 3) == 'a'
      if (isFmt) {
        if (size < 16) return null
        if (u16(body) != 1) return null // PCM only
        ch = u16(body + 2)
        rate = u32(body + 4).toInt
        val bits = u16(body + 14)
        if (ch < 1 || ch > 2 || rate <= 0 || bits != 16) return null
        haveFmt = true
      } else if (isData) {
        if (!haveFmt) return null // fmt must precede data
        dataPos = body
        dataLen = size
      }
      pos = body + size.toInt + (size & 1L).toInt // RIFF word-align pad
    }
    if (dataPos < 0) return null
    if (dataLen % (ch * 2) != 0) return null // whole frames only
    val frames = dataLen / (ch * 2)
    if (frames <= 0) return null
    var sl = 0L
    var sr = 0L
    var peak = 0
    var energy = 0L
    var k = 0L
    var o = dataPos
    while (k < frames) {
      val s0 = u16(o).toShort.toInt
      o += 2
      sl += s0
      val a0 = if (s0 < 0) -s0 else s0
      if (a0 > peak) peak = a0
      energy += s0.toLong * s0
      if (ch == 2) {
        val s1 = u16(o).toShort.toInt
        o += 2
        sr += s1
        val a1 = if (s1 < 0) -s1 else s1
        if (a1 > peak) peak = a1
        energy += s1.toLong * s1
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](
      ch, rate, 16, frames, frames * 1000L / rate, sl, sr, peak, energy))
  }
}

/** Codegen'd deterministic PCM16 WAV payload from a bigint id — the
  * binary-audio fixture column (see [[WavCodec.wavSynth]]).
  */
case class WavSynth(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${t.sql}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_synth"

  override protected def nullSafeEval(input: Any): Any =
    WavCodec.wavSynth(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavCodec.wavSynth($c)")

  override protected def withNewChildInternal(newChild: Expression): WavSynth =
    copy(child = newChild)
}

/** Codegen'd RIFF/WAVE decode of a binary column to format fields +
  * exact-int sample statistics (see [[WavCodec.wavStats]]).
  * Malformed payloads decode to NULL — the poison-row contract for
  * corpus-scale media columns.
  */
case class WavStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${t.sql}")
  }

  override def dataType: DataType = WavCodec.decodedType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_stats"

  override protected def nullSafeEval(input: Any): Any =
    WavCodec.wavStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.WavCodec.wavStats($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WavStats =
    copy(child = newChild)
}

/** Column-level entry points for the native audio codec. */
object audio {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Deterministic tiny PCM16 WAV payload for a bigint id column. */
  def wavSynth(c: Column): Column =
    Bridge.column(WavSynth(Bridge.expression(c)))

  /** Decode a RIFF/WAVE (PCM16) binary column; malformed -> NULL. */
  def wavStats(c: Column): Column =
    Bridge.column(WavStats(Bridge.expression(c)))
}
