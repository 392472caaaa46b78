package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** A REAL PNG container codec — the fourth media sibling next to
  * [[MediaCodec]] (netpbm image), [[WavCodec]] (audio) and
  * [[AviCodec]] (video), and the first with CRYPTOGRAPHIC-GRADE
  * integrity auditing: every PNG chunk carries a CRC-32 over its
  * type+data, so a corpus-scale ingest can separate three failure
  * classes no extension-sniffing pipeline can — structurally broken
  * payloads (probe → NULL, the poison-row contract), structurally
  * valid payloads with BITROT (crc mismatches counted per row — the
  * audit signal for storage-layer corruption sweeps), and clean
  * files. The chunk walk (big-endian lengths, IHDR-first/IEND-last
  * ordering, unknown-ancillary skip) runs inside whole-stage codegen
  * as a native Catalyst expression; IDAT payloads stay opaque bytes,
  * checksummed not inflated (zlib decode is deliberately out of
  * scope — the CONTAINER walk is what runs at 100 TB).
  * Reference analog: opaque wire payloads carried end to end
  * (`fdp-dynamically-controlled-streams`,
  * `sparkcontroller/.../SparkStructuredController.scala:38-39` —
  * per-record byte decode inside the engine).
  */
object PngCodec {

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Deterministic tiny PNG payload for a document id — the fixture
    * generator for the probe path (testdata has no binary image
    * column; payloads are synthesized from doc_id by a closed form
    * the DuckDB oracle replicates arithmetically, and the prober
    * must recover the values from the BYTES alone — including
    * recomputing every chunk's CRC-32). Dimensions and IDAT
    * chunking cycle through residues; ids divisible by 4 carry a
    * tEXt ancillary chunk so the unknown-chunk skip path runs in
    * production, not just in the spec.
    */
  def pngSynth(id: Long): Array[Byte] = {
    // Scala % is sign-preserving: a negative id would silently yield
    // zero-width / IDAT-free payloads that probe to NULL for the
    // wrong reason — fail loudly instead (the fixture contract is
    // "valid payload in, struct out")
    require(id >= 0L, s"png_synth needs a non-negative id, got $id")
    val w = 8 + (id % 9).toInt
    val h = 6 + (id % 7).toInt
    val colorType = ((id % 2) * 2).toInt // 0 grayscale, 2 truecolor
    val nIdat = 1 + (id % 3).toInt
    val text = id % 4 == 0
    def idatLen(k: Int): Int = 4 + ((id + k) % 5).toInt
    val textBody = "k\u0000v".getBytes("ISO-8859-1") // keyword NUL value
    var total = 8 + (12 + 13) + (12 + 0) // sig + IHDR + IEND
    if (text) total += 12 + textBody.length
    var k = 0
    while (k < nIdat) { total += 12 + idatLen(k); k += 1 }
    val out = new Array[Byte](total)
    System.arraycopy(Sig, 0, out, 0, 8)
    var pos = 8
    def be32(v: Long): Unit = {
      out(pos) = ((v >> 24) & 0xff).toByte
      out(pos + 1) = ((v >> 16) & 0xff).toByte
      out(pos + 2) = ((v >> 8) & 0xff).toByte
      out(pos + 3) = (v & 0xff).toByte
      pos += 4
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      be32(data.length.toLong)
      val typeStart = pos
      var i = 0
      while (i < 4) { out(pos + i) = typ.charAt(i).toByte; i += 1 }
      pos += 4
      System.arraycopy(data, 0, out, pos, data.length)
      pos += data.length
      val crc = new java.util.zip.CRC32()
      crc.update(out, typeStart, 4 + data.length)
      be32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // compression/filter/interlace
    chunk("IHDR", ihdr)
    if (text) chunk("tEXt", textBody)
    k = 0
    while (k < nIdat) {
      val len = idatLen(k)
      val data = new Array[Byte](len)
      var j = 0
      while (j < len) {
        data(j) = ((id * 37 + k * 13 + j * 5) % 241).toByte
        j += 1
      }
      chunk("IDAT", data)
      k += 1
    }
    chunk("IEND", Array.emptyByteArray)
    out
  }

  /** Probed container features + the per-row bitrot audit. */
  val decodedType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false),
    StructField("n_chunks", LongType, nullable = false),
    StructField("n_idat", LongType, nullable = false),
    StructField("idat_bytes", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("n_bad_crc", LongType, nullable = false)))

  /** Walk a PNG payload: 8-byte signature, then length-typed chunks
    * whose CRC-32 (over type+data) is RECOMPUTED and compared —
    * mismatches are counted, not fatal (bitrot is the audit signal;
    * CRC-32 detects every single-bit flip, which CodecFuzzSpec's
    * mutation property leans on). Structural violations — bad
    * signature, truncated chunk, IHDR absent/short/not-first, IEND
    * not last or non-empty, zero dimensions — return null.
    */
  def pngStats(payload: Array[Byte]): InternalRow = {
    val n = payload.length
    if (n < 8 + 12 + 13 + 12) return null
    var i = 0
    while (i < 8) { if (payload(i) != Sig(i)) return null; i += 1 }
    def u32(pos: Int): Long =
      ((payload(pos) & 0xffL) << 24) | ((payload(pos + 1) & 0xffL) << 16) |
        ((payload(pos + 2) & 0xffL) << 8) | (payload(pos + 3) & 0xffL)
    def t(pos: Int, s: String): Boolean =
      payload(pos) == s.charAt(0) && payload(pos + 1) == s.charAt(1) &&
        payload(pos + 2) == s.charAt(2) && payload(pos + 3) == s.charAt(3)
    var pos = 8
    var first = true
    var w = 0
    var h = 0
    var depth = 0
    var colorType = 0
    var chunks = 0L
    var idat = 0L
    var idatBytes = 0L
    var byteSum = 0L
    var badCrc = 0L
    var ended = false
    while (pos < n) {
      if (ended) return null // bytes after IEND
      if (pos + 12 > n) return null // truncated chunk frame
      val len = u32(pos)
      val typePos = pos + 4
      val dataPos = pos + 8
      if (len < 0 || dataPos + len + 4 > n) return null // truncated data
      if (first) {
        if (!t(typePos, "IHDR") || len != 13) return null
        w = u32(dataPos).toInt
        h = u32(dataPos + 4).toInt
        depth = payload(dataPos + 8) & 0xff
        colorType = payload(dataPos + 9) & 0xff
        if (w <= 0 || h <= 0 || depth <= 0) return null
        first = false
      } else if (t(typePos, "IHDR")) {
        return null // duplicate header
      } else if (t(typePos, "IDAT")) {
        idat += 1L
        idatBytes += len
        var j = 0
        while (j < len) {
          byteSum += payload(dataPos + j.toInt) & 0xff
          j += 1
        }
      } else if (t(typePos, "IEND")) {
        if (len != 0L) return null
        ended = true
      }
      // every chunk's integrity is audited, known type or not
      val crc = new java.util.zip.CRC32()
      crc.update(payload, typePos, 4 + len.toInt)
      if (crc.getValue != u32(dataPos + len.toInt)) badCrc += 1L
      chunks += 1L
      pos = dataPos + len.toInt + 4
    }
    if (first || !ended || idat == 0L) return null
    new GenericInternalRow(Array[Any](
      w, h, depth, colorType, chunks, idat, idatBytes, byteSum, badCrc))
  }
}

/** Codegen'd deterministic PNG payload from a bigint id — the
  * binary-image fixture column (see [[PngCodec.pngSynth]]).
  */
case class PngSynth(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${t.sql}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_synth"

  override protected def nullSafeEval(input: Any): Any =
    PngCodec.pngSynth(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PngCodec.pngSynth($c)")

  override protected def withNewChildInternal(newChild: Expression): PngSynth =
    copy(child = newChild)
}

/** Codegen'd PNG container probe of a binary column to header fields,
  * IDAT statistics, and the recomputed-CRC bitrot count (see
  * [[PngCodec.pngStats]]). Malformed payloads probe to NULL.
  */
case class PngStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${t.sql}")
  }

  override def dataType: DataType = PngCodec.decodedType
  override def nullable: Boolean = true
  override def prettyName: String = "png_stats"

  override protected def nullSafeEval(input: Any): Any =
    PngCodec.pngStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PngCodec.pngStats($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
}

/** Column-level entry points for the native PNG codec. */
object png {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Deterministic tiny PNG payload for a bigint id column. */
  def pngSynth(c: Column): Column =
    Bridge.column(PngSynth(Bridge.expression(c)))

  /** Probe a PNG binary column; malformed -> NULL, bitrot counted. */
  def pngStats(c: Column): Column =
    Bridge.column(PngStats(Bridge.expression(c)))
}
