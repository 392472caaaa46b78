package graft

import org.apache.spark.sql.functions._
import graft.functions.MediaCodec

/** Kernel corners of the netpbm codec (functions/MediaExpressions
  * .scala). q177's DuckDB oracle gates the synth->decode round trip
  * over the corpus; this suite proves the DECODER is a real parser —
  * it accepts the full header grammar the synthesizer never emits
  * (comments, arbitrary whitespace, maxval != 255) and rejects every
  * malformed shape as NULL instead of throwing.
  */
class MediaCodecSpec extends SparkSpec {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def decode(payload: Array[Byte]) =
    Option(MediaCodec.ppmDecode(payload))

  test("synth->decode round trip recovers the closed form for ids 0..99") {
    (0L until 100L).foreach { id =>
      val row = decode(MediaCodec.ppmSynth(id)).get
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val gray = id % 7 == 0
      assert(row.getInt(0) == w && row.getInt(1) == h)
      assert(row.getInt(2) == 255)
      assert(row.getInt(3) == (if (gray) 1 else 3))
      assert(row.getLong(4) == w.toLong * h)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (p <- 0 until w * h) {
        val x = p % w
        val y = p / w
        if (gray) er += (id * 29 + x * 7 + y * 13) % 256
        else {
          er += (id * 31 + x * 7 + y * 13) % 256
          eg += (id * 17 + x * 5 + y * 11) % 256
          eb += (id * 23 + x * 3 + y * 19) % 256
        }
      }
      assert(row.getLong(5) == er && row.getLong(6) == eg && row.getLong(7) == eb,
        s"id=$id")
      val ch = if (gray) 1 else 3
      assert(row.getLong(8) == (er + eg + eb) * 100 / (w.toLong * h * ch))
    }
  }

  test("decoder accepts the full header grammar, not just the synth's canonical form") {
    // comments, repeated whitespace, CR/tab separators, maxval 99 —
    // none of which ppmSynth emits
    val raster = Array[Byte](10, 20, 30, 40, 50, 60)
    val fancy = ascii("P6 # magic comment\n# full-line comment\n  2\t1 \r# dims done\n99\n") ++ raster
    val row = decode(fancy).get
    assert(row.getInt(0) == 2 && row.getInt(1) == 1 && row.getInt(2) == 99)
    assert(row.getInt(3) == 3 && row.getLong(4) == 2L)
    assert(row.getLong(5) == 10L + 40L)
    assert(row.getLong(6) == 20L + 50L)
    assert(row.getLong(7) == 30L + 60L)
    // P5: one byte per pixel, gray lands in sum_r
    val p5 = ascii("P5\n3 2\n255\n") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val g = decode(p5).get
    assert(g.getInt(3) == 1 && g.getLong(5) == 21L)
    assert(g.getLong(6) == 0L && g.getLong(7) == 0L)
    assert(g.getLong(8) == 21L * 100 / 6)
  }

  test("malformed payloads decode to NULL, never throw") {
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "bad magic" -> (ascii("P7\n1 1\n255\n") ++ Array[Byte](1, 2, 3)),
      "text form P3" -> ascii("P3\n1 1\n255\n1 2 3\n"),
      "missing maxval" -> (ascii("P6\n1 1\n") ++ Array[Byte](1, 2, 3)),
      "maxval 0" -> (ascii("P6\n1 1\n0\n") ++ Array[Byte](1, 2, 3)),
      "maxval 65535 (2-byte samples unsupported)" ->
        (ascii("P6\n1 1\n65535\n") ++ Array[Byte](0, 1, 0, 2, 0, 3)),
      "zero width" -> (ascii("P6\n0 1\n255\n") ++ Array.emptyByteArray),
      "negative-ish (non-digit) dim" ->
        (ascii("P6\n-1 1\n255\n") ++ Array[Byte](1, 2, 3)),
      "truncated raster" -> (ascii("P6\n2 2\n255\n") ++ Array[Byte](1, 2, 3)),
      "trailing junk" -> (ascii("P6\n1 1\n255\n") ++ Array[Byte](1, 2, 3, 4)),
      "header only" -> ascii("P6"),
      "comment swallows everything" -> ascii("P6 #1 1 255 then eof"))
    cases.foreach { case (label, payload) =>
      assert(decode(payload).isEmpty, label)
    }
  }

  test("the expressions run in SQL and NULL propagates through the struct") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val out = Seq(0L, 1L, 7L, 13L).toDF("id")
      .selectExpr("id", "ppm_decode(ppm_synth(id)) AS img",
        "ppm_decode(CAST('junk' AS BINARY)) AS bad")
      .selectExpr("id", "img.width", "img.channels", "bad")
      .collect()
    out.foreach { r =>
      assert(!r.isNullAt(1) && r.isNullAt(3))
      assert(r.getInt(2) == (if (r.getLong(0) % 7 == 0) 1 else 3))
    }
  }
}
