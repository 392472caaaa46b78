package graft

import graft.functions.WavCodec

/** Kernel corners of the RIFF/WAVE codec (functions/AudioExpressions
  * .scala). q179's DuckDB oracle gates the synth->decode round trip
  * over the corpus; this suite proves the DECODER is a real container
  * parser — it walks chunk layouts the synthesizer never emits
  * (unknown chunks before fmt/data, odd-size pad bytes, trailing
  * chunks after data) and rejects every malformed shape as NULL
  * instead of throwing.
  */
class WavCodecSpec extends SparkSpec {

  private def decode(payload: Array[Byte]) =
    Option(WavCodec.wavStats(payload))

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def tag(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Hand-build a WAV with explicit chunk list; riffSize is computed. */
  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = tag("WAVE") ++ chunks.flatten
    tag("RIFF") ++ le32(body.length) ++ body
  }

  private def fmtChunk(ch: Int, rate: Int, bits: Int = 16,
      format: Int = 1): Array[Byte] =
    tag("fmt ") ++ le32(16) ++ le16(format) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * (bits / 8)) ++ le16(ch * (bits / 8)) ++ le16(bits)

  private def dataChunk(samples: Seq[Int]): Array[Byte] =
    tag("data") ++ le32(samples.length * 2) ++
      samples.toArray.flatMap(le16)

  test("synth->decode round trip recovers the closed form for ids 0..99") {
    (0L until 100L).foreach { id =>
      val row = decode(WavCodec.wavSynth(id)).get
      val ch = if (id % 5 == 0) 1 else 2
      val rate = 8000 + (id % 3).toInt * 4000
      val frames = 16 + (id % 9).toInt
      assert(row.getInt(0) == ch && row.getInt(1) == rate)
      assert(row.getInt(2) == 16 && row.getLong(3) == frames.toLong)
      assert(row.getLong(4) == frames.toLong * 1000 / rate)
      var (sl, sr, peak, energy) = (0L, 0L, 0L, 0L)
      for (k <- 0 until frames) {
        val s0 = (id * 37 + k * 101L) % 4001L - 2000L
        sl += s0; peak = peak.max(math.abs(s0)); energy += s0 * s0
        if (ch == 2) {
          val s1 = (id * 53 + k * 67L) % 4001L - 2000L
          sr += s1; peak = peak.max(math.abs(s1)); energy += s1 * s1
        }
      }
      assert(row.getLong(5) == sl && row.getLong(6) == sr, s"id=$id")
      assert(row.getInt(7) == peak.toInt && row.getLong(8) == energy, s"id=$id")
    }
  }

  test("decoder walks chunk layouts the synthesizer never emits") {
    // LIST chunk with an ODD size (pad byte) before fmt, a fact chunk
    // between fmt and data, and a trailing chunk after data
    val list = tag("LIST") ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val fact = tag("fact") ++ le32(4) ++ le32(3)
    val trailer = tag("junk") ++ le32(2) ++ Array[Byte](9, 9)
    val d = dataChunk(Seq(100, -200 & 0xffff, 300, -400 & 0xffff))
    val row = decode(wav(list, fmtChunk(2, 8000), fact, d, trailer)).get
    assert(row.getInt(0) == 2 && row.getLong(3) == 2L)
    assert(row.getLong(5) == 100L + 300L) // left channel
    assert(row.getLong(6) == -200L - 400L) // right channel
    assert(row.getInt(7) == 400)
    assert(row.getLong(8) == 100L * 100 + 200L * 200 + 300L * 300 + 400L * 400)
    // mono: every sample lands in sum_l, sum_r stays 0
    val mono = decode(wav(fmtChunk(1, 16000),
      dataChunk(Seq(-1 & 0xffff, 2, -3 & 0xffff)))).get
    assert(mono.getInt(0) == 1 && mono.getLong(5) == -2L)
    assert(mono.getLong(6) == 0L && mono.getInt(7) == 3)
    // negative int16 sign extension: 0x8000 = -32768
    val ext = decode(wav(fmtChunk(1, 8000), dataChunk(Seq(0x8000)))).get
    assert(ext.getLong(5) == -32768L && ext.getInt(7) == 32768)
  }

  test("malformed payloads decode to NULL, never throw") {
    val good = wav(fmtChunk(1, 8000), dataChunk(Seq(1, 2)))
    assert(decode(good).nonEmpty)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "bad magic" -> tag("RIFX").++(good.drop(4)),
      "not WAVE" -> (good.take(8) ++ tag("AVI ") ++ good.drop(12)),
      "riff size lies" -> (good.take(4) ++ le32(9999) ++ good.drop(8)),
      "riff shorter than declared" -> good.dropRight(1),
      "chunk size exceeds payload" -> // riffSize honest, fmt lies
        wav(tag("fmt ") ++ le32(100) ++ fmtChunk(1, 8000).drop(8)),
      "data before fmt" -> wav(dataChunk(Seq(1, 2)), fmtChunk(1, 8000)),
      "no data chunk" -> wav(fmtChunk(1, 8000)),
      "non-PCM format" -> wav(fmtChunk(1, 8000, format = 3),
        dataChunk(Seq(1, 2))),
      "8-bit samples" -> wav(fmtChunk(1, 8000, bits = 8),
        dataChunk(Seq(1, 2))),
      "3 channels" -> wav(fmtChunk(3, 8000), dataChunk(Seq(1, 2, 3))),
      "zero rate" -> wav(fmtChunk(1, 0), dataChunk(Seq(1, 2))),
      "partial frame (stereo, odd sample count)" ->
        wav(fmtChunk(2, 8000), dataChunk(Seq(1, 2, 3))),
      "empty data chunk" -> wav(fmtChunk(1, 8000), dataChunk(Seq.empty)))
    cases.foreach { case (label, payload) =>
      assert(decode(payload).isEmpty, label)
    }
  }

  test("the expressions run in SQL and NULL propagates through the struct") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val out = Seq(0L, 1L, 7L, 10L).toDF("id")
      .selectExpr("id", "wav_stats(wav_synth(id)) AS au",
        "wav_stats(CAST('junk' AS BINARY)) AS bad")
      .selectExpr("id", "au.channels", "au.sample_rate", "bad")
      .collect()
    out.foreach { r =>
      assert(!r.isNullAt(1) && r.isNullAt(3))
      assert(r.getInt(1) == (if (r.getLong(0) % 5 == 0) 1 else 2))
      assert(r.getInt(2) == 8000 + (r.getLong(0) % 3).toInt * 4000)
    }
  }
}
