package graft

import graft.functions.AviCodec

/** Kernel corners of the RIFF/AVI container prober
  * (functions/VideoExpressions.scala). q201's DuckDB oracle gates
  * the synth->probe round trip over the corpus; this suite proves
  * the PROBER is a real container parser — it walks layouts the
  * synthesizer never emits (strl/INFO lists, db frame chunks, index
  * disagreements, trailing chunks) and rejects every malformed
  * shape as NULL instead of throwing.
  */
class AviCodecSpec extends SparkSpec {

  private def probe(payload: Array[Byte]) =
    Option(AviCodec.aviStats(payload))

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def tag(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Hand-build an AVI with an explicit chunk list; riffSize is
    * computed. Chunks must already carry their own pad bytes.
    */
  private def avi(chunks: Array[Byte]*): Array[Byte] = {
    val body = tag("AVI ") ++ chunks.flatten
    tag("RIFF") ++ le32(body.length) ++ body
  }

  private def avihList(usPf: Int, frames: Int, w: Int, h: Int): Array[Byte] = {
    val avih = tag("avih") ++ le32(56) ++ le32(usPf) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    tag("LIST") ++ le32(4 + avih.length) ++ tag("hdrl") ++ avih
  }

  private def frame(fourcc: String, bytes: Array[Byte]): Array[Byte] = {
    val pad = if (bytes.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    tag(fourcc) ++ le32(bytes.length) ++ bytes ++ pad
  }

  private def moviList(frames: Array[Byte]*): Array[Byte] = {
    val body = tag("movi") ++ frames.flatten
    tag("LIST") ++ le32(body.length) ++ body
  }

  private def idx1(n: Int): Array[Byte] =
    tag("idx1") ++ le32(n * 16) ++
      Array.fill(n)(tag("00dc") ++ le32(0x10) ++ le32(0) ++ le32(3)).flatten

  test("synth->probe round trip recovers the closed form for ids 0..99") {
    (0L until 100L).foreach { id =>
      val row = probe(AviCodec.aviSynth(id)).get
      val w = 16 + (id % 7).toInt
      val h = 9 + (id % 5).toInt
      val frames = 5 + (id % 6)
      val usPf = 33333 + (id % 3).toInt * 8334
      assert(row.getInt(0) == w && row.getInt(1) == h)
      assert(row.getInt(2) == usPf)
      assert(row.getLong(3) == frames && row.getLong(4) == frames &&
        row.getLong(5) == frames)
      val expBytes = (0L until frames).map(k => 3 + (id + k) % 4).sum
      assert(row.getLong(6) == expBytes, s"id=$id frame_bytes")
      val expSum = (0L until frames).flatMap(k =>
        (0L until (3 + (id + k) % 4)).map(j => (id * 31 + k * 17 + j * 7) % 251)).sum
      assert(row.getLong(7) == expSum, s"id=$id byte_sum")
      assert(row.getLong(8) == frames * usPf / 1000L)
    }
  }

  test("unknown lists and db frames: strl/INFO skipped, ??db counted") {
    val strl = tag("LIST") ++ le32(4) ++ tag("strl") // empty stream list
    val p = avi(avihList(40000, 2, 320, 240), strl,
      moviList(frame("00dc", Array[Byte](1, 2, 3)),
        frame("01db", Array[Byte](4, 5))),
      idx1(2))
    val row = probe(p).get
    assert(row.getLong(4) == 2L, "both dc and db frames count")
    assert(row.getLong(6) == 5L && row.getLong(7) == (1 + 2 + 3 + 4 + 5).toLong)
    assert(row.getLong(5) == 2L)
  }

  test("index disagreement is REPORTED, not rejected") {
    val p = avi(avihList(40000, 5, 320, 240), // declares 5
      moviList(frame("00dc", Array[Byte](9))), // carries 1
      idx1(3)) // indexes 3
    val row = probe(p).get
    assert(row.getLong(3) == 5L && row.getLong(4) == 1L && row.getLong(5) == 3L)
  }

  test("odd-size frames honor the RIFF pad byte") {
    val p = avi(avihList(40000, 2, 64, 48),
      moviList(frame("00dc", Array[Byte](1, 2, 3)), // odd: padded
        frame("00dc", Array[Byte](7, 7, 7, 7))))
    val row = probe(p).get
    assert(row.getLong(4) == 2L && row.getLong(6) == 7L)
    assert(row.getLong(7) == (1 + 2 + 3 + 28).toLong)
  }

  test("malformed shapes are NULL: magic, truncation, ordering, idx size") {
    val good = AviCodec.aviSynth(5L)
    assert(probe(good).isDefined)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(probe(badMagic).isEmpty)
    // RIFF size that does not cover the file
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte
    assert(probe(badSize).isEmpty)
    // truncations at every prefix length never throw
    (0 until good.length).foreach(n => probe(good.take(n)))
    // movi before hdrl -> null
    val reordered = avi(
      moviList(frame("00dc", Array[Byte](1))),
      avihList(40000, 1, 64, 48))
    assert(probe(reordered).isEmpty)
    // idx1 size not a multiple of 16 -> null
    val badIdx = avi(avihList(40000, 1, 64, 48),
      moviList(frame("00dc", Array[Byte](1))),
      tag("idx1") ++ le32(10) ++ Array.fill(10)(0.toByte))
    assert(probe(badIdx).isEmpty)
    // zero dimensions -> null
    assert(probe(avi(avihList(40000, 1, 0, 48),
      moviList(frame("00dc", Array[Byte](1))))).isEmpty)
  }

  test("the codegen column form probes the corpus without a UDF") {
    val s = spark
    import s.implicits._
    val df = (0L until 50L).toDF("id")
      .select(graft.functions.video.aviStats(
        graft.functions.video.aviSynth(org.apache.spark.sql.functions.col("id")))
        .as("v"))
    assert(df.filter("v IS NULL").count() == 0L)
    assert(df.selectExpr("SUM(v.n_frames)").head().getLong(0) ==
      (0L until 50L).map(id => 5 + id % 6).sum)
  }
}
