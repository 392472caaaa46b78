package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** A multimodal record: opaque binary payload + typed metadata — the
  * schema shape for image/audio/video columns at scale (the payload
  * stays an opaque blob through the relational plan; only the decode
  * stage touches bytes).
  */
final case class MediaRecord(doc_id: Long, lang: String, payload: Array[Byte])

/** Extracted features; the decode step is a deterministic STUB (no
  * image/audio codecs in this environment) — the Spark-side plumbing
  * (schema, partition-parallel batch iteration, feature schema) is
  * real and oracle-checked.
  */
final case class MediaFeatures(doc_id: Long, n_bytes: Int, fp60: Long, head_sum: Long)

/** Multimodal-column operators (SURVEY.md §2.2 EXT): treat content as
  * opaque `binary` with typed metadata; decode/feature-extract runs
  * partition-parallel over the binary column via typed mapPartitions
  * (the Scala analog of a batched Pandas UDF: one iterator per
  * partition, record batches in, record batches out, never through the
  * driver).
  */
object Multimodal {

  // ---------------------------------------------------------------
  // q33: bundle text + embedding + metadata into one multimodal row:
  // documents joined to embeddings on id, the text encoded to a binary
  // payload column (standing in for image/audio bytes), plus payload
  // metadata. Broadcast-free equi-join on ids; both sides co-keyed.
  // ---------------------------------------------------------------
  def q33MultimodalBundle(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val e = embeddings(s, dir)
    val emb = col("embedding").cast("array<double>")
    d.join(e, d("doc_id") === e("vec_id"))
      .select(
        col("doc_id"), col("lang"), col("label"),
        octet_length(to_binary(col("text"), lit("utf-8"))).as("n_bytes"),
        md5(to_binary(col("text"), lit("utf-8"))).as("payload_md5"),
        round(sqrt(aggregate(zip_with(emb, emb, (x, y) => x * y),
          lit(0.0), (s2, x) => s2 + x)), 4).as("emb_norm"))
      .orderBy("doc_id")
  }

  val q33Sql: String =
    """SELECT d.doc_id AS doc_id, d.lang AS lang, e.label AS label,
      |  strlen(d.text) AS n_bytes,
      |  md5(d.text) AS payload_md5,
      |  ROUND(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
      |                              CAST(e.embedding AS DOUBLE[]))), 4) AS emb_norm
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q35: the decode/feature-extract stage: binary payloads flow
  // through typed mapPartitions; the per-batch "decoder" here is a
  // deterministic stub (byte length, md5-derived 60-bit fingerprint,
  // sum of the first 8 bytes) standing in for a real image/audio
  // decode, so the oracle can verify the plumbing end-to-end.
  // ---------------------------------------------------------------
  def q35MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        // partition-local "decoder" init (a real codec would open here)
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          val hex = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaFeatures(
            doc_id = r.doc_id,
            n_bytes = r.payload.length,
            fp60 = java.lang.Long.parseLong(hex.substring(0, 15), 16),
            head_sum = r.payload.take(8).map(_.toLong & 0xffL).sum)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val q35Sql: String =
    """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
      |  CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp60,
      |  CAST(list_sum(list_transform(range(8), i -> ord(substr(text, CAST(i+1 AS INT), 1)))) AS BIGINT) AS head_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q40: frame sampling — the 1-to-N generator over a binary payload
  // (video -> frames / audio -> windows): every k-th fixed-size slice
  // of the payload becomes a row with (frame_idx, frame_bytes,
  // frame fingerprint). The "decode" is again a stub (byte slicing
  // stands in for codec frame extraction); the explode plumbing,
  // per-frame schema and fingerprints are real and oracle-checked.
  // ---------------------------------------------------------------
  private val FrameSize = 32
  private val FrameStride = 64 // sample every 2nd frame

  def q40FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        // stub frame extraction: fixed-size strided slices
        Iterator.range(0, payload.length - FrameSize + 1, FrameStride).map { off =>
          val frame = java.util.Arrays.copyOfRange(payload, off, off + FrameSize)
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(frame).map("%02x".format(_)).mkString
          (id, off / FrameStride, frame.length, hex)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_len", "frame_md5")
      .orderBy("doc_id", "frame_idx")
  }

  val q40Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    unnest(range((strlen(text) - $FrameSize) // $FrameStride + 1)) AS i
       |  FROM documents WHERE strlen(text) >= $FrameSize
       |)
       |SELECT doc_id, CAST(i AS INT) AS frame_idx, $FrameSize AS frame_len,
       |  md5(substr(text, CAST(i*$FrameStride + 1 AS INT), $FrameSize)) AS frame_md5
       |FROM f
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------
  // q104: RESIZE/transcode — the remaining multimodal verb after
  // bundle (q33), decode/feature-extract (q35) and frame-sample
  // (q40): payload in, smaller payload out, metadata updated. The
  // "resampler" stub keeps every 3rd UNIT of the payload (a real
  // image resize would decode, filter, re-encode here — same batch
  // shape); output carries before/after sizes and the md5 of the
  // RESIZED payload so the oracle verifies the transcoded content,
  // not just its size. The unit is a Unicode codepoint, decoded
  // surrogate-safely from the payload bytes — byte-strided sampling
  // would diverge from the oracle's character semantics the moment a
  // multi-byte character appears (DuckDB substr counts characters).
  // Typed mapPartitions again: partition-parallel, one codec init per
  // partition, no driver involvement.
  // ---------------------------------------------------------------
  def q104Resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          val cps = new String(r.payload,
            java.nio.charset.StandardCharsets.UTF_8).codePoints().toArray
          val kept = Array.tabulate((cps.length + 2) / 3)(i => cps(3 * i))
          val rs = new String(kept, 0, kept.length)
          val hex = md.digest(
            rs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          (r.doc_id, cps.length, kept.length, hex)
        }
      }
      .toDF("doc_id", "orig_units", "new_units", "resized_md5")
      .orderBy("doc_id")
  }

  val q104Sql: String =
    """WITH r AS (
      |  SELECT doc_id, length(text) AS ou,
      |    array_to_string(list_transform(range((length(text)+2)//3),
      |      i -> substr(text, CAST(3*i+1 AS INT), 1)), '') AS rs
      |  FROM documents
      |)
      |SELECT doc_id, CAST(ou AS INT) AS orig_units,
      |  CAST(length(rs) AS INT) AS new_units, md5(rs) AS resized_md5
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q131: binary payload NEAR-dup via fixed-block signatures — how
  // storage/media dedup works on opaque bytes (no tokens to shingle):
  // split each payload into fixed 32-byte blocks, hash each block,
  // and call two payloads near-dup when the smaller one's block set
  // is ≥80% contained in the other — robust to local edits, which
  // disturb only the blocks they touch. Candidates are blocked on
  // the MIN block hash (the q25 prefix filter applied to bytes), so
  // no all-pairs stage; containment is exact int64 (5·inter ≥
  // 4·min). Payloads here are the q33 to_binary(text) stand-ins, so
  // the 32-byte blocks are 32-char substrings in both engines.
  // ---------------------------------------------------------------
  def q131PayloadBlocks(s: SparkSession, dir: String): DataFrame = {
    val nBlocks = ceil(length(col("text")) / 32.0).cast("int")
    // empty-payload guard: sequence(0, -1) would DESCEND ([0, -1])
    // and fabricate a phantom md5('') block that the oracle's empty
    // range never builds; an empty block set gives mk = NULL, which
    // never joins — identical to the oracle's behavior
    val blocks = when(length(col("text")) > 0,
      array_distinct(transform(sequence(lit(0), nBlocks - 1),
        i => md5(col("text").substr(lit(1) + i * 32, lit(32))))))
      .otherwise(array().cast("array<string>"))
    val d = documents(s, dir)
      .select(col("doc_id"), blocks.as("bl"))
      .withColumn("mk", array_min(col("bl")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    touch(d) // eager (q25's race note)
    val a = d.alias("a")
    val b = d.alias("b")
    val inter = graft.functions.setcard
      .intersectSize(col("a.bl"), col("b.bl")).cast("long")
    val nmin = least(size(col("a.bl")), size(col("b.bl"))).cast("long")
    a.join(b, col("a.mk") === col("b.mk") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", inter)
      .withColumn("nmin", nmin)
      .filter(col("inter") * 5L >= col("nmin") * 4L)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("inter").as("shared_blocks"), col("nmin").as("min_blocks"),
        Relational.ratio4(col("inter"), col("nmin")).as("containment"))
      .orderBy("i", "j")
  }

  val q131Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(CAST(ceil(length(text) / 32.0) AS BIGINT)),
      |      i -> md5(substr(text, CAST(1 + i*32 AS INT), 32)))) AS bl
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, bl, list_aggregate(bl, 'min') AS mk FROM d
      |)
      |SELECT a.doc_id AS i, b.doc_id AS j,
      |  CAST(len(list_intersect(a.bl, b.bl)) AS BIGINT) AS shared_blocks,
      |  CAST(least(len(a.bl), len(b.bl)) AS BIGINT) AS min_blocks,
      |  ((20000*CAST(len(list_intersect(a.bl, b.bl)) AS BIGINT)
      |      + least(len(a.bl), len(b.bl)))
      |    // (2*CAST(least(len(a.bl), len(b.bl)) AS BIGINT))) / 10000.0
      |    AS containment
      |FROM m a JOIN m b ON a.mk = b.mk AND a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.bl, b.bl)) * 5
      |      >= least(len(a.bl), len(b.bl)) * 4
      |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------
  // q177: REAL image decode — the q35 feature stage with an actual
  // self-describing format behind it (round-5 verdict, Missing item
  // 2): every document gets a deterministic netpbm payload (P6
  // color; P5 grayscale for doc_id % 7 == 0 — synthesized from
  // doc_id because the testdata carries no binary media column),
  // and the native codegen'd decoder (`functions/MediaExpressions
  // .scala`) recovers width/height/maxval/channels and exact-int64
  // channel sums FROM THE BYTES: magic, whitespace/comment-tolerant
  // header parse, raster walk, malformed -> NULL. The oracle
  // replicates the closed-form pixel arithmetic, so a decoder that
  // misparses the header or walks the raster wrong hash-mismatches.
  // Scale shape: synth+decode in one whole-stage-codegen projection
  // over a doc_id-only scan — zero shuffle, zero Scala UDF, no
  // object (de)serialization; per-lang aggregation is partial-agg.
  // ---------------------------------------------------------------
  def q177ImageDecode(s: SparkSession, dir: String): DataFrame = {
    val dec = graft.functions.media
      .ppmDecode(graft.functions.media.ppmSynth(col("doc_id")))
    documents(s, dir)
      .select(col("doc_id"), dec.as("img"))
      .select(col("doc_id"),
        col("img.width").as("width"), col("img.height").as("height"),
        col("img.maxval").as("maxval"), col("img.channels").as("channels"),
        col("img.n_px").as("n_px"), col("img.sum_r").as("sum_r"),
        col("img.sum_g").as("sum_g"), col("img.sum_b").as("sum_b"),
        col("img.mean_x100").as("mean_x100"))
      .orderBy("doc_id")
  }

  val q177Sql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
      |    CAST(3 + doc_id % 4 AS INT) AS h,
      |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 3 END AS ch
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, ch,
      |    CAST(p % w AS BIGINT) AS x, CAST(p // w AS BIGINT) AS y
      |  FROM t, unnest(range(CAST(w AS BIGINT) * h)) r(p)
      |), s AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN ch = 1 THEN (doc_id*29 + x*7 + y*13) % 256
      |             ELSE (doc_id*31 + x*7 + y*13) % 256 END) AS BIGINT) AS sum_r,
      |    CAST(SUM(CASE WHEN ch = 1 THEN 0
      |             ELSE (doc_id*17 + x*5 + y*11) % 256 END) AS BIGINT) AS sum_g,
      |    CAST(SUM(CASE WHEN ch = 1 THEN 0
      |             ELSE (doc_id*23 + x*3 + y*19) % 256 END) AS BIGINT) AS sum_b
      |  FROM px GROUP BY doc_id
      |)
      |SELECT t.doc_id AS doc_id, w AS width, h AS height,
      |  255 AS maxval, ch AS channels, CAST(w AS BIGINT) * h AS n_px,
      |  sum_r, sum_g, sum_b,
      |  CAST((sum_r + sum_g + sum_b) * 100
      |    // (CAST(w AS BIGINT) * h * ch) AS BIGINT) AS mean_x100
      |FROM t JOIN s ON t.doc_id = s.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q179: REAL audio decode — the audio sibling of q177's image
  // kernel: every document gets a deterministic RIFF/WAVE PCM16
  // payload (mono for doc_id % 5 == 0, interleaved stereo otherwise;
  // rates cycle 8000/12000/16000, frame counts 16..24 — synthesized
  // from doc_id because the testdata carries no binary audio
  // column), and the native codegen'd decoder
  // (`functions/AudioExpressions.scala`) recovers channel count /
  // sample rate / frame count / duration and exact-int64 sample
  // statistics FROM THE BYTES: RIFF chunk walk (unknown chunks
  // skipped with the odd-size pad honored), PCM16 fmt validation,
  // interleaved sample scan, malformed -> NULL. The oracle
  // replicates the closed-form sample arithmetic, so a decoder that
  // misreads the header, de-interleaves wrong, or sign-extends wrong
  // hash-mismatches (samples span negative int16 territory on
  // purpose). Scale shape: synth+decode in one whole-stage-codegen
  // projection over a doc_id-only scan — zero shuffle, zero Scala
  // UDF; the per-payload scan is O(bytes), embarrassingly parallel.
  // ---------------------------------------------------------------
  def q179AudioDecode(s: SparkSession, dir: String): DataFrame = {
    val dec = graft.functions.audio
      .wavStats(graft.functions.audio.wavSynth(col("doc_id")))
    documents(s, dir)
      .select(col("doc_id"), dec.as("au"))
      .select(col("doc_id"),
        col("au.channels").as("channels"),
        col("au.sample_rate").as("sample_rate"),
        col("au.bits").as("bits"), col("au.n_frames").as("n_frames"),
        col("au.dur_ms").as("dur_ms"), col("au.sum_l").as("sum_l"),
        col("au.sum_r").as("sum_r"), col("au.peak").as("peak"),
        col("au.energy").as("energy"))
      .orderBy("doc_id")
  }

  val q179Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END AS ch,
      |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
      |    16 + doc_id % 9 AS frames
      |  FROM documents
      |), smp AS (
      |  SELECT doc_id, ch,
      |    (doc_id*37 + k*101) % 4001 - 2000 AS s0,
      |    CASE WHEN ch = 2 THEN (doc_id*53 + k*67) % 4001 - 2000 END AS s1
      |  FROM t, unnest(range(frames)) r(k)
      |), agg AS (
      |  SELECT doc_id,
      |    CAST(SUM(s0) AS BIGINT) AS sum_l,
      |    CAST(COALESCE(SUM(s1), 0) AS BIGINT) AS sum_r,
      |    CAST(MAX(GREATEST(abs(s0), COALESCE(abs(s1), 0))) AS INT) AS peak,
      |    CAST(SUM(s0*s0 + COALESCE(s1*s1, 0)) AS BIGINT) AS energy
      |  FROM smp GROUP BY doc_id
      |)
      |SELECT t.doc_id AS doc_id, ch AS channels, rate AS sample_rate,
      |  16 AS bits, CAST(frames AS BIGINT) AS n_frames,
      |  CAST(frames * 1000 // rate AS BIGINT) AS dur_ms,
      |  sum_l, sum_r, peak, energy
      |FROM t JOIN agg ON t.doc_id = agg.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q201: VIDEO CONTAINER probe — the third media modality: q177
  // decodes an image raster, q179 a PCM audio stream; this walks a
  // RIFF/AVI container (`functions/VideoExpressions.scala`) — header
  // grammar, LIST recursion (hdrl/movi), frame-chunk census with the
  // odd-size pad rule, idx1 entry count — all inside whole-stage
  // codegen, with the per-frame payloads treated as opaque bytes
  // (checksummed, not decoded: codec bitstreams are out of scope by
  // design, the container walk is what a frame-sampling or
  // quality-gating corpus job runs). Self-describing audit columns:
  // declared_frames (header) NEXT TO n_frames (counted) and n_idx
  // (index entries) — at corpus scale the disagreements ARE the
  // signal. Payloads synthesize from doc_id (no binary video column
  // in testdata) by a closed form the oracle replays; ids % 4 == 0
  // carry a JUNK chunk so the skip path runs on canonical data.
  // Malformed bytes probe to NULL (poison-row contract, fuzzed in
  // CodecFuzzSpec).
  // ---------------------------------------------------------------
  def q201VideoProbe(s: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.video
      .aviStats(graft.functions.video.aviSynth(col("doc_id")))
    documents(s, dir)
      .select(col("doc_id"), st.as("v"))
      .select(col("doc_id"),
        col("v.width").as("width"), col("v.height").as("height"),
        col("v.us_per_frame").as("us_per_frame"),
        col("v.declared_frames").as("declared_frames"),
        col("v.n_frames").as("n_frames"), col("v.n_idx").as("n_idx"),
        col("v.frame_bytes").as("frame_bytes"),
        col("v.byte_sum").as("byte_sum"), col("v.dur_ms").as("dur_ms"))
      .orderBy("doc_id")
  }

  val q201Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(16 + doc_id % 7 AS INT) AS width,
      |    CAST(9 + doc_id % 5 AS INT) AS height,
      |    CAST(33333 + (doc_id % 3) * 8334 AS INT) AS us_per_frame,
      |    5 + doc_id % 6 AS frames
      |  FROM documents
      |), fb AS (
      |  SELECT doc_id, r.k, 3 + (doc_id + r.k) % 4 AS fl
      |  FROM t, unnest(range(frames)) r(k)
      |), bs AS (
      |  SELECT f.doc_id,
      |    CAST(SUM((f.doc_id*31 + f.k*17 + j.j*7) % 251) AS BIGINT) AS byte_sum
      |  FROM fb f, unnest(range(f.fl)) j(j)
      |  GROUP BY f.doc_id
      |), agg AS (
      |  SELECT doc_id, CAST(SUM(fl) AS BIGINT) AS frame_bytes
      |  FROM fb GROUP BY doc_id
      |)
      |SELECT t.doc_id AS doc_id, width, height, us_per_frame,
      |  CAST(frames AS BIGINT) AS declared_frames,
      |  CAST(frames AS BIGINT) AS n_frames,
      |  CAST(frames AS BIGINT) AS n_idx,
      |  agg.frame_bytes, bs.byte_sum,
      |  CAST(frames AS BIGINT) * us_per_frame // 1000 AS dur_ms
      |FROM t JOIN agg ON agg.doc_id = t.doc_id
      |JOIN bs ON bs.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q214: PNG probe with CRC-32 BITROT audit — the media family's
  // integrity leg (q177 netpbm decodes, q179 WAV decodes, q201 AVI
  // walks structure; none can SEE silent corruption): every PNG
  // chunk carries a CRC-32 over type+data, so the probe recomputes
  // it per chunk and counts mismatches per row — three separable
  // failure classes at corpus scale: structurally broken (NULL,
  // poison-row contract), valid-but-bitrotten (n_bad_crc > 0, the
  // storage-sweep signal), clean. Big-endian chunk walk, IHDR-first
  // / IEND-last ordering, ancillary-chunk skip, IDAT checksummed
  // not inflated — all inside whole-stage codegen
  // (functions/PngExpressions.scala). Payloads are synthesized
  // deterministically from doc_id (q201's fixture discipline) and
  // the oracle replays the closed form arithmetically; the prober
  // must recover everything from the BYTES, CRCs included.
  // CodecFuzzSpec's mutation property leans on CRC-32 detecting
  // every single-bit flip.
  // ---------------------------------------------------------------
  def q214PngProbe(s: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.png
      .pngStats(graft.functions.png.pngSynth(col("doc_id")))
    documents(s, dir)
      .select(col("doc_id"), st.as("p"))
      .select(col("doc_id"),
        col("p.width").as("width"), col("p.height").as("height"),
        col("p.bit_depth").as("bit_depth"),
        col("p.color_type").as("color_type"),
        col("p.n_chunks").as("n_chunks"), col("p.n_idat").as("n_idat"),
        col("p.idat_bytes").as("idat_bytes"),
        col("p.byte_sum").as("byte_sum"),
        col("p.n_bad_crc").as("n_bad_crc"))
      .orderBy("doc_id")
  }

  val q214Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS INT) AS width,
      |    CAST(6 + doc_id % 7 AS INT) AS height,
      |    CAST((doc_id % 2) * 2 AS INT) AS color_type,
      |    1 + doc_id % 3 AS nd,
      |    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS has_text
      |  FROM documents
      |), ik AS (
      |  SELECT doc_id, r.k, 4 + (doc_id + r.k) % 5 AS len
      |  FROM t, unnest(range(nd)) r(k)
      |), bs AS (
      |  SELECT i.doc_id,
      |    CAST(SUM((i.doc_id*37 + i.k*13 + j.j*5) % 241) AS BIGINT) AS byte_sum
      |  FROM ik i, unnest(range(i.len)) j(j)
      |  GROUP BY i.doc_id
      |), agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_idat,
      |    CAST(SUM(len) AS BIGINT) AS idat_bytes
      |  FROM ik GROUP BY doc_id
      |)
      |SELECT t.doc_id AS doc_id, width, height,
      |  CAST(8 AS INT) AS bit_depth, color_type,
      |  CAST(2 + agg.n_idat + has_text AS BIGINT) AS n_chunks,
      |  agg.n_idat, agg.idat_bytes, bs.byte_sum,
      |  CAST(0 AS BIGINT) AS n_bad_crc
      |FROM t JOIN agg USING (doc_id) JOIN bs USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q214_png_probe" -> q214PngProbe _,
    "q201_video_probe" -> q201VideoProbe _,
    "q179_audio_decode" -> q179AudioDecode _,
    "q177_image_decode" -> q177ImageDecode _,
    "q131_payload_blocks" -> q131PayloadBlocks _,
    "q33_multimodal_bundle" -> q33MultimodalBundle _,
    "q35_multimodal_features" -> q35MultimodalFeatures _,
    "q40_frame_sample" -> q40FrameSample _,
    "q104_resize" -> q104Resize _)

  val oracles: Map[String, String] = Map(
    "q214_png_probe" -> q214Sql,
    "q201_video_probe" -> q201Sql,
    "q179_audio_decode" -> q179Sql,
    "q177_image_decode" -> q177Sql,
    "q131_payload_blocks" -> q131Sql,
    "q33_multimodal_bundle" -> q33Sql,
    "q35_multimodal_features" -> q35Sql,
    "q40_frame_sample" -> q40Sql,
    "q104_resize" -> q104Sql)
}
