package graft

import org.apache.spark.sql.functions._

import graft.functions.{AviCodec, MediaCodec, PngCodec, WavCodec}

/** Seeded mutation fuzzing of the binary media decoders — the
  * "poisoned payload must not kill the stage" claim as a property,
  * not just hand-built corners (MediaCodecSpec / WavCodecSpec keep
  * those). Each valid synthesized payload is hit with hundreds of
  * seeded byte mutations — truncations, random byte flips, stamped
  * oversize 32-bit length fields, mid-stream garbage splices — and
  * the decode kernel must return null or a valid struct, NEVER
  * throw: at 100 TB a single corrupt blob that throws inside
  * whole-stage codegen fails the task, retries, and fails the stage
  * four attempts later.
  */
class CodecFuzzSpec extends SparkSpec {

  /** Deterministic mutation stream over a valid payload. */
  private def mutations(valid: Array[Byte], seed: Long, n: Int)
    : Iterator[(Int, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    Iterator.tabulate(n) { i =>
      val kind = rnd.nextInt(5)
      val b = valid.clone()
      val out = kind match {
        case 0 => // truncate anywhere (header, mid-chunk, last byte)
          b.take(rnd.nextInt(b.length))
        case 1 => // flip 1-4 random bytes (magic, sizes, raster alike)
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        case 2 => // stamp an oversize little-endian length field
          if (b.length >= 8) {
            val off = rnd.nextInt(b.length - 4)
            b(off) = 0xff.toByte; b(off + 1) = 0xff.toByte
            b(off + 2) = 0xff.toByte; b(off + 3) = 0x7f.toByte
          }
          b
        case 3 => // splice garbage mid-stream (shifts every later offset)
          val cut = rnd.nextInt(b.length)
          val garbage = Array.fill(1 + rnd.nextInt(16))(rnd.nextInt(256).toByte)
          b.take(cut) ++ garbage ++ b.drop(cut)
        case _ => // pure noise of a plausible size (no valid prefix at all)
          Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      }
      (i, out)
    }
  }

  private val Seeds = Seq(42L, 7L, 20260814L)
  private val PerSeed = 100 // x3 seeds = 300 mutations per format

  test("ppm decode survives 300 seeded mutations: null or struct, never a throw") {
    val valids = Seq(0L, 3L, 17L).map(MediaCodec.ppmSynth)
    Seeds.zip(valids).foreach { case (seed, valid) =>
      mutations(valid, seed, PerSeed).foreach { case (i, payload) =>
        try MediaCodec.ppmDecode(payload)
        catch {
          case e: Throwable =>
            fail(s"ppmDecode threw on seed=$seed mutation#$i " +
              s"(${payload.length} bytes): $e")
        }
      }
    }
  }

  test("wav stats survives 300 seeded mutations: null or struct, never a throw") {
    val valids = Seq(0L, 3L, 17L).map(WavCodec.wavSynth)
    Seeds.zip(valids).foreach { case (seed, valid) =>
      mutations(valid, seed, PerSeed).foreach { case (i, payload) =>
        try WavCodec.wavStats(payload)
        catch {
          case e: Throwable =>
            fail(s"wavStats threw on seed=$seed mutation#$i " +
              s"(${payload.length} bytes): $e")
        }
      }
    }
  }

  test("mutated payloads flow through the codegen expressions end to end") {
    // the kernel property again, but through the REAL execution path:
    // whole-stage codegen over a binary column, nulls expected, zero
    // task failures tolerated
    val s = spark
    import s.implicits._
    val rows = Seeds.flatMap { seed =>
      val ppm = MediaCodec.ppmSynth(seed)
      val wav = WavCodec.wavSynth(seed)
      mutations(ppm, seed, 40).map(_._2).map(p => (p, WavCodec.wavSynth(seed))) ++
        mutations(wav, seed + 1, 40).map(_._2).map(p => (MediaCodec.ppmSynth(seed), p))
    }
    graft.functions.GraftFunctions.ensureRegistered(s)
    val df = rows.toDF("img", "au")
      .selectExpr("ppm_decode(img) AS d", "wav_stats(au) AS w")
    // count() executes every decode; a throw anywhere fails the test
    val n = df.count()
    assert(n == rows.length.toLong)
    // and the valid halves actually decoded (the fuzz did not trip a
    // decoder so defensive it rejects good payloads)
    assert(df.filter(col("d").isNotNull || col("w").isNotNull).count() > 0)
  }

  test("avi probe survives 300 seeded mutations: null or struct, never a throw") {
    val valids = Seq(0L, 3L, 17L).map(AviCodec.aviSynth)
    Seeds.zip(valids).foreach { case (seed, valid) =>
      mutations(valid, seed, PerSeed).foreach { case (i, payload) =>
        try AviCodec.aviStats(payload)
        catch {
          case e: Throwable =>
            fail(s"aviStats threw on seed=$seed mutation#$i " +
              s"(${payload.length} bytes): $e")
        }
      }
    }
    // untouched payloads still probe to a struct (the fuzz did not
    // trip a prober so defensive it rejects good containers)
    valids.foreach(v => assert(AviCodec.aviStats(v) != null))
  }

  test("png probe survives 300 seeded mutations: null or struct, never a throw") {
    val valids = Seq(0L, 3L, 17L).map(PngCodec.pngSynth)
    Seeds.zip(valids).foreach { case (seed, valid) =>
      mutations(valid, seed, PerSeed).foreach { case (i, payload) =>
        try PngCodec.pngStats(payload)
        catch {
          case e: Throwable =>
            fail(s"pngStats threw on seed=$seed mutation#$i " +
              s"(${payload.length} bytes): $e")
        }
      }
    }
    valids.foreach(v => assert(PngCodec.pngStats(v) != null))
  }

  test("png CRC-32 detects EVERY single-bit flip in chunk data or crc") {
    // the integrity property the other probers cannot state: flip any
    // ONE bit anywhere after the signature and the probe must either
    // reject the structure (null) or count at least one bad CRC —
    // CRC-32 detects all single-bit errors, so a clean parse with
    // n_bad_crc == 0 on a flipped payload would be a prober bug
    Seq(1L, 4L, 9L).foreach { id =>
      val valid = PngCodec.pngSynth(id)
      assert(PngCodec.pngStats(valid).getLong(8) == 0L, "clean baseline")
      (8 until valid.length).foreach { byteIdx =>
        (0 until 8).foreach { bit =>
          val b = valid.clone()
          b(byteIdx) = (b(byteIdx) ^ (1 << bit)).toByte
          val probed = PngCodec.pngStats(b)
          assert(probed == null || probed.getLong(8) >= 1L,
            s"id=$id: flipped bit $bit of byte $byteIdx parsed clean")
        }
      }
    }
  }
}
