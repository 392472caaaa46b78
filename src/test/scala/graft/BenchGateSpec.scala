package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The structural bench-drift gate (round-10): BenchDiff's artifact
  * and Bench's unadjudicated parse are the two halves of the
  * refuse-to-ship-dirty loop — pin them against synthetic
  * detail/baseline pairs so the gate itself is tested, not just
  * exercised when a drift happens to occur.
  */
class BenchGateSpec extends AnyFunSuite {

  private def detail(qs: (String, Double)*): String =
    detailRuns(qs.map { case (k, v) => (k, v, Seq(v, v, v)) }: _*)

  private def detailRuns(qs: (String, Double, Seq[Double])*): String = {
    val queries = qs.map { case (k, v, _) => s""""$k":$v""" }.mkString(",")
    val runs = qs.map { case (k, _, rs) =>
      s""""$k":{"start_s":1.0,"runs":${rs.mkString("[", ",", "]")}}"""
    }.mkString(",")
    s"""{"metric":"total","value":1,"unit":"sec","queries":{$queries},""" +
      s""""sf":"x","runs":{$runs},"meta":{"data":{"hash":"h1","bytes":1}}}"""
  }

  test("slower drifts with no adjudication parse back as unadjudicated; improvements and noise do not") {
    val dir = Files.createTempDirectory("benchgate")
    val cur = dir.resolve("cur.json")
    val base = dir.resolve("base.json")
    val out = dir.resolve("diff.json")
    // q_slow: 2x slower (0.5 -> 1.0, abs 0.5 > 0.15) -> unadjudicated
    // q_fast: 2x faster -> status improvement, never retried
    // q_tiny: 2x slower but 0.04 -> 0.08 sits under the 0.15 s noise
    //         floor -> not a drift at all
    // q_flat: unchanged -> not a drift
    Files.writeString(cur, detail(
      "q_slow" -> 1.0, "q_fast" -> 0.5, "q_tiny" -> 0.08, "q_flat" -> 1.0))
    Files.writeString(base, detail(
      "q_slow" -> 0.5, "q_fast" -> 1.0, "q_tiny" -> 0.04, "q_flat" -> 1.0))
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    assert(Bench.unadjudicatedIn(out.toString) == Seq("q_slow"))
    // the artifact itself counts the same way (the judge-facing field)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    assert(n.get("n_unadjudicated").asInt() == 1, n.toString)
    assert(n.at("/drifts/q_fast/status").asText() == "improvement")
    assert(n.at("/drifts/q_tiny").isMissingNode)
    assert(n.at("/drifts/q_flat").isMissingNode)
  }

  test("an adjudication entry silences its drift; a missing diff parses clean") {
    // BenchDiff reads the repo-root BENCH_ADJUDICATIONS.json, whose
    // real entries include q115_triangle_count — reuse it as the
    // adjudicated name so the test needs no fixture mutation
    val dir = Files.createTempDirectory("benchgate2")
    val cur = dir.resolve("cur.json")
    val base = dir.resolve("base.json")
    val out = dir.resolve("diff.json")
    Files.writeString(cur, detail("q115_triangle_count" -> 1.0))
    Files.writeString(base, detail("q115_triangle_count" -> 0.5))
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    assert(Bench.unadjudicatedIn(out.toString).isEmpty)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    assert(n.get("n_drifts").asInt() == 1)
    assert(n.get("n_unadjudicated").asInt() == 0)
    assert(n.at("/drifts/q115_triangle_count/status").asText()
      .startsWith("ADJUDICATED"))
    // gate robustness: absent artifact = clean (BenchDiff failures
    // are reported separately at the call site)
    assert(Bench.unadjudicatedIn(dir.resolve("nope.json").toString).isEmpty)
    // ...but PRESENT-and-unparseable = DIRTY (round-11 advice: a
    // truncated BENCH_DIFF must never read as a clean gate). The
    // marker names no query, so the retry pass skips it and only the
    // loud ship path sees it.
    val garbage = dir.resolve("garbage.json")
    Files.writeString(garbage, """{"drifts": {"q_x": truncated""")
    assert(Bench.unadjudicatedIn(garbage.toString) ==
      Seq(Bench.DiffUnparseable))
    assert(Bench.spreadUnadjudicatedIn(garbage.toString) ==
      Seq(Bench.DiffUnparseable))
  }

  test("spread gate: >3x intra-session spread on multi-second queries flags; sub-second and adjudicated do not") {
    val dir = Files.createTempDirectory("benchgate3")
    val cur = dir.resolve("cur.json")
    val base = dir.resolve("base.json")
    val out = dir.resolve("diff.json")
    // q_var: min 1.0 but one 5.0 run -> spread 5x on a multi-second
    //        query -> unadjudicated spread
    // q_small: same 5x spread but min 0.1 (sub-second) -> ignored
    // q_tight: multi-second, 1.5x spread -> ignored
    // q217_incremental_cc: a real adjudication key "<q>:spread" in
    //        the repo BENCH_ADJUDICATIONS silences it (added round-11)
    Files.writeString(cur, detailRuns(
      ("q_var", 1.0, Seq(5.0, 1.0, 1.2)),
      ("q_small", 0.1, Seq(0.5, 0.1, 0.1)),
      ("q_tight", 2.0, Seq(2.0, 3.0, 2.5)),
      ("q217_incremental_cc", 1.0, Seq(5.0, 1.0, 1.0))))
    Files.writeString(base, detailRuns(
      ("q_var", 1.0, Seq(1.0, 1.0, 1.0)),
      ("q_small", 0.1, Seq(0.1, 0.1, 0.1)),
      ("q_tight", 2.0, Seq(2.0, 2.0, 2.0)),
      ("q217_incremental_cc", 1.0, Seq(1.0, 1.0, 1.0))))
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    assert(Bench.spreadUnadjudicatedIn(out.toString) == Seq("q_var"))
    // ratio gate unaffected: no min moved, so no drift rows at all
    assert(Bench.unadjudicatedIn(out.toString).isEmpty)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    assert(n.get("n_spreads").asInt() == 2, n.toString)
    assert(n.get("n_spread_unadjudicated").asInt() == 1, n.toString)
    assert(n.at("/spreads/q_small").isMissingNode)
    assert(n.at("/spreads/q_tight").isMissingNode)
    assert(n.at("/spreads/q217_incremental_cc/status").asText()
      .startsWith("ADJUDICATED"))
  }

  test("retry merge: min re-derives from merged runs; crashes and failed rows stay put") {
    val loops = Map.empty[String, Long]
    val results = Seq(
      ("q_drift", 1.0, Seq(1.0, 1.2, 1.1), 5.0, loops),  // retried, dissolves
      ("q_real", 1.0, Seq(1.0, 1.1, 1.0), 6.0, loops),   // retried, survives
      ("q_crash", 1.0, Seq(1.0, 1.0, 1.0), 7.0, loops),  // retry crashes
      ("q_failed", -1.0, Seq(-1.0, 2.0, 2.0), 8.0, loops), // main pass failed
      ("q_other", 0.4, Seq(0.4, 0.5, 0.4), 9.0, loops))  // not named
    val reruns = scala.collection.mutable.ArrayBuffer.empty[String]
    val merged = Bench.mergeRetries(results,
      Seq("q_drift", "q_real", "q_crash", "q_failed"),
      {
        case n @ "q_drift" => reruns += n; Seq(0.3, 0.35, 0.4) // transient: tail is fast
        case n @ "q_real" => reruns += n; Seq(1.0, 1.1, 1.0)   // regression: floor holds
        case n @ "q_crash" => reruns += n; Seq(0.2, -1.0, 0.2) // a crash mid-retry
        case n => reruns += n; Seq(0.1, 0.1, 0.1)
      }).map(r => r._1 -> r).toMap
    // a failed main pass is NEVER retried (its -1 must survive as-is)
    assert(reruns.toSet == Set("q_drift", "q_real", "q_crash"))
    assert(merged("q_drift")._2 == 0.3 && merged("q_drift")._3.size == 6)
    assert(merged("q_real")._2 == 1.0 && merged("q_real")._3.size == 6)
    // the crash keeps the ORIGINAL row: timing, runs, everything
    assert(merged("q_crash") == results(2))
    assert(merged("q_failed") == results(3))
    assert(merged("q_other") == results(4))
    // start offsets and loop counts ride through untouched
    assert(merged("q_drift")._4 == 5.0 && merged("q_drift")._5 == loops)
  }

  test("descent absorber: C2-descent trims to the plateau; spikes, outliers, and crashes stay loud") {
    def scripted(samples: Double*): () => Double = {
      val it = samples.iterator
      () => it.next()
    }
    def absorb(runs: Seq[Double], more: () => Double) =
      Bench.descentAbsorb(runs, more, spreadThreshold = 3.0,
        flatRatio = 1.5, minSeconds = 1.0, minKept = 3, maxExtra = 3)
    val noDraw: () => Double =
      () => fail("absorber drew a sample for a non-descent shape")
    // the r13 q175 post-merge shape: six samples already hold a
    // 3-run plateau — trimmed with zero extra draws
    val (k1, d1) = absorb(
      Seq(16.082, 11.438, 6.366, 4.729, 4.368, 4.098), noDraw)
    assert(k1 == Seq(4.729, 4.368, 4.098) &&
      d1 == Seq(16.082, 11.438, 6.366), (k1, d1))
    // the q171 initial shape: plateau forms after two extra draws;
    // the kept tail contains the global min, so min-of-runs holds
    val (k2, d2) = absorb(Seq(7.35, 3.53, 1.12), scripted(1.10, 1.15))
    assert(k2 == Seq(1.12, 1.10, 1.15) && d2 == Seq(7.35, 3.53), (k2, d2))
    // a TAIL spike (the r13 q211 shape) is not a descent — head is
    // not the max; untouched, and no samples are drawn
    val (k3, d3) = absorb(Seq(2.131, 2.129, 10.912), noDraw)
    assert(k3 == Seq(2.131, 2.129, 10.912) && d3.isEmpty)
    // sub-second arrays sit under the gate's own floor — never drawn
    val (k4, d4) = absorb(Seq(0.6, 0.15, 0.15), noDraw)
    assert(k4 == Seq(0.6, 0.15, 0.15) && d4.isEmpty)
    // a fast OUTLIER below the eventual plateau is not a descent:
    // all samples ship and the gate flags
    val (k5, d5) = absorb(Seq(5.0, 1.0, 4.9), scripted(5.1, 5.0))
    assert(k5 == Seq(5.0, 1.0, 4.9, 5.1, 5.0) && d5.isEmpty, (k5, d5))
    // a plateau that never forms within maxExtra draws: keep all,
    // flag loudly
    val (k6, d6) = absorb(Seq(9.0, 3.0, 1.0), scripted(0.5, 0.2, 0.09))
    assert(k6 == Seq(9.0, 3.0, 1.0, 0.5, 0.2, 0.09) && d6.isEmpty)
    // a crash mid-extras surfaces in the kept array (same contract
    // as stealDodge: a crash is never absorbed away)
    val (k7, d7) = absorb(Seq(9.0, 3.0, 1.0), scripted(-1.0))
    assert(k7 == Seq(9.0, 3.0, 1.0, -1.0) && d7.isEmpty)
    // an already-flat multi-second array is untouched
    val (k8, d8) = absorb(Seq(2.0, 1.9, 2.1), noDraw)
    assert(k8 == Seq(2.0, 1.9, 2.1) && d8.isEmpty)
  }

  test("floor extension: strictly-descending tails draw bounded extras until non-monotone; flat, noisy, and failed arrays are untouched") {
    def scripted(samples: Double*): () => Double = {
      val it = samples.iterator
      () => it.next()
    }
    def extend(runs: Seq[Double], more: () => Double) =
      Bench.extendDescending(runs, more, minRatio = 1.15, maxExtra = 3)
    val noDraw: () => Double =
      () => fail("extension drew a sample for a non-descending shape")
    // the r14 q57 shape [2.332, 1.706, 1.639]: still descending at
    // the last sample — extras draw until a sample fails to improve,
    // and the floor (1.55) lands IN the runs array for min-of-runs
    assert(extend(Seq(2.332, 1.706, 1.639), scripted(1.55, 1.58)) ==
      Seq(2.332, 1.706, 1.639, 1.55, 1.58))
    // bounded: a tail that never turns stops at maxExtra draws —
    // plus the round-16 bonus batch exactly once for a multi-second
    // row still spanning >= 1.3x (see the bonus-batch test for the
    // gating cases)
    assert(extend(Seq(3.0, 2.5, 2.0), scripted(1.9, 1.8, 1.7, 1.6, 1.5, 1.4)) ==
      Seq(3.0, 2.5, 2.0, 1.9, 1.8, 1.7, 1.6, 1.5, 1.4))
    // noise-level monotonicity (head/last < minRatio) never triggers:
    // ~1/6 of flat queries are strictly descending by chance
    assert(extend(Seq(1.05, 1.03, 1.02), noDraw) == Seq(1.05, 1.03, 1.02))
    // a non-monotone array already found its floor
    assert(extend(Seq(2.0, 1.5, 1.6), noDraw) == Seq(2.0, 1.5, 1.6))
    // failed runs are never extended
    assert(extend(Seq(2.0, -1.0, 1.0), noDraw) == Seq(2.0, -1.0, 1.0))
    // a crashed extra surfaces in the array and stops the extension
    // (measurement path lets it flow to agg; merge path discards the
    // extension — both keep the crash visible or the row intact)
    assert(extend(Seq(3.0, 2.0, 1.5), scripted(-1.0)) ==
      Seq(3.0, 2.0, 1.5, -1.0))
    // first extra already non-improving: one draw, done
    assert(extend(Seq(3.0, 2.0, 1.5), scripted(1.5)) ==
      Seq(3.0, 2.0, 1.5, 1.5))
  }

  test("floor-extension bonus batch: multi-second unreached floors escalate once; sub-second and near-floor rows stop at the base budget") {
    def scripted(samples: Double*): () => Double = {
      val it = samples.iterator
      () => it.next()
    }
    def extend(runs: Seq[Double], more: () => Double) =
      Bench.extendDescending(runs, more, minRatio = 1.15, maxExtra = 3,
        bonusMinS = 1.0, bonusRatio = 1.3, bonusExtra = 3)
    // the r15 q211 shape: still descending after the base 3 draws,
    // last sample multi-second, span 4.45/1.93 >= 1.3 -> ONE bonus
    // batch of 3 more draws; the floor (1.52 repeated) lands in-array
    assert(extend(Seq(4.452, 3.1, 2.4), scripted(2.2, 2.1, 1.93, 1.6, 1.52, 1.55)) ==
      Seq(4.452, 3.1, 2.4, 2.2, 2.1, 1.93, 1.6, 1.52, 1.55))
    // ...and the escalation is granted ONCE: a row still descending
    // after base+bonus stops at 6 extras total
    assert(extend(Seq(9.0, 8.0, 7.0), scripted(6.0, 5.0, 4.0, 3.0, 2.5, 2.0)) ==
      Seq(9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.5, 2.0))
    // the r15 q01 shape: sub-second tail (0.351 < bonusMinS) never
    // escalates — base budget only
    assert(extend(Seq(0.555, 0.48, 0.42), scripted(0.40, 0.38, 0.351)) ==
      Seq(0.555, 0.48, 0.42, 0.40, 0.38, 0.351))
    // multi-second but span already < 1.3 after the first batch
    // (2.5/1.95 = 1.28): the floor is near, no bonus
    assert(extend(Seq(2.5, 2.3, 2.1), scripted(2.05, 2.0, 1.95)) ==
      Seq(2.5, 2.3, 2.1, 2.05, 2.0, 1.95))
    // a row that turns non-monotone inside the base batch never
    // reaches the bonus check
    assert(extend(Seq(4.0, 3.0, 2.0), scripted(1.9, 1.9)) ==
      Seq(4.0, 3.0, 2.0, 1.9, 1.9))
  }

  test("post-merge absorb: a crashed absorber extra returns the ORIGINAL row; extension crashes keep the plateau; real descents still trim") {
    def scripted(samples: Double*): () => Double = {
      val it = samples.iterator
      () => it.next()
    }
    def pma(runs: Seq[Double], more: () => Double) =
      Bench.postMergeAbsorb(runs, more, spreadThreshold = 3.0,
        flatRatio = 1.5, minSeconds = 1.0, minKept = 3, maxExtra = 3,
        extendMinRatio = 1.15, maxExtendDraws = 3)
    // the advice-item-1 hole: descent signature present, the extra
    // draw CRASHES -> descentAbsorb returns the -1-bearing array
    // loud; the old inline code shipped it and the row flipped to
    // crashed. The contract is mergeRetries': original runs, no
    // trim, no extension
    assert(pma(Seq(9.0, 3.0, 1.0), scripted(-1.0)) ==
      ((Seq(9.0, 3.0, 1.0), Seq.empty, 0)))
    // a real post-merge descent still trims to the plateau (the
    // plateau here is non-monotone, so the follow-on floor extension
    // correctly stays quiet too)
    val (f2, d2, e2) = pma(
      Seq(16.082, 11.438, 6.366, 4.729, 4.098, 4.368),
      () => fail("plateau already present — no draw"))
    assert(f2 == Seq(4.729, 4.098, 4.368) &&
      d2 == Seq(16.082, 11.438, 6.366) && e2 == 0)
    // a crashed EXTENSION draw discards only the extension — the
    // (non-descent) merged array survives as-is with 0 extensions
    assert(pma(Seq(3.0, 2.0, 1.5), scripted(-1.0)) ==
      ((Seq(3.0, 2.0, 1.5), Seq.empty, 0)))
    // a merge-created strictly-descending tail extends to its floor
    val (f4, d4, e4) = pma(Seq(3.0, 2.0, 1.5), scripted(1.5))
    assert(f4 == Seq(3.0, 2.0, 1.5, 1.5) && d4.isEmpty && e4 == 1)
  }

  test("adjudication staleness: with a pinned-round baseline, pre-pin adjudications read as unadjudicated; current ones still silence") {
    val dir = Files.createTempDirectory("benchgate4")
    val cur = dir.resolve("cur.json")
    val base = dir.resolve("base.json")
    val out = dir.resolve("diff.json")
    // q115_triangle_count carries a real repo adjudication
    // "ADJUDICATED r13 ..."; against a baseline pinned in r15 it must
    // no longer silence. q186_personalized_pr carries "ADJUDICATED
    // r14" — also pre-r15, also stale. (Fixture baselines WITHOUT
    // pin_round keep the old always-silence behavior — pinned by the
    // earlier adjudication test in this spec.)
    Files.writeString(cur, detail("q115_triangle_count" -> 1.0))
    // hand-build a baseline with meta.pin_round = 15
    Files.writeString(base,
      """{"metric":"total","value":1,"unit":"sec",""" +
        """"queries":{"q115_triangle_count":0.5},"sf":"x",""" +
        """"meta":{"pin_round":15,"data":{"hash":"h1","bytes":1}}}""")
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    val status = n.at("/drifts/q115_triangle_count/status").asText()
    assert(status.startsWith("unadjudicated (stale adjudication: r13 predates baseline pin r15"),
      status)
    // the stale text is preserved after the marker for the auditor
    assert(status.contains("ADJUDICATED r13"), status)
    // ...and the gate parse counts it dirty, so it flows to retry/loud
    assert(Bench.unadjudicatedIn(out.toString) == Seq("q115_triangle_count"))
    assert(n.get("n_unadjudicated").asInt() == 1, n.toString)
    // an adjudication at or after the pin round still silences: pin
    // round 13 makes the same entry current
    Files.writeString(base,
      """{"metric":"total","value":1,"unit":"sec",""" +
        """"queries":{"q115_triangle_count":0.5},"sf":"x",""" +
        """"meta":{"pin_round":13,"data":{"hash":"h1","bytes":1}}}""")
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    assert(Bench.unadjudicatedIn(out.toString).isEmpty)
    val n2 = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    assert(n2.at("/drifts/q115_triangle_count/status").asText()
      .startsWith("ADJUDICATED r13"))
  }

  test("adjudication staleness: variant markers (ADJUDICATED+FIXED rN) are round-parsed too") {
    // the real corpus entry q219_takedown_dedup:spread reads
    // "ADJUDICATED+FIXED r12 ..." — the plain \s+ pattern never
    // matched the "+FIXED" suffix, so the entry could never go stale
    // against a newer pin (round-16 advice item 2). Against a
    // pin_round-15 baseline it must now read stale; against an old
    // (r12) pin it still silences.
    val dir = Files.createTempDirectory("benchgate5")
    val cur = dir.resolve("cur.json")
    val base = dir.resolve("base.json")
    val out = dir.resolve("diff.json")
    Files.writeString(cur, detailRuns(
      ("q219_takedown_dedup", 1.0, Seq(5.0, 1.0, 1.0))))
    Files.writeString(base,
      """{"metric":"total","value":1,"unit":"sec",""" +
        """"queries":{"q219_takedown_dedup":1.0},"sf":"x",""" +
        """"meta":{"pin_round":15,"data":{"hash":"h1","bytes":1}}}""")
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    assert(Bench.spreadUnadjudicatedIn(out.toString) ==
      Seq("q219_takedown_dedup"))
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    val status = n.at("/spreads/q219_takedown_dedup/status").asText()
    assert(status.startsWith(
      "unadjudicated (stale adjudication: r12 predates baseline pin r15"), status)
    assert(status.contains("ADJUDICATED+FIXED r12"), status)
    // same entry against a pin at-or-before its round still silences
    Files.writeString(base,
      """{"metric":"total","value":1,"unit":"sec",""" +
        """"queries":{"q219_takedown_dedup":1.0},"sf":"x",""" +
        """"meta":{"pin_round":12,"data":{"hash":"h1","bytes":1}}}""")
    BenchDiff.main(Array(cur.toString, base.toString, out.toString))
    assert(Bench.spreadUnadjudicatedIn(out.toString).isEmpty)
  }

  test("BenchPin: sessions lacking /sf or /meta/data pin to null fields, not malformed JSON") {
    // round-16 advice item 3: a MissingNode stringifies to "", which
    // produced "sf":, — invalid JSON that BenchDiff then failed to
    // parse. Both fields now route through the same null fallback as
    // the per-session meta fields.
    val dir = Files.createTempDirectory("benchpin2")
    val s1 = dir.resolve("s1.json"); val s2 = dir.resolve("s2.json")
    val out = dir.resolve("pin.json")
    // fingerprint present (required) but no /sf and no other meta
    def bare(p: java.nio.file.Path): Unit = Files.writeString(p,
      """{"metric":"total","value":1,"queries":{"q_a":1.0},""" +
        """"meta":{"data":{"hash":"h1","bytes":1}}}""")
    bare(s1); bare(s2)
    BenchPin.main(Array(out.toString, "16", s1.toString, s2.toString))
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out)) // parse itself is the assertion
    assert(n.at("/sf").isNull, n.toString)
    assert(n.at("/queries/q_a").asDouble() == 1.0)
    // and a session missing /meta/data entirely is a fingerprint
    // error (exercised by the main spec) — but /sf-only absence must
    // never corrupt the artifact
  }

  // (the fingerprint-DISAGREEMENT path sys.exits and is not testable
  // in-JVM; the agreement path plus the hard-exit code are short
  // enough to review directly)
  test("BenchPin: median of per-session minima, condition meta, BenchDiff-consumable output") {
    val dir = Files.createTempDirectory("benchpin")
    def session(path: java.nio.file.Path, hash: String, qs: (String, Double)*): Unit = {
      val queries = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      Files.writeString(path,
        s"""{"metric":"total","value":9.9,"unit":"sec","queries":{$queries},""" +
          s""""sf":"x","meta":{"load_avg":1.5,"steal_session_s":0.2,""" +
          s""""iowait_session_s":0.1,"steal_dodged_runs":2,""" +
          s""""descent_absorbed_runs":0,"floor_extend_draws":1,"wall_s":100.0,""" +
          s""""data":{"hash":"$hash","bytes":1}}}""")
    }
    val s1 = dir.resolve("s1.json"); val s2 = dir.resolve("s2.json")
    val s3 = dir.resolve("s3.json"); val out = dir.resolve("pin.json")
    // q_a: 1.0/3.0/2.0 -> median 2.0 (one lucky 1.0 cannot pin);
    // q_b: in two sessions only -> median of those; q_crash: -1 in
    // one session is excluded from the median
    session(s1, "h1", "q_a" -> 1.0, "q_b" -> 5.0, "q_crash" -> -1.0)
    session(s2, "h1", "q_a" -> 3.0, "q_b" -> 4.0, "q_crash" -> 2.0)
    session(s3, "h1", "q_a" -> 2.0)
    BenchPin.main(Array(out.toString, "15", s1.toString, s2.toString, s3.toString))
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(out))
    assert(n.at("/queries/q_a").asDouble() == 2.0, n.toString)
    assert(n.at("/queries/q_b").asDouble() == 4.5, n.toString)
    assert(n.at("/queries/q_crash").asDouble() == 2.0, n.toString)
    assert(n.at("/meta/pin_round").asInt() == 15)
    assert(n.at("/meta/n_sessions").asInt() == 3)
    assert(n.at("/meta/sessions/0/load_avg").asDouble() == 1.5)
    assert(n.at("/meta/data/hash").asText() == "h1")
    // value = sum of pinned medians
    assert(math.abs(n.at("/value").asDouble() - (2.0 + 4.5 + 2.0)) < 1e-6)
    // the pinned artifact is BenchDiff-consumable as a baseline
    val cur = dir.resolve("cur.json"); val diff = dir.resolve("diff.json")
    Files.writeString(cur, detail("q_a" -> 2.0, "q_b" -> 4.5, "q_crash" -> 2.0))
    // fingerprint differs (detail fixture uses h1 too) -> data_changed false
    BenchDiff.main(Array(cur.toString, out.toString, diff.toString))
    val d = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(diff))
    assert(d.get("n_compared").asInt() == 3, d.toString)
    assert(d.get("n_drifts").asInt() == 0, d.toString)
    assert(!d.get("data_changed").asBoolean())
  }

  test("steal dodge: stolen runs discard and re-draw; crashes and quiet runs keep") {
    // scripted sample stream: (wall, steal) pairs drawn in order
    def scripted(samples: (Double, Double)*): () => (Double, Double) = {
      val it = samples.iterator
      () => it.next()
    }
    // a stolen successful run is discarded and re-drawn; kept stays 3
    val (k1, d1) = Bench.stealDodge(
      scripted((1.0, 0.0), (9.0, 2.4), (1.1, 0.1), (1.0, 0.2)),
      n = 3, thresholdS = 0.5, maxRetries = 3)
    assert(k1 == Seq((1.0, 0.0), (1.1, 0.1), (1.0, 0.2)), k1)
    assert(d1 == Seq((9.0, 2.4)), d1)
    // a FAILED run is never dodged, however stolen its window — the
    // crash must surface in the kept array
    val (k2, d2) = Bench.stealDodge(
      scripted((1.0, 0.0), (-1.0, 3.0), (1.0, 0.0)),
      n = 3, thresholdS = 0.5, maxRetries = 3)
    assert(k2 == Seq((1.0, 0.0), (-1.0, 3.0), (1.0, 0.0)), k2)
    assert(d2.isEmpty, d2)
    // the retry budget bounds a stormy box: past maxRetries, stolen
    // runs are KEPT (the bench must terminate and report honestly)
    val (k3, d3) = Bench.stealDodge(
      scripted((5.0, 1.0), (5.1, 1.1), (5.2, 1.2), (5.3, 1.3), (5.4, 1.4)),
      n = 3, thresholdS = 0.5, maxRetries = 2)
    assert(d3 == Seq((5.0, 1.0), (5.1, 1.1)), d3)
    assert(k3 == Seq((5.2, 1.2), (5.3, 1.3), (5.4, 1.4)), k3)
    // a quiet session draws exactly n samples, zero discards
    val (k4, d4) = Bench.stealDodge(
      scripted((0.5, 0.0), (0.5, 0.0), (0.5, 0.0)),
      n = 3, thresholdS = 0.5, maxRetries = 3)
    assert(k4.size == 3 && d4.isEmpty)
  }
}
