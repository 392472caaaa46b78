package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.ops

/** Randomized equivalence guard for the full-CDC dedup day
  * (ops.nearDupDedupDelta, the machinery under q219/q221/corpusDay):
  * on arbitrary small corpora with planted duplicate groups, a warm
  * day — random base/insert split, random takedowns drawn from the
  * WHOLE base (cluster members, cluster minima, singletons alike) —
  * must produce exactly the cold pipeline's survivors and labels on
  * the surviving union. IncrementalDedupSpec pins the planted shapes
  * (bridge split, vanish, relabel); this spec walks the random
  * combinations those shapes can't enumerate: takedowns deleting a
  * whole cluster, deltas merging two old clusters through a shared
  * text, empty deltas, near-empty survivor sets.
  */
class DedupPropertySpec extends SparkSpec {

  private def forAllSamples[A](n: Int, g: Gen[A])(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(100L + i.toLong)).foreach(check)
    }

  // planted text groups: identical texts pair (Jaccard 1); distinct
  // groups share no vocabulary, so cross-group pairs are impossible
  private def groupText(g: Int): String =
    (1 to 8).map(i => s"dpz${g}w$i").mkString(" ")

  // a corpus sample: docId -> text-group assignment, plus which docs
  // are inserts (delta) and which base docs are taken down
  private val corpusGen: Gen[(Seq[(Long, Int)], Set[Long], Set[Long])] = for {
    n <- Gen.choose(6, 18)
    nGroups <- Gen.choose(1, 5)
    groups <- Gen.listOfN(n, Gen.choose(0, nGroups - 1))
    deltaBits <- Gen.listOfN(n, Gen.oneOf(false, false, true))
    docs = groups.zipWithIndex.map { case (g, i) => (i.toLong * 3 + 1, g) }
    delta = docs.zip(deltaBits).collect { case ((id, _), true) => id }.toSet
    delIdx <- Gen.listOfN(3, Gen.choose(0, n - 1))
    dels = delIdx.map(i => docs(i)._1).toSet -- delta // takedowns hit the BASE
  } yield (docs, delta, dels)

  private def idSet(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("warm full-CDC day equals the cold pipeline on random corpora/changelogs") {
    val s = spark
    import s.implicits._
    forAllSamples(10, corpusGen) { case (docs, delta, dels) =>
      val all = docs.map { case (id, g) => (id, groupText(g)) }
        .toDF("doc_id", "text")
      val base = all.filter(!col("doc_id").isin(delta.toSeq: _*))
      val deltaDf = all.filter(col("doc_id").isin(delta.toSeq: _*))
      val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
      val deleted = dels.toSeq.toDF("doc_id")
      val (kept, lab1, _) = ops.nearDupDedupDelta(
        base, deltaDf, deleted, "doc_id", "text", lab0)
      // cold truth on the surviving union
      val surviving = all.filter(!col("doc_id").isin(dels.toSeq: _*))
      val cold = ops.nearDupDedup(surviving, "doc_id", "text")
      val (coldLab, _) = ops.nearDupLabels(surviving, "doc_id", "text")
      val (gotKept, wantKept) = (idSet(kept), idSet(cold))
      val (gotLab, wantLab) = (labelSet(lab1), labelSet(coldLab))
      Ck.release(lab0); Ck.release(lab1); Ck.release(coldLab)
      assert(gotKept == wantKept,
        s"kept diverges: docs=$docs delta=$delta dels=$dels " +
          s"missing=${wantKept -- gotKept} extra=${gotKept -- wantKept}")
      assert(gotLab == wantLab,
        s"labels diverge: docs=$docs delta=$delta dels=$dels")
    }
  }

  // a two-day walk: docs assigned to base / day-1 insert / day-2
  // insert, plus raw takedown draws for each day (resolved against
  // the then-living corpus in the test body — a draw that hits a
  // not-yet-inserted or already-deleted doc is simply dropped, so
  // empty takedown days and empty delta days both occur naturally)
  private val twoDayGen
    : Gen[(Seq[(Long, Int)], Set[Long], Set[Long], Seq[Long], Seq[Long])] =
    for {
      n <- Gen.choose(8, 20)
      nGroups <- Gen.choose(1, 5)
      groups <- Gen.listOfN(n, Gen.choose(0, nGroups - 1))
      dayBits <- Gen.listOfN(n, Gen.choose(0, 5)) // 0-3 base, 4 d1, 5 d2
      docs = groups.zipWithIndex.map { case (g, i) => (i.toLong * 3 + 1, g) }
      delta1 = docs.zip(dayBits).collect { case ((id, _), 4) => id }.toSet
      delta2 = docs.zip(dayBits).collect { case ((id, _), 5) => id }.toSet
      del1Idx <- Gen.listOfN(3, Gen.choose(0, n - 1))
      del2Idx <- Gen.listOfN(4, Gen.choose(0, n - 1))
    } yield (docs, delta1, delta2,
      del1Idx.map(i => docs(i)._1), del2Idx.map(i => docs(i)._1))

  test("two-day corpusDay chains equal cold recomputation on random CDC walks") {
    // the r11 verdict's named gap: DedupPropertySpec walked ONE warm
    // day; the composed artifact HANDOFF (day 2 consuming day 1's
    // corpus/labels/bands) only had fixed shapes (CorpusDaySpec).
    // This leg walks 20 random two-day chains through ops.corpusDay
    // and pins every day-2 artifact — kept, labels, band table —
    // equal to the cold recomputation on the final surviving union.
    val s = spark
    import s.implicits._
    var nonVacuous = 0
    forAllSamples(20, twoDayGen) {
      case (docs, delta1, delta2, del1Raw, del2Raw) =>
        val all = docs.map { case (id, g) => (id, groupText(g)) }
          .toDF("doc_id", "text")
        val baseIds = docs.map(_._1).toSet -- delta1 -- delta2
        val dels1 = del1Raw.toSet & baseIds
        val live1 = (baseIds ++ delta1) -- dels1
        val dels2 = del2Raw.toSet & live1
        val live2 = (live1 ++ delta2) -- dels2
        def slice(idsW: Set[Long]): DataFrame =
          if (idsW.isEmpty) all.filter(col("doc_id") < 0L)
          else all.filter(col("doc_id").isin(idsW.toSeq: _*))
        val base = slice(baseIds)
        val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
        val bands0 = ops.nearDupBands(base, "doc_id", "text")
          .localCheckpoint(true)
        val day1 = ops.corpusDay(base, slice(delta1),
          dels1.toSeq.toDF("doc_id"), "doc_id", "text", lab0,
          oldBands = Some(bands0))
        val day2 = ops.corpusDay(day1.corpus, slice(delta2),
          dels2.toSeq.toDF("doc_id"), "doc_id", "text", day1.labels,
          oldBands = Some(day1.bands))
        // day-1 artifacts are superseded once day 2 returns — release
        // them FIRST, proving day 2's outputs don't read them
        Ck.release(day1.labels); Ck.release(day1.bands)
        val surviving = slice(live2)
        val cold = ops.nearDupDedup(surviving, "doc_id", "text")
        val (coldLab, _) = ops.nearDupLabels(surviving, "doc_id", "text")
        val coldBands = ops.nearDupBands(surviving, "doc_id", "text")
        val ctx = s"docs=$docs d1=$delta1 d2=$delta2 dels1=$dels1 dels2=$dels2"
        assert(idSet(day2.corpus) == live2, s"corpus diverges: $ctx")
        assert(idSet(day2.kept) == idSet(cold), s"kept diverges: $ctx")
        assert(labelSet(day2.labels) == labelSet(coldLab),
          s"labels diverge: $ctx")
        def bandSet(df: DataFrame): Set[(Long, Int, String)] =
          df.select(col("__id"), col("band_idx"), col("band_key"))
            .collect().map(r =>
              (r.getLong(0), r.getInt(1), r.getString(2))).toSet
        assert(bandSet(day2.bands) == bandSet(coldBands),
          s"band table diverges: $ctx")
        if (delta2.nonEmpty && dels2.nonEmpty) nonVacuous += 1
        Ck.release(day2.labels); Ck.release(day2.bands)
        Ck.release(lab0); Ck.release(bands0); Ck.release(coldLab)
    }
    // aggregated vacuity guard: empty-delta/empty-takedown days are
    // legitimate samples, but the run as a whole must have exercised
    // real day-2 churn
    assert(nonVacuous >= 5,
      s"only $nonVacuous/20 chains had both day-2 inserts and takedowns")
  }
}
