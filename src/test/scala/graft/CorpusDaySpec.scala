package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.ops

/** The one-call day-N corpus maintenance job (ops.corpusDay): the
  * orchestrated CDC composition must be a PURE optimization — every
  * returned artifact equals its cold-composition counterpart — and
  * must own the release discipline (the Ck.release whole-plan-walk
  * trap found in round 9 lived exactly at this composition seam).
  */
class CorpusDaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def bandSet(df: DataFrame): Set[(Long, Int, String)] =
    df.select(col("__id"), col("band_idx"), col("band_key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("corpusDay artifacts equal the cold composition") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 8 =!= 0)
    val delta = docs.filter(col("doc_id") % 8 === 0)
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    val deleted = lab0.filter(col("id") % 3 === 0)
      .select(col("id").as("doc_id")).localCheckpoint(true)
    assert(deleted.count() > 0L, "no takedown hits a dup cluster")
    val oldBands = ops.nearDupBands(base, "doc_id", "text")
      .localCheckpoint(true)
    val evalSet = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), col("text"))
    val embs = Tables.embeddings(spark, dir)
    val newVecs = embs.filter(col("vec_id") % 10 === 0)
    val cents = embs.filter(col("vec_id") % 10 =!= 0)
      .groupBy(col("label"))
      .agg(first(col("embedding")).cast("array<double>").as("c"))
      .localCheckpoint(true)

    val day = ops.corpusDay(base, delta, deleted, "doc_id", "text",
      lab0, oldBands = Some(oldBands), evalSet = Some(evalSet),
      newVectors = Some(newVecs), centroids = Some(cents))

    // cold composition on the surviving union
    val surviving = docs.join(deleted, Seq("doc_id"), "left_anti")
    assert(ids(day.corpus) == ids(surviving))
    val cold = ops.nearDupDedup(surviving, "doc_id", "text")
    assert(ids(day.kept) == ids(cold))
    val (coldLab, _) = ops.nearDupLabels(surviving, "doc_id", "text")
    assert(labelSet(day.labels) == labelSet(coldLab))
    // tomorrow's band table == bands recomputed from the new corpus
    assert(bandSet(day.bands) ==
      bandSet(ops.nearDupBands(surviving, "doc_id", "text")))
    // the warm pass genuinely ran and the delta entered the
    // clustering (non-vacuous equality). NOT a movement check: the
    // two-phase engine legitimately converges with zero changed
    // edges when the warm init is already a stable star forest.
    assert(day.warmCurve.nonEmpty)
    assert(day.labels.join(delta.select(col("doc_id").as("id")), "id")
      .count() > 0L, "no delta doc entered the clustering: vacuous")
    // decontamination: same rows + n_overlap as the direct call
    val deconCold = ops.decontaminate(cold, evalSet, "doc_id", "text")
      .select(col("doc_id"), col("n_overlap"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deconDay = day.keptClean.get
      .select(col("doc_id"), col("n_overlap"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deconDay == deconCold)
    assert(deconDay.exists(_._2 > 0L), "eval set never overlaps: vacuous")
    // delta IVF assignment == the direct frozen-index call
    val ivfCold = ops.ivfAssign(newVecs, cents, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val ivfDay = day.ivfDelta.get
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(ivfDay == ivfCold && ivfDay.nonEmpty)
    Ck.release(day.labels); Ck.release(day.bands)
    Ck.release(lab0); Ck.release(coldLab)
    Ck.release(oldBands); Ck.release(deleted); Ck.release(cents)
  }

  test("two-day chain: day-2 run on day-1 artifacts equals the cold run") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val shard1 = docs.filter(col("doc_id") % 8 === 0)
    val shard2 = docs.filter(col("doc_id") % 8 === 4)
    val s = spark
    import s.implicits._
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    val bands0 = ops.nearDupBands(base, "doc_id", "text")
      .localCheckpoint(true)
    val noDel = Seq.empty[Long].toDF("doc_id")
    val day1 = ops.corpusDay(base, shard1, noDel, "doc_id", "text",
      lab0, oldBands = Some(bands0))
    // day 2 threads day 1's artifacts: corpus, labels, band table —
    // with a real takedown drawn from day 1's dup subset
    val deleted2 = day1.labels.filter(col("id") % 5 === 0)
      .select(col("id").as("doc_id")).localCheckpoint(true)
    assert(deleted2.count() > 0L, "day-2 takedown set empty: vacuous")
    val day2 = ops.corpusDay(day1.corpus, shard2, deleted2, "doc_id",
      "text", day1.labels, oldBands = Some(day1.bands))
    // the handoff point: day 1's artifacts are superseded the moment
    // day 2 returns — release them BEFORE materializing day 2's
    // outputs, proving nothing downstream still reads them (day2's
    // labels/bands are fresh checkpoints; kept/corpus read only the
    // raw inputs and day2's own artifacts)
    Ck.release(day1.labels); Ck.release(day1.bands)
    val surviving2 = docs.filter(col("doc_id") % 8 =!= 4)
      .unionByName(shard2)
      .join(deleted2, Seq("doc_id"), "left_anti")
    val cold2 = ops.nearDupDedup(surviving2, "doc_id", "text")
    val (coldLab2, _) = ops.nearDupLabels(surviving2, "doc_id", "text")
    assert(ids(day2.kept) == ids(cold2))
    assert(labelSet(day2.labels) == labelSet(coldLab2))
    assert(bandSet(day2.bands) ==
      bandSet(ops.nearDupBands(surviving2, "doc_id", "text")))
    Ck.release(day2.labels); Ck.release(day2.bands)
    Ck.release(lab0); Ck.release(bands0)
    Ck.release(coldLab2); Ck.release(deleted2)
  }

  test("release discipline: a day run leaves only its returned artifacts pinned") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 8 =!= 0)
    val delta = docs.filter(col("doc_id") % 8 === 0)
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    val deleted = lab0.filter(col("id") % 3 === 0)
      .select(col("id").as("doc_id")).localCheckpoint(true)
    val oldBands = ops.nearDupBands(base, "doc_id", "text")
      .localCheckpoint(true)
    spark.catalog.clearCache()
    def persisted: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = persisted
    val day = ops.corpusDay(base, delta, deleted, "doc_id", "text",
      lab0, oldBands = Some(oldBands))
    // consume the lazy outputs (what a real day does: write them)
    day.kept.count(); day.corpus.count()
    spark.catalog.clearCache() // harness-owned catalog persists
    val leftover = persisted -- before
    // the warm loop's internal checkpoints and the pinned candidate
    // frame are all released inside — only the two RETURNED
    // artifacts (labels, bands) may remain
    assert(leftover.size <= 2,
      s"corpusDay leaked ${leftover.size} persisted RDDs (want <= 2)")
    Ck.release(day.labels); Ck.release(day.bands)
    assert(persisted == before,
      "releasing the returned artifacts must zero the day run")
    Ck.release(lab0); Ck.release(oldBands); Ck.release(deleted)
  }
}
