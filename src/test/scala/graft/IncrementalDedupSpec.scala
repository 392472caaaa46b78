package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.ops

/** The incremental near-dup dedup contract (q218 /
  * ops.nearDupDedupIncremental): a warm pass over (yesterday's
  * corpus + today's inserts-only shard) must produce EXACTLY the
  * cold run's survivors and labels — the incremental machinery
  * (delta-restricted candidates, star-compressed old graph,
  * warm-started fixpoint) is a pure optimization, never a semantic
  * change — while doing provably less clustering work (movement
  * reflects only the delta's disturbance).
  */
class IncrementalDedupSpec extends SparkSpec {

  // sf0.01, like CcLoopSpec: enough docs (~600) that the dup graph
  // has real clusters on both sides of the split and the loops
  // genuinely iterate
  private val dir = "/root/testdata/sf0.01"

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental dedup equals the cold run on the union corpus") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    val (lab0, curve0) = ops.nearDupLabels(base, "doc_id", "text")
    // the split is non-degenerate: the base has dup clusters to
    // carry forward, else the warm start proves nothing
    assert(lab0.count() > 0L, "base corpus has no dup clusters")
    val (kept, lab1, curve1) = ops.nearDupDedupIncremental(
      base, delta, "doc_id", "text", lab0)
    // survivors: row-for-row the cold pipeline's (min_id policy)
    val cold = ops.nearDupDedup(docs, "doc_id", "text")
    assert(ids(kept) == ids(cold))
    // labels: the cold fixpoint over the full union pair graph
    val (coldLab, coldCurve) = ops.nearDupLabels(docs, "doc_id", "text")
    assert(labelSet(lab1) == labelSet(coldLab))
    // the warm pass did strictly less label movement than the cold
    // run: untouched old components start AT the fixpoint and never
    // move, so warm total movement < cold total movement whenever
    // the delta leaves any old cluster alone
    val warmMv = curve1.map(_._2).sum
    val coldMv = coldCurve.map(_._2).sum
    assert(warmMv < coldMv, s"warm=$curve1 cold=$coldCurve")
    // and the delta genuinely extended the pair graph (else the
    // equality above is vacuous). NOT a movement check: the two-phase
    // engine legitimately converges with ZERO changed edges when
    // every delta pair already lands on its component minimum — the
    // warm start working perfectly, not a degenerate delta.
    assert(lab1.count() > lab0.count(), s"no new doc entered the clustering")
    assert(curve0.nonEmpty)
    Ck.release(lab0); Ck.release(lab1); Ck.release(coldLab)
  }

  test("incremental dedup chains: two shards applied in sequence equal the cold run") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val shard1 = docs.filter(col("doc_id") % 8 === 0)
    val shard2 = docs.filter(col("doc_id") % 8 === 4)
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    val (_, lab1, _) = ops.nearDupDedupIncremental(
      base, shard1, "doc_id", "text", lab0)
    // day 2: yesterday's corpus is base+shard1, labels are lab1
    val (kept2, lab2, _) = ops.nearDupDedupIncremental(
      base.unionByName(shard1), shard2, "doc_id", "text", lab1)
    val cold = ops.nearDupDedup(docs, "doc_id", "text")
    assert(ids(kept2) == ids(cold))
    val (coldLab, _) = ops.nearDupLabels(docs, "doc_id", "text")
    assert(labelSet(lab2) == labelSet(coldLab))
    Ck.release(lab0); Ck.release(lab1); Ck.release(lab2); Ck.release(coldLab)
  }

  test("materialized old-band table: identical results, old signature scan gone") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    // day-0 production artifact: yesterday's band table, materialized
    val oldBands = ops.nearDupBands(base, "doc_id", "text")
      .localCheckpoint(true)
    val recompute = ops.incrementalNearDupPairs(
      base, delta, "doc_id", "text", 0.5)
    val reuse = ops.incrementalNearDupPairs(
      base, delta, "doc_id", "text", 0.5, Some(oldBands))
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(reuse) == pairSet(recompute))
    // the point of the knob: the old corpus's signature computation
    // is OUT of the plan — the reuse plan reads the checkpointed
    // band table (a scanned RDD) where the recompute plan carries a
    // second full signature pipeline, so its minhash_sig footprint
    // (the expression repeats per band field in FormattedMode) must
    // strictly shrink
    val p = reuse.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val p2 = recompute.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val (nReuse, nRecompute) =
      ("minhash_sig".r.findAllIn(p).size, "minhash_sig".r.findAllIn(p2).size)
    assert(nReuse > 0 && nReuse < nRecompute, s"reuse=$nReuse recompute=$nRecompute")
    assert(p.contains("ExistingRDD"), p)
    // and the full incremental call accepts the same knob
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    val (kept, lab1, _) = ops.nearDupDedupIncremental(
      base, delta, "doc_id", "text", lab0, oldBands = Some(oldBands))
    val cold = ops.nearDupDedup(docs, "doc_id", "text")
    assert(ids(kept) == ids(cold))
    Ck.release(lab0); Ck.release(lab1); Ck.release(oldBands)
  }

  test("takedown dedup equals the cold run on the surviving corpus") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 8 =!= 0)
    val delta = docs.filter(col("doc_id") % 8 === 0)
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    // takedowns drawn from the labeled dup subset (q219's split), so
    // they actually disturb clusters at this SF
    val deleted = lab0.filter(col("id") % 3 === 0)
      .select(col("id").as("doc_id")).localCheckpoint(true)
    assert(deleted.count() > 0L, "no takedown hits a dup cluster")
    val (kept, lab1, _) = ops.nearDupDedupDelta(
      base, delta, deleted, "doc_id", "text", lab0)
    val surviving = docs.join(deleted, Seq("doc_id"), "left_anti")
    val cold = ops.nearDupDedup(surviving, "doc_id", "text")
    assert(ids(kept) == ids(cold))
    val (coldLab, _) = ops.nearDupLabels(surviving, "doc_id", "text")
    assert(labelSet(lab1) == labelSet(coldLab))
    // the materialized-band knob commutes with deletion: the band
    // table is per-doc pure, so filtering yesterday's table equals
    // recomputing on the surviving corpus
    val oldBands = ops.nearDupBands(base, "doc_id", "text")
      .localCheckpoint(true)
    val (kept2, lab2, _) = ops.nearDupDedupDelta(
      base, delta, deleted, "doc_id", "text", lab0,
      oldBands = Some(oldBands))
    assert(ids(kept2) == ids(cold))
    assert(labelSet(lab2) == labelSet(coldLab))
    Ck.release(lab0); Ck.release(lab1); Ck.release(lab2)
    Ck.release(coldLab); Ck.release(oldBands); Ck.release(deleted)
  }

  test("planted takedowns: bridge split, min-survivor relabel, vanish, untouched") {
    val s = spark
    import s.implicits._
    // salt-verified corpus (banded-LSH buckets catch every planted
    // pair at this exact token set): one 5-doc cluster where doc 12
    // BRIDGES {10,11} and {13,14} (J(10,13-side) = 0.2, below
    // threshold), one 3-doc cluster whose MIN doc 20 is taken down,
    // one pair {30,31} whose non-min is taken down, one untouched
    // pair {40,41}
    val w = (1 to 14).map(i => s"w32_$i")
    val x = (1 to 4).map(i => s"x32_$i")
    val y = (1 to 4).map(i => s"y32_$i")
    def tri(tok: String): Seq[String] = {
      val p = (1 to 10).map(i => s"$tok${32}_$i")
      Seq(p.mkString(" "),
        (p.take(9) :+ s"$tok${32}_21").mkString(" "),
        (p.take(9) :+ s"$tok${32}_22").mkString(" "))
    }
    val cText = (w.drop(4) ++ y).mkString(" ")
    val docs = Seq(
      10L -> (w.take(10) ++ x).mkString(" "),
      11L -> (w.take(10) ++ x.take(3) :+ "x32_9").mkString(" "),
      12L -> w.mkString(" "),
      13L -> cText,
      14L -> (w.drop(4) ++ y.take(3) :+ "y32_9").mkString(" "),
      20L -> tri("p")(0), 21L -> tri("p")(1), 22L -> tri("p")(2),
      30L -> tri("q")(0), 31L -> tri("q")(1),
      40L -> tri("r")(0), 41L -> tri("r")(1)).toDF("doc_id", "text")
    val (lab0, _) = ops.nearDupLabels(docs, "doc_id", "text")
    assert(labelSet(lab0) == Set(
      (10L, 10L), (11L, 10L), (12L, 10L), (13L, 10L), (14L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L),
      (30L, 30L), (31L, 30L), (40L, 40L), (41L, 40L)),
      s"planted base clusters off: ${labelSet(lab0)}")
    // changelog: take down the bridge (12), a cluster min (20), a
    // pair's non-min (31); insert 50 = exact copy of 13 (joins the
    // disturbed component's right half through the insert path)
    val deleted = Seq(12L, 20L, 31L).toDF("doc_id")
    val inserts = Seq(50L -> cText).toDF("doc_id", "text")
    val (kept, lab1, _) = ops.nearDupDedupDelta(
      docs, inserts, deleted, "doc_id", "text", lab0)
    assert(labelSet(lab1) == Set(
      (10L, 10L), (11L, 10L),           // bridge removed: left half
      (13L, 13L), (14L, 13L), (50L, 13L), // right half + insert
      (21L, 21L), (22L, 21L),           // min taken down: relabel
      (40L, 40L), (41L, 40L)),          // untouched: label kept
      s"post-takedown labels off: ${labelSet(lab1)}")
    // 30 became a singleton (vanished from labels) and survives
    assert(ids(kept) == Set(10L, 13L, 21L, 30L, 40L))
    // the giant-disturbed-cluster escape hatch is semantics-free:
    // broadcastAffected = false routes the disturbed-survivor
    // restriction through shuffled joins with identical results
    val (kept2, lab2, _) = ops.nearDupDedupDelta(
      docs, inserts, deleted, "doc_id", "text", lab0,
      broadcastAffected = false)
    assert(labelSet(lab2) == labelSet(lab1))
    assert(ids(kept2) == ids(kept))
    Ck.release(lab0); Ck.release(lab1); Ck.release(lab2)
  }

  test("delta pair generation finds exactly the pairs touching a new doc") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    val pd = ops.incrementalNearDupPairs(base, delta, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = ops.nearDupPairs(docs, "doc_id", "text", 0.5)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter(p => p._1 % 4 == 0 || p._2 % 4 == 0)
    assert(pd == expected,
      s"missing=${expected -- pd} extra=${pd -- expected}")
    assert(expected.nonEmpty, "no delta-touching pairs at this SF")
  }

  test("pinCandidates: delta-proportional verify equals the default path") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // inserts-only path: identical pairs, and the verify shingle
    // scan is broadcast-semi-filtered to candidate endpoints — the
    // corpus-sized verify exchanges are gone from the plan
    val pinned = ops.incrementalNearDupPairs(
      base, delta, "doc_id", "text", 0.5, pinCandidates = true)
    val default = ops.incrementalNearDupPairs(
      base, delta, "doc_id", "text", 0.5)
    assert(pairSet(pinned) == pairSet(default))
    val p = pinned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("ExistingRDD"), p) // the pinned candidate scan
    assert(!p.contains("CartesianProduct"), p)
    Ck.release(pinned)
    // structural pin (AQE off so plan.collect descends, see
    // PlanQualitySpec's q220 note): the broadcast semi filter must
    // sit BELOW the verify exchanges — the corpus scan filtered
    // MAP-SIDE, no shuffle between the scan and the semi join, so
    // the shuffled verify bytes are delta-proportional (presence of
    // LeftSemi alone would stay green even if a corpus-sized
    // exchange crept back under it)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pinned2 = ops.incrementalNearDupPairs(
        base, delta, "doc_id", "text", 0.5, pinCandidates = true)
      val plan = pinned2.queryExecution.executedPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      val semis = plan.collect {
        case b: BroadcastHashJoinExec
            if b.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi =>
          b
      }
      assert(semis.nonEmpty, plan.toString)
      semis.foreach { s =>
        val streamed = s.left // build side is the broadcast id set
        // the loader's round-robin spread is allowed (it exists in
        // every documents read); what must NOT appear between the
        // scan and the semi filter is a HASH exchange — that would
        // be a corpus-sized verify shuffle ahead of the filter
        assert(streamed.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical
                  .HashPartitioning] =>
            e
        }.isEmpty, s.toString)
        // non-vacuity: the streamed side bottoms out in the corpus
        // read — a direct parquet scan or its reused loader exchange
        assert(streamed.collect {
          case f: FileSourceScanExec => f
          case r: org.apache.spark.sql.execution.exchange
              .ReusedExchangeExec => r
        }.nonEmpty, s.toString)
      }
      Ck.release(pinned2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // takedown path: same contract through the full-CDC entry point;
    // the Ex form hands back the pinned-candidate handle for precise
    // release (pinnedT's shingle side reaches the `deleted`
    // checkpoint through the surviving-old anti-join — releasing the
    // pair frame itself would free it while consumers remain)
    val (lab0, _) = ops.nearDupLabels(base, "doc_id", "text")
    val deleted = lab0.filter(col("id") % 3 === 0)
      .select(col("id").as("doc_id")).localCheckpoint(true)
    val (pinnedT, pinnedTHandle) = ops.takedownNearDupPairsEx(
      base, delta, deleted, lab0, "doc_id", "text", 0.5,
      pinCandidates = true)
    val defaultT = ops.takedownNearDupPairs(
      base, delta, deleted, lab0, "doc_id", "text", 0.5)
    assert(pairSet(pinnedT) == pairSet(defaultT))
    pinnedTHandle.foreach(Ck.release)
    // and the dedup wrappers thread the knob — pinning is their
    // DEFAULT since round 10, so the equality pin forces the cold
    // shape explicitly on one side: (kept, labels) equal, pinned
    // blocks released internally
    val (kept, lab1, _) = ops.nearDupDedupIncremental(
      base, delta, "doc_id", "text", lab0)
    val (keptD, labD, _) = ops.nearDupDedupIncremental(
      base, delta, "doc_id", "text", lab0, pinCandidates = false)
    assert(ids(kept) == ids(keptD))
    assert(labelSet(lab1) == labelSet(labD))
    val (kept2, lab2, _) = ops.nearDupDedupDelta(
      base, delta, deleted, "doc_id", "text", lab0)
    val (kept2D, lab2D, _) = ops.nearDupDedupDelta(
      base, delta, deleted, "doc_id", "text", lab0, pinCandidates = false)
    assert(ids(kept2) == ids(kept2D))
    assert(labelSet(lab2) == labelSet(lab2D))
    Ck.release(lab0); Ck.release(lab1); Ck.release(labD)
    Ck.release(lab2); Ck.release(lab2D); Ck.release(deleted)
  }
}
