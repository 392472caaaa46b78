package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.ops
import graft.streaming.{BandCdc, CandPair, DocCdc, DocEvent, PairMonitor}

object PairMonitorSpec {
  // cross-incarnation sink state for the restart tests: foreachBatch
  // is at-least-once on restart, so batch ids dedup replays
  val emitted = new java.util.concurrent.ConcurrentLinkedQueue[CandPair]()
  val seenBatches =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]()
}

/** The live candidate-pair contract (PairMonitor / q218's delta
  * candidate stage): over every stream prefix, the DISTINCT emitted
  * pairs equal the batch bucket join's pairs touching at least one
  * streamed doc — the stream IS the insert-only incremental
  * candidate pass, micro-batch by micro-batch — and redelivery adds
  * nothing.
  */
class PairMonitorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("live candidate pairs equal the batch bucket join over every prefix") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val indexDocs = docs.filter(col("doc_id") % 4 =!= 0)
    val streamDocs = docs.filter(col("doc_id") % 4 === 0)
      .collect().map(r => DocEvent(r.getLong(0), r.getString(1)))
      .sortBy(_.docId)
    val index = PairMonitor.bandObs(
      indexDocs.select(col("doc_id").as("docId"), col("text")).as[DocEvent])
    val in = MemoryStream[DocEvent]
    val sink = s"pm_${System.nanoTime()}"
    val q = PairMonitor.pairs(PairMonitor.bandObs(in.toDS()), index)
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val n = streamDocs.length
      val cuts = Seq(streamDocs.take(n / 3),
        streamDocs.slice(n / 3, 2 * n / 3), streamDocs.drop(2 * n / 3))
      var prefix: Seq[DocEvent] = Seq.empty
      cuts.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk
        val live = s.table(sink).select(col("i"), col("j")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val prefixIds = prefix.map(_.docId).toSet
        val unionDf = indexDocs.unionByName(
          prefix.map(e => (e.docId, e.text)).toDF("doc_id", "text"))
        val expected = ops.nearDupCandidates(unionDf, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          .filter(p => prefixIds(p._1) || prefixIds(p._2))
        assert(live == expected,
          s"missing=${expected -- live} extra=${live -- expected}")
        // never an index x index pair: the corpus pairs only with
        // arrivals, exactly as the incremental candidate join
        assert(live.forall(p => prefixIds(p._1) || prefixIds(p._2)))
      }
      val finalCount = s.table(sink).count()
      assert(finalCount > 0L, "no candidate pairs at this SF — vacuous test")
      // at-least-once upstream: replaying a whole chunk emits nothing
      in.addData(cuts.head)
      q.processAllAvailable()
      assert(s.table(sink).count() == finalCount,
        "redelivered docs produced duplicate pairs")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("live verified pairs equal ops.incrementalNearDupPairs over every prefix") {
    // the full live incremental-dedup stage: candidate pairs from
    // the monitor, verified by a STREAM-STATIC join against the doc
    // store's shingle frame (the same separation the batch pipeline
    // uses) — distinct verified emissions over any prefix must equal
    // the batch delta-pair op on (corpus, prefix)
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val indexDocs = docs.filter(col("doc_id") % 4 =!= 0)
    val streamDocs = docs.filter(col("doc_id") % 4 === 0)
      .collect().map(r => DocEvent(r.getLong(0), r.getString(1)))
      .sortBy(_.docId)
    val index = PairMonitor.bandObs(
      indexDocs.select(col("doc_id").as("docId"), col("text")).as[DocEvent])
    // static verify side: every doc the pairs can reference
    val sh = docs.select(col("doc_id"),
      queries.Hashing.shingles(col("text"), 3).as("__sh"))
      .localCheckpoint(true)
    val in = MemoryStream[DocEvent]
    val sink = s"pmv_${System.nanoTime()}"
    val verified = PairMonitor.pairs(PairMonitor.bandObs(in.toDS()), index)
      .join(sh.select(col("doc_id").as("i"), col("__sh").as("__sha")), "i")
      .join(sh.select(col("doc_id").as("j"), col("__sh").as("__shb")), "j")
      .filter(queries.Hashing.jaccard(col("__sha"), col("__shb")) >= 0.5)
      .select(col("i"), col("j"))
    val q = verified
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val n = streamDocs.length
      val cuts = Seq(streamDocs.take(n / 2), streamDocs.drop(n / 2))
      var prefix: Seq[DocEvent] = Seq.empty
      cuts.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk
        val live = s.table(sink).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val expected = ops.incrementalNearDupPairs(
            indexDocs,
            prefix.map(e => (e.docId, e.text)).toDF("doc_id", "text"),
            "doc_id", "text", 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(live == expected,
          s"missing=${expected -- live} extra=${live -- expected}")
      }
      assert(s.table(sink).count() > 0L, "no verified pairs — vacuous")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      Ck.release(sh)
    }
  }

  test("bucket membership survives a checkpoint restart") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val indexDocs = docs.filter(col("doc_id") % 4 =!= 0)
    val streamDocs = docs.filter(col("doc_id") % 4 === 0)
      .collect().map(r => DocEvent(r.getLong(0), r.getString(1)))
      .sortBy(_.docId)
    val (phase1, phase2) = streamDocs.splitAt(streamDocs.length / 2)
    val stage = Files.createTempDirectory("pm_restart_src")
    val chk = Files.createTempDirectory("pm_restart_chk").toString
    phase1.toSeq.toDF().coalesce(1).write.parquet(s"$stage/phase1")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val index = PairMonitor.bandObs(
      indexDocs.select(col("doc_id").as("docId"), col("text")).as[DocEvent])
    def runPhase(): Unit = {
      val in = s.readStream
        .schema(org.apache.spark.sql.Encoders.product[DocEvent].schema)
        .option("recursiveFileLookup", "true").parquet(stage.toString)
        .as[DocEvent]
      val q = PairMonitor.pairs(PairMonitor.bandObs(in), index)
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[CandPair], id: Long) =>
          if (PairMonitorSpec.seenBatches.putIfAbsent(id, true) == null) {
            ds.collect().foreach(PairMonitorSpec.emitted.add)
          }
        }
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      runPhase()
      phase2.toSeq.toDF().coalesce(1).write.parquet(s"$stage/phase2")
      runPhase() // fresh incarnation, same checkpoint
      import scala.jdk.CollectionConverters._
      val live = PairMonitorSpec.emitted.asScala
        .map(p => (p.i, p.j)).toSet
      val prefixIds = streamDocs.map(_.docId).toSet
      val expected = ops.nearDupCandidates(
          indexDocs.unionByName(
            streamDocs.toSeq.map(e => (e.docId, e.text)).toDF("doc_id", "text")),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .filter(p => prefixIds(p._1) || prefixIds(p._2))
      assert(live == expected,
        s"missing=${expected -- live} extra=${live -- expected}")
      // the restart-crossing evidence: a phase-2 arrival paired with
      // state written BEFORE the restart (a phase-1 member or a
      // corpus-seeded member) — lost RocksDB lists would drop these
      val p2 = phase2.map(_.docId).toSet
      val crossing = expected.filter(p =>
        (p2(p._1) && !p2(p._2)) || (p2(p._2) && !p2(p._1)))
      assert(crossing.nonEmpty, "no restart-crossing pair — vacuous split")
    } finally {
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      PairMonitorSpec.emitted.clear()
      PairMonitorSpec.seenBatches.clear()
    }
  }

  test("takedowns remove bucket membership across a restart; re-pairs match the batch op") {
    // q219's live form: phase A arrivals, a RESTART, takedowns, a
    // second RESTART, phase B arrivals — post-takedown emissions must
    // equal the batch bucket join on the SURVIVING union (the
    // takedown's state edit persisted through the checkpoint), and a
    // would-have-paired set proves the removal is load-bearing
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val indexDocs = docs.filter(col("doc_id") % 4 =!= 0)
    val streamDocs = docs.filter(col("doc_id") % 4 === 0)
      .collect().map(r => DocCdc(r.getLong(0), r.getString(1), delete = false))
      .sortBy(_.docId)
    val (phaseA, phaseB) = streamDocs.splitAt(streamDocs.length / 2)
    val phaseAIds = phaseA.map(_.docId).toSet
    val phaseBIds = phaseB.map(_.docId).toSet
    def cands(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      ops.nearDupCandidates(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def docsOf(evs: Seq[DocCdc]): org.apache.spark.sql.DataFrame =
      evs.map(e => (e.docId, e.text)).toDF("doc_id", "text")
    // takedown targets: non-phase-B endpoints of pairs a phase-B
    // arrival WOULD form — guaranteed load-bearing deletions
    val unionAll = indexDocs.unionByName(docsOf(streamDocs))
    val delIds = cands(unionAll)
      .filter(p => phaseBIds(p._1) || phaseBIds(p._2))
      .flatMap(p => Seq(p._1, p._2)).filterNot(phaseBIds)
      .toSeq.sorted.take(5).toSet
    assert(delIds.nonEmpty, "no deletable pair endpoint — vacuous split")
    val delEvents = docs.filter(col("doc_id").isin(delIds.toSeq: _*))
      .collect().map(r => DocCdc(r.getLong(0), r.getString(1), delete = true))
    val stage = Files.createTempDirectory("pm_td_src")
    val chk = Files.createTempDirectory("pm_td_chk").toString
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val index = PairMonitor.bandObs(
      indexDocs.select(col("doc_id").as("docId"), col("text")).as[DocEvent])
    def runPhase(): Unit = {
      val in = s.readStream
        .schema(org.apache.spark.sql.Encoders.product[DocCdc].schema)
        .option("recursiveFileLookup", "true").parquet(stage.toString)
        .as[DocCdc]
      val q = PairMonitor.pairsCdc(PairMonitor.bandCdc(in), index)
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[CandPair], id: Long) =>
          if (PairMonitorSpec.seenBatches.putIfAbsent(id, true) == null) {
            ds.collect().foreach(PairMonitorSpec.emitted.add)
          }
        }
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    import scala.jdk.CollectionConverters._
    def live: Set[(Long, Long)] =
      PairMonitorSpec.emitted.asScala.map(p => (p.i, p.j)).toSet
    try {
      phaseA.toSeq.toDF().coalesce(1).write.parquet(s"$stage/phase1")
      runPhase()
      val liveA = live
      val expectedA = cands(indexDocs.unionByName(docsOf(phaseA)))
        .filter(p => phaseAIds(p._1) || phaseAIds(p._2))
      assert(liveA == expectedA,
        s"missing=${expectedA -- liveA} extra=${liveA -- expectedA}")
      // restart 1: the takedowns arrive in their own incarnation
      delEvents.toSeq.toDF().coalesce(1).write.parquet(s"$stage/phase2")
      runPhase()
      assert(live == liveA, "takedown events must emit no pairs")
      // restart 2: phase-B arrivals pair against POST-takedown state
      phaseB.toSeq.toDF().coalesce(1).write.parquet(s"$stage/phase3")
      runPhase()
      val liveB = live -- liveA
      // the batch analog on the surviving union: (index ∪ phaseA)
      // minus the takedowns, plus phase B — the same insert-candidate
      // family ops.takedownNearDupPairs derives (band bucket join
      // against the surviving corpus)
      val surviving = indexDocs.unionByName(docsOf(phaseA))
        .filter(!col("doc_id").isin(delIds.toSeq: _*))
        .unionByName(docsOf(phaseB))
      val expectedB = cands(surviving)
        .filter(p => phaseBIds(p._1) || phaseBIds(p._2))
      assert(liveB == expectedB,
        s"missing=${expectedB -- liveB} extra=${liveB -- expectedB}")
      // non-vacuity + load-bearing: pairs that WOULD have formed
      // against the deleted docs exist and none was emitted — the
      // RocksDB list edit survived the restart
      val wouldHave = cands(unionAll)
        .filter(p => delIds(p._1) || delIds(p._2))
        .filter(p => phaseBIds(p._1) || phaseBIds(p._2))
      assert(wouldHave.nonEmpty, "no would-have pair — vacuous takedown")
      assert(liveB.forall(p => !delIds(p._1) && !delIds(p._2)),
        "a post-takedown arrival paired with a deleted doc")
    } finally {
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      PairMonitorSpec.emitted.clear()
      PairMonitorSpec.seenBatches.clear()
    }
  }

  test("same-batch takedown applies before arrivals; a re-insert re-pairs") {
    // the batch op's contract in one micro-batch: deletes hit PRIOR
    // state only, then the batch's arrivals pair against survivors —
    // and a later re-insert of the deleted id pairs again
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // planted corpus (IncrementalDedupSpec's salt discipline): docs 1
    // and 5 share text T (same buckets); doc 2 is unrelated
    val t = (1 to 10).map(i => s"pmz32_$i").mkString(" ")
    val u = (1 to 10).map(i => s"pmq32_$i").mkString(" ")
    val indexDocs = Seq((1L, t), (2L, u)).toDF("doc_id", "text")
    val index = PairMonitor.bandObs(
      indexDocs.select(col("doc_id").as("docId"), col("text")).as[DocEvent])
    val in = MemoryStream[DocCdc]
    val sink = s"pmtd_${System.nanoTime()}"
    val q = PairMonitor.pairsCdc(PairMonitor.bandCdc(in.toDS()), index)
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    def pairsNow: Set[(Long, Long)] =
      s.table(sink).select(col("i"), col("j")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // ONE batch: delete doc 1 + arrival 5 with the same text — the
      // takedown applies first, so 5 pairs with nothing
      in.addData(DocCdc(1L, t, delete = true), DocCdc(5L, t, delete = false))
      q.processAllAvailable()
      assert(pairsNow == Set.empty, s"same-batch takedown leaked: $pairsNow")
      // re-insert of the deleted id: pairs against the survivor 5
      in.addData(DocCdc(1L, t, delete = false))
      q.processAllAvailable()
      assert(pairsNow == Set((1L, 5L)), s"re-insert did not re-pair: $pairsNow")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("drifted-text takedown is observable: miss counter fires, member stays pairable") {
    // the documented failure mode (PairMonitor.takedownMisses): a
    // takedown whose text differs from the indexed text keys to the
    // WRONG buckets — it removes nothing, the counter says so, and
    // the stale member still pairs (the silent-drift behavior the
    // audit path exists to surface)
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t = (1 to 10).map(i => s"pmd41_$i").mkString(" ")
    val u = (1 to 10).map(i => s"pmw41_$i").mkString(" ")
    val indexDocs = Seq((1L, t)).toDF("doc_id", "text")
    val index = PairMonitor.bandObs(
      indexDocs.select(col("doc_id").as("docId"), col("text")).as[DocEvent])
    val in = MemoryStream[DocCdc]
    val sink = s"pmdrift_${System.nanoTime()}"
    val q = PairMonitor.pairsCdc(PairMonitor.bandCdc(in.toDS()), index)
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val before = PairMonitor.takedownMisses.get()
      // takedown of doc 1 carrying DRIFTED text u: its band keys
      // miss every bucket the indexed text t produced
      in.addData(DocCdc(1L, u, delete = true))
      q.processAllAvailable()
      assert(PairMonitor.takedownMisses.get() > before,
        "drifted takedown removed nothing yet the miss counter never fired")
      // and the stale member is indeed still pairable — the drift
      // was NOT silently fixed, only made observable
      in.addData(DocCdc(5L, t, delete = false))
      q.processAllAvailable()
      val pairs = s.table(sink).select(col("i"), col("j")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 5L)), s"expected the stale pair, got $pairs")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
