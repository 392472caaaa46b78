package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.ops
import graft.streaming.{CandPair, DocEvent, PairMonitor}

object PairMonitorSpec {
  // cross-incarnation sink state for the restart test: foreachBatch
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
}
