package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{CusumEvent, CusumMonitor, CusumSnapshot}
import graft.streaming.CusumMonitor.{fold, Params}

object TwsRestartSpec {
  // cross-incarnation sink state: foreachBatch is at-least-once on
  // restart, so batch ids dedup replays (StreamRestartSpec's
  // idempotent-sink guard)
  val emitted = new ConcurrentLinkedQueue[CusumSnapshot]()
  val seenBatches = new ConcurrentHashMap[java.lang.Long, java.lang.Boolean]()
}

/** Checkpoint-restart recovery for a transformWithState monitor —
  * the RocksDB-state sibling of StreamRestartSpec (which pins the
  * FMGWS thermostat path): stop the live CUSUM chart mid-stream,
  * land more data, restart a fresh query incarnation from the SAME
  * checkpoint, and the per-key chart state must carry across — the
  * post-restart snapshots equal the batch fold over the FULL prefix
  * (int64 equality, no tolerance). Lost state cannot fake this:
  * n_seen would restart from the phase-2 count and every S+/S-
  * excursion accumulated before the stop would vanish. The four
  * live kernels (HeavyHitter/Distinct/Cusum/Quantile) share this
  * exact TWS + RocksDB wiring; CUSUM is the pinned representative
  * because its state is order-sensitive — the hardest case.
  */
class TwsRestartSpec extends SparkSpec {

  private val p = Params(target = 1000L, allowance = 50L, threshold = 400L)

  private val schema = StructType(Seq(
    StructField("key", StringType),
    StructField("seq", LongType),
    StructField("cents", LongType)))

  test("transformWithState chart state survives a checkpoint restart") {
    val s = spark
    import s.implicits._

    val rnd = new scala.util.Random(29)
    // k1 starts drifting BEFORE the restart boundary (seq 120) and
    // keeps drifting after it, so its S+ excursion integrates across
    // the checkpoint; k2 stays in control throughout
    val events = (1 to 240).map { i =>
      val key = s"k${i % 2 + 1}"
      val base = if (key == "k1" && i > 100) 1150L else 1000L
      CusumEvent(key, i.toLong, base + rnd.nextInt(41) - 20L)
    }
    val (phase1, phase2) = events.partition(_.seq <= 120L)

    val stage = Files.createTempDirectory("tws_restart_src")
    val chk = Files.createTempDirectory("tws_restart_chk").toString
    phase1.toDF().coalesce(1).write.parquet(s"$stage/phase1")

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def runPhase(): Unit = {
      val in = s.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(stage.toString)
        .as[CusumEvent]
      val q = CusumMonitor.monitor(in, p)
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[CusumSnapshot], id: Long) =>
          if (TwsRestartSpec.seenBatches.putIfAbsent(id, true) == null) {
            ds.collect().foreach(TwsRestartSpec.emitted.add)
          }
        }
        .outputMode("update")
        .option("checkpointLocation", chk)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    try {
      import scala.jdk.CollectionConverters._
      def lastPerKey(): Map[String, CusumSnapshot] =
        TwsRestartSpec.emitted.asScala.toSeq.groupBy(_.key)
          .map { case (k, xs) => k -> xs.maxBy(_.n_seen) }

      runPhase()
      // phase 1 landed: live state equals the fold over the prefix
      val mid = lastPerKey()
      phase1.groupBy(_.key).foreach { case (k, evs) =>
        val exp = fold(evs.sortBy(_.seq).map(_.cents), p)
        assert(mid(k) == CusumSnapshot(k, exp.sPos, exp.sNeg, exp.nSeen,
          exp.nAlarms), s"$k mid-stream: ${mid(k)} vs $exp")
      }

      // query STOPPED; new data lands; a fresh incarnation resumes
      // from the same checkpoint
      phase2.toDF().coalesce(1).write.parquet(s"$stage/phase2")
      runPhase()
      val fin = lastPerKey()
      events.groupBy(_.key).foreach { case (k, evs) =>
        val exp = fold(evs.sortBy(_.seq).map(_.cents), p)
        assert(fin(k) == CusumSnapshot(k, exp.sPos, exp.sNeg, exp.nSeen,
          exp.nAlarms), s"$k post-restart: ${fin(k)} vs $exp")
      }
      // the drifting key alarmed (its excursion spans the boundary)
      assert(fin("k1").n_alarms > 0L, "drifting key never alarmed")
      assert(fin("k2").n_alarms == 0L, s"in-control key alarmed: ${fin("k2")}")
    } finally {
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
