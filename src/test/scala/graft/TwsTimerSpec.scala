package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The transformWithState TIMER API (registerTimer / deleteTimer /
  * handleExpiredTimer) — the modern successor of
  * GroupStateTimeout.EventTimeTimeout that TimeoutSessionSpec covers:
  * same gap-session scenario, sessions closed inline on late-gap
  * arrivals and by watermark-driven expired-timer callbacks, state
  * removed on close so it stays bounded.
  */
object TwsTimerSpec {

  private val GapSec = 30L

  class SessionProcessor
      extends StatefulProcessor[String, (String, Timestamp), GapSession] {
    @transient private var state: ValueState[GapSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GapSession](
        "sess", Encoders.product[GapSession], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Timestamp)],
        timerValues: TimerValues): Iterator[GapSession] = {
      var closed = List.empty[GapSession]
      var cur = if (state.exists()) Some(state.get()) else None
      // an existing session carries a registered timer; superseded below
      val oldTimer = cur.map(sess => (sess.end + GapSec) * 1000)
      rows.toSeq.map(_._2.getTime / 1000).sorted.foreach { t =>
        cur match {
          case Some(sess) if t <= sess.end + GapSec =>
            cur = Some(sess.copy(end = math.max(sess.end, t), n = sess.n + 1))
          case Some(sess) =>
            closed ::= sess
            cur = Some(GapSession(key, t, t, 1))
          case None =>
            cur = Some(GapSession(key, t, t, 1))
        }
      }
      cur.foreach { sess =>
        state.update(sess)
        val newTimer = (sess.end + GapSec) * 1000
        if (!oldTimer.contains(newTimer)) {
          oldTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(newTimer)
        }
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[GapSession] = {
      if (state.exists()) {
        val out = state.get()
        state.clear()
        Iterator(out)
      } else Iterator.empty
    }
  }
}

class TwsTimerSpec extends SparkSpec {

  test("TWS timers close gap sessions like the GroupStateTimeout form") {
    val s: SparkSession = spark
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Long)](s)
      val events = in.toDS()
        .select(col("_1").as("key"), timestamp_seconds(col("_2")).as("ts"))
        .withWatermark("ts", "0 seconds")
        .as[(String, Timestamp)]
      val q = events.groupByKey(_._1)
        .transformWithState(new TwsTimerSpec.SessionProcessor,
          TimeMode.EventTime(), OutputMode.Append())
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      try {
        in.addData(("a", 10L), ("a", 15L), ("b", 12L))
        q.processAllAvailable()
        in.addData(("a", 20L), ("a", 100L))
        q.processAllAvailable()
        in.addData(("z", 200L))
        q.processAllAvailable()
        in.addData(("z", 300L))
        q.processAllAvailable()
        val got = s.table("tws_sessions").as[GapSession].collect()
          .filter(r => r.key == "a" || r.key == "b")
          .sortBy(r => (r.key, r.start)).toSeq
        assert(got == Seq(
          GapSession("a", 10L, 20L, 3L), // closed inline by the t=100 event
          GapSession("a", 100L, 100L, 1L), // closed by the expired timer
          GapSession("b", 12L, 12L, 1L))) // closed by the expired timer
      } finally q.stop()
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
