package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Top-level so the product encoder needs no outer instance. */
case class GapSession(key: String, start: Long, end: Long, n: Long)

/** Event-time TIMERS: gap sessionization with
  * `GroupStateTimeout.EventTimeTimeout` — the state-timeout surface
  * the reference never exercises (its variants all run NoTimeout /
  * unbounded state). A session closes either when a late-gap event
  * arrives (emitted inline) or when the WATERMARK passes its
  * timeout (emitted by the timer path) — at scale this is what keeps
  * keyed session state bounded instead of growing forever.
  */
object TimeoutSessionSpec {

  private val GapSec = 30L

  /** In an object (not the suite class) so the task closure does not
    * capture the non-serializable test instance.
    */
  def sessionize(
      key: String,
      rows: Iterator[(String, Timestamp)],
      state: GroupState[GapSession]): Iterator[GapSession] = {
    if (state.hasTimedOut) {
      val out = state.get
      state.remove()
      Iterator(out)
    } else {
      var closed = List.empty[GapSession]
      var cur = state.getOption
      rows.toSeq.map(_._2.getTime / 1000).sorted.foreach { t =>
        cur match {
          case Some(sess) if t <= sess.end + GapSec =>
            cur = Some(sess.copy(end = math.max(sess.end, t), n = sess.n + 1))
          case Some(sess) => // gap exceeded: close inline, open new
            closed ::= sess
            cur = Some(GapSession(key, t, t, 1))
          case None =>
            cur = Some(GapSession(key, t, t, 1))
        }
      }
      cur.foreach { sess =>
        state.update(sess)
        // the timer: fire once the watermark passes the gap horizon
        state.setTimeoutTimestamp((sess.end + GapSec) * 1000)
      }
      closed.reverseIterator
    }
  }
}

class TimeoutSessionSpec extends SparkSpec {

  test("sessions close on late-gap arrival AND on event-time timeout") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(String, Long)](s)
    val events = in.toDS()
      .select(col("_1").as("key"),
        timestamp_seconds(col("_2")).as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[(String, Timestamp)]
    val q = events.groupByKey(_._1)
      .flatMapGroupsWithState[GapSession, GapSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(TimeoutSessionSpec.sessionize)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // key a: one 3-event session, then a far-later single event;
      // key b: one single-event session
      in.addData(("a", 10L), ("a", 15L), ("b", 12L))
      q.processAllAvailable()
      in.addData(("a", 20L), ("a", 100L)) // 20 extends; 100 closes inline
      q.processAllAvailable()
      // sentinels on another key march the GLOBAL watermark forward so
      // a/b's timers fire (timeouts are evaluated against the
      // watermark on each micro-batch)
      in.addData(("z", 200L))
      q.processAllAvailable()
      in.addData(("z", 300L))
      q.processAllAvailable()
      val got = s.table("sessions").as[GapSession].collect()
        .filter(r => r.key == "a" || r.key == "b")
        .sortBy(r => (r.key, r.start)).toSeq
      assert(got == Seq(
        GapSession("a", 10L, 20L, 3L), // closed inline by the t=100 event
        GapSession("a", 100L, 100L, 1L), // closed by the event-time timer
        GapSession("b", 12L, 12L, 1L))) // closed by the event-time timer
    } finally q.stop()
  }
}
