package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DriftMonitor
import graft.streaming.DriftMonitor.{DriftAlert, MonitorEvent}

/** The dynamically-controlled drift monitor: a control stream swaps
  * the per-key reference histogram mid-stream; alerts fire only on
  * drift-verdict transitions (the thermostat's transition-dedup
  * semantics applied to data quality).
  */
class DriftMonitorSpec extends SparkSpec {

  private val uniformRef = Array.fill(10)(1000L) // 10 x 1000 per-10000

  private def ctl(key: Long, seq: Long, ref: Array[Long], thr: Long) =
    MonitorEvent(key, seq, "control", 0.0, ref, thr)

  private def data(key: Long, seq: Long, v: Double) =
    MonitorEvent(key, seq, "data", v, Array.empty, 0L)

  // 40 samples all landing in bucket 0 => shares (10000,0,...) vs
  // uniform ref => L1 = 9000 + 9*1000 = 18000
  private def skewed(key: Long, from: Long, n: Int): Seq[MonitorEvent] =
    (0 until n).map(i => data(key, from + i, 1.0))

  test("pure step: warmup, transition dedup, control reset") {
    var st = DriftMonitor.emptyState
    // no reference installed -> never alerts
    val (st1, a1) = DriftMonitor.step(st, data(1, 1, 1.0))
    assert(a1.isEmpty)
    st = st1
    val (st2, _) = DriftMonitor.step(st, ctl(1, 2, uniformRef, 5000L))
    assert(st2.n === 0L) // control resets the window
    st = st2
    var alerts = Vector.empty[DriftAlert]
    skewed(1, 10, 40).foreach { ev =>
      val (s2, a) = DriftMonitor.step(st, ev)
      st = s2; alerts ++= a
    }
    // crosses threshold once warmed up; emitted exactly ONCE
    assert(alerts.map(_.drifting) === Vector(true))
    assert(alerts.head.l1X10k > 5000L)
  }

  test("streaming: control swap mid-stream changes the verdict without restart") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[MonitorEvent]
    val sink = s"drift_${System.nanoTime()}"
    val q = DriftMonitor.pipeline(ms.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      // batch 1: install a tight uniform baseline, then skewed data
      ms.addData(ctl(7, 0, uniformRef, 5000L) +: skewed(7, 10, 40))
      q.processAllAvailable()
      // batch 2: the controller RELAXES the spec to a bucket-0-heavy
      // reference — the same data distribution is now in-spec; the
      // monitor flips back to ok without any restart (the recovery
      // transition is emitted too)
      val heavy = Array(10000L) ++ Array.fill(9)(0L)
      ms.addData(Seq(ctl(7, 100, heavy, 5000L)) ++ skewed(7, 110, 40))
      q.processAllAvailable()
    } finally q.stop()
    val alerts = s.table(sink).as[DriftAlert].collect().toSeq.sortBy(_.seq)
    // one drift alert from batch 1, one recovery after the control swap
    assert(alerts.map(_.drifting) === Seq(true, false))
    assert(alerts.head.seq >= 10 && alerts.head.seq < 50)
    assert(alerts(1).seq >= 110)
  }

  test("batch replay produces the same alerts as the stream") {
    val s = spark
    import s.implicits._
    val events = (ctl(3, 0, uniformRef, 5000L) +: skewed(3, 10, 40)).toDS()
    val alerts = DriftMonitor.pipeline(events).collect().toSeq
    assert(alerts.map(_.drifting) === Seq(true))
  }
}
