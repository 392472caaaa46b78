package graft

import java.nio.file.Files
import java.time.Duration

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** The transformWithState state-TTL surface (TTLConfig) — the
  * declarative state-expiry mechanism that keeps keyed state bounded
  * without timer bookkeeping: a value written with a TTL is simply
  * absent after the duration elapses. At 100 TB this is the cleanup
  * story for high-cardinality keys that go quiet (abandoned sessions,
  * one-visit users): state size tracks the ACTIVE key set, not the
  * all-time key set, with no per-key timer churn. Here: two counters
  * per key, one TTL'd and one durable, incremented across three
  * micro-batches with a sleep past the TTL — the TTL'd counter
  * restarts, the durable one keeps counting.
  *
  * Harness note: TimeMode.ProcessingTime keeps the query triggering
  * empty batches to advance the TTL clock, so `processAllAvailable`
  * never settles — the test polls the memory sink with a deadline
  * instead.
  */
object TwsTtlSpec {

  final case class Counts(key: Long, ttlCount: Long, durableCount: Long)

  class TtlCounter(ttlMs: Long)
      extends StatefulProcessor[Long, (Long, Long), Counts] {
    @transient private var ttlState: ValueState[Long] = _
    @transient private var durable: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ttlState = getHandle.getValueState[Long](
        "ttlCount", Encoders.scalaLong, TTLConfig(Duration.ofMillis(ttlMs)))
      durable = getHandle.getValueState[Long](
        "durableCount", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[Counts] = {
      val n = rows.size.toLong
      val t = (if (ttlState.exists()) ttlState.get() else 0L) + n
      val d = (if (durable.exists()) durable.get() else 0L) + n
      ttlState.update(t)
      durable.update(d)
      Iterator.single(Counts(key, t, d))
    }
  }
}

class TwsTtlSpec extends SparkSpec {
  import TwsTtlSpec._

  test("TTL'd state expires between batches while durable state persists") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Long)]
      val sink = s"ttl_${System.nanoTime()}"
      // TTL margins: the 10 s TTL must exceed worst-case cold-start
      // inter-batch latency (batches 1->2 must land inside it) and the
      // 12 s sleep must exceed the TTL — both with seconds of slack,
      // so expiry-vs-retention is unambiguous on a loaded box
      val q = in.toDS().groupByKey(_._1)
        .transformWithState(new TtlCounter(ttlMs = 10000),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .writeStream.format("memory").queryName(sink).outputMode("update")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      def awaitRows(n: Int): Seq[Counts] = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var rows = Seq.empty[Counts]
        while (rows.size < n && System.nanoTime() < deadline) {
          Thread.sleep(100)
          rows = s.table(sink).as[Counts].collect().toSeq
        }
        assert(rows.size == n, s"expected $n sink rows, got $rows")
        rows
      }
      try {
        in.addData((7L, 1L)); awaitRows(1)
        in.addData((7L, 2L)); awaitRows(2)
        Thread.sleep(12000) // past the 10 s TTL
        in.addData((7L, 3L))
        val rows = awaitRows(3).sortBy(_.durableCount)
        // durable counter never resets; TTL'd counter restarts after
        // the sleep (batch 3 sees no live ttlCount)
        assert(rows.map(_.durableCount) == Seq(1L, 2L, 3L), rows.toString)
        assert(rows.map(_.ttlCount) == Seq(1L, 2L, 1L), rows.toString)
      } finally q.stop()
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
