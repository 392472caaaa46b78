package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.Hashing

/** One stream observation: a totally-ordering id and an
  * integer-scaled value (cents — exact arithmetic is the caller's
  * contract, as for the batch op).
  */
final case class QuantileEvent(key: String, oid: Long, cents: Long)

/** The key's live quantile estimates as of the latest micro-batch:
  * total rows folded, retained sample size, and the p50/p90/p99
  * sample rank-cuts (None until the sample is non-empty).
  */
final case class QuantileSnapshot(key: String, n_seen: Long,
    n_sample: Long, p50_est: Option[Long], p90_est: Option[Long],
    p99_est: Option[Long])

/** STREAMING twin of the q200 bottom-k hash-sample quantile sketch /
  * ops.quantileSketch — the fourth live-kernel monitor, completing
  * the one-code-path story next to HeavyHitterMonitor (q45),
  * DistinctMonitor (q191) and CusumMonitor (q194): the state IS the
  * literal batch kernel, so after ANY stream prefix the live
  * estimate equals the batch op run over that prefix exactly
  * (pinned in QuantileMonitorSpec at every micro-batch boundary).
  *
  *   - membership is a pure function of the order id
  *     ([[Hashing.hash28Of]](oid) < 2²⁸/denom — the JVM twin of the
  *     batch Column form), so shards merge by union and re-delivered
  *     rows cannot change the sample (the map upsert is idempotent);
  *   - the rank-cut replays the batch op's integer ceil positions
  *     (smallest r with 2r ≥ n / 10r ≥ 9n / 100r ≥ 99n) over the
  *     sample ordered by (cents, oid) — the same total order the
  *     batch window uses, so the estimates are value-identical, not
  *     approximately equal.
  *
  * At scale: state per key is the retained sample only (~rate·n of
  * the key's rows — denom trades accuracy for state, exactly as the
  * batch op's audit quantifies), kept as ONE ValueState blob in
  * RocksDB; emission is one updated snapshot per key per batch
  * (Update mode). A key whose sample outgrows the blob budget wants
  * a coarser rate — the monitor keeps the batch op's contract
  * rather than silently degrading to a different sketch.
  */
object QuantileMonitor {

  /** Smallest 1-based rank r with r*mul >= n*need — the batch op's
    * integer rank-cut, shared by the processor and the spec.
    */
  private def cutIdx(n: Long, mul: Long, need: Long): Int =
    (((n * need) + mul - 1L) / mul).toInt // ceil(n*need/mul)

  class SampleProcessor(denom: Int)
      extends StatefulProcessor[String, QuantileEvent, QuantileSnapshot] {
    @transient private var sample: ValueState[Map[Long, Long]] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sample = getHandle.getValueState[Map[Long, Long]](
        "sample", Encoders.kryo[Map[Long, Long]], TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[QuantileEvent],
        timerValues: TimerValues): Iterator[QuantileSnapshot] = {
      val bound = (1L << 28) / denom
      var s: Map[Long, Long] = if (sample.exists()) sample.get() else Map.empty
      var n: Long = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        if (Hashing.hash28Of(e.oid.toString) < bound) s = s.updated(e.oid, e.cents)
        n += 1L
      }
      sample.update(s)
      seen.update(n)
      val ns = s.size.toLong
      val cuts =
        if (ns == 0L) (None, None, None)
        else {
          // the batch window's total order: (cents, oid)
          val sorted = s.toSeq.map { case (oid, c) => (c, oid) }.sorted
          (Some(sorted(cutIdx(ns, 2L, 1L) - 1)._1),
            Some(sorted(cutIdx(ns, 10L, 9L) - 1)._1),
            Some(sorted(cutIdx(ns, 100L, 99L) - 1)._1))
        }
      Iterator.single(
        QuantileSnapshot(key, n, ns, cuts._1, cuts._2, cuts._3))
    }
  }

  /** The monitor as a stream transform (RocksDB state store required,
    * as for every transformWithState pipeline). Emits one updated
    * snapshot per key per micro-batch.
    */
  def monitor(events: Dataset[QuantileEvent],
      denom: Int = 10): Dataset[QuantileSnapshot] = {
    require(denom >= 2, s"quantile monitor needs denom >= 2, got $denom")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new SampleProcessor(denom),
        TimeMode.None(), OutputMode.Update())
  }
}
