package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One stream item to count within a group. */
final case class ItemEvent(group: String, item: String)

/** A heavy-hitter candidate as of the latest micro-batch: the MG
  * counter value (an UNDERcount of the true frequency by at most
  * n_seen / k) and the items seen so far in the group.
  */
final case class HitterSnapshot(group: String, item: String,
    estimate: Long, n_seen: Long)

/** STREAMING twin of the q102 Misra-Gries heavy-hitters Aggregator:
  * the hot-key monitor that runs CONTINUOUSLY — per group, the O(k)
  * counter set lives in transformWithState state and is folded with
  * [[graft.functions.MisraGries]].reduce, the LITERAL batch kernel
  * (not a reimplementation), so the stream inherits the sketch's
  * guarantees verbatim: after any prefix of n items,
  *
  *   - every item with true frequency > n/k is in the summary
  *     (candidate superset — a hot key cannot hide);
  *   - for surviving items, trueCount - estimate <= n/k.
  *
  * Both hold AT EVERY MICRO-BATCH BOUNDARY (MG's invariants are
  * prefix-closed), which is the property a live monitor needs: the
  * current snapshot is always a valid sketch of everything seen so
  * far — pinned in HeavyHitterMonitorSpec against exact counts, with
  * the counter state carried across batches. Counter VALUES depend
  * on arrival order (as q102's do on merge order), so the spec pins
  * the guarantees, not raw counters — the q36/q102 sketch-gating
  * discipline.
  *
  * At scale: state is O(k) counters per group key regardless of
  * stream length, checkpointed in RocksDB; emission is the updated
  * snapshot per batch (Update mode), so a dashboard reads the latest
  * row per (group, item). The buffer is ONE ValueState blob rather
  * than per-entry MapState on purpose: MG's decrement-all step
  * rewrites every counter anyway, so entry-granular state would just
  * add k round trips per step.
  */
object HeavyHitterMonitor {

  class MgProcessor(k: Int)
      extends StatefulProcessor[String, ItemEvent, HitterSnapshot] {
    require(k > 0, "MG capacity k must be positive")
    @transient private var counters: ValueState[Map[String, Long]] = _
    @transient private var seen: ValueState[Long] = _
    @transient private lazy val mg = new graft.functions.MisraGries(k)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getValueState[Map[String, Long]](
        "mg", Encoders.kryo[Map[String, Long]], TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[ItemEvent],
        timerValues: TimerValues): Iterator[HitterSnapshot] = {
      var b: Map[String, Long] =
        if (counters.exists()) counters.get() else Map.empty
      var n: Long = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        b = mg.reduce(b, e.item)
        n += 1L
      }
      counters.update(b)
      seen.update(n)
      val nOut = n
      b.iterator.map { case (item, est) =>
        HitterSnapshot(key, item, est, nOut)
      }
    }
  }

  /** The monitor as a stream transform (RocksDB state store required,
    * as for every transformWithState pipeline). Emits the full
    * updated candidate set per group per micro-batch.
    */
  def monitor(events: Dataset[ItemEvent], k: Int = 8): Dataset[HitterSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new MgProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
