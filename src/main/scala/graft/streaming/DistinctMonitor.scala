package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.Hashing

/** One stream value to count-distinct within a group. */
final case class DistinctEvent(group: String, value: String)

/** The group's distinct-count estimate as of the latest micro-batch,
  * with the total (non-distinct) rows folded so far.
  */
final case class DistinctSnapshot(group: String, n_est: Long, n_seen: Long)

/** STREAMING twin of the q191 register sketch / ops.distinctSketch:
  * the live cardinality monitor (distinct users per tenant, distinct
  * documents per crawl) — per group, a dense 64-register vector lives
  * in transformWithState state and is updated with the LITERAL batch
  * primitives ([[Hashing.hash28Of]] / [[Hashing.hllRhoOfLong]] /
  * [[Hashing.hllEstimateOf]], the JVM twins of the Column forms), so:
  *
  *   - register updates are element-wise MAX — order-independent and
  *     duplicate-idempotent, so after ANY prefix of the stream the
  *     state equals the batch sketch of that prefix BIT-FOR-BIT
  *     (pinned in DistinctMonitorSpec against ops.distinctSketch at
  *     every micro-batch boundary — an equality, not a tolerance);
  *   - re-delivered rows (at-least-once sources) cannot move the
  *     estimate, the property exact counters lack.
  *
  * At scale: state is exactly 64 ints per group key regardless of
  * stream length, checkpointed in RocksDB; emission is one updated
  * snapshot per group per batch (Update mode). The register vector is
  * ONE ValueState blob: updates touch a single bucket but the blob is
  * 256 bytes — entry-granular MapState would cost a store round trip
  * per row for nothing.
  */
object DistinctMonitor {

  class HllProcessor
      extends StatefulProcessor[String, DistinctEvent, DistinctSnapshot] {
    @transient private var regs: ValueState[Array[Int]] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      regs = getHandle.getValueState[Array[Int]](
        "hll", Encoders.kryo[Array[Int]], TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DistinctEvent],
        timerValues: TimerValues): Iterator[DistinctSnapshot] = {
      val r: Array[Int] =
        if (regs.exists()) regs.get() else new Array[Int](Hashing.HllM.toInt)
      var n: Long = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        val h = Hashing.hash28Of(e.value)
        val b = (h % Hashing.HllM).toInt
        val rho = Hashing.hllRhoOfLong(h)
        if (rho > r(b)) r(b) = rho
        n += 1L
      }
      regs.update(r)
      seen.update(n)
      Iterator.single(DistinctSnapshot(key, Hashing.hllEstimateOf(r), n))
    }
  }

  /** The monitor as a stream transform (RocksDB state store required,
    * as for every transformWithState pipeline). Emits one updated
    * estimate per group per micro-batch.
    */
  def monitor(events: Dataset[DistinctEvent]): Dataset[DistinctSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new HllProcessor(),
        TimeMode.None(), OutputMode.Update())
  }
}
