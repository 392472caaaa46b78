package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One metered stream value (already in integer cents) for a key.
  * `seq` is the key's total order (event id / offset): CUSUM is
  * order-sensitive, and a shuffled micro-batch does not preserve
  * arrival order — the processor restores it by sorting each batch's
  * rows on `seq` (the ThermostatStream (seq, control-first) lesson).
  * CROSS-batch ordering is the source's contract, as everywhere.
  */
final case class CusumEvent(key: String, seq: Long, cents: Long)

/** The per-key control-chart state after any stream prefix. */
final case class CusumState(sPos: Long, sNeg: Long, nSeen: Long,
    nAlarms: Long)

/** Per-key chart snapshot emitted after each micro-batch. */
final case class CusumSnapshot(key: String, s_pos: Long, s_neg: Long,
    n_seen: Long, n_alarms: Long)

/** STREAMING CUSUM control chart — the live twin of the q194 offline
  * changepoint locator: q194 finds WHERE a finished series shifted;
  * this raises the alarm WHILE the shift is happening (Page 1954's
  * tabular CUSUM, the sequential form of the same statistic). Per
  * key, two one-sided integer charts accumulate deviation beyond an
  * allowance k around the target mu0:
  *
  *   S+ := max(0, S+ + x - (mu0 + k))     (upward drift)
  *   S- := max(0, S- + (mu0 - k) - x)     (downward drift)
  *
  * and an excursion past the decision threshold h counts one alarm
  * and restarts that side — the standard restart rule, so repeated
  * shifts each alarm once instead of saturating. All arithmetic is
  * int64 cents: the streaming state after ANY prefix equals
  * [[CusumMonitor.fold]] over that prefix EXACTLY (pinned per
  * micro-batch boundary in CusumMonitorSpec), because the processor
  * folds the LITERAL [[CusumMonitor.step]] kernel — one code path,
  * two execution modes (the HeavyHitterMonitor/DistinctMonitor
  * discipline). Unlike the register sketch, CUSUM is
  * order/multiplicity-SENSITIVE by design — it needs an
  * exactly-once source (or upstream dedup, see DedupStream).
  *
  * At scale: state is four longs per key regardless of stream
  * length, checkpointed in RocksDB; emission is one updated snapshot
  * per key per batch (Update mode). Chart parameters follow the
  * textbook tuning k = delta/2 (half the shift worth detecting) and
  * h ~ 4-5 sigma in the same cents units.
  */
object CusumMonitor {

  /** Chart parameters, all in the value's integer cents units. */
  final case class Params(target: Long, allowance: Long, threshold: Long) {
    require(allowance >= 0L && threshold > 0L,
      s"CUSUM needs allowance >= 0 and threshold > 0, got $this")
  }

  val zero: CusumState = CusumState(0L, 0L, 0L, 0L)

  /** One exact chart transition — THE kernel, shared verbatim by the
    * streaming processor and the batch fold.
    */
  def step(st: CusumState, x: Long, p: Params): CusumState = {
    var sp = math.max(0L, st.sPos + x - (p.target + p.allowance))
    var sn = math.max(0L, st.sNeg + (p.target - p.allowance) - x)
    var alarms = st.nAlarms
    if (sp > p.threshold) { alarms += 1L; sp = 0L }
    if (sn > p.threshold) { alarms += 1L; sn = 0L }
    CusumState(sp, sn, st.nSeen + 1L, alarms)
  }

  /** Batch replay of a whole (ordered) series. */
  def fold(xs: Iterable[Long], p: Params): CusumState =
    xs.foldLeft(zero)((st, x) => step(st, x, p))

  class ChartProcessor(p: Params)
      extends StatefulProcessor[String, CusumEvent, CusumSnapshot] {
    @transient private var chart: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      chart = getHandle.getValueState[CusumState](
        "cusum", Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
        timerValues: TimerValues): Iterator[CusumSnapshot] = {
      var st = if (chart.exists()) chart.get() else zero
      // restore the key's total order inside the shuffled batch; a
      // micro-batch is bounded, so the sort is small and local
      rows.toSeq.sortBy(_.seq).foreach(e => st = step(st, e.cents, p))
      chart.update(st)
      Iterator.single(
        CusumSnapshot(key, st.sPos, st.sNeg, st.nSeen, st.nAlarms))
    }
  }

  /** The chart as a stream transform (RocksDB state store required,
    * as for every transformWithState pipeline). Emits one updated
    * snapshot per key per micro-batch.
    */
  def monitor(events: Dataset[CusumEvent], p: Params)
    : Dataset[CusumSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new ChartProcessor(p),
        TimeMode.None(), OutputMode.Update())
  }
}
