package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's dynamically-controlled-stream pattern (data stream
  * + low-rate control stream upserted into keyed state, reference:
  * sparkcontroller/.../SparkStructuredController.scala:42-86)
  * GENERALIZED from thermostat control to data-quality monitoring —
  * the q95 drift statistic run continuously:
  *
  *  - the DATA stream carries per-key metric samples;
  *  - the CONTROL stream carries reference histograms + thresholds,
  *    replacing the key's baseline on the fly (no restart — the
  *    capability the reference exists to demonstrate);
  *  - per-key state folds samples into a 10-bucket histogram; once
  *    enough samples accumulate, the exact int64 L1 distance to the
  *    reference (per-10000 shares, same arithmetic as q95) decides
  *    `drifting`, and only TRANSITIONS are emitted — the same
  *    transition-dedup semantics as the thermostat's action stream.
  *
  * State is O(1) per key (two 10-long arrays + 3 scalars); the
  * control upsert and the data fold share one shuffle on the key,
  * exactly like [[ThermostatStream]].
  */
object DriftMonitor {

  /** Tagged union element (the DataModelTransform shape): kind is
    * "data" (value set) or "control" (ref/threshold set).
    */
  final case class MonitorEvent(key: Long, seq: Long, kind: String,
      value: Double, ref: Array[Long], thresholdX10k: Long)

  /** Per-key fold state. `ref` is the controlled baseline (per-10000
    * bucket shares), `counts`/`n` the current observation window,
    * `alert` the last emitted drift verdict (for transition dedup).
    */
  final case class DriftState(ref: Array[Long], thresholdX10k: Long,
      counts: Array[Long], n: Long, alert: Boolean)

  /** Emitted only when the drift verdict CHANGES (ok->drift or
    * drift->ok), carrying the L1 that caused the flip.
    */
  final case class DriftAlert(key: Long, seq: Long, drifting: Boolean,
      l1X10k: Long)

  val Buckets = 10
  val BucketWidth = 50.0
  /** Evaluate only once a window has this many samples — shares of a
    * near-empty histogram are noise.
    */
  val MinSamples = 20L

  def emptyState: DriftState =
    DriftState(Array.fill(Buckets)(0L), Long.MaxValue,
      Array.fill(Buckets)(0L), 0L, alert = false)

  private def bucket(v: Double): Int =
    math.min(Buckets - 1, math.max(0, (v / BucketWidth).toInt))

  /** Exact int64 L1 distance between the observed shares and the
    * reference (both per-10000) — the streaming twin of q95's
    * arithmetic, floor division and all.
    */
  def l1(counts: Array[Long], n: Long, ref: Array[Long]): Long = {
    var i = 0; var acc = 0L
    while (i < Buckets) {
      val share = 10000L * counts(i) / n
      acc += math.abs(share - ref(i))
      i += 1
    }
    acc
  }

  /** Pure per-event transition (unit-testable without Spark, like
    * model.Hysteresis.step): control events swap the baseline and
    * restart the observation window; data events fold in and, once
    * warmed up, flip `alert` on threshold crossings — emitting only
    * the flip.
    */
  def step(st: DriftState, ev: MonitorEvent): (DriftState, Option[DriftAlert]) =
    ev.kind match {
      case "control" =>
        (st.copy(ref = ev.ref, thresholdX10k = ev.thresholdX10k,
          counts = Array.fill(Buckets)(0L), n = 0L), None)
      case _ =>
        val c = st.counts.clone()
        c(bucket(ev.value)) += 1
        val n = st.n + 1
        if (n < MinSamples || st.thresholdX10k == Long.MaxValue)
          (st.copy(counts = c, n = n), None)
        else {
          val d = l1(c, n, st.ref)
          val drifting = d > st.thresholdX10k
          if (drifting == st.alert) (st.copy(counts = c, n = n), None)
          else (st.copy(counts = c, n = n, alert = drifting),
            Some(DriftAlert(ev.key, ev.seq, drifting, d)))
        }
    }

  /** Per-key micro-batch fold: apply the batch's events in seq order
    * (controls and data interleaved deterministically, the same rule
    * as [[ThermostatStream.stateFunc]]).
    */
  def stateFunc(key: Long, events: Iterator[MonitorEvent],
      state: GroupState[DriftState]): Iterator[DriftAlert] = {
    var st = state.getOption.getOrElse(emptyState)
    val out = events.toSeq.sortBy(_.seq).flatMap { ev =>
      val (st2, alert) = step(st, ev)
      st = st2
      alert
    }
    state.update(st)
    out.iterator
  }

  /** Works identically on streaming and batch Datasets (Spark
    * incrementalizes the same plan).
    */
  def pipeline(events: Dataset[MonitorEvent]): Dataset[DriftAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[DriftState, DriftAlert](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(stateFunc)
  }
}
