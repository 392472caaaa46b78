package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of the executor blocks behind
  * `localCheckpoint(eager = true)` frames.
  *
  * Why this exists: every convergence loop in this library
  * (connected components, PageRank, BFS, k-core, k-means, MMR)
  * checkpoints its per-round state so lineage stays flat. Each
  * `localCheckpoint` pins its blocks in the BlockManager until the
  * backing RDD object is garbage-collected and the ContextCleaner
  * gets around to it — which, on a large heap, can be *never* within
  * a session's lifetime. Measured symptom (round-6 bench): repeated
  * runs of a loop query in one JVM slow down monotonically
  * (q163 k-means runs 5.3 s -> 7.3 s -> 19.6 s) as superseded round
  * checkpoints accumulate and squeeze execution memory. On a 1000-
  * executor cluster the same leak evicts the *useful* cache instead:
  * a 100-round loop would pin 100 node-sized tables when only the
  * newest is live. The fix is the same in both places: release round
  * N's blocks the moment round N+1 is materialized and every reader
  * of round N (movement scalar, convergence count, union) has run.
  *
  * [[release]] is deliberately explicit — the *caller* knows when a
  * checkpoint is superseded; no heuristic here can.
  */
object Ck {
  /** Unpersist the BlockManager blocks behind every checkpoint RDD
    * in `df`'s analyzed plan. A no-op for frames with no
    * `LogicalRDD` behind them (plain lazy plans), and idempotent —
    * double-release of a shared RDD is safe.
    *
    * UNSAFE once released: any frame still reading those blocks
    * (the checkpointed frame itself, or a projection of it) throws
    * on its next action — release only frames whose every consumer
    * has already materialized.
    *
    * The walk covers the WHOLE plan, not just the newest checkpoint:
    * releasing a DERIVED frame (a join/filter built on top of
    * checkpoints) also releases every checkpointed INPUT reachable
    * from it — including frames the caller passed in and still needs
    * (a band table, a label or delete list). Releasing a frame that
    * IS a checkpoint is precise (its plan is the one LogicalRDD);
    * for derived frames, either release them after every sibling
    * consumer of their inputs, or hold the specific checkpoint
    * handle and release that (what ops.nearDupDedupIncremental/
    * nearDupDedupDelta do internally for their pinned candidates).
    */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.distinct.foreach(_.unpersist(blocking = false))
}
