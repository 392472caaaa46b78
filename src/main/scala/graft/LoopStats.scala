package graft

/** Round-count side channel for the convergence-loop drivers
  * (connected components, BFS, PageRank, k-means, label propagation).
  * The loops stop on DATA-driven conditions, so their bench times are
  * rounds x per-round cost; recording the round count next to the
  * time makes a future drift attributable to "more rounds" vs
  * "slower rounds" without a re-run (round-5 verdict, What's wrong
  * item 3). Driver-side only, trivially small (one int per loop per
  * query), and cleared by the bench harness between queries.
  */
object LoopStats {
  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Record the final round/hop count of a named loop. */
  def record(loop: String, rounds: Long): Unit = counts.put(loop, rounds)

  /** Snapshot and clear — the bench calls this after each query's
    * runs, so counts never leak across queries.
    */
  def drain(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val snap = counts.asScala.toMap
    counts.clear()
    snap
  }
}
