package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Job-count budgets for the mining-family bench creepers (round-12
  * verdict item 6: q165 +24%, q195 +31%, q196 +49% over two rounds —
  * every step under the 1.5x drift gate, so nothing ever flagged).
  * The per-query `rounds` telemetry makes a drift attributable after
  * the fact; this spec makes a plan-shape or job-count regression
  * FAIL A TEST at build time instead of hiding under the gate.
  *
  * Method: count SparkListenerJobStart events whose job-group
  * property matches a per-query group set around the run — group
  * filtering keeps the count clean under sbt's parallel suite
  * execution, and local properties propagate to broadcast-exchange
  * threads (SQLExecution captures them), so broadcast jobs are
  * counted too. Loop-rider fallbacks (a stop-check metric missing
  * its listener window pays one extra job on the SAME thread, i.e.
  * the same group) are the one nondeterminism, so each budget allows
  * +riders slack: the pin still catches the regressions it exists
  * for (q196's pre-fusion shape was +16 jobs, far past its slack).
  */
class JobBudgetSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val started = new AtomicLong()
  private def countJobs(group: String)(body: => Unit): Long = {
    val sc = spark.sparkContext
    val counter = new AtomicLong()
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (group == e.properties.getProperty("spark.jobGroup.id"))
          counter.incrementAndGet()
    }
    sc.addSparkListener(l)
    try {
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      // the bus is async: starts are normally delivered well before
      // the last job's RESULT returns, but don't gamble — poll to
      // quiescence (two equal reads 100 ms apart, bounded)
      var prev = -1L
      var tries = 0
      while (prev != counter.get() && tries < 20) {
        prev = counter.get(); tries += 1; Thread.sleep(100L)
      }
      counter.get()
    } finally sc.removeSparkListener(l)
  }

  /** One measured run of `name`: warm-up run first (the first
    * consumer of a small table pays the one-off multi-split copy
    * job — see Tables.spread), then the counted run, with rider
    * fallbacks measured over the counted window.
    */
  private def jobsOf(name: String): (Long, Long) = {
    val sc = spark.sparkContext
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    SparkEntry.queries(name)(spark, dir).count() // warm-up
    cleanup()
    val fb0 = Loop.fallbacks.get()
    val n = countJobs(s"jobbudget_$name${started.incrementAndGet()}") {
      SparkEntry.queries(name)(spark, dir).count()
    }
    val fb = Loop.fallbacks.get() - fb0
    cleanup()
    (n, fb)
  }

  /** Pin helper: jobs must sit in [expected, expected + riders] —
    * the lower bound catches a silently DROPPED stage (a query that
    * stopped doing its work also breaks its budget), the upper
    * bound the creep this spec exists for. `riders` = the query's
    * Loop-rider call count (each can add one fallback job; under a
    * parallel full-suite run the global fallback counter may also
    * tick for OTHER suites, so the measured fb is advisory — the
    * slack uses the structural rider count instead).
    */
  private def pin(name: String, expected: Long, riders: Long): Unit = {
    val (jobs, fb) = jobsOf(name)
    assert(jobs >= expected && jobs <= expected + riders,
      s"$name: $jobs jobs (expected $expected..${expected + riders}; " +
        s"global fallback delta $fb)")
  }

  test("q196 HITS: 8 fused half-step jobs + setup, never the 3-job half-step shape") {
    pin("q196_hits", Q196Expected, riders = 8L)
  }

  test("q165 label propagation: 3 checkpointed rounds + setup, no per-round creep") {
    pin("q165_label_prop_rounds", Q165Expected, riders = 0L)
  }

  test("q195 assortativity: one sufficient-statistics pass, broadcast degrees") {
    pin("q195_assortativity", Q195Expected, riders = 0L)
  }

  // measured at sf0.001 (see the scaladoc for method); update ONLY
  // with a deliberate plan change, never to silence a regression
  private val Q196Expected = 47L
  private val Q165Expected = 27L
  private val Q195Expected = 28L
}
