package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{CusumEvent, CusumMonitor}
import graft.streaming.CusumMonitor.{fold, step, Params}

/** The streaming CUSUM chart is EXACTLY the batch fold at every
  * micro-batch boundary: the processor folds the literal
  * [[CusumMonitor.step]] kernel in seq order, so the live state
  * after any prefix must equal [[CusumMonitor.fold]] over that
  * prefix — an int64 equality, no tolerance. Also pins the alarm /
  * restart semantics on a hand-built shifted series, per-key
  * isolation, and the kernel's own invariants.
  */
class CusumMonitorSpec extends SparkSpec {

  private val p = Params(target = 1000L, allowance = 50L, threshold = 400L)

  test("kernel: a sustained shift alarms once per excursion and restarts") {
    // 10 in-control points, then a +150c/step shift: S+ grows by
    // 100c per shifted step (150 - allowance), crosses h=400 on the
    // 5th shifted point, restarts, crosses again 5 points later
    val series = Seq.fill(10)(1000L) ++ Seq.fill(12)(1150L)
    val st = fold(series, p)
    assert(st.nSeen == 22L)
    assert(st.nAlarms == 2L, s"expected 2 upward excursions, got $st")
    // after the 2nd alarm at shifted point 10, two more points
    // re-accumulate 200c on the restarted chart
    assert(st.sPos == 200L && st.sNeg == 0L, s"$st")
    // downward shifts drive the mirror chart
    val dn = fold(Seq.fill(10)(1000L) ++ Seq.fill(5)(850L), p)
    assert(dn.nAlarms == 1L && dn.sNeg == 0L && dn.sPos == 0L, s"$dn")
    // in-control noise inside the allowance band never accumulates
    val flat = fold(Seq(1000L, 1040L, 960L, 1010L, 990L), p)
    assert(flat.sPos == 0L && flat.sNeg == 0L && flat.nAlarms == 0L)
  }

  test("streaming chart equals the batch fold at every boundary") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    val rnd = new scala.util.Random(17)
    // k1 drifts upward mid-stream; k2 stays in control; k3 collapses
    val events = (1 to 300).map { i =>
      val key = s"k${i % 3 + 1}"
      val base = key match {
        case "k1" => if (i > 150) 1180L else 1000L
        case "k2" => 1000L
        case _    => if (i > 200) 800L else 1000L
      }
      CusumEvent(key, i.toLong, base + rnd.nextInt(41) - 20L)
    }

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[CusumEvent]
    val sink = s"cusum_${System.nanoTime()}"
    val q = CusumMonitor.monitor(in.toDS(), p)
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val cuts = Seq(events.take(100), events.slice(100, 220), events.drop(220))
      var prefix: Seq[CusumEvent] = Seq.empty
      cuts.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk
        val live = s.table(sink).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        prefix.groupBy(_.key).foreach { case (k, evs) =>
          val exp = fold(evs.sortBy(_.seq).map(_.cents), p)
          val n = evs.length.toLong
          val cur = live.filter(t => t._1 == k && t._4 == n)
          assert(cur.nonEmpty, s"$k: no snapshot at n=$n")
          assert(cur.head == ((k, exp.sPos, exp.sNeg, exp.nSeen, exp.nAlarms)),
            s"$k at n=$n: live=${cur.head} batch=$exp")
        }
      }
      // the shifted keys alarmed; the in-control key did not
      val finals = s.table(sink).collect()
        .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
        .groupBy(_._1).map { case (k, xs) => k -> xs.maxBy(_._2)._3 }
      assert(finals("k1") > 0L, "upward drift never alarmed")
      assert(finals("k3") > 0L, "downward collapse never alarmed")
      assert(finals("k2") == 0L, s"in-control key alarmed: ${finals("k2")}")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state survives across batches and keys stay isolated") {
    // pure-kernel check that the fold is associative over batch cuts:
    // folding chunk-by-chunk from the carried state equals one fold
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(500)(950L + rnd.nextInt(120))
    val whole = fold(xs, p)
    val chunked = xs.grouped(37).foldLeft(CusumMonitor.zero) {
      (st, chunk) => chunk.foldLeft(st)((a, x) => step(a, x, p))
    }
    assert(whole == chunked)
  }
}
