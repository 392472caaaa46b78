package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{HeavyHitterMonitor, ItemEvent}

/** The streaming Misra-Gries monitor carries the q102 sketch's
  * guarantees to EVERY micro-batch boundary: candidate superset
  * (an item over the n/k frequency bar cannot be absent) and the
  * undercount bound (trueCount - estimate <= n/k, estimate never
  * over). Counter values are order-dependent by design, so the pins
  * are the guarantees against exact counts — the q36/q102
  * sketch-gating discipline — plus state survival across batches.
  */
class HeavyHitterMonitorSpec extends SparkSpec {

  private val K = 8

  test("MG guarantees hold at every micro-batch boundary; state survives batches") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    val rnd = new scala.util.Random(7)
    // two groups; "hot" is ~1/3 of group g1's stream (far over n/K),
    // "warm" ~1/6, the rest is a long tail of near-unique noise
    def mk(i: Int): ItemEvent = {
      val g = if (i % 4 == 0) "g2" else "g1"
      val r = rnd.nextInt(6)
      val item =
        if (r < 2) "hot" else if (r < 3) "warm" else s"noise${rnd.nextInt(40)}"
      ItemEvent(g, item)
    }
    val events = (1 to 240).map(mk)

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[ItemEvent]
    val sink = s"hh_${System.nanoTime()}"
    val q = HeavyHitterMonitor.monitor(in.toDS(), K)
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val cuts = Seq(events.take(90), events.slice(90, 170), events.drop(170))
      var prefix: Seq[ItemEvent] = Seq.empty
      cuts.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk
        // every batch emits the FULL updated candidate set with the
        // new n_seen, so the CURRENT sketch for a group is exactly
        // the rows whose n_seen equals the group's prefix length —
        // older rows in the sink are superseded batches (an item a
        // later batch decremented away must not be read as current)
        val all = s.table(sink).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        prefix.groupBy(_.group).foreach { case (g, evs) =>
          val n = evs.length.toLong
          val exact = evs.groupBy(_.item).view.mapValues(_.length.toLong).toMap
          val inSketch = all.filter(t => t._1 == g && t._4 == n)
            .map(t => t._2 -> t._3).toMap
          // the boundary emitted a current snapshot at all (state
          // survived: n_seen reached the full prefix count)
          assert(inSketch.nonEmpty, s"group $g: no snapshot at n=$n")
          // superset: anything over n/K must be present
          exact.filter(_._2 * K > n).keys.foreach { hotItem =>
            assert(inSketch.contains(hotItem),
              s"group $g: '$hotItem' over n/k yet absent at boundary n=$n")
          }
          // undercount bound, never an overcount
          inSketch.foreach { case (item, est) =>
            val truth = exact.getOrElse(item, 0L)
            assert(est <= truth, s"$g/$item overcounted: $est > $truth")
            assert(truth - est <= n / K,
              s"$g/$item undercount too large: $truth - $est > $n/$K")
          }
          // bounded state: never more than K counters per group
          assert(inSketch.size <= K, s"group $g holds ${inSketch.size} > $K")
        }
      }
      // the hot key is a surviving candidate at the end, by name
      val fin = s.table(sink).filter(col("item") === "hot")
      assert(fin.count() > 0)
    } finally {
      q.stop()
      // repo convention (ThermostatStreamSpec et al.): the shared
      // session must not leak RocksDB onto later suites
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
