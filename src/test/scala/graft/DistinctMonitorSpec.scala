package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DistinctEvent, DistinctMonitor}

/** The streaming register-sketch monitor is BIT-EQUAL to the batch
  * sketch at every micro-batch boundary: register updates are
  * order-independent element-wise MAX over the same hash/rho
  * primitives, so the live estimate of any stream prefix must equal
  * ops.distinctSketch over that prefix exactly — an equality pin,
  * stronger than the q36/q102 guarantee-style gates. Also pins
  * duplicate idempotence (an at-least-once redelivery cannot move
  * the estimate) and state survival across batches.
  */
class DistinctMonitorSpec extends SparkSpec {

  test("streaming registers equal the batch sketch at every boundary") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    val rnd = new scala.util.Random(11)
    // two groups with different cardinality regimes: g1 in the
    // linear-counting range, g2 pushed toward the raw-estimate path
    def mk(i: Int): DistinctEvent = {
      val g = if (i % 3 == 0) "g2" else "g1"
      val v = if (g == "g1") s"v${rnd.nextInt(40)}" else s"w${rnd.nextInt(400)}"
      DistinctEvent(g, v)
    }
    val events = (1 to 600).map(mk)

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[DistinctEvent]
    val sink = s"hll_${System.nanoTime()}"
    val q = DistinctMonitor.monitor(in.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val cuts = Seq(events.take(200), events.slice(200, 420), events.drop(420))
      var prefix: Seq[DistinctEvent] = Seq.empty
      cuts.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk
        // the CURRENT snapshot per group = the row whose n_seen equals
        // the group's prefix length (earlier rows are superseded batches)
        val live = s.table(sink).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val batch = api.ops.distinctSketch(
            prefix.toDF(), "group", col("value"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        prefix.groupBy(_.group).foreach { case (g, evs) =>
          val n = evs.length.toLong
          val cur = live.filter(t => t._1 == g && t._3 == n).map(_._2)
          assert(cur.nonEmpty, s"group $g: no snapshot at n=$n")
          assert(cur.head == batch(g),
            s"group $g at n=$n: live=${cur.head} batch=${batch(g)}")
        }
      }
      // duplicate idempotence: replaying an already-seen slice moves
      // n_seen but NOT the estimate
      val before = s.table(sink).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (g, rs) => g -> rs.maxBy(_._3)._2 }
      in.addData(events.take(100))
      q.processAllAvailable()
      val after = s.table(sink).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (g, rs) => g -> rs.maxBy(_._3)._2 }
      assert(after == before,
        s"redelivery moved the estimate: $before -> $after")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("JVM estimate twin agrees with the Column form on hand registers") {
    val s = spark
    import s.implicits._
    // a hand corpus small enough to reason about: registers built by
    // the JVM twins must give the same estimate the DataFrame path
    // computes (shared-primitive pin at the lowest level)
    val vals = (1 to 30).map(i => s"x$i")
    val regs = new Array[Int](graft.queries.Hashing.HllM.toInt)
    vals.foreach { v =>
      val h = graft.queries.Hashing.hash28Of(v)
      val b = (h % graft.queries.Hashing.HllM).toInt
      val rho = graft.queries.Hashing.hllRhoOfLong(h)
      if (rho > regs(b)) regs(b) = rho
    }
    val jvmEst = graft.queries.Hashing.hllEstimateOf(regs)
    val dfEst = api.ops.distinctSketch(
        vals.map(("g", _)).toDF("g", "v"), "g", col("v"))
      .collect().head.getLong(1)
    assert(jvmEst == dfEst, s"jvm=$jvmEst df=$dfEst")
  }
}
