package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{QuantileEvent, QuantileMonitor}

/** The streaming quantile-sample monitor is VALUE-EQUAL to the batch
  * sketch at every micro-batch boundary: sample membership is a pure
  * function of the order id and the rank-cut replays the batch
  * window's integer positions, so the live p50/p90/p99 of any stream
  * prefix must equal ops.quantileSketch's est_cents over that prefix
  * exactly — the fourth live kernel under the one-code-path story
  * (q45 heavy hitters, q191 distinct, q194 CUSUM, q200 quantiles).
  * Also pins duplicate idempotence (a redelivered slice upserts the
  * same (oid, cents) pairs — sample and estimates cannot move).
  */
class QuantileMonitorSpec extends SparkSpec {

  test("live p50/p90/p99 equal the batch sketch at every boundary") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    val rnd = new scala.util.Random(17)
    // two keys with different value regimes; oids unique per key
    val events = (1 to 900).map { i =>
      val k = if (i % 3 == 0) "k2" else "k1"
      val c = if (k == "k1") rnd.nextInt(10000).toLong
              else 50000L + rnd.nextInt(100).toLong
      QuantileEvent(k, i.toLong, c)
    }

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[QuantileEvent]
    val sink = s"qm_${System.nanoTime()}"
    val q = QuantileMonitor.monitor(in.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      val cuts = Seq(events.take(300), events.slice(300, 650), events.drop(650))
      var prefix: Seq[QuantileEvent] = Seq.empty
      cuts.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        prefix = prefix ++ chunk
        // live snapshot per key = the row at the key's prefix length
        val live = s.table(sink).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long]),
            Option(r.get(5)).map(_.asInstanceOf[Long])))
        // batch truth over the same prefix: est_cents per pct
        val batch = api.ops.quantileSketch(
            prefix.toDF("key", "oid", "cents"), "key", col("oid"), col("cents"))
          .collect()
          .map(r => (r.getString(0), r.getLong(3)) ->
            (Option(r.get(2)).map(_.asInstanceOf[Long]),
              Option(r.get(4)).map(_.asInstanceOf[Long])))
          .toMap
        prefix.groupBy(_.key).foreach { case (k, evs) =>
          val n = evs.length.toLong
          val cur = live.filter(t => t._1 == k && t._2 == n)
          assert(cur.nonEmpty, s"key $k: no snapshot at n=$n")
          val (_, _, nSamp, p50, p90, p99) = cur.head
          Seq(50L -> p50, 90L -> p90, 99L -> p99).foreach { case (pct, est) =>
            val (bSamp, bEst) = batch((k, pct))
            assert(est == bEst, s"key $k pct $pct at n=$n: live=$est batch=$bEst")
            assert(bSamp.getOrElse(0L) == nSamp,
              s"key $k sample size: live=$nSamp batch=$bSamp")
          }
        }
      }
      // duplicate idempotence: replaying a seen slice moves n_seen
      // but neither the sample nor any estimate
      val before = s.table(sink).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.get(3), r.get(4), r.get(5)))
        .groupBy(_._1).map { case (k, rs) =>
          val m = rs.maxBy(_._2); k -> (m._3, m._4, m._5, m._6) }
      in.addData(events.take(200))
      q.processAllAvailable()
      val after = s.table(sink).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.get(3), r.get(4), r.get(5)))
        .groupBy(_._1).map { case (k, rs) =>
          val m = rs.maxBy(_._2); k -> (m._3, m._4, m._5, m._6) }
      assert(after == before, s"redelivery moved estimates: $before -> $after")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
