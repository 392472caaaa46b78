package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.ops
import graft.streaming.{AnomalyMonitor, RawObservation}

/** Stream/batch EQUIVALENCE for the z-score monitor: the
  * transformWithState ListState fold must flag exactly the rows the
  * batch window form (`api.ops.zscoreAnomalies`, q112's shape) flags
  * on the same data — including across micro-batch boundaries, where
  * the trailing window must survive in checkpointed state.
  */
class AnomalyMonitorSpec extends SparkSpec {

  test("streaming ListState monitor equals the batch window twin") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    val rnd = new scala.util.Random(3)
    val obs = (1 to 60).map { i =>
      val spike = i == 41 || i == 53
      RawObservation(key = 1L + (i % 2), seq = i.toLong,
        value = if (spike) 400.0 + i else 10.0 + rnd.nextInt(3) * 0.25)
    }

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[RawObservation]
      val sink = s"anom_${System.nanoTime()}"
      val q = AnomalyMonitor.monitor(in.toDS())
        .writeStream.format("memory").queryName(sink).outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      try {
        // three micro-batches: the window must carry across them
        in.addData(obs.take(20))
        q.processAllAvailable()
        in.addData(obs.slice(20, 45))
        q.processAllAvailable()
        in.addData(obs.drop(45))
        q.processAllAvailable()
        val streamed = s.table(sink)
          .select("key", "seq", "is_anomaly")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          .toSet

        // batch twin on the same frame: order by seq within key
        val df = obs.toDF()
          .withColumn("ts", col("seq").cast("timestamp"))
        val batch = ops.zscoreAnomalies(df, "key", "ts", "value", "seq")
          .select("key", "seq", "is_anomaly")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          .toSet

        assert(streamed === batch)
        // and the spikes were actually flagged (non-vacuous)
        assert(streamed.exists { case (_, _, a) => a })
      } finally q.stop()
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a row late across a micro-batch boundary is dropped, not mis-scored") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext

    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[RawObservation]
      val sink = s"anomlate_${System.nanoTime()}"
      val q = AnomalyMonitor.monitor(in.toDS(), minHistory = 2)
        .writeStream.format("memory").queryName(sink).outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      try {
        in.addData((1 to 5).map(i => RawObservation(7L, i.toLong, 10.0)))
        q.processAllAvailable()
        // seq=3 arrives again after the boundary — already scored;
        // the guard must drop it (scoring it against the 5-row
        // history would diverge from the batch twin's seq order)
        in.addData(Seq(RawObservation(7L, 3L, 999.0),
          RawObservation(7L, 6L, 10.0)))
        q.processAllAvailable()
        val seqs = s.table(sink).select("seq")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(seqs === (1L to 6L), s"late seq=3 must appear once: $seqs")
      } finally q.stop()
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
