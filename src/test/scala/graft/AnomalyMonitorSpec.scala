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
}
