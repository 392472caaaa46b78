package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join with watermarks on both sides — the
  * general two-stream join surface (the reference only ever does the
  * latest-value state enrichment; this is the full join the rebuild
  * adds): readings joined to the commands issued for the same sensor
  * within the following 10 minutes.
  */
class StreamStreamJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked interval join pairs readings with nearby commands") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val readings = MemoryStream[(Timestamp, Long, Double)]
    val commands = MemoryStream[(Timestamp, Long, Int)]
    val r = readings.toDF().toDF("r_ts", "sensor", "temp")
      .withWatermark("r_ts", "5 minutes")
    val c = commands.toDF().toDF("c_ts", "c_sensor", "action")
      .withWatermark("c_ts", "5 minutes")
    val joined = r.join(c,
      col("sensor") === col("c_sensor") &&
        col("c_ts") >= col("r_ts") &&
        col("c_ts") <= col("r_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("sensor"), col("temp"), col("action"),
        date_format(col("r_ts"), "HH:mm").as("r"),
        date_format(col("c_ts"), "HH:mm").as("c"))
    val sink = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try {
      readings.addData(Seq((ts(0), 1L, 47.0), (ts(20), 1L, 43.0), (ts(0), 2L, 50.0)))
      commands.addData(Seq((ts(5), 1L, 1), (ts(25), 1L, 0), (ts(40), 2L, 1)))
      q.processAllAvailable()
      readings.addData(Seq((ts(59), 9L, 0.0))) // advance watermark
      commands.addData(Seq((ts(59), 8L, -1))) // different sensor: no self-pair
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table(sink)
      .select("sensor", "temp", "action", "r", "c")
      .as[(Long, Double, Int, String, String)].collect().toSet
    // sensor 1: reading@10:00 pairs with command@10:05 (within 10m);
    // reading@10:20 with command@10:25; sensor 2's command@10:40 is
    // 40m after its reading -> no pair
    assert(rows == Set(
      (1L, 47.0, 1, "10:00", "10:05"),
      (1L, 43.0, 0, "10:20", "10:25")))
  }
}
