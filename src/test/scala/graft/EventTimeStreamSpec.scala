package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._


/** Event-time streaming primitives the reference never exercises
  * (SURVEY.md §2.2: no watermark/event-time anywhere in the reference
  * tree) but the rebuild ships: tumbling windows + watermark,
  * watermarked dedup, session windows.
  */
class EventTimeStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def runToTable[T](
      q: org.apache.spark.sql.DataFrame,
      mode: String): (String, org.apache.spark.sql.streaming.StreamingQuery) = {
    val sink = s"evt_${System.nanoTime()}"
    val sq = q.writeStream.format("memory").queryName(sink).outputMode(mode)
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    (sink, sq)
  }

  test("tumbling window aggregate with watermark drops late rows") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val agg = ms.toDF().toDF("ts", "key", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("key"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("w"), col("key"), col("n"), col("sv"))
    val (sink, query) = runToTable(agg, "append")
    try {
      ms.addData(Seq((ts(1), 1L, 1.0), (ts(4), 1L, 2.0), (ts(11), 1L, 4.0)))
      query.processAllAvailable()
      // watermark is now 10:11 - 5m = 10:06 => the [10:00,10:10) window closes
      ms.addData(Seq((ts(25), 1L, 8.0)))
      query.processAllAvailable()
      // this row is behind the closed window -> dropped
      ms.addData(Seq((ts(2), 1L, 100.0)))
      query.processAllAvailable()
      ms.addData(Seq((ts(59), 1L, 0.0))) // advance watermark, flush all
      query.processAllAvailable()
    } finally query.stop()
    val rows = s.table(sink).orderBy("w")
      .select(date_format(col("w"), "HH:mm").as("w"), col("key"), col("n"), col("sv"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows == Seq(("10:00", 1L, 2L, 3.0), ("10:10", 1L, 1L, 4.0),
      ("10:20", 1L, 1L, 8.0)))
  }

  test("dropDuplicatesWithinWatermark dedups a streaming key") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val dedup = ms.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val (sink, query) = runToTable(dedup, "append")
    try {
      ms.addData(Seq((ts(1), "a"), (ts(2), "a"), (ts(3), "b")))
      query.processAllAvailable()
      ms.addData(Seq((ts(4), "a"), (ts(5), "b"), (ts(6), "c")))
      query.processAllAvailable()
    } finally query.stop()
    val ids = s.table(sink).select("id").as[String].collect().toSeq.sorted
    assert(ids == Seq("a", "b", "c"))
  }

  test("session window groups by inactivity gap") {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val sess = ms.toDF().toDF("ts", "key")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("key"), col("n"))
    val (sink, query) = runToTable(sess, "append")
    try {
      // two bursts separated by > 5 minutes => two sessions
      ms.addData(Seq((ts(1), 1L), (ts(2), 1L), (ts(3), 1L),
        (ts(20), 1L), (ts(21), 1L)))
      query.processAllAvailable()
      ms.addData(Seq((ts(59), 1L))) // advance watermark to flush
      query.processAllAvailable()
    } finally query.stop()
    val rows = s.table(sink).as[(Long, Long)].collect().toSeq.sortBy(-_._2)
    assert(rows.take(2) == Seq((1L, 3L), (1L, 2L)))
  }
}
