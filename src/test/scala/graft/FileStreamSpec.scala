package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.ControlEvent
import graft.streaming.{HeaterCommand, ThermostatStream}

/** The streaming pipeline over a real file source: the driver
  * testdata's events.parquet streamed through the same
  * flatMapGroupsWithState plan, checked against the batch replay
  * (q16's semantics) — one pipeline, both execution modes.
  */
class FileStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("file-source streaming replay equals the batch fold") {
    val s = spark
    import s.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def toControlEvents(df: org.apache.spark.sql.DataFrame) =
      df.select(
        col("user_id").as("sensorID"),
        col("event_id").as("seq"),
        when(col("event_type") === "purchase", lit("control"))
          .otherwise(lit("data")).as("kind"),
        when(col("event_type") =!= "purchase", col("value"))
          .otherwise(lit(0.0)).as("temperature"),
        when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)).as("desired"),
        lit(5.0).as("upDelta"),
        lit(5.0).as("downDelta")).as[ControlEvent]

    // the file source wants a directory: stage the parquet in a tmp dir
    val stage = Files.createTempDirectory("events_stream")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val streamIn = s.readStream.schema(schema).parquet(stage.toString)
    val sink = s"file_${System.nanoTime()}"
    val q = ThermostatStream.pipeline(toControlEvents(streamIn))
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = s.table(sink).as[HeaterCommand].collect().toSeq
      .sortBy(c => (c.sensorID, c.seq))

    val batch = ThermostatStream.pipeline(
      toControlEvents(s.read.schema(schema).parquet(s"$dir/events.parquet")))
      .collect().toSeq.sortBy(c => (c.sensorID, c.seq))

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("bounded backfill: maxFilesPerTrigger + AvailableNow drains in batches then stops") {
    // the 100-TB reprocessing pattern: draining a large directory must
    // come in bounded micro-batches (state/memory stay flat), and the
    // query must STOP when caught up instead of polling forever
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("backfill")
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"f$i")).toDF("id", "tag")
        .write.parquet(src.resolve(s"part$i").toString)
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType)))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString + "/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .option("checkpointLocation", Files.createTempDirectory("chk").toString)
      .start()
    q.awaitTermination(60000) // AvailableNow terminates on its own
    assert(!q.isActive, "query should stop when the backlog is drained")
    val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(sizes.sum === 4, sizes.mkString(","))
    // rate limit respected: no batch read more than one file's rows
    assert(sizes.forall(_ <= 1), sizes.mkString(","))
    assert(sizes.count(_ > 0) >= 4)
  }
}
