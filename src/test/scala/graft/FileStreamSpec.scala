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
}
