package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.ControlEvent
import graft.streaming.{HeaterCommand, ThermostatStream}

object StreamRestartSpec {
  // cross-incarnation sink state: foreachBatch is at-least-once on
  // restart, so batch ids dedup replays (the standard idempotent-sink
  // guard)
  val emitted = new ConcurrentLinkedQueue[HeaterCommand]()
  val seenBatches = new ConcurrentHashMap[java.lang.Long, java.lang.Boolean]()
}

/** Checkpoint-restart recovery — the semantics the reference's hybrid
  * variant gets WRONG by restarting the query with driver-held state
  * (SparkStructuredStateController.scala:82-110 stops/restarts the
  * data query and loses any operator state): stop the stateful query
  * mid-stream, feed more data, restart from the SAME checkpoint, and
  * the per-key hysteresis/dedup state must carry across — the
  * two-phase output equals one continuous batch fold, with no
  * re-emitted (duplicate) and no missing transitions. Sink is
  * foreachBatch (the recovery-capable arbitrary sink; the memory sink
  * does not support checkpoint recovery).
  */
class StreamRestartSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def toControlEvents(df: org.apache.spark.sql.DataFrame) =
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
      lit(5.0).as("downDelta")).as[ControlEvent](
      org.apache.spark.sql.Encoders.product[ControlEvent])

  test("restart from checkpoint carries per-key state across queries") {
    val s = spark
    import s.implicits._

    val all = s.read.schema(schema).parquet(s"$dir/events.parquet")
    val mid = all.agg(expr("percentile(event_id, 0.5)")).head().getDouble(0).toLong

    // two phase files in one staged source dir; the file source's
    // checkpoint tracks which files each query incarnation consumed
    val stage = Files.createTempDirectory("restart_src")
    val chk = Files.createTempDirectory("restart_chk").toString
    all.filter(col("event_id") <= mid).coalesce(1)
      .write.parquet(s"$stage/phase1")

    def runPhase(): Int = {
      val in = s.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(stage.toString)
      val q = ThermostatStream.pipeline(toControlEvents(in))
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[HeaterCommand], id: Long) =>
          if (StreamRestartSpec.seenBatches.putIfAbsent(id, true) == null) {
            ds.collect().foreach(StreamRestartSpec.emitted.add)
          }
        }
        .outputMode("update")
        .option("checkpointLocation", chk)
        .start()
      try q.processAllAvailable() finally q.stop()
      StreamRestartSpec.emitted.size()
    }

    val afterPhase1 = runPhase()
    // query is now STOPPED; new data lands, a fresh query incarnation
    // resumes from the same checkpoint
    all.filter(col("event_id") > mid).coalesce(1)
      .write.parquet(s"$stage/phase2")
    val afterPhase2 = runPhase()

    import scala.jdk.CollectionConverters._
    val streamed = StreamRestartSpec.emitted.asScala.toSeq
      .sortBy(c => (c.sensorID, c.seq))
    val batch = ThermostatStream.pipeline(toControlEvents(all))
      .collect().toSeq.sortBy(c => (c.sensorID, c.seq))

    assert(afterPhase1 > 0 && afterPhase2 > afterPhase1)
    // lost state would RE-EMIT a pre-restart action (dedup resets);
    // equality with the continuous fold pins both no-dup and no-loss
    assert(streamed == batch)
  }
}
