package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DedupStream, DocEvent}

/** Stream/batch equivalence for the incremental dedup operator (q66's
  * live form): both stateful APIs, corpus index as initial state,
  * hits carried across micro-batch boundaries.
  */
class DedupStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(pred: org.apache.spark.sql.Column): Seq[DocEvent] = {
    val s = spark
    import s.implicits._
    Tables.documents(s, dir).filter(pred)
      .select(col("doc_id").as("docId"), col("text"))
      .as[DocEvent].collect().toSeq.sortBy(_.docId)
  }

  private def runStream(api: String): Set[(String, String, Long, Boolean)] = {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = docs(col("doc_id") % 10 < 8)
    val shard = docs(col("doc_id") % 10 >= 8)
    val (b1, b2raw) = shard.splitAt(shard.length / 2)
    // a doc in batch 2 repeating a batch-1 text: its "hit" can ONLY
    // come from state carried across the micro-batch boundary
    val b2 = b2raw :+ DocEvent(999999L, b1.head.text)
    val index = DedupStream.fingerprints(s.createDataset(corpus))
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[DocEvent]
      val obs = DedupStream.fingerprints(in.toDS())
      val out = if (api == "tws") DedupStream.dedupTws(obs, index)
                else DedupStream.dedupFmgws(obs, index)
      val sink = s"dedup_${api}_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("chk").toString)
        .start()
      try {
        in.addData(b1)
        q.processAllAvailable()
        in.addData(b2)
        q.processAllAvailable()
        s.table(sink).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
          .toSet
      } finally q.stop()
    } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def batchExpected(): Set[(String, String, Long, Boolean)] = {
    val s = spark
    import s.implicits._
    val corpus = docs(col("doc_id") % 10 < 8)
    val shard = docs(col("doc_id") % 10 >= 8)
    val b2extra = DocEvent(999999L, shard.take(shard.length / 2).head.text)
    val obs = DedupStream.fingerprints(s.createDataset(shard :+ b2extra)).toDF()
    val index = DedupStream.fingerprints(s.createDataset(corpus)).toDF()
    DedupStream.batchTwin(obs, index).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
  }

  test("transformWithState dedup equals the batch twin across micro-batches") {
    val streamed = runStream("tws")
    val batch = batchExpected()
    assert(streamed === batch)
    // non-vacuous: the synthetic repeat doc exact-hits from state
    // carried across the boundary (not from the corpus index)
    assert(streamed.exists { case (_, kind, id, hit) =>
      kind == "ex" && id == 999999L && hit })
    // and at least one genuine band hit exists somewhere
    assert(streamed.exists { case (_, kind, _, hit) => kind == "band" && hit })
  }

  test("flatMapGroupsWithState twin is equivalent") {
    assert(runStream("fmgws") === batchExpected())
  }
}
