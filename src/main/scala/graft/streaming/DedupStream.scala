package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** One document arriving on the ingestion stream. */
final case class DocEvent(docId: Long, text: String)

/** One fingerprint observation: a document's exact-hash or LSH-band
  * key (`kind` = "ex" | "band").
  */
final case class KeyObs(key: String, kind: String, docId: Long)

/** The scored observation: `hit` = this key was already claimed by
  * the corpus index or by an earlier-arriving document.
  */
final case class KeyHit(key: String, kind: String, docId: Long, hit: Boolean)

/** STREAMING incremental dedup — the live form of q66's daily-shard
  * batch job, the operator a real ingestion pipeline runs: every
  * arriving document is checked against (a) the already-indexed
  * corpus and (b) every earlier stream arrival, by exact md5 AND by
  * MinHash-LSH band keys, without ever re-reading the corpus.
  *
  * Design: documents explode to fingerprint keys (one md5 + BandCount
  * band keys, computed by the zero-shuffle native MinHashSig kernel
  * inside the scan stage — q66's index schema exactly), then a
  * per-KEY stateful membership store answers "was this key seen
  * before". The corpus index is loaded as INITIAL STATE (the
  * transformWithState / flatMapGroupsWithState initial-state surface
  * — the streaming analog of q66's broadcast index semi-join), so
  * the running query holds one boolean per known fingerprint and the
  * corpus parquet is touched once, at start. Both stateful APIs are
  * implemented and pinned equivalent (DedupStreamSpec), with the
  * batch twin defined below as the oracle.
  *
  * ORDERING CONTRACT: "earlier" means smaller docId (the batch twin
  * total-orders by docId). Within a micro-batch a key's rows are
  * sorted by docId before scoring; across micro-batches arrival
  * order must be docId-monotone per key — the AnomalyMonitor
  * contract. Two same-batch sharers: the smaller docId claims the
  * key, the larger reports a hit.
  *
  * At scale: state is ONE boolean per distinct fingerprint key in
  * RocksDB, partitioned by key hash across executors — no broadcast
  * of the index, no growth with stream length beyond distinct keys,
  * and restart resumes from checkpoint without re-reading anything.
  * Downstream, a per-doc verdict (exact-dup / near-dup / new) is one
  * docId-keyed aggregate over the emitted KeyHits (q66's verdict
  * shape) — kept outside this operator so the hits stream can also
  * feed an audit sink.
  */
object DedupStream {

  /** Fingerprint explode: one "ex" md5 key + BandCount "band" keys
    * per document (band keys namespaced by band index, as in q23/q66).
    */
  def fingerprints(docs: Dataset[DocEvent]): Dataset[KeyObs] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("docId"),
        concat(
          array(struct(lit("ex").as("kind"), md5(col("text")).as("key"))),
          transform(graft.queries.Hashing.bandKeyStrings(col("text")),
            k => struct(lit("band").as("kind"), k.as("key")))).as("ks"))
      .select(explode(col("ks")).as("k"), col("docId"))
      .select(col("k.key").as("key"), col("k.kind").as("kind"), col("docId"))
      .as[KeyObs]
  }

  /** Corpus index -> initial state: one `true` per distinct key. */
  def seedState(index: Dataset[KeyObs]): KeyValueGroupedDataset[String, Boolean] = {
    val s = index.sparkSession
    import s.implicits._
    index.map(_.key).distinct().map(k => (k, true)).groupByKey(_._1)
      .mapValues(_._2)
  }

  /** transformWithState form: ValueState membership + initial state. */
  class MembershipProcessor
      extends StatefulProcessorWithInitialState[String, KeyObs, KeyHit, Boolean] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInitialState(key: String, initial: Boolean,
        timerValues: TimerValues): Unit =
      seen.update(true)

    override def handleInputRows(key: String, rows: Iterator[KeyObs],
        timerValues: TimerValues): Iterator[KeyHit] = {
      var s = seen.exists()
      val out = rows.toSeq.sortBy(_.docId).map { o =>
        val h = KeyHit(o.key, o.kind, o.docId, hit = s)
        s = true
        h
      }
      if (out.nonEmpty) seen.update(true)
      out.iterator
    }
  }

  def dedupTws(obs: Dataset[KeyObs],
      index: Dataset[KeyObs]): Dataset[KeyHit] = {
    val s = obs.sparkSession
    import s.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new MembershipProcessor,
        TimeMode.None(), OutputMode.Update(), seedState(index))
  }

  /** flatMapGroupsWithState twin — identical semantics. */
  def dedupFmgws(obs: Dataset[KeyObs],
      index: Dataset[KeyObs]): Dataset[KeyHit] = {
    val s = obs.sparkSession
    import s.implicits._
    val f = (key: String, rows: Iterator[KeyObs], state: GroupState[Boolean]) => {
      var seen = state.exists
      val out = rows.toSeq.sortBy(_.docId).map { o =>
        val h = KeyHit(o.key, o.kind, o.docId, hit = seen)
        seen = true
        h
      }
      if (out.nonEmpty) state.update(true)
      out.iterator
    }
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, KeyHit](
        OutputMode.Update, GroupStateTimeout.NoTimeout, seedState(index))(f)
  }

  /** Batch twin (the spec's oracle): a key hits iff corpus-seeded or
    * a smaller docId in the same frame carries it.
    */
  def batchTwin(obs: DataFrame, index: DataFrame): DataFrame = {
    val seeded = index.select(col("key")).distinct()
      .withColumn("__seeded", lit(true))
    obs.join(seeded, Seq("key"), "left")
      .withColumn("__min", min(col("docId")).over(Window.partitionBy(col("key"))))
      .select(col("key"), col("kind"), col("docId"),
        (col("__seeded").isNotNull || col("docId") > col("__min")).as("hit"))
  }
}
