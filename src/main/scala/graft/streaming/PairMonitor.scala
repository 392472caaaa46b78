package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig}

/** One banded blocking row on the stream: the namespaced LSH band
  * key (band_idx#band_key — q23's index schema, DedupStream's key
  * namespace) and the document that produced it.
  */
final case class BandObs(key: String, docId: Long)

/** One CDC document event on the stream: an arrival or — the other
  * half of a production changelog (DMCA removals, opt-outs,
  * retention expiry — q219's live form) — a TAKEDOWN of a previously
  * indexed/streamed document. A takedown must carry the document's
  * text (or the pipeline looks it up in the doc store first): band
  * membership is a pure function of the text, and the monitor needs
  * the band keys to know WHICH bucket lists to remove the id from.
  */
final case class DocCdc(docId: Long, text: String, delete: Boolean)

/** One banded CDC row: [[BandObs]] plus the takedown flag. */
final case class BandCdc(key: String, docId: Long, delete: Boolean)

/** One emitted near-dup CANDIDATE pair (i < j), tagged with the
  * bucket that produced it (a pair sharing several buckets emits
  * once per bucket — dedup is one `distinct` downstream, exactly as
  * in the batch candidate join).
  */
final case class CandPair(i: Long, j: Long, key: String)

/** STREAMING near-dup candidate-pair generation — the live form of
  * q218's delta candidate stage (`ops.incrementalNearDupPairs`'s
  * bucket join): where [[DedupStream]] answers "was this fingerprint
  * seen" (a membership bit per key), this monitor answers the
  * question the incremental dedup pipeline actually joins for —
  * WHICH prior documents share a bucket with the arrival. Every
  * arriving document pairs against (a) the indexed corpus and (b)
  * every earlier stream arrival in the same band bucket, without
  * re-reading the corpus: bucket membership lives as one ListState
  * per band key, seeded from yesterday's band table (the
  * materialized [[graft.api.ops.nearDupBands]] artifact) as initial
  * state.
  *
  * The live contract, pinned in PairMonitorSpec at every micro-batch
  * boundary: the DISTINCT emitted pairs over a stream prefix equal
  * the batch candidate join's pairs touching at least one streamed
  * doc — i.e. the stream IS the insert-only incremental candidate
  * pass, micro-batch by micro-batch. Verification (shingle Jaccard)
  * joins the emitted pairs against the document store downstream —
  * kept outside this operator so the candidate stream can also feed
  * an audit sink (q206's recall bookkeeping), exactly as the batch
  * pipeline separates candidates from the verify join.
  *
  * TAKEDOWNS (round-10, q219's live form — [[pairsCdc]]): a delete
  * event removes its id from every band-bucket member list it
  * produced, so post-delete arrivals never pair with it; state after
  * the removal equals the band table of the SURVIVING corpus, and
  * post-takedown emissions equal the batch bucket join on that
  * surviving union (PairMonitorSpec pins both, across a restart).
  * Same-batch semantics mirror the batch op
  * (`ops.takedownNearDupPairs`): takedowns apply to PRIOR state
  * first, then the batch's arrivals pair against the survivors — a
  * doc deleted and re-inserted in one batch ends present, exactly as
  * the batch op deletes from the old corpus while its insert set
  * still enters. Append-mode emissions are never retracted: a pair
  * emitted BEFORE its endpoint's takedown stays in the sink, and the
  * downstream verify join against the surviving doc store is where
  * it drops — the same division of labor as the batch pipeline.
  *
  * Redelivery is idempotent: a docId already present in the bucket's
  * member list is dropped before pairing, so at-least-once upstreams
  * cannot duplicate pairs or self-pair.
  *
  * At scale: state per band key is the bucket's member list —
  * near-dup buckets are small by construction (the same boundedness
  * the batch candidate join relies on), RocksDB-backed and
  * key-hash-partitioned across executors; a pathological hot bucket
  * is the SAME pathology the batch join would hit and wants the same
  * fix (coarser bands), not a different sketch. Emission is
  * Append-mode pairs only — no per-batch state dump. A takedown pays
  * one O(bucket) list rewrite per band key it touches (ListState has
  * no point-remove) — takedowns are the rare event class, and the
  * rewrite is bucket-bounded, never corpus-bounded.
  */
object PairMonitor {

  /** Takedown-audit counter (round-11 advice): CDC deletes that
    * removed NOTHING from a bucket their text keyed to. Two causes,
    * both worth seeing: an idempotent RE-delete (benign, expected
    * under at-least-once delivery), or TEXT DRIFT — the delete
    * event's text differs from the originally indexed text, so its
    * band keys miss the buckets the old text produced and the id
    * silently stays pairable there. The monitor cannot tell the two
    * apart (both look like "id absent from this bucket"), so it
    * counts and logs instead of guessing; an operator seeing misses
    * without a redelivery burst should audit the doc store for
    * drifted takedown texts. JVM-local (right for local[*] and for
    * tests); on a cluster surface the same count per executor, or
    * swap for a custom StatefulProcessor metric.
    */
  val takedownMisses = new java.util.concurrent.atomic.AtomicLong()

  /** Band explode for arriving documents: BandCount blocking rows
    * per doc via the zero-shuffle native MinHashSig kernel — the
    * per-doc pure function shared with the batch `bandsOf`.
    */
  def bandObs(docs: Dataset[DocEvent]): Dataset[BandObs] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("docId"),
        explode(graft.queries.Hashing.bandKeyStrings(col("text"))).as("key"))
      .select(col("key"), col("docId"))
      .as[BandObs]
  }

  /** Band explode for CDC events: the same pure per-doc band keys,
    * with the takedown flag carried to every produced band row.
    */
  def bandCdc(docs: Dataset[DocCdc]): Dataset[BandCdc] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("docId"), col("delete"),
        explode(graft.queries.Hashing.bandKeyStrings(col("text"))).as("key"))
      .select(col("key"), col("docId"), col("delete"))
      .as[BandCdc]
  }

  /** Corpus band table -> initial state: one sorted member array per
    * band key (one initial-state row per key, as the API requires).
    */
  def seedState(index: Dataset[BandObs])
    : KeyValueGroupedDataset[String, Array[Long]] = {
    val s = index.sparkSession
    import s.implicits._
    index.groupByKey(_.key)
      .mapGroups((k, it) => (k, it.map(_.docId).toArray.distinct.sorted))
      .groupByKey(_._1).mapValues(_._2)
  }

  /** ListState bucket membership over the CDC stream: takedowns
    * remove their id from the member list first; arrivals then pair
    * against every surviving prior member and join the list
    * themselves.
    */
  class BucketPairProcessor
      extends StatefulProcessorWithInitialState[String, BandCdc, CandPair, Array[Long]] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(key: String, initial: Array[Long],
        timerValues: TimerValues): Unit =
      members.put(initial)

    override def handleInputRows(key: String, rows: Iterator[BandCdc],
        timerValues: TimerValues): Iterator[CandPair] = {
      val rs = rows.toVector
      val dels = rs.filter(_.delete).map(_.docId).toSet
      var prior: Vector[Long] =
        if (members.exists()) members.get().toVector else Vector.empty
      // takedowns FIRST, against prior state only (the batch op's
      // contract: deletes hit the old corpus; this batch's inserts
      // still enter). One bucket-bounded list rewrite when anything
      // was actually removed; an idempotent re-delete rewrites
      // nothing.
      if (dels.nonEmpty) {
        // takedown audit: a delete that removes nothing from this
        // bucket is either a benign re-delete or a DRIFTED takedown
        // text (see [[PairMonitor.takedownMisses]]) — count + log so
        // a drifted takedown is observable rather than silent
        val missed = dels -- prior
        if (missed.nonEmpty) {
          PairMonitor.takedownMisses.addAndGet(missed.size.toLong)
          System.err.println(s"[pair-monitor] takedown removed nothing from " +
            s"bucket $key for id(s) ${missed.mkString(",")} — re-delete or " +
            "drifted takedown text")
        }
        val survived = prior.filterNot(dels)
        if (survived.size != prior.size) {
          if (survived.isEmpty) members.clear()
          else members.put(survived.toArray)
          prior = survived
        }
      }
      val known = prior.toSet
      // within-batch determinism: docId order (the batch join's
      // canonical i < j comes out the same either way — min/max
      // below — but the emission order is now reproducible)
      val fresh = rs.filterNot(_.delete).map(_.docId).distinct.sorted
        .filterNot(known)
      var all = prior
      val out = Vector.newBuilder[CandPair]
      for (d <- fresh) {
        all.foreach { p =>
          if (p != d) out += CandPair(math.min(p, d), math.max(p, d), key)
        }
        all = all :+ d
      }
      // append only the arrivals: surviving members are immutable
      // here, and RocksDB merge operands make this O(new) instead of
      // the O(bucket) full-list rewrite put() would pay on a hot
      // bucket
      if (fresh.nonEmpty) members.appendList(fresh.toArray)
      out.result().iterator
    }
  }

  /** The running query body over a full CDC stream (arrivals +
    * takedowns): band CDC rows -> candidate pairs, bucket state
    * seeded from the corpus band table.
    */
  def pairsCdc(obs: Dataset[BandCdc],
      index: Dataset[BandObs]): Dataset[CandPair] = {
    val s = obs.sparkSession
    import s.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new BucketPairProcessor,
        TimeMode.None(), OutputMode.Append(), seedState(index))
  }

  /** The insert-only query body (q218's live form): arriving band
    * rows -> candidate pairs — [[pairsCdc]]'s zero-takedown
    * specialization, exactly as `ops.nearDupDedupIncremental` is
    * `ops.nearDupDedupDelta`'s.
    */
  def pairs(obs: Dataset[BandObs],
      index: Dataset[BandObs]): Dataset[CandPair] = {
    val s = obs.sparkSession
    import s.implicits._
    pairsCdc(obs.map(o => BandCdc(o.key, o.docId, delete = false)), index)
  }
}
