package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided testdata
  * (/root/repo/TESTDATA.md). All reads go through here so scans stay
  * declarative: Catalyst pushes filters and prunes columns into the
  * parquet scan (verify with .explain — PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped in two physical shapes across testdata
    * generations: int64 NANOSECONDS (read as long via the legacy conf,
    * truncated to µs — the same truncation DuckDB applies) and plain
    * timestamp[us] (no isAdjustedToUTC, which Spark reads as
    * TIMESTAMP_NTZ). Normalize both to TimestampType: the session
    * timezone is pinned to UTC everywhere (Verify/Bench/specs), so the
    * NTZ→timestamp cast is value-preserving and every downstream
    * consumer (window(), session_window, unix_millis) sees one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    val norm = df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
    // Spread like documents/embeddings: events also ships as ONE row
    // group, so without this every events consumer runs its scan +
    // get_json_object parse as a SINGLE task. Round-7 adjudication of
    // the q115/q139 bench drifts traced the erratic 3-16 s spikes to
    // exactly that serial stage (TriDebug: s260=15.7s/1t on a quiet
    // box vs <0.8 s steady-state) — a one-vCPU hiccup stalls the
    // whole serial parse, while 32 spread tasks absorb it. At scale
    // the condition is false (many row groups) and this is a no-op.
    spread(s, norm, s"$d/events")
  }
  /** The testdata parquet files are written as a single row group, so
    * byte-range file splitting cannot parallelize the scan: every
    * downstream map stage (tokenize / explode / signature) would run
    * on ONE core regardless of cluster size. When the scan yields
    * fewer splits than cores, spread the rows — a sub-MB shuffle that
    * buys full parallelism on the corpus map stages. On a production
    * layout (many files / row groups per table) the condition is
    * false and this is a no-op: no extra exchange at 100 TB.
    */
  private def spread(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // df.rdd.getNumPartitions plans the frame to RDDs — a driver-side
    // analyze/optimize cycle. The answer is fixed per (session, path)
    // (the testdata is read-only), and documents()/embeddings() are
    // called hundreds of times per Verify/Bench run, so memoize it.
    // CONTRACT: the memo assumes the dataset directory is never
    // rewritten within a session's lifetime — a caller that
    // regenerates a table under the same path would keep the stale
    // partition-count decision (harmless: spread only toggles an
    // extra repartition). If that contract ever breaks, key on a
    // file-listing snapshot instead.
    // Keyed by the SESSION OBJECT in a weak map — a hashCode string
    // would leak entries and could alias a new session to a dead
    // session's cached decision.
    val perSession = spreadCache.synchronized {
      var m = spreadCache.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
        spreadCache.put(s, m)
      }
      m
    }
    val needs = perSession.computeIfAbsent(key,
      _ => java.lang.Boolean.valueOf(df.rdd.getNumPartitions < target))
    if (needs) df.repartition(target) else df
  }

  private val spreadCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]]()

  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "documents"), s"$d/documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "embeddings"), s"$d/embeddings")

  /** Eager one-pass materialization of a persisted frame (see
    * Dedup.q25's race note for WHY eager: two downstream consumers
    * inside one job would otherwise race to compute-and-cache the
    * same partitions). Unlike `count()`, this consumes the
    * internal-row iterator directly — no aggregate plan, no
    * per-partition count shuffled to the driver for a number nobody
    * reads. Cache population happens as the iterator is drained, so
    * the drain must be complete (`foreach`), not just iterator
    * creation.
    */
  def touch(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
}
