package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Temporal / event-sequence operators — the event-analytics layer
  * that complements the point-in-time joins (q37/q60 as-of, q43/q68
  * range): slowly-changing-dimension semantics, funnel conversion,
  * Markov transition structure, and time-windowed deduplication.
  *
  * Scale notes: every query shuffles the event stream at most once on
  * its natural key (`user_id` or the grouping key) and aggregates
  * partially before the exchange; dimension/summary sides of joins
  * are per-user or per-type, i.e. broadcastable by construction. All
  * derived ratios use the exact int64 helpers (`Relational.ratio4`)
  * so both engines hash identically.
  */
object Temporal {

  // ---------------------------------------------------------------
  // q82: SCD2 (slowly-changing-dimension type 2) temporal join — the
  // versioned-dimension pattern: each user's 'signup' events open a
  // new dimension version valid [ts, next signup ts); purchase facts
  // join to the version in effect at purchase time. This is the
  // interval form of the as-of join (q37/q60) — the dimension carries
  // explicit validity windows, so one hash join on user_id plus a
  // range predicate resolves each fact, with no per-fact sort.
  //
  // Scale shape: versions are built with one window pass over the
  // (small) signup subset; the fact side joins on the user_id equi
  // key and applies the interval predicate as a post-filter. The
  // broadcast() hint holds while the version table fits an executor
  // (a handful of versions per user — to ~10M users); at full
  // dimension cardinality drop it and the equi-join co-partitions
  // both sides on user_id — the fact stream still shuffles once.
  // Facts before the first version are intentionally dropped (inner
  // join) — the standard SCD2 "no dimension yet" rule.
  // ---------------------------------------------------------------
  def q82Scd2Join(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    // distinct column names on the two sides: both derive from `ev`,
    // and explicit renames keep the join condition unambiguous
    val dim = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("d_uid"), col("ts").as("valid_from"),
        col("event_id").as("d_eid"),
        floor(col("value")).cast("long").as("tier"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("d_uid"))
            // (ts, event_id) — the SAME total order as the oracle;
            // ordering by tier would diverge on same-µs signup ties
            .orderBy(col("valid_from"), col("d_eid"))))
      .drop("d_eid")
    val fact = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    fact.join(broadcast(dim),
        col("user_id") === col("d_uid") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("per_user", Relational.ratio4(col("n_purchases"), col("n_users")))
      .orderBy("tier")
  }

  val q82Sql: String =
    """WITH dim AS (
      |  SELECT user_id, ts AS valid_from,
      |    CAST(FLOOR(value) AS BIGINT) AS tier,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM events WHERE event_type = 'signup'
      |), fact AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT tier, COUNT(*) AS n_purchases,
      |  COUNT(DISTINCT f.user_id) AS n_users,
      |  ((20000*COUNT(*) + COUNT(DISTINCT f.user_id))
      |    // (2*COUNT(DISTINCT f.user_id))) / 10000.0 AS per_user
      |FROM fact f JOIN dim d
      |  ON f.user_id = d.user_id AND f.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |GROUP BY tier ORDER BY tier""".stripMargin

  // ---------------------------------------------------------------
  // q84: FUNNEL conversion — view -> click -> purchase, strictly in
  // order per user: a stage counts only if it happens at-or-after the
  // user's entry into the previous stage. Three per-user aggregates
  // chained by broadcast joins (each stage re-aggregates the event
  // stream filtered by the previous stage's timestamp); the final
  // 3-row report unions the stage counts with step conversion rates.
  //
  // Scale shape: each stage is a partial-aggregated pass over one
  // event-type partition of the stream; the per-user timestamps of
  // the previous stage are the join side. The broadcast() hints hold
  // while those stage tables fit an executor (one row per converting
  // user — fine to ~10M users); at full user cardinality DROP the
  // hints: all three passes co-partition on user_id and AQE plans the
  // stage joins shuffle-free after the first exchange (the q27/q74
  // broadcast-envelope treatment).
  // ---------------------------------------------------------------
  def q84Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(broadcast(s1), "user_id")
      .filter(col("ts") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(broadcast(s2), "user_id")
      .filter(col("ts") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit(1L))
    val n2 = s2.agg(count(lit(1)).as("n")).withColumn("stage", lit(2L))
    val n3 = s3.agg(count(lit(1)).as("n")).withColumn("stage", lit(3L))
    import s.implicits._
    val names = Seq((1L, "view"), (2L, "click"), (3L, "purchase"))
      .toDF("stage", "stage_name")
    val counts = n1.union(n2).union(n3)
    val wprev = Window.orderBy(col("stage"))
    counts.join(broadcast(names), "stage")
      .withColumn("conv_ratio",
        Relational.ratio4(col("n"),
          coalesce(lag(col("n"), 1).over(wprev), col("n"))))
      .select(col("stage"), col("stage_name"), col("n").as("n_users"),
        col("conv_ratio"))
      .orderBy("stage")
  }

  val q84Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id AND e.ts >= s1.t1
      |  WHERE e.event_type = 'click' GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |  JOIN s2 ON s2.user_id = e.user_id AND e.ts >= s2.t2
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
      |), counts AS (
      |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |    COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
      |)
      |SELECT stage, stage_name, n_users,
      |  ((20000*n_users + COALESCE(LAG(n_users) OVER (ORDER BY stage), n_users))
      |    // (2*COALESCE(LAG(n_users) OVER (ORDER BY stage), n_users))) / 10000.0
      |    AS conv_ratio
      |FROM counts ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------
  // q86: MARKOV transition matrix over per-user event sequences —
  // the session-structure statistic behind next-event prediction and
  // bot detection. One window pass (lag over user_id ordered by ts)
  // produces (prev, cur) pairs; a hash aggregate counts them; the
  // per-prev row totals come from a second window over the (tiny,
  // |types|^2-row) count table, not from re-reading the events.
  // ---------------------------------------------------------------
  def q86MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events(s, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    val counts = pairs.groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p",
        Relational.ratio4(col("n"),
          sum(col("n")).over(Window.partitionBy(col("prev")))))
      .orderBy("prev", "cur")
  }

  val q86Sql: String =
    """WITH pairs AS (
      |  SELECT LAG(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS prev,
      |         event_type AS cur
      |  FROM events
      |), counts AS (
      |  SELECT prev, cur, COUNT(*) AS n FROM pairs
      |  WHERE prev IS NOT NULL GROUP BY prev, cur
      |)
      |SELECT prev, cur, n,
      |  ((20000*n + SUM(n) OVER (PARTITION BY prev))
      |    // (2*SUM(n) OVER (PARTITION BY prev))) / 10000.0 AS p
      |FROM counts ORDER BY prev, cur""".stripMargin

  // ---------------------------------------------------------------
  // q89: time-WINDOWED dedup — keep the first event per (user, type)
  // within each hour bucket, the batch analog of streaming
  // dropDuplicatesWithinWatermark (EventTimeStreamSpec holds the
  // streaming twin). One window pass keyed by the dedup key + bucket;
  // at 100 TB the key includes the hour, so state per partition is
  // bounded by the bucket width — the same property that makes the
  // watermark version's state finite.
  // ---------------------------------------------------------------
  def q89WindowedDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("hour"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("hour", date_trunc("HOUR", col("ts")))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_removed", col("n_events") - col("n_kept"))
      .withColumn("removed_ratio",
        Relational.ratio4(col("n_removed"), col("n_events")))
      .orderBy("event_type")
  }

  val q89Sql: String =
    """WITH r AS (
      |  SELECT event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
      |      date_trunc('hour', ts) ORDER BY ts, event_id) AS rn
      |  FROM events
      |), g AS (
      |  SELECT event_type, COUNT(*) AS n_events,
      |    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |  FROM r GROUP BY event_type
      |)
      |SELECT event_type, n_events, n_kept,
      |  n_events - n_kept AS n_removed,
      |  ((20000*(n_events - n_kept) + n_events) // (2*n_events)) / 10000.0
      |    AS removed_ratio
      |FROM g ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q101: GAP-FILL + forward-fill (LOCF) resampling — the time-series
  // regularization operator: build the complete hourly spine per
  // user, left-join observations onto it, and carry the last
  // observation forward across gaps (`last(v, ignoreNulls)` over an
  // unbounded-preceding frame). Sums of the filled series go through
  // exact decimal(18,2) (the money-column parity technique) so both
  // engines agree bit-for-bit.
  //
  // Scale shape: observations aggregate to (user, hour) first — far
  // smaller than raw events; the spine is |users| x |hours| rows
  // generated BY sequence() inside the engine (no driver loop) and
  // joins/fills partitioned by user. At 100 TB the spine generation
  // stays embarrassingly parallel and the single user-keyed shuffle
  // carries the hourly aggregate, never raw events.
  // ---------------------------------------------------------------
  def q101GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val obs = ev.groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("h"))
      .agg(max(col("value")).as("v"))
    val bounds = ev.agg(
      date_trunc("HOUR", min(col("ts"))).as("lo"),
      date_trunc("HOUR", max(col("ts"))).as("hi"))
    val spine = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val filled = spine.join(obs, Seq("user_id", "h"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(
        Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"), count(col("v")).as("n_obs"),
        (count(col("fv")) - count(col("v"))).as("n_filled"),
        sum(col("fv").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_filled"))
      .orderBy("user_id")
  }

  val q101Sql: String =
    """WITH b AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, MAX(value) AS v
      |  FROM events GROUP BY 1, 2
      |), bounds AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS lo,
      |         date_trunc('hour', MAX(ts)) AS hi
      |  FROM events
      |), users AS (
      |  SELECT DISTINCT user_id FROM events
      |), spine AS (
      |  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM users, bounds
      |), j AS (
      |  SELECT s.user_id, s.h, b.v FROM spine s
      |  LEFT JOIN b USING (user_id, h)
      |), f AS (
      |  SELECT user_id, v,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      |  FROM j
      |)
      |SELECT user_id, COUNT(*) AS n_hours, COUNT(v) AS n_obs,
      |  CAST(COUNT(fv) - COUNT(v) AS BIGINT) AS n_filled,
      |  CAST(SUM(CAST(fv AS DECIMAL(18,2))) AS DOUBLE) AS sum_filled
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // q105: sketch RE-AGGREGATION — HLL distinct users per day AND the
  // month total from ONE rollup pass: the property that makes
  // sketches matter at scale is mergeability (per-day sketches
  // combine into the total without rescanning), and rollup exercises
  // exactly that merge path inside the aggregate. Gated like q36: the
  // exact count is the output, the sketch contributes a per-engine
  // "within 5%" flag that both engines' HLLs satisfy deterministically.
  // ---------------------------------------------------------------
  def q105SketchRollup(s: SparkSession, dir: String): DataFrame = {
    events(s, dir)
      .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .rollup(col("day"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(coalesce(col("day"), lit("ALL")).as("day"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <
          col("exact_users").cast("double") * 0.05).cast("int").as("within_5pct"))
      .orderBy("day")
  }

  val q105Sql: String =
    """SELECT COALESCE(day, 'ALL') AS day,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  CAST(abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
      |       < COUNT(DISTINCT user_id) * 0.05 AS INT) AS within_5pct
      |FROM (SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
      |      FROM events)
      |GROUP BY ROLLUP(day) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // q125: ROLLING 7-day active users — the WAU/MAU statistic, exact.
  // Sliding distinct counts cannot be summed from daily distincts
  // (users overlap days), and a naive per-day re-scan is 7x the work.
  // The distributed trick: reduce to distinct (user, day) once, then
  // each contributes to the 7 trailing windows it is visible in — a
  // BOUNDED x7 explode — and a distinct count per window day
  // finishes it. Two key-bounded shuffles total, independent of the
  // window length's data volume. Days with no activity simply have
  // no row (the testdata stream is dense, so the spine is complete).
  // ---------------------------------------------------------------
  def q125RollingActive(s: SparkSession, dir: String): DataFrame = {
    val ud = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val maxDay = ud.agg(max(col("day")).as("max_day"))
    ud.select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(6))).as("off"))
      .select(col("user_id"), date_add(col("day"), col("off")).as("wday"))
      // don't emit windows past the observed horizon
      .crossJoin(broadcast(maxDay))
      .filter(col("wday") <= col("max_day"))
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"),
        col("active_7d"))
      .orderBy("day")
  }

  val q125Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), mx AS (SELECT MAX(day) AS max_day FROM ud),
      |w AS (
      |  SELECT user_id, day + CAST(off AS INT) AS wday
      |  FROM ud, unnest(range(7)) t(off)
      |)
      |SELECT strftime(wday, '%Y-%m-%d') AS day,
      |  COUNT(DISTINCT user_id) AS active_7d
      |FROM w WHERE wday <= (SELECT max_day FROM mx)
      |GROUP BY wday ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // q126: COHORT retention matrix — the product-analytics standard
  // that q93's next-day retention is one cell of: bucket every user
  // by first-activity day (their cohort), then count distinct users
  // active at each day offset from their cohort. One pass computes
  // cohorts (min day per user, a partial-aggregated groupBy that
  // broadcasts back); offsets come from the activity stream joined
  // to that per-user table — no day-by-day re-scans. Retention is
  // exact int64 against the cohort size. Broadcast envelope: the
  // cohort table is one row per user — the hint holds to ~10M users;
  // beyond that drop it and the join co-partitions on user_id
  // (the sizes side is one row per DAY — broadcast at any scale).
  // ---------------------------------------------------------------
  def q126CohortMatrix(s: SparkSession, dir: String): DataFrame = {
    val ud = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohorts = ud.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(countDistinct(col("user_id")).as("cohort_n"))
    ud.join(broadcast(cohorts), Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("off"))
      .filter(col("off") <= 7)
      .groupBy(col("cohort_day"), col("off"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("off"), col("n_active"), col("cohort_n"),
        Relational.ratio4(col("n_active"), col("cohort_n"))
          .as("retention"))
      .orderBy("cohort_day", "off")
  }

  val q126Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), cohorts AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
      |), sizes AS (
      |  SELECT cohort_day, COUNT(DISTINCT user_id) AS cohort_n
      |  FROM cohorts GROUP BY cohort_day
      |), cells AS (
      |  SELECT c.cohort_day, datediff('day', c.cohort_day, ud.day) AS off,
      |    COUNT(DISTINCT ud.user_id) AS n_active
      |  FROM ud JOIN cohorts c USING (user_id)
      |  WHERE datediff('day', c.cohort_day, ud.day) <= 7
      |  GROUP BY c.cohort_day, datediff('day', c.cohort_day, ud.day)
      |)
      |SELECT strftime(cells.cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(off AS BIGINT) AS off, n_active, cohort_n,
      |  ((20000*n_active + cohort_n) // (2*cohort_n)) / 10000.0 AS retention
      |FROM cells JOIN sizes USING (cohort_day)
      |ORDER BY cohort_day, off""".stripMargin

  // ---------------------------------------------------------------
  // q128: BITEMPORAL as-of — two time axes: when a fact became VALID
  // (the purchase ts) and when it became KNOWN to the system (here:
  // recorded one hour late, the realistic ingestion lag). A plain
  // as-of join (q37/q60) answers "latest version valid at t"; the
  // bitemporal query answers "latest version valid at t AMONG those
  // already known at t" — what a reproducible training snapshot or a
  // point-in-time feature store must use, or late-arriving facts
  // leak into the past. Implemented as the q37 window shape with the
  // knowledge filter applied before the last_value sweep; the output
  // diffs the two answers per day, pinning that they genuinely
  // disagree (n_differs > 0) and by how much.
  // ---------------------------------------------------------------
  def q128BitemporalAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val KnowledgeLagUs = 3600L * 1000000L
    def latestVersionValue(knowledgeAware: Boolean): DataFrame = {
      // tag stream: versions (purchases) + probes (views), swept in
      // one (ts, event_id) order per user; a knowledge-aware sweep
      // shifts each version's effectiveness to its RECORD time
      val versions = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (unix_micros(col("ts")) +
            (if (knowledgeAware) KnowledgeLagUs else 0L)).as("eff_us"),
          col("event_id"), round(col("value") * 100).cast("long").as("vcents"))
      val probes = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("eff_us"),
          col("event_id"), lit(null).cast("long").as("vcents"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("eff_us"), col("vcents").isNotNull.desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      versions.unionByName(probes)
        .withColumn("cur", last(col("vcents"), ignoreNulls = true).over(w))
        .filter(col("vcents").isNull) // keep probes only
        .select(col("user_id"), col("event_id"), col("cur"))
    }
    val naive = latestVersionValue(knowledgeAware = false)
      .withColumnRenamed("cur", "naive_cents")
    val bitemporal = latestVersionValue(knowledgeAware = true)
      .withColumnRenamed("cur", "bt_cents")
    ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .join(naive, Seq("user_id", "event_id"))
      .join(bitemporal, Seq("user_id", "event_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("naive_cents").isNotNull &&
          (col("bt_cents").isNull ||
            col("bt_cents") =!= col("naive_cents")), 1L)
          .otherwise(0L)).as("n_differs"),
        sum(coalesce(col("bt_cents"), lit(0L))).as("bt_sum"),
        sum(coalesce(col("naive_cents"), lit(0L))).as("naive_sum"))
      .orderBy("day")
  }

  val q128Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, epoch_us(ts) AS eff_us, event_id,
      |    CAST(round(value*100) AS BIGINT) AS vcents
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), event_id, NULL
      |  FROM events WHERE event_type = 'view'
      |), naive AS (
      |  SELECT user_id, event_id,
      |    last_value(vcents IGNORE NULLS) OVER (
      |      PARTITION BY user_id
      |      ORDER BY eff_us, (vcents IS NOT NULL) DESC, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS naive_cents
      |  FROM tagged
      |), tagged_bt AS (
      |  SELECT user_id, eff_us + 3600000000 AS eff_us, event_id, vcents
      |  FROM tagged WHERE vcents IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, eff_us, event_id, NULL
      |  FROM tagged WHERE vcents IS NULL
      |), bt AS (
      |  SELECT user_id, event_id,
      |    last_value(vcents IGNORE NULLS) OVER (
      |      PARTITION BY user_id
      |      ORDER BY eff_us, (vcents IS NOT NULL) DESC, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bt_cents
      |  FROM tagged_bt
      |)
      |SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
      |  COUNT(*) AS n_probes,
      |  CAST(SUM(CASE WHEN n.naive_cents IS NOT NULL AND
      |    (b.bt_cents IS NULL OR b.bt_cents <> n.naive_cents)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_differs,
      |  CAST(SUM(COALESCE(b.bt_cents, 0)) AS BIGINT) AS bt_sum,
      |  CAST(SUM(COALESCE(n.naive_cents, 0)) AS BIGINT) AS naive_sum
      |FROM events e
      |JOIN naive n ON n.user_id = e.user_id AND n.event_id = e.event_id
      |JOIN bt b ON b.user_id = e.user_id AND b.event_id = e.event_id
      |WHERE e.event_type = 'view'
      |GROUP BY 1 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // q134: seasonal-naive FORECAST baseline + backtest — the
  // forecasting floor every model must beat: predict each hour's
  // value sum as the same hour yesterday, then score the prediction
  // with MAE/bias over the backtest horizon. One bucket aggregate,
  // one self-join on (type, hour-24h) — both key-bounded — and the
  // error statistics are exact int64 cents (a float exponential
  // smoother would not hash across engines; the seasonal-naive
  // baseline is the standard yardstick anyway). Hours with no
  // yesterday (the first day) are excluded from scoring.
  // ---------------------------------------------------------------
  def q134SeasonalBaseline(s: SparkSession, dir: String): DataFrame = {
    val hourly = events(s, dir)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .groupBy(col("event_type"), col("hr"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val prev = hourly.select(col("event_type"),
      (col("hr") + expr("INTERVAL 24 HOURS")).as("hr"),
      col("cents").as("pred_cents"))
    hourly.join(prev, Seq("event_type", "hr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("cents") - col("pred_cents"))).as("abs_err_cents"),
        sum(col("cents") - col("pred_cents")).as("bias_cents"))
      // int64 div, not ratio4/ldiv: 20000*abs_err_cents can pass
      // ldiv's 2^53 double-mantissa bound on dense data (the q124
      // lesson); div stays exact for the full int64 range
      .withColumn("mae_cents",
        expr("(20000 * abs_err_cents + n_hours) div (2 * n_hours)") / 10000.0)
      .orderBy("event_type")
  }

  val q134Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, date_trunc('hour', ts)
      |), joined AS (
      |  SELECT h.event_type, h.cents, p.cents AS pred_cents
      |  FROM hourly h JOIN hourly p
      |    ON p.event_type = h.event_type
      |   AND p.hr + INTERVAL 24 HOUR = h.hr
      |)
      |SELECT event_type, COUNT(*) AS n_hours,
      |  CAST(SUM(abs(cents - pred_cents)) AS BIGINT) AS abs_err_cents,
      |  CAST(SUM(cents - pred_cents) AS BIGINT) AS bias_cents,
      |  ((20000*CAST(SUM(abs(cents - pred_cents)) AS BIGINT) + COUNT(*))
      |    // (2*COUNT(*))) / 10000.0 AS mae_cents
      |FROM joined GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q139: TIME-CONSTRAINED funnel — q84's strictly-ordered funnel
  // with per-step deadlines: a click counts only within 1 hour of
  // the user's first view, a purchase only within 24 hours of that
  // click (the form conversion analysis actually uses — unbounded
  // step windows overcount users who "converted" days later for
  // unrelated reasons). Same scale shape as q84: per-stage partial
  // aggregates chained by per-user timestamp tables — the same
  // broadcast envelope (hints hold to ~10M converting users; beyond
  // that drop them for the co-partitioned AQE plan).
  // ---------------------------------------------------------------
  def q139TimedFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(broadcast(s1), "user_id")
      .filter(col("ts") >= col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(broadcast(s2), "user_id")
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    import s.implicits._
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("stage", lit(1L))
      .union(s2.agg(count(lit(1)).as("n")).withColumn("stage", lit(2L)))
      .union(s3.agg(count(lit(1)).as("n")).withColumn("stage", lit(3L)))
    val names = Seq((1L, "view"), (2L, "click_1h"), (3L, "purchase_24h"))
      .toDF("stage", "stage_name")
    val wprev = Window.orderBy(col("stage"))
    counts.join(broadcast(names), "stage")
      .withColumn("conv_ratio",
        Relational.ratio4(col("n"),
          coalesce(lag(col("n"), 1).over(wprev), col("n"))))
      .select(col("stage"), col("stage_name"), col("n").as("n_users"),
        col("conv_ratio"))
      .orderBy("stage")
  }

  val q139Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id
      |   AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR
      |  WHERE e.event_type = 'click' GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |  JOIN s2 ON s2.user_id = e.user_id
      |   AND e.ts >= s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
      |), counts AS (
      |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |    COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'click_1h', COUNT(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase_24h', COUNT(*) FROM s3
      |)
      |SELECT stage, stage_name, n_users,
      |  ((20000*n_users + COALESCE(LAG(n_users) OVER (ORDER BY stage), n_users))
      |    // (2*COALESCE(LAG(n_users) OVER (ORDER BY stage), n_users))) / 10000.0
      |    AS conv_ratio
      |FROM counts ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------
  // q153: exponential-decay smoothing (EWMA, alpha = 1/2) — each
  // user's "current level" with geometrically fading history, the
  // batch twin of a streaming decayed counter. With halving weights
  // the truncated 8-term EWMA is EXACT integer arithmetic: weight
  // 2^(7-k) on lag k of integer cents, so the weighted numerator and
  // the present-lag weight sum are int64 (max |cents| ~3.3e4, max
  // numerator 3.3e4 * 255 ~ 8.4e6 — no overflow, no float drift).
  // The alpha=1/2, depth-8 truncation bounds the dropped tail mass
  // at 2^-8 of the oldest retained weight — below the 4-dp output
  // grid, which is why a fixed depth is the right scale trade: a
  // true unbounded EWMA needs a running-product scan (inherently
  // sequential per key), while this form is one window pass.
  //
  // Scale shape: everything — the 8 lags, the last-row pick, the
  // per-user count — shares ONE hash partition on user_id, so the
  // event stream shuffles exactly once; the asc/desc sorts resolve
  // inside that exchange. Output is one row per user (the latest
  // smoothed level), i.e. key-cardinality, not event-cardinality.
  // ---------------------------------------------------------------
  def q153EwmaDecay(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def lagK(k: Int): Column =
      if (k == 0) col("cents") else lag(col("cents"), k).over(w)
    val num = (0 until 8).map { k =>
      coalesce(lagK(k), lit(0L)) * lit(1L << (7 - k))
    }.reduce(_ + _)
    val den = (0 until 8).map { k =>
      when(lagK(k).isNotNull, lit(1L << (7 - k))).otherwise(lit(0L))
    }.reduce(_ + _)
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
      .withColumn("ew_num", num)
      .withColumn("ew_den", den)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n_events",
        count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"),
        // smoothed level in exact 4-dp cents: ratio4(num, den)
        Relational.ratio4(col("ew_num"), col("ew_den")).as("ewma_c4"),
        col("cents").as("last_cents"))
      .orderBy("user_id")
  }

  val q153Sql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events
      |), t AS (
      |  SELECT user_id, ts, event_id, cents,
      |    128*cents
      |      + 64*COALESCE(LAG(cents,1) OVER w, 0)
      |      + 32*COALESCE(LAG(cents,2) OVER w, 0)
      |      + 16*COALESCE(LAG(cents,3) OVER w, 0)
      |      +  8*COALESCE(LAG(cents,4) OVER w, 0)
      |      +  4*COALESCE(LAG(cents,5) OVER w, 0)
      |      +  2*COALESCE(LAG(cents,6) OVER w, 0)
      |      +  1*COALESCE(LAG(cents,7) OVER w, 0) AS ew_num,
      |    128
      |      + CASE WHEN LAG(cents,1) OVER w IS NULL THEN 0 ELSE 64 END
      |      + CASE WHEN LAG(cents,2) OVER w IS NULL THEN 0 ELSE 32 END
      |      + CASE WHEN LAG(cents,3) OVER w IS NULL THEN 0 ELSE 16 END
      |      + CASE WHEN LAG(cents,4) OVER w IS NULL THEN 0 ELSE  8 END
      |      + CASE WHEN LAG(cents,5) OVER w IS NULL THEN 0 ELSE  4 END
      |      + CASE WHEN LAG(cents,6) OVER w IS NULL THEN 0 ELSE  2 END
      |      + CASE WHEN LAG(cents,7) OVER w IS NULL THEN 0 ELSE  1 END AS ew_den,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM c
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
      |  ((20000*ew_num + ew_den) // (2*ew_den)) / 10000.0 AS ewma_c4,
      |  cents AS last_cents
      |FROM t WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // q183: HOLT-style LEVEL + TREND smoothing (Brown's double
  // exponential method) — q153 gives each user a decayed "current
  // level" but is structurally blind to drift: a user whose spend
  // rises every event and one holding steady can share an EWMA. The
  // classical fix is a second smoothing pass: with S' = EWMA(x) and
  // S'' = EWMA(S'),  level = 2S' - S'',  trend = S' - S'' (alpha =
  // 1/2), forecast(+1) = level + trend = 3S' - 2S''. Composing two
  // truncated alpha=1/2 EWMAs gives EXACT integer lag weights:
  // S'' over 15 lags with weight (8 - |m-7|) * 2^(14-m) on lag m
  // (the convolution of the two halving kernels), so level / trend /
  // forecast are pure int64 rational arithmetic on integer cents —
  // cross-multiplied to the common denominator s1d*s2d, rounded
  // half-up at 4 dp SIGN-SAFELY (trend is negative for decaying
  // users; |num| is divided and the sign reapplied, so the two
  // engines' differing negative-division conventions can never
  // diverge — the q124/ops.ewma lesson, closed instead of
  // documented). Envelope: 20000 * |num| <= 2e4 * (3*255*65025*maxc)
  // ~ 1e15 * maxc-in-dollars — int64-safe to ~$9000 event values;
  // the full-range `div` operator (not ldiv) keeps the division
  // exact past 2^53. Partial histories renormalize both kernels
  // over the available lags (q153's den trick).
  //
  // Scale shape: identical to q153 — all 15 lags, the last-row pick,
  // and the per-user count share ONE user_id exchange; output is
  // key-cardinality. The depth-15 window is the price of the exact
  // closed form; the recursive alternative is inherently sequential
  // per key (a mapGroups sort), strictly worse on a 100-TB shuffle.
  // ---------------------------------------------------------------
  private val HoltW: IndexedSeq[Long] =
    (0 to 14).map(m => (8L - math.abs(m - 7)) * (1L << (14 - m)))

  def q183HoltTrend(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def lagK(k: Int): Column =
      if (k == 0) col("cents") else lag(col("cents"), k).over(w)
    val s1num = (0 until 8).map { k =>
      coalesce(lagK(k), lit(0L)) * lit(1L << (7 - k))
    }.reduce(_ + _)
    val s1den = (0 until 8).map { k =>
      when(lagK(k).isNotNull, lit(1L << (7 - k))).otherwise(lit(0L))
    }.reduce(_ + _)
    val s2num = (0 to 14).map { m =>
      coalesce(lagK(m), lit(0L)) * lit(HoltW(m))
    }.reduce(_ + _)
    val s2den = (0 to 14).map { m =>
      when(lagK(m).isNotNull, lit(HoltW(m))).otherwise(lit(0L))
    }.reduce(_ + _)
    // sign-safe half-up 4-dp rounding of num/den (den > 0)
    def r4s(n: String): Column =
      (when(col(n) < 0L, lit(-1L)).otherwise(lit(1L)) *
        expr(s"(20000 * abs($n) + den) div (2 * den)")) / 10000.0
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
      .withColumn("s1n", s1num)
      .withColumn("s1d", s1den)
      .withColumn("s2n", s2num)
      .withColumn("s2d", s2den)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n_events",
        count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .withColumn("den", col("s1d") * col("s2d"))
      .withColumn("lvl_n",
        lit(2L) * col("s1n") * col("s2d") - col("s2n") * col("s1d"))
      .withColumn("trd_n",
        col("s1n") * col("s2d") - col("s2n") * col("s1d"))
      .withColumn("fc_n",
        lit(3L) * col("s1n") * col("s2d") - lit(2L) * col("s2n") * col("s1d"))
      .select(col("user_id"), col("n_events"),
        r4s("lvl_n").as("level_c4"), r4s("trd_n").as("trend_c4"),
        r4s("fc_n").as("fc1_c4"), col("cents").as("last_cents"))
      .orderBy("user_id")
  }

  val q183Sql: String = {
    def numTerm(k: Int, w: Long): String =
      if (k == 0) s"$w*cents"
      else s"$w*COALESCE(LAG(cents,$k) OVER w, 0)"
    def denTerm(k: Int, w: Long): String =
      if (k == 0) s"$w"
      else s"CASE WHEN LAG(cents,$k) OVER w IS NULL THEN 0 ELSE $w END"
    val s1n = (0 until 8).map(k => numTerm(k, 1L << (7 - k))).mkString(" + ")
    val s1d = (0 until 8).map(k => denTerm(k, 1L << (7 - k))).mkString(" + ")
    val s2n = (0 to 14).map(m => numTerm(m, HoltW(m))).mkString(" + ")
    val s2d = (0 to 14).map(m => denTerm(m, HoltW(m))).mkString(" + ")
    def r4s(n: String): String =
      s"CASE WHEN $n < 0 THEN -1 ELSE 1 END" +
        s" * ((20000*abs($n) + den) // (2*den)) / 10000.0"
    s"""WITH c AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
       |  FROM events
       |), t AS (
       |  SELECT user_id, cents,
       |    $s1n AS s1n,
       |    $s1d AS s1d,
       |    $s2n AS s2n,
       |    $s2d AS s2d,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn,
       |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
       |  FROM c
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), f AS (
       |  SELECT user_id, n_events, cents, s1d * s2d AS den,
       |    2*s1n*s2d - s2n*s1d AS lvl_n,
       |    s1n*s2d - s2n*s1d AS trd_n,
       |    3*s1n*s2d - 2*s2n*s1d AS fc_n
       |  FROM t WHERE rn = 1
       |)
       |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       |  ${r4s("lvl_n")} AS level_c4,
       |  ${r4s("trd_n")} AS trend_c4,
       |  ${r4s("fc_n")} AS fc1_c4,
       |  cents AS last_cents
       |FROM f ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q194: CUSUM CHANGEPOINT detection — the offline mean-shift
  // locator the anomaly family still lacked: q112 (z-score) and q184
  // (MAD) flag individual outlier POINTS, q95 (L1 drift) compares
  // two pre-named halves; none answers "WHERE did this series'
  // level shift?". The classical estimator is the max-|CUSUM|
  // argmax: with series x_1..x_n and total S, C_k = sum_{i<=k} x_i
  // - k*S/n, and the changepoint estimate is argmax_k |C_k|. To
  // keep both engines bit-identical the statistic is cross-
  // multiplied by n into pure int64: D_k = n*P_k - k*S (P_k the
  // running cents prefix), so no division happens until the final
  // 4-dp report. Ties (a flat series has D_k = 0 everywhere) break
  // to the SMALLEST k — reproducible in both engines. The report
  // carries the segment means on each side of the cut and the
  // n-normalized peak |C| so downstream gating can threshold on
  // effect size, not just position. All divisions are sign-safe
  // (q183's |num| + reapplied-sign treatment) because event values
  // may be negative.
  //
  // Scale shape: ONE exchange on event_type serves the ordering
  // window, the running sum, and the per-type totals (the window
  // family shares its partition key); output is key-cardinality.
  // Overflow envelope: |D_k| <= n^2 * max|cents|, int64-safe while
  // n-per-type^2 * max|cents| < 2^63 (~3e6 rows/type at $100k
  // values); past that, run per time-shard or widen D to decimal.
  // At 100 TB the per-type series is bucketed by event_type so the
  // window sort is partition-local — no global sort anywhere.
  // ---------------------------------------------------------------
  /** q194's parameterized core (ops.cusumChangepoint wraps it): the
    * frame must already carry `key`, the order columns, an `__oid`
    * row identifier, and integer `cents`.
    */
  private[graft] def cusumReport(df: DataFrame, key: String,
      orderCols: Seq[Column]): DataFrame = {
    val wOrd = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    val wAll = Window.partitionBy(col(key))
    // sign-safe half-up 4-dp rounding of num/den (den > 0) over NAMED
    // columns — the full-range `div` operator (not ldiv: 20000*|D|
    // reaches ~4e16 > 2^53 at sf0.1, where ldiv's double path rounds)
    def r4s(num: String, den: String): Column =
      (when(col(num) < 0L, lit(-1L)).otherwise(lit(1L)) *
        expr(s"(20000 * abs($num) + $den) div (2 * $den)")) / 10000.0
    df
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("pfx", sum(col("cents")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("cents")).over(wAll))
      .withColumn("d", col("n") * col("pfx") - col("k") * col("tot"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(key)).orderBy(abs(col("d")).desc, col("k"))))
      .filter(col("rk") === 1)
      .withColumn("cu_n", abs(col("d")))
      .withColumn("cu_d", col("n") * lit(100L) * col("n"))
      .withColumn("mb_d", col("k") * lit(100L))
      .withColumn("ma_n", col("tot") - col("pfx"))
      .withColumn("ma_d", (col("n") - col("k")) * lit(100L))
      .select(col(key), col("n").as("n_events"),
        col("k").as("cp_idx"), col("__oid").as("cp_event_id"),
        r4s("cu_n", "cu_d").as("cusum_c4"),
        r4s("pfx", "mb_d").as("mean_before_c4"),
        when(col("n") > col("k"), r4s("ma_n", "ma_d"))
          .otherwise(lit(null).cast("double")).as("mean_after_c4"))
      .orderBy(key)
  }

  def q194CusumChangepoint(s: SparkSession, dir: String): DataFrame =
    cusumReport(
      events(s, dir).select(col("event_type"), col("ts"),
        col("event_id").as("__oid"),
        round(col("value") * 100).cast("long").as("cents")),
      "event_type", Seq(col("ts"), col("__oid")))

  val q194Sql: String = {
    def r4s(num: String, den: String): String =
      s"CASE WHEN $num < 0 THEN -1 ELSE 1 END" +
        s" * ((20000*abs($num) + $den) // (2*($den))) / 10000.0"
    s"""WITH c AS (
       |  SELECT event_type, ts, event_id,
       |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
       |  FROM events
       |), t AS (
       |  SELECT event_type, event_id,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
       |    SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS pfx,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n,
       |    SUM(cents) OVER (PARTITION BY event_type) AS tot
       |  FROM c
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
       |), d AS (
       |  SELECT event_type, event_id, k, pfx, n, tot,
       |    n * pfx - k * tot AS d,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY abs(n * pfx - k * tot) DESC, k) AS rk
       |  FROM t
       |)
       |SELECT event_type, CAST(n AS BIGINT) AS n_events, k AS cp_idx,
       |  event_id AS cp_event_id,
       |  ${r4s("abs(d)", "n * 100 * n")} AS cusum_c4,
       |  ${r4s("pfx", "k * 100")} AS mean_before_c4,
       |  CASE WHEN n > k THEN ${r4s("(tot - pfx)", "(n - k) * 100")}
       |    ELSE NULL END AS mean_after_c4
       |FROM d WHERE rk = 1 ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------
  // q207: BURSTINESS (Fano factor) per event type — the COUNTING
  // view of temporal irregularity, complementing q190's inter-
  // arrival view: a Poisson-ish steady stream has Var(counts)/
  // Mean(counts) ≈ 1 over fixed windows; bursty traffic (crawl
  // storms, incident retries, batch backfills) pushes the ratio far
  // above 1, and over-regular (rate-limited) traffic below. The
  // audit that tells a capacity planner whether q190's p99 comes
  // from heavy tails or from synchronized bursts. Counts are taken
  // over a ZERO-FILLED hourly spine (q101's engine-side sequence()
  // — silent empty hours are exactly what burstiness must see; a
  // dense-bucket-only variance understates it). Statistics are
  // exact int64 sufficient sums (n, Σc, Σc²): n²·Var = n·Σc² −
  // (Σc)², so fano_c4 = (n·Σc² − (Σc)²) / (n·Σc) and mean_c4 =
  // Σc/n round half-up at 4 dp via the full-range div (counts are
  // nonneg — no sign handling needed). Int64 envelope: n·Σc² ≤
  // n²·max_c² — safe while hours·max-hourly-count < ~3e9.
  //
  // Scale shape: one (type, hour) partial-aggregated count, one
  // broadcast spine join (spine is |types|·|hours| — key-bounded),
  // one per-type reduce. Output is type-cardinality.
  // ---------------------------------------------------------------
  def q207Burstiness(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val obs = ev.groupBy(col("event_type"),
        date_trunc("HOUR", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val bounds = ev.agg(
      date_trunc("HOUR", min(col("ts"))).as("lo"),
      date_trunc("HOUR", max(col("ts"))).as("hi"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    spine.join(obs, Seq("event_type", "h"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .withColumn("vn2", col("n_hours") * col("s2") - col("s1") * col("s1"))
      .withColumn("md", lit(2L) * col("n_hours"))
      .withColumn("fd", lit(2L) * col("n_hours") * col("s1"))
      .select(col("event_type"), col("n_hours"),
        col("s1").as("n_events"),
        (expr("(20000 * s1 + n_hours) div md") / 10000.0).as("mean_c4"),
        (expr("(20000 * vn2 + n_hours * s1) div fd") / 10000.0).as("fano_c4"))
      .orderBy("event_type")
  }

  val q207Sql: String =
    """WITH obs AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      |  FROM events GROUP BY event_type, date_trunc('hour', ts)
      |), b AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS lo,
      |         date_trunc('hour', MAX(ts)) AS hi
      |  FROM events
      |), spine AS (
      |  SELECT t.event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT DISTINCT event_type FROM events) t, b
      |), agg AS (
      |  SELECT s.event_type, COUNT(*) AS n_hours,
      |    CAST(SUM(COALESCE(o.c, 0)) AS BIGINT) AS s1,
      |    CAST(SUM(COALESCE(o.c, 0) * COALESCE(o.c, 0)) AS BIGINT) AS s2
      |  FROM spine s LEFT JOIN obs o
      |    ON o.event_type = s.event_type AND o.h = s.h
      |  GROUP BY s.event_type
      |)
      |SELECT event_type, n_hours, s1 AS n_events,
      |  ((20000 * s1 + n_hours) // (2 * n_hours)) / 10000.0 AS mean_c4,
      |  ((20000 * (n_hours * s2 - s1 * s1) + n_hours * s1)
      |    // (2 * n_hours * s1)) / 10000.0 AS fano_c4
      |FROM agg ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q210: SEASONAL-NAIVE forecast error (MASE, Hyndman & Koehler
  // 2006) — the question the descriptive temporal family (q134
  // seasonal baseline, q183 Holt trend, q207 burstiness) never
  // answers: is the DAILY CYCLE actually predictive? Per event
  // type, over the q207 zero-filled hourly spine, the seasonal-naive
  // forecast x̂ₜ = xₜ₋₂₄ is scored against the naive forecast
  // x̂ₜ = xₜ₋₁: MASE = MAE_seasonal / MAE_naive < 1 means the cycle
  // beats persistence (schedule ingestion by it); ≥ 1 means the
  // "seasonality" is noise. Both MAEs are exact integer sums of
  // absolute count differences; the ratio is the cross-multiplied
  // half-up ratio4 (NULL when the naive MAE is zero — a constant
  // series has nothing to beat).
  //
  // Scale shape: one (type, hour) partial-agg pass, a broadcast
  // spine explode, one window pass for both lags (same sort), and a
  // type-sized aggregate. Int64 envelope: 20000·sae·n < 2⁶³ holds
  // to ~4e14 event-hours.
  // ---------------------------------------------------------------
  def q210ForecastMase(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val obs = ev.groupBy(col("event_type"),
        date_trunc("HOUR", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val bounds = ev.agg(
      date_trunc("HOUR", min(col("ts"))).as("lo"),
      date_trunc("HOUR", max(col("ts"))).as("hi"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    spine.join(obs, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("p1", lag(col("c"), 1).over(w))
      .withColumn("p24", lag(col("c"), 24).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        coalesce(sum(abs(col("c") - col("p1"))), lit(0L)).as("sae_naive"),
        count(col("p1")).as("n_naive"),
        coalesce(sum(abs(col("c") - col("p24"))), lit(0L)).as("sae_seasonal"),
        count(col("p24")).as("n_seasonal"))
      .select(col("event_type"), col("n_hours"), col("sae_naive"),
        col("n_naive"), col("sae_seasonal"), col("n_seasonal"),
        when(col("sae_naive") === 0L || col("n_seasonal") === 0L,
          lit(null).cast("double"))
          .otherwise(expr(
            """(20000 * sae_seasonal * n_naive + sae_naive * n_seasonal)
               div (2 * sae_naive * n_seasonal)""") / 10000.0)
          .as("mase_4"))
      .orderBy("event_type")
  }

  val q210Sql: String =
    """WITH obs AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      |  FROM events GROUP BY event_type, date_trunc('hour', ts)
      |), b AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS lo,
      |         date_trunc('hour', MAX(ts)) AS hi
      |  FROM events
      |), spine AS (
      |  SELECT t.event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT DISTINCT event_type FROM events) t, b
      |), filled AS (
      |  SELECT s.event_type, s.h, CAST(COALESCE(o.c, 0) AS BIGINT) AS c
      |  FROM spine s LEFT JOIN obs o
      |    ON o.event_type = s.event_type AND o.h = s.h
      |), lagged AS (
      |  SELECT event_type, c,
      |    lag(c, 1) OVER (PARTITION BY event_type ORDER BY h) AS p1,
      |    lag(c, 24) OVER (PARTITION BY event_type ORDER BY h) AS p24
      |  FROM filled
      |), agg AS (
      |  SELECT event_type, COUNT(*) AS n_hours,
      |    CAST(COALESCE(SUM(abs(c - p1)), 0) AS BIGINT) AS sae_naive,
      |    COUNT(p1) AS n_naive,
      |    CAST(COALESCE(SUM(abs(c - p24)), 0) AS BIGINT) AS sae_seasonal,
      |    COUNT(p24) AS n_seasonal
      |  FROM lagged GROUP BY event_type
      |)
      |SELECT event_type, n_hours, sae_naive, n_naive, sae_seasonal,
      |  n_seasonal,
      |  CASE WHEN sae_naive = 0 OR n_seasonal = 0 THEN NULL ELSE
      |    ((20000 * sae_seasonal * n_naive + sae_naive * n_seasonal)
      |      // (2 * sae_naive * n_seasonal)) / 10000.0
      |  END AS mase_4
      |FROM agg ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q215: STATIONARY DISTRIBUTION of the q86 Markov chain — the
  // question the transition matrix itself doesn't answer: where does
  // the session process SPEND its time in the long run? (The
  // capacity-planning / sampling-prior number: a stationary mass of
  // 0.4 on `click` means 40% of steady-state traffic, whatever the
  // start state.) Eight power iterations π' = ⌊πP ÷ 10⁶⌋ in pure
  // int64 over the e6 row-stochastic matrix (truncating div in both
  // engines; a row with no outgoing transitions self-loops — the
  // standard stochasticity patch), started from the uniform
  // ⌊10⁶/k⌋. The last two iterates ship side by side with their
  // delta, so convergence is visible in the output, not asserted.
  //
  // Scale shape: the heavy part — pair counting — is q86's one
  // window pass + partial agg; the matrix is event-type²-sized
  // (k² ≤ dozens), collected and iterated on the driver, the q163
  // driver-held-model discipline. Oracle: the same eight iterations
  // unrolled as dense k×k CTEs.
  // ---------------------------------------------------------------
  private val StatIters = 8

  /** The driver-side half of q215 (ops.stationaryDistribution and
    * ApiSpec's hand chains call it): exact-int64 power iteration
    * over the e6 row-stochastic matrix built from (prev, cur, n)
    * transition counts. Returns (state, pi_e6, pi_prev_e6,
    * delta_e6) in state order.
    */
  private[graft] def stationaryCore(counts: Seq[(String, String, Long)],
      iters: Int = StatIters): Seq[(String, Long, Long, Long)] = {
    val states = (counts.map(_._1) ++ counts.map(_._2)).distinct.sorted
    val k = states.length
    val idx = states.zipWithIndex.toMap
    val c = Array.ofDim[Long](k, k)
    counts.foreach { case (a, b, n) => c(idx(a))(idx(b)) = n }
    val rowSum = c.map(_.sum)
    val p = Array.tabulate(k, k) { (i, j) =>
      if (rowSum(i) == 0L) { if (i == j) 1000000L else 0L }
      else 1000000L * c(i)(j) / rowSum(i)
    }
    var pi = Array.fill(k)(1000000L / k)
    var prev = pi
    for (_ <- 1 to iters) {
      prev = pi
      pi = Array.tabulate(k)(j =>
        (0 until k).map(i => prev(i) * p(i)(j)).sum / 1000000L)
    }
    states.indices.map(i =>
      (states(i), pi(i), prev(i), math.abs(pi(i) - prev(i))))
  }

  def q215StationaryDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events(s, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("n"))
      .collect() // k^2 rows, k = |event types| — driver-scale always
      .toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    stationaryCore(counts)
      .toDF("event_type", "pi_e6", "pi_prev_e6", "delta_e6")
      .orderBy("event_type")
  }

  val q215Sql: String = {
    def iter(t: Int): String = {
      val prev = if (t == 1) "pi0" else s"pi${t - 1}"
      s"""pi$t AS MATERIALIZED (
         |  SELECT p.j AS st, CAST(SUM(q.v * p.p) // 1000000 AS BIGINT) AS v
         |  FROM p JOIN $prev q ON q.st = p.i GROUP BY p.j
         |)""".stripMargin
    }
    s"""WITH pairs AS (
       |  SELECT LAG(event_type) OVER (PARTITION BY user_id
       |           ORDER BY ts, event_id) AS prev,
       |         event_type AS cur
       |  FROM events
       |), counts AS (
       |  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n FROM pairs
       |  WHERE prev IS NOT NULL GROUP BY prev, cur
       |), states AS MATERIALIZED (
       |  SELECT DISTINCT et AS st FROM (
       |    SELECT prev AS et FROM counts UNION ALL SELECT cur FROM counts
       |  )
       |), rs AS (
       |  SELECT prev, CAST(SUM(n) AS BIGINT) AS rn FROM counts GROUP BY prev
       |), p AS MATERIALIZED (
       |  SELECT a.st AS i, b.st AS j,
       |    CASE WHEN COALESCE(rs.rn, 0) = 0 THEN
       |      CASE WHEN a.st = b.st THEN 1000000 ELSE 0 END
       |    ELSE (1000000 * COALESCE(c.n, 0)) // rs.rn END AS p
       |  FROM states a CROSS JOIN states b
       |  LEFT JOIN counts c ON c.prev = a.st AND c.cur = b.st
       |  LEFT JOIN rs ON rs.prev = a.st
       |), pi0 AS (
       |  SELECT st, 1000000 // (SELECT COUNT(*) FROM states) AS v FROM states
       |),
       |${(1 to StatIters).map(iter).mkString(",\n")}
       |SELECT s.st AS event_type, a.v AS pi_e6, b.v AS pi_prev_e6,
       |  abs(a.v - b.v) AS delta_e6
       |FROM states s
       |JOIN pi$StatIters a ON a.st = s.st
       |JOIN pi${StatIters - 1} b ON b.st = s.st
       |ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_stationary_dist" -> q215StationaryDist _,
    "q210_forecast_mase" -> q210ForecastMase _,
    "q207_burstiness" -> q207Burstiness _,
    "q194_cusum_changepoint" -> q194CusumChangepoint _,
    "q183_holt_trend" -> q183HoltTrend _,
    "q153_ewma_decay" -> q153EwmaDecay _,
    "q139_timed_funnel" -> q139TimedFunnel _,
    "q134_seasonal_baseline" -> q134SeasonalBaseline _,
    "q128_bitemporal_asof" -> q128BitemporalAsof _,
    "q125_rolling_active" -> q125RollingActive _,
    "q126_cohort_matrix" -> q126CohortMatrix _,
    "q105_sketch_rollup" -> q105SketchRollup _,
    "q101_gap_fill" -> q101GapFill _,
    "q82_scd2_join" -> q82Scd2Join _,
    "q84_funnel" -> q84Funnel _,
    "q86_markov_transitions" -> q86MarkovTransitions _,
    "q89_windowed_dedup" -> q89WindowedDedup _)

  val oracles: Map[String, String] = Map(
    "q215_stationary_dist" -> q215Sql,
    "q210_forecast_mase" -> q210Sql,
    "q207_burstiness" -> q207Sql,
    "q194_cusum_changepoint" -> q194Sql,
    "q183_holt_trend" -> q183Sql,
    "q153_ewma_decay" -> q153Sql,
    "q139_timed_funnel" -> q139Sql,
    "q134_seasonal_baseline" -> q134Sql,
    "q128_bitemporal_asof" -> q128Sql,
    "q125_rolling_active" -> q125Sql,
    "q126_cohort_matrix" -> q126Sql,
    "q105_sketch_rollup" -> q105Sql,
    "q101_gap_fill" -> q101Sql,
    "q82_scd2_join" -> q82Sql,
    "q84_funnel" -> q84Sql,
    "q86_markov_transitions" -> q86Sql,
    "q89_windowed_dedup" -> q89Sql)
}
