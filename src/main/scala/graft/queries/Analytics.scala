package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import Hashing._

/** Corpus / event analytics: containment dedup, grouped regression,
  * user retention, cross-source duplication accounting, distribution
  * drift, and native per-group exemplar sampling.
  *
  * Scale notes: the one self-join (q91) rides the same prefix-filter
  * blocking as q25 (candidates must share their min shingle — never
  * all-pairs); everything else is window passes and partially-
  * aggregated scans with broadcast summary sides. Derived statistics
  * are exact int64 (`Relational.ratio4` / `ldiv`) end to end.
  */
object Analytics {

  // ---------------------------------------------------------------
  // q91: Jaccard CONTAINMENT near-dup pairs — |A∩B| / min(|A|,|B|),
  // the statistic that catches doc-contains-doc (supersets score low
  // on plain Jaccard but ~1.0 on containment; the asymmetric-dup case
  // every corpus dedup misses with symmetric measures). Same
  // min-shingle prefix blocking as q25; the >= 0.5 gate is evaluated
  // as pure int64 (2*inter >= min) so both engines branch
  // identically on the boundary.
  // ---------------------------------------------------------------
  def q91Containment(s: SparkSession, dir: String): DataFrame = {
    // cached + eagerly materialized: both self-join sides read it
    // (same pattern and rationale as q25/q46)
    val d = documents(s, dir).select(col("doc_id"),
        shingles(col("text"), 3).as("sh"))
      .withColumn("mk", minhash(col("sh"), 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    touch(d)
    val a = d.alias("a")
    val b = d.alias("b")
    a.join(b, col("a.mk") === col("b.mk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        graft.functions.setcard.intersectSize(col("a.sh"), col("b.sh"))
          .cast("long").as("inter"),
        least(size(col("a.sh")), size(col("b.sh"))).cast("long").as("n_small"))
      .filter(lit(2L) * col("inter") >= col("n_small"))
      .withColumn("containment", Relational.ratio4(col("inter"), col("n_small")))
      .orderBy("i", "j")
  }

  val q91Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, sh, ${sqlMinhash("sh", 0)} AS mk
       |  FROM (SELECT doc_id, ${sqlShingles(3)} AS sh FROM documents)
       |), p AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |    CAST(LEAST(len(a.sh), len(b.sh)) AS BIGINT) AS n_small
       |  FROM d a JOIN d b ON a.mk = b.mk AND a.doc_id < b.doc_id
       |)
       |SELECT i, j, inter, n_small,
       |  ((20000*inter + n_small) // (2*n_small)) / 10000.0 AS containment
       |FROM p WHERE 2*inter >= n_small ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------
  // q92: grouped LINEAR REGRESSION — per-language least-squares fit
  // of n_chars against token count, from one partially-aggregated
  // pass collecting the five classic sums (n, Σx, Σy, Σxy, Σx²); the
  // slope is the closed form scaled to 4 decimals in exact int64.
  // The slope numerator/denominator are provably positive here
  // (chars grow with tokens; variance > 0), so floor division is
  // identical across engines. This is the drift/QA regression every
  // profiling suite ships — and the shape generalizes to any
  // per-group GLM-by-sufficient-statistics.
  // ---------------------------------------------------------------
  def q92GroupedRegression(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("lang"),
      size(words(col("text"))).cast("long").as("x"), col("n_chars").as("y"))
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope",
        Relational.ratio4(col("n") * col("sxy") - col("sx") * col("sy"),
          col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("mean_x", Relational.ratio4(col("sx"), col("n")))
      .withColumn("mean_y", Relational.ratio4(col("sy"), col("n")))
      .select(col("lang"), col("n"), col("slope"), col("mean_x"), col("mean_y"))
      .orderBy("lang")
  }

  val q92Sql: String =
    """WITH d AS (
      |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
      |    n_chars AS y
      |  FROM documents
      |), g AS (
      |  SELECT lang, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
      |    CAST(SUM(x*x) AS BIGINT) AS sxx
      |  FROM d GROUP BY lang
      |)
      |SELECT lang, n,
      |  ((20000*(n*sxy - sx*sy) + (n*sxx - sx*sx))
      |    // (2*(n*sxx - sx*sx))) / 10000.0 AS slope,
      |  ((20000*sx + n) // (2*n)) / 10000.0 AS mean_x,
      |  ((20000*sy + n) // (2*n)) / 10000.0 AS mean_y
      |FROM g ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q93: next-day RETENTION — per activity day: distinct active
  // users (DAU) and how many return the following day. One distinct
  // pass to (user, day), one window lead per user, one day-keyed
  // aggregate — no self-join on the event stream (the textbook
  // retention query joins activity to itself on d+1; the lead form
  // halves the shuffles and at 100 TB the (user, day) frame is
  // already orders of magnitude smaller than raw events).
  // ---------------------------------------------------------------
  def q93Retention(s: SparkSession, dir: String): DataFrame = {
    val act = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    act.withColumn("next_day", lead(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(datediff(col("next_day"), col("day")) === 1, 1L)
          .otherwise(0L)).as("retained"))
      .withColumn("retention", Relational.ratio4(col("retained"), col("dau")))
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .orderBy("day")
  }

  val q93Sql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), l AS (
      |  SELECT day,
      |    LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      |  FROM act
      |), g AS (
      |  SELECT day, COUNT(*) AS dau,
      |    CAST(SUM(CASE WHEN date_diff('day', day, next_day) = 1
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS retained
      |  FROM l GROUP BY day
      |)
      |SELECT strftime(day, '%Y-%m-%d') AS day, dau, retained,
      |  ((20000*retained + dau) // (2*dau)) / 10000.0 AS retention
      |FROM g ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // q94: cross-source DUPLICATION matrix — for each source pair, how
  // many 120-char-prefix fingerprints they share: the provenance
  // statistic behind source-level dedup priority and crawl-overlap
  // detection. Distinct (fingerprint, source) first — the projected
  // frame is tiny relative to the corpus — then a fingerprint-keyed
  // self-join counts pairs; exact-match blocking, never all-pairs.
  // ---------------------------------------------------------------
  def q94SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val f = documents(s, dir)
      .select(md5(substring(col("text"), 1, 120)).as("fp"), col("source"))
      .distinct()
    val a = f.alias("a")
    val b = f.alias("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("src_a", "src_b")
  }

  val q94Sql: String =
    """WITH f AS (
      |  SELECT DISTINCT md5(substr(text, 1, 120)) AS fp, source
      |  FROM documents
      |)
      |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
      |GROUP BY a.source, b.source ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------
  // q95: distribution DRIFT detection — per event type, compare the
  // value histogram before/after the cutoff via L1 distance of
  // per-10000 bucket shares. One conditional-aggregate pass builds
  // both halves' histograms simultaneously (no join, no second
  // scan); shares are exact int64 floor divisions, |Δ| of int64 is
  // portable. The monitoring primitive for "did this feed change
  // under me" — at 100 TB the per-(type, bucket) frame aggregates
  // down to |types| × 10 rows before the final pass.
  // ---------------------------------------------------------------
  private val Cutoff = "2024-01-16 00:00:00"

  def q95DriftL1(s: SparkSession, dir: String): DataFrame = {
    val ld = Relational.ldiv _
    val cut = lit(Cutoff).cast("timestamp")
    val bucketed = events(s, dir)
      .withColumn("bucket",
        least(lit(9L), floor(col("value") / 50.0).cast("long")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("c1"),
        sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("c2"))
    val totals = Window.partitionBy(col("event_type"))
    bucketed
      .withColumn("s1", ld(lit(10000L) * col("c1"), sum(col("c1")).over(totals)))
      .withColumn("s2", ld(lit(10000L) * col("c2"), sum(col("c2")).over(totals)))
      .groupBy(col("event_type"))
      .agg(sum(col("c1")).as("n_before"), sum(col("c2")).as("n_after"),
        sum(abs(col("s1") - col("s2"))).as("l1_x10000"))
      .orderBy("event_type")
  }

  val q95Sql: String =
    s"""WITH b AS (
       |  SELECT event_type,
       |    LEAST(9, CAST(FLOOR(value / 50.0) AS BIGINT)) AS bucket,
       |    CAST(SUM(CASE WHEN ts < TIMESTAMP '$Cutoff' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c1,
       |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '$Cutoff' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c2
       |  FROM events GROUP BY event_type, bucket
       |), sh AS (
       |  SELECT event_type, c1, c2,
       |    (10000*c1) // SUM(c1) OVER (PARTITION BY event_type) AS s1,
       |    (10000*c2) // SUM(c2) OVER (PARTITION BY event_type) AS s2
       |  FROM b
       |)
       |SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n_before,
       |  CAST(SUM(c2) AS BIGINT) AS n_after,
       |  CAST(SUM(ABS(s1 - s2)) AS BIGINT) AS l1_x10000
       |FROM sh GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q96: per-group EXEMPLAR sampling through the NATIVE TopKPerGroup
  // operator — k deterministic pseudo-random representatives per
  // language, ordered by a salted md5 of the doc id (a hash is a
  // uniform rank, so k smallest hashes = uniform k-sample, stable
  // across runs and engines). Exercises the custom heap operator on
  // a string-ordered, non-metric rank; the shuffle carries at most
  // k rows per (partition, group) — the scalable form of per-group
  // reservoir sampling.
  // ---------------------------------------------------------------
  def q96HashExemplars(s: SparkSession, dir: String): DataFrame = {
    val keyed = documents(s, dir).select(col("lang"), col("doc_id"),
      col("n_chars"),
      md5(concat(lit("ex:"), col("doc_id").cast("string"))).as("hk"))
    graft.plans.ops.topKPerGroup(keyed,
        groupCols = Seq(col("lang")),
        orderCols = Seq(col("hk"), col("doc_id")),
        k = 3)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("hk"))
      .orderBy("lang", "hk", "doc_id")
  }

  val q96Sql: String =
    """SELECT lang, doc_id, n_chars, hk FROM (
      |  SELECT lang, doc_id, n_chars,
      |    md5('ex:' || CAST(doc_id AS VARCHAR)) AS hk,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5('ex:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 3 ORDER BY lang, hk, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q98: partition-SKEW profiler — the operational pre-flight for any
  // key choice: hash user_id into 32 buckets (md5-derived so both
  // engines agree; a real deployment would use the engine's own
  // partitioner hash) and report each bucket's row share and a
  // hot-bucket flag (share > 2x fair). This is the diagnostic that
  // decides between plain repartition, salting (q39), and AQE skew
  // splitting (SkewJoinSpec) before a 100-TB shuffle is launched.
  // ---------------------------------------------------------------
  def q98SkewProfile(s: SparkSession, dir: String): DataFrame = {
    val ld = Relational.ldiv _
    val bucket = pmod(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(32L))
    val counts = events(s, dir).select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    counts
      .withColumn("share_x10000",
        ld(lit(10000L) * col("n"), sum(col("n")).over(total)))
      .withColumn("hot",
        (lit(16L) * col("n") > sum(col("n")).over(total)).cast("long"))
      .orderBy("bucket")
  }

  val q98Sql: String =
    """WITH c AS (
      |  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
      |    AS BIGINT) % 32 AS bucket, COUNT(*) AS n
      |  FROM events GROUP BY 1
      |)
      |SELECT bucket, n,
      |  CAST((10000*n) // SUM(n) OVER () AS BIGINT) AS share_x10000,
      |  CAST(16*n > SUM(n) OVER () AS BIGINT) AS hot
      |FROM c ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  // q99: QUANTILE-QUANTILE distribution matching — align the 'en'
  // and 'de' length distributions by comparing their exact ventile
  // (1/20-quantile) boundaries: the calibration map a curation
  // pipeline uses to resample one population to match another's
  // shape (and the q-q plot behind drift review). One window pass
  // per partition assigns ventiles; the 20-row boundary tables join
  // trivially.
  // ---------------------------------------------------------------
  def q99QuantileMatch(s: SparkSession, dir: String): DataFrame = {
    val r = documents(s, dir)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("v", ntile(20).over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))))
    val g = r.groupBy(col("lang"), col("v")).agg(max(col("n_chars")).as("hi"))
    val en = g.filter(col("lang") === "en").select(col("v"), col("hi").as("en_hi"))
    val de = g.filter(col("lang") === "de").select(col("v").as("dv"), col("hi").as("de_hi"))
    en.join(de, col("v") === col("dv"))
      .select(col("v"), col("en_hi"), col("de_hi"),
        (col("en_hi") - col("de_hi")).as("delta"))
      .orderBy("v")
  }

  val q99Sql: String =
    """WITH r AS (
      |  SELECT lang, n_chars,
      |    ntile(20) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS v
      |  FROM documents WHERE lang IN ('en', 'de')
      |), g AS (
      |  SELECT lang, v, MAX(n_chars) AS hi FROM r GROUP BY lang, v
      |)
      |SELECT a.v AS v, a.hi AS en_hi, b.hi AS de_hi, a.hi - b.hi AS delta
      |FROM g a JOIN g b ON a.v = b.v AND a.lang = 'en' AND b.lang = 'de'
      |ORDER BY v""".stripMargin

  // ---------------------------------------------------------------
  // q100: corpus SNAPSHOT DIFF — the dataset-versioning primitive:
  // given two corpus versions, report per source how many docs were
  // added, removed, changed (same id, different content hash), or
  // untouched. The two "versions" are derived deterministically from
  // the one documents table (v1 drops doc_id%10==0, v2 drops %10==1
  // and rewrites text where doc_id%7==0), so both engines build
  // identical inputs. One FULL OUTER join on doc_id of two pruned
  // scans; at 100 TB both sides would be bucketed by doc_id so only
  // metadata-sized fingerprint columns shuffle.
  // ---------------------------------------------------------------
  def q100SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val v1 = d.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("source").as("src1"),
        md5(col("text")).as("h1"))
    val v2 = d.filter(col("doc_id") % 10 =!= 1)
      .select(col("doc_id"), col("source").as("src2"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .groupBy(coalesce(col("src1"), col("src2")).as("source"))
      .agg(
        sum(when(col("h1").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("h1").isNotNull && col("h2").isNotNull &&
          col("h1") =!= col("h2"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("h1") === col("h2"), 1L).otherwise(0L)).as("n_same"))
      .orderBy("source")
  }

  val q100Sql: String =
    """WITH v1 AS (
      |  SELECT doc_id, source AS src1, md5(text) AS h1
      |  FROM documents WHERE doc_id % 10 <> 0
      |), v2 AS (
      |  SELECT doc_id, source AS src2,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h2
      |  FROM documents WHERE doc_id % 10 <> 1
      |)
      |SELECT COALESCE(src1, src2) AS source,
      |  CAST(SUM(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(SUM(CASE WHEN h2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(SUM(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL AND h1 <> h2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN h1 = h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_same
      |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      |GROUP BY COALESCE(src1, src2) ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // q106: RECORD LINKAGE scoring — the Fellegi-Sunter shape: block
  // candidate pairs on hard keys (nation, segment) PLUS a sorted-
  // neighborhood secondary block (q83's shape): within each hard
  // block, records are sorted by (name, custkey) and each record is
  // compared only with its next W=5 neighbors. Each pair is scored by
  // integer-weighted field agreements (name edit distance within 3
  // via the banded early-exit kernel: +10; account balance within
  // $500, exact integer cents: +5) and classified match / possible /
  // non-match by score threshold. The entity-resolution operator that
  // generalizes exact dedup to noisy identifiers. Pair count is
  // bounded by W·N however large the data grows — the previous bare
  // (nation, segment) scheme had <= 125 fixed blocks, so within-block
  // pairs grew O(n²/125); sort-similar names land adjacent, which is
  // exactly where the edit-distance agreements live. Every agreement
  // test is exact int64.
  // ---------------------------------------------------------------
  private val LinkW = 5 // sorted-neighborhood window width

  def q106RecordLinkage(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("c_acctbal") * 100).cast("long")
    val c = customer(s, dir).select(col("c_custkey").as("ck"),
      col("c_name").as("nm"), col("c_nationkey").as("nk"),
      col("c_mktsegment").as("seg"), cents.as("bal"))
    val w = Window.partitionBy(col("nk"), col("seg"))
      .orderBy(col("nm"), col("ck"))
    val scored = c
      .withColumn("nbrs", array((1 to LinkW).map(k =>
        struct(lead(col("ck"), k).over(w).as("ck2"),
          lead(col("nm"), k).over(w).as("nm2"),
          lead(col("bal"), k).over(w).as("bal2"))): _*))
      .select(col("nk"), col("nm"), col("bal"), explode(col("nbrs")).as("nb"))
      .filter(col("nb.ck2").isNotNull)
      .withColumn("w",
        when(levenshtein(col("nm"), col("nb.nm2"), 3) =!= -1, 10L)
          .otherwise(0L) +
        when(abs(col("bal") - col("nb.bal2")) <= 50000L, 5L).otherwise(0L))
      .withColumn("cls",
        when(col("w") >= 15L, "match")
          .when(col("w") >= 10L, "possible").otherwise("non_match"))
    scored.groupBy(col("nk").as("nationkey"), col("cls"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("w_sum"))
      .orderBy("nationkey", "cls")
  }

  val q106Sql: String = {
    val leads = (1 to LinkW).map(k =>
      s"LEAD(ck, $k) OVER w AS ck$k, LEAD(nm, $k) OVER w AS nm$k, " +
        s"LEAD(bal, $k) OVER w AS bal$k").mkString(",\n    ")
    val arms = (1 to LinkW).map(k =>
      s"SELECT nk, nm AS a, nm$k AS b, bal AS x, bal$k AS y FROM l " +
        s"WHERE ck$k IS NOT NULL").mkString("\n  UNION ALL ")
    s"""WITH c AS (
       |  SELECT c_custkey AS ck, c_name AS nm, c_nationkey AS nk,
       |    c_mktsegment AS seg,
       |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
       |  FROM customer
       |), l AS (
       |  SELECT nk, ck, nm, bal,
       |    $leads
       |  FROM c WINDOW w AS (PARTITION BY nk, seg ORDER BY nm, ck)
       |), p0 AS (
       |  $arms
       |), p AS (
       |  SELECT nk,
       |    (CASE WHEN levenshtein(a, b) <= 3 THEN 10 ELSE 0 END
       |     + CASE WHEN ABS(x - y) <= 50000 THEN 5 ELSE 0 END) AS w
       |  FROM p0
       |)
       |SELECT nk AS nationkey,
       |  CASE WHEN w >= 15 THEN 'match' WHEN w >= 10 THEN 'possible'
       |       ELSE 'non_match' END AS cls,
       |  COUNT(*) AS n_pairs, CAST(SUM(w) AS BIGINT) AS w_sum
       |FROM p GROUP BY 1, 2 ORDER BY nationkey, cls""".stripMargin
  }

  // ---------------------------------------------------------------
  // q112: trailing-window z-score anomaly detection — the streaming-
  // monitor shape evaluated in batch: each event's value is scored
  // against the mean/stddev of the 20 events BEFORE it (per event
  // type, event-time order), flagging |z| > 3. The whole thing is one
  // window pass (no self-join, no collect), and the z test is
  // evaluated without ever forming a float mean or stddev:
  //   z^2 > 9  <=>  (n*x - Σx)^2 > 9 * (n*Σx^2 - (Σx)^2)
  // over integer cents (floor(value*100) — floor of an IEEE multiply
  // is bit-identical in both engines, where round() half-up vs
  // half-even is not). Magnitudes: x < 6e4 cents, so every term stays
  // far inside int64. At 100 TB the window partitions by event_type
  // (or a finer key); the frame is O(20) state per row — the same
  // bounded state the streaming twin keeps per key.
  // ---------------------------------------------------------------
  def q112ZscoreAnomaly(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val scored = events(s, dir)
      .withColumn("x", floor(col("value") * 100))
      .withColumn("n", count(col("x")).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("n") >= 10) // warm-up: score only with enough history
      .withColumn("anom",
        (pow2(col("n") * col("x") - col("sx")) >
          lit(9L) * (col("n") * col("sxx") - pow2(col("sx")))).cast("long"))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("anom")).as("n_anomalies"),
        sum(when(col("anom") === 1, col("event_id"))
          .otherwise(lit(0L))).as("anomaly_id_sum"))
      .orderBy("event_type")
  }

  private def pow2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c * c

  val q112Sql: String =
    """WITH scored AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(value*100) AS BIGINT) AS x,
      |    COUNT(*) OVER w AS n,
      |    CAST(SUM(CAST(floor(value*100) AS BIGINT)) OVER w AS BIGINT) AS sx,
      |    CAST(SUM(CAST(floor(value*100) AS BIGINT)
      |           * CAST(floor(value*100) AS BIGINT)) OVER w AS BIGINT) AS sxx
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
      |), flagged AS (
      |  SELECT event_type, event_id,
      |    CASE WHEN (n*x - sx)*(n*x - sx) > 9*(n*sxx - sx*sx)
      |         THEN 1 ELSE 0 END AS anom
      |  FROM scored WHERE n >= 10
      |)
      |SELECT event_type, COUNT(*) AS n_scored,
      |  CAST(SUM(anom) AS BIGINT) AS n_anomalies,
      |  CAST(SUM(CASE WHEN anom = 1 THEN event_id ELSE 0 END) AS BIGINT)
      |    AS anomaly_id_sum
      |FROM flagged GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q140: cross-LANGUAGE contamination — q94's overlap accounting on
  // the language axis: the same content fingerprint appearing under
  // different lang labels means copied/untranslated text leaking
  // across a multilingual corpus's language buckets (it poisons
  // per-language mixing ratios and language-ID training). Exact-match
  // blocking on the fingerprint, distinct-first so the join sides
  // stay fingerprint-sized; reports each lang pair's shared
  // fingerprints plus how much of the smaller language they cover.
  // ---------------------------------------------------------------
  def q140LangContamination(s: SparkSession, dir: String): DataFrame = {
    val f = documents(s, dir)
      .select(md5(substring(col("text"), 1, 120)).as("fp"), col("lang"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    touch(f) // eager: both self-join sides + the per-lang totals read it
    val totals = f.groupBy(col("lang")).agg(count(lit(1)).as("n_fp"))
    val a = f.alias("a")
    val b = f.alias("b")
    val ta = totals.select(col("lang").as("lang_a"), col("n_fp").as("na"))
    val tb = totals.select(col("lang").as("lang_b"), col("n_fp").as("nb"))
    a.join(b, col("a.fp") === col("b.fp") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(ta), Seq("lang_a"))
      .join(broadcast(tb), Seq("lang_b"))
      .select(col("lang_a"), col("lang_b"), col("n_shared"),
        Relational.ratio4(col("n_shared"), least(col("na"), col("nb")))
          .as("contamination"))
      .orderBy("lang_a", "lang_b")
  }

  val q140Sql: String =
    """WITH f AS (
      |  SELECT DISTINCT md5(substr(text, 1, 120)) AS fp, lang
      |  FROM documents
      |), totals AS (
      |  SELECT lang, COUNT(*) AS n_fp FROM f GROUP BY lang
      |), pairs AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_shared
      |  FROM f a JOIN f b ON a.fp = b.fp AND a.lang < b.lang
      |  GROUP BY a.lang, b.lang
      |)
      |SELECT lang_a, lang_b, n_shared,
      |  ((20000*n_shared + least(ta.n_fp, tb.n_fp))
      |    // (2*least(ta.n_fp, tb.n_fp))) / 10000.0 AS contamination
      |FROM pairs
      |JOIN totals ta ON ta.lang = lang_a
      |JOIN totals tb ON tb.lang = lang_b
      |ORDER BY lang_a, lang_b""".stripMargin

  // ---------------------------------------------------------------
  // q144: K-ANONYMITY audit — the privacy preflight a training-data
  // release runs over quasi-identifiers: group records by the QI
  // tuple (nation, market segment, $1000 balance band — integer cents
  // div, so both engines band identically) and report, per nation,
  // how many QI groups fall below k=5 and how many rows sit in those
  // re-identifiable groups. The output drives either suppression
  // (drop risky rows) or generalization (coarsen the band) before
  // release. One groupBy + one rollup — partial-aggregated, no joins;
  // the QI-group frame is bounded by the QI-space cardinality, not
  // the data.
  // ---------------------------------------------------------------
  private val AnonK = 5L

  def q144KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("c_acctbal") * 100).cast("long")
    val g = customer(s, dir)
      .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        cents.as("bal"))
      .withColumn("band", expr("bal div 100000"))
      .groupBy(col("nk"), col("seg"), col("band"))
      .agg(count(lit(1)).as("gsize"))
    g.groupBy(col("nk").as("nationkey"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("gsize")).as("n_rows"),
        min(col("gsize")).as("min_group"),
        sum(when(col("gsize") < AnonK, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("gsize") < AnonK, col("gsize")).otherwise(0L))
          .as("n_risky_rows"))
      .withColumn("risky_rate",
        Relational.ratio4(col("n_risky_rows"), col("n_rows")))
      .orderBy("nationkey")
  }

  val q144Sql: String =
    s"""WITH g AS (
       |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
       |    CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000 AS band,
       |    COUNT(*) AS gsize
       |  FROM customer GROUP BY 1, 2, 3
       |)
       |SELECT nk AS nationkey, COUNT(*) AS n_groups,
       |  CAST(SUM(gsize) AS BIGINT) AS n_rows,
       |  MIN(gsize) AS min_group,
       |  CAST(SUM(CASE WHEN gsize < $AnonK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_small_groups,
       |  CAST(SUM(CASE WHEN gsize < $AnonK THEN gsize ELSE 0 END) AS BIGINT)
       |    AS n_risky_rows,
       |  ((20000*CAST(SUM(CASE WHEN gsize < $AnonK THEN gsize ELSE 0 END)
       |        AS BIGINT) + CAST(SUM(gsize) AS BIGINT))
       |    // (2*CAST(SUM(gsize) AS BIGINT))) / 10000.0 AS risky_rate
       |FROM g GROUP BY nk ORDER BY nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_k_anonymity" -> q144KAnonymity _,
    "q140_lang_contamination" -> q140LangContamination _,
    "q112_zscore_anomaly" -> q112ZscoreAnomaly _,
    "q106_record_linkage" -> q106RecordLinkage _,
    "q100_snapshot_diff" -> q100SnapshotDiff _,
    "q98_skew_profile" -> q98SkewProfile _,
    "q99_quantile_match" -> q99QuantileMatch _,
    "q91_containment" -> q91Containment _,
    "q92_grouped_regression" -> q92GroupedRegression _,
    "q93_retention" -> q93Retention _,
    "q94_source_overlap" -> q94SourceOverlap _,
    "q95_drift_l1" -> q95DriftL1 _,
    "q96_hash_exemplars" -> q96HashExemplars _)

  val oracles: Map[String, String] = Map(
    "q144_k_anonymity" -> q144Sql,
    "q140_lang_contamination" -> q140Sql,
    "q112_zscore_anomaly" -> q112Sql,
    "q106_record_linkage" -> q106Sql,
    "q100_snapshot_diff" -> q100Sql,
    "q98_skew_profile" -> q98Sql,
    "q99_quantile_match" -> q99Sql,
    "q91_containment" -> q91Sql,
    "q92_grouped_regression" -> q92Sql,
    "q93_retention" -> q93Sql,
    "q94_source_overlap" -> q94Sql,
    "q95_drift_l1" -> q95Sql,
    "q96_hash_exemplars" -> q96Sql)
}
