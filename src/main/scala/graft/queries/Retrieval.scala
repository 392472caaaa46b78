package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import Hashing.words

/** Text-retrieval and corpus-profiling operators: the index-building
  * and ranking layer (inverted index, BM25) plus the reshape and
  * robust-statistics utilities (unpivot, winsorized means) and a
  * third dedup *blocking* strategy (sorted neighborhood) alongside
  * min-shingle blocking (q25/q46) and LSH banding (q23).
  *
  * Scale notes: index construction and scoring are explode +
  * partial-aggregate passes (the classic distributed indexing shape);
  * the query-term and per-language summary tables broadcast. Scoring
  * arithmetic is integer-scaled (no log, no float division) so the
  * DuckDB oracle matches bit-for-bit — see q88's scaling comment.
  */
object Retrieval {

  // ---------------------------------------------------------------
  // q83: SORTED-NEIGHBORHOOD dedup blocking — sort the corpus by a
  // key, compare each doc only with its next W=3 neighbors in sort
  // order. The third classic blocking family after min-shingle
  // buckets (q25) and LSH bands (q23): O(N·W) comparisons, catches
  // prefix-similar near-dups that hash blocking can spread across
  // buckets. Blocked by the 2-char prefix so the sort/lead window
  // parallelizes — block granularity is the parallelism/recall dial:
  // longer prefixes mean more, smaller blocks (more cores busy, more
  // boundary-straddling pairs missed); the standard multi-pass
  // variant rotates the key to recover boundary pairs. One pass here.
  // Scale shape: range-partition + window lead — no join at all;
  // the quadratic edit-distance work is bounded to N·W pairs.
  // ---------------------------------------------------------------
  def q83SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("blk")).orderBy(col("text"), col("doc_id"))
    val d = documents(s, dir).select(col("doc_id"), col("text"),
        substring(col("text"), 1, 2).as("blk"),
        substring(col("text"), 1, 120).as("head"))
    val withN = d
      .withColumn("nbrs", array((1 to 3).map(k =>
        struct(lead(col("doc_id"), k).over(w).as("id"),
          lead(col("head"), k).over(w).as("h"))): _*))
      .select(col("doc_id"), col("head"), explode(col("nbrs")).as("nb"))
      .filter(col("nb.id").isNotNull)
    withN
      // 3-arg levenshtein runs the banded O(k·n) algorithm with early
      // exit (returns -1 above the threshold) instead of the full
      // O(n^2) DP — the right kernel when a cutoff exists
      .withColumn("edit_dist", levenshtein(col("head"), col("nb.h"), 20))
      .filter(col("edit_dist") =!= -1)
      .select(least(col("doc_id"), col("nb.id")).as("i"),
        greatest(col("doc_id"), col("nb.id")).as("j"), col("edit_dist"))
      .orderBy("i", "j")
  }

  val q83Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, substr(text, 1, 2) AS blk,
      |    substr(text, 1, 120) AS head
      |  FROM documents
      |), l AS (
      |  SELECT doc_id, head,
      |    LEAD(doc_id, 1) OVER w AS id1, LEAD(head, 1) OVER w AS h1,
      |    LEAD(doc_id, 2) OVER w AS id2, LEAD(head, 2) OVER w AS h2,
      |    LEAD(doc_id, 3) OVER w AS id3, LEAD(head, 3) OVER w AS h3
      |  FROM d WINDOW w AS (PARTITION BY blk ORDER BY text, doc_id)
      |), p AS (
      |  SELECT doc_id AS a, id1 AS b, levenshtein(head, h1) AS edit_dist
      |    FROM l WHERE id1 IS NOT NULL
      |  UNION ALL SELECT doc_id, id2, levenshtein(head, h2)
      |    FROM l WHERE id2 IS NOT NULL
      |  UNION ALL SELECT doc_id, id3, levenshtein(head, h3)
      |    FROM l WHERE id3 IS NOT NULL
      |)
      |SELECT LEAST(a, b) AS i, GREATEST(a, b) AS j, edit_dist
      |FROM p WHERE edit_dist <= 20 ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------
  // q85: UNPIVOT (wide-to-long melt) — the inverse reshape of q54's
  // pivot, via the native Dataset.unpivot operator (one Expand node,
  // no join/union of self-scans). The wide side is a per-language
  // length-bucket count table; unpivot emits one (lang, bucket, n)
  // row per cell.
  // ---------------------------------------------------------------
  def q85Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = documents(s, dir).groupBy(col("lang")).agg(
      sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("short_n"),
      sum(when(col("n_chars") >= 200 && col("n_chars") < 400, 1L)
        .otherwise(0L)).as("mid_n"),
      sum(when(col("n_chars") >= 400, 1L).otherwise(0L)).as("long_n"))
    wide.unpivot(
        Array(col("lang")),
        Array(col("short_n"), col("mid_n"), col("long_n")),
        "bucket", "n")
      .orderBy("lang", "bucket")
  }

  val q85Sql: String =
    """WITH wide AS (
      |  SELECT lang,
      |    CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS short_n,
      |    CAST(SUM(CASE WHEN n_chars >= 200 AND n_chars < 400 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS mid_n,
      |    CAST(SUM(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS long_n
      |  FROM documents GROUP BY lang
      |)
      |SELECT lang, bucket, n FROM (
      |  SELECT lang, 'short_n' AS bucket, short_n AS n FROM wide
      |  UNION ALL SELECT lang, 'mid_n', mid_n FROM wide
      |  UNION ALL SELECT lang, 'long_n', long_n FROM wide
      |)
      |ORDER BY lang, bucket""".stripMargin

  // ---------------------------------------------------------------
  // q87: INVERTED INDEX construction — token -> (document frequency,
  // total term frequency, head of the sorted posting list). The
  // foundational retrieval structure: explode to postings, one hash
  // aggregate keyed by token for the counts, and the 5-doc posting
  // head through the NATIVE TopKPerGroup heap — a collect_set head
  // would accumulate EVERY doc id of a common token in one aggregation
  // buffer before slicing (unbounded state for stopwords at 100 TB);
  // the heap carries at most 5 ids per (partition, token) through the
  // shuffle, so posting-head state is bounded by construction.
  // ---------------------------------------------------------------
  def q87InvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val tok = documents(s, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("token"))
    val stats = tok.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf_total"))
    val heads = graft.plans.ops.topKPerGroup(
        tok.distinct(), groupCols = Seq(col("token")),
        orderCols = Seq(col("doc_id")), k = 5)
      .groupBy(col("token"))
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("postings_head")) // <= 5 rows per token
    stats.join(heads, "token")
      .orderBy(col("df").desc, col("token"))
      .limit(25)
  }

  val q87Sql: String =
    """SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf_total,
      |  array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',')
      |    AS postings_head
      |FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY df DESC, token LIMIT 25""".stripMargin

  // ---------------------------------------------------------------
  // q88: integer-scaled BM25 ranking for a fixed query — the scoring
  // layer over the q87 index. Standard BM25 with k1=1.2, b=0.75,
  // with two portability substitutions, both documented order-
  // preserving: (a) the log-idf is replaced by the monotone surrogate
  // idf_s = 10^6 * (N - df + 1) DIV (df + 1) (same ranking for any
  // fixed N), and (b) all divisions are int64 floor divisions on
  // 1000x-scaled operands, so Spark and DuckDB agree bit-for-bit
  // (float BM25 differs in the last ulp across engines). Bounds: with
  // idf_s <= 10^6 * N, tf*1000 <= 10^3 * dl, the score numerator
  // stays < 2^53 for N*dl < 9*10^6 per term — at larger corpora,
  // rescale idf_s to 10^3.
  //
  // Scale shape: the corpus is touched by exactly one explode +
  // filter + partial-aggregate pass (the 3-term query table and the
  // global (N, total_tokens) scalars broadcast); scoring then runs on
  // the |terms| x |matching docs| frame — never the full corpus.
  // ---------------------------------------------------------------
  def q88Bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ld = Relational.ldiv _
    val terms = Seq("join", "vector", "spark").toDF("term")
    val docs = documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val totals = docs.agg(count(lit(1)).as("nn"), sum(col("dl")).as("tt"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("ws")).as("token"))
      .join(broadcast(terms), col("token") === col("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfc), "term")
      .crossJoin(broadcast(totals))
      .withColumn("avgdl1000", ld(lit(1000L) * col("tt"), col("nn")))
      .withColumn("idf_s",
        ld(lit(1000000L) * (col("nn") - col("df") + 1L), col("df") + 1L))
      .withColumn("norm1000",
        lit(250L) + ld(lit(750L) * col("dl") * 1000L, col("avgdl1000")))
      .withColumn("sterm",
        ld(col("idf_s") * col("tf") * 1000L,
          col("tf") * 1000L + ld(lit(1200L) * col("norm1000"), lit(1000L))))
      .groupBy(col("doc_id"))
      .agg(sum(col("sterm")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val q88Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
      |), totals AS (
      |  SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS tt FROM docs
      |), tok AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
      |), tf AS (
      |  SELECT t.doc_id, d.dl, t.token AS term, COUNT(*) AS tf
      |  FROM tok t JOIN docs d ON d.doc_id = t.doc_id
      |  WHERE t.token IN ('join', 'vector', 'spark')
      |  GROUP BY t.doc_id, d.dl, t.token
      |), dfc AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), scored AS (
      |  SELECT tf.doc_id,
      |    ((1000000 * (tt.nn - dfc.df + 1)) // (dfc.df + 1)) * tf.tf * 1000
      |      // (tf.tf * 1000 +
      |         (1200 * (250 + (750 * tf.dl * 1000) // ((1000 * tt.tt) // tt.nn)))
      |           // 1000) AS sterm
      |  FROM tf JOIN dfc USING (term) CROSS JOIN totals tt
      |)
      |SELECT doc_id, CAST(SUM(sterm) AS BIGINT) AS score,
      |  COUNT(*) AS n_terms
      |FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q90: WINSORIZED per-language means — robust statistics for
  // corpus profiling: clip n_chars at the exact p05/p95 rank cut
  // (min value whose rank reaches 5%/95% of the group) and compare
  // the raw vs clipped means. Rank-based cuts (not value
  // interpolation) keep everything int64-exact. Two passes: one
  // window pass derives the cuts, the clipped re-aggregation joins
  // the per-language (broadcastable) cut table.
  // ---------------------------------------------------------------
  def q90Winsorize(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("lang"), col("n_chars"), col("doc_id"))
    val r = d
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val cuts = r.groupBy(col("lang")).agg(
      min(when(col("r") * 20 >= col("cnt"), col("n_chars"))).as("p05"),
      min(when(col("r") * 20 >= col("cnt") * 19, col("n_chars"))).as("p95"))
    d.join(broadcast(cuts), "lang")
      .withColumn("clipped",
        greatest(col("p05"), least(col("p95"), col("n_chars"))))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        Relational.ratio4(sum(col("n_chars")), count(lit(1))).as("mean_raw"),
        Relational.ratio4(sum(col("clipped")), count(lit(1))).as("mean_clip"))
      .orderBy("lang")
  }

  val q90Sql: String =
    """WITH r AS (
      |  SELECT lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS r,
      |    COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents
      |), c AS (
      |  SELECT lang,
      |    MIN(CASE WHEN r*20 >= cnt THEN n_chars END) AS p05,
      |    MIN(CASE WHEN r*20 >= 19*cnt THEN n_chars END) AS p95
      |  FROM r GROUP BY lang
      |), j AS (
      |  SELECT d.lang, d.n_chars, c.p05, c.p95,
      |    GREATEST(c.p05, LEAST(c.p95, d.n_chars)) AS clipped
      |  FROM documents d JOIN c USING (lang)
      |)
      |SELECT lang, COUNT(*) AS n, MAX(p05) AS p05, MAX(p95) AS p95,
      |  ((20000*CAST(SUM(n_chars) AS BIGINT) + COUNT(*))
      |    // (2*COUNT(*))) / 10000.0 AS mean_raw,
      |  ((20000*CAST(SUM(clipped) AS BIGINT) + COUNT(*))
      |    // (2*COUNT(*))) / 10000.0 AS mean_clip
      |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q121: PHRASE query over a positional index — the retrieval step
  // q87's inverted index exists for: find exact multi-word phrases
  // by joining per-term postings at aligned positions. The classic
  // trick makes it one aggregate instead of a k-way self-join: a
  // token at (doc, pos) matching phrase word idx anchors the phrase
  // at pos - idx, so a (doc, phrase, anchor) group containing all k
  // distinct idx values IS an occurrence. The phrase table is a
  // broadcast literal (query-sized); the corpus is tokenized once —
  // the same plan a search engine runs against stored positional
  // postings at 100 TB.
  // ---------------------------------------------------------------
  private val Phrases = Seq(
    "slow hash batch", "stream table hash", "window fast query")

  def q121PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val post = documents(s, dir)
      .select(col("doc_id"), posexplode(words(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("w"))
    val terms = Phrases.flatMap { p =>
      p.split(" ").zipWithIndex.map { case (w, i) => (p, i.toLong, w) }
    }.toDF("phrase", "idx", "w")
    val k = 3L // phrase length (all phrases 3 words)
    post.join(broadcast(terms), Seq("w"))
      .select(col("phrase"), col("doc_id"),
        (col("pos") - col("idx")).as("anchor"), col("idx"))
      .groupBy(col("phrase"), col("doc_id"), col("anchor"))
      .agg(countDistinct(col("idx")).as("n_idx"))
      .filter(col("n_idx") === k)
      .groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy("phrase")
  }

  val q121Sql: String = {
    val phraseRows = Phrases.flatMap { p =>
      p.split(" ").zipWithIndex.map { case (w, i) => s"('$p', $i, '$w')" }
    }.mkString(",\n    ")
    s"""WITH terms(phrase, idx, w) AS (
       |  VALUES
       |    $phraseRows
       |), post AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i+1 AS INT)] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |    unnest(range(len(ws))) t(i)
       |), anchored AS (
       |  SELECT phrase, doc_id, pos - idx AS anchor,
       |    COUNT(DISTINCT idx) AS n_idx
       |  FROM post JOIN terms USING (w)
       |  GROUP BY phrase, doc_id, pos - idx
       |)
       |SELECT phrase, COUNT(DISTINCT doc_id) AS n_docs,
       |  COUNT(*) AS n_occurrences
       |FROM anchored WHERE n_idx = 3
       |GROUP BY phrase ORDER BY phrase""".stripMargin
  }

  // ---------------------------------------------------------------
  // q149: retrieval-quality EVAL (MRR / hit@k) — the metric loop that
  // gates any retrieval change (q87's index, q88's BM25, a new
  // analyzer): every 50th doc poses its first-5-word prefix as a
  // query whose known-relevant answer is the doc itself; candidates
  // are scored by distinct shared terms (tiebreak doc_id) and the
  // source doc's rank yields reciprocal-rank / hit@1 / hit@5 — all
  // exact int64 (rr in e6 units via ldiv). Scale shape: the
  // query-term/corpus-token join is a shuffle equi-join on the term
  // (right for a large query set; a benchmark-sized set would
  // broadcast); at real scale the standard prefilter drops
  // high-df terms (IDF cut) so no stopword term fans out — noted,
  // not needed on this corpus.
  // ---------------------------------------------------------------
  def q149RetrievalMrr(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
    val qs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(slice(col("ws"), 1, 5))).as("term"))
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(col("ws"))).as("term"))
    val scored = toks.join(qs, "term")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("n_shared").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("doc_id") === col("q_id")) // the known-relevant doc
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("n_at_1"),
        sum(when(col("rnk") <= 5, 1L).otherwise(0L)).as("n_at_5"),
        sum(Relational.ldiv(lit(1000000L), col("rnk"))).as("rr_sum_e6"))
      // exact `div`, not ldiv/ratio4: the numerator 20000*rr_sum_e6
      // exceeds ldiv's 2^53 double-mantissa bound once n_queries
      // reaches ~4.5e5 (same int64 lift as q114/q134)
      .withColumn("mrr4",
        expr("(20000 * rr_sum_e6 + n_queries * 1000000) div (2 * n_queries * 1000000)")
          / 10000.0)
  }

  val q149Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), qs AS (
      |  SELECT doc_id AS q_id, UNNEST(list_distinct(ws[1:5])) AS term
      |  FROM docs WHERE doc_id % 50 = 0
      |), toks AS (
      |  SELECT doc_id, UNNEST(list_distinct(ws)) AS term FROM docs
      |), scored AS (
      |  SELECT q.q_id, t.doc_id, COUNT(*) AS n_shared
      |  FROM toks t JOIN qs q USING (term)
      |  GROUP BY q.q_id, t.doc_id
      |), ranked AS (
      |  SELECT q_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY q_id
      |      ORDER BY n_shared DESC, doc_id) AS BIGINT) AS rnk
      |  FROM scored
      |)
      |SELECT COUNT(*) AS n_queries,
      |  CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_1,
      |  CAST(SUM(CASE WHEN rnk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_5,
      |  CAST(SUM(1000000 // rnk) AS BIGINT) AS rr_sum_e6,
      |  ((20000*CAST(SUM(1000000 // rnk) AS BIGINT) + COUNT(*)*1000000)
      |    // (2*COUNT(*)*1000000)) / 10000.0 AS mrr4
      |FROM ranked WHERE doc_id = q_id""".stripMargin

  // ---------------------------------------------------------------
  // q185: RECIPROCAL RANK FUSION (RRF) — the standard hybrid-
  // retrieval combiner: a lexical ranker and a vector ranker each
  // produce a top-10, and each hit contributes 1/(60 + rank) to the
  // fused score (Cormack et al.'s k = 60), so a document ranked well
  // by BOTH channels beats one ranked excellently by a single
  // channel. This is the op every RAG stack runs between its two
  // indexes; it composes the q87/q88 lexical family with the
  // q27/q182 vector family over the aligned doc_id = vec_id
  // corpus. Portability: the reciprocal is the FIXED-POINT integer
  // floor(1e9 / (60 + rank)) — summing two such terms stays exact
  // int64, so both engines fuse identically (a float 1/(60+r) sum
  // can reorder ties); a doc missing from one channel's top-10
  // contributes 0 and reports rank -1. Lexical score = shared
  // DISTINCT token count with the query doc (exact int); vector
  // score = the q27 rounded cosine; both rank with doc_id
  // tiebreaks.
  //
  // Scale shape: the query side of BOTH channels broadcasts (query
  // token set, query vectors); the corpus is scanned once per
  // channel (token explode + equi-join; one vector pass); the two
  // top-10 frames are |queries| x 10 and full-outer-join on
  // (q_id, doc_id) — candidate-bounded, never corpus-bounded. The
  // per-query windows partition on q_id.
  // ---------------------------------------------------------------
  def q185RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val ld = Relational.ldiv _
    // lexical channel: shared-distinct-token overlap with the query doc
    val tok = documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("token"))
    val qtok = tok.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("q_id"), col("token"))
    val wLex = Window.partitionBy(col("q_id"))
      .orderBy(col("ov").desc, col("doc_id"))
    val lex = tok.join(broadcast(qtok), "token")
      .filter(col("q_id") =!= col("doc_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("ov"))
      .withColumn("lex_rank", row_number().over(wLex))
      .filter(col("lex_rank") <= 10)
      .select(col("q_id"), col("doc_id"), col("lex_rank").cast("long").as("lex_rank"))
    // vector channel: q27's rounded-cosine ranking on the aligned ids
    val v = col("embedding").cast("array<double>")
    val nrm = sqrt(graft.functions.vec.arrayDot(v, v))
    val e = embeddings(s, dir)
      .select(col("vec_id"), transform(v, x => x / nrm).as("e"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val wVec = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_r").desc, col("vec_id"))
    val vec = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r",
        round(graft.functions.vec.arrayDot(col("qe"), col("e")), 4))
      .withColumn("vec_rank", row_number().over(wVec))
      .filter(col("vec_rank") <= 10)
      .select(col("q_id"), col("vec_id").as("doc_id"),
        col("vec_rank").cast("long").as("vec_rank"))
    // fuse: fixed-point reciprocal ranks, missing channel -> 0
    val wFuse = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(ld(lit(1000000000L), lit(60L) + col("lex_rank")), lit(0L)) +
          coalesce(ld(lit(1000000000L), lit(60L) + col("vec_rank")), lit(0L)))
      .withColumn("fused_rank", row_number().over(wFuse))
      .filter(col("fused_rank") <= 5)
      .select(col("q_id"), col("fused_rank"), col("doc_id"), col("rrf"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"))
      .orderBy("q_id", "fused_rank")
  }

  val q185Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS token
      |  FROM documents
      |), lex AS (
      |  SELECT q_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank FROM (
      |    SELECT q.doc_id AS q_id, t.doc_id AS doc_id, COUNT(*) AS ov,
      |      row_number() OVER (PARTITION BY q.doc_id
      |        ORDER BY COUNT(*) DESC, t.doc_id) AS lex_rank
      |    FROM tok t JOIN tok q ON q.token = t.token
      |    WHERE q.doc_id % 100 = 0 AND q.doc_id <> t.doc_id
      |    GROUP BY q.doc_id, t.doc_id
      |  ) WHERE lex_rank <= 10
      |), ev AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |), vec AS (
      |  SELECT q_id, doc_id, CAST(vec_rank AS BIGINT) AS vec_rank FROM (
      |    SELECT a.vec_id AS q_id, b.vec_id AS doc_id,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        ROUND(list_cosine_similarity(a.emb, b.emb), 4) DESC, b.vec_id)
      |        AS vec_rank
      |    FROM ev a JOIN ev b ON a.vec_id <> b.vec_id
      |    WHERE a.vec_id % 100 = 0
      |  ) WHERE vec_rank <= 10
      |), fused AS (
      |  SELECT COALESCE(l.q_id, v.q_id) AS q_id,
      |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |    COALESCE(1000000000 // (60 + l.lex_rank), 0)
      |      + COALESCE(1000000000 // (60 + v.vec_rank), 0) AS rrf,
      |    COALESCE(l.lex_rank, -1) AS lex_rank,
      |    COALESCE(v.vec_rank, -1) AS vec_rank
      |  FROM lex l FULL OUTER JOIN vec v
      |    ON l.q_id = v.q_id AND l.doc_id = v.doc_id
      |)
      |SELECT q_id, CAST(fused_rank AS INT) AS fused_rank, doc_id, rrf,
      |  lex_rank, vec_rank FROM (
      |  SELECT fused.*, row_number() OVER (PARTITION BY q_id
      |    ORDER BY rrf DESC, doc_id) AS fused_rank
      |  FROM fused
      |) WHERE fused_rank <= 5
      |ORDER BY q_id, fused_rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q185_rrf_fusion" -> q185RrfFusion _,
    "q149_retrieval_mrr" -> q149RetrievalMrr _,
    "q121_phrase_search" -> q121PhraseSearch _,
    "q83_sorted_neighborhood" -> q83SortedNeighborhood _,
    "q85_unpivot" -> q85Unpivot _,
    "q87_inverted_index" -> q87InvertedIndex _,
    "q88_bm25" -> q88Bm25 _,
    "q90_winsorize" -> q90Winsorize _)

  val oracles: Map[String, String] = Map(
    "q185_rrf_fusion" -> q185Sql,
    "q149_retrieval_mrr" -> q149Sql,
    "q121_phrase_search" -> q121Sql,
    "q83_sorted_neighborhood" -> q83Sql,
    "q85_unpivot" -> q85Sql,
    "q87_inverted_index" -> q87Sql,
    "q88_bm25" -> q88Sql,
    "q90_winsorize" -> q90Sql)
}
