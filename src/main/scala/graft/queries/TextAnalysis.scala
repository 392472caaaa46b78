package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables._
import Hashing._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.2
  * EXT): language ID, quality scoring, token statistics, document
  * fingerprinting. All pure Column expressions — whole-stage codegen,
  * one pass over the text column, no UDFs.
  */
object TextAnalysis {

  /** Fixed per-language marker-word lists (the standard stopword-
    * profile language-ID mechanism; lists chosen for the synthetic
    * corpus's per-language frequency profiles).
    */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "column", "big"),
    "en" -> Seq("order", "table", "window"),
    "es" -> Seq("slow", "agg", "merge", "vector"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("small", "the", "join"))

  // ---------------------------------------------------------------
  // q29: language ID — score each language's marker hits over the
  // token array, argmax with a fixed de<en<es<fr<zh tie-break chain
  // (identical CASE order in the oracle). Output: per-language
  // accuracy against the labeled lang column.
  // ---------------------------------------------------------------
  def q29LangId(s: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val scores = Markers.map { case (l, ms) =>
      l -> size(filter(ws, w => w.isin(ms.map(lit(_)): _*)))
    }.toMap
    def ge(l: String, others: Seq[String]): Column =
      others.map(o => scores(l) >= scores(o)).reduce(_ && _)
    val pred = when(ge("de", Seq("en", "es", "fr", "zh")), "de")
      .when(ge("en", Seq("es", "fr", "zh")), "en")
      .when(ge("es", Seq("fr", "zh")), "es")
      .when(ge("fr", Seq("zh")), "fr")
      .otherwise("zh")
    documents(s, dir)
      .withColumn("pred", pred)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("pred") === col("lang"), 1)).as("n_correct"),
        round(count(when(col("pred") === col("lang"), 1)) /
          count(lit(1)).cast("double"), 4).as("accuracy"))
      .orderBy("lang")
  }

  val q29Sql: String = {
    def score(l: String): String = {
      val in = Markers.toMap.apply(l).map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split(text,' '), w -> w IN ($in)))"
    }
    def ge(l: String, others: Seq[String]): String =
      others.map(o => s"s_$l >= s_$o").mkString(" AND ")
    s"""WITH scored AS (
       |  SELECT lang,
       |    ${Markers.map { case (l, _) => s"${score(l)} AS s_$l" }.mkString(",\n    ")}
       |  FROM documents
       |), p AS (
       |  SELECT lang,
       |    CASE WHEN ${ge("de", Seq("en", "es", "fr", "zh"))} THEN 'de'
       |         WHEN ${ge("en", Seq("es", "fr", "zh"))} THEN 'en'
       |         WHEN ${ge("es", Seq("fr", "zh"))} THEN 'es'
       |         WHEN ${ge("fr", Seq("zh"))} THEN 'fr'
       |         ELSE 'zh' END AS pred
       |  FROM scored
       |)
       |SELECT lang, COUNT(*) AS n_docs,
       |  COUNT(CASE WHEN pred = lang THEN 1 END) AS n_correct,
       |  ROUND(COUNT(CASE WHEN pred = lang THEN 1 END) * 1.0 / COUNT(*), 4) AS accuracy
       |FROM p GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------
  // q30: per-document quality scoring: type-token ratio, stopword
  // ratio, length factor -> weighted score. The classic pre-training
  // quality filter shape (length/stopword/diversity heuristics).
  // ---------------------------------------------------------------
  def q30TextQuality(s: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws).cast("double")
    val nDistinct = size(array_distinct(ws)).cast("double")
    val nStop = size(filter(ws, w => w.isin("the", "a"))).cast("double")
    val ttr = nDistinct / nWords
    val stopRatio = nStop / nWords
    val lenFactor = least(nWords / 100.0, lit(1.0))
    documents(s, dir).select(
        col("doc_id"), col("lang"),
        size(ws).as("n_words"),
        size(array_distinct(ws)).as("n_distinct"),
        round(ttr, 4).as("ttr"),
        round(stopRatio, 4).as("stop_ratio"),
        round(ttr * 0.5 + (lit(1.0) - stopRatio) * 0.3 + lenFactor * 0.2, 4)
          .as("quality"))
      .orderBy("doc_id")
  }

  val q30Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text,' ')) AS n_words,
      |    len(list_distinct(string_split(text,' '))) AS n_distinct,
      |    len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS n_stop
      |  FROM documents
      |)
      |SELECT doc_id, lang, n_words, n_distinct,
      |  ROUND(n_distinct * 1.0 / n_words, 4) AS ttr,
      |  ROUND(n_stop * 1.0 / n_words, 4) AS stop_ratio,
      |  ROUND((n_distinct * 1.0 / n_words) * 0.5
      |        + (1.0 - n_stop * 1.0 / n_words) * 0.3
      |        + least(n_words / 100.0, 1.0) * 0.2, 4) AS quality
      |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q31: corpus token statistics per language: token counts, distinct
  // vocabulary, and a BPE-ish subword proxy (consonant/vowel run
  // segmentation via regex) — token counting without a tokenizer
  // model, as a pre-training corpus-size estimator.
  // ---------------------------------------------------------------
  def q31TokenStats(s: SparkSession, dir: String): DataFrame = {
    val pieces = size(regexp_extract_all(col("text"), lit("[aeiou]+|[^aeiou ]+"), lit(0)))
    documents(s, dir)
      .select(col("lang"), col("doc_id"), explode(words(col("text"))).as("w"),
        size(words(col("text"))).as("n_tok"), pieces.as("n_pieces"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_vocab"),
        round(count(lit(1)) / countDistinct(col("doc_id")).cast("double"), 4)
          .as("tokens_per_doc"),
        round(sum(col("n_pieces") / col("n_tok").cast("double")) /
          count(lit(1)), 4).as("pieces_per_token"))
      .orderBy("lang")
  }

  val q31Sql: String =
    """WITH ex AS (
      |  SELECT lang, doc_id, unnest(string_split(text,' ')) AS w,
      |    len(string_split(text,' ')) AS n_tok,
      |    len(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+')) AS n_pieces
      |  FROM documents
      |)
      |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens,
      |  COUNT(DISTINCT w) AS n_vocab,
      |  ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT doc_id), 4) AS tokens_per_doc,
      |  ROUND(SUM(n_pieces * 1.0 / n_tok) / COUNT(*), 4) AS pieces_per_token
      |FROM ex GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q32: document fingerprinting: full-content md5, winnowing-style
  // minimum-shingle fingerprint (stable under local edits), and a
  // 60-bit integer fingerprint — the three standard exact/near/compact
  // fingerprint shapes.
  // ---------------------------------------------------------------
  def q32Fingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("full_md5"),
        minhash(shingles(col("text"), 3), 0).as("min_shingle_fp"),
        hash60(col("text")).as("fp60"))
      .orderBy("doc_id")

  val q32Sql: String =
    s"""SELECT doc_id, md5(text) AS full_md5,
       |  ${sqlMinhash(sqlShingles(3), 0)} AS min_shingle_fp,
       |  ${sqlHash60("text")} AS fp60
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q38: per-language TF-IDF top terms: tf = term occurrences within
  // the language, df = documents containing the term (corpus-wide),
  // idf = ln((N+1)/(df+1)). Two partial-aggregated passes over the
  // exploded tokens + one broadcast-joined doc-frequency table; top-5
  // per language by (rounded tfidf, term) via row_number.
  // ---------------------------------------------------------------
  def q38Tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(words(col("text"))).as("w"))
    val n = docs.count() // corpus size: one tiny job, a constant in the plan
    val tf = tok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tok.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "w")
      .withColumn("tfidf",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 4))
    val rw = Window.partitionBy(col("lang"))
      .orderBy(col("tfidf").desc, col("w"))
    scored.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("w").as("term"),
        col("tf"), col("df"), col("tfidf"))
      .orderBy("lang", "rank")
  }

  val q38Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS w FROM documents
      |), tf AS (
      |  SELECT lang, w, COUNT(*) AS tf FROM tok GROUP BY lang, w
      |), df AS (
      |  SELECT w, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY w
      |), n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT lang, w, tf, df,
      |    ROUND(tf * ln((n.n + 1.0) / (df + 1.0)), 4) AS tfidf
      |  FROM tf JOIN df USING (w) CROSS JOIN n
      |), ranked AS (
      |  SELECT lang, w, tf, df, tfidf,
      |    row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, w) AS rank
      |  FROM scored
      |)
      |SELECT lang, CAST(rank AS INT) AS rank, w AS term, tf, df, tfidf
      |FROM ranked WHERE rank <= 5 ORDER BY lang, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_tfidf" -> q38Tfidf _,
    "q29_lang_id" -> q29LangId _,
    "q30_text_quality" -> q30TextQuality _,
    "q31_token_stats" -> q31TokenStats _,
    "q32_fingerprint" -> q32Fingerprint _)

  val oracles: Map[String, String] = Map(
    "q38_tfidf" -> q38Sql,
    "q29_lang_id" -> q29Sql,
    "q30_text_quality" -> q30Sql,
    "q31_token_stats" -> q31Sql,
    "q32_fingerprint" -> q32Sql)
}
