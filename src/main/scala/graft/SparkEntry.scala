package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2); each key has
  * matching DuckDB SQL in `oracleSql` where the semantics are
  * SQL-expressible (hash-based ops like MinHash/SimHash are rows-only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The thermostat replay — the reference's dynamically-controlled-stream
    * semantics folded over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Events.q16ControlActions(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Events.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Vectors.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.Advanced.queries ++
      graft.queries.Mining.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.Retrieval.queries ++
      graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.Vectors.oracles ++
      graft.queries.TextAnalysis.oracles ++
      graft.queries.Multimodal.oracles ++
      graft.queries.Advanced.oracles ++
      graft.queries.Mining.oracles ++
      graft.queries.Curation.oracles ++
      graft.queries.Temporal.oracles ++
      graft.queries.Retrieval.oracles ++
      graft.queries.Analytics.oracles
}
