package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
  * is exposed as a named query over the testdata tables; where the
  * semantics are SQL-expressible the matching DuckDB oracle is in
  * [[oracleSql]]. Query groups live in `graft.relational`, `graft.pol`,
  * `graft.llm`, `graft.streaming`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full reference-shaped pipeline: parse → per-pool metrics →
    * volatility — the semantic core of the reference engine.
    */
  def entry(spark: SparkSession): DataFrame =
    relational.AggQueries.queries("a6_volatility")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.AggQueries.queries ++
      relational.AnalyticsQueries.queries ++
      relational.ParseQueries.queries ++
      relational.JoinQueries.queries ++
      relational.SortWindowQueries.queries ++
      llm.DedupQueries.queries ++
      llm.CurationQueries.queries ++
      llm.SimilarityQueries.queries ++
      llm.TextQueries.queries ++
      llm.MultimodalQueries.queries ++
      llm.Advisories.queries ++
      streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    relational.AggQueries.oracle ++
      relational.AnalyticsQueries.oracle ++
      relational.ParseQueries.oracle ++
      relational.JoinQueries.oracle ++
      relational.SortWindowQueries.oracle ++
      llm.DedupQueries.oracle ++
      llm.CurationQueries.oracle ++
      llm.SimilarityQueries.oracle ++
      llm.TextQueries.oracle ++
      llm.MultimodalQueries.oracle ++
      llm.Advisories.oracle ++
      streaming.StreamingQueries.oracle
}
