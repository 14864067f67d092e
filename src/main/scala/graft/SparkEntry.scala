package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories:
  *   - [[graft.operators.RelationalQueries]] — engine-side operator suite
  *     (the categories the reference delegates to DuckDB).
  *   - [[graft.operators.PipelineQueries]] — LLM-data-pipeline operators
  *     (dedup, similarity search, text analysis, multimodal plumbing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
      operators.PipelineQueries.queries ++
      streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracleSql ++
      operators.PipelineQueries.oracleSql ++
      streaming.StreamingQueries.oracleSql
}
