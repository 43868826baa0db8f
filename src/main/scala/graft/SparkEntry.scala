package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every query family; each family pairs `queries` with
  * DuckDB-runnable `oracleSql` (same column names/aliases on both sides —
  * the driver's compare sorts columns by name before hashing). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.XelQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.CorpusQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.XelQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.CorpusQueries.oracles
}
