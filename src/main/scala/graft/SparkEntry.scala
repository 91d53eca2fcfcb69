package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's correctness queries
  * (SURVEY.md §2); `oracleSql` holds the matching DuckDB SQL. Queries
  * without an oracle entry are non-SQL-expressible (hash-based
  * signatures etc.) and get the driver's rows-only check plus a
  * scalatest spec.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full bank pipeline: open → flatMap movements → transactional
    * state → 2PC close → committed balances (evaluation/BankUseCase.java
    * analog).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("t_state_balances_pl3")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.BankQueries.queries ++
      graft.queries.PurchaseQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.CorpusQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.BankQueries.oracles ++
      graft.queries.PurchaseQueries.oracles ++
      graft.queries.AnalyticsQueries.oracles ++
      graft.queries.LlmQueries.oracles ++
      graft.queries.CorpusQueries.oracles
}
