package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder
  * prompt. Queries and their DuckDB oracles live in
  * [[TsdbQueries]] (m3 function surface, SURVEY §2 A–F),
  * [[RelQueries]] (warehouse suite, §2G) and
  * [[PipelineQueries]] (training-data ops, §2H).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the Q5-star shape — scan + broadcast dims + agg. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.queries("q5_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsdbQueries.queries ++ RelQueries.queries ++ PipelineQueries.queries ++
      GraphiteQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. */
  def oracleSql: Map[String, String] =
    TsdbQueries.oracles ++ RelQueries.oracles ++ PipelineQueries.oracles ++
      GraphiteQueries.oracles
}
