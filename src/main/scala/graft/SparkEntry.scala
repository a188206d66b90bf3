package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` enumerates every implemented operator from SURVEY.md §2 (plus the
  * beyond-reference training-data operators); `oracleSql` gives the DuckDB
  * equivalent where one is SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Registry.queryMap("q1_agg")(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleMap
}
