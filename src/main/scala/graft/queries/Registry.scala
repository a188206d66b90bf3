package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query over the same parquet tables.
  *
  * Determinism contract (driver hash-compares results):
  *   - every query ends in a total ORDER BY;
  *   - double aggregations go through exact DECIMAL arithmetic and are cast
  *     back to DOUBLE only at the end, so Spark's partial-aggregation order
  *     cannot change the result vs a single-threaded oracle;
  *   - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    Relational.queries ++
      Modes.queries ++
      Pipeline.queries ++
      TrainingData.queries ++
      Temporal.queries ++
      FileOps.queries ++
      Integration.queries

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
