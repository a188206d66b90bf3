package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation: salt the hot keys across
  * `saltFactor` sub-keys, partially aggregate, then merge. With AQE's
  * skew handling this is rarely needed for joins, but aggregations over a
  * low-cardinality hot key (the 100 TB "group by event_type" case) still
  * benefit: phase 1 spreads one key over N reducers.
  *
  * Caller supplies re-aggregable partial expressions (sum/count/min/max).
  */
object SaltedAgg {

  def sumCount(df: DataFrame, keys: Seq[String], valueExpr: Column,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueExpr).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
  }
}
