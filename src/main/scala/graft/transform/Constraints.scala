package graft.transform

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column constraints: per-row boolean checks whose failures are *counted*,
  * not dropped — the reference tallies `FailCnt` per constraint and warns at
  * the end of the run (datatype.go:76-83,1022-1038; task_run.go:140-147).
  *
  * Expressions are Spark SQL (a strict superset of the reference's pluggable
  * mini-parser). One aggregate pass computes every constraint's fail count —
  * map-side partial aggregation, no extra scan per constraint.
  */
object Constraints {

  final case class Check(column: String, expression: String)

  /** One row per constraint: (column, expression, fail_count). */
  def failCounts(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no constraint checks given")
    // coalesce: sum over zero rows is NULL, and fail_count must read 0
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(!expr(c.expression), 1L).otherwise(0L)), lit(0L)).as(s"c$i")
    }
    val counts = df.agg(aggs.head, aggs.tail: _*).head
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      checks.zipWithIndex.map { case (c, i) =>
        Row(c.column, c.expression, counts.getLong(i))
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("column", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("expression", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("fail_count", org.apache.spark.sql.types.LongType))))
  }
}
