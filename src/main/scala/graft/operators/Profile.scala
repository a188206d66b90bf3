package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full per-column profiling — the reference's `AnalyzeColumns`
  * (database/analyzer.go:151) and `ColumnStats` (datatype.go:222-242):
  * total/null/distinct counts and min/max per column, computed in ONE
  * aggregate pass over the table (every statistic is a parallel aggregate;
  * no per-column scan).
  */
object Profile {

  def columnStats(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"${f.name}__nonnull"),
        countDistinct(col(f.name)).as(s"${f.name}__uniq"),
        min(col(f.name)).cast(StringType).as(s"${f.name}__min"),
        max(col(f.name)).cast(StringType).as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__total")
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val total = r.getAs[Long]("__total")
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      fields.map { f =>
        Row(f.name,
          total,
          total - r.getAs[Long](s"${f.name}__nonnull"),
          r.getAs[Long](s"${f.name}__uniq"),
          r.getAs[String](s"${f.name}__min"),
          r.getAs[String](s"${f.name}__max"))
      }.asJava,
      StructType(Seq(
        StructField("column", StringType),
        StructField("total_cnt", LongType),
        StructField("null_cnt", LongType),
        StructField("uniq_cnt", LongType),
        StructField("min_val", StringType),
        StructField("max_val", StringType))))
  }
}
