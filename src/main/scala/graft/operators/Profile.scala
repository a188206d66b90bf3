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

  /** Relation discovery between a candidate FK column and a candidate key
    * column — the reference's analyzer classifies column pairs as
    * one_to_one / one_to_many / many_to_one / many_to_many from uniqueness
    * plus value overlap (database/analyzer.go:260-560). Three aggregates:
    * per-side uniqueness and a distinct-value semi-join overlap; the join is
    * on distinct values (small after dedup) so the full tables never
    * cross-shuffle.
    */
  def relation(dfA: DataFrame, colA: String, dfB: DataFrame,
      colB: String): (String, Double) = {
    // alias both sides: when colA and colB share a name (the common FK
    // convention) unqualified references in the join condition are ambiguous
    val a = dfA.select(col(colA).as("__rel_a")).na.drop()
    val b = dfB.select(col(colB).as("__rel_b")).na.drop()
    val Row(aCnt: Long, aUniq: Long) =
      a.agg(count(lit(1)), countDistinct(col("__rel_a"))).head
    val Row(bCnt: Long, bUniq: Long) =
      b.agg(count(lit(1)), countDistinct(col("__rel_b"))).head
    val matched = a.distinct()
      .join(b.distinct(), col("__rel_a") === col("__rel_b"), "left_semi").count()
    val kind = (aCnt == aUniq, bCnt == bUniq) match {
      case (true, true) => "one_to_one"
      case (true, false) => "one_to_many"
      case (false, true) => "many_to_one"
      case (false, false) => "many_to_many"
    }
    (kind, if (aUniq == 0) 0.0 else matched.toDouble / aUniq)
  }
}
