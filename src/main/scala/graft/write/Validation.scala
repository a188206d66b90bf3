package graft.write

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Post-load validation — the reference's row-count check
  * (task_run_write.go:380-405) and per-column checksum compare
  * (task_run_write.go:426-431, database CompareChecksums).
  *
  * Checksums are type-dispatched exact aggregates (decimal sums for
  * numerics, length sums for strings, epoch-micro sums for timestamps), so
  * the same definition can be evaluated by any SQL engine on the other side
  * of a load.
  */
object Validation {

  def checksumExpr(f: StructField): Column = f.dataType match {
    case _: IntegerType | _: LongType | _: ShortType =>
      sum(col(f.name).cast(DecimalType(38, 0))).cast("double")
    case _: DoubleType | _: FloatType | _: DecimalType =>
      sum(col(f.name).cast(DecimalType(38, 2))).cast("double")
    case _: StringType => sum(length(col(f.name))).cast("double")
    case _: TimestampType | _: TimestampNTZType =>
      // NTZ casts through TimestampType in the UTC session: same instant
      sum(unix_micros(col(f.name).cast(TimestampType)).cast(DecimalType(38, 0))).cast("double")
    case _: BooleanType => sum(col(f.name).cast("int")).cast("double")
    case _ => lit(null).cast("double")
  }

  /** One row per column: (column, source_checksum, target_checksum, match)
    * plus a leading row_count row.
    */
  def compare(source: DataFrame, target: DataFrame): DataFrame = {
    val spark = source.sparkSession
    val fields = source.schema.fields.toSeq
    def sums(df: DataFrame): Seq[Double] = {
      val r = df.agg(count(lit(1)).cast("double").as("__n"),
        fields.map(f => checksumExpr(f)): _*).head
      (0 to fields.size).map(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
    }
    val s = sums(source)
    val t = sums(target)
    val names = "row_count" +: fields.map(_.name)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      names.zipWithIndex.map { case (n, i) =>
        Row(n, s(i), t(i), s(i) == t(i) || (s(i).isNaN && t(i).isNaN))
      }.asJava,
      StructType(Seq(
        StructField("metric", StringType),
        StructField("source_checksum", DoubleType),
        StructField("target_checksum", DoubleType),
        StructField("is_match", BooleanType))))
  }
}
