package graft.write

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader}
import org.apache.spark.sql.functions._

/** Partitioned file writes with the reference's `{part_*}` URI masks
  * (core/dbio/iop/partition.go:47-121): time-truncation levels year..minute
  * become Hive-style partition columns via `partitionBy`, which Spark then
  * prunes on read — the pruning the reference implements by matching mask
  * paths (fs.go:747) comes free from the source listing.
  */
object PartitionedWriter {

  /** Mask field → generated column from the partition timestamp key. */
  def partField(field: String, key: Column): Column = field match {
    case "part_year" => year(key)
    case "part_month" => month(key)
    case "part_day" => dayofmonth(key)
    case "part_hour" => hour(key)
    case "part_minute" => minute(key)
    case "part_week" => weekofyear(key)
    case other => throw new IllegalArgumentException(s"unknown part field: $other")
  }

  /** Write `df` under `path` partitioned by the mask fields derived from
    * `timeKey` (e.g. Seq("part_year","part_month")).
    */
  def write(df: DataFrame, path: String, timeKey: String, fields: Seq[String],
      maxRecordsPerFile: Long = 0): Unit = {
    val withParts = fields.foldLeft(df)((d, f) =>
      d.withColumn(f, partField(f, col(timeKey))))
    val w = withParts.write.mode("overwrite").partitionBy(fields: _*)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Expand a `{part_*}` URI mask into the chunk URIs covering
    * `[start, end]` at the mask's LOWEST time resolution — the reference's
    * `GeneratePartURIsFromRange` (core/dbio/iop/partition.go:600-648).
    * Values render unpadded, matching Spark's Hive-style partition dirs
    * (`part_month=3`). A chunked file backfill reads exactly these URIs
    * instead of listing the whole partitioned tree — at scale that is the
    * difference between touching 24 directories and a million.
    */
  def partURIsFromRange(mask: String, start: java.time.LocalDateTime,
      end: java.time.LocalDateTime): Seq[String] = {
    require(!end.isBefore(start), s"range end ($end) is before start ($start)")
    // resolution rank, finest last
    val ranked = Seq("part_year" -> 1, "part_month" -> 2, "part_day" -> 3,
      "part_hour" -> 4, "part_minute" -> 5)
    val present = ranked.filter { case (f, _) => mask.contains(s"{$f}") }
    require(present.nonEmpty, s"no {part_*} field in mask: $mask")
    val lowest = present.map(_._2).max
    import java.time.temporal.ChronoUnit._
    def trunc(t: java.time.LocalDateTime) = lowest match {
      case 1 => t.withDayOfYear(1).truncatedTo(DAYS)
      case 2 => t.withDayOfMonth(1).truncatedTo(DAYS)
      case 3 => t.truncatedTo(DAYS)
      case 4 => t.truncatedTo(HOURS)
      case _ => t.truncatedTo(MINUTES)
    }
    def inc(t: java.time.LocalDateTime) = lowest match {
      case 1 => t.plusYears(1)
      case 2 => t.plusMonths(1) // months are not a fixed duration
      case 3 => t.plusDays(1)
      case 4 => t.plusHours(1)
      case _ => t.plusMinutes(1)
    }
    Iterator.iterate(trunc(start))(inc).takeWhile(!_.isAfter(end)).map { t =>
      mask.replace("{part_year}", t.getYear.toString)
        .replace("{part_month}", t.getMonthValue.toString)
        .replace("{part_day}", t.getDayOfMonth.toString)
        .replace("{part_hour}", t.getHour.toString)
        .replace("{part_minute}", t.getMinute.toString)
    }.toSeq
  }
}
