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
}
