package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the TPC-H-ish testdata layout: one parquet file
  * (or directory of files) per table under a scale-factor directory.
  *
  * At cluster scale the same call reads a multi-file partitioned dataset —
  * `spark.read.parquet` takes directories/globs; nothing here assumes a single
  * local file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** events.ts is written as parquet TIMESTAMP(NANOS), which Spark surfaces as
    * a long when `spark.sql.legacy.parquet.nanosAsLong` is set (Spark has no
    * nanosecond timestamp type). Convert to a microsecond timestamp the same
    * way other engines do: truncation toward the epoch floor.
    */
  private def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      // floor division toward the epoch, not `div` (truncation toward
      // zero): pre-epoch nanos would otherwise round UP one microsecond,
      // disagreeing with engines that floor-truncate timestamps. Integer
      // floor() keeps full 2^63 precision, unlike double `/`.
      df.withColumn("ts",
        timestamp_micros(expr("cast(floor(ts, -3) div 1000 as bigint)")))
    else df

  /** Register every table as a temp view so `spark.sql` queries (the custom-SQL
    * surface of the engine) can reference them by name.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
