package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sling metadata columns (datastream.go:121-129,812-960; task.go:335-399):
  * `_sling_loaded_at`, `_sling_stream_url`, `_sling_row_num`, `_sling_row_id`,
  * `_sling_exec_id`.
  */
object Meta {

  /** Basename of the source file that produced each row (full URL at the
    * reference; basename keeps results location-independent).
    */
  def streamUrl(df: DataFrame): DataFrame =
    df.withColumn("_sling_stream_url",
      regexp_extract(input_file_name(), "[^/]+$", 0))

  def loadedAt(df: DataFrame, ts: java.sql.Timestamp): DataFrame =
    df.withColumn("_sling_loaded_at", lit(ts))

  def execId(df: DataFrame, id: String): DataFrame =
    df.withColumn("_sling_exec_id", lit(id))

  /** Deterministic row id: hash of the PK columns (the reference uses a uuid;
    * a content hash keeps replays idempotent and is cluster-reproducible).
    * Delimited + null-safe: undelimited concat makes ("ab","c") and
    * ("a","bc") collide, and one NULL pk column would null the whole id.
    */
  def rowId(df: DataFrame, pk: Seq[String]): DataFrame =
    df.withColumn("_sling_row_id", md5(concat_ws("\u0001",
      pk.map(c => coalesce(col(c).cast("string"), lit(""))): _*)))

  /** 1-based row number in the given total order.
    *
    * Note: a global window is a single-partition sort — fine for samples and
    * small extracts (where the reference uses it); for 100 TB use
    * `zipWithIndex`-style per-partition offsets instead (provided by
    * [[rowNumScalable]]).
    */
  def rowNum(df: DataFrame, order: Seq[Column]): DataFrame =
    df.withColumn("_sling_row_num", row_number().over(Window.orderBy(order: _*)))

  /** Scalable row numbering: sort, then per-partition offsets computed from
    * partition sizes — no single-partition bottleneck.
    */
  def rowNumScalable(df: DataFrame, order: Seq[Column]): DataFrame = {
    val sorted = df.repartitionByRange(order.head).sortWithinPartitions(order: _*)
    val spark = df.sparkSession
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(sorted.schema.fields :+ StructField("_sling_row_num", LongType))
    val withIdx = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
    }
    spark.createDataFrame(withIdx, schema)
  }
}
