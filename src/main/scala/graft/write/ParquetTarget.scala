package graft.write

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A file-backed target table (parquet directory).
  *
  * This is the Spark-native stand-in for the reference's "target table":
  * sling stages into a temp DB table and swaps/merges
  * (core/sling/task_run_write.go:163-498); with a lake-format target the same
  * semantics are a transactional overwrite/append/MERGE. On plain parquet we
  * implement the merge strategies as set algebra + full rewrite — at cluster
  * scale the natural upgrade is Delta/Iceberg `MERGE INTO` (file-pruned),
  * which shares the exact logical semantics implemented in [[Modes]].
  */
final case class ParquetTarget(spark: SparkSession, path: String) {

  def exists: Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  def read: DataFrame = spark.read.parquet(path)

  def overwrite(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Replace target contents with `df`, where `df` may read from this target.
    * Parquet can't overwrite a path that's an input of the same plan, so
    * materialize to a sibling staging dir and swap — the file analogue of the
    * reference's temp-table + transactional swap (task_run_write.go:434-478).
    */
  def replaceWith(df: DataFrame): Unit = {
    val staging = path + "__staging"
    val p = new Path(path)
    val s = new Path(staging)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a failure while materializing the staging copy leaves the target
    // untouched; clean the partial staging dir so reruns start fresh
    // (task_run_write.go:313-331 temp cleanup)
    try df.write.mode(SaveMode.Overwrite).parquet(staging)
    catch {
      case e: Throwable =>
        try fs.delete(s, true) catch { case _: Exception => () }
        throw e
    }
    if (fs.exists(p) && !fs.delete(p, true))
      throw new java.io.IOException(s"failed to delete $p before swap")
    if (!fs.rename(s, p))
      throw new java.io.IOException(s"failed to rename $s to $p — data left in staging")
  }
}
