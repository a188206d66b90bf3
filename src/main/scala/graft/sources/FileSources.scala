package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DataType

import graft.model.TypeInference

/** CSV / JSONL readers with sling-style sampling inference.
  *
  * Both read the raw file with all-string schemas, infer from the first 900
  * rows with [[TypeInference]], apply user `columns:` overrides (the
  * reference's `Columns.Coerce`, dataset.go:604-606), and cast the full
  * lazy scan — so only the sample is collected to the driver; the data path
  * stays distributed and codegen'd.
  */
object FileSources {

  def csv(spark: SparkSession, path: String,
      header: Boolean = true, delimiter: String = ",",
      overrides: Map[String, DataType] = Map.empty,
      sampleSize: Int = TypeInference.SampleSize): DataFrame = {
    val raw = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("inferSchema", "false")
      .csv(path)
    inferAndCast(raw, overrides, sampleSize)
  }

  def jsonl(spark: SparkSession, path: String,
      overrides: Map[String, DataType] = Map.empty,
      sampleSize: Int = TypeInference.SampleSize): DataFrame = {
    // primitivesAsString routes JSON scalars through the same inference
    // engine as CSV, for identical type decisions across formats
    val raw = spark.read
      .option("primitivesAsString", "true")
      .json(path)
    inferAndCast(raw, overrides, sampleSize)
  }

  private def inferAndCast(raw: DataFrame,
      overrides: Map[String, DataType], sampleSize: Int): DataFrame = {
    val sample = raw.limit(sampleSize).collect().toSeq
    val schema = TypeInference.infer(sample, raw.columns.toSeq, overrides)
    TypeInference.castTo(raw, schema)
  }
}
