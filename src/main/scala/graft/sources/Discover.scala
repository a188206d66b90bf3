package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Stream discovery — `sling conns discover` (reference
  * database/analyzer.go path + replication wildcard listing,
  * replication.go:293-517): glob a pattern against the catalog and
  * enumerate each matching stream's columns with 1-based positions
  * (the reference's Columns are 1-based, datatype.go:288-296).
  */
object Discover {

  /** Glob (`*` wildcard) → regex, matching whole names. */
  def globMatch(pattern: String, name: String): Boolean =
    ("^" + java.util.regex.Pattern.quote(pattern)
      .replace("*", "\\E.*\\Q") + "$").r.matches(name)

  /** (stream, position, column_name, type_name) for catalog streams
    * matching any of `patterns`.
    */
  def columns(spark: SparkSession, sfDir: String,
      patterns: Seq[String]): DataFrame = {
    val streams = Tables.names
      .filter(n => patterns.exists(p => globMatch(p, n))).sorted
    val rows = streams.flatMap { t =>
      Tables(spark, sfDir, t).schema.fields.zipWithIndex.map {
        case (f, i) => Row(t, (i + 1).toLong, f.name, f.dataType.sql)
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("stream", StringType),
      StructField("position", LongType),
      StructField("column_name", StringType),
      StructField("type_name", StringType))))
  }
}
