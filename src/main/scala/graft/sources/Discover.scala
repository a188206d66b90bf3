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

  /** File-backend discovery (`sling conns discover <fileconn>`, the
    * fs.go glob listing the file suite's discover scenarios exercise).
    * Semantics mirror the reference:
    *   - a path with no glob chars naming a DIR: without a trailing "/"
    *     returns the dir entry itself; with one, lists its children
    *   - a path naming a FILE returns that file
    *   - globs: `*` matches within a path segment, `**` spans segments
    *   - `recursive` walks subdirectories for dir listings
    * Directory entries are reported with a trailing "/".
    */
  def files(spark: SparkSession, pattern: String,
      recursive: Boolean = false): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    import org.apache.hadoop.fs.{FileStatus, Path}
    def entry(s: FileStatus): String = {
      val p = s.getPath.toUri.getPath
      if (s.isDirectory) p + "/" else p
    }
    def walk(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
        deep: Boolean): Seq[FileStatus] = {
      val kids = fs.listStatus(dir).toSeq
        .filterNot(_.getPath.getName.startsWith("."))
      if (!deep) kids
      else kids ++ kids.filter(_.isDirectory)
        .flatMap(d => walk(fs, d.getPath, deep))
    }
    val hasGlob = pattern.exists("*?[{".contains(_))
    if (!hasGlob) {
      val wantChildren = pattern.endsWith("/")
      val p = new Path(if (wantChildren) pattern.dropRight(1) else pattern)
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) Nil
      else {
        val st = fs.getFileStatus(p)
        if (!st.isDirectory) Seq(entry(st))
        else if (wantChildren || recursive) walk(fs, p, recursive).map(entry)
        else Seq(entry(st))
      }
    } else {
      // anchor at the deepest glob-free prefix, walk, regex-match whole
      // paths ('*' stays inside a segment, '**' spans segments)
      val segs = pattern.split('/')
      val fixed = segs.takeWhile(!_.exists("*?[{".contains(_)))
      val baseStr = fixed.mkString("/")
      val base = new Path(if (baseStr.isEmpty) "/" else baseStr)
      val fs = base.getFileSystem(hconf)
      if (!fs.exists(base)) Nil
      else {
        val deep = recursive || pattern.contains("**")
        val rx = ("^" + java.util.regex.Pattern.quote(pattern)
          .replace("**", "\\E@DD@\\Q").replace("*", "\\E[^/]*\\Q")
          .replace("@DD@", ".*") + "$").r
        walk(fs, base, deep)
          .filter(s => rx.matches(s.getPath.toUri.getPath))
          .map(entry)
      }
    }
  }.sorted

  /** Column-level discovery of one FILE (`level: column` in the suite):
    * (column_name, 1-based position, spark type) from the format reader's
    * schema. */
  def fileColumns(spark: SparkSession, path: String): Seq[(String, Int, String)] = {
    val df =
      if (path.endsWith(".parquet")) spark.read.parquet(path)
      else if (path.endsWith(".json") || path.endsWith(".jsonl"))
        FileSources.jsonl(spark, path)
      else FileSources.csv(spark, path)
    df.schema.fields.zipWithIndex.map { case (f, i) =>
      (f.name, i + 1, f.dataType.sql)
    }.toSeq
  }
}
