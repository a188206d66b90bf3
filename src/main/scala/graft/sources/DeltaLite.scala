package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal Delta Lake table support over the public transaction-log protocol
  * (protocol/reader version 1: JSON commits of add/remove/metaData actions) —
  * no delta-spark jar needed. The reference scans Delta via an embedded
  * engine (core/dbio/iop/delta.go:1-50, duckdb delta_scan); here the log
  * replay is driver-side metadata work and the data read is a normal
  * distributed parquet scan of the active files, so partition pruning and
  * column pruning apply as usual.
  *
  * Supported: JSON commits, parquet checkpoints via _last_checkpoint,
  * append/overwrite writes with single-writer commits. Not supported (and
  * rejected via protocol check): deletion vectors, column mapping
  * (minReaderVersion > 1).
  */
object DeltaLite {

  private val mapper = new ObjectMapper()

  private def logDir(table: String) = new Path(table, "_delta_log")
  private def commitFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  // ---- log replay --------------------------------------------------------

  /** Replay the log; return (active file paths relative to table root,
    * latest version). */
  def activeFiles(spark: SparkSession, table: String): (Seq[String], Long) = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = logDir(table)
    require(fs.exists(dir), s"not a delta table: $table (no _delta_log)")

    // start from the newest parquet checkpoint if one is advertised
    val lastCp = new Path(dir, "_last_checkpoint")
    val (startVersion, initial: mutable.LinkedHashSet[String]) =
      if (fs.exists(lastCp)) {
        val in = fs.open(lastCp)
        val cpVer = try mapper.readTree(in).path("version").asLong finally in.close()
        val cpPath = new Path(dir, f"$cpVer%020d.checkpoint.parquet")
        val cp = spark.read.parquet(cpPath.toString)
        if (cp.columns.contains("protocol"))
          checkProtocol(cp.select("protocol.minReaderVersion").na.drop().collect()
            .headOption.map(_.getInt(0)))
        val files =
          if (cp.columns.contains("add"))
            cp.select("add.path").na.drop().collect().map(_.getString(0))
          else Array.empty[String]
        (cpVer + 1, mutable.LinkedHashSet[String](files.toIndexedSeq: _*))
      } else (0L, mutable.LinkedHashSet[String]())

    val commits = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(n => n.stripSuffix(".json").toLong)
      .filter(_ >= startVersion).sorted
    var version = startVersion - 1
    commits.foreach { v =>
      val in = fs.open(commitFile(table, v))
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        val proto = node.path("protocol")
        if (!proto.isMissingNode)
          checkProtocol(Some(proto.path("minReaderVersion").asInt))
        val add = node.path("add")
        if (!add.isMissingNode) initial += add.path("path").asText
        val remove = node.path("remove")
        if (!remove.isMissingNode) initial -= remove.path("path").asText
      }
      version = v
    }
    (initial.toSeq, version)
  }

  private def checkProtocol(minReader: Option[Int]): Unit =
    minReader.foreach { v =>
      require(v <= 1, s"unsupported delta minReaderVersion $v " +
        "(deletion vectors / column mapping not implemented)")
    }

  /** Distributed read of the table's current snapshot. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val (files, _) = activeFiles(spark, table)
    require(files.nonEmpty, s"delta table $table has no active files")
    // basePath keeps hive-style partition dirs resolving to partition columns
    spark.read.option("basePath", table)
      .parquet(files.map(f => s"$table/$f"): _*)
  }

  // ---- writes (single-writer) -------------------------------------------

  private def writeCommit(spark: SparkSession, table: String, v: Long,
      actions: Seq[String]): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir(table))
    val f = commitFile(table, v)
    require(!fs.exists(f), s"concurrent commit: $f exists")
    val out = fs.create(f, false)
    try out.write((actions.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def nextVersion(spark: SparkSession, table: String): Long = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir(table))) 0L
    else fs.listStatus(logDir(table)).map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max) + 1
  }

  private def stageData(df: DataFrame, table: String): Seq[String] = {
    // land parquet in a unique data dir, then reference the files in the log
    val sub = s"data-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.Overwrite).parquet(s"$table/$sub")
    val fs = new Path(table).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(table, sub))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => s"$sub/${st.getPath.getName}").toSeq
  }

  private def addAction(path: String): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":0,""" +
      s""""modificationTime":0,"dataChange":true}}"""

  /** Append `df` as a new commit. */
  def append(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val v = nextVersion(spark, table)
    val proto = if (v == 0L)
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":1}}""")
    else Nil
    writeCommit(spark, table, v, proto ++ stageData(df, table).map(addAction))
  }

  /** Replace the table contents: one commit removing every active file and
    * adding the new ones — readers see either the old or new snapshot.
    */
  def overwrite(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (old, _) = if (fs.exists(logDir(table)))
      activeFiles(spark, table) else (Seq.empty[String], -1L)
    val v = nextVersion(spark, table)
    val proto = if (v == 0L)
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":1}}""")
    else Nil
    val removes = old.map(p =>
      s"""{"remove":{"path":"$p","dataChange":true}}""")
    writeCommit(spark, table, v,
      proto ++ removes ++ stageData(df, table).map(addAction))
  }
}
