package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Iceberg table scan over the public table-format spec — no
  * iceberg-spark runtime jar. The reference scans Iceberg through an
  * embedded engine (core/dbio/iop/iceberg.go:1-50, duckdb `iceberg_scan`);
  * here the metadata walk is driver-side (it is pure metadata, a few KB):
  *
  *   metadata/vN.metadata.json (newest N, or version-hint.text)
  *     → current-snapshot-id → snapshot.manifest-list (avro)
  *     → manifest_path entries (avro manifests)
  *     → data_file entries (status ADDED/EXISTING kept, DELETED dropped)
  *
  * and the data read is a normal distributed parquet scan of the live
  * files.
  *
  * v2 row-level deletes are applied distributedly: position-delete files
  * (spec columns `file_path`, `pos`) anti-join against the data scan's
  * `_metadata.file_path`/`_metadata.row_index` — Spark's file-position
  * metadata IS the Iceberg position semantics, so no per-file numbering
  * pass is needed; equality-delete files anti-join on their own column
  * set. Both joins are O(rows), shuffle on the join keys, and broadcast
  * when the delete set is small (the usual case). Simplification vs the
  * full spec, documented for the bootstrap reader: sequence-number
  * scoping is not applied — every live delete file applies to every live
  * data file (true for single-writer fixture tables; a table where a
  * data file was added AFTER a delete file would need the sequence
  * check).
  */
object IcebergLite {

  private val mapper = new ObjectMapper()

  /** Read every record of a (small, driver-side) avro metadata file. */
  private def readAvro(spark: SparkSession, path: String): Seq[GenericRecord] = {
    val p = new Path(stripScheme(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
    try {
      val out = mutable.ArrayBuffer[GenericRecord]()
      while (stream.hasNext) out += stream.next()
      out.toSeq
    } finally stream.close()
  }

  private def stripScheme(uri: String): String =
    uri.stripPrefix("file://").stripPrefix("file:")

  /** Locate the newest metadata json: version-hint.text if present, else
    * max vN.metadata.json.
    */
  private def currentMetadata(spark: SparkSession, table: String): String = {
    val dir = new Path(table, "metadata")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"not an iceberg table: $table (no metadata dir)")
    val hint = new Path(dir, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try new String(in.readAllBytes()).trim finally in.close()
      s"$table/metadata/v$v.metadata.json"
    } else {
      val versions = fs.listStatus(dir).map(_.getPath.getName)
        .flatMap { n =>
          "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(n).map(_.group(1).toLong)
        }
      require(versions.nonEmpty, s"no vN.metadata.json under $dir")
      s"$table/metadata/v${versions.max}.metadata.json"
    }
  }

  /** The current snapshot's live files, routed by content:
    * (data, position deletes, equality deletes). */
  final case class SnapshotFiles(data: Seq[String], posDeletes: Seq[String],
      eqDeletes: Seq[String])

  /** Resolve the current snapshot's live files. */
  def activeFiles(spark: SparkSession, table: String): SnapshotFiles = {
    val metaPath = new Path(currentMetadata(spark, table))
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(metaPath)
    val meta = try mapper.readTree(in) finally in.close()

    val snapId = meta.path("current-snapshot-id").asLong
    require(snapId != 0 && !meta.path("current-snapshot-id").isMissingNode,
      s"no current snapshot in $metaPath")
    val snapshots = meta.path("snapshots")
    var manifestList: String = null
    snapshots.forEach { s =>
      if (s.path("snapshot-id").asLong == snapId)
        manifestList = s.path("manifest-list").asText
    }
    require(manifestList != null, s"snapshot $snapId not found in $metaPath")

    // content: manifest_file 0=data 1=deletes; data_file 0=data
    // 1=position deletes 2=equality deletes
    val data = mutable.LinkedHashSet[String]()
    val posDel = mutable.LinkedHashSet[String]()
    val eqDel = mutable.LinkedHashSet[String]()
    readAvro(spark, manifestList).foreach { mf =>
      val manifestPath = mf.get("manifest_path").toString
      readAvro(spark, manifestPath).foreach { entry =>
        val status = entry.get("status").toString.toInt // 0 EXISTING 1 ADDED 2 DELETED
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val fileContent = Option(df.get("content")).map(_.toString.toInt).getOrElse(0)
        val path = df.get("file_path").toString
        val target = fileContent match {
          case 0 => data
          case 1 => posDel
          case 2 => eqDel
          case other => throw new IllegalArgumentException(
            s"unknown iceberg data_file content $other in $manifestPath")
        }
        if (status == 2) target -= path else target += path
      }
    }
    SnapshotFiles(data.toSeq, posDel.toSeq, eqDel.toSeq)
  }

  private def normPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PathNorm.normUri(c)

  /** Distributed read of the current snapshot, v2 deletes applied. */
  def read(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = activeFiles(spark, table)
    require(files.data.nonEmpty, s"iceberg table $table has no live data files")
    val base = spark.read.option("basePath", table)
      .parquet(files.data.map(stripScheme): _*)
    if (files.posDeletes.isEmpty && files.eqDeletes.isEmpty) base
    else {
      var d = base
        .withColumn("__fp", normPath(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
      if (files.posDeletes.nonEmpty) {
        val pd = spark.read.parquet(files.posDeletes.map(stripScheme): _*)
          .select(normPath(col("file_path")).as("__dfp"), col("pos").as("__dpos"))
          .distinct()
        d = d.join(pd,
          d("__fp") === pd("__dfp") && d("__pos") === pd("__dpos"), "left_anti")
      }
      if (files.eqDeletes.nonEmpty) {
        // equality columns = the delete parquet's own columns (the spec's
        // equality_ids resolved at write time). The spec defines NULL as
        // equal to NULL here — unlike SQL join equality — so the anti-join
        // uses null-safe <=> on every key.
        val ed = spark.read.parquet(files.eqDeletes.map(stripScheme): _*)
          .dropDuplicates()
        val edAliased = ed.select(ed.columns.map(c => col(c).as(s"__eq_$c")).toSeq: _*)
        val cond = ed.columns.map(c => d(c) <=> edAliased(s"__eq_$c")).reduce(_ && _)
        d = d.join(edAliased, cond, "left_anti")
      }
      d.drop("__fp", "__pos")
    }
  }

  // ---- minimal snapshot writer (bootstrap/fixture, not full Iceberg) -----

  private val manifestEntrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":["null","int"],"default":null},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"}]}}]}""".stripMargin)

  private val manifestFileSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":["null","int"],"default":null}]}""".stripMargin)

  private def writeAvroFile(spark: SparkSession, path: String,
      schema: org.apache.avro.Schema, records: Seq[GenericRecord]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
    w.create(schema, fs.create(p, true))
    try records.foreach(w.append) finally w.close()
  }

  /** Write `df` as a fresh single-snapshot Iceberg table: data parquet +
    * one manifest + manifest list + v1.metadata.json. Enough for any
    * spec-compliant reader (including this one) to scan the snapshot; NOT
    * a transactional committer — bootstrap and fixtures only.
    */
  def writeSnapshot(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    df.write.parquet(s"$table/data")
    val dataFiles = fs.listStatus(new Path(table, "data"))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
    val entries = dataFiles.map { f =>
      val d = new org.apache.avro.generic.GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      d.put("content", 0); d.put("file_path", f); d.put("file_format", "PARQUET")
      val e = new org.apache.avro.generic.GenericData.Record(manifestEntrySchema)
      e.put("status", 1); e.put("data_file", d)
      e: GenericRecord
    }.toSeq
    writeAvroFile(spark, s"$table/metadata/m-0.avro", manifestEntrySchema, entries)
    val mf = new org.apache.avro.generic.GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", s"$table/metadata/m-0.avro"); mf.put("content", 0)
    writeAvroFile(spark, s"$table/metadata/snap-1.avro", manifestFileSchema, Seq(mf))
    val meta = s"""{"format-version":1,"current-snapshot-id":1,
      |"snapshots":[{"snapshot-id":1,"manifest-list":"$table/metadata/snap-1.avro"}]}"""
      .stripMargin
    val out = fs.create(new Path(table, "metadata/v1.metadata.json"), true)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append a v2 delete snapshot to a [[writeSnapshot]] table: position
    * deletes (spec columns `file_path` string, `pos` long) and/or
    * equality deletes (any column subset of the data schema). Writes the
    * delete parquet, a delete manifest, a new manifest list referencing
    * both manifests, and v2.metadata.json — which [[read]] then resolves
    * as the newest version. Fixture/bootstrap quality like writeSnapshot.
    */
  def appendDeletes(table: String, posDeletes: Option[DataFrame],
      eqDeletes: Option[DataFrame]): Unit = {
    require(posDeletes.nonEmpty || eqDeletes.nonEmpty, "no deletes given")
    val spark = posDeletes.orElse(eqDeletes).get.sparkSession
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def writeDeleteFiles(df: DataFrame, dir: String): Seq[String] = {
      df.write.mode("overwrite").parquet(s"$table/$dir")
      fs.listStatus(new Path(table, dir))
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted.toSeq
    }
    val posFiles = posDeletes.toSeq.flatMap { pd =>
      require(pd.columns.toSet == Set("file_path", "pos"),
        "position deletes need exactly (file_path, pos)")
      writeDeleteFiles(pd, "deletes/pos")
    }
    val eqFiles = eqDeletes.toSeq.flatMap(writeDeleteFiles(_, "deletes/eq"))

    def deleteEntry(path: String, content: Int): GenericRecord = {
      val d = new org.apache.avro.generic.GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      d.put("content", content); d.put("file_path", path); d.put("file_format", "PARQUET")
      val e = new org.apache.avro.generic.GenericData.Record(manifestEntrySchema)
      e.put("status", 1); e.put("data_file", d)
      e
    }
    val entries = posFiles.map(deleteEntry(_, 1)) ++ eqFiles.map(deleteEntry(_, 2))
    writeAvroFile(spark, s"$table/metadata/m-1.avro", manifestEntrySchema, entries)

    def manifestRef(path: String, content: Int): GenericRecord = {
      val mf = new org.apache.avro.generic.GenericData.Record(manifestFileSchema)
      mf.put("manifest_path", path); mf.put("content", content)
      mf
    }
    writeAvroFile(spark, s"$table/metadata/snap-2.avro", manifestFileSchema, Seq(
      manifestRef(s"$table/metadata/m-0.avro", 0),
      manifestRef(s"$table/metadata/m-1.avro", 1)))
    val meta = s"""{"format-version":2,"current-snapshot-id":2,
      |"snapshots":[{"snapshot-id":2,"manifest-list":"$table/metadata/snap-2.avro"}]}"""
      .stripMargin
    val out = fs.create(new Path(table, "metadata/v2.metadata.json"), true)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
