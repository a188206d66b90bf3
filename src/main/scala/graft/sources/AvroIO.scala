package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on avro + avro-mapred
  * (no spark-avro connector needed).
  *
  * The reference reads Avro via a streaming decoder
  * (core/dbio/iop/avro.go:1-135, datastream.go:1811-1856); here the read is a
  * distributed Hadoop-input-format scan: `AvroKeyInputFormat` splits container
  * files on Avro block boundaries, so a directory of large Avro files fans out
  * across executors exactly like parquet — the 100 TB path, not a driver loop.
  * The write is per-partition: each Spark partition emits one container file.
  *
  * Type surface (v1): boolean/int/long/float/double/string/bytes plus
  * date (int/date) and timestamp (long/timestamp-micros) logical types, all
  * nullable via union(null, T). Nested records/arrays are out of scope — the
  * reference flattens nested payloads to JSON strings before Avro IO anyway.
  */
object AvroIO {

  // ---- schema mapping ----------------------------------------------------

  def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType => // tz-less → avro local-timestamp-micros
          LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other =>
          throw new IllegalArgumentException(s"unsupported Avro type: $other")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base), null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  def toSparkType(s: Schema): DataType = {
    val nonNull = if (s.getType == Schema.Type.UNION) {
      val ts = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(ts.size == 1, s"only union(null, T) supported: $s")
      ts.head
    } else s
    nonNull.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (nonNull.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
        else IntegerType
      case Schema.Type.LONG =>
        nonNull.getLogicalType match {
          case _: LogicalTypes.TimestampMicros => TimestampType
          case _: LogicalTypes.TimestampMillis => TimestampType
          case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
          case _: LogicalTypes.LocalTimestampMillis => TimestampNTZType
          case _ => LongType
        }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
  }

  // ---- value conversion --------------------------------------------------

  private def timestampToMicros(ts: java.sql.Timestamp): Long = {
    val sec = Math.floorDiv(ts.getTime, 1000L)
    sec * 1000000L + ts.getNanos / 1000L
  }

  private def microsToTimestamp(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  private def localDtToMicros(ldt: java.time.LocalDateTime): Long =
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L

  private def microsToLocalDt(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)

  private def sparkToAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) => timestampToMicros(ts)
    case (ldt: java.time.LocalDateTime, TimestampNTZType) => localDtToMicros(ldt)
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (x, _) => x
  }

  private def avroToSpark(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (us: java.lang.Long, TimestampType) => microsToTimestamp(us)
    case (us: java.lang.Long, TimestampNTZType) => microsToLocalDt(us)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (bb: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (u, StringType) => if (u == null) null else u.toString
    case (x, _) => x
  }

  // ---- write -------------------------------------------------------------

  /** Write `df` as a directory of Avro container files, one per partition.
    * Deflate-compressed blocks; each file is independently splittable on read.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema, "row").toString
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val hconf = graft.util.HadoopConf(spark.sparkContext.hadoopConfiguration)
    df.rdd.foreachPartition { rows =>
      val part = org.apache.spark.TaskContext.getPartitionId()
      val schema = new Schema.Parser().parse(avroJson)
      val out = new Path(path, f"part-$part%05d.avro")
      val pfs = out.getFileSystem(hconf.value)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(schema, pfs.create(out, true))
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, sparkToAvro(row.get(i), sparkSchema(i).dataType))
          i += 1
        }
        w.append(rec)
      } finally w.close()
    }
  }

  // ---- read --------------------------------------------------------------

  /** Distributed Avro scan: schema from the first file footer (driver), data
    * via `AvroKeyInputFormat` (block-split across executors).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
      .headOption.getOrElse(throw new java.io.FileNotFoundException(s"no .avro in $path"))
    val in = fs.open(first)
    val avroSchema = try {
      new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
    } finally in.close()
    val sparkSchema = StructType(avroSchema.getFields.asScala.toSeq.map { f =>
      StructField(f.name(), toSparkType(f.schema()), nullable = true)
    })

    val rdd = spark.sparkContext.newAPIHadoopFile(
      s"$path/*.avro",
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val rows = rdd.map { case (k, _) =>
      // convert in place: Hadoop record readers reuse the key object
      val rec = k.datum()
      Row.fromSeq(sparkSchema.fields.toSeq.zipWithIndex.map { case (f, i) =>
        avroToSpark(rec.get(i), f.dataType)
      })
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
