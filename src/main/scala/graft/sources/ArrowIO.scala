package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC (Feather v2) file source/sink on arrow-vector directly — Spark
  * ships the Arrow jars for its Python interop but has no `format("arrow")`.
  *
  * The reference streams Arrow IPC record batches (core/dbio/iop/arrow.go,
  * datastream.go:1596-1726). Here: one IPC file per Spark partition on write
  * (4096-row record batches, the unit of columnar exchange), and on read one
  * task per file with batch-at-a-time conversion — a directory of files fans
  * out across executors; batch granularity keeps peak memory bounded
  * regardless of file size.
  *
  * Type surface matches AvroIO: numeric/bool/string/binary + date/timestamp.
  */
object ArrowIO {

  private val BatchRows = 4096

  // ---- schema mapping ----------------------------------------------------

  def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case DateType => new ArrowType.Date(DateUnit.DAY)
      // Arrow convention: timezone-present = instant, null timezone = naive
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case other => throw new IllegalArgumentException(s"unsupported Arrow type: $other")
    }
    new Field(f.name, FieldType.nullable(t), null)
  }

  def toSparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Date => DateType
    case t: ArrowType.Timestamp =>
      if (t.getTimezone == null) TimestampNTZType else TimestampType
    case other => throw new IllegalArgumentException(s"unsupported Arrow type: $other")
  }

  // ---- value conversion --------------------------------------------------

  private def setCell(v: FieldVector, i: Int, value: Any, dt: DataType): Unit =
    if (value == null) v.asInstanceOf[BaseValueVector with FieldVector] match {
      case vv: BigIntVector => vv.setNull(i)
      case vv: IntVector => vv.setNull(i)
      case vv: Float8Vector => vv.setNull(i)
      case vv: Float4Vector => vv.setNull(i)
      case vv: BitVector => vv.setNull(i)
      case vv: VarCharVector => vv.setNull(i)
      case vv: VarBinaryVector => vv.setNull(i)
      case vv: DateDayVector => vv.setNull(i)
      case vv: TimeStampMicroTZVector => vv.setNull(i)
      case vv: TimeStampMicroVector => vv.setNull(i)
      case other => throw new IllegalArgumentException(s"$other")
    } else (v, dt) match {
      case (vv: BigIntVector, _) => vv.setSafe(i, value.asInstanceOf[Long])
      case (vv: IntVector, _) => vv.setSafe(i, value.asInstanceOf[Int])
      case (vv: Float8Vector, _) => vv.setSafe(i, value.asInstanceOf[Double])
      case (vv: Float4Vector, _) => vv.setSafe(i, value.asInstanceOf[Float])
      case (vv: BitVector, _) => vv.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (vv: VarCharVector, _) =>
        vv.setSafe(i, value.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
      case (vv: VarBinaryVector, _) => vv.setSafe(i, value.asInstanceOf[Array[Byte]])
      case (vv: DateDayVector, _) =>
        vv.setSafe(i, value.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
      case (vv: TimeStampMicroTZVector, _) =>
        val ts = value.asInstanceOf[java.sql.Timestamp]
        vv.setSafe(i, Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      case (vv: TimeStampMicroVector, _) =>
        val ldt = value.asInstanceOf[java.time.LocalDateTime]
        vv.setSafe(i, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
      case (other, _) => throw new IllegalArgumentException(s"$other")
    }

  private def getCell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case vv: BigIntVector => vv.get(i)
      case vv: IntVector => vv.get(i)
      case vv: Float8Vector => vv.get(i)
      case vv: Float4Vector => vv.get(i)
      case vv: BitVector => vv.get(i) == 1
      case vv: VarCharVector => new String(vv.get(i), StandardCharsets.UTF_8)
      case vv: VarBinaryVector => vv.get(i)
      case vv: DateDayVector =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(vv.get(i).toLong))
      case vv: TimeStampMicroTZVector =>
        val us = vv.get(i)
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case vv: TimeStampMicroVector =>
        val us = vv.get(i)
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(s"$other")
    }

  // ---- write -------------------------------------------------------------

  /** One Arrow IPC file per partition, record batches of [[BatchRows]]. */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val hconf = graft.util.HadoopConf(spark.sparkContext.hadoopConfiguration)
    df.rdd.foreachPartition { rows =>
      val part = org.apache.spark.TaskContext.getPartitionId()
      val out = new Path(path, f"part-$part%05d.arrow")
      val pfs = out.getFileSystem(hconf.value)
      val arrowSchema = new ArrowSchema(
        sparkSchema.fields.map(toArrowField).toList.asJava)
      val alloc = new RootAllocator()
      val root = VectorSchemaRoot.create(arrowSchema, alloc)
      val os = pfs.create(out, true)
      val w = new ArrowFileWriter(root, null, Channels.newChannel(os))
      try {
        w.start()
        val vecs = root.getFieldVectors.asScala.toArray
        var n = 0
        rows.foreach { row =>
          var c = 0
          while (c < vecs.length) {
            setCell(vecs(c), n, row.get(c), sparkSchema(c).dataType); c += 1
          }
          n += 1
          if (n == BatchRows) {
            root.setRowCount(n); w.writeBatch(); root.allocateNew(); n = 0
          }
        }
        if (n > 0) { root.setRowCount(n); w.writeBatch() }
        w.end()
      } finally { w.close(); root.close(); alloc.close(); os.close() }
    }
  }

  /** Arrow STREAM format (.arrows): same record batches without the footer
    * index — the wire form for pipes/sockets. One file per partition.
    */
  def writeStream(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val spark = df.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val hconf = graft.util.HadoopConf(spark.sparkContext.hadoopConfiguration)
    df.rdd.foreachPartition { rows =>
      val part = org.apache.spark.TaskContext.getPartitionId()
      val out = new Path(path, f"part-$part%05d.arrows")
      val pfs = out.getFileSystem(hconf.value)
      val arrowSchema = new ArrowSchema(
        sparkSchema.fields.map(toArrowField).toList.asJava)
      val alloc = new RootAllocator()
      val root = VectorSchemaRoot.create(arrowSchema, alloc)
      val os = pfs.create(out, true)
      val w = new ArrowStreamWriter(root, null, Channels.newChannel(os))
      try {
        w.start()
        val vecs = root.getFieldVectors.asScala.toArray
        var n = 0
        rows.foreach { row =>
          var c = 0
          while (c < vecs.length) {
            setCell(vecs(c), n, row.get(c), sparkSchema(c).dataType); c += 1
          }
          n += 1
          if (n == BatchRows) {
            root.setRowCount(n); w.writeBatch(); root.allocateNew(); n = 0
          }
        }
        if (n > 0) { root.setRowCount(n); w.writeBatch() }
        w.end()
      } finally { w.close(); root.close(); alloc.close(); os.close() }
    }
  }

  /** Distributed stream-format read: one task per .arrows file. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".arrows")).map(_.toString).sorted
    require(files.nonEmpty, s"no .arrows files in $path")

    val sparkSchema = {
      val alloc = new RootAllocator()
      val r = new ArrowStreamReader(fs.open(new Path(files.head)), alloc)
      try StructType(r.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(f => StructField(f.getName, toSparkType(f), nullable = true)))
      finally { r.close(); alloc.close() }
    }

    val hconf = graft.util.HadoopConf(spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .mapPartitions { paths =>
        paths.flatMap { fp =>
          val fpath = new Path(fp)
          val pfs = fpath.getFileSystem(hconf.value)
          val alloc = new RootAllocator()
          val reader = new ArrowStreamReader(pfs.open(fpath), alloc)
          val root = reader.getVectorSchemaRoot
          // a partially consumed iterator (limit/take, task abort) would
          // otherwise leak Arrow direct memory — close on task end too
          var closed = false
          def closeAll(): Unit = if (!closed) {
            closed = true; reader.close(); alloc.close()
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))
          new Iterator[Row] {
            private var inBatch = 0
            private var batchRows = 0
            private var done = false
            private def advance(): Unit =
              while (!done && inBatch >= batchRows) {
                if (reader.loadNextBatch()) { batchRows = root.getRowCount; inBatch = 0 }
                else { done = true; closeAll() }
              }
            override def hasNext: Boolean = { advance(); !done }
            override def next(): Row = {
              advance()
              val vecs = root.getFieldVectors
              val vals = new Array[Any](vecs.size())
              var c = 0
              while (c < vals.length) { vals(c) = getCell(vecs.get(c), inBatch); c += 1 }
              inBatch += 1
              Row.fromSeq(vals.toSeq)
            }
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  // ---- read --------------------------------------------------------------

  /** SeekableByteChannel over a Hadoop stream, so the reader works on any
    * Hadoop filesystem (local, HDFS, object stores), not just local files.
    */
  private final class HadoopChannel(in: FSDataInputStream, len: Long)
      extends SeekableByteChannel {
    private var closed = false
    override def read(dst: ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def write(src: ByteBuffer): Int = throw new UnsupportedOperationException
    override def position(): Long = in.getPos
    override def position(newPosition: Long): SeekableByteChannel = {
      in.seek(newPosition); this
    }
    override def size(): Long = len
    override def truncate(size: Long): SeekableByteChannel =
      throw new UnsupportedOperationException
    override def isOpen: Boolean = !closed
    override def close(): Unit = { closed = true; in.close() }
  }

  /** Distributed read: one task per IPC file, batch-at-a-time conversion. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".arrow")).map(_.toString).sorted
    require(files.nonEmpty, s"no .arrow files in $path")

    // schema from the first file's footer
    val sparkSchema = {
      val alloc = new RootAllocator()
      val ch = new HadoopChannel(fs.open(new Path(files.head)),
        fs.getFileStatus(new Path(files.head)).getLen)
      val r = new ArrowFileReader(ch, alloc)
      try StructType(r.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(f => StructField(f.getName, toSparkType(f), nullable = true)))
      finally { r.close(); alloc.close() }
    }

    val hconf = graft.util.HadoopConf(spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .mapPartitions { paths =>
        paths.flatMap { fp =>
          val fpath = new Path(fp)
          val pfs = fpath.getFileSystem(hconf.value)
          val alloc = new RootAllocator()
          val reader = new ArrowFileReader(
            new HadoopChannel(pfs.open(fpath), pfs.getFileStatus(fpath).getLen), alloc)
          val root = reader.getVectorSchemaRoot
          // close on task end as well as exhaustion — limit/take or an
          // aborted task must not leak Arrow direct memory
          var closed = false
          def closeAll(): Unit = if (!closed) {
            closed = true; reader.close(); alloc.close()
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))
          new Iterator[Row] {
            private var inBatch = 0
            private var batchRows = 0
            private var done = false
            private def advance(): Unit =
              while (!done && inBatch >= batchRows) {
                if (reader.loadNextBatch()) { batchRows = root.getRowCount; inBatch = 0 }
                else { done = true; closeAll() }
              }
            override def hasNext: Boolean = { advance(); !done }
            override def next(): Row = {
              advance()
              val vecs = root.getFieldVectors
              val vals = new Array[Any](vecs.size())
              var c = 0
              while (c < vals.length) { vals(c) = getCell(vecs.get(c), inBatch); c += 1 }
              inBatch += 1
              Row.fromSeq(vals.toSeq)
            }
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
