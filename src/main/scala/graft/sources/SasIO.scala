package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SAS7BDAT source/sink implemented from the publicly documented binary
  * layout (the community-reverse-engineered sas7bdat spec, as realized by
  * the open-source parso / readstat / pandas readers).
  *
  * The reference reads SAS files via the public `kshedden/datareader` Go
  * library (core/dbio/iop/sas7bdat.go:26-46, datastream.go:1857-1902) and
  * exposes exactly two column types: SAS numeric -> float, SAS string ->
  * string (sas7bdat.go:55-58). This mirrors that surface: every numeric
  * column is DoubleType, every character column StringType.
  *
  * Format recap (byte 37 selects endianness: 0x01 little, 0x00 big —
  * SPARC/AIX exports; all multi-byte integers and doubles follow it, r7):
  *   - 32-byte magic, alignment markers at bytes 32/35 (0x33 => u64 layout
  *     with 8-byte integers), endianness byte at 37.
  *   - header length / page size / page count at 196/200/204 (+align1).
  *   - fixed-size pages follow the header. Page header (after a 16-byte
  *     32-bit / 32-byte u64 prefix): type u16, block count u16, subheader
  *     count u16; subheader pointers start 8 bytes in. Pointer = offset,
  *     length (int-size each), compression u8, type u8.
  *   - meta subheaders by signature: row-size F7F7F7F7 (row length at
  *     5*intLen past the signature, total rows at 6*intLen, mix-page rows
  *     at 15*intLen), column-size F6F6F6F6, column-text FDFFFFFF (u16 blob
  *     size; the blob holds the compression literal and all name strings),
  *     column-name FFFFFFFF (8-byte entries: text-idx/offset/len u16s),
  *     column-attrs FCFFFFFF (entries: row offset intLen, width u32,
  *     pad u16, type u8: 1=numeric 2=char).
  *   - rows: uncompressed on data pages (type 0x100; after the pointer
  *     area) and mix pages (type 0x200; 8-aligned after the pointers), or
  *     RLE-compressed ("SASYZCRL") one-row-per-subheader on meta pages.
  *   - numerics are IEEE doubles, possibly truncated to the 3..8 most
  *     significant bytes; NaN means SQL NULL. Strings are fixed-width,
  *     space-padded; all-blank means NULL.
  *
  * Scale design: the driver parses only the metadata page prefix (SAS
  * writes all meta subheaders before the first row). Row extraction is
  * distributed: page indices are range-partitioned and each task seeks to
  * its own pages, so a directory of large files fans out across executors
  * exactly like ArrowIO. Pages are self-contained (compression never spans
  * a page), which is what makes the format splittable at page granularity.
  *
  * The writer exists for fixtures and modest exports; it is driver-side
  * single-file, like the reference's own single-stream SAS path.
  */
object SasIO {

  // 32-byte magic shared by every sas7bdat file (public constant).
  val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  private val SigRowSize = 0xf7f7f7f7
  private val SigColSize = 0xf6f6f6f6
  private val SigCounts = 0xfffffc00
  private val SigColText = 0xfffffffd
  private val SigColName = 0xffffffff
  private val SigColAttr = 0xfffffffc
  private val SigFormat = 0xfffbfffe
  private val SigColList = 0xfffffffe

  private val MetaSigs = Set(SigRowSize, SigColSize, SigCounts, SigColText,
    SigColName, SigColAttr, SigFormat, SigColList)

  private val RleLiteral = "SASYZCRL"
  private val RdcLiteral = "SASYZCR2"

  private val PageMeta = 0x0000
  private val PageData = 0x0100
  private val PageMix = 0x0200
  private val PageAmd = 0x0400

  final case class SasColumn(name: String, rowOffset: Int, width: Int, isNum: Boolean)

  final case class SasMeta(
      u64: Boolean,
      headerLen: Int,
      pageLen: Int,
      pageCount: Long,
      rowLen: Int,
      rowCount: Long,
      mixRowCount: Long,
      compressed: Boolean,
      rdc: Boolean,
      cols: Seq[SasColumn],
      be: Boolean = false) {
    def intLen: Int = if (u64) 8 else 4
    def bitOffset: Int = if (u64) 32 else 16
    def ptrLen: Int = if (u64) 24 else 12
    def schema: StructType = StructType(cols.map(c =>
      StructField(c.name, if (c.isNum) DoubleType else StringType, nullable = true)))
  }

  // ---- metadata parse ----------------------------------------------------

  private def u16(b: Array[Byte], off: Int, be: Boolean = false): Int =
    if (be) (((b(off) & 0xff) << 8) | (b(off + 1) & 0xff))
    else ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8))

  private def u32(b: Array[Byte], off: Int, be: Boolean = false): Long =
    if (be)
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    else
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def i64(b: Array[Byte], off: Int, be: Boolean = false): Long =
    ByteBuffer.wrap(b, off, 8)
      .order(if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN).getLong

  private def intAt(b: Array[Byte], off: Int, u64: Boolean, be: Boolean = false): Long =
    if (u64) i64(b, off, be) else u32(b, off, be)

  def readMeta(header: Array[Byte], pageAt: Long => Array[Byte]): SasMeta = {
    require(header.length >= 1024, "file shorter than a sas7bdat header")
    require(header.take(32).sameElements(Magic), "not a sas7bdat file (bad magic)")
    val u64 = (header(32) & 0xff) == 0x33
    val align1 = if ((header(35) & 0xff) == 0x33) 4 else 0
    // endianness byte: 0x01 little, 0x00 big (SPARC/AIX exports); all
    // multi-byte integers and doubles follow it. Signatures are compared
    // after an endian-aware read, so the same constants match both.
    val endByte = header(37) & 0xff
    require(endByte == 0x00 || endByte == 0x01,
      s"bad sas7bdat endianness byte $endByte")
    val be = endByte == 0x00
    val headerLen = u32(header, 196 + align1, be).toInt
    val pageLen = u32(header, 200 + align1, be).toInt
    val pageCount = u32(header, 204 + align1, be)
    val intLen = if (u64) 8 else 4
    val bitOffset = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12

    var rowLen, rowCount, mixRows = 0L
    var colCount = 0
    var compressed = false
    var rdc = false
    val textBlobs = ArrayBuffer[Array[Byte]]()
    val names = ArrayBuffer[(Int, Int, Int)]() // textIdx, offset, length
    val attrs = ArrayBuffer[(Long, Int, Int)]() // rowOffset, width, type

    var page = 0L
    var done = false
    while (page < pageCount && !done) {
      val pg = pageAt(page)
      val ptype = u16(pg, bitOffset, be)
      val subCount = u16(pg, bitOffset + 4, be)
      if ((ptype & PageData) != 0) done = true // pure data page: meta prefix over
      else {
        var i = 0
        while (i < subCount) {
          val p = bitOffset + 8 + i * ptrLen
          val off = intAt(pg, p, u64, be).toInt
          val len = intAt(pg, p + intLen, u64, be).toInt
          val comp = pg(p + 2 * intLen) & 0xff
          val stype = pg(p + 2 * intLen + 1) & 0xff
          // data-row subheaders (compressed files) are marked type=1 /
          // comp=4 in the POINTER — classify by that, never by content
          // bytes, or a row whose data collides with a meta signature
          // would corrupt the metadata parse
          if (len > 0 && comp != 4 && stype != 1) {
            // u64 signatures are sign-extended to 8 bytes: the 4-byte sig
            // sits in the low half — first on LE, LAST on BE (where the
            // high half reads 0xffffffff and would shadow SigColName)
            val sig = u32(pg, if (u64 && be) off + 4 else off, be).toInt
            val sig2 = if (u64 && !MetaSigs.contains(sig))
              u32(pg, if (be) off else off + 4, be).toInt else sig
            sig2 match {
              case SigRowSize =>
                rowLen = intAt(pg, off + 5 * intLen, u64, be)
                rowCount = intAt(pg, off + 6 * intLen, u64, be)
                mixRows = intAt(pg, off + 15 * intLen, u64, be)
              case SigColSize =>
                colCount = intAt(pg, off + intLen, u64, be).toInt
              case SigColText =>
                val size = u16(pg, off + intLen, be)
                val blob = java.util.Arrays.copyOfRange(pg, off + intLen, off + intLen + size)
                if (textBlobs.isEmpty) {
                  val head = new String(blob, 0, math.min(16, blob.length), StandardCharsets.US_ASCII)
                  if (head.contains(RleLiteral)) compressed = true
                  else if (head.contains(RdcLiteral)) { compressed = true; rdc = true }
                }
                textBlobs += blob
              case SigColName =>
                val n = (len - 2 * intLen - 12) / 8
                var j = 0
                while (j < n) {
                  val e = off + intLen + 8 + j * 8
                  names += ((u16(pg, e, be), u16(pg, e + 2, be), u16(pg, e + 4, be)))
                  j += 1
                }
              case SigColAttr =>
                val entry = intLen + 8
                val n = (len - 2 * intLen - 12) / entry
                var j = 0
                while (j < n) {
                  val e = off + intLen + 8 + j * entry
                  attrs += ((intAt(pg, e, u64, be), u32(pg, e + intLen, be).toInt,
                    pg(e + intLen + 6) & 0xff))
                  j += 1
                }
              case _ => () // counts/format/list/row subheaders: not needed for meta
            }
          }
          i += 1
        }
        // SAS emits all meta subheaders before the first row, so once the
        // set is complete the driver can stop — only the prefix is read.
        if (rowLen > 0 && colCount > 0 && names.size >= colCount &&
          attrs.size >= colCount && textBlobs.nonEmpty) done = true
      }
      page += 1
    }

    require(colCount > 0 && names.size >= colCount && attrs.size >= colCount,
      s"incomplete sas7bdat metadata: cols=$colCount names=${names.size} attrs=${attrs.size}")

    val cols = (0 until colCount).map { i =>
      val (tIdx, tOff, tLen) = names(i)
      val blob = textBlobs(tIdx)
      val name = new String(blob, tOff, tLen, StandardCharsets.UTF_8).trim
      val (rOff, width, tpe) = attrs(i)
      SasColumn(name, rOff.toInt, width, tpe == 1)
    }
    SasMeta(u64, headerLen, pageLen, pageCount, rowLen.toInt, rowCount,
      mixRows, compressed, rdc, cols, be)
  }

  // ---- row decode --------------------------------------------------------

  /** Truncated IEEE double: the stored bytes are the most-significant bytes
    * of the 8-byte representation (widths 3..8) — the trailing bytes of the
    * little-endian form, the leading bytes of the big-endian form. */
  def decodeNumeric(row: Array[Byte], off: Int, width: Int, be: Boolean = false): Any = {
    val full = new Array[Byte](8)
    System.arraycopy(row, off, full, if (be) 0 else 8 - width, width)
    val d = ByteBuffer.wrap(full)
      .order(if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN).getDouble
    if (java.lang.Double.isNaN(d)) null else d
  }

  private def decodeRow(meta: SasMeta, page: Array[Byte], off: Int): Row = {
    val vals = new Array[Any](meta.cols.length)
    var i = 0
    while (i < meta.cols.length) {
      val c = meta.cols(i)
      vals(i) =
        if (c.isNum) decodeNumeric(page, off + c.rowOffset, c.width, meta.be)
        else {
          var end = off + c.rowOffset + c.width
          val start = off + c.rowOffset
          while (end > start && (page(end - 1) == ' '.toByte || page(end - 1) == 0)) end -= 1
          if (end == start) null
          else new String(page, start, end - start, StandardCharsets.UTF_8)
        }
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** All rows stored on one page: plain rows on data/mix pages, one-row
    * RLE subheaders on meta pages of compressed files. */
  def pageRows(meta: SasMeta, pg: Array[Byte]): Iterator[Row] = {
    val ptype = u16(pg, meta.bitOffset, meta.be)
    val blockCount = u16(pg, meta.bitOffset + 2, meta.be)
    val subCount = u16(pg, meta.bitOffset + 4, meta.be)
    val ptrBase = meta.bitOffset + 8

    val subRows: Iterator[Row] =
      if (subCount == 0 || !meta.compressed) Iterator.empty
      else (0 until subCount).iterator.flatMap { i =>
        val p = ptrBase + i * meta.ptrLen
        val off = intAt(pg, p, meta.u64, meta.be).toInt
        val len = intAt(pg, p + meta.intLen, meta.u64, meta.be).toInt
        val compression = pg(p + 2 * meta.intLen) & 0xff
        val stype = pg(p + 2 * meta.intLen + 1) & 0xff
        // rows are identified by the POINTER's type/compression flags
        // (comp=4 RLE row, comp=0+type=1 raw row), never by sniffing the
        // content for meta signatures — row bytes may collide with one
        if (len <= 0 || compression == 1) None // truncated pointer
        else if (compression == 4)
          Some(decodeRow(meta,
            if (meta.rdc) Rdc.decompress(pg, off, len, meta.rowLen)
            else Rle.decompress(pg, off, len, meta.rowLen), 0))
        else if (compression == 0 && stype == 1 && len == meta.rowLen)
          Some(decodeRow(meta, pg, off)) // stored raw: compression didn't help
        else None // meta subheader
      }

    val plainRows: Iterator[Row] =
      if ((ptype & (PageData | PageMix)) == 0) Iterator.empty
      else {
        var base = ptrBase + subCount * meta.ptrLen
        val n =
          if ((ptype & PageMix) != 0) {
            base = base + ((8 - base % 8) % 8) // mix rows are 8-aligned
            math.min(meta.mixRowCount, ((pg.length - base) / meta.rowLen).toLong).toInt
          } else blockCount - subCount
        (0 until n).iterator.map(r => decodeRow(meta, pg, base + r * meta.rowLen))
      }

    subRows ++ plainRows
  }

  // ---- distributed read --------------------------------------------------

  def read(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".sas7bdat"))
          .map(_.getPath.toString).sorted
      else Seq(path)
    require(files.nonEmpty, s"no .sas7bdat files at $path")

    // Driver: parse each file's meta prefix only (page 1 in practice).
    val metas: Seq[(String, SasMeta)] = files.map { f =>
      val in = new Path(f).getFileSystem(hconf).open(new Path(f))
      try {
        val header = new Array[Byte](1024)
        in.readFully(0, header)
        val align1 = if ((header(35) & 0xff) == 0x33) 4 else 0
        val beH = (header(37) & 0xff) == 0x00
        val headerLen = u32(header, 196 + align1, beH).toInt
        val pageLen = u32(header, 200 + align1, beH).toInt
        f -> readMeta(header, { i =>
          val pg = new Array[Byte](pageLen)
          in.readFully(headerLen + i * pageLen, pg)
          pg
        })
      } finally in.close()
    }
    val schema = metas.head._2.schema
    require(metas.forall(_._2.schema == schema),
      "sas7bdat files in one directory must share a schema")

    // Split each file's page range into tasks; executors seek independently.
    val parallelism = spark.sparkContext.defaultParallelism
    val slices: Seq[(String, SasMeta, Long, Long)] = metas.flatMap { case (f, m) =>
      val per = math.max(1L, m.pageCount / math.max(1, parallelism))
      (0L until m.pageCount by per).map(s => (f, m, s, math.min(m.pageCount, s + per)))
    }
    val hconfX = graft.util.HadoopConf(spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .parallelize(slices, math.max(1, slices.length))
      .flatMap { case (f, m, from, until) =>
        val in = new Path(f)
          .getFileSystem(hconfX.value)
          .open(new Path(f))
        var closed = false
        def closeIn(): Unit = if (!closed) { closed = true; in.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeIn()))
        val pg = new Array[Byte](m.pageLen)
        (from until until).iterator.flatMap { i =>
          in.readFully(m.headerLen + i * m.pageLen, pg)
          pageRows(m, pg)
        } ++ { closeIn(); Iterator.empty }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- writer ------------------------------------------------------------

  /** Single-file writer (fixtures + exports). Emits the 32-bit or u64
    * little-endian layout; `compress` stores every row as an RLE subheader.
    * Collects driver-side (sas7bdat is inherently a single file), so the
    * cap is probed BEFORE collecting — same pattern as `ExcelIO.write`. */
  def write(df: DataFrame, path: String, u64: Boolean = false,
      compress: Boolean = false, pageLen: Int = 0x10000,
      maxRows: Int = 5_000_000, codec: String = "rle",
      be: Boolean = false): Unit = {
    require(codec == "rle" || codec == "rdc", s"bad sas codec $codec")
    val order = if (be) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    def u16b(v: Int): Array[Byte] =
      if (be) Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      else Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32b(v: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4).order(order); b.putInt(v); b.array()
    }
    val schema = df.schema
    schema.fields.foreach { f =>
      require(f.dataType == DoubleType || f.dataType == StringType,
        s"SAS writer surface is numeric(double)/char(string); cast ${f.name}: ${f.dataType} first")
    }
    // cap-guarded single evaluation: collect at most maxRows+1 rows (the
    // +1 detects overflow) rather than a separate count job that would run
    // the upstream plan twice
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"sas7bdat writer cap: > $maxRows rows; route to a splittable format")
    val intLen = if (u64) 8 else 4
    val bitOffset = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12
    val headerLen = if (u64) 8192 else 1024

    // fixed-width layout: doubles 8 bytes; strings max observed width (>=1)
    val widths = schema.fields.zipWithIndex.map { case (f, i) =>
      if (f.dataType == DoubleType) 8
      else math.max(1, rows.iterator.map { r =>
        if (r.isNullAt(i)) 0 else r.getString(i).getBytes(StandardCharsets.UTF_8).length
      }.foldLeft(0)(math.max))
    }
    val offsets = widths.scanLeft(0)(_ + _)
    val rowLen = offsets.last
    // a page must hold at least one row (plus its pointer in the
    // compressed layout) — auto-grow the page size for very wide rows
    // instead of overrunning the page buffer
    val needed = bitOffset + 8 + ptrLen + rowLen + 512
    val effPageLen =
      if (needed <= pageLen) pageLen else ((needed + 4095) / 4096) * 4096

    def encodeRow(r: Row): Array[Byte] = {
      val b = new Array[Byte](rowLen)
      var i = 0
      while (i < widths.length) {
        if (schema(i).dataType == DoubleType) {
          val d = if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
          ByteBuffer.wrap(b, offsets(i), 8).order(order).putDouble(d)
        } else {
          java.util.Arrays.fill(b, offsets(i), offsets(i) + widths(i), ' '.toByte)
          if (!r.isNullAt(i)) {
            val s = r.getString(i).getBytes(StandardCharsets.UTF_8)
            System.arraycopy(s, 0, b, offsets(i), s.length)
          }
        }
        i += 1
      }
      b
    }

    // ---- text blob: [u16 size][pad2][8-byte compression literal][names...]
    val nameBytes = schema.fields.map(_.name.getBytes(StandardCharsets.UTF_8))
    val blobBody = ArrayBuffer[Byte]()
    blobBody ++= Array.fill[Byte](2)(0) // placeholder for size
    blobBody ++= Array.fill[Byte](2)(0)
    val lit =
      if (!compress) "        "
      else if (codec == "rdc") RdcLiteral else RleLiteral
    blobBody ++= lit.getBytes(StandardCharsets.US_ASCII)
    val nameRefs = nameBytes.map { nb =>
      val off = blobBody.length
      blobBody ++= nb
      while (blobBody.length % 4 != 0) blobBody += ' '.toByte
      (0, off, nb.length)
    }
    val blobSize = blobBody.length
    val sizeB = u16b(blobSize)
    blobBody(0) = sizeB(0)
    blobBody(1) = sizeB(1)

    def sig64(s: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(if (u64) 8 else 4).order(order)
      if (u64) b.putLong(s.toLong) else b.putInt(s) // putLong sign-extends
      b.array()
    }
    def intBytes(v: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(intLen).order(order)
      if (u64) b.putLong(v) else b.putInt(v.toInt)
      b.array()
    }

    def rowSizeSub(totalRows: Long): Array[Byte] = {
      val len = if (u64) 808 else 480
      val b = new Array[Byte](len)
      System.arraycopy(sig64(SigRowSize), 0, b, 0, intLen)
      System.arraycopy(intBytes(rowLen.toLong), 0, b, 5 * intLen, intLen)
      System.arraycopy(intBytes(totalRows), 0, b, 6 * intLen, intLen)
      System.arraycopy(intBytes(0L), 0, b, 15 * intLen, intLen) // no mix rows
      b
    }
    def colSizeSub: Array[Byte] = {
      val b = new Array[Byte](3 * intLen)
      System.arraycopy(sig64(SigColSize), 0, b, 0, intLen)
      System.arraycopy(intBytes(schema.length.toLong), 0, b, intLen, intLen)
      b
    }
    def colTextSub: Array[Byte] = sig64(SigColText) ++ blobBody
    def colNameSub: Array[Byte] = {
      val b = ArrayBuffer[Byte]()
      b ++= sig64(SigColName)
      b ++= Array.fill[Byte](8)(0)
      nameRefs.foreach { case (ti, off, len) =>
        b ++= u16b(ti); b ++= u16b(off); b ++= u16b(len)
        b ++= Array[Byte](0, 0)
      }
      b ++= Array.fill[Byte](2 * intLen + 12 - intLen - 8)(0) // trailer so count math is exact
      b.toArray
    }
    def colAttrSub: Array[Byte] = {
      val b = ArrayBuffer[Byte]()
      b ++= sig64(SigColAttr)
      b ++= Array.fill[Byte](8)(0)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        b ++= intBytes(offsets(i).toLong)
        b ++= u32b(widths(i))
        b ++= Array[Byte](0, 0, if (f.dataType == DoubleType) 1 else 2, 0)
      }
      b ++= Array.fill[Byte](2 * intLen + 12 - intLen - 8)(0)
      b.toArray
    }

    // ---- page assembly: pointers grow forward, content grows backward
    final class PageBuilder(ptype: Int) {
      val buf = new Array[Byte](effPageLen)
      private var nPtr = 0
      private var tail = effPageLen
      private var rows = 0
      def freeFor(len: Int): Boolean =
        bitOffset + 8 + (nPtr + 1) * ptrLen <= tail - len
      def addSub(content: Array[Byte], compression: Int, stype: Int): Unit = {
        tail -= content.length
        System.arraycopy(content, 0, buf, tail, content.length)
        val p = bitOffset + 8 + nPtr * ptrLen
        System.arraycopy(intBytes(tail.toLong), 0, buf, p, intLen)
        System.arraycopy(intBytes(content.length.toLong), 0, buf, p + intLen, intLen)
        buf(p + 2 * intLen) = compression.toByte
        buf(p + 2 * intLen + 1) = stype.toByte
        nPtr += 1
      }
      def rowCapacity: Int = (effPageLen - (bitOffset + 8)) / rowLen
      def addRow(r: Array[Byte]): Unit = {
        System.arraycopy(r, 0, buf, bitOffset + 8 + rows * rowLen, rowLen)
        rows += 1
      }
      def rowsAdded: Int = rows
      def finish(): Array[Byte] = {
        def put16(at: Int, v: Int): Unit = {
          val vb = u16b(v); buf(at) = vb(0); buf(at + 1) = vb(1)
        }
        put16(bitOffset, ptype)
        put16(bitOffset + 2, nPtr + rows)
        put16(bitOffset + 4, nPtr)
        buf
      }
    }

    val pages = ArrayBuffer[Array[Byte]]()
    val metaPage = new PageBuilder(PageMeta)
    Seq(rowSizeSub(rows.length.toLong), colSizeSub, colTextSub, colNameSub, colAttrSub)
      .foreach(metaPage.addSub(_, 0, 0))

    if (compress) {
      var current = metaPage
      rows.foreach { r =>
        val enc = encodeRow(r)
        val packed =
          if (codec == "rdc") Rdc.compress(enc) else Rle.compress(enc)
        val (content, comp) =
          if (packed.length < enc.length) (packed, 4) else (enc, 0)
        if (!current.freeFor(content.length)) {
          pages += current.finish(); current = new PageBuilder(PageMeta)
        }
        current.addSub(content, comp, 1)
      }
      pages += current.finish()
    } else {
      pages += metaPage.finish()
      var current: PageBuilder = null
      rows.foreach { r =>
        if (current == null || current.rowsAdded == current.rowCapacity) {
          if (current != null) pages += current.finish()
          current = new PageBuilder(PageData)
        }
        current.addRow(encodeRow(r))
      }
      if (current != null) pages += current.finish()
    }

    // ---- header
    val header = new Array[Byte](headerLen)
    System.arraycopy(Magic, 0, header, 0, 32)
    val mark: Byte = if (u64) 0x33 else 0x22
    header(32) = mark; header(35) = mark
    header(37) = if (be) 0x00 else 0x01
    header(39) = '1'  // unix
    header(70) = 20   // utf-8
    java.util.Arrays.fill(header, 92, 156, ' '.toByte)
    System.arraycopy("GRAFT".getBytes(StandardCharsets.US_ASCII), 0, header, 92, 5)
    System.arraycopy("DATA    ".getBytes(StandardCharsets.US_ASCII), 0, header, 156, 8)
    val a1 = if (u64) 4 else 0
    val hb = ByteBuffer.wrap(header).order(order)
    hb.putInt(196 + a1, headerLen)
    hb.putInt(200 + a1, effPageLen)
    hb.putInt(204 + a1, pages.length)

    val fs = new Path(path).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(path), true)
    try { out.write(header); pages.foreach(out.write) } finally out.close()
  }

  // ---- RLE codec (SASYZCRL) ---------------------------------------------

  /** SAS char-compression RLE, per the public spec command table: control
    * byte high nibble = command, low nibble = length bits.
    *   0 copy (nib<<8)+next+64 literal bytes      8 copy nib+1 literal
    *   4 repeat following byte (nib<<8)+next+18   9/A/B copy nib+17/33/49
    *   5 repeat '@' (nib<<8)+next+17              C repeat next byte nib+3
    *   6 repeat ' ' (nib<<8)+next+17              D repeat '@' nib+2
    *   7 repeat 0  (nib<<8)+next+17               E repeat ' ' nib+2
    *                                              F repeat 0 nib+2 */
  object Rle {
    def decompress(src: Array[Byte], srcOff: Int, srcLen: Int, outLen: Int): Array[Byte] = {
      val out = new Array[Byte](outLen)
      var s = srcOff
      val end = srcOff + srcLen
      var o = 0
      while (s < end && o < outLen) {
        val ctrl = src(s) & 0xff; s += 1
        val cmd = ctrl >> 4
        val nib = ctrl & 0x0f
        cmd match {
          case 0 =>
            val n = (nib << 8) + (src(s) & 0xff) + 64; s += 1
            System.arraycopy(src, s, out, o, n); s += n; o += n
          case 4 =>
            val n = (nib << 8) + (src(s) & 0xff) + 18; s += 1
            val b = src(s); s += 1
            java.util.Arrays.fill(out, o, o + n, b); o += n
          case 5 =>
            val n = (nib << 8) + (src(s) & 0xff) + 17; s += 1
            java.util.Arrays.fill(out, o, o + n, '@'.toByte); o += n
          case 6 =>
            val n = (nib << 8) + (src(s) & 0xff) + 17; s += 1
            java.util.Arrays.fill(out, o, o + n, ' '.toByte); o += n
          case 7 =>
            val n = (nib << 8) + (src(s) & 0xff) + 17; s += 1
            o += n // already zero
          case 8 | 9 | 10 | 11 =>
            val n = nib + 1 + (cmd - 8) * 16
            System.arraycopy(src, s, out, o, n); s += n; o += n
          case 12 =>
            val b = src(s); s += 1
            java.util.Arrays.fill(out, o, o + nib + 3, b); o += nib + 3
          case 13 => java.util.Arrays.fill(out, o, o + nib + 2, '@'.toByte); o += nib + 2
          case 14 => java.util.Arrays.fill(out, o, o + nib + 2, ' '.toByte); o += nib + 2
          case 15 => o += nib + 2
          case other =>
            throw new IllegalStateException(s"bad RLE control nibble $other")
        }
      }
      out
    }

    /** Greedy encoder: long same-byte runs become repeat commands, the rest
      * literal copies. Always decompresses back to the input (spec round-
      * trip is property-tested). */
    def compress(src: Array[Byte]): Array[Byte] = {
      val out = ArrayBuffer[Byte]()
      val lit = ArrayBuffer[Byte]()
      def flushLit(): Unit = {
        var i = 0
        while (i < lit.length) {
          val n = math.min(lit.length - i, 4095 + 64)
          if (n <= 64) {
            // 8..B copy up to 64 bytes: n = nib+1+(cmd-8)*16
            val cmd = 8 + (n - 1) / 16
            val nib = (n - 1) % 16
            out += ((cmd << 4) | nib).toByte
          } else { // command 0: n = (nib<<8)+next+64
            val m = n - 64
            out += ((0 << 4) | (m >> 8)).toByte
            out += (m & 0xff).toByte
          }
          out ++= lit.slice(i, i + n)
          i += n
        }
        lit.clear()
      }
      var i = 0
      while (i < src.length) {
        var run = 1
        while (i + run < src.length && src(i + run) == src(i) && run < 4112) run += 1
        if (run >= 3) {
          flushLit()
          val b = src(i)
          if (run >= 18) b match {
            case 0 => // n = (nib<<8)+next+17
              val m = run - 17
              out += ((7 << 4) | (m >> 8)).toByte; out += (m & 0xff).toByte
            case ' ' =>
              val m = run - 17
              out += ((6 << 4) | (m >> 8)).toByte; out += (m & 0xff).toByte
            case _ => // n = (nib<<8)+next+18, then the byte to repeat
              val m = run - 18
              out += ((4 << 4) | (m >> 8)).toByte; out += (m & 0xff).toByte; out += b
          }
          else b match { // short runs, 3..17
            case 0 => out += ((15 << 4) | (run - 2)).toByte
            case ' ' => out += ((14 << 4) | (run - 2)).toByte
            case _ => out += ((12 << 4) | (run - 3)).toByte; out += b
          }
          i += run
        } else {
          lit += src(i); i += 1
        }
      }
      flushLit()
      out.toArray
    }
  }

  // ---- RDC codec (SASYZCR2) ---------------------------------------------

  /** Ross Data Compression as stored in sas7bdat (public spec; the
    * reference delegates SAS entirely to an external reader,
    * core/dbio/iop/sas7bdat.go:26-46). Stream = repeated 16-bit big-endian
    * control words, MSB first; clear bit = literal byte, set bit = command
    * byte whose high nibble selects:
    *   0 short RLE: n = nib+3, value follows
    *   1 long RLE:  n = nib + next<<4 + 19, value follows
    *   2 long back-reference: ofs = nib+3+next<<4, n = next2+16
    *   3..15 short back-reference: ofs = nib+3+next<<4, n = cmd
    * Back-references may overlap their output (copy byte-by-byte).
    */
  object Rdc {
    def decompress(src: Array[Byte], srcOff: Int, srcLen: Int, outLen: Int): Array[Byte] = {
      val out = new Array[Byte](outLen)
      var s = srcOff
      val end = srcOff + srcLen
      var o = 0
      // corrupt input fails with a parse error, not an executor
      // ArrayIndexOutOfBounds mid-scan
      def need(k: Int): Unit =
        if (s + k > end) throw new IllegalArgumentException(
          s"corrupt RDC stream: command needs $k operand byte(s) at $s/$end")
      def needBack(ofs: Int): Unit =
        if (ofs > o) throw new IllegalArgumentException(
          s"corrupt RDC stream: back-reference $ofs exceeds output position $o")
      while (s + 1 < end && o < outLen) {
        var ctrl = ((src(s) & 0xff) << 8) | (src(s + 1) & 0xff); s += 2
        var bit = 0
        while (bit < 16 && s < end && o < outLen) {
          if ((ctrl & 0x8000) == 0) { out(o) = src(s); s += 1; o += 1 }
          else {
            val b = src(s) & 0xff; s += 1
            val cmd = b >> 4
            val nib = b & 0x0f
            cmd match {
              case 0 =>
                val n = nib + 3
                need(1)
                val v = src(s); s += 1
                java.util.Arrays.fill(out, o, math.min(o + n, outLen), v)
                o += n
              case 1 =>
                need(2)
                val n = nib + ((src(s) & 0xff) << 4) + 19; s += 1
                val v = src(s); s += 1
                java.util.Arrays.fill(out, o, math.min(o + n, outLen), v)
                o += n
              case 2 =>
                need(2)
                val ofs = nib + 3 + ((src(s) & 0xff) << 4); s += 1
                val n = (src(s) & 0xff) + 16; s += 1
                needBack(ofs)
                var k = 0
                while (k < n && o < outLen) { out(o) = out(o - ofs); o += 1; k += 1 }
              case short => // 3..15: copy `cmd` bytes from ofs back
                need(1)
                val ofs = nib + 3 + ((src(s) & 0xff) << 4); s += 1
                needBack(ofs)
                var k = 0
                while (k < short && o < outLen) { out(o) = out(o - ofs); o += 1; k += 1 }
            }
          }
          ctrl <<= 1
          bit += 1
        }
      }
      out
    }

    /** Greedy encoder: same-byte runs >= 3 become RLE commands, repeats of
      * the previous byte-window become back-references when found cheaply,
      * everything else literals. Round-trip property-tested. */
    def compress(src: Array[Byte]): Array[Byte] = {
      val out = ArrayBuffer[Byte]()
      var ctrlPos = -1
      var ctrlVal = 0
      var ctrlBits = 0
      def emit(isCmd: Boolean, bytes: Byte*): Unit = {
        if (ctrlBits == 0) {
          ctrlPos = out.length; out += 0; out += 0 // placeholder control word
          ctrlVal = 0
        }
        ctrlVal = (ctrlVal << 1) | (if (isCmd) 1 else 0)
        ctrlBits += 1
        out ++= bytes
        if (ctrlBits == 16) flushCtrl()
      }
      def flushCtrl(): Unit = if (ctrlBits > 0) {
        val v = ctrlVal << (16 - ctrlBits) // MSB-first, pad with literal bits
        out(ctrlPos) = ((v >> 8) & 0xff).toByte
        out(ctrlPos + 1) = (v & 0xff).toByte
        ctrlBits = 0; ctrlVal = 0
      }
      var i = 0
      while (i < src.length) {
        var run = 1
        while (i + run < src.length && src(i + run) == src(i) && run < 4113) run += 1
        if (run >= 3) {
          if (run <= 18) // short RLE: n = nib+3, nib <= 15
            emit(isCmd = true, ((0 << 4) | (run - 3)).toByte, src(i))
          else { // long RLE: n = nib + next<<4 + 19
            val m = run - 19
            emit(isCmd = true, ((1 << 4) | (m & 0x0f)).toByte,
              ((m >> 4) & 0xff).toByte, src(i))
          }
          i += run
        } else { emit(isCmd = false, src(i)); i += 1 }
      }
      // NOTE: a trailing partial control word pads with literal (0) bits;
      // the decoder stops on input exhaustion so the pad bits are inert
      flushCtrl()
      out.toArray
    }
  }
}
