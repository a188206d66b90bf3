package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path

/** Delta Lake deletion-vector decoding/encoding from the public protocol
  * spec (PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec for the
  * container serialization). The reference reads Delta through an embedded
  * engine (core/dbio/iop/delta.go); this module gives the log-replay reader
  * (`DeltaLite`) native row-level delete support.
  *
  * A deletion vector is a set of 64-bit row positions stored as a
  * "RoaringBitmapArray" in portable form:
  *
  *   [magic 1681511377: i32 LE][number of 32-bit bitmaps: i64 LE]
  *   [each: standard 32-bit RoaringBitmap portable serialization]
  *
  * position = (bitmapIndex << 32) | bitmapValue. The standard bitmap
  * layout (cookie 12346 without / 12347 with run containers; array,
  * bitset, and run containers) is decoded in full; the fixture encoder
  * emits cookie-12346 array/bitset containers only.
  *
  * In a DV file each vector is stored as [dataSize: i32 BE][data]
  * [crc32(data): i32 BE], and the file starts with a 1-byte format
  * version. Descriptors address the data with (path, offset, sizeInBytes):
  *   storageType "p" — absolute path; "u" — path derived from a z85-coded
  *   UUID relative to the table root; "i" — data itself z85-coded inline.
  */
object DeletionVectors {

  val Magic = 1681511377

  // ---- z85 (ZeroMQ spec alphabet) ---------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Dec: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = Z85Dec(s.charAt(i + j).toInt)
        require(c >= 0, s"bad z85 char '${s.charAt(i + j)}'")
        v = v * 85 + c
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, "z85 input must be a multiple of 4 bytes")
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** storageType "u": 20 z85 chars encode the UUID; anything before them is
    * a random path prefix. File: <table>/<prefix>deletion_vector_<uuid>.bin */
  def uuidPath(table: String, pathOrInlineDv: String): String = {
    val prefix = pathOrInlineDv.dropRight(20)
    val uuidBytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val dir = if (prefix.isEmpty) "" else s"$prefix/"
    s"$table/${dir}deletion_vector_$uuid.bin"
  }

  // ---- roaring bitmap array ---------------------------------------------

  /** Decode portable RoaringBitmapArray bytes to sorted 64-bit positions. */
  def decode(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad deletion-vector magic $magic")
    val nBitmaps = bb.getLong
    val out = ArrayBuffer[Long]()
    var b = 0L
    while (b < nBitmaps) {
      decodeBitmap(bb, v => out += (b << 32) | (v & 0xffffffffL))
      b += 1
    }
    out.toArray
  }

  private def decodeBitmap(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookieWord = bb.getInt
    val (size, runFlags) =
      if ((cookieWord & 0xffff) == 12347) {
        val n = (cookieWord >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        bb.get(flags)
        (n, flags)
      } else {
        require(cookieWord == 12346, s"bad roaring cookie $cookieWord")
        (bb.getInt, null)
      }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    for (i <- 0 until size) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
    }
    val hasOffsets = runFlags == null || size >= 4
    if (hasOffsets) bb.position(bb.position() + 4 * size) // containers follow in order
    def isRun(i: Int) = runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
    for (i <- 0 until size) {
      val hi = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        for (_ <- 0 until nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          for (v <- start to start + len) emit(hi | v)
        }
      } else if (cards(i) <= 4096) {
        for (_ <- 0 until cards(i)) emit(hi | (bb.getShort & 0xffff))
      } else {
        val words = new Array[Long](1024)
        for (w <- words.indices) words(w) = bb.getLong
        for (w <- words.indices; bit <- 0 until 64 if (words(w) & (1L << bit)) != 0)
          emit(hi | (w * 64 + bit))
      }
    }
  }

  /** Encode sorted 64-bit positions as portable RoaringBitmapArray bytes
    * (cookie 12346; array containers, bitset above 4096 cardinality). */
  def encode(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val body = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff)
      body.write((v >> 16) & 0xff); body.write((v >> 24) & 0xff)
    }
    def i16(v: Int): Unit = { body.write(v & 0xff); body.write((v >> 8) & 0xff) }
    i32(Magic); i32(nBitmaps.toInt); i32((nBitmaps >> 32).toInt)
    for (b <- 0L until nBitmaps) {
      val vals = sorted.filter(p => (p >>> 32) == b).map(p => (p & 0xffffffffL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      i32(12346); i32(byKey.size)
      byKey.foreach { case (k, vs) => i16(k); i16(vs.length - 1) }
      // offsets (relative to bitmap start): header = 8 + 4*size + 4*size
      var off = 8 + 8 * byKey.size
      byKey.foreach { case (_, vs) =>
        i32(off)
        off += (if (vs.length <= 4096) 2 * vs.length else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(v => i16(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v => val low = v & 0xffff; words(low / 64) |= 1L << (low % 64) }
          words.foreach { w =>
            var x = w; var i = 0
            while (i < 8) { body.write((x & 0xff).toInt); x >>>= 8; i += 1 }
          }
        }
      }
    }
    body.toByteArray
  }

  // ---- DV file IO --------------------------------------------------------

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Int, sizeInBytes: Int)

  /** Read one vector's positions given its descriptor. `conf` is built
    * fresh on executors (the decode fans out one task per vector). */
  def readPositions(table: String, d: Descriptor,
      conf: org.apache.hadoop.conf.Configuration): Array[Long] = d.storageType match {
    case "i" => decode(z85Decode(d.pathOrInlineDv))
    case "p" | "u" =>
      val file = if (d.storageType == "p") d.pathOrInlineDv
        else uuidPath(table, d.pathOrInlineDv)
      val p = new Path(file)
      val in = p.getFileSystem(conf).open(p)
      try {
        val head = new Array[Byte](4)
        in.readFully(d.offset, head)
        val size = ByteBuffer.wrap(head).getInt // big-endian length
        require(size == d.sizeInBytes,
          s"deletion vector size $size != descriptor ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(d.offset + 4L, data)
        val crcBuf = new Array[Byte](4)
        in.readFully(d.offset + 4L + size, crcBuf)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        require(ByteBuffer.wrap(crcBuf).getInt == crc.getValue.toInt,
          "deletion vector checksum mismatch")
        decode(data)
      } finally in.close()
    case other =>
      throw new UnsupportedOperationException(s"deletion vector storageType '$other'")
  }

  /** Append vectors to a new DV file under `table`; returns descriptors in
    * input order. Fixture/bootstrap quality (single file, driver-side). */
  def writeFile(spark: org.apache.spark.sql.SparkSession, table: String,
      vectors: Seq[Array[Long]]): Seq[Descriptor] = {
    val name = s"deletion_vector_${java.util.UUID.randomUUID()}.bin"
    val p = new Path(table, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val descriptors = ArrayBuffer[Descriptor]()
    try {
      out.write(1) // format version
      var offset = 1
      vectors.foreach { positions =>
        val data = encode(positions)
        val head = ByteBuffer.allocate(4).putInt(data.length).array()
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        val tail = ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
        out.write(head); out.write(data); out.write(tail)
        descriptors += Descriptor("p", p.toString, offset, data.length)
        offset += 4 + data.length + 4
      }
    } finally out.close()
    descriptors.toSeq
  }
}
