package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Multimodal (binary) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * decode/feature-extract step runs as a partition-wise batch operator
  * (`mapPartitions`) — rows stream through the decoder per partition
  * exactly as they would through a Pandas-UDF batch in PySpark; no shuffle,
  * no driver collection, so the operator scales linearly with partitions.
  *
  * The decoder is a real pure-JVM header parser: magic-byte format sniff
  * plus width×height extraction from PNG IHDR, JPEG SOFn, GIF logical
  * screen, and BMP DIB headers — no codec dependencies, no pixel decode.
  * Full-pixel decode/resize/frame-sample would slot into [[decode]]
  * unchanged (the seam is the function, not the plumbing).
  */
object Multimodal {

  final case class BinaryFeatures(byteLen: Long, contentMd5: String,
      headHex: String, format: String, width: Option[Int], height: Option[Int])

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Magic-byte format sniff (the usual signatures; no library). */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N'
        && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      "jpeg"
    else if (b.length >= 6 && b.startsWith("GIF8".getBytes)) "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 12 && b.startsWith("RIFF".getBytes)
        && new String(b.slice(8, 12)) == "WAVE") "wav"
    else "unknown"

  /** Offset of the first SOFn marker's 0xff byte (C0–CF minus C4/C8/CC),
    * walking the segment chain past APPn/COM/fill bytes — the ONE walker
    * shared by [[dimensions]] (reads h/w at +5/+7) and
    * [[StubImageCodec.resize]] (writes them), so the two can't drift. */
  private def jpegSofOffset(b: Array[Byte]): Option[Int] =
    try {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        // any number of 0xFF fill bytes may pad before a marker; consume
        // them one at a time or the real marker byte is read as a length
        if ((b(i + 1) & 0xff) == 0xff) i += 1
        else {
          val marker = b(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some(i)
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9))
            i += 2 // standalone markers carry no length
          else i += 2 + be16(b, i + 2)
        }
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }

  /** Header-only dimension extraction.
    *
    *   - PNG: IHDR width/height, big-endian u32 at offsets 16/20;
    *   - JPEG: walk the segment chain to the first SOFn (C0–CF minus
    *     C4/C8/CC), height/width big-endian u16 at +3/+5 past the length;
    *   - GIF: logical-screen u16 LE at 6/8;
    *   - BMP: DIB i32 LE at 18/22.
    */
  def dimensions(b: Array[Byte]): (Option[Int], Option[Int]) =
    try sniffFormat(b) match {
      case "png" if b.length >= 24 &&
          new String(b.slice(12, 16)) == "IHDR" =>
        (Some(be32(b, 16)), Some(be32(b, 20)))
      // the walker only returns offsets with 10 readable bytes
      case "jpeg" => jpegSofOffset(b) match {
        case Some(i) => (Some(be16(b, i + 7)), Some(be16(b, i + 5)))
        case None => (None, None)
      }
      case "gif" if b.length >= 10 => (Some(le16(b, 6)), Some(le16(b, 8)))
      case "bmp" if b.length >= 26 => (Some(le32(b, 18)), Some(le32(b, 22)))
      case _ => (None, None)
    } catch { case _: IndexOutOfBoundsException => (None, None) }

  /** Decode one payload: byte-level features + format + dimensions. */
  def decode(bytes: Array[Byte]): BinaryFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val md5hex = md.digest(bytes).map("%02x".format(_)).mkString
    val head = bytes.take(8).map("%02X".format(_)).mkString
    val (w, h) = dimensions(bytes)
    BinaryFeatures(bytes.length.toLong, md5hex, head, sniffFormat(bytes), w, h)
  }

  // ---- resize -------------------------------------------------------------

  /** Pixel-level codec seam. Real image decoding/scaling libraries are
    * not in this jar set, so the default implementation is the
    * header-faithful stub below — swap in a real codec here and the
    * Spark-side plumbing (schema, partitioning, batch shape) is already
    * done. The seam is the trait, not the operator. */
  trait ImageCodec extends Serializable {
    /** Return the payload re-encoded at `w`×`h`. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB codec: rewrites the container header's dimension fields in
    * place (PNG IHDR, JPEG SOFn, GIF logical screen, BMP DIB) and leaves
    * every other byte untouched — deterministic, format-faithful at the
    * header level, NO pixel work. The output round-trips through
    * [[dimensions]] at the new size. Unknown formats pass through. */
  object StubImageCodec extends ImageCodec {
    private def putBe16(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = ((v >> 8) & 0xff).toByte; b(i + 1) = (v & 0xff).toByte
    }
    private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >>> 24).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
      b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
    }
    private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    }
    private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = (v >>> 24).toByte
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = payload.clone()
      sniffFormat(out) match {
        case "png" if out.length >= 24 &&
            new String(out.slice(12, 16)) == "IHDR" =>
          putBe32(out, 16, w); putBe32(out, 20, h)
        case "jpeg" =>
          // the same walker dimensions() reads through, so read and
          // write offsets cannot drift
          jpegSofOffset(out).foreach { i =>
            putBe16(out, i + 5, h); putBe16(out, i + 7, w)
          }
        case "gif" if out.length >= 10 =>
          putLe16(out, 6, w); putLe16(out, 8, h)
        case "bmp" if out.length >= 26 =>
          putLe32(out, 18, w); putLe32(out, 22, h)
        case _ => // unknown container: pass through unchanged
      }
      out
    }
  }

  /** Resize every payload in `binaryCol` to `w`×`h` via the codec —
    * partition-wise batch operator, one pass, no shuffle (the Scala
    * analogue of a Pandas-UDF batch). The column is replaced in place;
    * everything else flows through untouched. */
  def resize(df: DataFrame, binaryCol: String, w: Int, h: Int,
      codec: ImageCodec = StubImageCodec): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(df.schema))
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val vals = r.toSeq.toArray
        if (bytes != null) vals(idx) = codec.resize(bytes, w, h)
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }(enc)
  }

  // ---- frame sampling -------------------------------------------------------

  /** Frame-extraction seam for video/animation payloads. Container
    * demuxers aren't in this jar set; the stub derives a deterministic
    * frame count from the header (so tests and oracles can mirror it)
    * and fabricates frame bytes. A real demuxer drops in here. */
  trait FrameSampler extends Serializable {
    def frameCount(payload: Array[Byte]): Int
    /** Bytes of frame `idx` (0-based) and its presentation time in ms. */
    def frame(payload: Array[Byte], idx: Int): (Array[Byte], Long)
  }

  /** STUB sampler: frameCount = 1 + (header width | byte length) mod 5;
    * frame bytes are the payload with the first byte XOR'd by the index
    * (deterministic, distinct per frame); pts advances at 25 fps. */
  object StubFrameSampler extends FrameSampler {
    def frameCount(payload: Array[Byte]): Int =
      1 + dimensions(payload)._1.getOrElse(payload.length) % 5
    def frame(payload: Array[Byte], idx: Int): (Array[Byte], Long) = {
      val f = payload.clone()
      if (f.nonEmpty) f(0) = (f(0) ^ idx).toByte
      (f, idx * 40L)
    }
  }

  /** Sample every `every`-th frame of each payload: one OUTPUT ROW per
    * sampled frame (`frame_idx`, `pts_ms`, `frame`), original columns
    * carried through. flatMap-shaped partition-wise operator — the fan-out
    * happens executor-side with no shuffle, so a 100×-frames clip costs
    * its own partition only. */
  def frameSample(df: DataFrame, binaryCol: String, every: Int = 1,
      sampler: FrameSampler = StubFrameSampler): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("pts_ms", LongType),
      StructField("frame", BinaryType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        if (bytes == null) Iterator.empty
        else (0 until sampler.frameCount(bytes) by every).iterator.map { f =>
          val (fb, pts) = sampler.frame(bytes, f)
          Row.fromSeq(r.toSeq ++ Seq(f, pts, fb))
        }
      }
    }(enc)
  }

  /** Attach features extracted from `binaryCol` via the batch decoder.
    * One pass, no shuffle.
    */
  def extractFeatures(df: DataFrame, binaryCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("byte_len", LongType),
      StructField("content_md5", StringType),
      StructField("head_hex", StringType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val f =
          if (bytes == null)
            BinaryFeatures(0L, null, null, "unknown", None, None)
          else decode(bytes)
        Row.fromSeq(r.toSeq ++ Seq(f.byteLen, f.contentMd5, f.headHex,
          f.format, f.width.map(Int.box).orNull, f.height.map(Int.box).orNull))
      }
    }(enc)
  }
}
