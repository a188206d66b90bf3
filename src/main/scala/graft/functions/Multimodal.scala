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
      case "jpeg" =>
        var i = 2
        while (i + 9 < b.length) {
          if ((b(i) & 0xff) != 0xff) return (None, None)
          // any number of 0xFF fill bytes may pad before a marker; consume
          // them one at a time or the real marker byte is read as a length
          if ((b(i + 1) & 0xff) == 0xff) i += 1
          else {
            val marker = b(i + 1) & 0xff
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
              return (Some(be16(b, i + 7)), Some(be16(b, i + 5)))
            else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9))
              i += 2 // standalone markers carry no length
            else i += 2 + be16(b, i + 2)
          }
        }
        (None, None)
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
