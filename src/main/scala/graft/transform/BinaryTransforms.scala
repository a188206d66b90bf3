package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary / protocol row transforms from the reference registry
  * (transforms.go:538-601 ParseUUID/ParseMsUUID/ParseBit/BinaryToDecimal,
  * :429-521 ParseFIXMap, plus charset decode/encode :601-644). These are
  * inherently per-value byte work, so scalar UDFs are the right tool; the
  * surrounding projection stays codegen'd.
  */
object BinaryTransforms {

  // ---- UUIDs -------------------------------------------------------------

  /** 16 raw bytes → canonical RFC-4122 string (big-endian field order). */
  def parseUuid(b: Array[Byte]): String =
    if (b == null || b.length != 16) if (b == null) null else new String(b)
    else {
      val h = b.map(x => f"${x & 0xff}%02x").mkString
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
        s"${h.substring(16, 20)}-${h.substring(20)}"
    }

  /** Microsoft GUID byte order: first three fields little-endian
    * (transforms.go:549-564).
    */
  def parseMsUuid(b: Array[Byte]): String =
    if (b == null || b.length != 16) if (b == null) null else new String(b)
    else {
      def hex(idx: Int*) = idx.map(i => f"${b(i) & 0xff}%02x").mkString
      hex(3, 2, 1, 0) + "-" + hex(5, 4) + "-" + hex(7, 6) + "-" +
        hex(8, 9) + "-" + hex(10, 11) + hex(12, 13, 14, 15)
    }

  // ---- bits / binary numbers --------------------------------------------

  /** One byte 0x00/0x01 → "0"/"1", else passthrough (transforms.go:566-571). */
  def parseBit(b: Array[Byte]): String =
    if (b == null) null
    else if (b.length == 1 && (b(0) == 0 || b(0) == 1)) b(0).toString
    else new String(b)

  /** MySQL BIT payloads: <=8 binary bytes → big-endian unsigned decimal
    * string; printable ASCII passes through (transforms.go:573-601).
    */
  def binaryToDecimal(b: Array[Byte]): String =
    if (b == null) null
    else if (b.nonEmpty && b.length <= 8 && isBinary(b)) {
      java.lang.Long.toUnsignedString(
        b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL)))
    } else new String(b)

  private def isBinary(b: Array[Byte]): Boolean = {
    val hasBinaryByte = b.exists { x =>
      val u = x & 0xff
      u > 127 || (u < 32 && u != 9 && u != 10 && u != 13)
    }
    val hasText = b.exists { x => val u = x & 0xff; u >= 32 && u <= 126 }
    hasBinaryByte || !hasText
  }

  // ---- FIX protocol ------------------------------------------------------

  /** Wireshark tag → snake_case name subset (fix_mapping.tsv equivalent). */
  private val fixTags: Map[Int, String] = Map(
    6 -> "avg_px", 8 -> "begin_string", 9 -> "body_length", 10 -> "check_sum",
    11 -> "cl_ord_id", 14 -> "cum_qty", 17 -> "exec_id", 31 -> "last_px",
    32 -> "last_qty", 34 -> "msg_seq_num", 35 -> "msg_type", 37 -> "order_id",
    38 -> "order_qty", 39 -> "ord_status", 40 -> "ord_type", 44 -> "price",
    49 -> "sender_comp_id", 52 -> "sending_time", 54 -> "side", 55 -> "symbol",
    56 -> "target_comp_id", 150 -> "exec_type", 151 -> "leaves_qty")

  /** FIX message → JSON object string; delimiter auto-detected among SOH
    * (the wire format), `|`, and space by which yields the most `tag=value`
    * parts. Known tags map to snake_case names, unknown tags keep their
    * number. Keys sorted for deterministic output.
    */
  def parseFix(msg: String): String =
    if (msg == null) null
    else {
      val candidates = Seq("\u0001", "|", " ")
      val delim = candidates.maxBy(d =>
        msg.split(java.util.regex.Pattern.quote(d), -1)
          .count(_.matches("\\d+=[^=]*")))
      val pairs = msg.split(java.util.regex.Pattern.quote(delim), -1)
        .map(_.trim).filter(_.nonEmpty).flatMap { part =>
          part.split("=", 2) match {
            case Array(tag, value) if tag.matches("\\d+") =>
              Some(fixTags.getOrElse(tag.toInt, tag) -> value)
            case _ => None
          }
        }
      pairs.sortBy(_._1).map { case (k, v) =>
        s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      }.mkString("{", ",", "}")
    }

  // ---- charsets ----------------------------------------------------------

  /** Decode bytes with a named charset (latin1/5/9, win1250/1252, utf16...);
    * utf8_bom strips a leading BOM first (transforms.go registry keys).
    */
  def decodeCharset(b: Array[Byte], charset: String): String =
    if (b == null) null
    else {
      val (cs, bytes) = charset.toLowerCase match {
        case "latin1" => ("ISO-8859-1", b)
        case "latin5" => ("ISO-8859-5", b) // reference maps latin5→8859-5 (transforms.go:185)
        case "latin9" => ("ISO-8859-15", b) // reference maps latin9→8859-15 (transforms.go:186)
        case "windows1250" => ("windows-1250", b)
        case "windows1252" => ("windows-1252", b)
        case "utf16" => ("UTF-16", b)
        case "utf8_bom" =>
          ("UTF-8", if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
            (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) b.drop(3) else b)
        case other => (other, b)
      }
      new String(bytes, java.nio.charset.Charset.forName(cs))
    }

  def encodeCharset(s: String, charset: String): Array[Byte] =
    if (s == null) null
    else charset match {
      case "utf8_bom" =>
        // BOM-prefixed UTF-8 (transforms.go encode_utf8_bom)
        Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case other =>
        s.getBytes(java.nio.charset.Charset.forName(other match {
          case "latin1" => "ISO-8859-1"
          case "latin5" => "ISO-8859-5"
          case "latin9" => "ISO-8859-15"
          case "windows1250" => "windows-1250"
          case "windows1252" => "windows-1252"
          case "utf8" => "UTF-8"
          case "utf16" => "UTF-16"
          case o => o
        }))
    }

  // ---- column functions --------------------------------------------------

  val parse_uuid_bin = udf(parseUuid _)
  val parse_ms_uuid = udf(parseMsUuid _)
  val parse_bit = udf(parseBit _)
  val binary_to_decimal = udf(binaryToDecimal _)
  val parse_fix = udf(parseFix _)
  def decode(c: Column, charset: String): Column =
    udf((b: Array[Byte]) => decodeCharset(b, charset)).apply(c)
  def encode(c: Column, charset: String): Column =
    udf((s: String) => encodeCharset(s, charset)).apply(c)
}
