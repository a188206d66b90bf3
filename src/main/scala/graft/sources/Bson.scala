package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal BSON codec for the MongoDB wire client (`Mongo.scala`).
  *
  * The reference drives MongoDB through the official Go driver
  * (`core/dbio/database/database_mongo.go:40-74` mongo.Connect); offline
  * we speak the public BSON spec (bsonspec.org, version 1.1) directly so
  * the same commands can run against a loopback server. Only the types
  * the reference's row conversion touches are materialized richly
  * (`database_mongo.go:434-452`: ObjectID → hex string, DateTime → time,
  * Timestamp → epoch seconds, arrays/docs → JSON); everything else decodes
  * to a faithful scalar.
  *
  * Documents are ordered field sequences ([[Bson.BDoc]]) because BSON is
  * order-preserving and command docs require the command name first.
  */
object Bson {

  /** Ordered BSON document. Field values may be: null, Boolean, Int,
    * Long, Double, String, BDoc, Seq[Any] (array), Array[Byte] (binary
    * subtype 0), ObjectId, java.time.Instant (UTC datetime),
    * MongoTimestamp, Dec128, MinKey/MaxKey. */
  final case class BDoc(fields: Seq[(String, Any)]) {
    def get(name: String): Option[Any] =
      fields.collectFirst { case (`name`, v) => v }
    def getDoc(name: String): Option[BDoc] =
      get(name).collect { case d: BDoc => d }
    def getSeq(name: String): Seq[Any] =
      get(name).collect { case s: Seq[_] => s.toSeq }.getOrElse(Nil)
    def getLong(name: String): Option[Long] = get(name).collect {
      case i: Int => i.toLong
      case l: Long => l
      case d: Double => d.toLong
    }
    def getString(name: String): Option[String] =
      get(name).collect { case s: String => s }
  }
  object BDoc {
    def apply(fields: (String, Any)*)(implicit d: DummyImplicit): BDoc =
      BDoc(fields.toSeq)
  }

  /** 12-byte ObjectId; ordered by its big-endian byte value (the
    * generation scheme makes that roughly insertion time order, which is
    * what `_id`-range partitioning in `Mongo.read` relies on). */
  final case class ObjectId(bytes: Array[Byte]) extends Ordered[ObjectId] {
    require(bytes.length == 12, s"ObjectId needs 12 bytes, got ${bytes.length}")
    def hex: String = bytes.map(b => f"${b & 0xff}%02x").mkString
    def toBigInt: BigInt = BigInt(1, bytes)
    override def compare(that: ObjectId): Int = {
      var i = 0
      while (i < 12) {
        val c = java.lang.Integer.compare(bytes(i) & 0xff, that.bytes(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      0
    }
    override def equals(o: Any): Boolean = o match {
      case other: ObjectId => java.util.Arrays.equals(bytes, other.bytes)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
    override def toString: String = s"ObjectId($hex)"
  }
  object ObjectId {
    def fromHex(hex: String): ObjectId = {
      require(hex.length == 24, s"ObjectId hex needs 24 chars: $hex")
      ObjectId(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    }
    def fromBigInt(v: BigInt): ObjectId = {
      val raw = v.toByteArray.dropWhile(_ == 0)
      require(raw.length <= 12, s"ObjectId value out of range: $v")
      ObjectId(Array.fill[Byte](12 - raw.length)(0) ++ raw)
    }
  }

  /** BSON type 0x11 (internal replication timestamp): seconds + counter. */
  final case class MongoTimestamp(seconds: Long, increment: Long)

  /** IEEE 754-2008 decimal128 in BID encoding (BSON type 0x13). */
  final case class Dec128(high: Long, low: Long) {
    /** Decode to a plain decimal string (NaN/Infinity for specials). */
    def decodeString: String = {
      val negative = (high & 0x8000000000000000L) != 0
      val g01 = (high >>> 61) & 0x3 // top 2 combination bits after sign
      if (g01 == 0x3) {
        // bits 62..59 all set → special: bit 58 picks NaN vs Infinity
        if (((high >>> 59) & 0xf) == 0xf)
          return if (((high >>> 58) & 1) == 1) "NaN"
            else if (negative) "-Infinity" else "Infinity"
        // large-coefficient form: the implicit 0b100 prefix always pushes
        // the significand past 10^34-1, which the spec treats as zero
        render(negative, BigInt(0), 0)
      } else {
        val exp = ((high >>> 49) & 0x3fff).toInt - 6176
        val coeff = ((BigInt(high & 0x1ffffffffffffL)) << 64) |
          (BigInt(low) & ((BigInt(1) << 64) - 1))
        render(negative, coeff, exp)
      }
    }
    private def render(neg: Boolean, coeff: BigInt, exp: Int): String = {
      // value = coeff × 10^exp, i.e. unscaled=coeff at scale −exp
      val bd = BigDecimal(new java.math.BigDecimal(coeff.bigInteger, -exp))
      val s = bd.underlying.stripTrailingZeros.toPlainString
      if (neg && bd.signum != 0) s"-$s" else s
    }
  }

  object Dec128 {
    /** Encode a BigDecimal in the BID small-coefficient form; None when
      * the coefficient exceeds 10^34−1 or the exponent leaves the
      * decimal128 range (callers fall back to a string). */
    def fromBigDecimal(v: BigDecimal): Option[Dec128] = {
      val unscaled = BigInt(v.underlying.unscaledValue)
      val exp = -v.scale
      val biased = exp + 6176
      val maxCoeff = BigInt(10).pow(34) - 1
      if (unscaled.abs > maxCoeff || biased < 0 || biased > 12287) None
      else {
        val coeff = unscaled.abs
        val low = (coeff & ((BigInt(1) << 64) - 1)).toLong
        val highCoeff = (coeff >> 64).toLong // < 2^49
        val sign = if (unscaled.signum < 0) 0x8000000000000000L else 0L
        Some(Dec128(sign | (biased.toLong << 49) | highCoeff, low))
      }
    }
  }

  case object MinKey
  case object MaxKey

  // ---- encode ----

  def encode(doc: BDoc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(128)
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: BDoc): Unit = {
    val body = new java.io.ByteArrayOutputStream(96)
    doc.fields.foreach { case (name, value) => writeElement(body, name, value) }
    val total = 4 + body.size() + 1
    out.write(le32(total)); body.writeTo(out); out.write(0)
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def writeCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    require(!b.contains(0.toByte), s"cstring cannot contain NUL: $s")
    out.write(b, 0, b.length); out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String,
      value: Any): Unit = {
    def tag(t: Int): Unit = { out.write(t); writeCString(out, name) }
    value match {
      case null => tag(0x0a)
      case b: Boolean => tag(0x08); out.write(if (b) 1 else 0)
      case i: Int => tag(0x10); out.write(le32(i))
      case l: Long => tag(0x12); out.write(le64(l))
      case d: Double => tag(0x01)
        out.write(le64(java.lang.Double.doubleToLongBits(d)))
      case s: String => tag(0x02)
        val b = s.getBytes(UTF_8)
        out.write(le32(b.length + 1)); out.write(b, 0, b.length); out.write(0)
      case d: BDoc => tag(0x03); writeDoc(out, d)
      case a: Seq[_] => tag(0x04)
        writeDoc(out, BDoc(a.zipWithIndex.map { case (v, i) => (i.toString, v) }))
      case b: Array[Byte] => tag(0x05)
        out.write(le32(b.length)); out.write(0); out.write(b, 0, b.length)
      case o: ObjectId => tag(0x07); out.write(o.bytes, 0, 12)
      case t: java.time.Instant => tag(0x09); out.write(le64(t.toEpochMilli))
      case t: MongoTimestamp => tag(0x11)
        out.write(le64((t.seconds << 32) | (t.increment & 0xffffffffL)))
      case d: Dec128 => tag(0x13); out.write(le64(d.low)); out.write(le64(d.high))
      case MinKey => tag(0xff)
      case MaxKey => tag(0x7f)
      case other => throw new IllegalArgumentException(
        s"unsupported BSON value for '$name': ${other.getClass.getName}")
    }
  }

  // ---- decode ----

  def decode(bytes: Array[Byte]): BDoc =
    readDoc(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))

  def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val total = buf.getInt
    val fields = Seq.newBuilder[(String, Any)]
    while (buf.position() < start + total - 1)
      fields += readElement(buf)
    require(buf.get() == 0, "BSON document missing trailing NUL")
    BDoc(fields.result())
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream(16)
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, UTF_8)
  }

  private def readElement(buf: ByteBuffer): (String, Any) = {
    val t = buf.get() & 0xff
    val name = readCString(buf)
    val value: Any = t match {
      case 0x01 => buf.getDouble
      case 0x02 | 0x0d | 0x0e => // string / JS code / symbol
        val len = buf.getInt
        val b = new Array[Byte](len - 1); buf.get(b); buf.get() // NUL
        new String(b, UTF_8)
      case 0x03 => readDoc(buf)
      case 0x04 => readDoc(buf).fields.map(_._2)
      case 0x05 =>
        val len = buf.getInt; buf.get() // subtype
        val b = new Array[Byte](len); buf.get(b); b
      case 0x06 => null // undefined (deprecated)
      case 0x07 => val b = new Array[Byte](12); buf.get(b); ObjectId(b)
      case 0x08 => buf.get() != 0
      case 0x09 => java.time.Instant.ofEpochMilli(buf.getLong)
      case 0x0a => null
      case 0x0b => // regex: two cstrings → "/pattern/options"
        val p = readCString(buf); val o = readCString(buf); s"/$p/$o"
      case 0x10 => buf.getInt
      case 0x11 =>
        val v = buf.getLong
        MongoTimestamp(v >>> 32, v & 0xffffffffL)
      case 0x12 => buf.getLong
      case 0x13 => val low = buf.getLong; val high = buf.getLong
        Dec128(high, low)
      case 0xff => MinKey
      case 0x7f => MaxKey
      case other => throw new IllegalArgumentException(
        f"unsupported BSON type 0x$other%02x for '$name'")
    }
    (name, value)
  }

  // ---- JSON rendering (decoded docs → lines for Spark's JSON reader) ----

  /** Render a decoded doc as one JSON line, with the reference's value
    * conversions (`database_mongo.go:434-452`): ObjectId → 24-hex string,
    * datetime → ISO-8601 instant, internal timestamp → epoch seconds,
    * binary → base64, decimal128 → plain number string. Nested docs and
    * arrays stay structural (Spark's JSON inference types them), where
    * the reference stringifies arrays for tabular targets — flattening is
    * the task layer's job here (`transform/Flatten.scala`). */
  def toJson(doc: BDoc): String = {
    val sb = new StringBuilder(128)
    renderDoc(sb, doc)
    sb.toString
  }

  private def renderDoc(sb: StringBuilder, doc: BDoc): Unit = {
    sb.append('{')
    var first = true
    doc.fields.foreach { case (k, v) =>
      if (!first) sb.append(','); first = false
      renderString(sb, k); sb.append(':'); renderValue(sb, v)
    }
    sb.append('}')
  }

  private def renderValue(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null")
    case b: Boolean => sb.append(b)
    case i: Int => sb.append(i)
    case l: Long => sb.append(l)
    case d: Double =>
      if (d.isNaN || d.isInfinite) renderString(sb, d.toString)
      else sb.append(d)
    case s: String => renderString(sb, s)
    case d: BDoc => renderDoc(sb, d)
    case a: Seq[_] =>
      sb.append('[')
      var first = true
      a.foreach { e =>
        if (!first) sb.append(','); first = false; renderValue(sb, e) }
      sb.append(']')
    case b: Array[Byte] =>
      renderString(sb, java.util.Base64.getEncoder.encodeToString(b))
    case o: ObjectId => renderString(sb, o.hex)
    case t: java.time.Instant => renderString(sb, t.toString)
    case t: MongoTimestamp => sb.append(t.seconds)
    case d: Dec128 => sb.append(d.decodeString)
    case MinKey => renderString(sb, "MinKey")
    case MaxKey => renderString(sb, "MaxKey")
    case other => renderString(sb, other.toString)
  }

  private def renderString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ---- JSON → BSON (user-supplied filters / pipelines) ----

  /** Parse a JSON object (the task-YAML `filter:` / `pipeline:` grammar,
    * `database_mongo.go:339-365`) into a BDoc, converting 24-hex strings
    * to ObjectIds and ISO date strings to datetimes the way the
    * reference's processMongoFilter does (`database_mongo.go:181-314`). */
  def fromJson(json: String): BDoc = {
    // the reference's filter grammar accepts mongo-shell ISODate("...")
    // calls inside the JSON (r.54.mongo_isodate_filter.yaml; parsed in
    // processObjectIDValue/parseISODateString) — strip to the quoted
    // string, which the ISO-date conversion below then types
    val normalized =
      json.replaceAll("""ISODate\(\s*("(?:[^"\\]|\\.)*")\s*\)""", "$1")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    fromNode(mapper.readTree(normalized)) match {
      case d: BDoc => d
      case other => throw new IllegalArgumentException(
        s"filter must be a JSON object, got: $other")
    }
  }

  private val IsoDateRe =
    "\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})".r
  private val HexIdRe = "[0-9a-fA-F]{24}".r

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import com.fasterxml.jackson.databind.JsonNode
    if (n.isObject) {
      val it = n.fields()
      val fields = Seq.newBuilder[(String, Any)]
      while (it.hasNext) {
        val e = it.next(); fields += ((e.getKey, fromNode(e.getValue)))
      }
      BDoc(fields.result())
    } else if (n.isArray)
      (0 until n.size()).map(i => fromNode(n.get(i)))
    else if (n.isTextual) n.asText() match {
      case s if HexIdRe.matches(s) => ObjectId.fromHex(s)
      case s if IsoDateRe.matches(s) =>
        java.time.OffsetDateTime.parse(s).toInstant
      case s => s
    }
    else if (n.isInt) n.asInt()
    else if (n.isLong) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else null.asInstanceOf[Any] // null node
  }

  /** Total order over the `_id` values the range partitioner and the
    * loopback server compare (same cross-type ranking idea as MongoDB's
    * public sort order: numbers < strings < objects < ... < ObjectId). */
  def compareValues(a: Any, b: Any): Int = {
    def rank(v: Any): Int = v match {
      case MinKey => 0
      case null => 1
      case _: Int | _: Long | _: Double | _: Dec128 => 2
      case _: String => 3
      case _: BDoc => 4
      case _: Seq[_] => 5
      case _: Array[Byte] => 6
      case _: ObjectId => 7
      case _: Boolean => 8
      case _: java.time.Instant => 9
      case _: MongoTimestamp => 10
      case MaxKey => 11
      case _ => 12
    }
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) return java.lang.Integer.compare(ra, rb)
    (a, b) match {
      case (x: ObjectId, y: ObjectId) => x.compare(y)
      case (x: String, y: String) => x.compareTo(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
      case (x: MongoTimestamp, y: MongoTimestamp) =>
        val c = java.lang.Long.compare(x.seconds, y.seconds)
        if (c != 0) c else java.lang.Long.compare(x.increment, y.increment)
      case _ =>
        def num(v: Any): BigDecimal = v match {
          case i: Int => BigDecimal(i)
          case l: Long => BigDecimal(l)
          case d: Double => BigDecimal(d)
          case d: Dec128 => BigDecimal(d.decodeString)
          case _ => BigDecimal(0)
        }
        num(a).compare(num(b))
    }
  }
}
