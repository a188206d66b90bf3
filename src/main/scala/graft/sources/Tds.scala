package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_16LE

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQL Server source-sink over the TDS protocol (public [MS-TDS] spec;
  * the reference drives SQL Server through go-mssqldb and shells out to
  * the `bcp` binary for bulk loads, `core/dbio/database/
  * database_sqlserver.go:655-780` BulkImportStream).
  *
  * What this closes: the BCP fast path was encoder-level only (the bcp
  * text file + argv, `op_bcp_encode`). [[insert]] goes one level deeper
  * than the reference — it speaks the wire protocol the bcp tool itself
  * uses: each Spark partition logs in, issues the `INSERT BULK` SQLBatch,
  * and streams a BulkLoadBCP message (client-authored COLMETADATA + ROW
  * tokens + DONE) over its own connection. No external binary, no
  * driver-side row movement.
  *
  * Reads mirror [[Pg.read]]: min/max-probed range slices per partition,
  * token-stream rows (COLMETADATA / ROW / DONE) decoded streaming
  * straight off the packet cursor ([[PacketLeIn]] — O(row) executor
  * memory, a slice never reassembles) and typed exactly from the column
  * metadata. Bulk writes stream the same way ([[Client#MessageOut]]
  * frames packets as rows encode). TDS is a binary protocol —
  * values decode from their wire encodings (INTN/FLTN/BITN length-
  * prefixed, NVARCHAR UCS-2 with byte-length, NUMERICN sign+magnitude,
  * DATETIME2N scaled-time + days), not text.
  *
  * Auth: SQL authentication over LOGIN7 with the spec's password
  * obfuscation (nibble swap XOR 0xA5). PRELOGIN negotiates
  * ENCRYPT_NOT_SUP by default; `Conn(encrypt = true)` negotiates
  * ENCRYPT_ON and tunnels the TLS handshake inside PRELOGIN packets
  * ([[WireTls.TdsTunnel]]), after which every packet — LOGIN7
  * included — rides inside TLS records. Entra/fed_auth tokens remain
  * the one documented seam (the reference shells to the Azure CLI,
  * database_sqlserver.go:677).
  */
object Tds {

  /** `encrypt = true` negotiates ENCRYPT_ON in PRELOGIN and tunnels the
    * TLS handshake inside PRELOGIN-type packets per [MS-TDS], after
    * which every TDS packet (LOGIN7 included — credentials never travel
    * plaintext) rides inside TLS records — the flow behind the
    * reference's `encrypt=true` connection option
    * (`database_sqlserver.go:677`). `caPem` pins a private CA. */
  final case class Conn(host: String, port: Int, database: String,
      user: String = "graft", password: String = "",
      encrypt: Boolean = false, caPem: Option[String] = None)
    extends Serializable

  /** Wire type codes we speak ([MS-TDS] TYPE_INFO). */
  object T {
    val IntN = 0x26 // 1/2/4/8-byte integers
    val BitN = 0x68
    val NumericN = 0x6c
    val FltN = 0x6d // 4/8-byte floats
    val DateTime2N = 0x2a
    val DateN = 0x28
    val NVarChar = 0xe7
  }

  /** One column: name, type code, max length (IntN/FltN size; NVarChar
    * byte cap), precision, scale. */
  final case class ColMeta(name: String, tpe: Int, maxLen: Int,
      prec: Int = 0, scale: Int = 0)

  final class TdsError(val number: Int, message: String)
    extends IOException(message)

  // packet types
  private val PkSqlBatch = 0x01
  private val PkBulkLoad = 0x07
  private val PkLogin7 = 0x10
  private val PkPreLogin = 0x12
  private val PkReply = 0x04

  // tokens
  private val TokColMetaData = 0x81
  private val TokError = 0xaa
  private val TokInfo = 0xab
  private val TokLoginAck = 0xad
  private val TokRow = 0xd1
  private val TokEnvChange = 0xe3
  private val TokDone = 0xfd
  private val TokDoneProc = 0xfe
  private val TokDoneInProc = 0xff

  /** One socket speaking TDS 7.4. Not thread-safe. */
  final class Client(conn: Conn) extends AutoCloseable {
    private var socket: Socket = {
      val s = new Socket()
      s.connect(new InetSocketAddress(conn.host, conn.port), 10000)
      s.setSoTimeout(120000)
      s
    }
    private var in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream, 1 << 16))
    private var out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)

    // ---- packet framing: 8-byte header, messages span packets ------------

    private def sendMessage(tpe: Int, payload: Array[Byte]): Unit = {
      val max = 4088
      var off = 0
      var id = 1
      while (off < payload.length || off == 0) {
        val n = math.min(max, payload.length - off)
        val last = off + n >= payload.length
        out.write(tpe)
        out.write(if (last) 0x01 else 0x00) // status: EOM on final
        val len = n + 8
        out.write((len >> 8) & 0xff); out.write(len & 0xff) // BIG endian
        out.write(0); out.write(0) // spid
        out.write(id & 0xff); out.write(0) // packet id, window
        out.write(payload, off, n)
        off += n
        id += 1
        if (payload.isEmpty) off = 1 // lone empty payload packet
      }
      out.flush()
    }

    /** Reassemble one full server message (all packets to EOM). */
    private def readMessage(): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      var eom = false
      while (!eom) {
        val tpe = in.read()
        if (tpe < 0) throw new IOException("connection closed by server")
        val status = in.read()
        val len = (in.read() << 8) | in.read()
        in.skipBytes(4) // spid, packet id, window
        val body = new Array[Byte](len - 8)
        in.readFully(body)
        buf.write(body)
        eom = (status & 0x01) != 0
      }
      buf.toByteArray
    }

    // ---- pre-login + login ------------------------------------------------

    {
      // PRELOGIN: VERSION + ENCRYPTION + terminator
      val plOpts = Seq((0, Array[Byte](12, 0, 4, 0, 0, 0)), // version 12.0.4
        (1, Array[Byte](if (conn.encrypt) 1 else 2))) // ENCRYPT_ON / NOT_SUP
      val headerLen = plOpts.size * 5 + 1
      val pl = new ByteArrayOutputStream()
      var dataOff = headerLen
      plOpts.foreach { case (tok, data) =>
        pl.write(tok)
        pl.write((dataOff >> 8) & 0xff); pl.write(dataOff & 0xff)
        pl.write((data.length >> 8) & 0xff); pl.write(data.length & 0xff)
        dataOff += data.length
      }
      pl.write(0xff)
      plOpts.foreach { case (_, data) => pl.write(data) }
      sendMessage(PkPreLogin, pl.toByteArray)
      readMessage() // server's prelogin reply

      if (conn.encrypt) {
        // [MS-TDS] encryption: the TLS handshake records travel inside
        // PRELOGIN-type packets (the tunnel frames them); once complete
        // every TDS packet rides inside raw TLS records
        val tunnel = new WireTls.TdsTunnel(socket)
        val ssl = WireTls.clientWrap(tunnel, conn.host,
          WireTls.clientContext(conn.caPem),
          protocols = Seq("TLSv1.2")) // see WireTls.clientWrap scaladoc
        tunnel.framing = false
        socket = ssl
        in = new DataInputStream(
          new BufferedInputStream(ssl.getInputStream, 1 << 16))
        out = new BufferedOutputStream(ssl.getOutputStream, 1 << 16)
      }

      // LOGIN7
      sendMessage(PkLogin7, login7Payload())
      val reply = new TokenReader(readMessage())
      var acked = false
      while (reply.hasMore) reply.next() match {
        case LoginAck => acked = true
        case Err(e) => throw e
        case _ => ()
      }
      if (!acked) throw new IOException("login not acknowledged")
    }

    private def login7Payload(): Array[Byte] = {
      def ucs2(s: String): Array[Byte] = s.getBytes(UTF_16LE)
      // [MS-TDS] password obfuscation: per byte, swap nibbles, XOR 0xA5
      def obfuscate(b: Array[Byte]): Array[Byte] = b.map { x =>
        ((((x & 0x0f) << 4) | ((x & 0xf0) >> 4)) ^ 0xa5).toByte
      }
      val host = ucs2("graft")
      val user = ucs2(conn.user)
      val pass = obfuscate(ucs2(conn.password))
      val app = ucs2("graft-spark")
      val server = ucs2(conn.host)
      val lib = ucs2("graft-tds")
      val db = ucs2(conn.database)

      val fixed = 94 // fixed-length portion of LOGIN7
      val fields = Seq(host, user, pass, app, server,
        Array.emptyByteArray /* extension */, lib,
        Array.emptyByteArray /* language */, db)
      val b = ByteBuffer.allocate(fixed +
        fields.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0) // total length, patched below
      b.putInt(0x74000004) // TDS 7.4
      b.putInt(4096) // packet size
      b.putInt(7) // client prog version
      b.putInt(1) // pid
      b.putInt(0) // connection id
      b.put(0xe0.toByte) // flags1: ODBC-ish defaults
      b.put(0x03.toByte) // flags2: init lang + odbc
      b.put(0.toByte) // type flags
      b.put(0.toByte) // flags3
      b.putInt(0) // timezone
      b.putInt(0x409) // lcid en-US
      var off = fixed
      fields.foreach { f =>
        b.putShort(off.toShort)
        b.putShort((f.length / 2).toShort) // cch (UCS-2 chars)
        off += f.length
      }
      b.put(Array[Byte](1, 2, 3, 4, 5, 6)) // client MAC
      b.putShort(off.toShort); b.putShort(0) // SSPI
      b.putShort(off.toShort); b.putShort(0) // atch db file
      b.putShort(off.toShort); b.putShort(0) // change password
      b.putInt(0) // cbSSPILong
      fields.foreach(f => b.put(f))
      val payload = b.array()
      val lenB = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length).array()
      System.arraycopy(lenB, 0, payload, 0, 4)
      payload
    }

    // ---- queries ------------------------------------------------------------

    private def allHeaders(): Array[Byte] = {
      // ALL_HEADERS with the mandatory transaction-descriptor header
      val b = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(22); b.putInt(18); b.putShort(2)
      b.putLong(0); b.putInt(1)
      b.array()
    }

    /** Run one batch with a STREAMING decode: tokens (and the values
      * inside them) are read straight off the packet cursor as the
      * returned iterator is consumed — O(row) memory, a result slice
      * never accumulates on the executor. The connection is busy until
      * the iterator drains (or the client closes). */
    def queryStream(sql: String): (Seq[ColMeta], Iterator[Seq[Any]]) = {
      sendMessage(PkSqlBatch, allHeaders() ++ sql.getBytes(UTF_16LE))
      val r = new TokenReader(new PacketLeIn(in))
      var cols: Seq[ColMeta] = Nil
      var pending: Seq[Any] = null
      def advance(): Unit = {
        pending = null
        var scanning = true
        while (scanning && r.hasMore) r.next() match {
          case Meta(m) => cols = m
          case RowTok(v) => pending = v; scanning = false
          case Err(e) =>
            // drain the rest of the reply (DONE trails the ERROR) so the
            // connection stays usable for the next command
            while (r.hasMore) r.next() match { case _ => () }
            throw e
          case _ => ()
        }
      }
      advance()
      (cols, new Iterator[Seq[Any]] {
        def hasNext: Boolean = pending != null
        def next(): Seq[Any] = {
          val v = pending; advance(); v
        }
      })
    }

    /** Run one batch; returns (columns, rows) fully drained — control
      * statements and bounded probes ([[queryStream]] is the data path). */
    def query(sql: String): (Seq[ColMeta], Seq[Seq[Any]]) = {
      val (cols, it) = queryStream(sql)
      (cols, it.toVector)
    }

    /** Run a statement for its side effect; returns DONE's row count. */
    def execute(sql: String): Long = {
      sendMessage(PkSqlBatch, allHeaders() ++ sql.getBytes(UTF_16LE))
      val r = new TokenReader(readMessage())
      var n = 0L
      while (r.hasMore) r.next() match {
        case DoneTok(rows) => n = math.max(n, rows)
        case Err(e) => throw e
        case _ => ()
      }
      n
    }

    /** Frames an outgoing message as bytes flow: full packets go to the
      * wire as they fill, EOM goes out on [[finish]] — the bulk stream
      * never materializes ([[bulkInsert]] encodes rows straight into
      * this, so a partition's bulk payload is O(packet) on the
      * executor, matching the read path's O(row)). */
    private final class MessageOut(tpe: Int) extends java.io.OutputStream {
      private val buf = new Array[Byte](4088)
      private var n = 0
      private var id = 1
      private def packet(last: Boolean): Unit = {
        out.write(tpe)
        out.write(if (last) 0x01 else 0x00)
        val len = n + 8
        out.write((len >> 8) & 0xff); out.write(len & 0xff)
        out.write(0); out.write(0) // spid
        out.write(id & 0xff); out.write(0) // packet id, window
        out.write(buf, 0, n)
        n = 0; id += 1
      }
      override def write(b: Int): Unit = {
        if (n == buf.length) packet(false)
        buf(n) = b.toByte; n += 1
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        var o = off; var left = len
        while (left > 0) {
          if (n == buf.length) packet(false)
          val take = math.min(buf.length - n, left)
          System.arraycopy(b, o, buf, n, take)
          n += take; o += take; left -= take
        }
      }
      def finish(): Unit = { packet(true); out.flush() }
    }

    /** The BCP wire path: `INSERT BULK` batch, then one BulkLoadBCP
      * message — client-authored COLMETADATA + ROW tokens + DONE
      * ([MS-TDS] Bulk Load BCP; what the bcp tool the reference shells
      * out to actually sends), streamed packet-by-packet as rows encode.
      * Returns the server-acknowledged count. */
    def bulkInsert(table: String, cols: Seq[ColMeta],
        rows: Iterator[Seq[Any]]): Long = {
      val colDefs = cols.map(c => s"[${c.name}] ${sqlTypeName(c)}")
      execute(s"INSERT BULK $table (${colDefs.mkString(", ")})")

      val body = new MessageOut(PkBulkLoad)
      // COLMETADATA
      body.write(TokColMetaData)
      val hdr = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(cols.size.toShort)
      body.write(hdr.array())
      cols.foreach { c =>
        val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(0) // usertype
        b.putShort(0x09) // flags: nullable + updatable
        b.put(c.tpe.toByte)
        c.tpe match {
          case T.IntN | T.FltN | T.BitN => b.put(c.maxLen.toByte)
          case T.DateN => ()
          case T.DateTime2N => b.put(c.scale.toByte)
          case T.NumericN =>
            b.put(17.toByte); b.put(c.prec.toByte); b.put(c.scale.toByte)
          case T.NVarChar =>
            b.putShort(c.maxLen.toShort)
            b.put(Array[Byte](0x09, 0x04, 0, 0, 0)) // collation
        }
        val name = c.name.getBytes(UTF_16LE)
        b.put((name.length / 2).toByte); b.put(name)
        body.write(b.array(), 0, b.position())
      }
      var n = 0L
      rows.foreach { r =>
        body.write(TokRow)
        r.zip(cols).foreach { case (v, c) => writeWireValue(body, v, c) }
        n += 1
      }
      // DONE: final count
      val done = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
      done.put(TokDone.toByte).putShort(0x10).putShort(0).putLong(n)
      body.write(done.array())
      body.finish()
      val r2 = new TokenReader(readMessage())
      var acked = 0L
      while (r2.hasMore) r2.next() match {
        case DoneTok(rows) => acked = math.max(acked, rows)
        case Err(e) => throw e
        case _ => ()
      }
      acked
    }

    override def close(): Unit = socket.close()
  }

  // ---- shared token stream + wire value codec (client + loopback) ----------

  private[sources] sealed trait Token
  private[sources] case object LoginAck extends Token
  private[sources] final case class Meta(cols: Seq[ColMeta]) extends Token
  private[sources] final case class RowTok(vals: Seq[Any]) extends Token
  private[sources] final case class DoneTok(rows: Long) extends Token
  private[sources] final case class Err(e: TdsError) extends Token
  private[sources] case object Skip extends Token

  /** Little-endian cursor the token/value codec reads from. Two
    * shapes: a reassembled byte array (login replies, the loopback's
    * client-message decode) and a live packet stream ([[PacketLeIn]] —
    * the client's data path, which never holds a result message in
    * memory). */
  private[sources] trait LeIn {
    def u1(): Int
    def i8(): Byte
    def i16(): Short
    def i32(): Int
    def i64(): Long
    def bytes(n: Int): Array[Byte]
    def skip(n: Int): Unit
    def hasMore: Boolean
    final def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    final def f64(): Double = java.lang.Double.longBitsToDouble(i64())
  }

  private[sources] final class ArrayLeIn(msg: Array[Byte]) extends LeIn {
    private val b = ByteBuffer.wrap(msg).order(ByteOrder.LITTLE_ENDIAN)
    def u1(): Int = b.get() & 0xff
    def i8(): Byte = b.get()
    def i16(): Short = b.getShort
    def i32(): Int = b.getInt
    def i64(): Long = b.getLong
    def bytes(n: Int): Array[Byte] = {
      val raw = new Array[Byte](n); b.get(raw); raw
    }
    def skip(n: Int): Unit = b.position(b.position() + n)
    def hasMore: Boolean = b.remaining() > 0
  }

  /** Reads one server message straight off the packet stream: headers
    * are unwrapped as bytes flow, values may span packet boundaries, and
    * only the bytes of the value being decoded are ever resident — the
    * O(batch) decode path ([[Client.queryStream]]). After the EOM
    * packet's last byte, [[hasMore]] is false and the socket is ready
    * for the next request. */
  private[sources] final class PacketLeIn(in: DataInputStream) extends LeIn {
    private var remaining = 0 // payload bytes left in the current packet
    private var eom = false

    private def ensure(): Unit = {
      while (remaining == 0) {
        if (eom) throw new IOException("read past end of TDS message")
        val tpe = in.read()
        if (tpe < 0) throw new IOException("connection closed by server")
        in.read() match { case s => eom = (s & 0x01) != 0 }
        val len = (in.read() << 8) | in.read()
        in.skipBytes(4) // spid, packet id, window
        remaining = len - 8
      }
    }
    def u1(): Int = {
      ensure()
      val b = in.read()
      if (b < 0) // mid-packet EOF must fail loudly, not decode as 0xff
        throw new java.io.EOFException("connection closed by server")
      remaining -= 1
      b
    }
    def i8(): Byte = u1().toByte
    def i16(): Short = (u1() | (u1() << 8)).toShort
    def i32(): Int = u1() | (u1() << 8) | (u1() << 16) | (u1() << 24)
    def i64(): Long = {
      var v = 0L
      (0 until 8).foreach(i => v |= (u1().toLong << (8 * i)))
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val raw = new Array[Byte](n)
      var off = 0
      while (off < n) {
        ensure()
        val take = math.min(remaining, n - off)
        in.readFully(raw, off, take)
        remaining -= take; off += take
      }
      raw
    }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(remaining, left)
        in.skipBytes(take)
        remaining -= take; left -= take
      }
    }
    def hasMore: Boolean = remaining > 0 || !eom
  }

  /** Scans a TDS message token by token — from a reassembled array or
    * streaming off the live packet cursor. Shared by the client (server
    * replies) and the loopback server (the client-authored BulkLoadBCP
    * message uses the same COLMETADATA/ROW/DONE layout). */
  private[sources] final class TokenReader(b: LeIn) {
    def this(msg: Array[Byte]) = this(new ArrayLeIn(msg))
    private var meta: Seq[ColMeta] = Nil
    def hasMore: Boolean = b.hasMore

    private def bVarchar(): String =
      new String(b.bytes((b.u1()) * 2), UTF_16LE)
    private def usVarchar(): String =
      new String(b.bytes((b.i16() & 0xffff) * 2), UTF_16LE)

    def next(): Token = b.u1() match {
      case TokLoginAck =>
        val len = b.i16() & 0xffff
        b.skip(len); LoginAck
      case TokEnvChange | TokInfo =>
        val len = b.i16() & 0xffff
        b.skip(len); Skip
      case TokError =>
        val len = b.i16() & 0xffff
        val number = b.i32()
        b.i8(); b.i8() // state, class
        val msg = usVarchar()
        b.skip(len - 4 - 2 - 2 - msg.length * 2)
        Err(new TdsError(number, s"tds error $number: $msg"))
      case TokColMetaData =>
        val n = b.i16() & 0xffff
        meta = (0 until n).map { _ =>
          b.i32() // usertype
          b.i16() // flags
          val tpe = b.u1()
          val cm = tpe match {
            case T.IntN | T.FltN | T.BitN =>
              ColMeta("", tpe, b.u1())
            case T.DateN =>
              ColMeta("", tpe, 3)
            case T.DateTime2N =>
              val scale = b.u1()
              ColMeta("", tpe, 0, scale = scale)
            case T.NumericN =>
              val ml = b.u1()
              val p = b.u1(); val sc = b.u1()
              ColMeta("", tpe, ml, p, sc)
            case T.NVarChar =>
              val ml = b.i16() & 0xffff
              b.skip(5) // collation
              ColMeta("", tpe, ml)
            case other =>
              throw new IOException(f"unsupported TDS type 0x$other%02x")
          }
          cm.copy(name = bVarchar())
        }
        Meta(meta)
      case TokRow =>
        RowTok(meta.map(c => readWireValue(b, c)))
      case TokDone | TokDoneProc | TokDoneInProc =>
        b.i16(); b.i16() // status, curcmd
        DoneTok(b.i64())
      case other =>
        throw new IOException(f"unsupported token 0x$other%02x")
    }
  }

  /** Decode one wire value per its column metadata. */
  private[sources] def readWireValue(b: LeIn, c: ColMeta): Any =
    c.tpe match {
      case T.IntN =>
        b.u1() match {
          case 0 => null
          case 1 => b.i8()
          case 2 => b.i16()
          case 4 => b.i32()
          case 8 => b.i64()
        }
      case T.BitN =>
        b.u1() match {
          case 0 => null
          case 1 => b.i8() != 0
        }
      case T.FltN =>
        b.u1() match {
          case 0 => null
          case 4 => b.f32()
          case 8 => b.f64()
        }
      case T.NumericN =>
        val n = b.u1()
        if (n == 0) null
        else {
          val sign = b.i8() // 1 = positive
          val mag = b.bytes(n - 1)
          val unscaled = BigInt(1, mag.reverse.toArray) // LE magnitude → BE
          val v = new java.math.BigDecimal(unscaled.bigInteger, c.scale)
          if (sign == 0) v.negate() else v
        }
      case T.DateN =>
        val n = b.u1()
        if (n == 0) null
        else {
          val raw = b.bytes(3)
          val days = (raw(0) & 0xff) | ((raw(1) & 0xff) << 8) |
            ((raw(2) & 0xff) << 16)
          java.time.LocalDate.of(1, 1, 1).plusDays(days.toLong)
        }
      case T.DateTime2N =>
        val n = b.u1()
        if (n == 0) null
        else {
          val timeBytes = n - 3
          val raw = b.bytes(n)
          var t = 0L
          (timeBytes - 1 to 0 by -1).foreach(i =>
            t = (t << 8) | (raw(i) & 0xff))
          val days = (raw(timeBytes) & 0xff) |
            ((raw(timeBytes + 1) & 0xff) << 8) |
            ((raw(timeBytes + 2) & 0xff) << 16)
          val nanos = t * math.pow(10, 9 - c.scale).toLong
          java.time.LocalDate.of(1, 1, 1).plusDays(days.toLong)
            .atStartOfDay.plusNanos(nanos)
        }
      case T.NVarChar =>
        val n = b.i16() & 0xffff
        if (n == 0xffff) null
        else new String(b.bytes(n), UTF_16LE)
    }

private[sources] def writeWireValue(o: java.io.OutputStream, v: Any,
      c: ColMeta): Unit = c.tpe match {
    case T.IntN =>
      if (v == null) o.write(0)
      else {
        o.write(c.maxLen)
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        v match {
          case x: Byte => b.putLong(x.toLong)
          case x: Short => b.putLong(x.toLong)
          case x: Int => b.putLong(x.toLong)
          case x: Long => b.putLong(x)
        }
        o.write(b.array(), 0, c.maxLen)
      }
    case T.BitN =>
      if (v == null) o.write(0)
      else { o.write(1); o.write(if (v.asInstanceOf[Boolean]) 1 else 0) }
    case T.FltN =>
      if (v == null) o.write(0)
      else {
        o.write(c.maxLen)
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        if (c.maxLen == 4) b.putFloat(v match {
          case f: Float => f; case d: Double => d.toFloat
        })
        else b.putDouble(v match {
          case f: Float => f.toDouble; case d: Double => d
        })
        o.write(b.array(), 0, c.maxLen)
      }
    case T.NumericN =>
      if (v == null) o.write(0)
      else {
        val d = v.asInstanceOf[java.math.BigDecimal]
          .setScale(c.scale, java.math.RoundingMode.HALF_UP)
        val unscaled = d.unscaledValue()
        val mag = unscaled.abs().toByteArray.reverse // BE → LE
        o.write(17)
        o.write(if (unscaled.signum() < 0) 0 else 1)
        o.write(mag, 0, math.min(mag.length, 16))
        (mag.length until 16).foreach(_ => o.write(0))
      }
    case T.DateN =>
      if (v == null) o.write(0)
      else {
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1, 1, 1), v match {
            case d: java.time.LocalDate => d
            case d: java.sql.Date => d.toLocalDate
          }).toInt
        o.write(3)
        o.write(days & 0xff); o.write((days >> 8) & 0xff)
        o.write((days >> 16) & 0xff)
      }
    case T.DateTime2N =>
      if (v == null) o.write(0)
      else {
        val ldt = v match {
          case t: java.time.LocalDateTime => t
          case t: java.sql.Timestamp => t.toLocalDateTime
        }
        val timeBytes = if (c.scale <= 2) 3 else if (c.scale <= 4) 4 else 5
        val t = ldt.toLocalTime.toNanoOfDay /
          math.pow(10, 9 - c.scale).toLong
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1, 1, 1), ldt.toLocalDate).toInt
        o.write(timeBytes + 3)
        (0 until timeBytes).foreach(i => o.write(((t >> (8 * i)) & 0xff).toInt))
        o.write(days & 0xff); o.write((days >> 8) & 0xff)
        o.write((days >> 16) & 0xff)
      }
    case T.NVarChar =>
      if (v == null) { o.write(0xff); o.write(0xff) }
      else {
        val raw = v.toString.getBytes(UTF_16LE)
        o.write(raw.length & 0xff); o.write((raw.length >> 8) & 0xff)
        o.write(raw)
      }
  }


  // ---- Spark-type bridges ---------------------------------------------------

  def sparkType(c: ColMeta): DataType = c.tpe match {
    case T.IntN => c.maxLen match {
      case 1 => ByteType; case 2 => ShortType
      case 4 => IntegerType; case _ => LongType
    }
    case T.BitN => BooleanType
    case T.FltN => if (c.maxLen == 4) FloatType else DoubleType
    case T.NumericN => DecimalType(c.prec.max(1).min(38), c.scale.min(37))
    case T.DateN => DateType
    case T.DateTime2N => TimestampNTZType
    case _ => StringType
  }

  def colMetaFor(f: StructField): ColMeta = f.dataType match {
    case ByteType => ColMeta(f.name, T.IntN, 1)
    case ShortType => ColMeta(f.name, T.IntN, 2)
    case IntegerType => ColMeta(f.name, T.IntN, 4)
    case LongType => ColMeta(f.name, T.IntN, 8)
    case BooleanType => ColMeta(f.name, T.BitN, 1)
    case FloatType => ColMeta(f.name, T.FltN, 4)
    case DoubleType => ColMeta(f.name, T.FltN, 8)
    case d: DecimalType => ColMeta(f.name, T.NumericN, 17, d.precision, d.scale)
    case DateType => ColMeta(f.name, T.DateN, 3)
    case TimestampNTZType => ColMeta(f.name, T.DateTime2N, 8, scale = 7)
    case TimestampType => ColMeta(f.name, T.DateTime2N, 8, scale = 7)
    case _ => ColMeta(f.name, T.NVarChar, 8000)
  }

  private def sqlTypeName(c: ColMeta): String = c.tpe match {
    case T.IntN => c.maxLen match {
      case 1 => "TINYINT"; case 2 => "SMALLINT"
      case 4 => "INT"; case _ => "BIGINT"
    }
    case T.BitN => "BIT"
    case T.FltN => if (c.maxLen == 4) "REAL" else "FLOAT"
    case T.NumericN => s"NUMERIC(${c.prec},${c.scale})"
    case T.DateN => "DATE"
    case T.DateTime2N => s"DATETIME2(${c.scale})"
    case _ => s"NVARCHAR(${math.max(1, c.maxLen / 2)})"
  }

  /** Spark external value for a decoded wire value. */
  private def toExternal(v: Any, c: ColMeta): Any = v match {
    case null => null
    case d: java.math.BigDecimal => d
    case x => x
  }

  // ---- partitioned read -----------------------------------------------------

  /** Partitioned distributed read, same shape as [[Pg.read]]. */
  def read(spark: SparkSession, conn: Conn, stream: String,
      partitionColumn: Option[String] = None, splits: Int = 4,
      where: Option[String] = None): DataFrame = {
    val isSql = stream.matches("(?is)\\s*(select|with)\\b[\\s\\S]*")
    val base =
      if (isSql) stream.trim
      else s"SELECT * FROM $stream" +
        where.map(w => s" WHERE $w").getOrElse("")
    val probeSql =
      if (isSql) base
      else s"SELECT TOP 0 * FROM $stream"

    val probe = new Client(conn)
    val cols =
      try probe.query(probeSql)._1
      finally probe.close()
    val schema = StructType(cols.map(c => StructField(c.name, sparkType(c))))
    if (cols.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

    val statements: Seq[String] = partitionColumn match {
      case Some(pc) if !isSql && splits > 1 =>
        val c = new Client(conn)
        val bounds =
          try c.query(s"SELECT min($pc) AS lo, max($pc) AS hi FROM $stream" +
            where.map(w => s" WHERE $w").getOrElse(""))._2
          finally c.close()
        // decoded bounds are typed (LocalDate/LocalDateTime for the
        // temporal wire types) — render to the text forms RangeSplit
        // dispatches on; unsplittable columns fall back to one statement
        def renderBound(v: Any): String = v match {
          case t: java.time.LocalDateTime => t.format(RangeSplit.TsFmt)
          case other => other.toString
        }
        val extra = where.map(w => s" AND ($w)").getOrElse("")
        bounds.headOption.map(r => (r(0), r(1))) match {
          case Some((lo, hi)) if lo != null && hi != null =>
            RangeSplit.predicates(pc, renderBound(lo), renderBound(hi),
              splits, extra)
              .map(_.map(p => s"SELECT * FROM $stream WHERE $p"))
              .getOrElse(
                Seq(base + where.map(w => s" WHERE $w").getOrElse("")))
          case _ => Seq(base + where.map(w => s" WHERE $w").getOrElse(""))
        }
      case _ => Seq(base)
    }

    val connB = conn
    val colsB = cols
    val rdd = spark.sparkContext
      .parallelize(statements.indices, statements.size)
      .flatMap { i =>
        val c = new Client(connB)
        // close on task end even if the iterator is abandoned early
        // (limit, task failure) — not only on full drain
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => c.close()))
        val (_, rows) = c.queryStream(statements(i))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = rows.hasNext; if (!h) c.close(); h }
          def next(): Row = Row.fromSeq(
            rows.next().zip(colsB).map { case (v, cm) => toExternal(v, cm) })
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Distributed INSERT BULK (the BCP wire path): one authenticated
    * connection and one BulkLoadBCP stream per Spark partition. */
  def insert(df: DataFrame, conn: Conn, table: String): Long = {
    val cols = df.schema.fields.map(colMetaFor).toSeq
    df.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator(0L)
      else {
        val c = new Client(conn)
        try Iterator(c.bulkInsert(table, cols,
          rows.map(r => cols.indices.map(r.get))))
        finally c.close()
      }
    }.sum().toLong
  }

  /** Run one statement (TRUNCATE, DDL, …). */
  def execute(conn: Conn, sql: String): Long = {
    val c = new Client(conn)
    try c.execute(sql) finally c.close()
  }
}
