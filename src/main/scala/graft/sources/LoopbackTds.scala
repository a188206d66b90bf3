package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_16LE
import java.util.concurrent.atomic.AtomicInteger

/** In-process TDS server fixture: enough backend behavior to exercise
  * [[Tds]]'s REAL client end-to-end offline — PRELOGIN (ENCRYPT_NOT_SUP
  * echoed), LOGIN7 with the spec's password de-obfuscation, SQLBatch
  * token-stream replies (COLMETADATA / ROW / DONE / ERROR), and the
  * BulkLoadBCP flow (`INSERT BULK` batch, then parsing the
  * client-authored COLMETADATA + ROW tokens via the shared
  * [[Tds.TokenReader]]).
  *
  * SQL evaluation delegates to [[MiniSql.Store]]; column type codes are
  * the TDS TYPE_INFO bytes with (maxLen, prec, scale) packed in the
  * typmod. Values are stored in text and converted through the shared
  * binary codec on emission/ingest — so a bulk-loaded table reads back
  * through real ROW-token decoding, not an in-memory shortcut.
  */
final class LoopbackTds(user: String = "graft", password: String = "pw",
    tls: Option[javax.net.ssl.SSLContext] = None)
  extends AutoCloseable {

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  /** SQLBatch statements served. */
  val statements = new AtomicInteger(0)
  /** BulkLoadBCP messages accepted. */
  val bulks = new AtomicInteger(0)

  import Tds.{ColMeta, T}

  // typmod packs (maxLen << 16) | (prec << 8) | scale
  private def pack(maxLen: Int, prec: Int, scale: Int): Int =
    (maxLen << 16) | (prec << 8) | scale
  private def metaOf(name: String, code: Int, typmod: Int): ColMeta =
    if (typmod < 0) code match { // no declared typmod (e.g. count(*))
      case T.IntN | T.FltN => ColMeta(name, code, 8)
      case T.BitN => ColMeta(name, code, 1)
      case T.NumericN => ColMeta(name, code, 17, 38, 6)
      case T.DateTime2N => ColMeta(name, code, 0, scale = 7)
      case T.DateN => ColMeta(name, code, 3)
      case _ => ColMeta(name, code, 8000)
    }
    else ColMeta(name, code, (typmod >> 16) & 0xffff,
      (typmod >> 8) & 0xff, typmod & 0xff)

  private val store = new MiniSql.Store(
    numeric = Set(T.IntN, T.FltN, T.NumericN, T.BitN),
    typeOf = t => sqlTypeOf(t),
    textCode = T.NVarChar, countCode = T.IntN,
    temporal = Set(T.DateTime2N))

  // ---- fixture API ---------------------------------------------------------

  def define(table: String, cols: Seq[ColMeta]): Unit =
    store.define(table, cols.map(c =>
      MiniSql.Col(c.name, c.tpe, pack(c.maxLen, c.prec, c.scale))))

  def load(table: String, rows: Seq[Seq[Any]]): Unit = {
    val t = store.resolve(table)
    rows.foreach(r => t.rows.add(r.map(v => Option(v).map(render))))
  }

  def rowCount(table: String): Int = store.rowCount(table)
  def textRows(table: String): Seq[Seq[Option[String]]] = store.textRows(table)

  private def render(v: Any): String = v match {
    case b: Boolean => if (b) "1" else "0"
    case t: java.time.LocalDateTime => t.toString
    case d: java.time.LocalDate => d.toString
    case other => other.toString
  }

  private def sqlTypeOf(t: String): (Int, Int) = {
    val base = t.toLowerCase.replaceAll("[\\[\\]]", "").replaceAll("\\(.*", "").trim
    val pm = """\((\d+)(?:\s*,\s*(\d+))?\)""".r.findFirstMatchIn(t)
    base match {
      case "tinyint" => (T.IntN, pack(1, 0, 0))
      case "smallint" => (T.IntN, pack(2, 0, 0))
      case "int" | "integer" => (T.IntN, pack(4, 0, 0))
      case "bigint" => (T.IntN, pack(8, 0, 0))
      case "bit" => (T.BitN, pack(1, 0, 0))
      case "real" => (T.FltN, pack(4, 0, 0))
      case "float" => (T.FltN, pack(8, 0, 0))
      case "numeric" | "decimal" =>
        val p = pm.map(_.group(1).toInt).getOrElse(18)
        val sc = pm.flatMap(m => Option(m.group(2))).map(_.toInt).getOrElse(0)
        (T.NumericN, pack(17, p, sc))
      case "date" => (T.DateN, pack(3, 0, 0))
      case "datetime2" =>
        (T.DateTime2N, pack(0, 0, pm.map(_.group(1).toInt).getOrElse(7)))
      case _ =>
        (T.NVarChar, pack(pm.map(_.group(1).toInt * 2).getOrElse(8000), 0, 0))
    }
  }

  // ---- text ↔ JVM value bridge (per column meta) ----------------------------

  /** Parse the stored text form into the JVM type the shared binary
    * codec expects for this column. */
  private def fromText(s: String, c: ColMeta): Any = c.tpe match {
    case T.IntN => c.maxLen match {
      case 1 => s.toByte; case 2 => s.toShort
      case 4 => s.toInt; case _ => s.toLong
    }
    case T.BitN => s == "1" || s.equalsIgnoreCase("true")
    case T.FltN => if (c.maxLen == 4) s.toFloat else s.toDouble
    case T.NumericN => new java.math.BigDecimal(s)
    case T.DateN => java.time.LocalDate.parse(s)
    case T.DateTime2N => java.time.LocalDateTime.parse(s)
    case _ => s
  }

  /** Render a decoded wire value back to the store's text form. */
  private def toText(v: Any): String = v match {
    case b: Boolean => if (b) "1" else "0"
    case d: java.math.BigDecimal => d.toPlainString
    case other => other.toString
  }

  // ---- accept loop ----------------------------------------------------------

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      val t = new Thread(() => serve(s), "loopback-tds-conn")
      t.setDaemon(true); t.start()
    } catch { case _: IOException => () }
  }, "loopback-tds-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Probe hygiene: free fixture rows even while lingering serve
    * threads pin this instance. */
  def clear(): Unit = store.clearAll()

  override def close(): Unit = server.close()

  // ---- per-connection protocol ----------------------------------------------

  private def serve(socket0: Socket): Unit = {
    socket0.setSoTimeout(120000)
    var socket = socket0
    var in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream, 1 << 16))
    var out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)

    def readMessage(): (Int, Array[Byte]) = {
      val buf = new ByteArrayOutputStream()
      var tpe = -1
      var eom = false
      while (!eom) {
        val t = in.read()
        if (t < 0) throw new IOException("client gone")
        tpe = t
        val status = in.read()
        val len = (in.read() << 8) | in.read()
        in.skipBytes(4)
        val body = new Array[Byte](len - 8)
        in.readFully(body)
        buf.write(body)
        eom = (status & 0x01) != 0
      }
      (tpe, buf.toByteArray)
    }
    def sendMessage(tpe: Int, payload: Array[Byte]): Unit = {
      val max = 4088
      var off = 0
      while (off < payload.length || off == 0) {
        val n = math.min(max, payload.length - off)
        val last = off + n >= payload.length
        out.write(tpe)
        out.write(if (last) 0x01 else 0x00)
        val len = n + 8
        out.write((len >> 8) & 0xff); out.write(len & 0xff)
        out.write(0); out.write(0); out.write(1); out.write(0)
        out.write(payload, off, n)
        off += n
        if (payload.isEmpty) off = 1
      }
      out.flush()
    }

    def doneToken(rows: Long, o: ByteArrayOutputStream): Unit = {
      val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0xfd.toByte).putShort(0x10).putShort(0).putLong(rows)
      o.write(b.array())
    }
    def errorReply(number: Int, msg: String): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      val m = msg.getBytes(UTF_16LE)
      val body = ByteBuffer.allocate(4 + 1 + 1 + 2 + m.length + 1 + 1 + 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      body.putInt(number).put(1.toByte).put(16.toByte)
      body.putShort((m.length / 2).toShort).put(m)
      body.put(0.toByte) // server name (empty B_VARCHAR)
      body.put(0.toByte) // proc name
      body.putInt(1) // line
      o.write(0xaa)
      val arr = body.array()
      o.write(arr.length & 0xff); o.write((arr.length >> 8) & 0xff)
      o.write(arr)
      doneToken(0, o)
      o.toByteArray
    }

    try {
      // PRELOGIN → echo the negotiated ENCRYPTION
      val (t0, plReq) = readMessage()
      require(t0 == 0x12, s"expected PRELOGIN, got $t0")
      // client's requested ENCRYPTION (option token 1)
      var encClient = 2
      var hp = 0
      while (hp + 5 <= plReq.length && (plReq(hp) & 0xff) != 0xff) {
        val tok = plReq(hp) & 0xff
        val off = ((plReq(hp + 1) & 0xff) << 8) | (plReq(hp + 2) & 0xff)
        if (tok == 1 && off < plReq.length) encClient = plReq(off) & 0xff
        hp += 5
      }
      val encrypt = encClient == 1 && tls.isDefined
      val pl = new ByteArrayOutputStream()
      pl.write(0); pl.write(0); pl.write(11); pl.write(0); pl.write(6)
      pl.write(1); pl.write(0); pl.write(17); pl.write(0); pl.write(1)
      pl.write(0xff)
      pl.write(Array[Byte](16, 0, 0, 0, 0, 0)) // server version
      pl.write(if (encrypt) 1 else 2) // ENCRYPT_ON / ENCRYPT_NOT_SUP
      sendMessage(0x04, pl.toByteArray)

      if (encrypt) {
        out.flush() // reply must be on the wire before the handshake
        // TLS handshake framed in PRELOGIN-type packets, then raw TLS
        // records carry the TDS packets ([MS-TDS] encryption)
        val tunnel = new WireTls.TdsTunnel(socket)
        val ssl = WireTls.serverWrap(tunnel, tls.get)
        tunnel.framing = false
        socket = ssl
        in = new DataInputStream(
          new BufferedInputStream(ssl.getInputStream, 1 << 16))
        out = new BufferedOutputStream(ssl.getOutputStream, 1 << 16)
      }

      // LOGIN7
      val (t1, login) = readMessage()
      require(t1 == 0x10, s"expected LOGIN7, got $t1")
      val lb = ByteBuffer.wrap(login).order(ByteOrder.LITTLE_ENDIAN)
      def fieldAt(pairIndex: Int): (Int, Int) = {
        // offset/length pairs start at byte 36
        val off = (login(36 + pairIndex * 4) & 0xff) |
          ((login(37 + pairIndex * 4) & 0xff) << 8)
        val cch = (login(38 + pairIndex * 4) & 0xff) |
          ((login(39 + pairIndex * 4) & 0xff) << 8)
        (off, cch)
      }
      def strAt(pair: Int): String = {
        val (off, cch) = fieldAt(pair)
        new String(login, off, cch * 2, UTF_16LE)
      }
      val claimedUser = strAt(1)
      val (pOff, pCch) = fieldAt(2)
      val passRaw = java.util.Arrays.copyOfRange(login, pOff, pOff + pCch * 2)
      // undo: XOR 0xA5 then swap nibbles
      val passBytes = passRaw.map { x =>
        val y = (x ^ 0xa5) & 0xff
        (((y & 0x0f) << 4) | ((y & 0xf0) >> 4)).toByte
      }
      val claimedPass = new String(passBytes, UTF_16LE)

      if (claimedUser != user || claimedPass != password) {
        sendMessage(0x04, errorReply(18456,
          s"Login failed for user '$claimedUser'."))
        socket.close(); return
      }
      val ack = new ByteArrayOutputStream()
      ack.write(0xad) // LOGINACK
      val prog = "loopback-tds".getBytes(UTF_16LE)
      val ackLen = 1 + 4 + 1 + prog.length + 4
      ack.write(ackLen & 0xff); ack.write((ackLen >> 8) & 0xff)
      ack.write(1) // interface
      ack.write(Array[Byte](0x04, 0x00, 0x00, 0x74)) // TDS version
      ack.write(prog.length / 2); ack.write(prog)
      ack.write(Array[Byte](16, 0, 0, 0)) // prog version
      doneToken(0, ack)
      sendMessage(0x04, ack.toByteArray)

      // command loop: SQLBatch + BulkLoad
      var pendingBulk: Option[String] = None // table from INSERT BULK
      var live = true
      while (live) {
        val (tpe, msg) =
          try readMessage()
          catch { case _: IOException => live = false; (-1, Array.emptyByteArray) }
        tpe match {
          case -1 => ()
          case 0x01 => // SQLBatch: skip ALL_HEADERS, decode UCS-2
            statements.incrementAndGet()
            val hdrLen = ByteBuffer.wrap(msg).order(ByteOrder.LITTLE_ENDIAN)
              .getInt
            val sql = new String(msg, hdrLen, msg.length - hdrLen, UTF_16LE)
              .trim.stripSuffix(";").trim
            val bulkRe =
              """(?is)INSERT\s+BULK\s+([\w\[\]\.]+)\s*\(.*\)\s*""".r
            sql match {
              case bulkRe(table) =>
                pendingBulk = Some(table.replaceAll("[\\[\\]]", ""))
                val o = new ByteArrayOutputStream()
                doneToken(0, o)
                sendMessage(0x04, o.toByteArray)
              case _ =>
                val po = new PacketOut(out)
                try { runSql(sql, doneToken, po); po.finish() }
                catch {
                  // statement errors surface before any token streams
                  // (parse + table resolution precede the row loop); a
                  // mid-stream codec failure appends ERROR + DONE, which
                  // the protocol allows after rows
                  case e: IOException =>
                    po.write(errorReply(208, e.getMessage)); po.finish()
                  case e: IllegalArgumentException =>
                    po.write(errorReply(102, e.getMessage)); po.finish()
                }
            }
          case 0x07 => // BulkLoadBCP: client-authored COLMETADATA + ROWs
            bulks.incrementAndGet()
            val table = pendingBulk.getOrElse(
              throw new IOException("bulk load without INSERT BULK"))
            pendingBulk = None
            val t = store.resolve(table)
            val tr = new Tds.TokenReader(msg)
            var cols: Seq[ColMeta] = Nil
            // column order is fixed once COLMETADATA arrives — resolving
            // names per ROW token dominated bulk ingest at the 1.6M-row
            // probe step (a measurement-infrastructure artifact, not a
            // client cost)
            var idx: Seq[Int] = Nil
            var n = 0L
            var declared = -1L
            while (tr.hasMore) tr.next() match {
              case Tds.Meta(m) =>
                cols = m
                idx = cols.map(c => t.idxOf(c.name))
              case Tds.RowTok(vals) =>
                store.appendText(t,
                  vals.map(v => Option(v).map(toText)), idx)
                n += 1
              case Tds.DoneTok(rows) => declared = rows
              case _ => ()
            }
            if (declared >= 0 && declared != n)
              throw new IOException(s"bulk row count mismatch: $declared != $n")
            val o = new ByteArrayOutputStream()
            doneToken(n, o)
            sendMessage(0x04, o.toByteArray)
          case other =>
            sendMessage(0x04, errorReply(102, s"unexpected packet $other"))
        }
      }
    } catch {
      case _: IOException =>
        try socket.close() catch { case _: Exception => () }
    }
  }

  // ---- SQL → token stream ----------------------------------------------------

  /** Packet-framed streaming reply writer: token bytes buffer into 4088-
    * byte TDS packets and each full packet flushes to the socket as the
    * result encodes — like a real server, the client sees steady bytes
    * instead of a single reply materialized after the whole scan+encode
    * (which starved its read timeout at the 16M-row probe step). */
  private final class PacketOut(raw: java.io.OutputStream, tpe: Int = 0x04)
      extends java.io.OutputStream {
    private val max = 4088
    private var buf = new ByteArrayOutputStream(max * 2)
    var sentAny = false
    override def write(b: Int): Unit = { buf.write(b); drain() }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      buf.write(b, off, len); drain()
    }
    private def sendPacket(p: Array[Byte], off: Int, len: Int,
        last: Boolean): Unit = {
      sentAny = true
      raw.write(tpe); raw.write(if (last) 0x01 else 0x00)
      val l = len + 8
      raw.write((l >> 8) & 0xff); raw.write(l & 0xff)
      raw.write(0); raw.write(0); raw.write(1); raw.write(0)
      raw.write(p, off, len)
      if (!last) raw.flush()
    }
    private def drain(): Unit = if (buf.size >= max) {
      val a = buf.toByteArray
      var off = 0
      while (a.length - off >= max) {
        sendPacket(a, off, max, last = false); off += max
      }
      buf = new ByteArrayOutputStream(max * 2)
      buf.write(a, off, a.length - off)
    }
    def finish(): Unit = {
      val a = buf.toByteArray
      sendPacket(a, 0, a.length, last = true)
      raw.flush()
      buf.reset()
    }
  }

  /** Run one statement, streaming the token reply into `po` (packets
    * flush as they fill; the caller finishes the message). */
  private def runSql(sqlIn: String,
      doneToken: (Long, ByteArrayOutputStream) => Unit,
      po: PacketOut): Unit = {
    // T-SQL TOP n → the store's LIMIT grammar
    val topRe = """(?is)^SELECT\s+TOP\s+(\d+)\s+""".r
    val sql = topRe.findFirstMatchIn(sqlIn) match {
      case Some(m) =>
        topRe.replaceFirstIn(sqlIn, "SELECT ") + s" LIMIT ${m.group(1)}"
      case None => sqlIn
    }
    store.run(sql) match {
      case MiniSql.Done(tag) =>
        val o = new ByteArrayOutputStream()
        val affected = """INSERT 0 (\d+)""".r.findFirstMatchIn(tag)
          .map(_.group(1).toLong).getOrElse(0L)
        doneToken(affected, o)
        o.writeTo(po)
      case MiniSql.Rows(fields, rows, _) =>
        val metas = fields.map(f => metaOf(f.name, f.code, f.typmod))
        // COLMETADATA
        po.write(0x81)
        po.write(metas.size & 0xff); po.write((metas.size >> 8) & 0xff)
        metas.foreach { c =>
          val b = ByteBuffer.allocate(48 + c.name.length * 2)
            .order(ByteOrder.LITTLE_ENDIAN)
          b.putInt(0); b.putShort(0x09)
          b.put(c.tpe.toByte)
          c.tpe match {
            case T.IntN | T.FltN | T.BitN => b.put(c.maxLen.toByte)
            case T.DateN => ()
            case T.DateTime2N => b.put(c.scale.toByte)
            case T.NumericN =>
              b.put(17.toByte); b.put(c.prec.toByte); b.put(c.scale.toByte)
            case _ =>
              b.putShort((if (c.maxLen > 0) c.maxLen else 8000).toShort)
              b.put(Array[Byte](0x09, 0x04, 0, 0, 0))
          }
          val name = c.name.getBytes(UTF_16LE)
          b.put((name.length / 2).toByte); b.put(name)
          po.write(b.array(), 0, b.position())
        }
        // ROWs through the shared binary codec, metas pre-indexed so the
        // per-row path allocates no zipped pairs
        val metaArr = metas.toArray
        rows.foreach { r =>
          po.write(0xd1)
          var i = 0
          val it = r.iterator
          while (it.hasNext) {
            val v = it.next()
            val c = metaArr(i)
            Tds.writeWireValue(po, v.map(fromText(_, c)).orNull, c)
            i += 1
          }
        }
        val o = new ByteArrayOutputStream()
        doneToken(rows.size.toLong, o)
        o.writeTo(po)
    }
  }
}
