package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicInteger

/** In-process MySQL client/server-protocol fixture: enough backend
  * behavior to exercise [[Mysql]]'s REAL client end-to-end offline —
  * the v10 handshake, mysql_native_password and caching_sha2_password
  * verification (including the fast-auth-success continuation and
  * AuthSwitchRequest), COM_QUERY text resultsets (ColumnDefinition41 /
  * row packets / EOF), and the `LOAD DATA LOCAL INFILE` flow (0xFB
  * request → raw data packets → empty packet → OK with affected rows).
  *
  * SQL evaluation delegates to the shared [[MiniSql.Store]]; type codes
  * are the protocol's ColumnType bytes. Binary columns are out of the
  * fixture's scope (binary fidelity is covered on the PG/bytea and file
  * paths); the UNHEX columns-spec the encoder renders is unit-tested as
  * SQL text, matching how the reference's template is tested.
  */
final class LoopbackMysql(plugin: String = "caching_sha2_password",
    user: String = "graft", password: String = "pw",
    fullAuth: Boolean = false,
    tls: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {

  // RSA keypair for caching_sha2's full-auth public-key exchange
  private lazy val rsaKeys = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  /** COM_QUERY statements served. */
  val statements = new AtomicInteger(0)
  /** COM_QUERY statement texts, in arrival order (assertion surface —
    * e.g. the session `SET time_zone` pin every connection must send). */
  val served = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** LOAD DATA streams accepted. */
  val loads = new AtomicInteger(0)

  import Mysql.T
  private val store = new MiniSql.Store(
    numeric = Set(T.Tiny, T.Short, T.Int24, T.Long, T.LongLong, T.Float,
      T.Double, T.NewDecimal),
    typeOf = t => typeCode(t),
    textCode = T.VarString, countCode = T.LongLong)

  // ---- fixture API --------------------------------------------------------

  /** cols: name → (type code, decimals). */
  def define(table: String, cols: Seq[(String, Int)],
      decimals: Map[String, Int] = Map.empty): Unit =
    store.define(table, cols.map { case (n, t) =>
      MiniSql.Col(n, t, decimals.getOrElse(n, 0)) })

  def load(table: String, rows: Seq[Seq[Any]]): Unit = {
    val t = store.resolve(table)
    rows.foreach(r => t.rows.add(r.zip(t.cols).map { case (v, c) =>
      Option(v).map(render(_, c.code)) }))
  }

  def rowCount(table: String): Int = store.rowCount(table)
  def textRows(table: String): Seq[Seq[Option[String]]] = store.textRows(table)

  private val TsOut = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 6, true)
    .toFormatter

  private def render(v: Any, code: Int): String = v match {
    case b: Boolean => if (b) "1" else "0"
    case t: java.time.LocalDateTime => t.format(TsOut)
    case t: java.time.Instant =>
      java.time.OffsetDateTime.ofInstant(t, java.time.ZoneOffset.UTC)
        .toLocalDateTime.format(TsOut)
    case d: java.time.LocalDate => d.toString
    case other => other.toString
  }

  private def typeCode(t: String): (Int, Int) = {
    val base = t.toLowerCase.replaceAll("\\(.*", "").trim
    val code = base match {
      case "tinyint" | "bool" | "boolean" => T.Tiny
      case "smallint" => T.Short
      case "mediumint" => T.Int24
      case "int" | "integer" => T.Long
      case "bigint" => T.LongLong
      case "float" => T.Float
      case "double" | "real" => T.Double
      case "decimal" | "numeric" => T.NewDecimal
      case "date" => T.Date
      case "datetime" => T.Datetime
      case "timestamp" => T.Timestamp
      case "text" | "varchar" | "char" => T.VarString
      case "json" => T.Json
      case _ => T.VarString
    }
    val dec = """(?i)(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      .findFirstMatchIn(t).map(_.group(2).toInt).getOrElse(0)
    (code, dec)
  }

  // ---- accept loop --------------------------------------------------------

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      val t = new Thread(() => serve(s), "loopback-mysql-conn")
      t.setDaemon(true); t.start()
    } catch { case _: IOException => () }
  }, "loopback-mysql-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Probe hygiene: free fixture rows even while lingering serve
    * threads pin this instance. */
  def clear(): Unit = store.clearAll()

  override def close(): Unit = server.close()

  // ---- per-connection protocol -------------------------------------------

  private def serve(socket0: Socket): Unit = {
    socket0.setSoTimeout(120000)
    var socket = socket0
    var in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream, 1 << 16))
    var out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
    var seq = 0

    def readPacket(): Array[Byte] = {
      val l0 = in.read(); val l1 = in.read(); val l2 = in.read()
      val s = in.read()
      if ((l0 | l1 | l2 | s) < 0) throw new IOException("client gone")
      seq = (s + 1) & 0xff
      val body = new Array[Byte](l0 | (l1 << 8) | (l2 << 16))
      in.readFully(body)
      body
    }
    def sendPacket(body: Array[Byte]): Unit = {
      out.write(body.length & 0xff)
      out.write((body.length >> 8) & 0xff)
      out.write((body.length >> 16) & 0xff)
      out.write(seq & 0xff)
      seq = (seq + 1) & 0xff
      out.write(body)
    }
    def lenencInt(o: ByteArrayOutputStream, v: Long): Unit =
      if (v < 0xfb) o.write(v.toInt)
      else if (v <= 0xffff) {
        o.write(0xfc); o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      } else {
        o.write(0xfd); o.write((v & 0xff).toInt)
        o.write(((v >> 8) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      }
    def lenencStr(o: ByteArrayOutputStream, s: String): Unit = {
      val b = s.getBytes(UTF_8); lenencInt(o, b.length.toLong); o.write(b)
    }
    def okPacket(affected: Long): Unit = {
      val o = new ByteArrayOutputStream()
      o.write(0x00); lenencInt(o, affected); lenencInt(o, 0)
      o.write(Array[Byte](2, 0, 0, 0)) // autocommit status, no warnings
      sendPacket(o.toByteArray); out.flush()
    }
    def errPacket(code: Int, msg: String): Unit = {
      val o = new ByteArrayOutputStream()
      o.write(0xff)
      o.write(code & 0xff); o.write((code >> 8) & 0xff)
      o.write('#'); o.write("HY000".getBytes(UTF_8))
      o.write(msg.getBytes(UTF_8))
      sendPacket(o.toByteArray); out.flush()
    }
    def eofPacket(): Unit = {
      val o = new ByteArrayOutputStream()
      o.write(0xfe); o.write(Array[Byte](0, 0, 2, 0))
      sendPacket(o.toByteArray)
    }

    try {
      // ---- handshake v10 ---------------------------------------------------
      val rnd = new java.security.SecureRandom()
      val nonce = new Array[Byte](20)
      rnd.nextBytes(nonce)
      // avoid NUL bytes: the trailing part is NUL-terminated on the wire
      nonce.indices.foreach(i => if (nonce(i) == 0) nonce(i) = 1)
      val hs = new ByteArrayOutputStream()
      hs.write(10)
      hs.write("8.0.0-loopback".getBytes(UTF_8)); hs.write(0)
      hs.write(Array[Byte](1, 0, 0, 0)) // thread id
      hs.write(nonce, 0, 8); hs.write(0) // auth data part 1 + filler
      val caps = 0x1 | 0x4 | 0x8 | 0x80 | 0x200 | 0x2000 | 0x8000 | 0x80000
      hs.write(caps & 0xff); hs.write((caps >> 8) & 0xff) // cap low
      hs.write(45) // charset utf8mb4
      hs.write(Array[Byte](2, 0)) // status
      hs.write((caps >> 16) & 0xff); hs.write((caps >> 24) & 0xff) // cap high
      hs.write(21) // auth data total length
      hs.write(new Array[Byte](10)) // reserved
      hs.write(nonce, 8, 12); hs.write(0) // auth data part 2 + NUL
      hs.write(plugin.getBytes(UTF_8)); hs.write(0)
      sendPacket(hs.toByteArray); out.flush()

      // ---- handshake response ---------------------------------------------
      var resp = readPacket()
      // a 32-byte response with CLIENT_SSL set is Protocol::SSLRequest:
      // upgrade, then read the real response over TLS
      val respCaps = (resp(0) & 0xff) | ((resp(1) & 0xff) << 8) |
        ((resp(2) & 0xff) << 16) | ((resp(3) & 0xff) << 24)
      if (resp.length == 32 && (respCaps & 0x800) != 0) {
        val ctx = tls.getOrElse(
          throw new IOException("client requested SSL on a plaintext fixture"))
        socket = WireTls.serverWrap(socket, ctx)
        in = new DataInputStream(
          new BufferedInputStream(socket.getInputStream, 1 << 16))
        out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
        resp = readPacket()
      }
      var p = 4 + 4 + 1 + 23 // caps, max packet, charset, reserved
      val userEnd = resp.indexOf(0.toByte, p)
      val claimedUser = new String(resp, p, userEnd - p, UTF_8)
      p = userEnd + 1
      val tokLen = resp(p) & 0xff; p += 1
      val token = java.util.Arrays.copyOfRange(resp, p, p + tokLen)
      p += tokLen
      // database\0 then client plugin\0 (we requested both caps)
      val dbEnd = resp.indexOf(0.toByte, p)
      p = dbEnd + 1
      val plugEnd = resp.indexOf(0.toByte, p)
      val clientPlugin =
        if (plugEnd > p) new String(resp, p, plugEnd - p, UTF_8) else plugin

      var authedToken = token
      if (clientPlugin != plugin) {
        // AuthSwitchRequest with a fresh nonce for OUR plugin
        val sw = new ByteArrayOutputStream()
        sw.write(0xfe)
        sw.write(plugin.getBytes(UTF_8)); sw.write(0)
        sw.write(nonce); sw.write(0)
        sendPacket(sw.toByteArray); out.flush()
        authedToken = readPacket()
      }

      val ok =
        if (plugin == "caching_sha2_password" && fullAuth) {
          // cache miss: demand full authentication — RSA key exchange
          sendPacket(Array[Byte](0x01, 0x04)); out.flush()
          val req = readPacket()
          require(req.length == 1 && req(0) == 0x02,
            "expected public-key request")
          val pem = "-----BEGIN PUBLIC KEY-----\n" +
            java.util.Base64.getMimeEncoder(64, "\n".getBytes)
              .encodeToString(rsaKeys.getPublic.getEncoded) +
            "\n-----END PUBLIC KEY-----\n"
          sendPacket(Array(0x01.toByte) ++ pem.getBytes(UTF_8)); out.flush()
          val blob = readPacket()
          val cipher = javax.crypto.Cipher.getInstance(
            "RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
          cipher.init(javax.crypto.Cipher.DECRYPT_MODE, rsaKeys.getPrivate)
          val xored = cipher.doFinal(blob)
          val plain = xored.indices.map(i =>
            (xored(i) ^ nonce(i % nonce.length)).toByte).toArray
          claimedUser == user && MessageDigest.isEqual(plain,
            password.getBytes(UTF_8) :+ 0.toByte)
        } else claimedUser == user &&
          MessageDigest.isEqual(authedToken, expectedToken(nonce))
      if (!ok) {
        errPacket(1045, s"Access denied for user '$claimedUser'")
        socket.close(); return
      }
      if (plugin == "caching_sha2_password" && !fullAuth) {
        sendPacket(Array[Byte](0x01, 0x03)) // fast auth success
      }
      okPacket(0)

      // ---- command loop ----------------------------------------------------
      var live = true
      while (live) {
        seq = 0
        val cmd = readPacket()
        (cmd(0) & 0xff) match {
          case 0x01 => live = false; socket.close() // COM_QUIT
          case 0x0e => okPacket(0) // COM_PING
          case 0x03 =>
            val sql = new String(cmd, 1, cmd.length - 1, UTF_8)
              .trim.stripSuffix(";").trim
            statements.incrementAndGet()
            served.add(sql)
            try runSql(sql, sendPacket, okPacket, errPacket, eofPacket,
              lenencStr, lenencInt, readPacket, () => out.flush())
            catch {
              case e: IOException => errPacket(1064, e.getMessage)
              case e: IllegalArgumentException => errPacket(1064, e.getMessage)
            }
          case other =>
            errPacket(1047, s"unknown command $other")
        }
      }
    } catch {
      case _: IOException =>
        try socket.close() catch { case _: Exception => () }
    }
  }

  private def expectedToken(nonce: Array[Byte]): Array[Byte] =
    if (password.isEmpty) Array.emptyByteArray
    else plugin match {
      case "mysql_native_password" =>
        val sha1 = MessageDigest.getInstance("SHA-1")
        val p1 = sha1.digest(password.getBytes(UTF_8))
        sha1.reset(); val p2 = sha1.digest(p1)
        sha1.reset(); sha1.update(nonce); sha1.update(p2)
        Scram.xor(p1, sha1.digest())
      case _ => // caching_sha2_password
        val sha = MessageDigest.getInstance("SHA-256")
        val p1 = sha.digest(password.getBytes(UTF_8))
        sha.reset(); val p2 = sha.digest(p1)
        sha.reset(); sha.update(p2); sha.update(nonce)
        Scram.xor(p1, sha.digest())
    }

  // ---- SQL → protocol -----------------------------------------------------

  private val LoadRe =
    """(?is)LOAD\s+DATA\s+LOCAL\s+INFILE\s+'[^']*'\s+INTO\s+TABLE\s+([\w`\.]+)(?:\s+CHARACTER\s+SET\s+\w+)?\s*(?:\(([^)]*)\))?\s*(?:SET\s.*)?""".r

  private def runSql(sql: String,
      sendPacket: Array[Byte] => Unit,
      okPacket: Long => Unit,
      errPacket: (Int, String) => Unit,
      eofPacket: () => Unit,
      lenencStr: (ByteArrayOutputStream, String) => Unit,
      lenencInt: (ByteArrayOutputStream, Long) => Unit,
      readPacket: () => Array[Byte],
      flush: () => Unit): Unit = {

    def columnDef(c: MiniSql.Col): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      lenencStr(o, "def"); lenencStr(o, "graft"); lenencStr(o, "t")
      lenencStr(o, "t"); lenencStr(o, c.name); lenencStr(o, c.name)
      o.write(0x0c)
      o.write(45); o.write(0) // charset utf8mb4
      // display length: enough for NEWDECIMAL precision recovery
      val len = if (c.code == Mysql.T.NewDecimal) 40L else 255L
      o.write((len & 0xff).toInt); o.write(((len >> 8) & 0xff).toInt)
      o.write(0); o.write(0)
      o.write(c.code)
      o.write(0); o.write(0) // flags
      o.write(if (c.typmod > 0) c.typmod else 0) // decimals
      o.write(0); o.write(0) // filler
      o.toByteArray
    }

    sql match {
      case LoadRe(table, colsOpt) =>
        val t = store.resolve(table)
        loads.incrementAndGet()
        if (Option(colsOpt).exists(_.contains("@")))
          throw new IOException(
            "binary @v columns are outside the fixture's scope")
        val cols = Option(colsOpt).filter(_ != null)
          .map(_.split(",").map(_.trim.replaceAll("[`]", "")).toSeq)
          .getOrElse(t.cols.map(_.name))
        val idx = cols.map(t.idxOf)
        sendPacket(Array(0xfb.toByte) ++ "graft".getBytes(UTF_8))
        flush() // client blocks on the LOCAL INFILE request
        var rows = 0L
        val lines = new MiniSql.LineAssembler(line => {
          store.appendText(t,
            line.split("\t", -1).toSeq.map(MiniSql.unescapeText), idx)
          rows += 1
        })
        var inLoad = true
        while (inLoad) {
          val p = readPacket()
          if (p.isEmpty) { lines.finish(); inLoad = false }
          else lines.push(new String(p, UTF_8))
        }
        okPacket(rows)

      case other =>
        store.run(other) match {
          case MiniSql.Done(tag) =>
            val affected = """INSERT 0 (\d+)""".r.findFirstMatchIn(tag)
              .map(_.group(1).toLong).getOrElse(0L)
            okPacket(affected)
          case MiniSql.Rows(fields, rows, _) =>
            val head = new ByteArrayOutputStream()
            lenencInt(head, fields.size.toLong)
            sendPacket(head.toByteArray)
            fields.foreach(f => sendPacket(columnDef(f)))
            eofPacket()
            rows.foreach { r =>
              val o = new ByteArrayOutputStream()
              r.foreach {
                case None => o.write(0xfb)
                case Some(v) => lenencStr(o, v)
              }
              sendPacket(o.toByteArray)
            }
            eofPacket()
            flush()
        }
    }
  }
}
