package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** In-process PostgreSQL wire-protocol v3 server fixture: enough backend
  * behavior to exercise [[Pg]]'s REAL client path end-to-end offline —
  * startup (SSLRequest declined), trust / cleartext / MD5 / SCRAM-SHA-256
  * authentication (server-side verifier via [[Scram.ServerSession]]),
  * the simple-query cycle (RowDescription / DataRow / CommandComplete /
  * ReadyForQuery / ErrorResponse), and `COPY … FROM STDIN (FORMAT text)`
  * (CopyInResponse / CopyData / CopyDone).
  *
  * The SQL surface mirrors what graft's PG paths actually issue: CREATE
  * TABLE / DROP / TRUNCATE, INSERT … VALUES, COPY FROM STDIN, and
  * SELECTs with optional conjunctive range WHERE, min/max/count
  * aggregates, ORDER BY and LIMIT — the same scoped-fixture approach as
  * [[LoopbackCql]]/[[LoopbackMongo]]. Rows are held in COPY text form
  * (the protocol is text-format throughout); comparisons parse per the
  * column's type OID.
  */
final class LoopbackPg(authMode: String = "scram-sha-256",
    user: String = "graft", password: String = "pw",
    tls: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  /** Statements served (for exactly-one-scan assertions). */
  val statements = new AtomicInteger(0)
  /** COPY streams accepted (for per-partition fan-out assertions). */
  val copies = new AtomicInteger(0)
  /** DataRow frames emitted (for pushdown assertions: rows that actually
    * crossed the wire, as opposed to rows filtered Spark-side). */
  val rowsServed = new AtomicInteger(0)

  private val store = new MiniSql.Store(
    numeric = Set(Pg.Oid.Int2, Pg.Oid.Int4, Pg.Oid.Int8, Pg.Oid.Float4,
      Pg.Oid.Float8, Pg.Oid.Numeric),
    typeOf = t => (typeOid(t), typmodOf(t)),
    textCode = Pg.Oid.Text, countCode = Pg.Oid.Int8)

  // ---- fixture API --------------------------------------------------------

  def define(table: String, cols: Seq[(String, Int)]): Unit =
    store.define(table, cols.map { case (n, oid) => MiniSql.Col(n, oid) })

  /** Load typed values (rendered to PG text form per the column OID). */
  def load(table: String, rows: Seq[Seq[Any]]): Unit = {
    val t = store.resolve(table)
    rows.foreach(r => t.rows.add(r.zip(t.cols).map { case (v, c) =>
      Option(v).map(render(_, c.code)) }))
  }

  def rowCount(table: String): Int = store.rowCount(table)

  def textRows(table: String): Seq[Seq[Option[String]]] =
    store.textRows(table)

  // PG always renders full seconds ("2024-01-01 00:24:00"), unlike
  // LocalDateTime.toString which elides a zero seconds field
  private val TsOut = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 6, true)
    .toFormatter

  private def render(v: Any, oid: Int): String = v match {
    case b: Boolean => if (b) "t" else "f"
    case b: Array[Byte] =>
      "\\x" + b.map(x => f"${x & 0xff}%02x").mkString
    case t: java.sql.Timestamp => t.toLocalDateTime.format(TsOut)
    case t: java.time.LocalDateTime => t.format(TsOut)
    case t: java.time.Instant =>
      java.time.OffsetDateTime.ofInstant(t, java.time.ZoneOffset.UTC)
        .toLocalDateTime.format(TsOut) + "+00"
    case d: java.time.LocalDate => d.toString
    case d: java.sql.Date => d.toLocalDate.toString
    case other => other.toString
  }

  // ---- accept loop --------------------------------------------------------

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      val t = new Thread(() => serve(s), "loopback-pg-conn")
      t.setDaemon(true); t.start()
    } catch { case _: IOException => () }
  }, "loopback-pg-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Probe hygiene: free fixture rows even while lingering serve
    * threads pin this instance (listener close alone doesn't). */
  def clear(): Unit = store.clearAll()

  override def close(): Unit = server.close()

  // ---- per-connection protocol -------------------------------------------

  private def serve(socket0: Socket): Unit = {
    socket0.setSoTimeout(120000)
    var socket = socket0
    var in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream, 1 << 16))
    var out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)

    def msg(tpe: Char, body: Array[Byte]): Unit = {
      out.write(tpe)
      out.write(ByteBuffer.allocate(4).putInt(body.length + 4).array())
      out.write(body)
    }
    def cstr(b: ByteBuffer): String = {
      val s = new ByteArrayOutputStream()
      var c = b.get()
      while (c != 0) { s.write(c); c = b.get() }
      new String(s.toByteArray, UTF_8)
    }
    def readFrame(): (Char, ByteBuffer) = {
      val tpe = in.read()
      if (tpe < 0) throw new IOException("client gone")
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      (tpe.toChar, ByteBuffer.wrap(body))
    }
    def authRequest(code: Int, extra: Array[Byte] = Array.emptyByteArray): Unit =
      msg('R', ByteBuffer.allocate(4).putInt(code).array() ++ extra)
    def errorMsg(code: String, m: String): Unit = {
      val b = new ByteArrayOutputStream()
      def f(t: Char, v: String): Unit = {
        b.write(t); b.write(v.getBytes(UTF_8)); b.write(0)
      }
      f('S', "ERROR"); f('C', code); f('M', m); b.write(0)
      msg('E', b.toByteArray)
    }
    def ready(): Unit = { msg('Z', Array('I'.toByte)); out.flush() }
    def complete(tag: String): Unit =
      msg('C', tag.getBytes(UTF_8) :+ 0.toByte)

    try {
      // startup (re-read after answering an SSLRequest)
      var startLen = in.readInt()
      var proto = in.readInt()
      if (proto == 80877103) { // SSLRequest
        tls match {
          case Some(ctx) => // accept → TLS handshake → protocol continues
            out.write('S'); out.flush()
            socket = WireTls.serverWrap(socket, ctx)
            in = new DataInputStream(
              new BufferedInputStream(socket.getInputStream, 1 << 16))
            out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
          case None => // decline, plaintext continues
            out.write('N'); out.flush()
        }
        startLen = in.readInt(); proto = in.readInt()
      }
      require(proto == 196608, s"unsupported protocol $proto")
      val params = new Array[Byte](startLen - 8)
      in.readFully(params)
      val kv = new String(params, UTF_8).split("\u0000").filter(_.nonEmpty)
        .grouped(2).collect { case Array(k, v) => k -> v }.toMap
      val claimedUser = kv.getOrElse("user", "")

      // authentication exchange per configured mode
      val ok = authMode match {
        case "trust" => true
        case "password" =>
          authRequest(3); out.flush()
          val (t, b) = readFrame()
          t == 'p' && cstr(b) == password && claimedUser == user
        case "md5" =>
          val salt = Array[Byte](1, 2, 3, 4)
          authRequest(5, salt); out.flush()
          val (t, b) = readFrame()
          val expected = "md5" + Scram.md5Hex(
            Scram.md5Hex((password + user).getBytes(UTF_8)).getBytes(UTF_8)
              ++ salt)
          t == 'p' && cstr(b) == expected
        case "scram-sha-256" =>
          authRequest(10, "SCRAM-SHA-256".getBytes(UTF_8) ++ Array[Byte](0, 0))
          out.flush()
          val (t1, b1) = readFrame()
          require(t1 == 'p', "expected SASLInitialResponse")
          val mech = cstr(b1)
          require(mech == "SCRAM-SHA-256", s"unexpected mechanism $mech")
          val ilen = b1.getInt
          val cf = new Array[Byte](ilen); b1.get(cf)
          val sess = new Scram.ServerSession(password)
          try {
            val sfirst = sess.serverFirst(new String(cf, UTF_8))
            authRequest(11, sfirst.getBytes(UTF_8)); out.flush()
            val (t2, b2) = readFrame()
            require(t2 == 'p', "expected SASLResponse")
            val cfin = new Array[Byte](b2.remaining()); b2.get(cfin)
            val sfin = sess.serverFinal(new String(cfin, UTF_8))
            authRequest(12, sfin.getBytes(UTF_8))
            claimedUser == user
          } catch { case _: IOException => false }
        case other => throw new IllegalArgumentException(
          s"unknown authMode $other")
      }
      if (!ok) {
        errorMsg("28P01",
          s"""password authentication failed for user "$claimedUser"""")
        out.flush(); socket.close(); return
      }
      authRequest(0)
      // minimal ParameterStatus the way a real backend chats
      val ps = new ByteArrayOutputStream()
      ps.write("server_version".getBytes(UTF_8)); ps.write(0)
      ps.write("16.0 (loopback)".getBytes(UTF_8)); ps.write(0)
      msg('S', ps.toByteArray)
      ready()

      // command loop
      var live = true
      while (live) {
        val (tpe, body) = readFrame()
        tpe match {
          case 'X' => live = false; socket.close()
          case 'Q' =>
            val sql = cstr(body).trim.stripSuffix(";").trim
            statements.incrementAndGet()
            try runSql(sql, msg, complete, errorMsg, readFrame,
              () => out.flush())
            catch {
              case e: IOException => errorMsg("42601", e.getMessage)
              case e: IllegalArgumentException => errorMsg("42601", e.getMessage)
            }
            ready()
          case other =>
            errorMsg("08P01", s"unexpected frontend message '$other'")
            ready()
        }
      }
    } catch {
      case _: IOException => try socket.close() catch { case _: Exception => () }
    }
  }

  // ---- SQL evaluation -----------------------------------------------------

  private val CopyRe =
    """(?is)COPY\s+([\w"\.]+)\s*(?:\(([^)]*)\))?\s*FROM\s+STDIN.*""".r

  private def typeOid(t: String): Int = {
    val base = t.toLowerCase.replaceAll("\\(.*", "").trim
    base match {
      case "bool" | "boolean" => Pg.Oid.Bool
      case "int2" | "smallint" => Pg.Oid.Int2
      case "int4" | "int" | "integer" | "serial" => Pg.Oid.Int4
      case "int8" | "bigint" | "bigserial" => Pg.Oid.Int8
      case "float4" | "real" => Pg.Oid.Float4
      case "float8" | "double" | "double precision" => Pg.Oid.Float8
      case "numeric" | "decimal" => Pg.Oid.Numeric
      case "date" => Pg.Oid.Date
      case "timestamp" | "timestamp without time zone" => Pg.Oid.Timestamp
      case "timestamptz" | "timestamp with time zone" => Pg.Oid.Timestamptz
      case "bytea" => Pg.Oid.Bytea
      case "uuid" => Pg.Oid.Uuid
      case "json" => Pg.Oid.Json
      case "jsonb" => Pg.Oid.Jsonb
      case _ => Pg.Oid.Text
    }
  }

  /** typmod for numeric(p,s) declarations so RowDescription carries the
    * declared precision/scale back to the client. */
  private def typmodOf(t: String): Int = {
    val m = """(?i)(?:numeric|decimal)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      .findFirstMatchIn(t)
    m.map(g => ((g.group(1).toInt << 16) | g.group(2).toInt) + 4).getOrElse(-1)
  }

  private def runSql(sql: String,
      msg: (Char, Array[Byte]) => Unit,
      complete: String => Unit,
      errorMsg: (String, String) => Unit,
      readFrame: () => (Char, ByteBuffer),
      flush: () => Unit): Unit = {

    def rowDescription(fields: Seq[MiniSql.Col]): Unit = {
      val b = new ByteArrayOutputStream()
      b.write(ByteBuffer.allocate(2).putShort(fields.size.toShort).array())
      fields.foreach { c =>
        b.write(c.name.getBytes(UTF_8)); b.write(0)
        val fixed = ByteBuffer.allocate(18)
        fixed.putInt(0).putShort(0.toShort).putInt(c.code)
          .putShort((-1).toShort).putInt(c.typmod).putShort(0.toShort)
        b.write(fixed.array())
      }
      msg('T', b.toByteArray)
    }
    def dataRow(vals: Seq[Option[String]]): Unit = {
      rowsServed.incrementAndGet()
      val b = new ByteArrayOutputStream()
      b.write(ByteBuffer.allocate(2).putShort(vals.size.toShort).array())
      vals.foreach {
        case None => b.write(ByteBuffer.allocate(4).putInt(-1).array())
        case Some(v) =>
          val raw = v.getBytes(UTF_8)
          b.write(ByteBuffer.allocate(4).putInt(raw.length).array())
          b.write(raw)
      }
      msg('D', b.toByteArray)
    }

    sql match {
      case CopyRe(name, colsOpt) =>
        val t = store.resolve(name)
        copies.incrementAndGet()
        val cols = Option(colsOpt).filter(_ != null).map(
          _.split(",").map(_.trim.replace("\"", "")).toSeq)
          .getOrElse(t.cols.map(_.name))
        val idx = cols.map(t.idxOf)
        // CopyInResponse: text format, per-column formats
        val g = new ByteArrayOutputStream()
        g.write(0)
        g.write(ByteBuffer.allocate(2).putShort(cols.size.toShort).array())
        cols.foreach(_ => g.write(Array[Byte](0, 0)))
        msg('G', g.toByteArray)
        flush() // the client blocks on CopyInResponse before streaming
        // drain CopyData until CopyDone / CopyFail
        var rows = 0L
        val lines = new MiniSql.LineAssembler(line => {
          store.appendText(t,
            line.split("\t", -1).toSeq.map(MiniSql.unescapeText), idx)
          rows += 1
        })
        var inCopy = true
        var failed: Option[String] = None
        while (inCopy) {
          val (tpe, b) = readFrame()
          tpe match {
            case 'd' =>
              val raw = new Array[Byte](b.remaining()); b.get(raw)
              lines.push(new String(raw, UTF_8))
            case 'c' => lines.finish(); inCopy = false
            case 'f' => failed = Some("COPY aborted by client"); inCopy = false
            case other =>
              failed = Some(s"unexpected '$other' during COPY"); inCopy = false
          }
        }
        failed match {
          case Some(m) => throw new IOException(m)
          case None => complete(s"COPY $rows")
        }

      case other =>
        store.run(other) match {
          case MiniSql.Done(tag) => complete(tag)
          case MiniSql.Rows(fields, rows, tag) =>
            rowDescription(fields)
            rows.foreach(dataRow)
            complete(tag)
        }
    }
  }
}
