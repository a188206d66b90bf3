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
    user: String = "graft", password: String = "pw") extends AutoCloseable {

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  /** Statements served (for exactly-one-scan assertions). */
  val statements = new AtomicInteger(0)
  /** COPY streams accepted (for per-partition fan-out assertions). */
  val copies = new AtomicInteger(0)

  private final case class Table(cols: Seq[(String, Int)]) {
    val rows = new java.util.Vector[Seq[Option[String]]]()
    def oidOf(c: String): Int = cols.find(_._1.equalsIgnoreCase(c))
      .map(_._2).getOrElse(Pg.Oid.Text)
    def idxOf(c: String): Int = {
      val i = cols.indexWhere(_._1.equalsIgnoreCase(c))
      if (i < 0) throw new IOException(s"column $c does not exist")
      i
    }
  }
  private val tables = new ConcurrentHashMap[String, Table]()

  private def norm(name: String): String =
    name.toLowerCase.stripPrefix("public.").replace("\"", "")

  // ---- fixture API --------------------------------------------------------

  def define(table: String, cols: Seq[(String, Int)]): Unit =
    tables.put(norm(table), Table(cols))

  /** Load typed values (rendered to PG text form per the column OID). */
  def load(table: String, rows: Seq[Seq[Any]]): Unit = {
    val t = tables.get(norm(table))
    rows.foreach(r => t.rows.add(r.zip(t.cols).map { case (v, (_, oid)) =>
      Option(v).map(render(_, oid)) }))
  }

  def rowCount(table: String): Int =
    Option(tables.get(norm(table))).map(_.rows.size).getOrElse(0)

  def textRows(table: String): Seq[Seq[Option[String]]] = {
    import scala.jdk.CollectionConverters._
    tables.get(norm(table)).rows.asScala.toSeq
  }

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

  override def close(): Unit = server.close()

  // ---- per-connection protocol -------------------------------------------

  private def serve(socket: Socket): Unit = {
    socket.setSoTimeout(120000)
    val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream, 1 << 16))
    val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)

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
      // startup (re-read after declining SSLRequest)
      var startLen = in.readInt()
      var proto = in.readInt()
      if (proto == 80877103) { // SSLRequest → decline, plaintext continues
        out.write('N'); out.flush()
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

  private val SelectRe =
    """(?is)SELECT\s+(.*?)\s+FROM\s+([\w"\.]+)(?:\s+WHERE\s+(.*?))?(?:\s+ORDER\s+BY\s+([\w"]+)(\s+DESC)?)?(?:\s+LIMIT\s+(\d+))?\s*""".r
  private val InsertRe =
    """(?is)INSERT\s+INTO\s+([\w"\.]+)\s*\(([^)]*)\)\s*VALUES\s*(.*)""".r
  private val CopyRe =
    """(?is)COPY\s+([\w"\.]+)\s*(?:\(([^)]*)\))?\s*FROM\s+STDIN.*""".r
  private val CreateRe =
    """(?is)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w"\.]+)\s*\((.*)\)\s*""".r
  private val AggRe = """(?i)(min|max|count)\s*\(\s*([\w"\*]+)\s*\)(?:\s+AS\s+([\w"]+))?""".r

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

  private def compare(a: String, b: String, oid: Int): Int = oid match {
    case Pg.Oid.Int2 | Pg.Oid.Int4 | Pg.Oid.Int8 | Pg.Oid.Float4 |
         Pg.Oid.Float8 | Pg.Oid.Numeric =>
      BigDecimal(a).compare(BigDecimal(b))
    case _ => a.compareTo(b) // ISO dates/timestamps/text sort lexically
  }

  private def parseLiteral(tok: String): Option[String] = {
    val t = tok.trim
    if (t.equalsIgnoreCase("null")) None
    else if (t.startsWith("'") && t.endsWith("'"))
      Some(t.substring(1, t.length - 1).replace("''", "'"))
    else if (t.equalsIgnoreCase("true")) Some("t")
    else if (t.equalsIgnoreCase("false")) Some("f")
    else Some(t)
  }

  /** Split on top-level commas (quote-aware). */
  private def splitTop(s: String, open: Char = '(', close: Char = ')'): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' ) { inQ = !inQ; cur.append(c) }
      else if (!inQ && c == open) { depth += 1; cur.append(c) }
      else if (!inQ && c == close) { depth -= 1; cur.append(c) }
      else if (!inQ && c == ',' && depth == 0) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def runSql(sql: String,
      msg: (Char, Array[Byte]) => Unit,
      complete: String => Unit,
      errorMsg: (String, String) => Unit,
      readFrame: () => (Char, ByteBuffer),
      flush: () => Unit): Unit = {

    def resolve(name: String): Table = {
      val t = tables.get(norm(name))
      if (t == null) throw new IOException(s"""relation "$name" does not exist""")
      t
    }

    def rowDescription(fields: Seq[(String, Int, Int)]): Unit = {
      val b = new ByteArrayOutputStream()
      b.write(ByteBuffer.allocate(2).putShort(fields.size.toShort).array())
      fields.foreach { case (name, oid, typmod) =>
        b.write(name.getBytes(UTF_8)); b.write(0)
        val fixed = ByteBuffer.allocate(18)
        fixed.putInt(0).putShort(0.toShort).putInt(oid)
          .putShort((-1).toShort).putInt(typmod).putShort(0.toShort)
        b.write(fixed.array())
      }
      msg('T', b.toByteArray)
    }
    def dataRow(vals: Seq[Option[String]]): Unit = {
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
      case CreateRe(name, colsDef) =>
        val cols = splitTop(colsDef).map(_.trim).filter(_.nonEmpty)
          .filterNot(c => c.toUpperCase.startsWith("PRIMARY KEY") ||
            c.toUpperCase.startsWith("CONSTRAINT"))
          .map { c =>
            val parts = c.split("\\s+", 2)
            (parts(0).replace("\"", ""), parts.lift(1).getOrElse("text"))
          }
        tables.putIfAbsent(norm(name),
          Table(cols.map { case (n, t) => (n, typeOid(t)) }))
        complete("CREATE TABLE")

      case d if d.toUpperCase.startsWith("DROP TABLE") =>
        val name = d.split("\\s+").last
        tables.remove(norm(name))
        complete("DROP TABLE")

      case t if t.toUpperCase.startsWith("TRUNCATE") =>
        val name = t.split("\\s+").last
        resolve(name).rows.clear()
        complete("TRUNCATE TABLE")

      case b if b.toUpperCase.matches("BEGIN|COMMIT|ROLLBACK|SET\\b.*") =>
        complete(b.split("\\s+")(0).toUpperCase)

      case CopyRe(name, colsOpt) =>
        val t = resolve(name)
        copies.incrementAndGet()
        val cols = Option(colsOpt).filter(_ != null).map(
          _.split(",").map(_.trim.replace("\"", "")).toSeq)
          .getOrElse(t.cols.map(_._1))
        val idx = cols.map(t.idxOf)
        // CopyInResponse: text format, per-column formats
        val g = new ByteArrayOutputStream()
        g.write(0)
        g.write(ByteBuffer.allocate(2).putShort(cols.size.toShort).array())
        cols.foreach(_ => g.write(Array[Byte](0, 0)))
        msg('G', g.toByteArray)
        flush() // the client blocks on CopyInResponse before streaming
        // drain CopyData until CopyDone / CopyFail
        val pending = new StringBuilder
        var rows = 0L
        var inCopy = true
        var failed: Option[String] = None
        def flushLines(last: Boolean): Unit = {
          var nl = pending.indexOf("\n")
          while (nl >= 0) {
            val line = pending.substring(0, nl)
            pending.delete(0, nl + 1)
            if (line != "\\.") {
              val vals = line.split("\t", -1).map(unescapeCopy)
              val full = Array.fill[Option[String]](t.cols.size)(None)
              idx.zip(vals).foreach { case (i, v) => full(i) = v }
              t.rows.add(full.toSeq)
              rows += 1
            }
            nl = pending.indexOf("\n")
          }
          if (last && pending.nonEmpty && pending.toString != "\\.") {
            val vals = pending.toString.split("\t", -1).map(unescapeCopy)
            val full = Array.fill[Option[String]](t.cols.size)(None)
            idx.zip(vals).foreach { case (i, v) => full(i) = v }
            t.rows.add(full.toSeq); rows += 1
            pending.clear()
          }
        }
        while (inCopy) {
          val (tpe, b) = readFrame()
          tpe match {
            case 'd' =>
              val raw = new Array[Byte](b.remaining()); b.get(raw)
              pending.append(new String(raw, UTF_8))
              flushLines(last = false)
            case 'c' => flushLines(last = true); inCopy = false
            case 'f' => failed = Some("COPY aborted by client"); inCopy = false
            case other =>
              failed = Some(s"unexpected '$other' during COPY"); inCopy = false
          }
        }
        failed match {
          case Some(m) => throw new IOException(m)
          case None => complete(s"COPY $rows")
        }

      case InsertRe(name, colList, valuesPart) =>
        val t = resolve(name)
        val cols = colList.split(",").map(_.trim.replace("\"", "")).toSeq
        val idx = cols.map(t.idxOf)
        var n = 0
        splitTop(valuesPart).map(_.trim).foreach { tuple =>
          require(tuple.startsWith("(") && tuple.endsWith(")"),
            s"bad VALUES tuple: $tuple")
          val vals = splitTop(tuple.substring(1, tuple.length - 1))
            .map(parseLiteral)
          val full = Array.fill[Option[String]](t.cols.size)(None)
          idx.zip(vals).foreach { case (i, v) => full(i) = v }
          t.rows.add(full.toSeq)
          n += 1
        }
        complete(s"INSERT 0 $n")

      case SelectRe(proj, name, whereOpt, orderOpt, descOpt, limitOpt) =>
        val t = resolve(name)
        import scala.jdk.CollectionConverters._
        var rows: Seq[Seq[Option[String]]] = t.rows.asScala.toSeq

        // WHERE: conjunction of col-op-literal
        Option(whereOpt).filter(_ != null).foreach { w =>
          w.split("(?i)\\s+AND\\s+").foreach { cond =>
            val m = """([\w"\.]+)\s*(>=|<=|<>|!=|=|>|<)\s*(.+)""".r
              .findFirstMatchIn(cond.trim).getOrElse(
                throw new IOException(s"unsupported predicate: $cond"))
            val i = t.idxOf(m.group(1).replace("\"", ""))
            val oid = t.cols(i)._2
            val lit = parseLiteral(m.group(3)).getOrElse(
              throw new IOException("NULL comparison unsupported"))
            val op = m.group(2)
            rows = rows.filter(_(i) match {
              case None => false
              case Some(v) =>
                val c = compare(v, lit, oid)
                op match {
                  case ">=" => c >= 0
                  case "<=" => c <= 0
                  case ">" => c > 0
                  case "<" => c < 0
                  case "=" => c == 0
                  case "<>" | "!=" => c != 0
                }
            })
          }
        }

        val projTrim = proj.trim
        if (AggRe.findFirstIn(projTrim).isDefined &&
            !projTrim.equals("*")) {
          // aggregate projection: min/max/count list
          val aggs = splitTop(projTrim).map(_.trim).map { a =>
            val m = AggRe.findFirstMatchIn(a).getOrElse(
              throw new IOException(s"unsupported projection: $a"))
            (m.group(1).toLowerCase, m.group(2).replace("\"", ""),
              Option(m.group(3)).getOrElse(m.group(1).toLowerCase))
          }
          val fields = aggs.map { case (fn, col, alias) =>
            if (fn == "count") (alias, Pg.Oid.Int8, -1)
            else (alias, t.oidOf(col), -1)
          }
          rowDescription(fields)
          val vals = aggs.map { case (fn, col, _) =>
            if (fn == "count") Some(rows.size.toString)
            else {
              val i = t.idxOf(col)
              val oid = t.cols(i)._2
              val present = rows.flatMap(_(i))
              if (present.isEmpty) None
              else Some(if (fn == "min")
                present.reduce((a, b) => if (compare(a, b, oid) <= 0) a else b)
              else
                present.reduce((a, b) => if (compare(a, b, oid) >= 0) a else b))
            }
          }
          dataRow(vals)
          complete("SELECT 1")
        } else {
          val (names, idx) =
            if (projTrim == "*") (t.cols.map(_._1), t.cols.indices.toSeq)
            else {
              val cs = projTrim.split(",").map(_.trim.replace("\"", "")).toSeq
              (cs, cs.map(t.idxOf))
            }
          Option(orderOpt).filter(_ != null).foreach { oc =>
            val i = t.idxOf(oc.replace("\"", ""))
            val oid = t.cols(i)._2
            rows = rows.sortWith { (a, b) =>
              (a(i), b(i)) match {
                case (None, None) => false
                case (None, _) => true
                case (_, None) => false
                case (Some(x), Some(y)) => compare(x, y, oid) < 0
              }
            }
            if (descOpt != null) rows = rows.reverse
          }
          Option(limitOpt).filter(_ != null)
            .foreach(l => rows = rows.take(l.toInt))
          rowDescription(names.zip(idx).map { case (n, i) =>
            (n, t.cols(i)._2, -1) })
          rows.foreach(r => dataRow(idx.map(r(_))))
          complete(s"SELECT ${rows.size}")
        }

      case other =>
        throw new IOException(s"unsupported statement: ${other.take(80)}")
    }
  }

  /** COPY text-format unescape: \N → NULL, \t \n \r \\ escapes. */
  private def unescapeCopy(s: String): Option[String] = {
    if (s == "\\N") None
    else if (!s.contains('\\')) Some(s)
    else {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 't' => b.append('\t'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case '\\' => b.append('\\'); i += 2
            case other => b.append(other); i += 2
          }
        } else { b.append(c); i += 1 }
      }
      Some(b.toString)
    }
  }
}
