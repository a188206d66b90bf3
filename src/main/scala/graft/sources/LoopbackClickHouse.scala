package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** ClickHouse HTTP loopback for the offline probes and specs: the
  * subset of the HTTP interface [[ClickHouseHttp]] drives — `POST /`
  * with the SQL body, `FORMAT JSONEachRow` both directions — over the
  * shared [[MiniSql]] store (same pattern as [[LoopbackPg]] /
  * [[LoopbackMysql]] for the binary wire protocols).
  *
  * Replies STREAM: SELECT results render row-at-a-time into a chunked
  * response (the probe-scale rule — a materialized 16M-row response
  * string would OOM the fixture before the client ever saw bytes), and
  * INSERT bodies parse line-at-a-time off the request stream.
  */
final class LoopbackClickHouse extends AutoCloseable {

  /** Minimal type codes: numbers render unquoted in JSONEachRow. */
  val Num = 1
  val Txt = 2

  private val store = new MiniSql.Store(
    numeric = _ == Num,
    typeOf = t => (
      if (Seq("int", "bigint", "double", "float", "decimal", "long")
        .exists(t.toLowerCase.startsWith)) Num else Txt, -1),
    textCode = Txt, countCode = Num)

  /** SELECT/DDL statements served — the probe's exactly-once counter. */
  val statements = new AtomicInteger(0)

  def define(table: String, cols: Seq[(String, Int)]): Unit =
    store.define(table, cols.map { case (n, c) => MiniSql.Col(n, c) })

  def load(table: String, rows: Seq[Seq[Any]]): Unit = {
    val t = store.resolve(table)
    rows.foreach(r => t.rows.add(r.map(v => Option(v).map(String.valueOf))))
  }

  def rowCount(table: String): Int = store.rowCount(table)
  def clear(): Unit = store.clearAll()

  private def jsonEscape(sb: java.lang.StringBuilder, s: String): Unit =
    graft.model.JsonText.appendEscaped(sb, s)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val server = com.sun.net.httpserver.HttpServer.create(
    new InetSocketAddress("127.0.0.1", 0), 64)
  private val pool = java.util.concurrent.Executors.newCachedThreadPool()
  server.setExecutor(pool)
  server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    try {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        ex.getRequestBody, "UTF-8"), 1 << 16)
      val first = new java.lang.StringBuilder
      // the statement is everything up to the first newline for
      // INSERT ... FORMAT JSONEachRow bodies; otherwise the whole body
      var c = in.read()
      while (c >= 0 && c != '\n') { first.append(c.toChar); c = in.read() }
      val head = first.toString.trim
      val insertRe =
        """(?is)INSERT\s+INTO\s+([\w`"\.]+)\s+FORMAT\s+JSONEachRow\s*""".r
      head match {
        case insertRe(table) =>
          val t = store.resolve(table)
          val idx = t.cols.indices
          var line = in.readLine()
          var n = 0
          while (line != null) {
            if (line.nonEmpty) {
              val node = mapper.readTree(line)
              store.appendText(t, t.cols.map { col =>
                val v = node.path(col.name)
                if (v.isMissingNode || v.isNull) None else Some(v.asText())
              }, idx)
              n += 1
            }
            line = in.readLine()
          }
          val ok = s"Ok. $n\n".getBytes("UTF-8")
          ex.sendResponseHeaders(200, ok.length.toLong)
          ex.getResponseBody.write(ok)
        case _ =>
          statements.incrementAndGet()
          val rest = new java.lang.StringBuilder(head)
          var line = in.readLine()
          while (line != null) { rest.append(' ').append(line); line = in.readLine() }
          val sql0 = rest.toString.trim
          val sql = """(?is)\s+FORMAT\s+JSONEachRow\s*$""".r
            .replaceAllIn(sql0, "")
          store.run(sql) match {
            case MiniSql.Done(_) =>
              ex.sendResponseHeaders(200, -1)
            case MiniSql.Rows(fields, rows, _) =>
              ex.sendResponseHeaders(200, 0) // chunked: stream rows
              val os = new java.io.BufferedOutputStream(
                ex.getResponseBody, 1 << 16)
              val sb = new java.lang.StringBuilder(256)
              rows.foreach { r =>
                sb.setLength(0)
                sb.append('{')
                var first = true
                fields.zip(r).foreach { case (f, v) =>
                  if (!first) sb.append(',')
                  first = false
                  sb.append('"'); jsonEscape(sb, f.name); sb.append("\":")
                  v match {
                    case None => sb.append("null")
                    case Some(x) if f.code == Num => sb.append(x)
                    case Some(x) =>
                      sb.append('"'); jsonEscape(sb, x); sb.append('"')
                  }
                }
                sb.append("}\n")
                os.write(sb.toString.getBytes("UTF-8"))
              }
              os.flush()
          }
      }
    } catch {
      case e: Throwable =>
        val msg = s"Code: 62. DB::Exception: ${e.getMessage}".getBytes("UTF-8")
        try {
          ex.sendResponseHeaders(500, msg.length.toLong)
          ex.getResponseBody.write(msg)
        } catch { case _: Throwable => }
    } finally ex.close()
  })
  server.start()

  def port: Int = server.getAddress.getPort
  def conn: ClickHouseHttp.Conn =
    ClickHouseHttp.Conn(s"http://127.0.0.1:$port")

  override def close(): Unit = {
    server.stop(0)
    pool.shutdownNow() // non-daemon workers must not outlive the fixture
  }
}
