package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Trino source over the documented client REST protocol (the same wire
  * surface the reference's trino-go-client speaks,
  * database_trino.go): POST the SQL to `/v1/statement`
  * (X-Trino-User/Catalog/Schema headers), then follow `nextUri` pages
  * until the cursor ends, accumulating `columns` + `data` batches;
  * `error` objects raise with Trino's message. Types honor the reported
  * column types for the core scalar set; everything else lands as
  * string.
  *
  * The cursor is a single server-side stream (per protocol), so the
  * driver walks the pages — but it never holds the result set: rows
  * stream straight to [[Spill]] JSONL staging as each page arrives
  * (bounded driver memory, the same never-buffer shape as the
  * reference's channel-fed stream in database_trino.go) and Spark then
  * reads the staged parts distributed. Query-level parallelism comes
  * from running per-partition predicates as separate statements
  * (ChunkedRead's range pattern applies verbatim).
  */
object Trino {

  final case class Conn(baseUrl: String, user: String = "graft",
      catalog: String = "", schema: String = "", token: String = "")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def http(method: String, url: String,
      headers: Map[String, String], body: Option[String],
      retriable: Boolean = true): String =
    if (retriable) HttpRetry.retry(url)(httpOnce(method, url, headers, body))
    else HttpRetry.retryConnectOnly(url)(httpOnce(method, url, headers, body))

  private def httpOnce(method: String, url: String,
      headers: Map[String, String], body: Option[String]): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach(_ => conn.setDoOutput(true)) // config precedes connect
    HttpRetry.connecting(conn.connect())
    body.foreach { b =>
      val os = conn.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    conn.disconnect()
    if (code >= 400)
      throw new HttpRetry.HttpStatusException(code,
        s"trino $code for $url: ${out.take(300)}")
    out
  }

  private def headers(conn: Conn): Map[String, String] = {
    val base = Map("X-Trino-User" -> conn.user,
      "Content-Type" -> "text/plain")
    val withCat = if (conn.catalog.nonEmpty)
      base + ("X-Trino-Catalog" -> conn.catalog) else base
    val withSch = if (conn.schema.nonEmpty)
      withCat + ("X-Trino-Schema" -> conn.schema) else withCat
    if (conn.token.nonEmpty)
      withSch + ("Authorization" -> s"Bearer ${conn.token}") else withSch
  }

  /** Trino type name → Spark type for the core scalar set. */
  private[sources] def sparkType(trino: String): DataType =
    trino.takeWhile(_ != '(') match {
      case "bigint" => LongType
      case "integer" => IntegerType
      case "smallint" => ShortType
      case "tinyint" => ByteType
      case "double" => DoubleType
      case "real" => FloatType
      case "boolean" => BooleanType
      case "date" => DateType
      case "timestamp" => TimestampType
      case t if t == "decimal" =>
        val dims = trino.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
        val parts = dims.split(",").map(_.trim)
        if (parts.length == 2) DecimalType(parts(0).toInt, parts(1).toInt)
        else StringType
      case _ => StringType // varchar, char, json, array/map renders, ...
    }

  /** Walk the statement's page cursor, calling `onColumns` once when the
    * protocol reports the column list and `onRow` per data row (values
    * are the page's parsed JSON cells: Long/Double/Boolean/String/null).
    * Only the current page is ever in memory.
    *
    * `retrySubmit` guards the initial POST: SELECT reads replay safely (a
    * lost-response query is simply abandoned server-side and superseded),
    * but the protocol has no idempotency token, so DML/DDL submitted
    * through [[execute]] must not re-run on a lost response. `nextUri`
    * page GETs always retry — re-fetching an unacknowledged page is the
    * protocol's own recovery mechanism. */
  def walk(conn: Conn, sql: String, retrySubmit: Boolean = true)(
      onColumns: Seq[(String, String)] => Unit,
      onRow: IndexedSeq[Any] => Unit): Unit = {
    var resp = mapper.readTree(http("POST",
      s"${conn.baseUrl}/v1/statement", headers(conn), Some(sql),
      retriable = retrySubmit))
    var colsSeen = false
    var done = false
    while (!done) {
      if (!resp.path("error").isMissingNode) {
        val e = resp.path("error")
        throw new java.sql.SQLException(
          s"trino query failed: ${e.path("message").asText()} " +
            s"(${e.path("errorName").asText()})")
      }
      val cj = resp.path("columns")
      if (!colsSeen && cj.isArray && cj.size() > 0) {
        colsSeen = true
        onColumns((0 until cj.size()).map(i =>
          (cj.get(i).path("name").asText(), cj.get(i).path("type").asText())))
      }
      val data = resp.path("data")
      if (data.isArray) (0 until data.size()).foreach { i =>
        val r = data.get(i)
        onRow((0 until r.size()).map { j =>
          val v = r.get(j)
          if (v.isNull) null
          else if (v.isIntegralNumber) v.asLong()
          else if (v.isFloatingPointNumber) v.asDouble()
          else if (v.isBoolean) v.asBoolean()
          else v.asText()
        })
      }
      val next = resp.path("nextUri").asText("")
      if (next.isEmpty) done = true
      else resp = mapper.readTree(http("GET", next, headers(conn), None))
    }
  }

  /** Run a statement to completion; returns (column names+types, rows).
    * For control statements / small result sets only — [[read]] is the
    * bounded-memory path for data.
    */
  def execute(conn: Conn, sql: String)
      : (Seq[(String, String)], Seq[Seq[Any]]) = {
    var cols: Seq[(String, String)] = Nil
    val rows = collection.mutable.ArrayBuffer[Seq[Any]]()
    // control statements may be DML/DDL: no idempotency token in the
    // protocol, so the submit must not replay on a lost response
    walk(conn, sql, retrySubmit = false)(c => cols = c, r => rows += r)
    (cols, rows.toSeq)
  }

  /** Statement → typed DataFrame (column types from the protocol's
    * reported types; date/timestamp/decimal parse from their canonical
    * render). Pages stream to JSONL staging as they arrive — the driver
    * holds one page at a time, never the result set. */
  def read(spark: SparkSession, conn: Conn, sql: String,
      spill: Spill.Config = Spill.Config()): DataFrame = {
    val w = new Spill.JsonlWriter(spark, "trino", spill)
    var cols: Seq[(String, DataType)] = Nil
    val line = mapper.createObjectNode()
    walk(conn, sql)(
      cs => cols = cs.map { case (n, t) => (n, sparkType(t)) },
      r => {
        line.removeAll()
        cols.zipWithIndex.foreach { case ((n, dt), j) =>
          (r(j), dt) match {
            case (null, _) => line.putNull(n)
            case (x: Long, _) => line.put(n, x)
            case (x: Double, _) => line.put(n, x)
            case (x: Boolean, _) => line.put(n, x)
            // date/timestamp/decimal ride their canonical string render;
            // the staged read parses them against the explicit schema
            case (x, _) => line.put(n, String.valueOf(x))
          }
        }
        w.write(mapper.writeValueAsString(line))
      })
    require(cols.nonEmpty, "trino returned no columns")
    val schema = StructType(cols.map { case (n, dt) =>
      StructField(n, dt, nullable = true) })
    Spill.readJsonl(spark, Some(schema), w.close())
  }
}
