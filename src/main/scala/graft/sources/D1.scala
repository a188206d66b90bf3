package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cloudflare D1 source/executor (reference
  * core/dbio/database/database_d1.go): SQL over the HTTP API —
  * `POST {base}/{account}/d1/database/{db}/raw` with a Bearer token,
  * response `result[0].results.{columns, rows}` (the /raw columnar
  * shape the reference consumes). Rows come back as JSON values and
  * type through distributed JSON inference, matching D1's dynamic
  * (SQLite) typing. Pure REST behind the usual injectable base URL, so
  * the offline build drives the protocol against a loopback server.
  *
  * Scale posture: /raw returns one bounded response per statement (D1
  * enforces its own response-size cap), so the driver holds one result
  * body at a time — an inherently bounded surface, unlike the paged
  * cursors that spill to staging (Trino/BigQuery/Athena).
  */
object D1 {

  final case class Conn(
      accountId: String, databaseId: String, token: String,
      baseUrl: String = "https://api.cloudflare.com/client/v4/accounts")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** POST /raw; returns (columns, rows-as-JsonNode). */
  def raw(conn: Conn, sql: String,
      params: Seq[String] = Nil): (Seq[String], Seq[Seq[com.fasterxml.jackson.databind.JsonNode]]) =
    HttpRetry.retry("d1")(rawOnce(conn, sql, params))

  private def rawOnce(conn: Conn, sql: String,
      params: Seq[String]): (Seq[String], Seq[Seq[com.fasterxml.jackson.databind.JsonNode]]) = {
    val payload = mapper.createObjectNode()
    payload.put("sql", sql)
    val ps = payload.putArray("params")
    params.foreach(ps.add)
    val url = s"${conn.baseUrl}/${conn.accountId}/d1/database/${conn.databaseId}/raw"
    val http = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod("POST")
    http.setConnectTimeout(10000)
    http.setReadTimeout(120000)
    http.setRequestProperty("Authorization", s"Bearer ${conn.token}")
    http.setRequestProperty("Content-Type", "application/json")
    http.setDoOutput(true)
    val os = http.getOutputStream
    try os.write(mapper.writeValueAsString(payload).getBytes("UTF-8"))
    finally os.close()
    val code = http.getResponseCode
    val is = if (code >= 400) http.getErrorStream else http.getInputStream
    val body = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    http.disconnect()
    if (code >= 400)
      throw new HttpRetry.HttpStatusException(code, s"d1 $code: ${body.take(300)}")
    val root = mapper.readTree(body)
    if (!root.path("success").asBoolean(true)) {
      val errs = root.path("errors")
      throw new java.sql.SQLException(s"d1 query failed: ${errs.toString.take(300)}")
    }
    val results = root.path("result").path(0).path("results")
    val colsJ = results.path("columns")
    val cols = (0 until colsJ.size()).map(colsJ.get(_).asText())
    val rowsJ = results.path("rows")
    val rows = (0 until rowsJ.size()).map { i =>
      val r = rowsJ.get(i)
      (0 until r.size()).map(r.get)
    }
    (cols, rows)
  }

  /** SQL → DataFrame: the columnar /raw response re-keys to JSON objects
    * and types through Spark's JSON inference (SQLite's dynamic typing —
    * same per-value behavior as the reference's stream). */
  def read(spark: SparkSession, conn: Conn, sql: String): DataFrame = {
    import spark.implicits._
    val (cols, rows) = raw(conn, sql)
    val lines = rows.map { r =>
      val o = mapper.createObjectNode()
      cols.zip(r).foreach { case (c, v) =>
        o.set[com.fasterxml.jackson.databind.JsonNode](c, v) }
      mapper.writeValueAsString(o)
    }
    spark.read.json(spark.createDataset(lines))
  }
}
