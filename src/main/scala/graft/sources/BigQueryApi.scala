package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** BigQuery source over the public REST surface
  * (`jobs.query` + `getQueryResults` paging — the same API the
  * reference's google client library calls;
  * database_bigquery.go). Auth reuses the service-account JWT-bearer
  * flow from [[GSheets.serviceAccountToken]] at the bigquery scope.
  * Values arrive as the API's string-rendered `f/v` cells and map back
  * through the reported schema types (INTEGER/FLOAT/BOOLEAN/NUMERIC/
  * TIMESTAMP epoch-seconds/DATE; everything else stays string). Pure
  * REST behind an injectable base URL — the offline build drives
  * submit/poll/page against a loopback server.
  */
object BigQueryApi {

  final case class Conn(projectId: String, token: () => String = () => "",
      baseUrl: String = "https://bigquery.googleapis.com")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def call(method: String, url: String, token: String,
      body: Option[String]): com.fasterxml.jackson.databind.JsonNode =
    HttpRetry.retry(url)(callOnce(method, url, token, body))

  private def callOnce(method: String, url: String, token: String,
      body: Option[String]): com.fasterxml.jackson.databind.JsonNode = {
    val http = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod(method)
    http.setConnectTimeout(10000)
    http.setReadTimeout(120000)
    if (token.nonEmpty)
      http.setRequestProperty("Authorization", s"Bearer $token")
    http.setRequestProperty("Content-Type", "application/json")
    body.foreach { b =>
      http.setDoOutput(true)
      val os = http.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val code = http.getResponseCode
    val is = if (code >= 400) http.getErrorStream else http.getInputStream
    val out = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    http.disconnect()
    if (code >= 400)
      throw new HttpRetry.HttpStatusException(code,
        s"bigquery $code: ${out.take(300)}")
    mapper.readTree(out)
  }

  private[sources] def sparkType(bq: String): DataType = bq match {
    case "INTEGER" | "INT64" => LongType
    case "FLOAT" | "FLOAT64" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "NUMERIC" | "BIGNUMERIC" => DecimalType(38, 9)
    case "TIMESTAMP" => TimestampType
    case "DATE" => DateType
    case _ => StringType // STRING, BYTES(base64), JSON, STRUCT renders…
  }

  /** Run `sql` to completion: submit via jobs.query, poll
    * getQueryResults until jobComplete, then follow pageToken pages.
    * Pages spill to JSONL staging as they arrive (bounded driver
    * memory); Spark parses the staged parts distributed. */
  def read(spark: SparkSession, conn: Conn, sql: String,
      useLegacySql: Boolean = false,
      spill: Spill.Config = Spill.Config()): DataFrame = {
    val tok = conn.token()
    val payload = mapper.createObjectNode()
    payload.put("query", sql)
    payload.put("useLegacySql", useLegacySql)
    // jobs.query requestId: duplicate submissions with the same id are
    // dedup'd server-side, making HttpRetry's replay of the POST safe
    payload.put("requestId", java.util.UUID.randomUUID().toString)
    var resp = call("POST",
      s"${conn.baseUrl}/bigquery/v2/projects/${conn.projectId}/queries",
      tok, Some(mapper.writeValueAsString(payload)))
    val jobId = resp.path("jobReference").path("jobId").asText()
    while (!resp.path("jobComplete").asBoolean(true)) {
      resp = call("GET",
        s"${conn.baseUrl}/bigquery/v2/projects/${conn.projectId}/queries/$jobId",
        tok, None)
    }
    val fields = resp.path("schema").path("fields")
    val cols = (0 until fields.size()).map { i =>
      val f = fields.get(i)
      (f.path("name").asText(), sparkType(f.path("type").asText()))
    }
    val w = new Spill.JsonlWriter(spark, "bigquery", spill)
    val line = mapper.createObjectNode()
    var done = false
    // pageToken pages stream straight to JSONL staging — one page
    // resident at a time, never the result set
    while (!done) {
      val data = resp.path("rows")
      (0 until data.size()).foreach { i =>
        val cells = data.get(i).path("f")
        line.removeAll()
        cols.zipWithIndex.foreach { case ((n, dt), j) =>
          val v = cells.get(j).path("v")
          val s = if (v.isNull) null else v.asText()
          (s, dt) match {
            case (null, _) => line.putNull(n)
            case (x, LongType) => line.put(n, x.toLong)
            case (x, DoubleType) => line.put(n, x.toDouble)
            case (x, BooleanType) => line.put(n, x.toBoolean)
            case (x, TimestampType) =>
              // the API renders TIMESTAMP as epoch seconds (possibly
              // scientific); stage as an ISO instant the schema'd JSON
              // parse reads back exactly
              val micros = (new java.math.BigDecimal(x))
                .movePointRight(6).longValueExact()
              line.put(n, java.time.Instant.ofEpochSecond(
                Math.floorDiv(micros, 1000000L),
                Math.floorMod(micros, 1000000L) * 1000L).toString)
            // date/decimal keep the API's canonical string render
            case (x, _) => line.put(n, x)
          }
        }
        w.write(mapper.writeValueAsString(line))
      }
      val next = resp.path("pageToken").asText("")
      if (next.isEmpty) done = true
      else resp = call("GET",
        s"${conn.baseUrl}/bigquery/v2/projects/${conn.projectId}/queries/$jobId" +
          s"?pageToken=${java.net.URLEncoder.encode(next, "UTF-8")}",
        tok, None)
    }
    val schema = StructType(cols.map { case (n, dt) =>
      StructField(n, dt, nullable = true) })
    Spill.readJsonl(spark, Some(schema), w.close())
  }
}
