package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
      throw new java.io.IOException(s"bigquery $code: ${out.take(300)}")
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

  private def convert(v: String, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case BooleanType => v.toBoolean
      case _: DecimalType => new java.math.BigDecimal(v)
      case TimestampType =>
        // the API renders TIMESTAMP as epoch seconds (may be scientific)
        val micros = (new java.math.BigDecimal(v))
          .movePointRight(6).longValueExact()
        new java.sql.Timestamp(micros / 1000) {
          { setNanos(((micros % 1000000) * 1000).toInt) }
        }
      case DateType => java.sql.Date.valueOf(v)
      case _ => v
    }

  /** Run `sql` to completion: submit via jobs.query, poll
    * getQueryResults until jobComplete, then follow pageToken pages. */
  def read(spark: SparkSession, conn: Conn, sql: String,
      useLegacySql: Boolean = false): DataFrame = {
    val tok = conn.token()
    val payload = mapper.createObjectNode()
    payload.put("query", sql)
    payload.put("useLegacySql", useLegacySql)
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
    val rows = collection.mutable.ArrayBuffer[Row]()
    var done = false
    while (!done) {
      val data = resp.path("rows")
      (0 until data.size()).foreach { i =>
        val cells = data.get(i).path("f")
        rows += Row.fromSeq(cols.zipWithIndex.map { case ((_, dt), j) =>
          val v = cells.get(j).path("v")
          convert(if (v.isNull) null else v.asText(), dt)
        })
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
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema)
  }
}
