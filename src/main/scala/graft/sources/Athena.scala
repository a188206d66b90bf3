package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.api.Auth

/** Athena source over the public JSON-RPC surface (the API the
  * reference's AWS SDK calls; database_athena.go):
  * `StartQueryExecution` → poll `GetQueryExecution` →
  * `GetQueryResults` with NextToken paging, every request SigV4-signed
  * with the same [[graft.api.Auth]] implementation the API extractor
  * uses (published algorithm, AWS example vectors pinned in AuthSpec).
  * Results map through ColumnInfo types; the header row Athena places
  * first in SELECT results is dropped. Offline tests drive the full
  * lifecycle (signature verification included) against a loopback
  * endpoint.
  */
object Athena {

  final case class Conn(
      region: String, accessKeyId: String, secretAccessKey: String,
      outputLocation: String = "s3://graft-athena-results/",
      baseUrl: String = "", // default https://athena.{region}.amazonaws.com
      clock: () => java.time.Instant = () => java.time.Instant.now(),
      pollMs: Long = 200) {
    def endpoint: String =
      if (baseUrl.nonEmpty) baseUrl else s"https://athena.$region.amazonaws.com"
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  private val amzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)

  /** One signed JSON-RPC call (X-Amz-Target dispatch, x-amz-json-1.1). */
  def rpc(conn: Conn, target: String, payload: String)
      : com.fasterxml.jackson.databind.JsonNode =
    // whole-call retry: signing (x-amz-date) recomputes per attempt
    HttpRetry.retry(target)(rpcOnce(conn, target, payload))

  private def rpcOnce(conn: Conn, target: String, payload: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val u = java.net.URI.create(conn.endpoint)
    val host = u.getHost + (if (u.getPort > 0) s":${u.getPort}" else "")
    val amzDate = amzFmt.format(conn.clock())
    val bodyBytes = payload.getBytes("UTF-8")
    val extra = Map(
      "content-type" -> "application/x-amz-json-1.1",
      "x-amz-target" -> s"AmazonAthena.$target")
    val sigConf = Auth.SigV4Config("athena", conn.region,
      conn.accessKeyId, conn.secretAccessKey, clock = conn.clock)
    val (sig, signedHeaders) = Auth.sigV4Signature(sigConf, "POST", host,
      "/", Map.empty, extra, sha256Hex(bodyBytes), amzDate)
    val scope = s"${amzDate.take(8)}/${conn.region}/athena/aws4_request"
    val http = u.toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod("POST")
    http.setConnectTimeout(10000)
    http.setReadTimeout(120000)
    extra.foreach { case (k, v) => http.setRequestProperty(k, v) }
    http.setRequestProperty("x-amz-date", amzDate)
    http.setRequestProperty("Authorization",
      s"AWS4-HMAC-SHA256 Credential=${conn.accessKeyId}/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$sig")
    http.setDoOutput(true)
    val os = http.getOutputStream
    try os.write(bodyBytes) finally os.close()
    val code = http.getResponseCode
    val is = if (code >= 400) http.getErrorStream else http.getInputStream
    val out = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    http.disconnect()
    if (code >= 400)
      throw new HttpRetry.HttpStatusException(code,
        s"athena $code [$target]: ${out.take(300)}")
    mapper.readTree(out)
  }

  private[sources] def sparkType(athena: String): DataType =
    athena.takeWhile(_ != '(') match {
      case "integer" | "int" | "bigint" | "smallint" | "tinyint" => LongType
      case "double" | "float" | "real" => DoubleType
      case "boolean" => BooleanType
      case "date" => DateType
      case "timestamp" => TimestampType
      case "decimal" => DecimalType(38, 18)
      case _ => StringType
    }

  /** Run `sql` through the full lifecycle and return a typed frame.
    * Result pages spill to JSONL staging as they arrive (bounded driver
    * memory); Spark parses the staged parts distributed. */
  def read(spark: SparkSession, conn: Conn, sql: String,
      spill: Spill.Config = Spill.Config()): DataFrame = {
    val start = rpc(conn, "StartQueryExecution", mapper.writeValueAsString {
      val o = mapper.createObjectNode()
      o.put("QueryString", sql)
      // the service's own idempotency token: HttpRetry can safely replay
      // the submit — a duplicate start with the same token is dedup'd
      // server-side (AWS Athena StartQueryExecution.ClientRequestToken)
      o.put("ClientRequestToken", java.util.UUID.randomUUID().toString)
      o.putObject("ResultConfiguration")
        .put("OutputLocation", conn.outputLocation)
      o
    })
    val qid = start.path("QueryExecutionId").asText()
    require(qid.nonEmpty, "no QueryExecutionId returned")
    var state = "QUEUED"
    while (state == "QUEUED" || state == "RUNNING") {
      val st = rpc(conn, "GetQueryExecution",
        s"""{"QueryExecutionId":"$qid"}""")
      state = st.path("QueryExecution").path("Status").path("State").asText()
      if (state == "FAILED" || state == "CANCELLED")
        throw new java.sql.SQLException("athena query " + state + ": " +
          st.path("QueryExecution").path("Status")
            .path("StateChangeReason").asText())
      if (state != "SUCCEEDED") Thread.sleep(conn.pollMs)
    }
    var token = ""
    var cols: Seq[(String, DataType)] = Nil
    val w = new Spill.JsonlWriter(spark, "athena", spill)
    val line = mapper.createObjectNode()
    var first = true
    var done = false
    // NextToken pages stream straight to JSONL staging — only the page
    // in flight is resident on the driver (the reference's SDK stream
    // has the same bounded shape; database_athena.go)
    while (!done) {
      val req = mapper.createObjectNode()
      req.put("QueryExecutionId", qid)
      if (token.nonEmpty) req.put("NextToken", token)
      val res = rpc(conn, "GetQueryResults", mapper.writeValueAsString(req))
      if (cols.isEmpty) {
        val ci = res.path("ResultSet").path("ResultSetMetadata")
          .path("ColumnInfo")
        cols = (0 until ci.size()).map(i => (
          ci.get(i).path("Name").asText(),
          sparkType(ci.get(i).path("Type").asText())))
      }
      val data = res.path("ResultSet").path("Rows")
      (0 until data.size()).foreach { i =>
        if (first && i == 0) () // Athena's header row in SELECT results
        else {
          val cells = data.get(i).path("Data")
          line.removeAll()
          cols.zipWithIndex.foreach { case ((n, dt), j) =>
            val v = cells.path(j).path("VarCharValue")
            val s = if (v.isMissingNode || v.isNull) null else v.asText()
            (s, dt) match {
              case (null, _) => line.putNull(n)
              case (x, LongType) => line.put(n, x.toLong)
              case (x, DoubleType) => line.put(n, x.toDouble)
              case (x, BooleanType) => line.put(n, x.toBoolean)
              // date/timestamp/decimal keep Athena's canonical render;
              // the staged read parses against the explicit schema
              case (x, _) => line.put(n, x)
            }
          }
          w.write(mapper.writeValueAsString(line))
        }
      }
      first = false
      token = res.path("NextToken").asText("")
      done = token.isEmpty
    }
    val schema = StructType(cols.map { case (n, dt) =>
      StructField(n, dt, nullable = true) })
    Spill.readJsonl(spark, Some(schema), w.close())
  }
}
