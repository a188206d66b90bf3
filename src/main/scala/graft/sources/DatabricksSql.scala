package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Databricks source over the public SQL Statement Execution API
  * (`/api/2.0/sql/statements`; the REST surface behind the reference's
  * databricks driver, database_databricks.go): statement submit with
  * INLINE JSON_ARRAY disposition, PENDING/RUNNING polling, and chunked
  * results — chunk 0 rides the response, chunks 1..n-1 fetch ON THE
  * EXECUTORS (`/result/chunks/{n}`), so the API's own chunking is the
  * read parallelism. Cells arrive string-rendered and map through the
  * manifest's type_name schema. Offline tests drive the lifecycle
  * against a loopback endpoint with a bearer PAT.
  */
object DatabricksSql {

  final case class Conn(baseUrl: String, token: String = "",
      warehouseId: String = "") extends Serializable {
    def headers: Map[String, String] =
      Map("Content-Type" -> "application/json") ++
        (if (token.isEmpty) Map.empty
         else Map("Authorization" -> s"Bearer $token"))
  }

  /** The Statement Execution API has no idempotency token, so a DML
    * submit must not replay on a lost response; status/result-chunk
    * GETs always retry, and non-replayable calls still retry
    * connect-phase failures (request never reached the warehouse). */
  private def call(method: String, url: String,
      headers: Map[String, String], body: Option[String],
      retriable: Boolean = true): String =
    if (retriable) HttpRetry.retry(url)(callOnce(method, url, headers, body))
    else HttpRetry.retryConnectOnly(url)(callOnce(method, url, headers, body))

  private def callOnce(method: String, url: String,
      headers: Map[String, String], body: Option[String]): String = {
    val http = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod(method)
    http.setConnectTimeout(10000)
    http.setReadTimeout(120000)
    headers.foreach { case (k, v) => http.setRequestProperty(k, v) }
    body.foreach(_ => http.setDoOutput(true)) // config precedes connect
    HttpRetry.connecting(http.connect())
    body.foreach { b =>
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
        s"databricks $code: ${out.take(300)}")
    out
  }

  private[sources] def sparkType(t: String): DataType =
    t.toUpperCase.takeWhile(_ != '(') match {
      case "INT" | "LONG" | "BIGINT" | "SHORT" | "BYTE" => LongType
      case "DOUBLE" | "FLOAT" => DoubleType
      case "BOOLEAN" => BooleanType
      case "DATE" => DateType
      case "TIMESTAMP" => TimestampType
      case "DECIMAL" => DecimalType(38, 18)
      case _ => StringType
    }

  private def convert(v: String, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case BooleanType => v.toBoolean
      case DateType => java.sql.Date.valueOf(v)
      case TimestampType => java.sql.Timestamp.valueOf(
        v.replace("T", " ").stripSuffix("Z"))
      case _: DecimalType => new java.math.BigDecimal(v)
      case _ => v
    }

  /** Run a statement: submit, poll to SUCCEEDED, fan chunk fetches out
    * to executors. */
  def read(spark: SparkSession, conn: Conn, statement: String,
      pollMs: Long = 200, retrySubmit: Boolean = true): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = mapper.createObjectNode()
    payload.put("statement", statement)
    if (conn.warehouseId.nonEmpty)
      payload.put("warehouse_id", conn.warehouseId)
    payload.put("disposition", "INLINE")
    payload.put("format", "JSON_ARRAY")
    // SELECT submits replay safely (an abandoned duplicate query just
    // expires warehouse-side); pass retrySubmit=false for DML text —
    // the API has no idempotency token (Trino.walk's same contract)
    var root = mapper.readTree(call("POST",
      s"${conn.baseUrl}/api/2.0/sql/statements", conn.headers,
      Some(mapper.writeValueAsString(payload)), retriable = retrySubmit))
    val sid = root.path("statement_id").asText()
    var state = root.path("status").path("state").asText()
    while (state == "PENDING" || state == "RUNNING") {
      Thread.sleep(pollMs)
      root = mapper.readTree(call("GET",
        s"${conn.baseUrl}/api/2.0/sql/statements/$sid", conn.headers, None))
      state = root.path("status").path("state").asText()
    }
    if (state != "SUCCEEDED")
      throw new java.sql.SQLException(s"databricks statement $state: " +
        root.path("status").path("error").path("message").asText())
    val colsJ = root.path("manifest").path("schema").path("columns")
    val cols = (0 until colsJ.size()).map(i => (
      colsJ.get(i).path("name").asText(),
      sparkType(colsJ.get(i).path("type_name").asText())))
    val chunks = root.path("manifest").path("total_chunk_count").asInt(1)
    def parse(node: com.fasterxml.jackson.databind.JsonNode): Seq[Seq[String]] = {
      val data = node.path("data_array")
      (0 until data.size()).map { i =>
        val r = data.get(i)
        (0 until r.size()).map(j =>
          if (r.get(j).isNull) null else r.get(j).asText())
      }
    }
    val chunk0 = parse(root.path("result"))
    val base = conn.baseUrl
    val hdrs = conn.headers
    val restRdd =
      if (chunks <= 1) spark.sparkContext.emptyRDD[Seq[String]]
      else spark.sparkContext.parallelize(1 until chunks, chunks - 1)
        .flatMap { c =>
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = m.readTree(call("GET",
            s"$base/api/2.0/sql/statements/$sid/result/chunks/$c",
            hdrs, None))
          val data = node.path("data_array")
          (0 until data.size()).map { i =>
            val r = data.get(i)
            (0 until r.size()).map(j =>
              if (r.get(j).isNull) null else r.get(j).asText()): Seq[String]
          }
        }
    val schema = StructType(cols.map { case (n, dt) =>
      StructField(n, dt, nullable = true) })
    val typed = spark.sparkContext.parallelize(chunk0.toList).union(restRdd)
      .map(r => Row.fromSeq(r.zip(cols).map { case (v, (_, dt)) =>
        convert(v, dt) }))
    spark.createDataFrame(typed, schema)
  }
}
