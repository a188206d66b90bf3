package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Snowflake source over the public SQL API v2 (the REST surface behind
  * the reference's gosnowflake driver; database_snowflake.go):
  * `POST /api/v2/statements`, async 202 polling, and **partitioned
  * results** — the API reports `partitionInfo` and serves each result
  * partition at `?partition=n`.
  *
  * Spark-first shape: partition 0 returns with the metadata and the
  * REMAINING partitions are fetched BY THE EXECUTORS, one Spark task
  * per result partition — Snowflake's own result sharding becomes the
  * read parallelism (this is exactly what the official Spark connector
  * does with the same endpoint). Keypair auth: RS256 JWT with the
  * account.user + SHA256:fingerprint issuer form. Offline tests drive
  * submit/poll/partitions (JWT signature verified server-side) against
  * a loopback endpoint.
  */
object SnowflakeApi {

  final case class Conn(baseUrl: String, token: String = "")
      extends Serializable {
    def headers: Map[String, String] = Map(
      "Content-Type" -> "application/json",
      "Accept" -> "application/json",
      "X-Snowflake-Authorization-Token-Type" -> "KEYPAIR_JWT") ++
      (if (token.isEmpty) Map.empty else
        Map("Authorization" -> s"Bearer $token"))
  }

  /** Keypair JWT (Snowflake "key pair authentication"): RS256 over
    * iss = ACCOUNT.USER.SHA256:<base64 pubkey sha>, sub = ACCOUNT.USER.
    * The public-key fingerprint derives from the private key. */
  def keypairJwt(account: String, user: String, privateKeyPem: String,
      nowEpoch: () => Long = () => System.currentTimeMillis() / 1000): String = {
    val key = graft.api.Tls.parseKey(privateKeyPem)
    val kf = java.security.KeyFactory.getInstance("RSA")
    val pub = kf.generatePublic(new java.security.spec.RSAPublicKeySpec(
      key.asInstanceOf[java.security.interfaces.RSAPrivateCrtKey].getModulus,
      key.asInstanceOf[java.security.interfaces.RSAPrivateCrtKey]
        .getPublicExponent))
    val fp = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(pub.getEncoded))
    val qual = s"${account.toUpperCase}.${user.toUpperCase}"
    def b64(b: Array[Byte]) =
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    val now = nowEpoch()
    val header = b64("""{"alg":"RS256","typ":"JWT"}""".getBytes("UTF-8"))
    val claims = b64((s"""{"iss":"$qual.SHA256:$fp","sub":"$qual",""" +
      s""""iat":$now,"exp":${now + 3540}}""").getBytes("UTF-8"))
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(s"$header.$claims".getBytes("UTF-8"))
    s"$header.$claims.${b64(sig.sign())}"
  }

  private def call(method: String, url: String,
      headers: Map[String, String], body: Option[String]): (Int, String) =
    HttpRetry.retry(url)(callOnce(method, url, headers, body))

  private def callOnce(method: String, url: String,
      headers: Map[String, String], body: Option[String]): (Int, String) = {
    val http = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod(method)
    http.setConnectTimeout(10000)
    http.setReadTimeout(120000)
    headers.foreach { case (k, v) => http.setRequestProperty(k, v) }
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
        s"snowflake $code: ${out.take(300)}")
    (code, out)
  }

  /** rowType entry → Spark type (SQL API value renders). */
  private[sources] def sparkType(tpe: String, scale: Int): DataType =
    tpe.toUpperCase match {
      case "FIXED" if scale == 0 => LongType
      case "FIXED" => DecimalType(38, scale)
      case "REAL" => DoubleType
      case "BOOLEAN" => BooleanType
      case "DATE" => DateType
      case t if t.startsWith("TIMESTAMP") => TimestampType
      case _ => StringType
    }

  private[sources] def convert(v: String, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case BooleanType => v == "true" || v == "1"
      case _: DecimalType => new java.math.BigDecimal(v)
      case DateType => // epoch days
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.toLong))
      case TimestampType => // epoch seconds with fraction
        val bd = new java.math.BigDecimal(v)
        val ts = new java.sql.Timestamp(
          bd.movePointRight(3).longValue())
        ts
      case _ => v
    }

  /** Run a statement: submit, poll async 202s, then fetch the remaining
    * result partitions ON THE EXECUTORS (one task each). */
  def read(spark: SparkSession, conn: Conn, statement: String,
      pollMs: Long = 200): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = mapper.createObjectNode()
    payload.put("statement", statement)
    // requestId + retry=true is the SQL API's own resubmission dedup:
    // a replayed POST with the same id does not re-execute the statement
    var (code, body) = call("POST",
      s"${conn.baseUrl}/api/v2/statements?requestId=" +
        s"${java.util.UUID.randomUUID()}&retry=true",
      conn.headers, Some(mapper.writeValueAsString(payload)))
    var root = mapper.readTree(body)
    val handle = root.path("statementHandle").asText()
    while (code == 202) {
      Thread.sleep(pollMs)
      val r = call("GET", s"${conn.baseUrl}/api/v2/statements/$handle",
        conn.headers, None)
      code = r._1; root = mapper.readTree(r._2)
    }
    if (root.has("message") && !root.has("resultSetMetaData"))
      throw new java.sql.SQLException(
        s"snowflake statement failed: ${root.path("message").asText()}")
    val meta = root.path("resultSetMetaData")
    val rt = meta.path("rowType")
    val cols = (0 until rt.size()).map { i =>
      val c = rt.get(i)
      (c.path("name").asText(),
        sparkType(c.path("type").asText(), c.path("scale").asInt(0)))
    }
    val nParts = math.max(1, meta.path("partitionInfo").size())
    def parseRows(node: com.fasterxml.jackson.databind.JsonNode): Seq[Seq[String]] = {
      val data = node.path("data")
      (0 until data.size()).map { i =>
        val r = data.get(i)
        (0 until r.size()).map(j =>
          if (r.get(j).isNull) null else r.get(j).asText())
      }
    }
    val part0 = parseRows(root)
    val base = conn.baseUrl
    val hdrs = conn.headers
    // executors fetch partitions 1..n-1 in parallel; partition 0 came
    // with the submit response
    val restRdd =
      if (nParts <= 1) spark.sparkContext.emptyRDD[Seq[String]]
      else spark.sparkContext.parallelize(1 until nParts, nParts - 1)
        .flatMap { p =>
          val mapperX = new com.fasterxml.jackson.databind.ObjectMapper()
          val (_, b) = call("GET",
            s"$base/api/v2/statements/$handle?partition=$p", hdrs, None)
          val node = mapperX.readTree(b)
          val data = node.path("data")
          (0 until data.size()).map { i =>
            val r = data.get(i)
            (0 until r.size()).map(j =>
              if (r.get(j).isNull) null else r.get(j).asText()): Seq[String]
          }
        }
    val allRdd = spark.sparkContext.parallelize(part0.toList)
      .union(restRdd)
    val schema = StructType(cols.map { case (n, dt) =>
      StructField(n, dt, nullable = true) })
    val typed = allRdd.map(r =>
      Row.fromSeq(r.zip(cols).map { case (v, (_, dt)) => convert(v, dt) }))
    spark.createDataFrame(typed, schema)
  }
}
