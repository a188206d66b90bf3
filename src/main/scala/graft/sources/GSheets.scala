package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import com.fasterxml.jackson.databind.ObjectMapper

/** Google Sheets source/sink (reference core/dbio/iop/sheet_google.go:
  * GetDataset/GetDatasetFromRange/WriteSheet over the Sheets v4 API;
  * service-account auth) — re-expressed over the REST surface with an
  * injectable transport, so the OFFLINE build exercises the full
  * protocol against a loopback server and a live run differs only by
  * base URL + credentials. The spreadsheet is driver-side data by
  * nature (the API returns the grid as one JSON document; Google caps a
  * spreadsheet at 10M cells), so rows materialize on the driver and
  * enter Spark through the same sample-based inference the CSV path
  * uses — scale lives in what you JOIN the sheet against, not the sheet.
  */
object GSheets {

  /** Minimal HTTP seam: GET/PUT returning the response body.
    * Serializable so connections embedding a transport can ride into
    * executor closures (AzTable's distributed batch insert). */
  trait Transport extends Serializable {
    def get(url: String, headers: Map[String, String]): String
    def put(url: String, headers: Map[String, String], body: String): String
    /** Like [[put]] but never REPLAYED once the request may have reached
      * the server — for callers tunneling non-idempotent verbs through
      * PUT (AzTable's `$batch` changesets), where a replay after a
      * lost-response commit would duplicate or conflict. ABSTRACT on
      * purpose: a transport whose put() retries must consciously provide
      * the non-replaying variant (a delegating default would silently
      * inherit the retry and violate the contract). */
    def putOnce(url: String, headers: Map[String, String],
        body: String): String
  }

  /** Default transport over HttpURLConnection (like HttpSource). */
  final class HttpTransport extends Transport {
    private def call(method: String, url: String,
        headers: Map[String, String], body: Option[String]): String =
      HttpRetry.retry(url)(callOnce(method, url, headers, body))

    private def callOnce(method: String, url: String,
        headers: Map[String, String], body: Option[String]): String = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
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
          s"sheets api $code for $url: ${out.take(300)}")
      out
    }
    def get(url: String, headers: Map[String, String]): String =
      call("GET", url, headers, None)
    // a values-range PUT is an idempotent overwrite: retry is safe
    def put(url: String, headers: Map[String, String], body: String): String =
      call("PUT", url, headers, Some(body))
    // connect-phase failures (request never sent) still re-attempt
    override def putOnce(url: String, headers: Map[String, String],
        body: String): String =
      HttpRetry.retryConnectOnly(url)(callOnce("PUT", url, headers, Some(body)))
  }

  /** Connection: base URL + bearer token + transport. `forToken` obtains
    * the token lazily (service-account flow below). */
  final case class Conn(
      baseUrl: String = "https://sheets.googleapis.com",
      token: () => String = () => "",
      transport: Transport = new HttpTransport) {
    def headers: Map[String, String] = {
      val t = token()
      if (t.isEmpty) Map.empty else Map("Authorization" -> s"Bearer $t")
    }
  }

  private val mapper = new ObjectMapper()

  /** Spreadsheet id from a docs.google.com URL (sheet_google.go:98-121:
    * /spreadsheets/d/<id>/...), or the bare id passed through. */
  def spreadsheetId(urlOrId: String): String =
    if (!urlOrId.contains("/")) urlOrId
    else {
      val path = new java.net.URI(urlOrId).getPath
      val parts = path.split("/").filter(_.nonEmpty)
      require(parts.length >= 3 && parts(0).equalsIgnoreCase("spreadsheets"),
        s"invalid google sheets url: $urlOrId")
      parts(2)
    }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** Sheet titles, in spreadsheet order (RefreshSheets). */
  def sheetNames(conn: Conn, id: String): Seq[String] = {
    val body = conn.transport.get(
      s"${conn.baseUrl}/v4/spreadsheets/$id?fields=sheets.properties.title",
      conn.headers)
    val root = mapper.readTree(body)
    val sheets = root.path("sheets")
    (0 until sheets.size()).map(i =>
      sheets.get(i).path("properties").path("title").asText())
  }

  /** values.get of an A1 range → raw string rows (ragged rows padded to
    * the widest). Cells come back typed in JSON; everything stringifies,
    * matching the reference's FormattedValue reads. */
  def rawRange(conn: Conn, id: String, rangeA1: String): Seq[Seq[String]] = {
    val body = conn.transport.get(
      s"${conn.baseUrl}/v4/spreadsheets/$id/values/${enc(rangeA1)}",
      conn.headers)
    val values = mapper.readTree(body).path("values")
    val rows = (0 until values.size()).map { i =>
      val r = values.get(i)
      (0 until r.size()).map(j => r.get(j).asText())
    }
    val width = rows.foldLeft(0)((w, r) => math.max(w, r.size))
    rows.map(r => (r ++ Seq.fill(width - r.size)("")).toSeq)
  }

  /** Trailing all-blank rows are discarded; blank rows mid-range stay
    * (sheet_google.go:159-180 getRawRows). */
  private def trimTrailingBlank(rows: Seq[Seq[String]]): Seq[Seq[String]] = {
    val lastLive = rows.lastIndexWhere(_.exists(_.nonEmpty))
    rows.take(lastLive + 1)
  }

  private def toDf(spark: SparkSession, rows: Seq[Seq[String]]): DataFrame = {
    require(rows.nonEmpty, "sheet range returned no rows")
    val header = rows.head.zipWithIndex.map { case (h, i) =>
      if (h.trim.nonEmpty) h.trim else s"col_$i" }
    val data = rows.tail.map(r =>
      Row.fromSeq(r.map(v => if (v.isEmpty) null else v)))
    val strSchema = StructType(header.map(StructField(_, StringType, true)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList), strSchema)
    // same sample-based inference + cast as the CSV path
    val sample = data.take(graft.model.TypeInference.SampleSize)
    val schema = graft.model.TypeInference.infer(sample, header)
    graft.model.TypeInference.castTo(raw, schema)
  }

  /** Read one A1 range (`Sheet1!A2:D50`) as an inferred DataFrame
    * (GetDatasetFromRange). */
  def readRange(spark: SparkSession, conn: Conn, urlOrId: String,
      rangeA1: String): DataFrame = {
    val id = spreadsheetId(urlOrId)
    toDf(spark, trimTrailingBlank(rawRange(conn, id, rangeA1)))
  }

  /** Read a whole sheet (or the first sheet when unnamed) — GetDataset. */
  def read(spark: SparkSession, conn: Conn, urlOrId: String,
      sheet: String = ""): DataFrame = {
    val id = spreadsheetId(urlOrId)
    if (sheet.contains("!")) return readRange(spark, conn, urlOrId, sheet)
    val name = if (sheet.nonEmpty) sheet else sheetNames(conn, id).headOption
      .getOrElse(throw new IllegalArgumentException(s"no sheets in $id"))
    toDf(spark, trimTrailingBlank(rawRange(conn, id, name)))
  }

  /** Write `df` into `sheet` (header + formatted rows) via values.update,
    * chunked so a large frame streams in bounded PUTs (WriteSheet's
    * batched update). Returns rows written. The frame is collected
    * through toLocalIterator — bounded driver memory per chunk. */
  def writeSheet(df: DataFrame, conn: Conn, urlOrId: String,
      sheet: String, chunkRows: Int = 10000): Long = {
    val id = spreadsheetId(urlOrId)
    val cols = df.columns.toSeq
    def cell(v: Any): String = v match {
      case null => ""
      case t: java.sql.Timestamp => t.toString
      case other => other.toString
    }
    var rowIdx = 1L // A1 row cursor; row 1 = header
    var written = 0L
    val it = df.toLocalIterator()
    var first = true
    val buf = collection.mutable.ArrayBuffer[Seq[String]]()
    def flush(): Unit = if (buf.nonEmpty || first) {
      val rows0 = if (first) cols +: buf.toSeq else buf.toSeq
      val start = rowIdx
      val json = mapper.createObjectNode()
      val arr = json.putArray("values")
      rows0.foreach { r =>
        val a = arr.addArray(); r.foreach(a.add)
      }
      val range = s"$sheet!A$start"
      conn.transport.put(
        s"${conn.baseUrl}/v4/spreadsheets/$id/values/${enc(range)}" +
          "?valueInputOption=RAW",
        conn.headers, mapper.writeValueAsString(json))
      rowIdx += rows0.size
      written += (if (first) rows0.size - 1 else rows0.size)
      buf.clear(); first = false
    }
    while (it.hasNext) {
      val row = it.next()
      buf += cols.map(c => cell(row.getAs[Any](c)))
      if (buf.size >= chunkRows) flush()
    }
    flush()
    written
  }

  // ---- service-account auth (google OAuth2 JWT-bearer flow) --------------

  /** Obtain an access token from a service-account key (the KEY_BODY the
    * reference requires): RS256-signed JWT assertion POSTed to the key's
    * token_uri. `keyJson` carries client_email / private_key (PKCS#8 PEM)
    * / token_uri. Offline tests drive this against a loopback token
    * endpoint; nothing here is Google-specific beyond the grant type.
    */
  def serviceAccountToken(keyJson: String,
      scope: String = "https://www.googleapis.com/auth/spreadsheets",
      post: (String, String) => String = defaultFormPost,
      nowEpoch: () => Long = () => System.currentTimeMillis() / 1000): String = {
    val key = mapper.readTree(keyJson)
    val email = key.path("client_email").asText()
    val pem = key.path("private_key").asText()
    val tokenUri = key.path("token_uri").asText()
    require(email.nonEmpty && pem.nonEmpty && tokenUri.nonEmpty,
      "service-account key needs client_email, private_key, token_uri")
    def b64(b: Array[Byte]): String =
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    val now = nowEpoch()
    val header = b64("""{"alg":"RS256","typ":"JWT"}""".getBytes("UTF-8"))
    val claims = b64(
      (s"""{"iss":"$email","scope":"$scope","aud":"$tokenUri",""" +
        s""""iat":$now,"exp":${now + 3600}}""").getBytes("UTF-8"))
    val signingInput = s"$header.$claims"
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(graft.api.Tls.parseKey(pem))
    sig.update(signingInput.getBytes("UTF-8"))
    val jwt = s"$signingInput.${b64(sig.sign())}"
    val resp = post(tokenUri,
      "grant_type=" + enc("urn:ietf:params:oauth:grant-type:jwt-bearer") +
        s"&assertion=$jwt")
    val tok = mapper.readTree(resp).path("access_token").asText()
    require(tok.nonEmpty, s"token endpoint returned no access_token: ${resp.take(200)}")
    tok
  }

  private def defaultFormPost(url: String, body: String): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val out = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    conn.disconnect()
    out
  }
}
