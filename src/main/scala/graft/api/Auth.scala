package graft.api

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

/** Request authentication beyond static headers — the reference's
  * authenticator surface (core/dbio/api/auth.go):
  *
  *   - OAuth2 client-credentials flow (auth.go:83, OAUTH2_EXAMPLES.md):
  *     POST the token endpoint with client id/secret/scopes, read
  *     `access_token` from the JSON response, send it as a Bearer header;
  *   - HMAC signing (auth.go:817-1000): a templated `signing_string`
  *     rendered per request from canonical request parts
  *     (`{http_method}`, `{http_path}`, `{http_query}` sorted+url-encoded,
  *     `{http_body_sha256}`, `{unix_time}`, ...), HMAC-SHA256/512 over it
  *     with a raw/hex/base64 secret, then `request_headers` templates
  *     rendered with `{signature}` et al.
  *
  * Auth composes over the transport seam: [[applied]] turns a
  * header-aware transport plus a [[RequestAuth]] into the plain transport
  * the pagination loop consumes, so extraction code never changes.
  */
object Auth {

  /** Per-request header provider: static auth returns constants, signing
    * auth derives headers from the request.
    */
  trait RequestAuth {
    def headers(method: String, url: String,
        params: Map[String, String]): Map[String, String]
  }

  /** Transport that forwards headers (url, params, headers) => body. */
  type HeaderTransport =
    (String, Map[String, String], Map[String, String]) => String

  /** Compose auth into the plain Transport the extractor consumes. */
  def applied(t: HeaderTransport, auth: RequestAuth): ApiExtractor.Transport =
    (url, params) => t(url, params, auth.headers("GET", url, params))

  /** Static header kinds (bearer / basic / api-key) as a RequestAuth. */
  def static(kind: String, conf: Map[String, String]): RequestAuth = {
    val h = ApiSpec.authHeaders(kind, conf)
    (_, _, _) => h
  }

  // ---- OAuth2 client-credentials (auth.go:83) ----------------------------

  private val mapper = new ObjectMapper()

  /** Fetch an access token via the client-credentials grant and cache it
    * until shortly before `expires_in` elapses (60 s safety margin; no
    * expires_in in the response means cache for the whole run). The token
    * endpoint is called through the same transport seam (params carry the
    * form fields, as the reference posts them), so tests inject a stub
    * token server. Long extractions outlive provider token lifetimes, so
    * a fetch-once cache would 401 on every page after expiry.
    */
  def oauth2ClientCredentials(tokenUrl: String, clientId: String,
      clientSecret: String, scopes: Seq[String],
      transport: ApiExtractor.Transport,
      clock: () => Long = () => System.currentTimeMillis()): RequestAuth = {
    var cached: Option[(String, Long)] = None // token, expiry epoch ms
    // per-closure lock: synchronizing on the Auth object would serialize
    // token access across every connection sharing the JVM
    val lock = new Object
    def token: String = lock.synchronized {
      val now = clock()
      cached match {
        case Some((t, exp)) if now < exp => t
        case _ =>
          val params = Map(
            "grant_type" -> "client_credentials",
            "client_id" -> clientId,
            "client_secret" -> clientSecret) ++
            (if (scopes.nonEmpty) Map("scope" -> scopes.mkString(" ")) else Map.empty)
          val body = transport(tokenUrl, params)
          val root = mapper.readTree(body)
          val node = root.path("access_token")
          require(!node.isMissingNode && node.asText.nonEmpty,
            s"token endpoint $tokenUrl returned no access_token")
          val expiry = root.path("expires_in") match {
            case e if e.isMissingNode || e.asLong <= 0 => Long.MaxValue
            case e => now + math.max(0L, e.asLong * 1000 - 60000)
          }
          cached = Some((node.asText, expiry))
          node.asText
      }
    }
    (_, _, _) => Map("Authorization" -> s"Bearer $token")
  }

  // ---- HMAC signing (auth.go:817-1000) -----------------------------------

  final case class HmacConfig(
      secret: String,
      signingString: String,
      requestHeaders: Map[String, String],
      algorithm: String = "sha256",
      secretEncoding: String = "raw",
      // injectable clock => deterministic signatures in tests/oracles
      clock: () => Long = () => System.currentTimeMillis())

  private def decodeSecret(secret: String, encoding: String): Array[Byte] =
    encoding.toLowerCase match {
      case "" | "raw" => secret.getBytes(UTF_8)
      case "hex" =>
        secret.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      case "base64" => java.util.Base64.getDecoder.decode(secret)
      case other =>
        throw new IllegalArgumentException(s"secret_encoding $other")
    }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def digest(algo: String, data: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance(algo).digest(data))

  /** Sorted, url-encoded canonical query string (auth.go:887-903). */
  def canonicalQuery(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1).map { case (k, v) =>
      val enc = (s: String) => java.net.URLEncoder.encode(s, UTF_8.name())
      s"${enc(k)}=${enc(v)}"
    }.mkString("&")

  def hmacHex(algorithm: String, secret: Array[Byte], msg: String): String = {
    val jce = algorithm match {
      case "sha256" => "HmacSHA256"
      case "sha512" => "HmacSHA512"
      case other => throw new IllegalArgumentException(s"hmac algorithm $other")
    }
    val mac = javax.crypto.Mac.getInstance(jce)
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, jce))
    hex(mac.doFinal(msg.getBytes(UTF_8)))
  }

  /** HMAC request signer: renders the signing-string template from the
    * canonical request, signs it, then renders the configured headers with
    * `{signature}` available.
    */
  def hmac(conf: HmacConfig): RequestAuth = (method, url, params) => {
    val secretBytes = decodeSecret(conf.secret, conf.secretEncoding)
    val nowMs = conf.clock()
    val path = {
      val noScheme = url.indexOf("://") match {
        case -1 => url
        case i => url.indexOf('/', i + 3) match {
          case -1 => "/" // no path component: the canonical path is "/"
          case slash => url.substring(slash)
        }
      }
      val q = canonicalQuery(params)
      if (q.isEmpty) noScheme else s"$noScheme?$q"
    }
    val body = "" // GET extraction has no body; body hashes are of ""
    val vars = Map(
      "http_method" -> method,
      "http_path" -> path,
      "http_query" -> canonicalQuery(params),
      "http_body_raw" -> body,
      "http_body_md5" -> digest("MD5", body.getBytes(UTF_8)),
      "http_body_sha256" -> digest("SHA-256", body.getBytes(UTF_8)),
      "http_body_sha512" -> digest("SHA-512", body.getBytes(UTF_8)),
      "unix_time" -> (nowMs / 1000L).toString,
      "unix_time_ms" -> nowMs.toString)
    def render(tpl: String, extra: Map[String, String]): String =
      (vars ++ extra).foldLeft(tpl) { case (acc, (k, v)) =>
        acc.replace(s"{$k}", v)
      }
    val stringToSign = render(conf.signingString, Map.empty)
    val signature = hmacHex(conf.algorithm, secretBytes, stringToSign)
    conf.requestHeaders.map { case (k, tpl) =>
      k -> render(tpl, Map("signature" -> signature))
    }
  }

  // ---- AWS Signature Version 4 (auth.go:742-815) -------------------------
  //
  // The reference delegates to the AWS SDK signer; this is the published
  // algorithm (AWS General Reference, "Signature Version 4 signing
  // process"): canonical request → string-to-sign → derived key chain →
  // Authorization header. The documented AWS example vectors are
  // unit-pinned in AuthSpec.

  final case class SigV4Config(
      service: String,
      region: String,
      accessKeyId: String,
      secretAccessKey: String,
      sessionToken: Option[String] = None,
      extraHeaders: Map[String, String] = Map.empty,
      // injectable clock => deterministic signatures in tests/oracles
      clock: () => java.time.Instant = () => java.time.Instant.now())

  /** Strict RFC 3986 encoding (AWS variant: '+'→%20, '*'→%2A, keep '~'). */
  def awsUriEncode(s: String, encodeSlash: Boolean = true): String = {
    val e = java.net.URLEncoder.encode(s, UTF_8.name())
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")
    if (encodeSlash) e else e.replace("%2F", "/")
  }

  /** Canonical query: keys sorted, strict-encoded (empty values kept). */
  def sigV4CanonicalQuery(params: Map[String, String]): String =
    params.toSeq.map { case (k, v) => awsUriEncode(k) -> awsUriEncode(v) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical request per the published spec: method, encoded path,
    * canonical query, lowercased+sorted headers, signed-header list,
    * payload hash.
    */
  def sigV4CanonicalRequest(method: String, path: String,
      query: Map[String, String], headers: Map[String, String],
      payloadSha256: String): String = {
    val canonHeaders = headers.map { case (k, v) =>
      k.toLowerCase -> v.trim.replaceAll(" +", " ")
    }.toSeq.sortBy(_._1)
    val signedHeaders = canonHeaders.map(_._1).mkString(";")
    Seq(
      method,
      if (path.isEmpty) "/" else awsUriEncode(path, encodeSlash = false),
      sigV4CanonicalQuery(query),
      canonHeaders.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedHeaders,
      payloadSha256).mkString("\n")
  }

  private def hmacRaw(key: Array[Byte], msg: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }

  /** Derived signing key: HMAC chain over date/region/service/aws4_request
    * seeded with "AWS4" + secret.
    */
  def sigV4SigningKey(secret: String, date: String, region: String,
      service: String): Array[Byte] =
    List(date, region, service, "aws4_request")
      .foldLeft(("AWS4" + secret).getBytes(UTF_8))(hmacRaw)

  /** Full signature for a request at a fixed instant — exposed so tests
    * and stub servers can recompute it independently.
    */
  def sigV4Signature(conf: SigV4Config, method: String, host: String,
      path: String, query: Map[String, String],
      headers: Map[String, String], payloadSha256: String,
      amzDate: String): (String, String) = {
    val dateStamp = amzDate.take(8)
    val allHeaders = headers ++ Map("host" -> host, "x-amz-date" -> amzDate) ++
      conf.sessionToken.map("x-amz-security-token" -> _)
    val cr = sigV4CanonicalRequest(method, path, query, allHeaders,
      payloadSha256)
    val scope = s"$dateStamp/${conf.region}/${conf.service}/aws4_request"
    val sts = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      digest("SHA-256", cr.getBytes(UTF_8))).mkString("\n")
    val key = sigV4SigningKey(conf.secretAccessKey, dateStamp, conf.region,
      conf.service)
    val signedHeaders = allHeaders.keys.map(_.toLowerCase).toSeq.sorted
      .mkString(";")
    (hex(hmacRaw(key, sts)), signedHeaders)
  }

  private val amzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)

  /** SigV4 as a RequestAuth: signs each GET with an empty payload and
    * emits Authorization + x-amz-date (+ session token) headers.
    */
  def sigV4(conf: SigV4Config): RequestAuth = (method, url, params) => {
    val u = java.net.URI.create(url)
    val host = u.getHost + (if (u.getPort > 0) s":${u.getPort}" else "")
    val path = Option(u.getPath).filter(_.nonEmpty).getOrElse("/")
    val amzDate = amzFmt.format(conf.clock())
    val payloadHash = digest("SHA-256", Array.emptyByteArray)
    val (sig, signedHeaders) = sigV4Signature(conf, method, host, path,
      params, conf.extraHeaders, payloadHash, amzDate)
    val scope =
      s"${amzDate.take(8)}/${conf.region}/${conf.service}/aws4_request"
    conf.extraHeaders ++ Map(
      "x-amz-date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 " +
        s"Credential=${conf.accessKeyId}/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$sig")) ++
      conf.sessionToken.map("x-amz-security-token" -> _)
  }
}
