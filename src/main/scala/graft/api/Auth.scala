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

  /** Fetch an access token via the client-credentials grant and cache it.
    * The token endpoint is called through the same transport seam (params
    * carry the form fields, as the reference posts them), so tests inject a
    * stub token server.
    */
  def oauth2ClientCredentials(tokenUrl: String, clientId: String,
      clientSecret: String, scopes: Seq[String],
      transport: ApiExtractor.Transport): RequestAuth = {
    lazy val token: String = {
      val params = Map(
        "grant_type" -> "client_credentials",
        "client_id" -> clientId,
        "client_secret" -> clientSecret) ++
        (if (scopes.nonEmpty) Map("scope" -> scopes.mkString(" ")) else Map.empty)
      val body = transport(tokenUrl, params)
      val node = mapper.readTree(body).path("access_token")
      require(!node.isMissingNode && node.asText.nonEmpty,
        s"token endpoint $tokenUrl returned no access_token")
      node.asText
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
        case i => url.substring(url.indexOf('/', i + 3).max(i + 3))
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
}
