package graft.api

import java.io.ByteArrayInputStream
import java.security.{KeyFactory, KeyStore, PrivateKey, SecureRandom}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Mutual-TLS client identity for API extraction — the reference's
  * `mtls` auth type (`core/dbio/api/spec.go:280`; the transport
  * implementation is in its closed connectors, so this is built from the
  * TLS standard): a client certificate + private key presented during the
  * handshake, with an optional private CA bundle for server trust.
  *
  * Pure-JVM PEM handling: certificates via `CertificateFactory`, keys via
  * PKCS#8 (`BEGIN PRIVATE KEY`, RSA or EC) — no crypto dependencies.
  */
object Tls {

  private def pemBlocks(pem: String, kind: String): Seq[Array[Byte]] = {
    val re = s"(?s)-----BEGIN $kind-----(.*?)-----END $kind-----".r
    re.findAllMatchIn(pem).map { m =>
      Base64.getMimeDecoder.decode(m.group(1).replaceAll("\\s", ""))
    }.toSeq
  }

  def parseCerts(pem: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    pemBlocks(pem, "CERTIFICATE").map(der =>
      cf.generateCertificate(new ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate])
  }

  /** PKCS#8 private key; tries RSA then EC (openssl genpkey default). */
  def parseKey(pem: String): PrivateKey = {
    val der = pemBlocks(pem, "PRIVATE KEY").headOption.getOrElse(
      throw new IllegalArgumentException(
        "no PKCS#8 PRIVATE KEY block (legacy 'RSA PRIVATE KEY' PKCS#1 " +
          "is unsupported — convert with openssl pkcs8)"))
    val spec = new PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC").view.flatMap { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException("private key is neither RSA nor EC"))
  }

  /** SSLContext presenting `certPem`+`keyPem` as client identity, trusting
    * `caPem` (or the JVM default trust store when absent).
    */
  def sslContext(certPem: String, keyPem: String,
      caPem: Option[String] = None): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    val chain = parseCerts(certPem)
    ks.setKeyEntry("client", parseKey(keyPem), Array.emptyCharArray,
      chain.toArray)
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)

    val tms = caPem.map(trustManagers).orNull

    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, new SecureRandom())
    ctx
  }

  /** CA-pem → TrustManagers (shared by the mTLS and trust-only contexts). */
  private def trustManagers(caPem: String): Array[javax.net.ssl.TrustManager] = {
    val ts = KeyStore.getInstance("PKCS12")
    ts.load(null, null)
    parseCerts(caPem).zipWithIndex.foreach { case (c, i) =>
      ts.setCertificateEntry(s"ca$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ts)
    tmf.getTrustManagers
  }

  /** Trust-only context (no client identity) — for servers that do not
    * require mTLS, or as the negative control in tests.
    */
  def trustOnlyContext(caPem: String): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, trustManagers(caPem), new SecureRandom())
    ctx
  }

  /** API transport over an mTLS HttpClient (query params appended; GET). */
  def mtlsTransport(certPem: String, keyPem: String,
      caPem: Option[String]): ApiExtractor.Transport = {
    val client = java.net.http.HttpClient.newBuilder()
      .sslContext(sslContext(certPem, keyPem, caPem))
      .build()
    (url, params) => {
      val full =
        if (params.isEmpty) url
        else url + "?" + params.toSeq.sortBy(_._1).map { case (k, v) =>
          java.net.URLEncoder.encode(k, "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }.mkString("&")
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(full)).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"GET $full returned HTTP ${resp.statusCode()}")
      resp.body()
    }
  }
}
