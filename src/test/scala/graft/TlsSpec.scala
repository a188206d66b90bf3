package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpsConfigurator, HttpsParameters, HttpsServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tls

/** mTLS client identity (spec.go:280 auth type) against a real loopback
  * HTTPS server that REQUIRES a client certificate: fresh openssl-generated
  * server and client identities per run, handshake verified both ways, and
  * a no-client-cert control that must fail.
  */
class TlsSpec extends AnyFunSuite {

  private def sh(cmd: String): Unit = {
    val p = new ProcessBuilder("sh", "-c", cmd)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"command failed: $cmd\n$out")
  }

  /** Generate a self-signed identity; returns (certPem, keyPem). */
  private def identity(dir: Path, name: String, cn: String): (String, String) = {
    val cert = dir.resolve(s"$name.crt")
    val key = dir.resolve(s"$name.key")
    sh(s"openssl req -x509 -newkey rsa:2048 -nodes -keyout $key " +
      s"-out $cert -days 1 -subj '/CN=$cn' " +
      "-addext 'subjectAltName=IP:127.0.0.1,DNS:localhost'")
    (Files.readString(cert), Files.readString(key))
  }

  test("mtls: handshake with client cert succeeds; without it fails") {
    val dir = Files.createTempDirectory("mtls")
    val (serverCert, serverKey) = identity(dir, "server", "localhost")
    val (clientCert, clientKey) = identity(dir, "client", "graft-client")

    // server: own identity + trust ONLY the client cert, require client auth
    val serverCtx = Tls.sslContext(serverCert, serverKey, Some(clientCert))
    val server = HttpsServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(serverCtx) {
      override def configure(params: HttpsParameters): Unit = {
        val ssl = serverCtx.getDefaultSSLParameters
        ssl.setNeedClientAuth(true)
        params.setSSLParameters(ssl)
      }
    })
    server.createContext("/data", ex => {
      val body = """{"data":[{"id":1}],"next":null}""".getBytes
      ex.sendResponseHeaders(200, body.length.toLong)
      try ex.getResponseBody.write(body) finally ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val t = Tls.mtlsTransport(clientCert, clientKey, Some(serverCert))
      val body = t(s"https://127.0.0.1:$port/data", Map("a" -> "1"))
      assert(body.contains("\"id\":1"))

      // control: trust-only client (no identity) must be rejected
      val bare = java.net.http.HttpClient.newBuilder()
        .sslContext(Tls.trustOnlyContext(serverCert)).build()
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"https://127.0.0.1:$port/data")).GET().build()
      intercept[java.io.IOException] {
        bare.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      }
    } finally server.stop(0)
  }

  test("pem parsing: multi-cert bundles, pkcs8 keys, clear errors") {
    val dir = Files.createTempDirectory("pem")
    val (c1, k1) = identity(dir, "a", "a")
    val (c2, _) = identity(dir, "b", "b")
    assert(Tls.parseCerts(c1 + c2).size == 2)
    assert(Tls.parseKey(k1).getAlgorithm == "RSA")
    intercept[IllegalArgumentException] { Tls.parseKey("garbage") }
  }
}
