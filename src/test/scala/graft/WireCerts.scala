package graft

import java.nio.file.{Files, Path}

import graft.api.Tls

/** Shared TLS fixtures for the wire-protocol specs: a fresh
  * openssl-generated self-signed server identity per JVM, the matching
  * server-side SSLContext for the loopback fixtures, and an UNRELATED
  * identity whose cert must NOT verify (the wrong-cert control). */
object WireCerts {

  private def sh(cmd: String): Unit = {
    val p = new ProcessBuilder("sh", "-c", cmd)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"command failed: $cmd\n$out")
  }

  private def identity(dir: Path, name: String): (String, String) = {
    val cert = dir.resolve(s"$name.crt")
    val key = dir.resolve(s"$name.key")
    sh(s"openssl req -x509 -newkey rsa:2048 -nodes -keyout $key " +
      s"-out $cert -days 1 -subj '/CN=127.0.0.1' " +
      "-addext 'subjectAltName=IP:127.0.0.1,DNS:localhost'")
    (Files.readString(cert), Files.readString(key))
  }

  private lazy val dir = Files.createTempDirectory("wire-certs")

  /** (certPem, keyPem) the loopback servers present. */
  lazy val server: (String, String) = identity(dir, "server")

  /** A DIFFERENT self-signed identity: trusting this CA must make the
    * handshake against [[server]] fail. */
  lazy val stranger: (String, String) = identity(dir, "stranger")

  /** Server-side context for the loopback fixtures. */
  lazy val serverContext: javax.net.ssl.SSLContext =
    Tls.sslContext(server._1, server._2)
}
