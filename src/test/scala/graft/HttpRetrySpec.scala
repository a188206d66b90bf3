package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpRetry

/** Shared REST retry policy: transient statuses re-attempt with backoff,
  * permanent statuses fail immediately, and the wired-through sources
  * (GSheets.HttpTransport here, reused by AzTable) survive a blip.
  */
class HttpRetrySpec extends AnyFunSuite {

  private class Flaky(failures: Int, failCode: Int) {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val n = hits.incrementAndGet()
      val (code, body) =
        if (n <= failures) (failCode, "try later") else (200, "payload")
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def url = s"http://127.0.0.1:${server.getAddress.getPort}/x"
    def stop(): Unit = server.stop(0)
  }

  test("503 twice then 200: call succeeds after exactly 3 attempts") {
    val srv = new Flaky(failures = 2, failCode = 503)
    try {
      val t = new graft.sources.GSheets.HttpTransport
      assert(t.get(srv.url, Map.empty) == "payload")
      assert(srv.hits.get() == 3)
    } finally srv.stop()
  }

  test("404 is permanent: fails on the first attempt, no re-hit") {
    val srv = new Flaky(failures = 10, failCode = 404)
    try {
      val t = new graft.sources.GSheets.HttpTransport
      val e = intercept[java.io.IOException](t.get(srv.url, Map.empty))
      assert(e.getMessage.contains("404"))
      assert(srv.hits.get() == 1)
    } finally srv.stop()
  }

  test("attempts exhaust: the last transient failure propagates") {
    val srv = new Flaky(failures = 10, failCode = 429)
    try {
      val t = new graft.sources.GSheets.HttpTransport
      val e = intercept[java.io.IOException](t.get(srv.url, Map.empty))
      assert(e.getMessage.contains("429"))
      assert(srv.hits.get() == 4) // default attempts
    } finally srv.stop()
  }

  test("classification: connect failures transient, SSL/4xx permanent") {
    assert(HttpRetry.transient(new java.net.ConnectException("refused")))
    assert(HttpRetry.transient(new java.net.SocketTimeoutException("t/o")))
    assert(HttpRetry.transient(new HttpRetry.HttpStatusException(503, "x")))
    assert(HttpRetry.transient(new HttpRetry.HttpStatusException(429, "x")))
    assert(!HttpRetry.transient(new HttpRetry.HttpStatusException(501, "x")))
    assert(!HttpRetry.transient(new HttpRetry.HttpStatusException(400, "x")))
    assert(!HttpRetry.transient(new javax.net.ssl.SSLException("bad cert")))
    assert(!HttpRetry.transient(new IllegalArgumentException("logic")))
  }

  test("engine-typed exceptions keep their type AND classify by status") {
    val ch = new graft.sources.ClickHouseHttp.ChStatusException(502, "ch")
    assert(ch.isInstanceOf[java.sql.SQLException])
    assert(HttpRetry.transient(ch))
    assert(!HttpRetry.transient(
      new graft.sources.ClickHouseHttp.ChStatusException(404, "ch")))
  }

  test("retry returns the op result untouched and runs op once when clean") {
    var runs = 0
    val out = HttpRetry.retry("clean") { runs += 1; 42 }
    assert(out == 42 && runs == 1)
  }

  test("connect-only tier: never-sent failures retry, lost-response failures don't") {
    // request provably never reached the server -> safe for any write
    var runs = 0
    val out = HttpRetry.retryConnectOnly("w", baseDelayMs = 1) {
      runs += 1
      if (runs < 3) throw new java.net.ConnectException("refused")
      "ok"
    }
    assert(out == "ok" && runs == 3)
    // a 503 means the server may have committed: must NOT replay
    var calls = 0
    intercept[java.io.IOException] {
      HttpRetry.retryConnectOnly("w2", baseDelayMs = 1) {
        calls += 1
        throw new HttpRetry.HttpStatusException(503, "maybe committed")
      }
    }
    assert(calls == 1)
    // a READ timeout is response-lost (not never-sent); a CONNECT
    // timeout is never-sent — the JDK message distinguishes them
    assert(!HttpRetry.neverSent(
      new java.net.SocketTimeoutException("Read timed out")))
    assert(HttpRetry.neverSent(
      new java.net.SocketTimeoutException("connect timed out")))
    assert(HttpRetry.neverSent(new java.net.NoRouteToHostException("x")))
    assert(!HttpRetry.neverSent(new java.net.SocketException("reset")))
  }

  test("connecting() marks the connect phase structurally, not by message") {
    // a timeout raised inside connecting() classifies never-sent even
    // with a message the sniff would miss (JDK wording changes, locales)
    val e = intercept[java.net.SocketTimeoutException] {
      HttpRetry.connecting {
        throw new java.net.SocketTimeoutException("timed out") // no "connect"
      }
    }
    assert(e.isInstanceOf[HttpRetry.ConnectTimeoutException])
    assert(HttpRetry.neverSent(e))
    assert(e.getCause.isInstanceOf[java.net.SocketTimeoutException])
    // outside the connect phase the same message stays non-replayable
    assert(!HttpRetry.neverSent(new java.net.SocketTimeoutException("timed out")))
    // non-timeout failures pass through connecting() untouched
    val c = intercept[java.net.ConnectException] {
      HttpRetry.connecting { throw new java.net.ConnectException("refused") }
    }
    assert(HttpRetry.neverSent(c))
    // and the happy path returns the value
    assert(HttpRetry.connecting("ok") == "ok")
  }
}
