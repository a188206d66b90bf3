package graft.sources

/** Bounded retry for the engine REST sources' HTTP calls.
  *
  * The reference's API framework retries per its response rules
  * (core/dbio/api/spec.go:1370-1399 — mirrored in [[graft.api.ApiSpec]]);
  * its engine connectors lean on each vendor SDK's built-in retry. The
  * from-scratch HTTP sources here get the same production posture via
  * this shared policy: transient statuses (408/429/5xx except 501) and
  * connect-phase network failures back off exponentially and re-attempt;
  * permanent statuses (4xx) fail immediately.
  *
  * Scale rationale: on a wide cluster a single task failure re-runs the
  * WHOLE partition fetch (and fails the stage after
  * spark.task.maxFailures) — absorbing a blip at the call site is
  * orders of magnitude cheaper than absorbing it at the task level.
  * Only whole-call units are retried: a bounded request/response, or
  * the OPEN of a streaming response (connect + status line). A stream
  * that dies mid-consumption is NOT silently re-fetched — rows may
  * already be emitted, so dedup belongs to Spark's task retry, not here.
  *
  * Backoff is exponential with per-attempt jitter hashed from (label,
  * attempt, task identity) — the task identity (Spark taskAttemptId, or
  * thread id off-task) is what de-synchronizes the executor fleet, so a
  * 429'd service isn't re-hit by every partition in the same
  * millisecond; label and attempt keep a single task's schedule stable.
  *
  * Idempotency — two tiers. [[retry]] (full transient retry) is wired
  * to calls that are safe to REPLAY: reads, polls, stream OPENs, and
  * submissions carrying a service-side idempotency token (Athena
  * ClientRequestToken, BigQuery requestId, Snowflake
  * requestId&retry=true). Non-idempotent calls (ES id-less _bulk +
  * scroll continuations, ClickHouse INSERT/DDL, Bigtable mutateRows +
  * admin verbs, AzTable $batch, Drive upload, Trino DML submits) get
  * [[retryConnectOnly]]: failures where the request provably never
  * reached the server still re-attempt (free resilience), but a lost
  * response after a possible server-side commit surfaces as an error
  * instead of silently duplicating.
  */
object HttpRetry {

  /** Marker for HTTP-status-bearing exceptions so engine-specific
    * exception types (SQLException for ClickHouse, IOException
    * elsewhere) all classify the same way. */
  trait HttpStatus { def statusCode: Int }

  /** Generic status failure: an IOException carrying the code. */
  final class HttpStatusException(val statusCode: Int, message: String)
      extends java.io.IOException(message) with HttpStatus

  /** Transient = worth re-attempting: throttle/overload statuses and
    * connect-phase network failures. 501 and other 4xx are permanent;
    * SSL failures are configuration, not weather. */
  def transient(e: Throwable): Boolean = e match {
    case s: HttpStatus =>
      s.statusCode == 408 || s.statusCode == 429 ||
        (s.statusCode >= 500 && s.statusCode != 501)
    case _: javax.net.ssl.SSLException => false
    case _: java.net.ConnectException => true
    case _: java.net.SocketTimeoutException => true
    case _: java.net.UnknownHostException => true
    case _: java.net.SocketException => true
    case _ => false
  }

  /** Jitter in [0, cap): splitmix of (label, attempt, task identity).
    * Task identity makes CONCURRENT tasks hitting the same label sleep
    * different amounts; a given task's schedule stays reproducible. */
  private def jitterMs(label: String, attempt: Int, cap: Long): Long = {
    val task = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(Thread.currentThread().getId)
    var z = label.hashCode.toLong * 0x9E3779B97F4A7C15L + attempt +
      task * 0xD1B54A32D192ED03L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    math.floorMod(z ^ (z >>> 31), math.max(cap, 1L))
  }

  /** SocketTimeoutException subtype marking a CONNECT-phase timeout.
    * Thrown by [[connecting]], so [[neverSent]] classifies the phase
    * structurally — the call site, not the JDK's exception message,
    * says the timeout fired before any request byte went out. */
  final class ConnectTimeoutException(cause: java.net.SocketTimeoutException)
      extends java.net.SocketTimeoutException(
        s"connect: ${Option(cause.getMessage).getOrElse("timed out")}") {
    initCause(cause)
  }

  /** Wrap connection establishment (`conn.connect()` — a no-op if
    * already connected): a SocketTimeoutException raised inside provably
    * predates the request, so it re-throws as the replay-safe
    * [[ConnectTimeoutException]]. Every `*Once` HTTP helper calls this
    * before its first I/O. */
  def connecting[T](op: => T): T =
    try op catch {
      case t: java.net.SocketTimeoutException =>
        throw new ConnectTimeoutException(t)
    }

  /** Failures where the request provably NEVER REACHED the server — no
    * connection was established (or no route/host existed), so replaying
    * is safe even for non-idempotent writes. A SocketTimeoutException
    * counts only in its connect phase — primarily the structural
    * [[ConnectTimeoutException]] marker from [[connecting]]; the JDK
    * message sniff remains only as a fallback for unwrapped call sites.
    * Once bytes may have been sent, a timeout means the response — and
    * the server's commit state — is unknown. */
  def neverSent(e: Throwable): Boolean = e match {
    case _: ConnectTimeoutException => true
    case _: java.net.ConnectException => true
    case _: java.net.UnknownHostException => true
    case _: java.net.NoRouteToHostException => true
    case t: java.net.SocketTimeoutException =>
      Option(t.getMessage).exists(_.toLowerCase.contains("connect"))
    case _ => false
  }

  private def run[T](label: String, attempts: Int, baseDelayMs: Long,
      maxDelayMs: Long, shouldRetry: Throwable => Boolean)(op: => T): T = {
    var k = 0
    while (true) {
      try return op
      catch {
        case e: Throwable if k < attempts - 1 && shouldRetry(e) =>
          val backoff = math.min(baseDelayMs << k, maxDelayMs)
          Thread.sleep(math.min(backoff + jitterMs(label, k, backoff / 2 + 1),
            maxDelayMs))
          k += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run `op`, re-attempting transient failures up to `attempts` total
    * tries with exponential backoff (base·2^k + jitter, capped at
    * `maxDelayMs`). Non-transient failures and the final attempt's
    * failure propagate unchanged. For calls that are safe to REPLAY
    * (reads, polls, token-carrying submits). */
  def retry[T](label: String, attempts: Int = 4, baseDelayMs: Long = 200,
      maxDelayMs: Long = 5000)(op: => T): T =
    run(label, attempts, baseDelayMs, maxDelayMs, transient)(op)

  /** Like [[retry]] but re-attempts ONLY [[neverSent]] failures — the
    * resilience tier for non-idempotent writes: a connection refusal
    * costs nothing to replay, while a lost response after a possible
    * server-side commit propagates (duplication decisions belong to the
    * caller / Spark task retry, not this layer). */
  def retryConnectOnly[T](label: String, attempts: Int = 4,
      baseDelayMs: Long = 200, maxDelayMs: Long = 5000)(op: => T): T =
    run(label, attempts, baseDelayMs, maxDelayMs, neverSent)(op)
}
