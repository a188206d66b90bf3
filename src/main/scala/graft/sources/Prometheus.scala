package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prometheus source (reference
  * core/dbio/database/database_prometheus.go: PromQL over
  * `/api/v1/query_range`, `query#{"start":...,"end":...,"step":...}`
  * option suffix, now-relative ranges with d/w/M duration folding, and
  * chunked streaming for ranges over an hour).
  *
  * Spark-first shape: the reference's chunked streaming IS the partition
  * axis — the time range splits into half-open windows, one Spark
  * partition per window, and each executor runs query_range for its own
  * window. Matrix results flatten to one row per (series, sample): label
  * columns + `ts` (epoch seconds) + `value`, typed through distributed
  * JSON inference. Pure REST; offline tests drive a loopback endpoint.
  */
object Prometheus {

  final case class Conn(baseUrl: String, token: String = "")
      extends Serializable {
    def headers: Map[String, String] =
      if (token.isEmpty) Map.empty
      else Map("Authorization" -> s"Bearer $token")
  }

  /** d/w/M duration suffixes fold to hours (database_prometheus.go
    * toHourDuration), then java.time parses the h/m/s forms. */
  def parseDuration(s: String): java.time.Duration = {
    val t = s.trim
    if (t.endsWith("d")) java.time.Duration.ofHours(t.dropRight(1).toLong * 24)
    else if (t.endsWith("w"))
      java.time.Duration.ofHours(t.dropRight(1).toLong * 24 * 7)
    else if (t.endsWith("M"))
      java.time.Duration.ofHours(t.dropRight(1).toLong * 24 * 31)
    else if (t.endsWith("h")) java.time.Duration.ofHours(t.dropRight(1).toLong)
    else if (t.endsWith("ms"))
      java.time.Duration.ofMillis(t.dropRight(2).toLong)
    else if (t.endsWith("m")) java.time.Duration.ofMinutes(t.dropRight(1).toLong)
    else if (t.endsWith("s")) java.time.Duration.ofSeconds(t.dropRight(1).toLong)
    else java.time.Duration.ofSeconds(t.toLong)
  }

  /** `expr#{"start":"now-2h","end":"now","step":"1m"}` → (expr, opts).
    * now-relative values resolve against `nowEpoch` (injectable for
    * deterministic tests). Defaults mirror the reference: start 30 days
    * back, end now, step 1h. */
  def parseQuery(query: String, nowEpoch: Long = System.currentTimeMillis() / 1000)
      : (String, Long, Long, String) = {
    val (expr, opts) = query.split("#", 2) match {
      case Array(e, o) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(o)
        (e.trim, node.properties().iterator())
      case _ => (query.trim, java.util.Collections.emptyIterator[
        java.util.Map.Entry[String, com.fasterxml.jackson.databind.JsonNode]]())
    }
    var start = nowEpoch - 30L * 24 * 3600
    var end = nowEpoch
    var step = "1h"
    opts.forEachRemaining { e =>
      val v = e.getValue.asText()
      def resolve(v: String): Long =
        if (v == "now") nowEpoch
        else if (v.startsWith("now-"))
          nowEpoch - parseDuration(v.drop(4)).toSeconds
        else if (v.forall(c => c.isDigit)) v.toLong
        else java.time.Instant.parse(v).getEpochSecond
      e.getKey match {
        case "start" => start = resolve(v)
        case "end" => end = resolve(v)
        case "step" => step = v
        case _ => ()
      }
    }
    (expr, start, end, step)
  }

  /** One query_range call; rows = flattened matrix samples as JSON lines
    * (labels + ts + value). Half-open [start, end): chunk boundaries
    * never double-count a sample. */
  private[sources] def queryRange(conn: Conn, expr: String, start: Long,
      end: Long, step: String): Seq[String] =
    // idempotent bounded read: whole-call retry
    HttpRetry.retry("prom-range")(queryRangeOnce(conn, expr, start, end, step))

  private def queryRangeOnce(conn: Conn, expr: String, start: Long,
      end: Long, step: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    val url = s"${conn.baseUrl}/api/v1/query_range?query=${enc(expr)}" +
      s"&start=$start&end=$end&step=${enc(step)}"
    val http = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setConnectTimeout(10000)
    http.setReadTimeout(120000)
    conn.headers.foreach { case (k, v) => http.setRequestProperty(k, v) }
    val code = http.getResponseCode
    val is = if (code >= 400) http.getErrorStream else http.getInputStream
    val body = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    http.disconnect()
    if (code >= 400)
      throw new HttpRetry.HttpStatusException(code,
        s"prometheus $code: ${body.take(300)}")
    val root = mapper.readTree(body)
    require(root.path("status").asText() == "success",
      s"prometheus error: ${body.take(300)}")
    val series = root.path("data").path("result")
    val out = collection.mutable.ArrayBuffer[String]()
    (0 until series.size()).foreach { i =>
      val s = series.get(i)
      val metric = s.path("metric")
      val values = s.path("values")
      (0 until values.size()).foreach { j =>
        val pair = values.get(j)
        val ts = pair.get(0).asLong()
        if (ts >= start && ts < end) {
          val row = metric.deepCopy[
            com.fasterxml.jackson.databind.node.ObjectNode]()
          row.put("ts", ts)
          row.put("value", pair.get(1).asText().toDouble)
          out += mapper.writeValueAsString(row)
        }
      }
    }
    out.toSeq
  }

  /** Distributed read: the [start, end) range splits into `chunks`
    * half-open windows, one Spark partition each (the reference's
    * StreamRowsChunked, fanned out). */
  def read(spark: SparkSession, conn: Conn, query: String,
      chunks: Int = 4,
      nowEpoch: Long = System.currentTimeMillis() / 1000): DataFrame = {
    import spark.implicits._
    val (expr, start, end, step) = parseQuery(query, nowEpoch)
    val span = math.max(1L, end - start)
    val n = math.min(chunks.toLong, span).toInt
    val bounds = (0 until n).map { i =>
      val lo = start + span * i / n
      val hi = start + span * (i + 1) / n
      (lo, hi)
    }
    val lines = spark.sparkContext.parallelize(bounds, n)
      .flatMap { case (lo, hi) => queryRange(conn, expr, lo, hi, step) }
    // label sets vary per series -> inference; Spill.typed persists the
    // fetched lines so each range window is queried exactly once
    Spill.typed(spark, None, spark.createDataset(lines))
  }
}
