package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Elasticsearch search source (reference
  * core/dbio/database/database_elasticsearch.go:287-460 StreamRowsContext:
  * `_search` with a scroll cursor, match_all / incremental range /
  * backfill range bodies, `_source` docs to rows).
  *
  * Spark-first shape: **sliced scroll** — the ES scroll API partitions an
  * index server-side (`slice: {id, max}`), so each Spark partition owns
  * one slice and scrolls it independently on the executor. No driver
  * bottleneck, no cursor contention; read parallelism = `slices`, sized
  * like any partitioned JDBC read. Docs come back as JSON lines and type
  * through Spark's distributed JSON inference. The reference streams one
  * scroll on one connection — this is the same protocol fanned out.
  *
  * Everything is REST; the transport seam makes the offline build drive
  * the full scroll protocol against a loopback server.
  */
object Elastic {

  /** Serializable connection (executors open their own transports; the
    * bearer token is resolved at driver). */
  final case class Conn(baseUrl: String, token: String = "") extends Serializable {
    def headers: Map[String, String] =
      (if (token.isEmpty) Map.empty[String, String]
       else Map("Authorization" -> s"Bearer $token")) +
        ("Content-Type" -> "application/json")
  }

  /** POST returning the response body — executor-side, plain JDK HTTP. */
  private def post(url: String, headers: Map[String, String],
      body: String, retriable: Boolean = true): String =
    request("POST", url, headers, body, retriable)

  /** `retriable = false` for calls that are NOT safe to replay after
    * reaching the server: a `_search/scroll` continuation advances the
    * server-side cursor (a replay would skip the lost page), and `_bulk`
    * without ids would re-index documents — those still retry
    * connect-phase failures (request never sent → nothing advanced or
    * indexed). The initial `_search` IS fully replayable — a replay just
    * opens a fresh scroll context from page 0 — and `_bulk` WITH ids is
    * an idempotent upsert, so both keep full retry. */
  private def request(method: String, url: String,
      headers: Map[String, String], body: String,
      retriable: Boolean = true): String =
    if (retriable) HttpRetry.retry(url)(requestOnce(method, url, headers, body))
    else HttpRetry.retryConnectOnly(url)(requestOnce(method, url, headers, body))

  private def requestOnce(method: String, url: String,
      headers: Map[String, String], body: String,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 120000): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (body.nonEmpty) conn.setDoOutput(true) // config precedes connect
    HttpRetry.connecting(conn.connect())
    if (body.nonEmpty) {
      val os = conn.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    conn.disconnect()
    if (code >= 400)
      throw new HttpRetry.HttpStatusException(code,
        s"elastic $code for $url: ${out.take(300)}")
    out
  }

  /** Query body per the reference's dispatch: match_all, incremental
    * (update_key > value), or backfill (start..end inclusive). */
  def queryBody(updateKey: Option[String] = None,
      incrementalValue: Option[String] = None,
      backfill: Option[(String, String)] = None): String =
    (updateKey, incrementalValue, backfill) match {
      case (Some(k), Some(v), _) =>
        s"""{"query":{"range":{"$k":{"gt":"$v"}}}}"""
      case (Some(k), _, Some((lo, hi))) =>
        s"""{"query":{"range":{"$k":{"gte":"$lo","lte":"$hi"}}}}"""
      case _ => """{"query":{"match_all":{}}}"""
    }

  /** Scroll one slice to exhaustion; returns `_source` docs as JSON
    * strings. Runs on the executor that owns the slice. */
  private[sources] def scrollSlice(conn: Conn, index: String, body: String,
      sliceId: Int, slices: Int, pageSize: Int): Iterator[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(body).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    if (slices > 1)
      root.putObject("slice").put("id", sliceId).put("max", slices)
    root.put("size", pageSize)
    def hitsOf(resp: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
      val hits = resp.path("hits").path("hits")
      (0 until hits.size()).map(i =>
        mapper.writeValueAsString(hits.get(i).path("_source")))
    }
    // The initial _search keeps FULL transient retry (it's replay-safe:
    // no rows have been emitted yet). Accepted corner: if an attempt
    // succeeds server-side but its response is lost, the replay opens a
    // second scroll context and the orphan stays pinned until the 1m
    // keep-alive lapses — only the context we hold is cleared below.
    // Deliberately not mitigated by a shorter first TTL: the first
    // context must survive until the first continuation renews it, and
    // a busy executor can take tens of seconds to get there.
    val first = mapper.readTree(post(
      s"${conn.baseUrl}/$index/_search?scroll=1m",
      conn.headers, mapper.writeValueAsString(root)))
    // LAZY page walk: only the current page is resident on the executor
    // (a whole slice can be arbitrarily large; the page is bounded by
    // `size`), mirroring the reference's channel-paced scroll
    var scrollId = first.path("_scroll_id").asText("")
    var page = hitsOf(first)
    var cleared = false
    // release the server-side scroll context instead of pinning it for
    // the keep-alive: on exhaustion, and (for early termination — a
    // LIMIT that stops mid-slice, a killed task) at task completion
    def clearScroll(): Unit = if (!cleared && scrollId.nonEmpty) {
      cleared = true
      // ONE attempt with tight timeouts, no retry: this runs inside the
      // task-completion listener, where a dead endpoint must not stall
      // teardown (the context expires with the keep-alive anyway); an
      // InterruptedException from a task kill must also pass through
      try requestOnce("DELETE", s"${conn.baseUrl}/_search/scroll",
        conn.headers,
        s"""{"scroll_id":[${mapper.writeValueAsString(
          mapper.getNodeFactory.textNode(scrollId))}]}""",
        connectTimeoutMs = 2000, readTimeoutMs = 2000)
      catch {
        case _: java.io.IOException => () // best-effort hygiene
      }
    }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => clearScroll()))
    new Iterator[String] {
      private var i = 0
      private def advance(): Unit = {
        while (i >= page.size && page.nonEmpty && scrollId.nonEmpty) {
          val next = mapper.readTree(post(s"${conn.baseUrl}/_search/scroll",
            conn.headers, retriable = false, body =
            s"""{"scroll":"1m","scroll_id":${mapper.writeValueAsString(
              mapper.getNodeFactory.textNode(scrollId))}}"""))
          page = hitsOf(next)
          scrollId = next.path("_scroll_id").asText(scrollId)
          i = 0
        }
        if (i >= page.size) clearScroll() // exhausted
      }
      override def hasNext: Boolean = { advance(); i < page.size }
      override def next(): String = { advance(); i += 1; page(i - 1) }
    }
  }

  /** Distributed read of an index: `slices` Spark partitions each scroll
    * their own server-side slice; docs type through Spark's JSON reader.
    * Pass `schema` when known for a single streaming pass; without it
    * the docs persist across the inference + data scans so each slice
    * scrolls exactly once ([[Spill.typed]]). */
  def read(spark: SparkSession, conn: Conn, index: String,
      body: String = queryBody(), slices: Int = 4, pageSize: Int = 1000,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext
      .parallelize(0 until slices, slices)
      .flatMap(i => scrollSlice(conn, index, body, i, slices, pageSize))
    Spill.typed(spark, schema, spark.createDataset(lines))
  }

  /** NDJSON `_bulk` index encoder (the write-side wire format): action
    * line + doc line per row; `idCol` routes to `_id` when set. */
  def bulkEncode(docsJson: Seq[String], index: String,
      ids: Seq[String] = Nil): String = {
    val sb = new StringBuilder
    docsJson.zipWithIndex.foreach { case (doc, i) =>
      val idPart = if (ids.isDefinedAt(i))
        s""","_id":"${ids(i)}"""" else ""
      sb.append(s"""{"index":{"_index":"$index"$idPart}}""").append('\n')
      sb.append(doc).append('\n')
    }
    sb.toString
  }

  /** Distributed `_bulk` write: each Spark partition POSTs its own
    * bounded NDJSON chunks — no driver data path. With `idCol` set the
    * `index` action carries `_id`, making re-runs upsert-by-id (the
    * direct-insert shape of the reference's ES target,
    * `task_run_write.go:209-226`). Returns rows written. */
  def bulkWrite(df: org.apache.spark.sql.DataFrame, conn: Conn,
      index: String, idCol: Option[String] = None,
      chunkRows: Int = 1000): Long = {
    import org.apache.spark.sql.functions.{col, lit, struct, to_json}
    val cols = df.columns.toSeq.map(col)
    val pair = df.select(to_json(struct(cols: _*)).as("_doc"),
      idCol.map(c => col(c).cast("string"))
        .getOrElse(lit(null).cast("string")).as("_docid"))
    val withIds = idCol.isDefined
    pair.rdd.mapPartitions { it =>
      var n = 0L
      val hdrs = conn.headers + ("Content-Type" -> "application/x-ndjson")
      it.grouped(chunkRows).foreach { batch =>
        val docs = batch.map(_.getString(0))
        val ids = if (withIds) batch.map(_.getString(1)) else Nil
        // with ids the bulk is an idempotent upsert-by-_id: full retry;
        // id-less bulks would duplicate on replay: connect-only retry
        val resp = post(s"${conn.baseUrl}/_bulk", hdrs,
          bulkEncode(docs, index, ids), retriable = withIds)
        if (resp.contains("\"errors\":true")) throw new java.io.IOException(
          s"elastic bulk reported item errors: ${resp.take(300)}")
        n += docs.size
      }
      Iterator(n)
    }.sum().toLong
  }

  /** Force a refresh so indexed docs are immediately searchable —
    * read-after-write smoke checks against a real server need it (ES
    * indexing is near-real-time; the default refresh interval is 1s). */
  def refresh(conn: Conn, index: String): Unit =
    post(s"${conn.baseUrl}/$index/_refresh", conn.headers, "")

  /** Delete an index (full-refresh prep); 404 on an absent index is fine. */
  def deleteIndex(conn: Conn, index: String): Unit =
    try request("DELETE", s"${conn.baseUrl}/$index", conn.headers, "")
    catch {
      case e: java.io.IOException if e.getMessage.startsWith("elastic 404") => ()
    }
}
