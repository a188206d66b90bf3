package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse source/sink over the HTTP interface (the public REST
  * surface of the engine the reference drives natively;
  * database_clickhouse.go semantics): `POST /` with the SQL body,
  * `FORMAT JSONEachRow` both directions, X-ClickHouse-User/Key auth,
  * database selection via query param.
  *
  * Reads append `FORMAT JSONEachRow` (unless a FORMAT is already
  * declared) and type the NDJSON through distributed JSON inference;
  * the response streams line-by-line to JSONL staging, never
  * materialized ([[read]]), and [[readPartitioned]] runs one
  * WHERE-bounded cursor per Spark partition so fetch + parse never
  * touch the driver at all — the scale path, mirroring the bounded
  * row channel in the reference's database_clickhouse.go. Writes
  * stream `INSERT INTO t FORMAT JSONEachRow` bodies in bounded
  * chunks — the same wire shape the reference's bulk path produces.
  */
object ClickHouseHttp {

  final case class Conn(baseUrl: String, user: String = "default",
      password: String = "", database: String = "") {
    def headers: Map[String, String] =
      Map("X-ClickHouse-User" -> user) ++
        (if (password.isEmpty) Map.empty
         else Map("X-ClickHouse-Key" -> password))
    def url: String =
      if (database.isEmpty) s"$baseUrl/"
      else s"$baseUrl/?database=${java.net.URLEncoder.encode(database, "UTF-8")}"
  }

  /** Engine error carrying the HTTP status — still an SQLException (the
    * engine-error contract) and classified by [[HttpRetry.transient]]. */
  final class ChStatusException(val statusCode: Int, msg: String)
      extends java.sql.SQLException(msg) with HttpRetry.HttpStatus

  /** POST the statement; returns a line reader over the streaming
    * response body (never materialized — the bounded-memory shape of
    * the reference's row channel; database_clickhouse.go). Caller
    * closes. For SELECTs the OPEN retries transient failures (mid-stream
    * failures propagate — Spark task retry owns re-emission);
    * `retriable = false` for INSERT/DDL bodies, where a lost response
    * after a server-side commit must error, not silently re-run —
    * connect-phase failures (statement never sent) still re-attempt. */
  private def openStream(conn: Conn, body: String,
      retriable: Boolean = true): java.io.BufferedReader =
    if (retriable) HttpRetry.retry(conn.url)(openStreamOnce(conn, body))
    else HttpRetry.retryConnectOnly(conn.url)(openStreamOnce(conn, body))

  private def openStreamOnce(conn: Conn, body: String): java.io.BufferedReader = {
    val http = new java.net.URI(conn.url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod("POST")
    http.setConnectTimeout(10000)
    http.setReadTimeout(300000)
    conn.headers.foreach { case (k, v) => http.setRequestProperty(k, v) }
    http.setDoOutput(true) // config precedes connect
    HttpRetry.connecting(http.connect())
    val os = http.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = http.getResponseCode
    if (code >= 400) {
      val err = new String(Option(http.getErrorStream)
        .map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
      http.disconnect()
      throw new ChStatusException(code, s"clickhouse $code: ${err.take(300)}")
    }
    new java.io.BufferedReader(
      new java.io.InputStreamReader(http.getInputStream, "UTF-8"), 1 << 16)
  }

  private def postStreaming(conn: Conn, body: String,
      retriable: Boolean = true)
      (sink: java.io.BufferedReader => Unit): Unit = {
    val rd = openStream(conn, body, retriable)
    try sink(rd) finally rd.close()
  }

  private def post(conn: Conn, body: String,
      retriable: Boolean = true): String = {
    val sb = new StringBuilder
    postStreaming(conn, body, retriable) { rd =>
      val buf = new Array[Char](8192)
      var n = rd.read(buf)
      while (n >= 0) { sb.appendAll(buf, 0, n); n = rd.read(buf) }
    }
    sb.toString
  }

  /** Query → typed frame: JSONEachRow lines through distributed JSON
    * inference. The response streams line-by-line to JSONL staging —
    * the driver holds one line at a time, never the result set. */
  def read(spark: SparkSession, conn: Conn, sql: String,
      spill: Spill.Config = Spill.Config()): DataFrame = {
    val q = if (sql.toUpperCase.contains("FORMAT ")) sql.trim
      else s"${sql.trim} FORMAT JSONEachRow"
    val w = new Spill.JsonlWriter(spark, "clickhouse", spill)
    postStreaming(conn, q) { rd =>
      var line = rd.readLine()
      while (line != null) {
        if (line.nonEmpty) w.write(line)
        line = rd.readLine()
      }
    }
    Spill.readJsonl(spark, None, w.close())
  }

  /** Executor-parallel read: split `[lo, hi]` of `column` into `chunks`
    * half-open ranges (last inclusive) and run one `WHERE`-bounded
    * statement per Spark partition — each executor opens its own HTTP
    * cursor and parses its own slice, so neither fetch nor parse ever
    * touches the driver (ChunkedRead's range pattern composed into the
    * wire query; the scale path for large tables). `sql` must contain a
    * `{chunk}` placeholder that receives the range predicate. Pass
    * `schema` when known for a single streaming pass; without it the
    * fetched lines persist across Spark's inference + data scans so each
    * cursor still runs exactly once ([[Spill.typed]]). */
  def readPartitioned(spark: SparkSession, conn: Conn, sql: String,
      column: String, lo: Long, hi: Long, chunks: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      includeNulls: Boolean = false): DataFrame = {
    require(sql.contains("{chunk}"),
      "readPartitioned sql needs a {chunk} placeholder for the range predicate")
    require(chunks > 0 && hi >= lo, s"bad range [$lo,$hi] x$chunks")
    val step = math.max((hi - lo) / chunks + 1, 1L)
    val preds = (0 until chunks).map { i =>
      val a = lo + i * step
      val b = math.min(a + step, hi + 1)
      // Nullable chunk columns: range predicates never match NULL, so
      // chunk 0 also sweeps the NULL rows (exactly one cursor owns them).
      // AND binds tighter than OR, and the caller wraps the whole pred in
      // parens, so the disjunction stays scoped to this chunk.
      val nulls = if (includeNulls && i == 0) s" OR $column IS NULL" else ""
      s"$column >= $a AND $column < $b$nulls"
    }
    import spark.implicits._
    val lines = spark.sparkContext.parallelize(preds, preds.size)
      .flatMap { pred =>
        val q0 = sql.replace("{chunk}", s"($pred)")
        val q = if (q0.toUpperCase.contains("FORMAT ")) q0.trim
          else s"${q0.trim} FORMAT JSONEachRow"
        val rd = openStream(conn, q)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => rd.close()))
        // lazy line iterator: rows decode as the executor consumes them,
        // O(line) memory per cursor
        Iterator.continually(rd.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty)
      }
    Spill.typed(spark, schema, lines.toDS())
  }

  /** Table read routed through the executor-parallel path: one tiny
    * driver-side `min/max` probe of `column`, then [[readPartitioned]]
    * with one WHERE-bounded cursor per chunk. The scale default for
    * table streams that declare a numeric chunk column — the round-12
    * loopback probe measured it at 3.3× the driver-paged [[read]]'s
    * throughput (332k vs 102k rows/s at 1.6M rows, BASELINE.md).
    * Falls back to the single-cursor [[read]] when the table is empty
    * or the probed bounds aren't integral (non-numeric column).
    *
    * Nullable chunk columns are covered: chunk 0's predicate also takes
    * `column IS NULL`, so rows with a NULL chunk value land exactly once
    * instead of being silently dropped by the range predicates.
    *
    * NON-SNAPSHOT semantics: the bounds probe and the per-chunk cursors
    * are separate HTTP statements, so rows inserted (or bounds moved)
    * between them can be missed or double-read — same as any multi-cursor
    * range read without an engine snapshot. Use the single-cursor [[read]]
    * when a point-in-time view of a concurrently-written table matters. */
  def readChunked(spark: SparkSession, conn: Conn, table: String,
      column: String, chunks: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val body = post(conn,
      s"SELECT min($column) AS lo, max($column) AS hi, count(*) AS n" +
        s" FROM $table FORMAT JSONEachRow").trim
    // count rides the same probe statement: ClickHouse returns min=0 on
    // an EMPTY non-Nullable column (not NULL), so bounds alone can't
    // tell "empty table" from "all zeros" — n = 0 routes to the plain
    // read instead of issuing `chunks` pointless cursors
    val bounds = body.linesIterator.find(_.nonEmpty).flatMap { line =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      for {
        n <- node.path("n").asText.toLongOption if n > 0
        l <- node.path("lo").asText.toLongOption
        h <- node.path("hi").asText.toLongOption
      } yield (l, h)
    }
    bounds match {
      case Some((lo, hi)) =>
        readPartitioned(spark, conn,
          s"SELECT * FROM $table WHERE {chunk}", column, lo, hi,
          math.max(chunks, 1), schema, includeNulls = true)
      case None => read(spark, conn, s"SELECT * FROM $table")
    }
  }

  /** Frame → `INSERT INTO table FORMAT JSONEachRow` chunks. Rows render
    * via Spark's own JSON writer semantics (toJSON), so types match what
    * a file export would carry. DISTRIBUTED: each Spark partition posts
    * its own bounded chunks (ClickHouse's HTTP interface takes concurrent
    * INSERTs; parts merge server-side) — the earlier driver-side
    * toLocalIterator form funneled the whole frame through one connection.
    * Returns rows written. */
  def insert(df: DataFrame, conn: Conn, table: String,
      chunkRows: Int = 10000): Long =
    df.toJSON.rdd.mapPartitions { it =>
      var n = 0L
      it.grouped(chunkRows).foreach { batch =>
        post(conn, s"INSERT INTO $table FORMAT JSONEachRow\n" +
          batch.mkString("\n") + "\n", retriable = false)
        n += batch.size
      }
      Iterator(n)
    }.sum().toLong

  /** Run a statement for its side effect (TRUNCATE before a
    * full-refresh insert, DDL); returns the raw response body. Not
    * retried — a replayed DDL after a lost-response commit would turn
    * success into an already-exists error or re-run the side effect. */
  def execute(conn: Conn, sql: String): String =
    post(conn, sql, retriable = false)
}
