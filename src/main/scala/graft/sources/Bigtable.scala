package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Google Cloud Bigtable source/sink (reference
  * core/dbio/database/database_bigtable.go) over the service's public
  * REST/JSON surface (`bigtable.googleapis.com/v2` — the JSON mapping of
  * the same Bigtable v2 protos the reference drives through gRPC, which
  * this offline jar set lacks):
  *
  *   - `{table}:sampleRowKeys` → key split points
  *   - `{table}:readRows`      → streamed CellChunk responses
  *   - `{table}:mutateRows`    → batched SetCell entries
  *   - instance `tables` admin verbs (list / schema / create / delete)
  *
  * Row shape matches the reference exactly (database_bigtable.go:512-580):
  * every cell value surfaces as a STRING column named
  * `family_qualifier` (the `:` separator mapped to `_`), plus
  * `_bigtable_key` (row key) and `_bigtable_timestamp` (max cell
  * timestamp, unix seconds). A `start_time` option becomes the same
  * TimestampRangeFilter the reference builds (:442-445).
  *
  * Spark-first shape: the reference reads one table through ONE gRPC
  * stream into a channel (its own commented-out `SampleRowKeys` call
  * marks the road not taken, :471). Here the driver samples row keys
  * once, then each Spark partition owns a contiguous key range and
  * streams its own `readRows` call on the executor — read parallelism =
  * number of sampled ranges, the same fan-out a 1000-executor cluster
  * needs. Chunk decoding is incremental off the HTTP stream (Jackson
  * streaming parser), so executor memory is O(row), not O(range).
  */
object Bigtable {

  /** Serializable connection. `baseUrl` is the data endpoint root
    * (live: `https://bigtable.googleapis.com`); `tablePath` arguments are
    * the resource path `projects/{p}/instances/{i}/tables/{t}`. */
  final case class Conn(baseUrl: String, token: String = "")
      extends Serializable {
    def headers: Map[String, String] =
      (if (token.isEmpty) Map.empty[String, String]
       else Map("Authorization" -> s"Bearer $token")) +
        ("Content-Type" -> "application/json")
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def b64b(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")
  private def unb64b(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** Bigtable row keys are raw bytes and the server orders them by
    * unsigned byte comparison — NOT UTF-16 code units. Keys are carried
    * as `Array[Byte]` end-to-end (sample → range bounds → readRows body)
    * and only UTF-8-decoded for the `_bigtable_key` display column, so
    * non-UTF-8 and supplementary-plane keys neither corrupt nor cross
    * range boundaries. The reference keeps keys as Go strings, whose
    * comparison is byte-exact (database_bigtable.go). */
  private val keyOrder: Ordering[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)

  /** POST returning the raw response stream — executor-side JDK HTTP;
    * the caller must exhaust or close the stream. The OPEN (connect +
    * status) retries transient failures; a stream dying mid-consumption
    * propagates (rows may already be emitted — Spark task retry owns
    * that case). */
  private def postStream(url: String, headers: Map[String, String],
      body: String): java.io.InputStream =
    HttpRetry.retry(url)(postStreamOnce(url, headers, body))

  private def postStreamOnce(url: String, headers: Map[String, String],
      body: String): java.io.InputStream = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (body.nonEmpty) conn.setDoOutput(true) // config precedes connect
    HttpRetry.connecting(conn.connect())
    if (body.nonEmpty) {
      val os = conn.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
    }
    val code = conn.getResponseCode
    if (code >= 400) {
      val err = new String(Option(conn.getErrorStream)
        .map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
      conn.disconnect()
      throw new HttpRetry.HttpStatusException(code,
        s"bigtable $code for $url: ${err.take(300)}")
    }
    conn.getInputStream
  }

  /** `retriable = false` for mutateRows (a lost response after the
    * server applied the batch would re-write cells at new server
    * timestamps) and the admin verbs (a replayed create/delete turns
    * success into already-exists/not-found) — connect-phase failures
    * still re-attempt for those (request never sent → nothing applied). */
  private def call(method: String, url: String,
      headers: Map[String, String], body: String = "",
      retriable: Boolean = true): String =
    if (retriable) HttpRetry.retry(url)(callOnce(method, url, headers, body))
    else HttpRetry.retryConnectOnly(url)(callOnce(method, url, headers, body))

  private def callOnce(method: String, url: String,
      headers: Map[String, String], body: String): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(120000)
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
        s"bigtable $code for $url: ${out.take(300)}")
    out
  }

  /** Sampled row-key split points as raw bytes, in unsigned byte order.
    * The service returns them roughly tablet-aligned, so ranges cut here
    * balance bytes, not row counts. */
  def sampleRowKeys(conn: Conn, tablePath: String): Seq[Array[Byte]] = {
    val mapper = new ObjectMapper()
    val body = call("POST",
      s"${conn.baseUrl}/v2/$tablePath:sampleRowKeys", conn.headers)
    val root = mapper.readTree(body)
    val arr = if (root.isArray) root else mapper.createArrayNode().add(root)
    (0 until arr.size()).flatMap { i =>
      Option(arr.get(i).path("rowKey").asText(null))
        .filter(_.nonEmpty).map(unb64b)
    }
  }

  /** Contiguous half-open key ranges covering the whole table from the
    * sampled split points, capped at `maxRanges`. Bounds are raw key
    * bytes compared unsigned-lexicographically (the server's order);
    * empty array = open bound. Always at least one (full-table) range. */
  def keyRanges(samples: Seq[Array[Byte]],
      maxRanges: Int): Seq[(Array[Byte], Array[Byte])] = {
    val sorted = samples.filter(_.nonEmpty).sorted(keyOrder)
    // structural dedupe of adjacent equal byte arrays (Array == is ref eq)
    val pts0 = sorted.foldLeft(Vector.empty[Array[Byte]]) { (acc, k) =>
      if (acc.nonEmpty && java.util.Arrays.equals(acc.last, k)) acc
      else acc :+ k
    }
    // thin evenly when the table has more tablets than wanted ranges
    val pts = if (pts0.size <= maxRanges - 1) pts0
      else (1 until maxRanges).map(i => pts0((i * pts0.size) / maxRanges))
        .foldLeft(Vector.empty[Array[Byte]]) { (acc, k) =>
          if (acc.nonEmpty && java.util.Arrays.equals(acc.last, k)) acc
          else acc :+ k
        }
    val bounds = Array.empty[Byte] +: pts :+ Array.empty[Byte]
    bounds.zip(bounds.tail)
  }

  /** Smallest key strictly greater than every key with prefix `p` — the
    * half-open end bound of a prefix scan: drop trailing 0xff bytes and
    * increment the last remaining one (Bigtable's own prefix-range rule).
    * All-0xff (or empty) prefixes have no successor → open end. */
  def prefixSuccessor(p: Array[Byte]): Array[Byte] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xff.toByte) i -= 1
    if (i < 0) Array.empty[Byte]
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      out
    }
  }

  /** Intersect a sampled partition range with the user's key window —
    * both half-open `[lo, hi)`, empty array = open bound. None when the
    * intersection is empty (the partition is skipped entirely: the
    * pushdown prunes work, it doesn't just filter rows). */
  def intersectRange(plo: Array[Byte], phi: Array[Byte],
      ulo: Array[Byte], uhi: Array[Byte]): Option[(Array[Byte], Array[Byte])] = {
    val lo = if (plo.isEmpty) ulo
      else if (ulo.isEmpty) plo
      else if (keyOrder.compare(plo, ulo) >= 0) plo else ulo
    val hi = if (phi.isEmpty) uhi
      else if (uhi.isEmpty) phi
      else if (keyOrder.compare(phi, uhi) <= 0) phi else uhi
    if (lo.nonEmpty && hi.nonEmpty && keyOrder.compare(lo, hi) >= 0) None
    else Some((lo, hi))
  }

  /** JSON body for one `readRows` call over `[startKey, endKey)` with the
    * reference's optional start-time filter (TimestampRangeFilter,
    * database_bigtable.go:442-445). Key bounds are raw bytes, base64'd
    * verbatim — no string round trip. */
  def readRowsBody(startKey: Array[Byte], endKey: Array[Byte],
      startTimeMicros: Option[Long]): String = {
    val mapper = new ObjectMapper()
    val o = mapper.createObjectNode()
    val range = o.putObject("rows").putArray("rowRanges").addObject()
    if (startKey.nonEmpty) range.put("startKeyClosed", b64b(startKey))
    if (endKey.nonEmpty) range.put("endKeyOpen", b64b(endKey))
    startTimeMicros.foreach { t =>
      o.putObject("filter").putObject("timestampRangeFilter")
        .put("startTimestampMicros", t)
    }
    mapper.writeValueAsString(o)
  }

  /** Decode one `readRows` response stream (a JSON array of
    * ReadRowsResponse messages) into finished rows, incrementally: only
    * one response message plus the row in flight are resident. Each
    * finished row is emitted as a JSON object string.
    *
    * Implements the CellChunk contract: rowKey/familyName/qualifier
    * carry over from the previous chunk when absent, a nonzero
    * `valueSize` marks a split cell continued by the next chunk,
    * `resetRow` discards the accumulated row, `commitRow` finishes it.
    */
  def decodeReadRows(in: java.io.InputStream): Iterator[String] = {
    import com.fasterxml.jackson.core.JsonToken
    val mapper = new ObjectMapper()
    val parser = mapper.getFactory.createParser(in)
    // position INSIDE the top-level response array (or at a lone
    // response object), so each element parses as its own bounded tree
    val first = parser.nextToken()
    if (first == JsonToken.START_ARRAY) parser.nextToken()
    val responses = new Iterator[JsonNode] {
      override def hasNext: Boolean =
        parser.currentToken() == JsonToken.START_OBJECT
      override def next(): JsonNode = {
        val node = mapper.readTree[JsonNode](parser)
        parser.nextToken() // next element, END_ARRAY, or EOF
        node
      }
    }

    new Iterator[String] {
      private var rowKey: String = null
      private var family: String = ""
      private var qualifier: String = ""
      private var tsMaxMicros: Long = 0L
      // qualified-name -> value; insertion order = first-seen order
      private val cells =
        collection.mutable.LinkedHashMap[String, String]()
      private val partial = new StringBuilder // split-cell accumulator
      private var splitting = false
      private val out = collection.mutable.Queue[String]()
      private var done = false

      private def finishRow(): String = {
        val o = mapper.createObjectNode()
        o.put("_bigtable_key", rowKey)
        cells.foreach { case (k, v) => o.put(k, v) }
        if (tsMaxMicros > 0L)
          o.put("_bigtable_timestamp", tsMaxMicros / 1000000L)
        rowKey = null; family = ""; qualifier = ""
        tsMaxMicros = 0L; cells.clear()
        mapper.writeValueAsString(o)
      }

      private def applyChunk(c: JsonNode): Unit = {
        if (c.path("resetRow").asBoolean(false)) {
          rowKey = null; family = ""; qualifier = ""
          tsMaxMicros = 0L; cells.clear()
          partial.clear(); splitting = false
          return
        }
        val rk = c.path("rowKey").asText("")
        if (rk.nonEmpty) rowKey = unb64(rk)
        if (c.has("familyName")) {
          val fn = c.path("familyName")
          family = if (fn.isObject) fn.path("value").asText("")
            else fn.asText("")
        }
        if (c.has("qualifier")) {
          val q = c.path("qualifier")
          qualifier = unb64(if (q.isObject) q.path("value").asText("")
            else q.asText(""))
        }
        val ts = c.path("timestampMicros")
        val tsv = if (ts.isTextual) ts.asText("0").toLong else ts.asLong(0L)
        if (tsv > tsMaxMicros) tsMaxMicros = tsv
        val v = c.path("value").asText("")
        partial ++= (if (v.isEmpty) "" else unb64(v))
        if (c.path("valueSize").asInt(0) > 0) {
          splitting = true // more value chunks follow for this cell
        } else {
          splitting = false
          // later cells for the same qualified name overwrite, like the
          // reference's positional row assembly (:535)
          cells.put(s"${family}_$qualifier", partial.toString)
          partial.clear()
        }
        if (c.path("commitRow").asBoolean(false) && rowKey != null)
          out += finishRow()
      }

      private def pump(): Unit = {
        while (out.isEmpty && !done) {
          if (responses.hasNext) {
            val chunks = responses.next().path("chunks")
            (0 until chunks.size()).foreach(i => applyChunk(chunks.get(i)))
          } else {
            done = true
            parser.close()
            in.close()
          }
        }
      }

      override def hasNext: Boolean = { pump(); out.nonEmpty }
      override def next(): String = { pump(); out.dequeue() }
    }
  }

  /** One range's rows as JSON strings — executor-side. */
  def readRange(conn: Conn, tablePath: String, startKey: Array[Byte],
      endKey: Array[Byte], startTimeMicros: Option[Long]): Iterator[String] =
    decodeReadRows(postStream(
      s"${conn.baseUrl}/v2/$tablePath:readRows", conn.headers,
      readRowsBody(startKey, endKey, startTimeMicros)))

  /** Distributed table scan: sample row keys once on the driver, then
    * each Spark partition streams `readRows` for its own contiguous key
    * range. `startTimeMicros` reproduces the reference's `start_time`
    * incremental filter; `keyPrefix` / `keyStart`+`keyEnd` reproduce its
    * user key-window scans (database_bigtable.go:420-470 RowRange /
    * PrefixRange) — the window intersects every sampled range, so
    * non-overlapping partitions are PRUNED before any request and the
    * server only scans the window, never the whole table. */
  def read(spark: SparkSession, conn: Conn, tablePath: String,
      maxRanges: Int = 32,
      startTimeMicros: Option[Long] = None,
      keyStart: Option[Array[Byte]] = None,
      keyEnd: Option[Array[Byte]] = None,
      keyPrefix: Option[Array[Byte]] = None): DataFrame = {
    import spark.implicits._
    val (ulo, uhi) = keyPrefix.filter(_.nonEmpty) match {
      case Some(p) => (p, prefixSuccessor(p))
      case None => (keyStart.getOrElse(Array.empty[Byte]),
        keyEnd.getOrElse(Array.empty[Byte]))
    }
    val ranges = keyRanges(sampleRowKeys(conn, tablePath), maxRanges)
      .flatMap { case (lo, hi) => intersectRange(lo, hi, ulo, uhi) }
    if (ranges.isEmpty) return spark.emptyDataFrame // window past the table
    val lines = spark.sparkContext
      .parallelize(ranges, ranges.size)
      .flatMap { case (lo, hi) =>
        readRange(conn, tablePath, lo, hi, startTimeMicros) }
    // the column set is row-dependent (the reference discovers columns
    // incrementally across all rows, :521-533), so typing goes through
    // the inference path of Spill.typed — the SERVICE is read exactly
    // once, the staged lines spill past memory, and the staging blocks
    // are released as soon as the typed frame materializes
    Spill.typed(spark, None, spark.createDataset(lines))
  }

  /** `mutateRows` body for one batch: every column SetCell into the
    * `default` family (the reference routes all columns there,
    * database_bigtable.go:613-623) at server time (timestampMicros -1). */
  def mutateRowsBody(rows: Seq[(String, Seq[(String, String)])]): String = {
    val mapper = new ObjectMapper()
    val o = mapper.createObjectNode()
    val entries = o.putArray("entries")
    rows.foreach { case (key, cols) =>
      val e = entries.addObject()
      e.put("rowKey", b64(key))
      val muts = e.putArray("mutations")
      cols.foreach { case (name, value) =>
        val sc = muts.addObject().putObject("setCell")
        sc.put("familyName", "default")
        sc.put("columnQualifier", b64(name))
        sc.put("timestampMicros", -1L)
        sc.put("value", b64(value))
      }
    }
    mapper.writeValueAsString(o)
  }

  /** Insert the frame — DISTRIBUTED: each Spark partition posts its own
    * `mutateRows` batches of `batchSize` entries (the reference batches
    * at `batch_values` and ApplyBulk-s each batch, :601-660). Row keys
    * are generated partition-unique (`pid-i`), the analogue of the
    * reference's atomic counter without a cross-executor hotspot.
    * Per-entry failures surface as an exception. Returns rows written. */
  def insert(df: DataFrame, conn: Conn, tablePath: String,
      batchSize: Int = 500): Long = {
    val cols = df.columns.toSeq
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val mapper = new ObjectMapper()
      var n = 0L
      var i = 0L
      val buf = collection.mutable
        .ArrayBuffer[(String, Seq[(String, String)])]()
      def flush(): Unit = if (buf.nonEmpty) {
        val resp = call("POST",
          s"${conn.baseUrl}/v2/$tablePath:mutateRows", conn.headers,
          mutateRowsBody(buf.toSeq), retriable = false)
        val root = mapper.readTree(resp)
        val arr = if (root.isArray) root else
          mapper.createArrayNode().add(root)
        (0 until arr.size()).foreach { r =>
          val es = arr.get(r).path("entries")
          (0 until es.size()).foreach { j =>
            val code = es.get(j).path("status").path("code").asInt(0)
            if (code != 0) throw new java.io.IOException(
              s"bigtable mutateRows entry failed: ${es.get(j)}")
          }
        }
        n += buf.size
        buf.clear()
      }
      it.foreach { row =>
        val vals = cols.flatMap { c =>
          Option(row.getAs[Any](c)).map(v => c -> String.valueOf(v)) }
        buf += ((s"$pid-$i", vals))
        i += 1
        if (buf.size >= batchSize) flush()
      }
      flush()
      Iterator(n)
    }.sum().toLong
  }

  // ---- admin surface (reference ExecContext / GetTables / GetColumns,
  // database_bigtable.go:216-396) ----

  /** Table ids in an instance (`projects/{p}/instances/{i}`). */
  def listTables(conn: Conn, instancePath: String): Seq[String] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(call("GET",
      s"${conn.baseUrl}/v2/$instancePath/tables?view=NAME_ONLY",
      conn.headers))
    val arr = root.path("tables")
    (0 until arr.size()).map(i =>
      arr.get(i).path("name").asText().split("/").last)
  }

  /** Column-family names of a table (the reference's GetColumns surface:
    * families, values always string-typed). */
  def columnFamilies(conn: Conn, tablePath: String): Seq[String] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(call("GET",
      s"${conn.baseUrl}/v2/$tablePath?view=SCHEMA_VIEW", conn.headers))
    val it = root.path("columnFamilies").fieldNames()
    val out = collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) out += it.next()
    out.toSeq
  }

  /** The reference's JSON exec payload
    * (`{"action":"create_table","table":"t","column_family":["cf"]}`,
    * database_bigtable.go:207-266): create_table / create_column_family /
    * delete_table against the admin REST verbs. */
  def exec(conn: Conn, instancePath: String, payload: String): Unit = {
    val mapper = new ObjectMapper()
    val q = mapper.readTree(payload)
    val action = q.path("action").asText("")
    val table = q.path("table").asText("")
    val fams = q.path("column_family")
    val famNames = (0 until fams.size()).map(fams.get(_).asText())
    action match {
      case "create_table" =>
        val body = mapper.createObjectNode()
        body.put("tableId", table)
        val cf = body.putObject("table").putObject("columnFamilies")
        (if (famNames.nonEmpty) famNames else Seq("default"))
          .foreach(cf.putObject)
        call("POST", s"${conn.baseUrl}/v2/$instancePath/tables",
          conn.headers, mapper.writeValueAsString(body), retriable = false)
      case "create_column_family" =>
        val body = mapper.createObjectNode()
        val mods = body.putArray("modifications")
        famNames.foreach { f =>
          val m = mods.addObject()
          m.put("id", f)
          m.putObject("create")
        }
        call("POST",
          s"${conn.baseUrl}/v2/$instancePath/tables/$table:modifyColumnFamilies",
          conn.headers, mapper.writeValueAsString(body), retriable = false)
      case "delete_table" =>
        call("DELETE", s"${conn.baseUrl}/v2/$instancePath/tables/$table",
          conn.headers, retriable = false)
      case other =>
        throw new IllegalArgumentException(s"bigtable action: $other")
    }
  }
}
